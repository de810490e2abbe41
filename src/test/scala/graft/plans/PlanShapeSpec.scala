package graft.plans

import graft.SparkTestBase

/** Plan-shape regression tests: the scale properties SURVEY.md §2.4 claims
  * (pushdown, pruning, broadcast, bounded shuffles) asserted against the
  * actual executed plans, so a refactor that silently de-optimizes a
  * query fails CI instead of only showing up in a 100 TB run.
  */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  private def countOf(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).size

  test("drop_nested: dropped leaf never read (column pruning reaches the scan)") {
    val p = plan("drop_nested")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("event_type"),
      s"dropped field must be pruned from the parquet scan:\n$p")
    assert(countOf(p, "Exchange") == 0, s"pure projection, no shuffle:\n$p")
  }

  test("q3_join: dimensions broadcast, fact side streams, one aggregate exchange") {
    val p = plan("q3_join")
    assert(countOf(p, "BroadcastHashJoin") == 2,
      s"nation AND customer should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join expected:\n$p")
  }

  test("q1_agg: partial aggregation before the exchange (map-side combine)") {
    val p = plan("q1_agg")
    val exchangeIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_sum")
    assert(partialIdx >= 0, s"expected partial_sum in plan:\n$p")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial aggregate must sit below (after, in tree print) the exchange:\n$p")
  }

  test("q_scalar_funcs: zero shuffles, scan-and-project only") {
    val p = plan("q_scalar_funcs")
    assert(countOf(p, "Exchange") == 0, s"narrow projection expected:\n$p")
  }

  test("dedup_minhash: one doc exchange feeds the per-doc signature kernel") {
    // r19: signatures are computed doc-locally in one mapPartitions kernel
    // (tokenize → shingle → per-lane min), replacing the exploded-shingle
    // window + partial_min aggregate — the ONLY exchange left is the
    // fixed-width doc repartition feeding the kernel; shingle rows never
    // materialize, so there is nothing to aggregate or re-shuffle.
    val p = plan("dedup_minhash")
    val exchanges = countOf(p, "Exchange hashpartitioning")
    assert(exchanges == 1, s"exactly the doc repartition, got $exchanges:\n$p")
    assert(p.contains("MapPartitions"), s"per-doc signature kernel expected:\n$p")
    assert(!p.contains("Window"), s"no exploded-shingle window expected:\n$p")
  }

  test("ann_cosine: corpus side never exchanges (query side broadcast)") {
    val p = plan("ann_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side must broadcast:\n$p")
    // the only hash exchange allowed is the final per-query window rank
    assert(countOf(p, "Exchange hashpartitioning") <= 1,
      s"corpus must not shuffle before ranking:\n$p")
  }

  test("q_split / q_stratified: narrow maps — filter/project only, no exchange") {
    assert(countOf(plan("q_split"), "Exchange") == 0)
    assert(countOf(plan("q_stratified"), "Exchange") == 0)
  }

  test("q_vocab: top-k plans as TakeOrdered, never a global sort") {
    val p = plan("q_vocab")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit+orderBy should collapse to TakeOrdered:\n$p")
  }

  test("q_sessionize: single exchange feeds lag, cumsum, and final aggregate") {
    val p = plan("q_sessionize")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"window clustering must be reused by the aggregate:\n$p")
  }

  test("q_cube: one Expand + one aggregate exchange (not four scans)") {
    val p = plan("q_cube")
    assert(countOf(p, "Expand") == 1, s"cube should plan a single Expand:\n$p")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"one aggregate shuffle:\n$p")
  }

  test("q_window_funcs: one exchange + one sort serve all four window functions") {
    val p = plan("q_window_funcs")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"lag/lead/ntile/count must share the (custkey, orderdate) shuffle:\n$p")
    assert(countOf(p, "Sort ") <= 1, s"one sort for every frame:\n$p")
  }

  test("q_tfidf: window rides the doc-keyed exchange; only the vocab-sized df table shuffles") {
    // un-persisted by design: a cached tf table is AQE-wrapped, reports
    // unknown partitioning, and the ranking window re-shuffles the full
    // (doc, token, tf) table. Un-cached, the window sits directly on the
    // repartition's hash(doc_id) and the two branches' identical exchange
    // subtrees stage-reuse at runtime (asserted in the ReusedExchange test
    // below).
    val p = plan("q_tfidf")
    assert(!p.contains("InMemoryTableScan"),
      s"un-persisted by design (caching AQE-hides the partitioning):\n$p")
    // doc-keyed repartitions + ONE token-keyed exchange for the vocab-
    // sized df aggregate — no exchange of the corpus-scale tf table
    val parts = "Exchange hashpartitioning\\((\\w+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(parts.count(_ == "token") == 1 && parts.forall(c => c == "token" || c == "doc_id"),
      s"expected doc_id repartitions + one token exchange, got $parts:\n$p")
    // the window group-limit prunes to <= 3 rows per doc before ranking
    assert(p.contains("row_number(), 3"),
      s"group-limit must prune the ranking input:\n$p")
  }

  test("q_ngram_repeat: one doc exchange feeds the per-doc repeat-stats kernel") {
    // r19: total/distinct shingle counts are doc-local — computed in one
    // mapPartitions pass (no exploded shingle rows, no countDistinct
    // expansion); the only exchange is the doc repartition feeding it
    val p = plan("q_ngram_repeat")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"exactly the doc repartition:\n$p")
    assert(p.contains("MapPartitions"), s"per-doc kernel expected:\n$p")
    assert(!p.contains("Window"), s"no exploded-shingle window expected:\n$p")
  }

  test("q_filter_funnel: one scan, zero exchanges, partial aggregation") {
    val p = plan("q_filter_funnel")
    assert(countOf(p, "Scan parquet") == 1,
      s"all funnel rules in ONE scan, never one per rule:\n$p")
    assert(countOf(p, "Exchange hashpartitioning") == 0,
      s"global agg + stack needs no hash exchange:\n$p")
    assert(p.contains("partial"), s"map-side partial flags expected:\n$p")
  }

  test("q_quantiles: rank window, count window, and final agg off one exchange") {
    val p = plan("q_quantiles")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"key clustering must be reused by both windows and the agg:\n$p")
  }

  test("q_zorder / q_weighted_sample: narrow maps, zero exchanges") {
    Seq("q_zorder", "q_weighted_sample").foreach { q =>
      val p = plan(q)
      assert(countOf(p, "Exchange") == 0, s"$q must be a narrow map:\n$p")
    }
  }

  test("q_quality_score: narrow codegen'd projection, no keyed exchange") {
    // r20: one scale-gated round-robin widen may appear at test scale
    // (see the variant-queries pin) — by KEY the scorer never shuffles
    val p = plan("q_quality_score")
    assert(countOf(p, "Exchange hashpartitioning") == 0,
      s"scorer must never shuffle by key:\n$p")
    assert(countOf(p, "Exchange") <= 1,
      s"at most the one widen exchange:\n$p")
    assert(!p.contains("ScalaUDF"), s"scorer must be codegen'd:\n$p")
  }

  test("dedup_incremental: batch side broadcasts, index bands never reshuffle for candidates") {
    val p = plan("dedup_incremental")
    assert(countOf(p, "BroadcastHashJoin") >= 2,
      s"band join AND batch-set verify join must broadcast the batch side:\n$p")
  }

  test("q_centroids: map-side partial aggregation bounds the centroid shuffle") {
    val p = plan("q_centroids")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"expected partial aggregation before the exchange:\n$p")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"one (label, dim) exchange only:\n$p")
  }

  test("q_boilerplate: count window replaces the df join — no join, bounded exchanges") {
    val p = plan("q_boilerplate")
    // shingle window (id) + distinct (id, gram) + df window (gram) +
    // per-doc agg (id): never a join, never a 5-exchange cascade
    val exchanges = countOf(p, "Exchange hashpartitioning")
    assert(exchanges <= 4, s"boilerplate must not cascade shuffles, got $exchanges:\n$p")
    assert(!p.contains("Join"), s"document frequency must not join back:\n$p")
  }

  test("parity surface plans contain no UDF nodes (codegen everywhere)") {
    Seq("drop_nested", "hoist_keep", "to_json_map", "drop_schemaless").foreach { q =>
      val p = plan(q)
      assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
        s"$q must not use UDFs:\n$p")
    }
  }

  test("q_paragraph_dedup: blocklist broadcasts into the digest join; rebuild rides the doc exchange") {
    // r19 shape: the digest branch carries only (id, pos, md5) — the
    // blocklist (no broadcast HINT — a boilerplate-heavy corpus can
    // outgrow it; the planner picks broadcast from its own stats at
    // benchmark scale) joins INNER against the digest rows to produce
    // the per-doc blocked-position set, and the rebuild joins that back
    // to the original paragraph arrays on the SAME doc exchange (stage
    // reuse) instead of re-aggregating text through a corpus-wide
    // collect_list.
    val p = plan("q_paragraph_dedup")
    assert(p.contains("BroadcastHashJoin"),
      s"planner should broadcast the tiny blocklist at this scale:\n$p")
    assert(!p.contains("collect_list"),
      s"rebuild must filter the original arrays, not re-aggregate text:\n$p")
  }

  test("variant mutations and image decode: narrow maps, zero keyed exchanges") {
    // r20: the variant queries carry ONE scale-gated round-robin widen
    // (Widen — the exchange exists only because this test scale's scan
    // plans narrower than the session; at width >= parallelism it
    // vanishes). Nothing may shuffle by KEY, and the decode stays
    // exchange-free entirely.
    Seq("drop_variant", "hoist_variant").foreach { q =>
      val p = plan(q)
      assert(countOf(p, "Exchange hashpartitioning") == 0,
        s"$q must never shuffle by key:\n$p")
      assert(countOf(p, "Exchange") <= 1,
        s"$q: at most the one widen exchange:\n$p")
    }
    // multimodal_decode gained the same gated widen in r20 — the media
    // bytes are synthesized ABOVE the exchange, so only (doc_id, text)
    // rides it and payload bytes still never shuffle
    val pd = plan("multimodal_decode")
    assert(countOf(pd, "Exchange hashpartitioning") == 0,
      s"multimodal_decode must never shuffle by key:\n$pd")
    assert(countOf(pd, "Exchange") <= 1,
      s"at most the one widen exchange:\n$pd")
  }

  test("q_mix_sources / q_token_budget: one rank window exchange each, config broadcasts") {
    val pm = plan("q_mix_sources")
    // the CORPUS pays exactly one exchange (the per-key rank window, on
    // the mixing key). The broadcast-sized quotas CONFIG adds its own
    // tiny exchange for the duplicate-key validation window — O(config
    // rows), invisible at any scale, and deliberately not counted here.
    assert(countOf(pm, "Exchange hashpartitioning\\(source") == 1,
      s"mixing is one per-key window exchange on the corpus:\n$pm")
    assert(pm.contains("BroadcastHashJoin"), s"quota config must broadcast:\n$pm")
    val pt = plan("q_token_budget")
    assert(countOf(pt, "Exchange hashpartitioning") == 1,
      s"budget selection is one per-shard window exchange:\n$pt")
    assert(!pt.contains("Join"), s"no join in the budget cut:\n$pt")
  }

  test("q_shuffle_order: two-phase ordinals, never a single-partition global window") {
    // the range exchange lives inside the zipWithIndex RDD lineage; what
    // the DataFrame plan must show is the ExistingRDD handoff and the
    // ABSENCE of the row_number()-over-everything shape
    val p = plan("q_shuffle_order")
    assert(p.contains("ExistingRDD"), s"expected the two-phase RDD handoff:\n$p")
    assert(!p.contains("Window") && !p.contains("SinglePartition"),
      s"a global window/SinglePartition exchange is the 100 TB funnel this " +
        s"query exists to avoid:\n$p")
  }

  test("dedup_pairs_md5: ONE true exchange once cached subplans are counted once") {
    // raw toString re-inlines the persisted signature pipeline under every
    // InMemoryTableScan that reads it (8 apparent exchanges); the audit's
    // flattened view expands each cached subtree exactly once — the count
    // that reflects what actually executes. Pin it so a refactor that adds
    // a real shuffle (or drops the cache) fails here, not at 100 TB.
    val plan = graft.SparkEntry.queries("dedup_pairs_md5")(spark, dir)
      .queryExecution.executedPlan
    val flat = graft.tools.PlanAudit.flattenPlan(plan)
    val real = countOf(flat, "Exchange hashpartitioning")
    assert(real <= 2,
      s"cached-once exchange count must stay answer-sized, got $real:\n$flat")
    assert(countOf(flat, "InMemoryTableScan") >= 1,
      s"signature pipeline must be persisted (no subplan CSE in Catalyst):\n$flat")
    // sanity: the flattened view is strictly tighter than the re-inlining
    // raw string for the same plan
    assert(real <= countOf(plan.toString, "Exchange hashpartitioning"),
      "flattenPlan must never count more than the re-inlined rendering")
  }

  test("q_gopher_repeat: every exchange keys on doc_id only — gram text never shuffles") {
    // the signal bundle's one repartition must stay UN-persisted: a cached
    // plan is AQE-wrapped, reports unknown partitioning, and every
    // downstream groupBy(id, gram) re-shuffles gram TEXT (measured: 7
    // exchanges). Pin the property that makes it scale: all hash
    // partitionings key on the doc id alone, never on a gram column, and
    // nothing is cached.
    val p = plan("q_gopher_repeat")
    val parts = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(parts.nonEmpty, s"expected the doc-keyed repartition:\n$p")
    parts.foreach { args =>
      assert(args.contains("doc_id") && !args.contains("__g"),
        s"exchange must key on doc_id only, got ($args):\n$p")
    }
    assert(!p.contains("InMemoryTableScan"),
      s"un-persisted by design (caching AQE-hides the partitioning):\n$p")
  }

  test("all nine stage-reuse pipelines keep their exact (live, reused) shuffle counts at runtime") {
    // the un-persisted multi-consumer pipelines rest on AQE exchange
    // reuse: every consumer's repartition subtree canonicalizes
    // identically, so the corpus text shuffles ONCE and the other
    // branches read the same shuffle stage (ReusedExchange). Only the
    // post-execution adaptive plan shows this — assert the EXACT
    // (live, reused) pair for every pipeline that relies on it (the
    // PLAN_AUDIT.md runtime columns), so a stray inferred filter that
    // breaks canonical equality — which silently converts a reused
    // branch into a second full corpus shuffle with no result change —
    // fails here, not at 100 TB.
    val expected = Seq( // (query, live exchanges, reused branches)
      ("dedup_e2e", 0, 1), // cached pair plan: live exchanges sit in eager execs
      ("dedup_e2e_md5", 0, 1),
      // r19 kernel shape: 2 doc repartitions feeding the gram-digest
      // kernels (eval + corpus — doc-LOCAL dedup replaced the corpus-wide
      // (id, __g) distinct exchange, so the rows shuffled here are already
      // per-doc distinct digests), the (doc_id, __g) hit distinct, and the
      // two per-doc count aggregates; the eval kernel subtree is reused
      // between the broadcast gram set and the totals branch
      ("q_decontam_report", 5, 1),
      // r19: the whole repetition bundle is computed doc-locally in one
      // kernel pass — the ONE exchange is the doc repartition feeding it;
      // nothing is left to reuse (no grouped-count branches, no joins)
      ("q_gopher_repeat", 1, 0),
      ("q_ngram_fluency", 3, 2),
      // r19: doc repartition + blocklist digest agg live; the doc
      // exchange is reused TWICE (digest branch + array rebuild)
      ("q_paragraph_dedup", 2, 2),
      // r19: the gram stage runs in the per-doc kernel; its doc repartition
      // is a third live exchange, but the rows it carries are doc-local
      // gram digests (the corpus-wide gram distinct is gone)
      ("q_span_dedup", 3, 2),
      ("q_tfidf", 2, 1),
      ("q_winnow_pairs", 3, 2)) // one fp exchange serves all three tiers
    expected.foreach { case (name, wantLive, wantReused) =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect() // finalize AQE on this df's own QueryExecution
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"$name: expected finalized AQE plan:\n$p")
      // same counting rule as PlanAudit's runtime columns: the finalized
      // section only (the echoed initial plan would double-count)
      val finalSection = p.split("== Initial Plan ==").head
      val reused = "ReusedExchange".r.findAllIn(finalSection).size
      val live = finalSection.linesIterator.count(ln =>
        ln.contains("Exchange hashpartitioning") && !ln.contains("ReusedExchange"))
      assert((live, reused) == ((wantLive, wantReused)),
        s"$name: runtime (live, reused) = ($live, $reused), expected " +
          s"($wantLive, $wantReused) — a canonical-equality break re-adds " +
          s"a hidden corpus shuffle:\n$p")
    }
  }

  test("dedup_rows: WindowGroupLimit prunes duplicate groups map-side before the shuffle") {
    // Dedup.exact is row_number()===1 over a digest-keyed window; at
    // 100 TB its safety against hot duplicate groups rests on Spark 4's
    // InferWindowGroupLimit pushing a PARTIAL rank-limit below the
    // exchange, so a group with 10⁶ copies ships ≤1 row per map
    // partition instead of all 10⁶ into one reducer. That defense was
    // assumed from Spark behavior — pin it like every other
    // load-bearing plan shape (VERDICT r10 task 4). If this ever goes
    // red, switch `exact` to a map-side-combinable min_by aggregate.
    val p = plan("dedup_rows")
    val partialIdx = p.indexOf("WindowGroupLimit")
    assert(partialIdx >= 0, s"expected WindowGroupLimit in the plan:\n$p")
    assert(countOf(p, "WindowGroupLimit") == 2,
      s"expected Partial AND Final WindowGroupLimit around the exchange:\n$p")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && p.lastIndexOf("WindowGroupLimit") > exchangeIdx,
      s"partial WindowGroupLimit must sit below the exchange (map side):\n$p")
  }

  test("q_corpus_diff / q_array_funcs: digest-only diff join; arrays stay narrow") {
    val pd = plan("q_corpus_diff")
    assert(countOf(pd, "CartesianProduct") + countOf(pd, "BroadcastNestedLoopJoin") == 0,
      s"diff is an equi-join, never a product:\n$pd")
    val pa = plan("q_array_funcs")
    assert(countOf(pa, "Exchange") == 0,
      s"array/map scalar tier is a pure projection:\n$pa")
  }
}
