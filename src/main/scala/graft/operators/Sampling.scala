package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * Everything keys off [[hashBucket]]: a uniform 32-bit integer derived
  * from `md5(id)`. That makes every operation here
  *  - deterministic (same row → same decision, across runs AND engines —
  *    no seed state, no partition-layout dependence, unlike `df.sample`),
  *  - stable under re-partitioning / incremental reprocessing (a doc keeps
  *    its split when the corpus grows — critical for avoiding train/test
  *    leakage across dataset versions),
  *  - a narrow map: no shuffle, no driver state; filters push into the
  *    scan.
  * Thresholds are precomputed integer literals (floor(fraction·2³²)), so
  * membership tests are pure integer compares — no float-boundary
  * ambiguity between engines.
  */
object Sampling {

  /** Uniform bucket in [0, 2³²) from the first 8 hex chars of md5(id). */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic data mixing: keep at most `quota(key)` rows per key,
    * chosen by hash rank (never file order) so the mix is unbiased and
    * reproducible across engines, corpus versions, and partition layouts.
    * `quotas` is the mixing CONFIG — (keyCol, quota) rows, always tiny,
    * broadcast; keys absent from it fall back to `defaultQuota`. One
    * exchange (the per-key rank window); the config join is map-side.
    *
    * SCALE CAVEAT (shared with every rank-per-key formulation, incl.
    * q_per_key_cap): the window sorts each key inside one task, so a key
    * holding a dominant fraction of a 100 TB corpus serializes there.
    * The mitigation is a two-phase cut: first drop rows above a hash
    * threshold ≈ quota / est_count(key) × (1+slack) — a NARROW map using
    * the same [[hashBucket]] values, no shuffle — then exact-rank only
    * the ~quota×(1+slack) survivors. Selection stays identical because
    * hash rank and hash threshold order rows the same way.
    */
  def mixToQuotas(df: DataFrame, idCol: String, keyCol: String,
                  quotas: DataFrame, defaultQuota: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    val q = quotaConfig(quotas, keyCol)
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(q), col(keyCol) <=> col("__qk"), "left")
      .filter(col("__rn") <= coalesce(col("__graft_quota"), lit(defaultQuota)))
      .drop("__rn", "__qk", "__graft_quota")
  }

  /** Shared mixing-config normalization for [[mixToQuotas]] and
    * [[mixToQuotasLarge]]: renames into the engine's __ namespace (a
    * caller whose df already carries `quota` is neither shadowed nor
    * dropped) and rejects duplicate keys — a duplicated key would fan
    * rows out through the join and the two variants would diverge. The
    * per-key count rides the SAME tiny config plan (a window over the
    * broadcast-sized config — no separate validation job, so building
    * the query stays action-free) and raises at execution. NULLs count
    * as one key (window partitions group them), matching the null-safe
    * (<=>) joins both variants use: a NULL key is a legal group, so a
    * NULL config row must reach it identically in both shapes.
    */
  private def quotaConfig(quotas: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = quotas.select(col(keyCol).as("__qk"), col("quota").as("__graft_quota"))
    val perKey = count(lit(1)).over(Window.partitionBy(col("__qk")))
    q.select(col("__qk"),
      when(perKey === 1, col("__graft_quota"))
        .otherwise(raise_error(concat(
          lit("quotas config must have distinct keys; duplicate: "),
          coalesce(col("__qk").cast("string"), lit("NULL")))))
        .as("__graft_quota"))
  }

  /** The hot-key-safe variant of [[mixToQuotas]] — IDENTICAL output,
    * different physical shape. Phase 1 prunes each key to its ~quota×slack
    * smallest-hash rows via a per-key hash THRESHOLD (counts shuffle only
    * the key column; the threshold filter is a join + narrow filter — no
    * per-key sort), so the rank window in phase 2 sees ~quota×slack rows
    * per key instead of the key's full corpus share. A key is underfilled
    * only if its threshold cut below its quota-th smallest hash (P ≈
    * Poisson tail, vanishing for slack ≥ 2); the verification count
    * catches exactly those keys and re-ranks just them without the
    * threshold. Hash rank and hash threshold order rows identically, so
    * the final selection is provably the same as [[mixToQuotas]]'s.
    */
  def mixToQuotasLarge(df: DataFrame, idCol: String, keyCol: String,
                       quotas: DataFrame, defaultQuota: Long,
                       slack: Double = 2.0,
                       cacheInput: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(slack > 0, "slack must be positive")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the input plan executes for the counts AND the ranked phase (and a
    // third time on fallback); with cacheInput an expensive upstream
    // (scoring projections, joins) runs once — Catalyst does not CSE
    // subplans. Pass cacheInput = false when the input is a cheap pruned
    // scan (caching one would trade pushdown for a pointless cache
    // write), or when the caller manages df's own persistence. With
    // cacheInput the operator OWNS the cache: it releases it on the
    // common path (and every cache the returned plan no longer reads);
    // the rare fallback path leaves the handles pinned because the
    // returned plan still reads them.
    val in = if (cacheInput) df.persist(lvl) else df
    val counts = in.groupBy(col(keyCol)).agg(count(lit(1)).as("__cnt"))
    val q = quotaConfig(quotas, keyCol)
    // every join on the key is NULL-SAFE (<=>): a NULL key is a legal
    // group in mixToQuotas (window partitions group nulls), so it must
    // survive every phase here too — a plain equi-join would silently
    // drop NULL-key rows and diverge
    // per-key hash threshold ≈ quota/cnt × slack of the 2^32 hash space,
    // clamped to "keep everything" when the quota covers the key anyway
    val lim = counts.join(broadcast(q), col(keyCol) <=> col("__qk"), "left")
      .select(col(keyCol),
        coalesce(col("__graft_quota"), lit(defaultQuota)).as("__q"),
        col("__cnt"))
      .withColumn("__thr", when(col("__q") >= col("__cnt"), lit(4294967296L))
        .otherwise(least(lit(4294967296L),
          ceil(col("__q") * slack * 4294967296.0 / col("__cnt")).cast("long"))))
      .persist(lvl)
    val limR = lim.select(col(keyCol).as("__lk"), col("__q"), col("__cnt"), col("__thr"))
    val withB = in.withColumn("__hb", hashBucket(col(idCol)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__hb"), col(idCol))
    val kept = withB.join(limR, col(keyCol) <=> col("__lk")).drop("__lk")
      .filter(col("__hb") < col("__thr"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__q"))
      .persist(lvl)
    // verification: underfilled = kept fewer than min(quota, available).
    // Anchored on `lim` (every key) with a left join — a key whose
    // threshold cut so deep that ZERO rows survived has no kept-count row
    // at all, and an inner join would silently skip exactly the keys most
    // in need of the fallback
    val keptCounts = kept.groupBy(col(keyCol)).agg(count(lit(1)).as("__k"))
      .select(col(keyCol).as("__kk"), col("__k"))
    val shortKeys = lim.join(keptCounts, col(keyCol) <=> col("__kk"), "left")
      .filter(coalesce(col("__k"), lit(0L)) < least(col("__q"), col("__cnt")))
      .select(col(keyCol).as("__sk"))
    val helperCols = Seq("__hb", "__q", "__cnt", "__thr", "__rn")
    val complete = shortKeys.isEmpty // action: materializes in, lim, kept
    if (complete) {
      // the returned plan reads ONLY kept's materialized cache — release
      // everything upstream of it
      if (cacheInput) in.unpersist(blocking = false)
      lim.unpersist(blocking = false)
      kept.drop(helperCols: _*)
    } else {
      // exact re-rank (no threshold) for only the rare underfilled keys
      val redo = withB.join(broadcast(shortKeys), col(keyCol) <=> col("__sk"))
        .drop("__sk")
        .join(limR.select(col("__lk"), col("__q")), col(keyCol) <=> col("__lk"))
        .drop("__lk")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= col("__q"))
        .drop("__hb", "__q", "__rn")
      kept.join(broadcast(shortKeys), col(keyCol) <=> col("__sk"), "left_anti")
        .drop(helperCols: _*)
        .unionByName(redo)
    }
  }

  /** Quality-ordered token-budget selection: within each shard, take rows
    * in (score desc, id) order until the shard's token budget would
    * overflow — "the best documents that fit in N tokens", the standard
    * curation cut when a training run has a token target. The kept set is
    * a true rank-prefix: the running total includes every earlier row
    * (kept or not), so once one row overflows, all later rows do too.
    * One exchange; budgets are per shard, so no global sort exists.
    * A shard holding a dominant corpus share still sorts in one task —
    * [[tokenBudgetLarge]] is the hot-shard-safe shape.
    *
    * PRECONDITION (enforced): `tokensCol` must be non-NULL and >= 0 —
    * the prefix invariant ("once one row overflows, all later rows do
    * too") and the two variants' provable equivalence both depend on it.
    * A NULL would silently drop its row (NULL compare) and a negative
    * count would un-overflow a later row, so both raise instead. The
    * guard is a codegen'd per-row branch on a column already being read —
    * free next to the window sort. [[tokenBudgetLarge]] inherits it
    * through its phase-2/fallback calls into this method.
    */
  def tokenBudget(df: DataFrame, shardCol: String, idCol: String,
                  scoreCol: String, tokensCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = when(col(tokensCol).isNotNull && col(tokensCol) >= 0, col(tokensCol))
      .otherwise(raise_error(concat(
        lit(s"tokenBudget: '$tokensCol' must be non-NULL and non-negative, got "),
        coalesce(col(tokensCol).cast("string"), lit("NULL")))))
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum(toks).over(w), lit(0L)))
      .filter(col("cum_before") + toks <= budget)
  }

  /** The hot-shard-safe variant of [[tokenBudget]] — IDENTICAL output.
    * Phase 1 estimates, per shard, the score cutoff that keeps ≈
    * budget×slack tokens (a fixed approx-percentile grid — the percentage
    * argument must be a literal) and prunes strictly-lower-scored rows
    * with a narrow filter, so the rank window sorts only the plausible
    * prefix instead of the shard's full corpus share. Correctness does
    * not depend on the estimate: every pruned row scores strictly below
    * every survivor, so survivor ranks equal global ranks, and a shard's
    * result is complete iff its budget boundary fell INSIDE the
    * survivors (some survivor was budget-excluded). Shards where ALL
    * survivors fit AND rows were pruned re-run exact — the selection is
    * provably [[tokenBudget]]'s for any threshold quality.
    */
  def tokenBudgetLarge(df: DataFrame, shardCol: String, idCol: String,
                       scoreCol: String, tokensCol: String, budget: Long,
                       slack: Double = 2.0,
                       cacheInput: Boolean = true): DataFrame = {
    require(slack > 0, "slack must be positive")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the input plan executes for the stats AND the survivors phase (and
    // a third time on fallback); with cacheInput an expensive upstream
    // (the scoring projection) runs once — Catalyst does not CSE
    // subplans. Same ownership contract as mixToQuotasLarge: released on
    // the common path, pinned on the rare fallback (the returned plan
    // reads it there); pass false for cheap inputs or caller-managed
    // persistence.
    val in = if (cacheInput) df.persist(lvl) else df
    // grid of keep-fractions {50%, 25%, 10%, 4%, 1%}: pick the deepest
    // prune whose keep-fraction still covers budget×slack tokens
    val grid = Seq(0.5, 0.75, 0.9, 0.96, 0.99)
    val stats = in.groupBy(col(shardCol)).agg(
      sum(col(tokensCol)).as("__tot"),
      count(lit(1)).as("__n"),
      percentile_approx(col(scoreCol),
        array(grid.map(lit): _*), lit(10000)).as("__ps"))
    val keepFrac = least(lit(1.0), lit(budget.toDouble * slack) / col("__tot"))
    // foldLeft makes the LAST-processed grid point the OUTERMOST when(),
    // so iterate ascending — the deepest qualifying prune (q=0.99) must
    // win, not the shallowest (a reversed fold would always stop at the
    // p50 cutoff and sort 50% of a hot shard instead of ~1%)
    val thr = grid.zipWithIndex
      .foldLeft(lit(null).cast("double"): Column) { case (els, (q, i)) =>
        when(keepFrac <= 1.0 - q, element_at(col("__ps"), i + 1)).otherwise(els)
      }
    // one row per shard; the planner broadcasts it when small. Joins on
    // the shard are NULL-SAFE — a NULL shard is a legal window partition
    // in tokenBudget and must survive every phase here too
    val lim = stats.select(col(shardCol), col("__n"), thr.as("__thr")).persist(lvl)
    val limR = lim.select(col(shardCol).as("__ls"), col("__n"), col("__thr"))
    val survivors = in.join(limR, col(shardCol) <=> col("__ls")).drop("__ls")
      .filter(col("__thr").isNull || col(scoreCol) >= col("__thr"))
      .persist(lvl)
    val kept = tokenBudget(survivors, shardCol, idCol, scoreCol, tokensCol, budget)
      .persist(lvl)
    // a shard is complete iff some survivor was budget-excluded OR
    // nothing was pruned; left joins anchored on lim so zero-survivor /
    // zero-kept shards are still seen
    def cnt(d: DataFrame, as: String, keyAs: String) =
      d.groupBy(col(shardCol)).agg(count(lit(1)).as(as))
        .select(col(shardCol).as(keyAs), col(as))
    val shortShards = lim
      .join(cnt(survivors, "__s", "__c1"), col(shardCol) <=> col("__c1"), "left")
      .join(cnt(kept, "__k", "__c2"), col(shardCol) <=> col("__c2"), "left")
      .filter(coalesce(col("__k"), lit(0L)) === coalesce(col("__s"), lit(0L)) &&
        coalesce(col("__s"), lit(0L)) < col("__n"))
      .select(col(shardCol).as("__ss"))
    val helperCols = Seq("__n", "__thr")
    val complete = shortShards.isEmpty // action: materializes in+lim+survivors+kept
    // kept's cache is fully materialized by the counting action above, so
    // its parent is always releasable; on the complete path the returned
    // plan reads ONLY kept, so the input and limits caches go too
    survivors.unpersist(blocking = false)
    if (complete) {
      if (cacheInput) in.unpersist(blocking = false)
      lim.unpersist(blocking = false)
      kept.drop(helperCols: _*)
    } else {
      val redo = tokenBudget(
        in.join(broadcast(shortShards), col(shardCol) <=> col("__ss")).drop("__ss"),
        shardCol, idCol, scoreCol, tokensCol, budget)
      kept.join(broadcast(shortShards), col(shardCol) <=> col("__ss"), "left_anti")
        .drop(helperCols: _*)
        .unionByName(redo)
    }
  }


  /** Temperature-scaled per-key row targets (the mT5/XLM-R resampling
    * law): key `i` holding `cnt_i` rows gets `quota_i ∝ cnt_i^tau` of a
    * `totalBudget`-row mix. `tau = 1` reproduces the natural distribution;
    * `tau → 0` flattens it toward uniform — the standard knob for keeping
    * a dominant crawl source from drowning small high-value ones.
    *
    * Exact integer apportionment (Hamilton / largest-remainder): weights
    * quantize to `floor(cnt^tau · weightScale)` BIGINTs, each key takes
    * `floor(w_i·B / W)` (exact decimal integral division — never a
    * rounded float quotient), and the `B − Σ floor` leftover rows go to
    * the largest remainders (ties by key, NULLS FIRST pinned to Spark's
    * sort default). So `Σ quota_i == totalBudget` EXACTLY whenever the
    * frame is non-empty — no float drift, no off-by-the-rounding-mode.
    * Cross-engine note: `tau = 0.5` routes through `sqrt`, which IEEE 754
    * requires to be correctly rounded — bit-identical in any engine. For
    * other `tau`, `pow` may differ by 1 ulp between libm implementations;
    * the `weightScale` floor-quantization makes a divergent weight need
    * the true value within ~1 ulp of a 1/weightScale boundary (≈1e-8
    * per key at the default scale), and even then the integer
    * apportionment dampens a ±1 weight to a ±1-row quota at most.
    *
    * Scale shape: ONE partial-agg exchange carrying only the key column;
    * every later stage (weights, apportionment windows) runs on the
    * key-cardinality frame — tiny by this operator's contract (keys are
    * SOURCES: a mixing config dimension, not a data dimension).
    *
    * Output: (keyCol, quota) — a [[mixToQuotas]]-shaped config. A quota
    * may exceed its key's row count when `totalBudget` overshoots the
    * corpus (the selection then keeps the whole key, like every quota).
    */
  def temperatureTargets(df: DataFrame, keyCol: String, tau: Double,
                         totalBudget: Long,
                         weightScale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    require(totalBudget >= 0, s"totalBudget must be non-negative, got $totalBudget")
    require(weightScale >= 1, s"weightScale must be positive, got $weightScale")
    require(keyCol != "quota", "keyCol 'quota' would collide with the output column")
    // sqrt is IEEE-correctly-rounded everywhere; pow is not — route the
    // common tau through the exact op so oracles can hash-match it
    val raw = if (tau == 0.5) sqrt(col("__cnt")) else pow(col("__cnt"), lit(tau))
    val one = Window.partitionBy(lit(1))
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__cnt"))
    counts
      .withColumn("__w", floor(raw * weightScale).cast("long"))
      // sum in decimal, not long-then-cast: an extreme key-cardinality ×
      // count corpus could wrap a LongType sum before the cast under
      // non-ANSI mode, corrupting every quota (ADVICE r13)
      .withColumn("__wsum",
        sum(col("__w").cast("decimal(38,0)")).over(one))
      // decimal(38,0) keeps w·B exact to 38 digits; DIV / % are exact
      // integer quotient/remainder on decimals (no rounded float quotient)
      .withColumn("__num", col("__w").cast("decimal(38,0)") * lit(totalBudget))
      .withColumn("__base", expr("__num DIV __wsum"))
      .withColumn("__rem", expr("__num % __wsum"))
      .withColumn("__short", lit(totalBudget) - sum(col("__base")).over(one))
      .withColumn("__rn", row_number().over(
        one.orderBy(col("__rem").desc, col(keyCol).asc_nulls_first)))
      .select(col(keyCol),
        (col("__base") +
          when(col("__rn") <= col("__short"), 1L).otherwise(0L)).as("quota"))
  }

  /** Temperature-based source resampling end to end: derive the
    * [[temperatureTargets]] quotas from the corpus itself, then make the
    * hash-rank selection via [[mixToQuotas]] — deterministic, engine- and
    * layout-stable, and exactly `totalBudget` rows whenever every key
    * holds at least its quota. The input plan executes twice (counts,
    * then rank) — inherent, the targets depend on the global counts;
    * persist upstream if it is expensive. `defaultQuota = 0` is
    * unreachable: the targets cover every observed key by construction.
    */
  def temperatureMix(df: DataFrame, idCol: String, keyCol: String,
                     tau: Double, totalBudget: Long,
                     weightScale: Long = 1000000L): DataFrame =
    mixToQuotas(df, idCol, keyCol,
      temperatureTargets(df, keyCol, tau, totalBudget, weightScale),
      defaultQuota = 0L)

  private def threshold(fraction: Double): Long =
    math.floor(fraction * 4294967296.0).toLong

  /** Assign each row to a named split by cumulative hash ranges —
    * `deterministicSplit(df, "doc_id", Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1))`. Weights must sum to 1 (±1e-9).
    */
  def deterministicSplit(df: DataFrame, idCol: String,
                         weights: Seq[(String, Double)],
                         splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val b = hashBucket(col(idCol))
    val cums = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    // last branch is the otherwise — the final threshold is 2^32 exactly
    val assigned = weights.init.zip(cums.init).foldRight(
      lit(weights.last._1): Column) { case (((name, _), cum), els) =>
      when(b < threshold(cum), name).otherwise(els)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Deterministic per-row weighted Bernoulli sample: keep a row iff
    * hashBucket(id) < weight·2³², where `weightCol` ∈ [0,1] may vary per
    * row (e.g. a quality score) — the weighted generalization of
    * [[stratifiedSample]]'s per-stratum constant. Same properties: no
    * seed state, re-partition/engine stable, pure narrow filter. The
    * compare runs in binary64 (hashBucket < 2³² is exactly
    * representable), so any engine reproduces the decision bit-for-bit
    * given the same weight expression.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String): DataFrame =
    df.filter(hashBucket(col(idCol)).cast("double") <
      col(weightCol).cast("double") * 4294967296.0)

  /** Keep a deterministic `fraction` of rows per stratum (stratum missing
    * from the map → `defaultFraction`). The per-stratum decision is the
    * same integer compare as [[deterministicSplit]], so a row's fate never
    * depends on which other rows exist.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    val thr = fractions.foldRight(lit(threshold(defaultFraction)): Column) {
      case ((stratum, f), els) =>
        when(col(stratumCol) === stratum, threshold(f)).otherwise(els)
    }
    df.filter(hashBucket(col(idCol)) < thr)
  }
}
