package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph centrality for crawl-scale corpus curation: rank pages by
  * the structure of who links to whom, the standard signal for deciding
  * which slice of a 100 TB crawl is worth keeping (seed-list quality,
  * crawl frontier ordering, per-domain quality priors).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic end to end: ranks are
  * scaled longs (`totalScale` = total rank mass, default 1e12), each
  * edge carries `rank div outdeg`, damping is `(num * x) div den`. Two
  * reasons, both load-bearing:
  *   - Exactness/portability: long sums are associative — the result is
  *     bit-identical regardless of partitioning, task order, or engine,
  *     so a SQL oracle can replay the iteration literally. Double-based
  *     PageRank differs per shuffle order and can never be hash-gated.
  *   - Scale: the iterating state is (id long, rank long) — 16 bytes a
  *     node, no growth across iterations.
  *
  * Semantics per iteration (Page et al. 1998, the dangling-mass
  * redistribution variant): every node's rank splits evenly over its
  * out-edges (integer division truncates; parallel edges count twice —
  * multigraph semantics); nodes with NO out-edges (dangling) donate
  * their whole rank to the uniform pool; then
  * `rank' = teleport + (num * (inflow + danglingShare)) div den` with
  * `teleport = ((den-num) * totalScale) div (den * n)` and
  * `danglingShare = danglingMass div n`. Truncation bleeds a few units
  * of mass per iteration (bounded by n + outdeg sum) — irrelevant for
  * ranking and identical in any faithful replay.
  *
  * Scale shape: out-degrees are joined to the edge list ONCE and the
  * result is hash-partitioned by `src` and lineage-cut — the big,
  * loop-invariant side never reshuffles. Each iteration is the
  * canonical two-exchange pair (ranks re-key to `src` for the
  * contribution join, contributions re-key to `dst` for the sum) plus a
  * 1-row dangling-mass aggregate that re-enters as a broadcast — no
  * driver-side collect in the loop. Ranks are localCheckpoint'd each
  * iteration so plan depth and carried stats stay O(1) in the iteration
  * count (same rationale as [[Components.connectedComponents]]).
  */
object LinkGraph {

  /** (id, rank) for every node in `nodes`, after `iters` synchronous
    * power-iteration rounds. `rank` is a long on the `totalScale` scale
    * (sum over nodes ≈ totalScale). Edges pointing outside `nodes` leak
    * their mass (standard open-web semantics); callers wanting a closed
    * graph should pre-filter edges.
    *
    * `reset`: optional personalization vector (must expose `idCol` and
    * a `weight` column) — the TrustRank/topic-sensitive variant. Teleport mass AND dangling mass
    * redistribute proportionally to weight instead of uniformly
    * (`teleport_i = ((den-num)·scale·w_i) div (den·W)`,
    * `danglingShare_i = (dm·w_i) div W`), so rank flows outward from
    * high-weight seed pages — the standard crawl-curation move when a
    * trusted seed list should anchor quality. Weights are small
    * non-negative longs (the product `(den-num)·totalScale·max(w)` must
    * fit a long — fine for weights up to ~1e5 at the default scale);
    * nodes absent from `reset` weigh 0 and receive only link inflow.
    * With no `reset` the math reduces exactly to uniform PageRank
    * (w = 1, W = n).
    */
  def pagerank(edges: DataFrame, nodes: DataFrame,
               srcCol: String, dstCol: String, idCol: String,
               iters: Int,
               totalScale: Long = 1000000000000L,
               dampNum: Long = 85, dampDen: Long = 100,
               reset: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(dampNum > 0 && dampNum < dampDen, "need 0 < dampNum < dampDen")
    val spark = nodes.sparkSession
    val defaultP0 = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // the node table is cached, and CACHED plans keep their build-time
    // shuffle width (AQE does not re-coalesce inside InMemoryRelation by
    // default) — so every per-iteration stage that probes or rebuilds the
    // rank table inherits THIS width for the whole loop. Size it like the
    // edge table below: measured rows / target, capped at the session
    // width. The repartition is a no-op exchange at full width (distinct
    // already leaves hashpartitioning(id, defaultP)).
    val nsRaw = nodes.select(col(idCol).cast("long").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nsRaw.count() // one bounded driver scalar; all per-iteration
    // aggregates stay distributed
    require(n > 0, "empty node set")
    val pn = math.max(1L, math.min(defaultP0.toLong, n / 1000000L + 1L)).toInt
    val ns0 = nsRaw.repartition(pn, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val defaultP = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // materialize the caller's edge pipeline ONCE: it feeds both the
    // out-degree aggregate and the contribution join side, and the count
    // sizes the loop's partitioning (same measured-width discipline as
    // Components.connectedComponents — an iterative loop's per-round cost
    // at small scale is task scheduling, not data, so a 10k-edge graph
    // runs its rounds on 1 partition while a billion-edge graph still
    // gets full parallelism at ~1M edges per partition, capped at the
    // session's shuffle width)
    val e1 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = e1.count()
    val p = math.max(1L, math.min(defaultP.toLong, edgeCount / 1000000L + 1L)).toInt
    // loop-invariant big side: (src, dst, outdeg), pre-keyed by src so
    // the per-round contribution join only moves the narrow rank table
    val deg = e1.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesDeg = e1
      .join(deg, "src")
      .repartition(p, col("src"))
      .localCheckpoint(eager = true)
    // attach the personalization weight (uniform 1 without `reset`, else
    // the caller's `weight` column; absent nodes weigh 0) AND the
    // dangling flag. r20: dangling MEMBERSHIP is loop-invariant, so it
    // rides the node table as a boolean and each round's mass is a
    // flat filtered aggregate over the checkpointed ranks — the old
    // per-round `dangling ⋈ ranks` join (one join + exchange per
    // iteration) is gone.
    val withW = reset match {
      case Some(r) =>
        ns0.join(
          r.select(col(idCol).cast("long").as("id"),
            col("weight").cast("long").as("w")), Seq("id"), "left")
          .select(col("id"), coalesce(col("w"), lit(0L)).as("w"))
      case None => ns0.select(col("id"), lit(1L).as("w"))
    }
    val ns = withW
      .join(deg.select(col("src").as("id"), lit(true).as("__has_out")),
        Seq("id"), "left")
      .select(col("id"), col("w"), col("__has_out").isNull.as("__dang"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bigW = ns.agg(coalesce(sum("w"), lit(0L)).as("s")).head.getLong(0)
    require(bigW > 0, "total reset weight must be positive")
    // driver-side long constants so the SQL literals below never ride on
    // 32-bit intermediate arithmetic (ANSI mode faults int overflow)
    val tnum = (dampDen - dampNum) * totalScale
    val tden = dampDen * bigW
    e1.unpersist(blocking = false)
    var ranks = ns.select(col("id"), col("__dang"), lit(totalScale / n).as("r"))
      .localCheckpoint(eager = true)
    var iter = 0
    while (iter < iters) {
      val contribs = edgesDeg
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      // 1-row mass aggregate, broadcast back in — sum of an empty set is
      // NULL, so a dangling-free graph coalesces to 0; the flag makes it
      // a scan of the checkpointed ranks, never a join (r20)
      val dm = ranks.agg(
        coalesce(sum(org.apache.spark.sql.functions.when(col("__dang"), col("r"))),
          lit(0L)).as("dm"))
      val next = ns
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(dm))
        .select(col("id"), col("__dang"),
          (expr(s"($tnum * w) div $tden") +
            expr(s"($dampNum * (coalesce(c, 0L) + ((dm * w) div $bigW)))" +
              s" div $dampDen")).as("r"))
      val ck = next.localCheckpoint(eager = true)
      ranks = spark.createDataFrame(ck.rdd, ck.schema)
      iter += 1
    }
    ns.unpersist(blocking = false)
    ns0.unpersist(blocking = false)
    nsRaw.unpersist(blocking = false)
    ranks.select(col("id"), col("r").as("rank"))
  }

  /** HITS (Kleinberg): mutually-reinforcing hub and authority scores —
    * the complement to [[pagerank]] for crawl curation, separating
    * navigational HUB pages (link out to good content) from content
    * AUTHORITIES (linked to by good hubs). A directory page scores high
    * hub / low authority; a canonical reference page the reverse —
    * a single centrality can't make that distinction.
    *
    * Same fixed-point integer discipline as [[pagerank]], with HITS'
    * extra wrinkle — per-round normalization — done in integers too:
    * `x_norm = x_raw div max(1, (Σx_raw) div scale)`, which keeps every
    * normalized score in [0, scale] and is exactly replayable in SQL
    * (`greatest(1, …)` guards the sub-scale-total case). Raw sums are
    * bounded by `edges · scale`, so the default 1e6 scale is safe to
    * ~1e12 edges. Per round: authority(v) = Σ hub(u) over in-edges,
    * normalize; hub(u) = Σ authority(v) over out-edges, normalize.
    *
    * Scale shape: TWO lineage-cut edge copies, one hash-partitioned by
    * `src` (for the hub-side join) and one by `dst` (authority side), so
    * neither per-round join reshuffles the edge list — only the narrow
    * (id, score) tables and the grouped partial sums move; the two
    * normalization totals are 1-row aggregates re-entering as
    * broadcasts. Both score tables are localCheckpoint'd per round.
    */
  def hits(edges: DataFrame, nodes: DataFrame,
           srcCol: String, dstCol: String, idCol: String,
           iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val spark = nodes.sparkSession
    val defaultP = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // same measured-width discipline as [[pagerank]]: the persist also
    // stops the caller's edge pipeline from executing once per keyed copy
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = e0.count()
    val p = math.max(1L, math.min(defaultP.toLong, edgeCount / 1000000L + 1L)).toInt
    val eBySrc = e0.repartition(p, col("src")).localCheckpoint(eager = true)
    val eByDst = e0.repartition(p, col("dst")).localCheckpoint(eager = true)
    e0.unpersist(blocking = false)
    // node table sized to the measured width too (same rationale as
    // [[pagerank]]: cached plans keep their build-time shuffle width, and
    // every per-round stage inherits it)
    val ns = nodes.select(col(idCol).cast("long").as("id")).distinct()
      .repartition(p, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def ck(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(eager = true)
      spark.createDataFrame(c.rdd, c.schema)
    }
    // x_raw -> joined back to all nodes (absent = 0), divided by the
    // broadcast scaled total. `raw` is persisted for the duration of the
    // (eager) checkpoint: it feeds TWO broadcast builds — the 1-row total
    // AND the join side itself (AQE broadcasts the small raw relation) —
    // and Catalyst does not CSE subplans, so without the persist the
    // whole join+aggregate subtree executes once per broadcast.
    // r19: the loop carries only nodes with NONZERO raw sums. A node
    // absent from the per-round aggregate would normalize to 0 and
    // contribute 0 to the next round's sums — algebra-identical to
    // carrying it — so the per-round join back to ALL nodes (a full
    // node-table join + checkpoint every half-round, measured as ~5
    // jobs/half-round of pure scheduling at small scale) happens ONCE at
    // the end instead. What gets checkpointed per half-round is the RAW
    // aggregate (one narrow (id, x) table); the normalized view is a
    // flat projection over that LogicalRDD + the broadcast 1-row total,
    // cheap for both consumers (next round's join, final output).
    def normalize(raw: DataFrame, outCol: String): DataFrame = {
      val r = ck(raw)
      val total = r.agg(coalesce(sum("x"), lit(0L)).as("t"))
      r.crossJoin(broadcast(total))
        .select(col("id"),
          expr(s"x div greatest(1L, t div $scale)").as(outCol))
    }
    var hubs = ns.select(col("id"), lit(scale).as("hub"))
    var auths: DataFrame = null
    var iter = 0
    while (iter < iters) {
      auths = normalize(
        eBySrc.join(hubs.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(sum("hub").as("x")),
        "authority")
      hubs = normalize(
        eByDst.join(auths.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id")).agg(sum("authority").as("x")),
        "hub")
      iter += 1
    }
    // absent = zero, attached once: a node no hub/authority mass ever
    // reached scores 0 under the carried-zeros formulation too. The
    // assembly is checkpointed (one job) so `ns` can be unpinned — the
    // returned plan must not reference the unpersisted cache.
    val out = ck(ns
      .join(hubs, Seq("id"), "left")
      .join(auths, Seq("id"), "left")
      .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("authority"), lit(0L)).as("authority")))
    ns.unpersist(blocking = false)
    out
  }
}
