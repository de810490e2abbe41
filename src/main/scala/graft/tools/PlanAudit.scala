package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan-shape audit: for every `SparkEntry` query, count the
  * scale-relevant physical operators in its plan and dump one markdown
  * table — the evidence behind SURVEY.md §2.4's scale claims, regenerable
  * with:
  *
  * {{{
  * sbt 'runMain graft.tools.PlanAudit /root/testdata/sf0.001 PLAN_AUDIT.md'
  * }}}
  *
  * Counting is STRUCTURAL, not a regex over `executedPlan.toString` —
  * that string inlines the full cached plan under EVERY
  * `InMemoryTableScan` that references it (a cache read twice re-prints
  * its build plan twice → overcounts), and it cannot see work that ran
  * eagerly while the query function was CONSTRUCTING its DataFrame (the
  * connected-components fast path counts/collects its pair pipeline
  * before returning → undercounts to zero). Two mechanisms fix the two
  * blind spots:
  *
  *  1. a [[QueryExecutionListener]] records every action executed during
  *     `fn(spark, sfDir)` construction, and those executed plans are
  *     audited alongside the final plan (the `eager execs` column says
  *     how many there were);
  *  2. traversal descends `AdaptiveSparkPlanExec.initialPlan` (AQE roots
  *     have no children pre-execution) and each DISTINCT
  *     `InMemoryRelation.cachedPlan` exactly ONCE per query — identity
  *     set shared across all of the query's executions — so an exchange
  *     under a persisted subtree is counted the one time it runs, no
  *     matter how many scans reference the cache.
  *
  * Columns: hash-exchanges (shuffles), broadcast joins, sort-merge joins,
  * products (nested-loop/cartesian — should be brute-force cosine only),
  * parquet scans with non-empty pushed filters / total scans, UDF nodes
  * (should be 0 outside the sanctioned Bloom probe), and the
  * construction-time execution count.
  */
object PlanAudit {

  /** Append one line per physical node to `buf`, descending AQE roots and
    * unseen cached plans; `seenCached` is identity-keyed and shared
    * across a query's executions so each cached subtree prints once.
    */
  private def nodeLines(root: SparkPlan,
                        seenCached: java.util.IdentityHashMap[SparkPlan, java.lang.Boolean],
                        buf: StringBuilder): Unit = root match {
    case a: AdaptiveSparkPlanExec => nodeLines(a.initialPlan, seenCached, buf)
    case p =>
      buf.append(p.simpleString(120)).append('\n')
      p match {
        case s: InMemoryTableScanExec =>
          val cp = s.relation.cachedPlan
          if (seenCached.put(cp, java.lang.Boolean.TRUE) == null)
            nodeLines(cp, seenCached, buf)
        case _ =>
      }
      p.children.foreach(nodeLines(_, seenCached, buf))
  }

  /** One-line-per-node rendering of a single plan with each distinct
    * cached subtree expanded exactly once — the audit's counting surface,
    * exposed so plan-shape tests can pin TRUE one-execution counts for
    * persisted pipelines (raw `toString` re-inlines a cached build plan
    * under every scan that references it).
    */
  def flattenPlan(root: SparkPlan): String = {
    val sb = new StringBuilder
    nodeLines(root, new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean](), sb)
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLAN_AUDIT.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(hay: String, needle: String): Int = needle.r.findAllIn(hay).size
    // optional third arg: comma-separated query names — audit a subset
    // while iterating on one pipeline instead of executing all ~120
    val only = args.lift(2).map(_.split(",").toSet)
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // capture actions the query function runs while BUILDING its result
      // (cache materialization, CC fast-path collects): each is a real
      // executed job whose plan belongs in this query's audit
      val constructed = new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]()
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = { constructed.add(qe); () }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      }
      // drain the ASYNC listener bus before registering: the previous
      // query's runtime collect()s otherwise deliver late into THIS
      // query's listener, and the audit picks up a neighbor's plans —
      // the run-order-dependent count drift ADVICE r13 flagged
      // (dedup_exact inheriting dedup_e2e_md5's shuffles)
      org.apache.spark.sql.graftbridge.Bridge.waitListenerBusEmpty(spark)
      spark.listenerManager.register(listener)
      try {
        val df = fn(spark, sfDir)
        val qe = df.queryExecution
        // the listener bus is async — wait until the queue has been stable
        // for a few polls (construction actions themselves finished before
        // fn returned; only event delivery can lag)
        var stable = 0; var last = -1
        while (stable < 3) {
          Thread.sleep(100)
          val n = constructed.size()
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
        val seenCached = new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]()
        val sb = new StringBuilder
        constructed.forEach(c => nodeLines(c.executedPlan, seenCached, sb))
        nodeLines(qe.executedPlan, seenCached, sb)
        val plan = sb.toString
        val scans = count(plan, "Scan parquet")
        val pushed = count(plan, "PushedFilters: \\[[^\\]]")
        // Scala UDFs render as "UDF(" in plan strings only when unnamed
        // (ScalaUDF.toString prints the udf NAME); a registered/named udf
        // prints its own name and the regex misses it. So ALSO walk the
        // analyzed plan's expression trees and count ScalaUDF instances
        // structurally — name-proof. (Class-name match avoids importing
        // the catalyst type; subquery plans nested inside expressions are
        // not descended into, but no query here uses them.)
        val structuralUdfs = qe.analyzed.map(node =>
          node.expressions.map(_.collect {
            case e if e.getClass.getSimpleName == "ScalaUDF" => e
          }.size).sum).sum
        // snapshot the construction-time action count BEFORE the runtime
        // collect below adds its own execution to the queue
        val eagerExecs = constructed.size()
        // RUNTIME columns: execute through this df's own QueryExecution
        // (a write would spawn a fresh one and leave this plan
        // un-finalized) and read the finalized adaptive plan — the only
        // view where AQE's cross-branch shuffle-stage reuse is visible.
        // `live` counts exchanges that actually executed; `reused` counts
        // branches served by another branch's already-materialized stage.
        val (live, reused) = try {
          df.collect()
          val finalSection = qe.executedPlan.toString
            .split("== Initial Plan ==").head
          val r = count(finalSection, "ReusedExchange")
          val l = finalSection.linesIterator.count(ln =>
            ln.contains("Exchange hashpartitioning") && !ln.contains("ReusedExchange"))
          (l.toString, r.toString)
        } catch { case _: Throwable => ("ERR", "ERR") }
        Seq(name,
          count(plan, "Exchange hashpartitioning").toString,
          count(plan, "BroadcastHashJoin").toString,
          count(plan, "SortMergeJoin").toString,
          (count(plan, "BroadcastNestedLoopJoin") + count(plan, "CartesianProduct")).toString,
          s"$pushed/$scans",
          (count(plan, "BatchEvalPython") +
            math.max(count(plan, "\\bUDF\\("), structuralUdfs)).toString,
          eagerExecs.toString,
          live, reused)
      } catch {
        case e: Throwable => Seq(name, "ERR", "", "", "", "", e.getClass.getSimpleName, "", "", "")
      } finally spark.listenerManager.unregister(listener)
    }
    val header = Seq("query", "shuffles", "broadcast joins", "sort-merge joins",
      "products", "pushed-filter scans", "UDF nodes", "eager execs",
      "runtime live shuffles", "runtime reused")
    // provenance stamp: the commit of the tree these plans came from, so
    // a round-bumped but never-re-run artifact is detectable by content
    // (ADVICE r9/VERDICT r10 staleness point). Dirty trees are marked.
    val commit = try {
      val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
        .redirectErrorStream(true).start()
      val h = new String(p.getInputStream.readAllBytes()).trim
      val d = new ProcessBuilder("git", "status", "--porcelain").start()
      // the audit artifact itself is expected to differ while being
      // regenerated — only OTHER modifications make the stamp untrustworthy
      val outName = Paths.get(out).getFileName.toString
      val dirty = new String(d.getInputStream.readAllBytes()).linesIterator
        .exists(l => l.trim.nonEmpty && !l.endsWith(outName))
      if (p.waitFor() == 0) h + (if (dirty) " (dirty tree)" else "") else "unknown"
    } catch { case _: Throwable => "unknown" }
    val md = new StringBuilder
    md ++= "# Plan audit (generated by graft.tools.PlanAudit)\n\n"
    md ++= s"Measured at commit: `$commit`\n\n"
    md ++= s"Source: `$sfDir` — structural node counts over the query's static\n"
    md ++= "(pre-execution) physical plan PLUS every action executed during query\n"
    md ++= "construction (`eager execs`); each distinct cached subplan is counted\n"
    md ++= "exactly once per query. AQE may coalesce/re-plan at runtime, only ever\n"
    md ++= "reducing these counts. The two `runtime` columns come from EXECUTING\n"
    md ++= "the query and reading its finalized adaptive plan: `live` exchanges\n"
    md ++= "actually ran; `reused` branches were served by another branch's\n"
    md ++= "already-materialized shuffle stage (AQE stage reuse — invisible in\n"
    md ++= "static plans, and the mechanism the un-persisted multi-consumer\n"
    md ++= "pipelines rely on).\n\n"
    md ++= header.mkString("| ", " | ", " |\n")
    md ++= header.map(_ => "---").mkString("| ", " | ", " |\n")
    rows.foreach(r => md ++= r.mkString("| ", " | ", " |\n"))
    Files.writeString(Paths.get(out), md.toString)
    println(s"[graft] wrote plan audit for ${rows.size} queries to $out")
    spark.stop()
  }
}
