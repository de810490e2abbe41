package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history maintenance — the versioned-dimension complement of
  * [[Merge]]'s latest-wins snapshot: instead of keeping one row per key,
  * the table keeps every version with its validity interval
  * `[valid_from, valid_to)` (`valid_to` NULL = current). The lakehouse
  * shape for "what did this attribute say at time T" joins (point-in-time
  * feature lookups, label leakage audits, corpus provenance).
  *
  * Semantics: **full per-key timeline rebuild**, not incremental
  * append-only patching. The existing history's versions and the change
  * batch's rows all become candidate versions; per key they are ordered
  * by effective time, consecutive versions with identical attributes
  * collapse to the earliest (run-collapse — re-delivered changes and
  * no-op updates create no new version), and each survivor's `valid_to`
  * is the next survivor's `valid_from`. This makes the operator
  *
  *  - **idempotent**: re-applying a batch is a no-op (duplicate versions
  *    collapse into their run);
  *  - **out-of-order-safe**: a late change with an effective time between
  *    two existing versions splices in and re-closes its predecessor,
  *    where append-only SCD2 silently corrupts the interval;
  *  - **delete-aware**: a change row with op `"d"` becomes a tombstone
  *    version that closes its predecessor and opens nothing; a later
  *    upsert re-opens the key. Closed-tail history (a last version with
  *    non-null `valid_to`) round-trips through rebuild because every
  *    non-null `valid_to` resynthesizes its tombstone — including
  *    mid-history coverage GAPS, which survive rebuild bit-for-bit.
  *
  * Scale shape: ONE key-hash exchange; both window passes (run-collapse
  * `lag`, interval `lead`) and the zero-length filter share the same
  * (key, ts, op, attrs) partition ordering, so Spark plans a single sort
  * over a single shuffle. Per-key cost is the key's own version-history
  * length — inherent to SCD2 (validity intervals are a strictly
  * sequential per-key computation), and bounded in practice by how often
  * a dimension row actually changes, not by corpus size. Equal-ts
  * conflicts resolve deterministically: tombstones sort before upserts
  * (the upsert survives as a zero-length-free version) and attribute
  * struct order breaks exact ties, so the output is engine-stable even
  * on malformed input.
  *
  * Contract: `history` columns = key ++ attrs ++ (`valid_from`,
  * `valid_to`); `changes` columns = key ++ attrs ++ `tsCol` [++ `opCol`,
  * `"u"` upsert / `"d"` delete; omitted = all upserts]. Timestamps are
  * the engine's BIGINT event-time representation. An empty history
  * bootstraps from the change batch alone.
  */
object Scd2 {

  def applyHistory(
      history: DataFrame,
      changes: DataFrame,
      key: Seq[String],
      tsCol: String,
      opCol: Option[String] = None): DataFrame = {
    val histCols = history.columns.toSeq
    require(histCols.contains("valid_from") && histCols.contains("valid_to"),
      "history must carry valid_from/valid_to")
    require(key.forall(histCols.contains), s"key $key must be history columns")
    val attrs = histCols.filterNot(c =>
      key.contains(c) || c == "valid_from" || c == "valid_to")

    // history versions: each row is an upsert version at its valid_from;
    // every non-null valid_to additionally resynthesizes the tombstone
    // that closed it (the rebuild below re-derives contiguous closes as
    // zero-length tombstones and drops them; only REAL gaps/tail-closes
    // survive) — this is what makes rebuild lossless over closed history
    val histVersions = history
      .select((key ++ attrs).map(col) :+ col("valid_from").as("_ts") :+
        lit("u").as("_op"): _*)
    val histTombstones = history.filter(col("valid_to").isNotNull)
      .select((key.map(col) ++
        attrs.map(c => lit(null).cast(history.schema(c).dataType).as(c))) :+
        col("valid_to").as("_ts") :+ lit("d").as("_op"): _*)
    val changeVersions = changes
      .select((key ++ attrs).map(col) :+ col(tsCol).cast("long").as("_ts") :+
        opCol.fold(lit("u"))(c => col(c)).as("_op"): _*)
    val versions = histVersions.unionByName(histTombstones)
      .unionByName(changeVersions)

    // one exchange, one sort: both windows and the zero-length filter
    // ride the same (key | ts, op, attrs) ordering. "d" < "u" makes the
    // upsert win an equal-ts close/open collision (its tombstone
    // predecessor becomes zero-length and is dropped). The ordering
    // struct is materialized ONCE (`_ord`) so the second window's sort
    // requirement is textually the same attribute set and Spark elides
    // its Sort — re-projecting the struct inline per window produces
    // fresh expression IDs and a redundant second in-partition sort.
    val attrStruct = struct(attrs.map(col): _*)
    val state = struct(col("_op"), attrStruct.as("a"))
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_ts"), col("_op"), col("_ord"))
    val collapsed = versions
      .withColumn("_ord", attrStruct)
      .withColumn("_prev", lag(state, 1).over(w))
      // run-collapse: keep the first version of each equal-(op, attrs)
      // run; a tombstone run collapses the same way (one close)
      .filter(col("_prev").isNull || col("_prev") =!= state)
    collapsed
      .withColumn("_next_ts", lead(col("_ts"), 1).over(w))
      .filter(col("_op") =!= "d") // tombstones close predecessors, emit nothing
      .filter(col("_next_ts").isNull || col("_next_ts") =!= col("_ts"))
      .select((key ++ attrs).map(col) :+ col("_ts").as("valid_from") :+
        col("_next_ts").as("valid_to"): _*)
  }

  /** Point-in-time read of an SCD2 history: the dimension exactly as it
    * stood at `ts` — rows whose `[valid_from, valid_to)` interval covers
    * it (open tail = still current). The read-side half of the SCD2
    * contract; a pure filter, so against a stored history table it stays
    * a scan-only operation (pushdown, partition pruning) at any scale.
    */
  def snapshotAt(history: DataFrame, fromCol: String, toCol: String,
                 ts: Long): DataFrame =
    history.filter(col(fromCol) <= ts &&
      (col(toCol).isNull || col(toCol) > ts))

  /** Event-time dimension enrichment — the join the SCD2 history exists
    * FOR: each fact row picks up the dimension version covering its own
    * event time (`valid_from <= factTs < valid_to`, open tail covers
    * forever). No covering version — a pre-history fact or a fact inside
    * a delete gap — attaches NULLs (LEFT-join semantics).
    *
    * Scale shape: because SCD2 intervals are per-key sorted and
    * NON-OVERLAPPING, the covering version, if any, is exactly the as-of
    * match (latest `valid_from <= factTs`) — so this rides
    * [[AsOf.asofJoin]]'s union-window formulation: each fact and each
    * version shuffles exactly ONCE on the key, no interval explode, no
    * range-join candidate blow-up. The cover check then nulls out a
    * match whose version already closed before the fact (`valid_to <=
    * factTs`), turning the as-of answer into the interval-cover answer.
    * A generic interval join could not assume non-overlap and would pay
    * candidate multiplicity; this one is cardinality-preserving by
    * construction (at most one cover per fact).
    *
    * Output: `facts.columns ++ attrs ++ (valid_from, valid_to)`; attrs
    * and bounds NULL when nothing covers. Fact columns must not collide
    * with the history's attr/interval columns (keys are shared).
    */
  def enrichAsOf(facts: DataFrame, history: DataFrame, key: Seq[String],
                 factTsCol: String): DataFrame = {
    val attrs = history.columns.filterNot(c =>
      key.contains(c) || c == "valid_from" || c == "valid_to").toSeq
    val clash = facts.columns.toSet
      .intersect((attrs :+ "valid_from" :+ "valid_to").toSet)
    require(clash.isEmpty,
      s"fact columns collide with history attr/interval columns: $clash")
    val m = col("_dim")
    val covered = m.isNotNull &&
      (m("valid_to").isNull || m("valid_to") > col(factTsCol))
    AsOf.asofJoin(facts, history, key, factTsCol, "valid_from",
        attrs ++ Seq("valid_from", "valid_to"), matchCol = "_dim")
      .select(facts.columns.map(col).toSeq ++
        (attrs ++ Seq("valid_from", "valid_to")).map(c =>
          when(covered, m(c)).as(c)): _*)
  }
}
