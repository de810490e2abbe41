package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot storage: atomic commits, versioned reads
  * (time travel), snapshot-isolated compaction, and orphan-file vacuum
  * over plain parquet — the minimal table format that closes the gap
  * [[Layout.compactSmallFiles]]'s scaladoc names explicitly ("concurrent
  * readers racing the one rename window need table-format-level
  * atomicity this plain-directory layout cannot provide").
  *
  * Layout:
  * {{{
  *   table/
  *     _manifests/v00000001.txt   -- one relative data-file path per line
  *     data/<commit-uuid>/part-*.parquet
  * }}}
  *
  * The protocol (the same core idea as the log-structured lakehouse
  * formats, reduced to its load-bearing minimum):
  *
  *   1. A commit first writes its data files under a fresh unique
  *      directory — INVISIBLE to every reader, because readers resolve
  *      files through manifests only, never by listing `data/`.
  *   2. It then publishes manifest v(N+1) with create-if-absent
  *      semantics. Readers see v(N) or v(N+1), never anything between;
  *      a crash before publish leaves only an orphan data directory
  *      (reclaimed by [[vacuum]]), never a torn table.
  *   3. Concurrent committers race on the SAME manifest name; exactly
  *      one create succeeds, the loser re-reads the new head and
  *      retries — an append therefore serializes against every other
  *      commit (its base file list is re-resolved each attempt). The
  *      create-if-absent slot: `link(2)` on local filesystems, native
  *      `create(overwrite = false)` on HDFS, a conditional put on
  *      object stores (see [[publish]]).
  *
  * Why a manifest instead of directory listing, at 100 TB: a million-file
  * table costs a million-object LIST per query planning pass on an object
  * store (rate-limited, eventually consistent on some), while the
  * manifest is ONE driver-side read of a few MB handed straight to the
  * parquet scan as an explicit file list; `mergeSchema`-style drift,
  * half-written files, and the compact/rename races all disappear
  * because the file set is closed at commit time. Overwrites never
  * delete data — old versions stay readable (time travel, audit,
  * reproducible training runs pin a version) until [[vacuum]] reclaims
  * them explicitly.
  *
  * Data skipping: a commit made with `statsCol` records per-file
  * (min, max) of one long column in the manifest, and [[readPruned]]
  * skips non-overlapping files at PLANNING time — no footer open, no
  * GET. Compose with a range-clustered layout (repartitionByRange /
  * Z-order / Hilbert staging) for disjoint per-file ranges.
  *
  * Kept deliberately out: schema evolution metadata
  * ([[Formats.readParquetMerged]]'s contract) and multi-table
  * transactions.
  */
object Snapshots {

  private val ManifestDir = "_manifests"
  private val DataDir = "data"

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(table: String, v: Int): Path =
    new Path(table, f"$ManifestDir/v$v%08d.txt")

  /** Committed versions, ascending (empty for a table with no commits). */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val dir = new Path(table, ManifestDir)
    val f = fs(spark, table)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{8}\\.txt") =>
        n.substring(1, 9).toInt }
      .sorted.toSeq
  }

  private def manifestLines(spark: SparkSession, table: String, v: Int): Seq[String] = {
    val in = fs(spark, table).open(manifestPath(table, v))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
    } finally in.close()
  }

  /** One manifest data entry: a relative file path, optionally carrying
    * committed (min, max) stats of the commit's stats column.
    */
  final case class Entry(path: String, stats: Option[(Long, Long)])

  private def parseEntry(line: String): Entry = line.split('\t') match {
    case Array(p)         => Entry(p, None)
    case Array(p, lo, hi) => Entry(p, Some((lo.toLong, hi.toLong)))
    case _ => sys.error(s"malformed manifest line: $line")
  }

  /** Raw data lines of version `v` (header lines skipped; stats
    * preserved verbatim) — the base a successor manifest appends to.
    */
  private def manifestDataLines(spark: SparkSession, table: String, v: Int): Seq[String] =
    manifestLines(spark, table, v).filterNot(_.startsWith("#"))

  /** Parsed data entries of version `v`. */
  private def manifestEntries(spark: SparkSession, table: String, v: Int): Seq[Entry] =
    manifestDataLines(spark, table, v).map(parseEntry)

  /** Relative data-file paths of version `v` (stats dropped). */
  private def manifestFiles(spark: SparkSession, table: String, v: Int): Seq[String] =
    manifestEntries(spark, table, v).map(_.path)

  /** The commit tokens recorded by [[commitAppendOnce]] across live
    * (non-vacuumed) versions — bounded to the most recent `lastK`
    * manifests when given. Without the bound a long-running streaming
    * sink would pay O(versions) manifest reads PER COMMIT (quadratic
    * over the stream's life); with it, token dedup costs O(horizon),
    * which matches the replay reality — a retried micro-batch is always
    * within the source's checkpoint horizon of the head, never 10⁵
    * commits back.
    */
  def committedTokens(spark: SparkSession, table: String,
                      lastK: Option[Int] = None): Set[String] = {
    val vs = versions(spark, table)
    val scan = lastK.fold(vs)(k => vs.takeRight(k))
    scan.flatMap(v => manifestLines(spark, table, v)
      .collect { case l if l.startsWith(TokenHeader) =>
        l.substring(TokenHeader.length) }).toSet
  }

  private val TokenHeader = "# token="

  /** Read a snapshot: the given version, or the latest. The scan gets an
    * explicit closed file list — no directory listing, no risk of seeing
    * a concurrent commit's half-written files.
    */
  def read(spark: SparkSession, table: String, version: Option[Int] = None): DataFrame = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"$table has no committed versions")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"$table has no version $v (have ${vs.mkString(",")})")
    val files = manifestFiles(spark, table, v)
    require(files.nonEmpty,
      s"$table v$v is an empty snapshot (no schema to scan); commit a " +
        "non-empty DataFrame or read a different version")
    spark.read.parquet(files.map(rel => new Path(table, rel).toString): _*)
  }

  /** Stage `df` as parquet under a fresh unique data directory and
    * return its manifest lines (paths relative to the table root). With
    * `statsCol` set, each line carries the file's (min, max) of that
    * LONG column — computed in ONE grouped pass over the just-staged
    * files (driver traffic = one row per file, the same order as the FS
    * listing below). Files with no non-null values stay stats-less and
    * are conservatively kept by every pruned read.
    */
  private def stage(spark: SparkSession, table: String, df: DataFrame,
                    statsCol: Option[String] = None): Seq[String] = {
    val commitId = java.util.UUID.randomUUID().toString
    val rel = s"$DataDir/$commitId"
    df.write.parquet(new Path(table, rel).toString)
    val rels = fs(spark, table).listStatus(new Path(table, rel))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$rel/${s.getPath.getName}").sorted.toSeq
    statsCol match {
      case None => rels
      case Some(c) =>
        import org.apache.spark.sql.functions.{col, input_file_name, max, min}
        val stats = spark.read.parquet(new Path(table, rel).toString)
          .groupBy(input_file_name().as("__f"))
          .agg(min(col(c)).cast("long").as("__lo"),
            max(col(c)).cast("long").as("__hi"))
          .collect()
          .filterNot(r => r.isNullAt(1) || r.isNullAt(2))
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
        rels.map { r =>
          val name = r.split('/').last
          stats.collectFirst {
            case (f, (lo, hi)) if f.endsWith("/" + name) => s"$r\t$lo\t$hi"
          }.getOrElse(r)
        }
    }
  }

  /** Publish `files` as the next version on top of head `base`; returns
    * the committed version. `base(headAtRetry)` recomputes the full file
    * list from whatever head the winning racer left — append semantics
    * stay serializable without locks.
    *
    * The create-if-absent slot is scheme-dependent: on a LOCAL fs the
    * manifest is fully written to a dot-tmp sibling and published with
    * `link(2)` — POSIX's atomic fail-if-exists of a complete file
    * (Hadoop's RawLocalFileSystem `create(overwrite = false)` is
    * check-THEN-create, so two racers could both "win" and one append
    * would vanish; caught by the concurrent-committer spec under suite
    * load). On HDFS `create(overwrite = false)` is atomic natively; on
    * object stores the slot maps to a conditional put.
    */
  private def publish(spark: SparkSession, table: String,
                      base: Option[Int] => Seq[String]): Int = {
    val f = fs(spark, table)
    var attempt = 0
    while (attempt < 50) {
      val head = versions(spark, table).lastOption
      val next = head.getOrElse(0) + 1
      val lines = base(head)
      val tgt = manifestPath(table, next)
      f.mkdirs(tgt.getParent)
      val bytes = (lines.mkString("\n") + "\n").getBytes("UTF-8")
      val scheme = tgt.toUri.getScheme
      val won =
        if (scheme == null || scheme == "file") {
          val dir = java.nio.file.Paths.get(
            f.makeQualified(tgt).toUri.getPath).getParent
          val tmp = dir.resolve(
            s".${tgt.getName}.${java.util.UUID.randomUUID()}.tmp")
          java.nio.file.Files.write(tmp, bytes)
          try {
            java.nio.file.Files.createLink(dir.resolve(tgt.getName), tmp)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          } finally java.nio.file.Files.deleteIfExists(tmp)
        } else {
          try {
            val out = f.create(tgt, false)
            try out.write(bytes) finally out.close()
            true
          } catch { case _: java.io.IOException => false }
        }
      if (won) return next
      attempt += 1
    }
    sys.error(s"could not commit to $table after 50 attempts")
  }

  /** Commit `df` as a full replacement snapshot. Old versions remain
    * readable until vacuumed. Returns the new version number. With
    * `statsCol`, the manifest carries per-file (min, max) of that long
    * column for [[readPruned]]'s manifest-level file skipping.
    */
  def commitOverwrite(spark: SparkSession, table: String, df: DataFrame,
                      statsCol: Option[String] = None): Int = {
    val staged = stage(spark, table, df, statsCol)
    publish(spark, table, _ => staged)
  }

  /** The head snapshot's column (name, type) sequence, or None for an
    * empty table — read from ONE committed file's footer.
    */
  private def headShape(spark: SparkSession, table: String): Option[Seq[(String, String)]] =
    versions(spark, table).lastOption
      .flatMap(v => manifestFiles(spark, table, v).headOption)
      .map(rel => spark.read.parquet(new Path(table, rel).toString)
        .schema.map(f => (f.name, f.dataType.simpleString)))

  /** Reject an append whose columns don't match the head snapshot —
    * a mismatched append succeeds silently TODAY and breaks every
    * LATER read of any version containing it (parquet schema union at
    * scan time), which is the worst possible failure distance.
    * Nullability is deliberately not compared; names and types are.
    */
  private def requireShape(spark: SparkSession, table: String, df: DataFrame): Unit =
    headShape(spark, table).foreach { want =>
      val got = df.schema.map(f => (f.name, f.dataType.simpleString))
      require(got == want,
        s"append schema ${got.mkString(",")} does not match $table's head " +
          s"snapshot ${want.mkString(",")}; commitOverwrite starts a new shape")
    }

  /** Commit `df` appended to the (retry-time) head snapshot. */
  def commitAppend(spark: SparkSession, table: String, df: DataFrame,
                   statsCol: Option[String] = None): Int = {
    requireShape(spark, table, df)
    val staged = stage(spark, table, df, statsCol)
    publish(spark, table, head =>
      head.map(manifestDataLines(spark, table, _)).getOrElse(Seq.empty) ++ staged)
  }

  /** Range read with MANIFEST-LEVEL file skipping: plans only the files
    * whose committed (min, max) stats can overlap [lo, hi] — a skipped
    * file costs NOTHING, not even a footer open (parquet row-group
    * pruning still needs to open every file; an object-store GET per
    * footer is the planning cost this removes at 10⁶ files). Commit
    * with `statsCol` + a range-clustered layout (repartitionByRange /
    * Z-order / Hilbert) to make per-file ranges disjoint and the
    * skipping sharp. Correctness NEVER rests on the stats: stats-less
    * entries are always read, and the range predicate is re-applied to
    * every surviving row — stale or absent stats only cost speed.
    */
  def readPruned(spark: SparkSession, table: String, statsCol: String,
                 lo: Long, hi: Long, version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(lo <= hi, s"need lo <= hi, got $lo > $hi")
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"$table has no committed versions")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"$table has no version $v (have ${vs.mkString(",")})")
    val entries = manifestEntries(spark, table, v)
    require(entries.nonEmpty, s"$table v$v is an empty snapshot")
    val kept = entries.filter(_.stats.forall { case (l, h) => h >= lo && l <= hi })
    val base =
      if (kept.isEmpty) read(spark, table, Some(v)).limit(0)
      else spark.read.parquet(kept.map(e => new Path(table, e.path).toString): _*)
    base.filter(col(statsCol) >= lo && col(statsCol) <= hi)
  }

  /** Exactly-once append for replayable sources (streaming foreachBatch):
    * the commit records `token` (e.g. the micro-batch id) in its
    * manifest, and a replay of an already-committed token is a NO-OP —
    * the crash window between a successful manifest publish and the
    * caller's acknowledgment is closed by the manifest itself. Returns
    * Some(version) if committed, None if the token had already landed.
    * One writer per token (a streaming query owns its sink); two racing
    * writers with the SAME token are out of contract.
    */
  def commitAppendOnce(spark: SparkSession, table: String, df: DataFrame,
                       token: String, replayHorizon: Int = 128): Option[Int] = {
    require(!token.contains("\n") && !token.contains("\r"),
      "token must be single-line")
    require(replayHorizon >= 1, "replayHorizon must be >= 1")
    // horizon-bounded dedup scan: O(horizon) manifest reads per commit
    // instead of O(versions) — see committedTokens. Tokens older than
    // the horizon are forgotten for dedup, which matches the source's
    // own replay bound (a streaming checkpoint never replays a batch
    // from 10⁵ commits ago).
    if (committedTokens(spark, table, Some(replayHorizon)).contains(token))
      return None
    requireShape(spark, table, df)
    val staged = stage(spark, table, df)
    Some(publish(spark, table, head =>
      (TokenHeader + token) +:
        (head.map(manifestDataLines(spark, table, _)).getOrElse(Seq.empty) ++ staged)))
  }

  /** Incremental read: the rows ADDED between `fromVersion` (exclusive)
    * and `toVersion` (inclusive, default head) — the files `toVersion`
    * references that `fromVersion` does not. This is THE primitive an
    * incremental pipeline wants ("process only what landed since the
    * version I last consumed"): cost is proportional to the DELTA, not
    * the table, and no per-row timestamps or CDC columns are needed —
    * the manifest diff IS the change log. Contract: valid for
    * APPEND-range histories (append and compactCommit never remove a
    * live row's file from later manifests without rewriting it; an
    * OVERWRITE in the range breaks "new files = new rows" and is
    * rejected by checking containment).
    */
  def readChangesBetween(spark: SparkSession, table: String,
                         fromVersion: Int,
                         toVersion: Option[Int] = None): DataFrame = {
    val vs = versions(spark, table)
    val to = toVersion.getOrElse(vs.last)
    require(vs.contains(fromVersion) && vs.contains(to) && fromVersion <= to,
      s"need committed versions from<=to, got $fromVersion..$to of ${vs.mkString(",")}")
    val before = manifestDataLines(spark, table, fromVersion)
    val after = manifestDataLines(spark, table, to)
    require(before.forall(after.contains),
      s"$table v$fromVersion..v$to is not an append range (a file of " +
        s"v$fromVersion is gone by v$to — an overwrite or compaction " +
        "rewrote history); read full snapshots instead")
    val added = after.filterNot(before.toSet).map(parseEntry(_).path)
    if (added.isEmpty) // legitimate: token-only or empty-batch commits
      read(spark, table, Some(to)).limit(0)
    else
      spark.read.parquet(added.map(rel => new Path(table, rel).toString): _*)
  }

  /** Snapshot-isolated compaction: rewrite the head snapshot into
    * `ceil(bytes / targetFileBytes)` files and commit the result as a
    * NEW version. Unlike [[Layout.compactSmallFiles]]' rename swap there
    * is no reader-visible window at all — concurrent readers keep
    * resolving the old manifest; the old files stay until [[vacuum]].
    */
  def compactCommit(spark: SparkSession, table: String,
                    targetFileBytes: Long): Int =
    maintenanceCommit(spark, table, targetFileBytes,
      (df, n) => df.repartition(n), statsCol = None)

  /** The OPTIMIZE move: compaction + range-clustering + stats refresh in
    * ONE committed version — the head snapshot rewritten into
    * size-targeted files that are range-partitioned and locally sorted
    * on `orderCol`, with per-file (min, max) recorded for
    * [[readPruned]]. The maintenance pass that turns a table fragmented
    * by streaming appends (each with interleaved key ranges, so pruning
    * skips nothing) back into a sharply skippable layout, under the same
    * no-reader-visible-window protocol as every other commit.
    */
  def compactCommitOrdered(spark: SparkSession, table: String,
                           targetFileBytes: Long, orderCol: String): Int = {
    import org.apache.spark.sql.functions.col
    maintenanceCommit(spark, table, targetFileBytes,
      (df, n) => df.repartitionByRange(n, col(orderCol))
        .sortWithinPartitions(orderCol),
      statsCol = Some(orderCol))
  }

  private def maintenanceCommit(spark: SparkSession, table: String,
                                targetFileBytes: Long,
                                arrange: (DataFrame, Int) => DataFrame,
                                statsCol: Option[String]): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val head = versions(spark, table).lastOption
      .getOrElse(sys.error(s"$table has no committed versions"))
    val files = manifestFiles(spark, table, head)
    val f = fs(spark, table)
    val bytes = files.map(r => f.getFileStatus(new Path(table, r)).getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val staged = stage(spark, table, arrange(read(spark, table), n), statsCol)
    // commit on TOP OF the head we compacted: if someone else committed
    // meanwhile, compacting over it would silently drop their commit —
    // fail instead (compaction is maintenance; rerun it)
    publish(spark, table, h => {
      require(h.contains(head),
        s"concurrent commit during compaction (head moved $head -> $h); rerun")
      staged
    })
  }

  /** Reclaim space: drop all manifests BELOW `keepFrom` and delete every
    * data file no remaining manifest references (including orphans from
    * crashed commits). Returns the number of deleted data files. Time
    * travel to vacuumed versions is gone — that is the point. A dropped
    * manifest also forgets its [[commitAppendOnce]] token, so keep the
    * retention horizon longer than any source's replay horizon (a
    * streaming checkpoint bounds replays far tighter in practice).
    */
  def vacuum(spark: SparkSession, table: String, keepFrom: Int): Int = {
    val f = fs(spark, table)
    val (drop, keep) = versions(spark, table).partition(_ < keepFrom)
    require(keep.nonEmpty, s"vacuum would drop every version of $table")
    val referenced = keep.flatMap(manifestFiles(spark, table, _)).toSet
    drop.foreach(v => f.delete(manifestPath(table, v), false))
    val dataRoot = new Path(table, DataDir)
    if (!f.exists(dataRoot)) return 0
    var deleted = 0
    f.listStatus(dataRoot).filter(_.isDirectory).foreach { d =>
      val dirRel = s"$DataDir/${d.getPath.getName}"
      val live = f.listStatus(d.getPath).filter(_.isFile).filter { s =>
        val rel = s"$dirRel/${s.getPath.getName}"
        if (referenced.contains(rel)) true
        else { f.delete(s.getPath, false); deleted += 1; false }
      }
      if (live.isEmpty) f.delete(d.getPath, true) // now-empty commit dir
    }
    deleted
  }
}
