package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, StructType}

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
  *     _manifests/v00000001.txt   -- header lines (`# token=`, `# schema=`)
  *                                -- + one data line per file:
  *                                --   relpath[\tcol=kind:lo:hi ...]
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
  * Schema: every commit records the snapshot's schema in the manifest
  * (`# schema=` header, Spark DataType JSON). Reads plan against the
  * COMMITTED schema — no footer reads at planning time, and a file that
  * predates a column null-fills it at scan time, which is what makes
  * ADDITIVE SCHEMA EVOLUTION safe: [[commitAppend]] with
  * `evolve = true` accepts an append that adds new (nullable) trailing
  * columns — old files stay untouched and read back with NULLs in the
  * new columns — or one that omits previously-added trailing columns
  * (its rows null-fill). Type changes, renames, reorders and dropped
  * base columns are always rejected: those rewrite history, which is
  * [[commitOverwrite]]'s job. Time travel across an evolution boundary
  * reads each version under ITS OWN committed schema.
  *
  * Data skipping: a commit made with `statsCols` records per-file
  * (min, max) of each listed column — integral (`long`), `string`
  * (binary/UTF-8 order, matching Spark and DuckDB comparison), or
  * `date` (epoch day) — and [[readPrunedWhere]] plans only the files
  * whose stats can overlap a CONJUNCTION of ranges; skipped files cost
  * no footer open, no GET. Compose with a range-clustered or
  * Hilbert/Z-ordered staging for disjoint per-file ranges. Correctness
  * never rests on the stats (stats-less files always read, predicates
  * re-applied per row).
  *
  * Row-level erasure (GDPR): [[erasePurgeCommit]] rewrites the head
  * snapshot with every row of the requested keys physically dropped —
  * the compaction half of a delete; pair it with a tombstone append
  * through the merge-on-read lane for immediate logical disappearance,
  * then [[vacuum]] past the purge version to make the BYTES leave the
  * table (no remaining data file contains the erased keys —
  * spec-verified by scanning every surviving file).
  *
  * Kept deliberately out: multi-table transactions.
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

  /** Per-file committed (min, max) of one stats column, as the manifest
    * stores it: `kind` is `long` (all integral types), `string`, or
    * `date` (values rendered as epoch days); `lo`/`hi` are the
    * URL-encoded rendered bounds.
    */
  final case class ColStat(kind: String, lo: String, hi: String)

  /** One manifest data entry: a relative file path plus its committed
    * per-column stats (empty for stats-less commits).
    */
  final case class Entry(path: String, stats: Map[String, ColStat])

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def parseEntry(line: String): Entry = {
    val cells = line.split('\t')
    val stats = cells.drop(1).flatMap { cell =>
      // named multi-column cell: name=kind:lo:hi (all URL-encoded).
      // Anything else (incl. the pre-r14 anonymous `lo\thi` pair) parses
      // as no-stats — conservatively read, never wrong, only slower.
      cell.split('=') match {
        case Array(n, v) => v.split(':') match {
          case Array(k, lo, hi) if Set("long", "string", "date")(k) =>
            Some(dec(n) -> ColStat(k, dec(lo), dec(hi)))
          case _ => None
        }
        case _ => None
      }
    }.toMap
    Entry(cells.head, stats)
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
  private val SchemaHeader = "# schema="

  /** The committed schema of version `v` — present on every commit made
    * by this code (tables written before the schema header read back
    * with None and fall back to footer-derived schemas).
    */
  def committedSchema(spark: SparkSession, table: String, v: Int): Option[StructType] =
    manifestLines(spark, table, v).collectFirst {
      case l if l.startsWith(SchemaHeader) =>
        DataType.fromJson(l.substring(SchemaHeader.length)).asInstanceOf[StructType]
    }

  /** Version `v`'s schema: the committed header, else ONE file footer. */
  private def versionSchema(spark: SparkSession, table: String, v: Int): Option[StructType] =
    committedSchema(spark, table, v).orElse(
      manifestFiles(spark, table, v).headOption
        .map(rel => spark.read.parquet(new Path(table, rel).toString).schema))

  /** Top-level fields forced nullable: the stored snapshot schema must
    * admit null-fill for files that predate a column, and must stay
    * valid when a later evolved append writes NULLs into a column an
    * earlier commit declared required.
    */
  private def relaxed(st: StructType): StructType =
    StructType(st.fields.map(_.copy(nullable = true)))

  private def emptyOf(spark: SparkSession, st: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), st)

  private def scan(spark: SparkSession, table: String,
                   schema: Option[StructType], rels: Seq[String]): DataFrame = {
    val paths = rels.map(rel => new Path(table, rel).toString)
    schema match {
      // explicit schema: no footer read at planning time, and files that
      // predate an evolved-in column null-fill it at scan time
      case Some(st) => spark.read.schema(st).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
  }

  private def resolveVersion(spark: SparkSession, table: String,
                             version: Option[Int]): Int = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"$table has no committed versions")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"$table has no version $v (have ${vs.mkString(",")})")
    v
  }

  /** Read a snapshot: the given version, or the latest. The scan gets an
    * explicit closed file list — no directory listing, no risk of seeing
    * a concurrent commit's half-written files — planned under the
    * version's OWN committed schema (time travel across a schema
    * evolution boundary sees each version's shape).
    */
  def read(spark: SparkSession, table: String, version: Option[Int] = None): DataFrame = {
    val v = resolveVersion(spark, table, version)
    val files = manifestFiles(spark, table, v)
    val schema = committedSchema(spark, table, v)
    if (files.isEmpty) {
      require(schema.isDefined,
        s"$table v$v is an empty snapshot with no committed schema; commit " +
          "a non-empty DataFrame or read a different version")
      emptyOf(spark, schema.get)
    } else scan(spark, table, schema, files)
  }

  /** Manifest string stats are TRUNCATED like parquet's column-index
    * bounds — a stats column over long text would otherwise copy whole
    * documents into every manifest line (the manifest must stay a
    * few-MB driver-side read at 10⁶ files). A truncated MIN is safe
    * as-is (a prefix is ≤ every string it prefixes in UTF-8 byte
    * order); a truncated MAX must be bumped STRICTLY ABOVE everything
    * it could stand for: the rightmost incrementable char of the prefix
    * is incremented and the tail dropped (code-point order = UTF-8 byte
    * order, so the bump dominates every extension of the original
    * prefix). A prefix with no incrementable position (all chars at the
    * surrogate boundary) yields None — the file goes stats-less for
    * that column, which pruned reads treat conservatively.
    */
  private val StatsMaxChars = 64

  private def truncateLower(s: String): String =
    if (s.length <= StatsMaxChars) s else s.substring(0, StatsMaxChars)

  private def truncateUpper(s: String): Option[String] = {
    if (s.length <= StatsMaxChars) return Some(s)
    val p = s.substring(0, StatsMaxChars).toCharArray
    var i = p.length - 1
    while (i >= 0) {
      // stay below the surrogate range: c+1 must be a real code point
      // whose UTF-8 encoding compares above c's
      if (p(i) < 0xD7FF.toChar) {
        p(i) = (p(i) + 1).toChar
        return Some(new String(p, 0, i + 1))
      }
      i -= 1
    }
    None
  }

  private def renderStat(v: Any): String = v match {
    case n: java.lang.Number => n.toString
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
    case d: java.time.LocalDate => d.toEpochDay.toString
    case s: String => s
    case other => sys.error(s"unsupported stats value $other")
  }

  private def statKind(c: String, dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "long"
    case StringType => "string"
    case DateType => "date"
    case other => throw new IllegalArgumentException(
      s"statsCols supports integral, string and date columns; $c is $other")
  }

  /** Stage `df` as parquet under a fresh unique data directory and
    * return its manifest lines (paths relative to the table root). With
    * `statsCols` set, each line carries the file's per-column (min, max)
    * — computed in ONE grouped pass over the just-staged files (driver
    * traffic = one row per file, the same order as the FS listing
    * below). A column with no non-null values in a file stays stats-less
    * there and is conservatively kept by every pruned read.
    */
  private def stage(spark: SparkSession, table: String, df: DataFrame,
                    statsCols: Seq[String] = Nil): Seq[String] = {
    val commitId = java.util.UUID.randomUUID().toString
    val rel = s"$DataDir/$commitId"
    df.write.parquet(new Path(table, rel).toString)
    val rels = fs(spark, table).listStatus(new Path(table, rel))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$rel/${s.getPath.getName}").sorted.toSeq
    if (statsCols.isEmpty) rels
    else {
      import org.apache.spark.sql.functions.{col, input_file_name, max, min}
      val reread = spark.read.parquet(new Path(table, rel).toString)
      val kinds = statsCols.map(c =>
        c -> statKind(c, reread.schema(c).dataType)).toMap
      val aggs = statsCols.flatMap(c =>
        Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
      val byFile = reread.groupBy(input_file_name().as("__f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val stats = statsCols.zipWithIndex.flatMap { case (c, i) =>
            val lo = r.get(1 + 2 * i)
            val hi = r.get(2 + 2 * i)
            if (lo == null || hi == null) None
            else if (kinds(c) == "string")
              // bounded manifest cells: truncated lower prefix + bumped
              // upper bound (see truncateUpper); an un-bumpable upper
              // drops the column's stats for this file (conservative)
              truncateUpper(hi.asInstanceOf[String]).map(h =>
                c -> ColStat("string",
                  truncateLower(lo.asInstanceOf[String]), h))
            else Some(c -> ColStat(kinds(c), renderStat(lo), renderStat(hi)))
          }
          r.getString(0) -> stats
        }.toMap
      rels.map { r =>
        val name = r.split('/').last
        val cells = byFile.collectFirst {
          case (f, st) if f.endsWith("/" + name) => st
        }.getOrElse(Seq.empty)
        if (cells.isEmpty) r
        else (r +: cells.map { case (c, st) =>
          s"${enc(c)}=${st.kind}:${enc(st.lo)}:${enc(st.hi)}"
        }).mkString("\t")
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

  private def schemaLine(st: StructType): String = SchemaHeader + st.json

  /** Commit `df` as a full replacement snapshot. Old versions remain
    * readable until vacuumed. Returns the new version number. With
    * `statsCols`, the manifest carries per-file per-column (min, max)
    * for [[readPrunedWhere]]'s manifest-level file skipping.
    */
  def commitOverwrite(spark: SparkSession, table: String, df: DataFrame,
                      statsCols: Seq[String] = Nil): Int = {
    val staged = stage(spark, table, df, statsCols)
    publish(spark, table, _ => schemaLine(relaxed(df.schema)) +: staged)
  }

  /** The snapshot schema an append of `incoming` produces on top of
    * `head` — or a rejection. Without `evolve`, names and types must
    * match exactly (nullability is not compared). With `evolve`, the
    * contract is ADDITIVE evolution on (name, type) prefixes:
    * new trailing columns append (recorded nullable — old files
    * null-fill at read), and an append may omit previously-added
    * trailing columns (its rows null-fill); type changes, renames,
    * reorders and dropped base columns are rejected either way — those
    * rewrite history, which is [[commitOverwrite]]'s job.
    */
  private def evolvedSchema(head: Option[StructType], incoming: StructType,
                            evolve: Boolean, table: String): StructType = {
    val inc = relaxed(incoming)
    head.map(relaxed) match {
      case None => inc
      case Some(h) =>
        def shape(st: StructType) = st.fields.map(f => (f.name, f.dataType)).toSeq
        val hs = shape(h)
        val is = shape(inc)
        if (is == hs) h
        else if (!evolve) throw new IllegalArgumentException(
          s"append schema ${is.mkString(",")} does not match $table's head " +
            s"snapshot ${hs.mkString(",")}; pass evolve = true for additive " +
            "column adds, or commitOverwrite to start a new shape")
        else if (is.startsWith(hs))
          StructType(h.fields ++ inc.fields.drop(hs.length))
        else if (hs.startsWith(is)) h
        else throw new IllegalArgumentException(
          s"append schema ${is.mkString(",")} is not an additive evolution " +
            s"of $table's head snapshot ${hs.mkString(",")}: only ADDING " +
            "trailing nullable columns (or omitting previously-added " +
            "trailing columns) is allowed; type changes, renames and " +
            "reorders need commitOverwrite")
    }
  }

  /** Commit `df` appended to the (retry-time) head snapshot. With
    * `evolve = true`, additive schema evolution is allowed — see
    * [[evolvedSchema]] for the exact contract.
    */
  def commitAppend(spark: SparkSession, table: String, df: DataFrame,
                   statsCols: Seq[String] = Nil,
                   evolve: Boolean = false): Int = {
    // fail fast before paying the staging write; re-validated per retry
    // inside the publish closure (the head — and its schema — may move)
    versions(spark, table).lastOption.foreach(v =>
      evolvedSchema(versionSchema(spark, table, v), df.schema, evolve, table))
    val staged = stage(spark, table, df, statsCols)
    publish(spark, table, head => {
      val snapshot = evolvedSchema(
        head.flatMap(versionSchema(spark, table, _)), df.schema, evolve, table)
      schemaLine(snapshot) +:
        (head.map(manifestDataLines(spark, table, _)).getOrElse(Seq.empty) ++ staged)
    })
  }

  /** A requested stats range for [[readPrunedWhere]] — one per column,
    * combined as a CONJUNCTION. Bounds are inclusive. String bounds
    * compare in binary/UTF-8 order (Spark's and DuckDB's default string
    * comparison); date bounds in epoch days.
    */
  sealed trait StatRange { def column: String }
  final case class LongRange(column: String, lo: Long, hi: Long) extends StatRange {
    require(lo <= hi, s"need lo <= hi, got $lo > $hi")
  }
  final case class StringRange(column: String, lo: String, hi: String) extends StatRange
  final case class DateRange(column: String, lo: java.time.LocalDate,
                             hi: java.time.LocalDate) extends StatRange

  /** Unsigned UTF-8 byte-order comparison — the order Spark's
    * UTF8String and DuckDB's default collation sort strings in (Java's
    * String.compareTo is UTF-16 code-unit order, which DIVERGES on
    * supplementary characters).
    */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def overlaps(st: Option[ColStat], r: StatRange): Boolean = st match {
    case None => true // stats-less file: conservatively read
    case Some(cs) => r match {
      case LongRange(c, lo, hi) =>
        require(cs.kind == "long", s"$c has ${cs.kind} stats, not long")
        cs.hi.toLong >= lo && cs.lo.toLong <= hi
      case StringRange(c, lo, hi) =>
        require(cs.kind == "string", s"$c has ${cs.kind} stats, not string")
        utf8Cmp(cs.hi, lo) >= 0 && utf8Cmp(cs.lo, hi) <= 0
      case DateRange(c, lo, hi) =>
        require(cs.kind == "date", s"$c has ${cs.kind} stats, not date")
        cs.hi.toLong >= lo.toEpochDay && cs.lo.toLong <= hi.toEpochDay
    }
  }

  private def rowPredicate(r: StatRange): Column = {
    import org.apache.spark.sql.functions.{col, lit}
    r match {
      case LongRange(c, lo, hi) => col(c) >= lo && col(c) <= hi
      case StringRange(c, lo, hi) => col(c) >= lit(lo) && col(c) <= lit(hi)
      case DateRange(c, lo, hi) =>
        col(c) >= lit(java.sql.Date.valueOf(lo)) &&
          col(c) <= lit(java.sql.Date.valueOf(hi))
    }
  }

  /** The relative file paths a [[readPrunedWhere]] of `ranges` would
    * plan — exposed so specs and probes can pin the files-touched count
    * without executing the scan.
    */
  def plannedFiles(spark: SparkSession, table: String, ranges: Seq[StatRange],
                   version: Option[Int] = None): Seq[String] = {
    require(ranges.nonEmpty, "at least one range required")
    require(ranges.map(_.column).distinct.size == ranges.size,
      "one range per column")
    val v = resolveVersion(spark, table, version)
    manifestEntries(spark, table, v)
      .filter(e => ranges.forall(r => overlaps(e.stats.get(r.column), r)))
      .map(_.path)
  }

  /** Range read with MANIFEST-LEVEL file skipping over a CONJUNCTION of
    * per-column ranges: plans only the files whose committed per-column
    * (min, max) stats can overlap EVERY range — a skipped file costs
    * NOTHING, not even a footer open (parquet row-group pruning still
    * needs to open every file; an object-store GET per footer is the
    * planning cost this removes at 10⁶ files). Commit with `statsCols` +
    * a range-clustered layout (repartitionByRange / Z-order / Hilbert)
    * to make per-file ranges disjoint and the skipping sharp; a
    * multi-dimensional conjunction prunes sharpest over a Hilbert/
    * Z-order clustering, where every file is tight in EVERY listed
    * dimension. Correctness NEVER rests on the stats: stats-less
    * entries are always read, and every range is re-applied to each
    * surviving row — stale or absent stats only cost speed.
    */
  def readPrunedWhere(spark: SparkSession, table: String,
                      ranges: Seq[StatRange],
                      version: Option[Int] = None): DataFrame = {
    val v = resolveVersion(spark, table, version)
    val entries = manifestEntries(spark, table, v)
    require(entries.nonEmpty || committedSchema(spark, table, v).isDefined,
      s"$table v$v is an empty snapshot")
    val kept = plannedFiles(spark, table, ranges, Some(v))
    val base =
      if (kept.isEmpty) {
        val st = committedSchema(spark, table, v)
        if (st.isDefined) emptyOf(spark, st.get)
        else read(spark, table, Some(v)).limit(0)
      } else scan(spark, table, committedSchema(spark, table, v), kept)
    base.filter(ranges.map(rowPredicate).reduce(_ && _))
  }

  /** Single-long-column pruned range read (the common case). */
  def readPruned(spark: SparkSession, table: String, statsCol: String,
                 lo: Long, hi: Long, version: Option[Int] = None): DataFrame =
    readPrunedWhere(spark, table, Seq(LongRange(statsCol, lo, hi)), version)

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
                       token: String, replayHorizon: Int = 128,
                       evolve: Boolean = false,
                       statsCols: Seq[String] = Nil): Option[Int] = {
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
    versions(spark, table).lastOption.foreach(v =>
      evolvedSchema(versionSchema(spark, table, v), df.schema, evolve, table))
    val staged = stage(spark, table, df, statsCols)
    Some(publish(spark, table, head => {
      val snapshot = evolvedSchema(
        head.flatMap(versionSchema(spark, table, _)), df.schema, evolve, table)
      (TokenHeader + token) +: schemaLine(snapshot) +:
        (head.map(manifestDataLines(spark, table, _)).getOrElse(Seq.empty) ++ staged)
    }))
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
    * rejected by checking containment). The delta reads under
    * `toVersion`'s schema, so a range crossing an additive schema
    * evolution null-fills old-shape rows.
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
    else scan(spark, table, committedSchema(spark, table, to), added)
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
      (df, n) => df.repartition(n), statsCols = Nil)

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
      statsCols = Seq(orderCol))
  }

  private def maintenanceCommit(spark: SparkSession, table: String,
                                targetFileBytes: Long,
                                arrange: (DataFrame, Int) => DataFrame,
                                statsCols: Seq[String]): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val head = versions(spark, table).lastOption
      .getOrElse(sys.error(s"$table has no committed versions"))
    val files = manifestFiles(spark, table, head)
    val f = fs(spark, table)
    val bytes = files.map(r => f.getFileStatus(new Path(table, r)).getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val source = read(spark, table, Some(head))
    val staged = stage(spark, table, arrange(source, n), statsCols)
    // commit on TOP OF the head we compacted: if someone else committed
    // meanwhile, compacting over it would silently drop their commit —
    // fail instead (compaction is maintenance; rerun it)
    publish(spark, table, h => {
      require(h.contains(head),
        s"concurrent commit during compaction (head moved $head -> $h); rerun")
      schemaLine(relaxed(source.schema)) +: staged
    })
  }

  /** Row-level erasure, the PHYSICAL half (GDPR "right to be forgotten"):
    * rewrite the head snapshot with every row whose `keyCol` equals a
    * key in `keys` dropped — merge-on-read tombstones for those keys
    * included — and commit the result as a new version. The protocol a
    * deletion request actually needs is three moves:
    *
    *   1. logical delete NOW: append op='d' tombstones through the
    *      merge-on-read lane ([[commitAppend]]) — O(delta), readers'
    *      latest-wins merge stops surfacing the keys immediately;
    *   2. physical purge: this commit — O(table), the honest price of
    *      removing bytes, scheduled with the other maintenance passes;
    *   3. [[vacuum]] past the purge version — pre-purge files (which
    *      still contain the keys) leave the disk; time travel to them is
    *      gone, which for erasure is the point, so pick the vacuum
    *      horizon from the erasure SLA, not the general retention one.
    *
    * `keys` is a single-column erasure request list — broadcast into
    * the rewrite scan (bounded by contract: it is a request batch, not
    * a data-scale table). NULL keys never match (erasure keys are real
    * identifiers). Returns the purge version.
    */
  def erasePurgeCommit(spark: SparkSession, table: String, keyCol: String,
                       keys: DataFrame, statsCols: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.{broadcast, col}
    require(keys.columns.length == 1,
      s"keys must be a single-column request list, got ${keys.columns.mkString(",")}")
    val head = versions(spark, table).lastOption
      .getOrElse(sys.error(s"$table has no committed versions"))
    val source = read(spark, table, Some(head))
    val req = broadcast(keys.toDF("__graft_erase_key").distinct())
    val purged = source.join(req,
      col(keyCol) === col("__graft_erase_key"), "left_anti")
    val staged = stage(spark, table, purged, statsCols)
    publish(spark, table, h => {
      require(h.contains(head),
        s"concurrent commit during erase purge (head moved $head -> $h); rerun")
      schemaLine(relaxed(source.schema)) +: staged
    })
  }

  /** Row-level diff of two snapshots keyed by `keyCols`: one row per
    * changed key with `change` ∈ insert / delete / update — the audit
    * answer ("what exactly did that commit do to the table?") that
    * manifest diffs alone cannot give once overwrites, purges, or
    * merge-on-read compactions rewrite files. Unchanged keys are not
    * emitted. Keys must be unique within each snapshot (the caller's
    * primary-key contract). Value comparison is null-safe over the TO
    * version's columns; across an additive schema evolution the FROM
    * side null-fills the added columns, so a row whose only change is a
    * value in a new column reads as an update.
    *
    * Scale shape: ONE full-outer key join of the two snapshots with the
    * non-key columns pre-packed into a single struct per side (narrow
    * shuffle rows, null-safe struct equality instead of per-column
    * predicates). For an APPEND-range history, prefer
    * [[readChangesBetween]] — the manifest diff yields the inserts at
    * O(delta) without touching the base; this operator is for the
    * general case where history was rewritten.
    */
  def diffSnapshots(spark: SparkSession, table: String,
                    fromVersion: Int, toVersion: Int,
                    keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, struct, when}
    require(keyCols.nonEmpty, "at least one key column")
    val from = read(spark, table, Some(fromVersion))
    val to = read(spark, table, Some(toVersion))
    val toCols = to.columns.toSeq
    require(keyCols.forall(from.columns.contains) && keyCols.forall(toCols.contains),
      s"key columns ${keyCols.mkString(",")} must exist in both versions")
    val valCols = toCols.filterNot(keyCols.contains)
    // align FROM onto the TO schema: columns added by evolution between
    // the two versions null-fill on the from side
    val fromAligned = toCols.foldLeft(from) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(to.schema(c).dataType))
    }
    def packed(df: DataFrame, tag: String): DataFrame =
      df.select(keyCols.map(col) :+
        struct(valCols.map(col): _*).as(s"__graft_v_$tag") :+
        lit(1).as(s"__graft_p_$tag"): _*)
    val joined = packed(fromAligned, "from")
      .join(packed(to, "to"), keyCols, "full_outer")
    joined
      .withColumn("change",
        when(col("__graft_p_from").isNull, "insert")
          .when(col("__graft_p_to").isNull, "delete")
          .when(col("__graft_v_from") <=> col("__graft_v_to"), lit(null))
          .otherwise("update"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  private val RefsDir = "_refs"

  /** Tag a committed version with an immutable name — how a reproducible
    * training run pins its input ("read what run-2026-08 read") without
    * carrying version numbers through configs. Tags are create-once
    * (published through the same create-if-absent slot as manifests, so
    * two racers cannot both claim a name) and PIN their version against
    * [[vacuum]]: a tagged snapshot survives any retention horizon until
    * [[dropTag]] releases it.
    */
  def tagVersion(spark: SparkSession, table: String, name: String,
                 version: Int): Unit = {
    require(name.matches("[A-Za-z0-9._-]{1,64}"),
      s"tag name must be [A-Za-z0-9._-]{1,64}, got '$name'")
    require(versions(spark, table).contains(version),
      s"$table has no committed version $version to tag")
    val f = fs(spark, table)
    val tgt = new Path(table, s"$RefsDir/$name.txt")
    f.mkdirs(tgt.getParent)
    val bytes = (version.toString + "\n").getBytes("UTF-8")
    val scheme = tgt.toUri.getScheme
    val won =
      if (scheme == null || scheme == "file") {
        val dir = java.nio.file.Paths.get(f.makeQualified(tgt).toUri.getPath).getParent
        val tmp = dir.resolve(s".$name.${java.util.UUID.randomUUID()}.tmp")
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
    require(won, s"$table already has a tag '$name' (tags are immutable; " +
      "dropTag first to re-point)")
  }

  /** All tags of the table: name → pinned version. */
  def tags(spark: SparkSession, table: String): Map[String, Int] = {
    val dir = new Path(table, RefsDir)
    val f = fs(spark, table)
    if (!f.exists(dir)) Map.empty
    else f.listStatus(dir).filter(_.isFile)
      .map(_.getPath).filter(_.getName.endsWith(".txt"))
      .map { p =>
        val in = f.open(p)
        val v = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().next().trim.toInt finally in.close()
        p.getName.stripSuffix(".txt") -> v
      }.toMap
  }

  /** Read the snapshot a tag pins. */
  def readTag(spark: SparkSession, table: String, name: String): DataFrame = {
    val v = tags(spark, table).getOrElse(name,
      throw new IllegalArgumentException(s"$table has no tag '$name'"))
    read(spark, table, Some(v))
  }

  /** Release a tag (its version becomes vacuumable again). */
  def dropTag(spark: SparkSession, table: String, name: String): Unit = {
    val f = fs(spark, table)
    require(f.delete(new Path(table, s"$RefsDir/$name.txt"), false),
      s"$table has no tag '$name'")
  }

  /** Reclaim space: drop all UNTAGGED manifests BELOW `keepFrom` and
    * delete every data file no remaining manifest references (including
    * orphans from crashed commits). Returns the number of deleted data
    * files. Time travel to vacuumed versions is gone — that is the
    * point — but a [[tagVersion]]-pinned snapshot survives any horizon
    * until its tag is dropped (the reproducible-training-run contract).
    * A dropped manifest also forgets its [[commitAppendOnce]] token, so
    * keep the retention horizon longer than any source's replay horizon
    * (a streaming checkpoint bounds replays far tighter in practice).
    */
  def vacuum(spark: SparkSession, table: String, keepFrom: Int): Int = {
    val f = fs(spark, table)
    val pinned = tags(spark, table).values.toSet
    val (drop, keep) = versions(spark, table)
      .partition(v => v < keepFrom && !pinned.contains(v))
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
