package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge into Spark's `private[sql]` Column↔Expression
  * adapters for the engine's custom Catalyst expressions. Living in a
  * subpackage of `org.apache.spark.sql` is the standard technique for
  * Spark extension libraries (the alternatives — reflection or forking —
  * are worse); only these three forwarders live here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column → Catalyst expression via the classic converter: unlike
    * [[expression]]'s lazy `ColumnNodeExpression` wrapper (fine as a
    * child of an already-resolved custom Expression), this converts the
    * whole node tree into real Catalyst nodes (`UnresolvedFunction` etc.)
    * that the ANALYZER then resolves — required when the tree is returned
    * from a FunctionRegistry builder, where a wrapper node would reach
    * codegen unresolved.
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** A parquet scan planned ENTIRELY from manifest metadata: file paths
    * and lengths come from the caller (the snapshot format's committed
    * manifest), so constructing and planning the scan costs ZERO
    * filesystem calls — no directory listing AND no per-path FileStatus
    * stat, the cost `spark.read.parquet(paths*)` pays once per file
    * (measured ~1.8 ms/file driver-side: 18 s to plan a 10⁴-file
    * snapshot). This is the same move the lakehouse formats make (the
    * manifest IS the file index); expressed here as a minimal
    * `FileIndex` handed to the stock `HadoopFsRelation` + parquet
    * format, so split planning, vectorized reading, filter pushdown and
    * column pruning all stay Spark's own.
    *
    * The caller owns length fidelity: lengths come from the staging
    * listing at commit time and files are immutable thereafter (the
    * format never rewrites a committed file in place).
    */
  def manifestParquetScan(spark: SparkSession,
                          schema: org.apache.spark.sql.types.StructType,
                          rootPath: org.apache.hadoop.fs.Path,
                          files: Seq[(org.apache.hadoop.fs.Path, Long)],
                          admit: (String, Seq[org.apache.spark.sql.sources.Filter]) => Boolean =
                            (_, _) => true)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.datasources.{DataSourceStrategy, FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.types.StructType
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val statuses = files.map { case (p, len) =>
      // block size only shapes split alignment; mtime 0 is safe — no
      // cache keys off it (this index is built per query)
      new org.apache.hadoop.fs.FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, p)
    }.toArray
    val index = new FileIndex {
      override def rootPaths: Seq[org.apache.hadoop.fs.Path] = Seq(rootPath)
      // `dataFilters` is Spark's own pushdown handing the scan its
      // conjunction of data predicates — translating them to public
      // `sources.Filter`s and asking the caller's `admit` per file is
      // what turns the manifest's committed stats into AUTOMATIC
      // planning-time file skipping for a plain `.filter(...)`, the
      // same mechanism partition pruning uses. `admit` must be
      // conservative (true when unsure): correctness stays with the
      // row-level predicate Spark re-applies anyway.
      override def listFiles(partitionFilters: Seq[Expression],
                             dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
        val fs = dataFilters.flatMap(e =>
          DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true))
        val kept =
          if (fs.isEmpty) statuses
          else statuses.filter(s => admit(s.getPath.toString, fs))
        Seq(PartitionDirectory(InternalRow.empty, kept))
      }
      override def inputFiles: Array[String] = files.map(_._1.toString).toArray
      override def refresh(): Unit = ()
      override def sizeInBytes: Long = files.map(_._2).sum
      override def partitionSchema: StructType = new StructType()
    }
    val relation = HadoopFsRelation(index, new StructType(), schema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty[String, String])(cs)
    org.apache.spark.sql.classic.Dataset.ofRows(cs,
      LogicalRelation(relation, isStreaming = false))
  }

  /** The single `BaseRelation` leaf of a planned scan — what a V1
    * `RelationProvider.createRelation` must return. The snapshot
    * format's batch reads plan as exactly one relation (a manifest-
    * backed HadoopFsRelation, or the stock parquet relation on the
    * pre-header fallbacks); anything else (joins, local relations) is
    * a caller error surfaced loudly.
    */
  def singleBaseRelation(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val rels = df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation
    }
    require(rels.size == 1,
      s"expected exactly one relation leaf, found ${rels.size}:\n" +
        df.queryExecution.analyzed)
    rels.head
  }

  /** Re-root a BATCH DataFrame as a streaming micro-batch plan: every
    * leaf relation is marked `isStreaming = true`. This is the V1
    * streaming-source contract (the same move Spark's own
    * FileStreamSource and the lakehouse sources make): `Source.getBatch`
    * returns a DataFrame whose plan the MicroBatchExecution splices in
    * place of the stream's logical relation, and it ASSERTS the plan is
    * streaming. The batch plans handed in here are manifest-planned
    * parquet scans (LogicalRelation leaves) plus projections/unions/
    * anti-joins above them, and empty windows are LocalRelations — both
    * leaf kinds carry the flag natively.
    *
    * `staticLeaf` exempts leaves that must STAY batch relations: a
    * snapshot window with pending merge-on-read deletes anti-joins its
    * delete-key scans, and a stream-STATIC LeftAnti join is plannable
    * per micro-batch while a stream-stream LeftAnti is not (Spark's
    * symmetric hash join has no LeftAnti mode) — marking every leaf
    * would crash exactly the erase-crossing streams feed mode exists
    * for. The plan counts as streaming if ANY leaf is marked
    * (`isStreaming` is an exists-fold), which the non-exempt data
    * scans guarantee.
    */
  def asStreaming(df: org.apache.spark.sql.DataFrame,
                  staticLeaf: org.apache.spark.sql.types.StructType => Boolean =
                    _ => false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming && !staticLeaf(lr.relation.schema) =>
        lr.copy(isStreaming = true)
      case l: LocalRelation if !l.isStreaming &&
        !staticLeaf(org.apache.spark.sql.catalyst.types.DataTypeUtils
          .fromAttributes(l.output)) =>
        l.copy(isStreaming = true)
    }
    require(plan.isStreaming,
      s"asStreaming could not mark this plan's leaves streaming:\n$plan")
    ofRows(df.sparkSession, plan)
  }

  /** The inverse of [[asStreaming]], for a V1 streaming SINK's
    * `addBatch` input: re-root the micro-batch's ALREADY-PLANNED
    * execution as a batch Dataset (`LogicalRDD` over
    * `queryExecution.toRdd`, `isStreaming = false`) so batch writers
    * can run against it — the exact move Spark's own ForeachBatchSink
    * makes before handing users the batch. Calling `.write` on the raw
    * addBatch Dataset throws CALL_ON_STREAMING_DATASET_UNSUPPORTED;
    * this also pins the batch to the one incremental execution instead
    * of re-executing the plan per downstream action.
    */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    ofRows(df.sparkSession, org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false))
  }

  /** Block until the shared listener bus has delivered every queued
    * event. Audit tooling needs this between queries: the
    * QueryExecutionListener bus is ASYNC, so executions belonging to
    * query N can otherwise deliver into query N+1's freshly-registered
    * listener and contaminate its plan audit (run-order-dependent counts
    * — the ADVICE r13 PLAN_AUDIT drift). Bounded wait, same contract as
    * Spark's own test helper.
    */
  def waitListenerBusEmpty(spark: SparkSession, timeoutMillis: Long = 30000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)

  // test access to the (private[sql]) SparkSessionExtensions build hooks,
  // so extension wiring is verifiable without tearing down the shared
  // test session (extensions only apply at session construction)
  def buildStrategies(exts: org.apache.spark.sql.SparkSessionExtensions,
                      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    exts.buildPlannerStrategies(spark)
  def applyExtensionFunctions(exts: org.apache.spark.sql.SparkSessionExtensions,
                              spark: SparkSession): Unit =
    exts.registerFunctions(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
}
