package graft.transforms

import org.apache.spark.sql.DataFrame

/** The engine's operator interface — Spark counterpart of the reference's
  * Kafka Connect `Transformation<R>` SPI (`configure`/`apply`/`config`,
  * `DropField.java:32-53`). A transform is a pure, stateless
  * `DataFrame => DataFrame` that only rewrites its target column, so it is
  * valid on both batch and streaming DataFrames (narrow, no state, no
  * watermark — SURVEY.md §2.2).
  *
  * Construction IS configuration: the reference's `configure(Map)` runtime
  * step becomes plan-time case-class construction (via
  * [[graft.config.ConnectProps]] for Connect-style property maps), and the
  * reference's per-record schema dispatch becomes a single static-type
  * dispatch on `df.schema` at apply time.
  */
trait Transform extends (DataFrame => DataFrame) {
  def apply(df: DataFrame): DataFrame
}

object Transform {
  /** The reference's `transforms=a,b,c` linear chain
    * (`TransformationChain`, README.md:12-16): a fold over
    * `df.transform`. Catalyst fuses the whole chain into one projection.
    */
  def chain(transforms: Seq[Transform]): DataFrame => DataFrame =
    df => transforms.foldLeft(df)((d, t) => t(d))
}
