package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving: map two integer dimensions onto one
  * space-filling-curve value whose ordering preserves locality in BOTH
  * dimensions at once. Sorting a table by z-value before writing gives
  * every parquet row group a tight min/max envelope in each dimension, so
  * a predicate on EITHER column (or both) prunes row groups — the layout
  * answer to "we filter by user AND by day, which one do we sort by?"
  * At 100 TB this is the difference between a full scan and touching the
  * few row groups whose envelope intersects the query box.
  *
  * The z-value is plain integer bit arithmetic (shift/and/or), fully
  * codegen'd by Catalyst and bit-identical in any engine.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Values wider than `bits` contribute only their low bits (callers
    * bucket/clamp first if the domain exceeds 2^bits).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Reference implementation for tests. */
  def zValueRef(a: Long, b: Long, bits: Int = 16): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  /** The matching DuckDB/ANSI SQL expression — the oracle mirror of
    * [[zValue]], same shift/mask/or chain over BIGINT.
    */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    // operands are parenthesized before the :: cast — an unwrapped
    // compound operand like "event_id & 1023" would otherwise bind the
    // cast to its last token and silently shift the mask, not the value
    (0 until bits).flatMap { i =>
      Seq(s"(((($a)::BIGINT >> $i) & 1) << ${2 * i + 1})",
        s"(((($b)::BIGINT >> $i) & 1) << ${2 * i})")
    }.mkString(" | ")
}
