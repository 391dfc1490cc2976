package graft.functions

import graft.functions.expr.ArrayDot
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Column-level vector math over `array<float>` embedding columns —
  * a native codegen expression for the hot dot-product loop, no UDFs,
  * computed in double precision.
  */
object Vectors {

  /** Dot product of two equal-length array columns — fused primitive
    * loop via [[graft.functions.expr.ArrayDot]] (one pass, zero
    * per-row allocations, stays inside whole-stage codegen). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalized copy in doubles (zero vectors pass through as cast
    * doubles; null elements stay null) — one fused codegen pass, see
    * [[graft.functions.expr.ArrayNormalize]]. */
  def normalize(a: Column): Column =
    ColumnBridge.column(
      graft.functions.expr.ArrayNormalize(ColumnBridge.expression(a)))

  /** Cosine similarity — 0 when either norm is exactly 0 (the
    * division-by-zero NaN source). A NaN ELEMENT in an input vector
    * still propagates (norm NaN fails the === 0.0 test), as does a
    * float norm overflowing to Infinity: garbage embeddings are an
    * upstream data-quality failure this function surfaces rather than
    * masks. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }
}
