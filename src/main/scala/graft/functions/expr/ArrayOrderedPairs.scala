package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs `(a(i), a(j)), i < j` of an array, as
  * `array<struct<id_a, id_b>>` — the pair-emission kernel of the
  * bounded-df overlap path ([[graft.operators.Relational.overlapPairs]]).
  *
  * Why a native expression (r14 verdict ask #3, the a25 diet): the
  * declarative form — `flatten(transform(sequence(...), i =>
  * transform(slice(ids, i+2, ...), y => struct(...))))` — evaluates
  * INTERPRETED (higher-order functions are CodegenFallback), allocates
  * a sliced copy of the tail per outer index (O(df²) array copies on
  * top of the O(df²) output), and re-enters the lambda machinery per
  * element; measured on a25 at sf0.1 it read 172 s summed task CPU
  * against the inverted-index join path's 49 s. This expression is one
  * tight nested loop inside whole-stage codegen: the only allocations
  * are the output itself (one 2-field row per pair), which is the
  * floor for any pair emitter.
  *
  * Contract mirrors the declarative form it replaces: emit in input
  * order (sorted input ⇒ `id_a < id_b` per pair and pairs in
  * lexicographic order), null elements pass through into the structs
  * (callers feed collect_list output, which drops nulls upstream), a
  * null array yields null. The caller vouches the per-row bound (the
  * dfCap contract) — a row whose pair count would overflow Int fails
  * loudly rather than truncating.
  */
case class ArrayOrderedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array input, got ${other.catalogString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", elemType,
        nullable = child.dataType.asInstanceOf[ArrayType].containsNull),
      StructField("id_b", elemType,
        nullable = child.dataType.asInstanceOf[ArrayType].containsNull))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ArrayOrderedPairs.build(v.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // Static forwarder + a DataType reference object (the Keccak /
      // WordSegment pattern): the loop itself lives in compiled Scala
      // — one JIT-hot method shared by every call site — while the
      // call stays inside the whole-stage-codegen span (no
      // CodegenFallback, no interpreted lambda re-entry).
      val dtRef = ctx.addReferenceObj("elemType", elemType,
        classOf[DataType].getName)
      val cls = ArrayOrderedPairs.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.build($a, $dtRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayOrderedPairs {
  /** A 2-long InternalRow with no backing Array[Any] and no boxing —
    * the pair emitter's dominant allocation is the per-pair row, and
    * the generic form costs three objects per pair (row + values
    * array + boxes outside the Long cache); this is one. Immutable
    * by construction (the consumer is an explode → project, which
    * only reads); copy() returns a detached GenericInternalRow for
    * any consumer that buffers. */
  private final class LongPairRow(val a: Long, val b: Long)
      extends org.apache.spark.sql.catalyst.InternalRow {
    override def numFields: Int = 2
    override def isNullAt(i: Int): Boolean = false
    override def getLong(i: Int): Long = if (i == 0) a else b
    // Both fields are longs; a getInt would be a consumer reading a
    // mistyped schema, and a silent toInt truncation would corrupt
    // ids instead of failing loudly like every other wrong-type
    // accessor below.
    override def getInt(i: Int): Int = throw unsupported
    override def get(i: Int, dt: DataType): AnyRef = Long.box(getLong(i))
    override def copy(): org.apache.spark.sql.catalyst.InternalRow =
      new GenericInternalRow(Array[Any](a, b))
    override def setNullAt(i: Int): Unit =
      throw new UnsupportedOperationException("immutable pair row")
    override def update(i: Int, v: Any): Unit =
      throw new UnsupportedOperationException("immutable pair row")
    override def getBoolean(i: Int): Boolean = throw unsupported
    override def getByte(i: Int): Byte = throw unsupported
    override def getShort(i: Int): Short = throw unsupported
    override def getFloat(i: Int): Float = throw unsupported
    override def getDouble(i: Int): Double = throw unsupported
    override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
      throw unsupported
    override def getBinary(i: Int): Array[Byte] = throw unsupported
    override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
      throw unsupported
    override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval =
      throw unsupported
    override def getStruct(i: Int, n: Int): org.apache.spark.sql.catalyst.InternalRow =
      throw unsupported
    override def getArray(i: Int): ArrayData = throw unsupported
    override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData =
      throw unsupported
    override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal =
      throw unsupported
    override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal =
      throw unsupported
    override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal =
      throw unsupported
    private def unsupported =
      new UnsupportedOperationException("long pair row holds two longs")
  }

  /** The pair loop — n(n-1)/2 two-field rows from one object copy of
    * the input. Shared by eval and the generated code. Long element
    * arrays (every registered caller: doc ids, collection keys) take
    * the unboxed specialization. */
  def build(arr: ArrayData, et: DataType): ArrayData = {
    val n = arr.numElements()
    val total = n.toLong * (n - 1) / 2
    // The dfCap contract bounds n (≤ a few tens); a caller that fed an
    // unbounded group must fail loudly, never truncate or OOM-and-GC.
    require(total <= Int.MaxValue,
      s"ordered_pairs: $n elements -> $total pairs overflows; " +
        "the caller must bound group size (dfCap) before pairing")
    val out = new Array[Any](total.toInt)
    var k = 0
    var i = 0
    var hasNull = false
    if (et == LongType) {
      var c = 0
      while (c < n && !hasNull) { hasNull = arr.isNullAt(c); c += 1 }
    }
    if (et == LongType && !hasNull) {
      val longs = arr.toLongArray()
      while (i < n) {
        val ai = longs(i)
        var j = i + 1
        while (j < n) {
          out(k) = new LongPairRow(ai, longs(j))
          k += 1
          j += 1
        }
        i += 1
      }
    } else {
      val objs = arr.toObjectArray(et)
      while (i < n) {
        val ai = objs(i)
        var j = i + 1
        while (j < n) {
          out(k) = new GenericInternalRow(Array[Any](ai, objs(j)))
          k += 1
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}
