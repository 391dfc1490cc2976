package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** STREAMED form of [[ArrayOrderedPairs]]: all ordered pairs
  * `(a(i), a(j)), i < j` of an array as generator output rows
  * `(id_a, id_b)` — the r15 verdict's named a25 follow-up.
  *
  * Why a Generator and not the array expression + explode: the array
  * form materializes a `GenericArrayData` holding ALL C(df,2) pair
  * rows per input row before `GenerateExec` iterates it — for a25's
  * 8.7M pairs that is 8.7M row objects plus the backing arrays, built
  * only to be torn apart one exchange later (measured ~7 s of the
  * ~21 s restricted task cpu). A `Generator` streams: `eval` returns
  * a lazy iterator; `GenerateExec` consumes it INSIDE whole-stage
  * codegen (`codeGenIterableOnce` — `supportCodegen` is true for any
  * generator that is not a CodegenFallback, verified against the
  * Spark 4.1 bytecode), reading each pair's fields and feeding the
  * parent consumer immediately. The iterator reuses ONE mutable row —
  * zero per-pair allocation — which is safe because both GenerateExec
  * paths consume each row before requesting the next: the codegen
  * path copies the two fields into the parent's locals per iteration,
  * and the interpreted path runs every output through an
  * UnsafeProjection before anything downstream can buffer it.
  *
  * Contract is [[ArrayOrderedPairs]]'s, unchanged: emission in input
  * order (sorted input ⇒ `id_a < id_b` per pair, pairs lexicographic),
  * null elements pass through, null array ⇒ no rows, and the same
  * loud bound guard — the dfCap contract bounds the per-row element
  * count, and a group whose pair count would overflow Int must fail,
  * never silently run a quadrillion-pair row (reference anchor:
  * filter_duplicates.py's bounded member-overlap contract).
  */
case class ArrayOrderedPairsGen(child: Expression)
    extends UnaryExpression with Generator {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array input, got ${other.catalogString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", elemType, nullable = elemNullable),
    StructField("id_b", elemType, nullable = elemNullable)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else ArrayOrderedPairsGen.buildIterator(
      v.asInstanceOf[ArrayData], elemType)
  }

  /** GenerateExec's codegen path (codeGenIterableOnce) compiles the
    * generator expression itself and consumes `${ev.value}.iterator()`
    * in the generated loop — so this emits a value of Java type
    * `scala.collection.Iterator` (its `iterator()` returns itself),
    * built by one static-forwarder call (the ArrayOrderedPairs /
    * Keccak pattern: the loop machinery lives in compiled Scala, one
    * JIT-hot class shared by every call site, while the call stays
    * inside the whole-stage span). A null input array yields the
    * empty iterator — generators have no null output row. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val dtRef = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    val cls = ArrayOrderedPairsGen.getClass.getName.stripSuffix("$")
    val value = ctx.freshName("pairIter")
    ev.copy(
      code = code"""
        |${childGen.code}
        |scala.collection.Iterator $value = ${childGen.isNull}
        |  ? scala.collection.Iterator$$.MODULE$$.empty()
        |  : $cls.buildIterator(${childGen.value}, $dtRef);
        |""".stripMargin,
      isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen
        .JavaCode.variable(value, classOf[scala.collection.Iterator[_]]))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayOrderedPairsGen {
  /** Shared by eval and the generated code (static forwarder). */
  def buildIterator(arr: ArrayData, et: DataType): Iterator[InternalRow] = {
    val n = arr.numElements()
    if (n < 2) Iterator.empty
    else {
      val total = n.toLong * (n - 1) / 2
      // Same loud guard as the array form: the caller vouches the
      // per-group bound (dfCap); an unbounded group must fail, not
      // stream forever.
      require(total <= Int.MaxValue,
        s"ordered_pairs: $n elements -> $total pairs overflows; " +
          "the caller must bound group size (dfCap) before pairing")
      if (et == LongType && !anyNull(arr, n))
        new LongPairIterator(arr.toLongArray())
      else new GenericPairIterator(arr.toObjectArray(et))
    }
  }

  private def anyNull(arr: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Unboxed long specialization: one REUSED 2-long row, updated in
    * place per pair (see the class scaladoc for why reuse is safe in
    * both GenerateExec paths). copy() detaches, for any consumer that
    * buffers. */
  private final class LongPairIterator(longs: Array[Long])
      extends Iterator[InternalRow] {
    private[this] val n = longs.length
    private[this] var i = 0
    private[this] var j = 1
    private[this] val row = new MutableLongPairRow
    override def hasNext: Boolean = i < n - 1
    override def next(): InternalRow = {
      row.a = longs(i)
      row.b = longs(j)
      j += 1
      if (j >= n) { i += 1; j = i + 1 }
      row
    }
  }

  /** Generic-element fallback (non-long ids, or a null element in the
    * array): one reused GenericInternalRow over a 2-slot values
    * array. */
  private final class GenericPairIterator(objs: Array[AnyRef])
      extends Iterator[InternalRow] {
    private[this] val n = objs.length
    private[this] var i = 0
    private[this] var j = 1
    private[this] val values = new Array[Any](2)
    private[this] val row = new GenericInternalRow(values)
    override def hasNext: Boolean = i < n - 1
    override def next(): InternalRow = {
      values(0) = objs(i)
      values(1) = objs(j)
      j += 1
      if (j >= n) { i += 1; j = i + 1 }
      row
    }
  }

  /** Mutable unboxed twin of [[ArrayOrderedPairs]]'s LongPairRow: the
    * generator's reuse discipline needs settable fields; everything a
    * consumer may legitimately call (getLong / get / copy / numFields)
    * behaves identically, and every wrong-typed accessor still throws
    * rather than corrupting. */
  private final class MutableLongPairRow extends InternalRow {
    var a: Long = 0L
    var b: Long = 0L
    override def numFields: Int = 2
    override def isNullAt(i: Int): Boolean = false
    override def getLong(i: Int): Long = if (i == 0) a else b
    override def getInt(i: Int): Int = throw unsupported
    override def get(i: Int, dt: DataType): AnyRef = Long.box(getLong(i))
    override def copy(): InternalRow =
      new GenericInternalRow(Array[Any](a, b))
    override def setNullAt(i: Int): Unit = throw unsupported
    override def update(i: Int, v: Any): Unit = throw unsupported
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
    override def getStruct(i: Int, n: Int): InternalRow = throw unsupported
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
}
