package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a shingle ARRAY, as one scalar expression:
  * component i (i = 0..numHashes-1) is the minimum over the array's
  * non-null elements of the seeded xxhash64 chain `xxhash64(elem, i)`
  * — BIT-COMPATIBLE with [[graft.operators.Dedup.minhashSignatures]],
  * which computes the same components as `min(xxhash64(shingle, i))`
  * grouped aggregations over exploded (id, shingle) rows (parity is
  * pinned in DedupSpec). Null or element-free input yields NULL (the
  * grouped form produces no row for such a document).
  *
  * This is the SQL-facing form (`graft_minhash(shingles, k)`): a
  * SQL-only user can reach the MinHash dedup family without the
  * DataFrame API — signatures per document in one narrow projection,
  * e.g. `graft_minhash(graft_shingles(tokens, 3), 128)`, then band
  * and bucket-join. Signature order: duplicates in the array cannot
  * change any min, so array and set input agree with the grouped form.
  *
  * Codegen calls the same static helper eval uses (one hash per
  * element + one running-min pass per component; the per-element hash
  * is computed once and re-seeded per component).
  */
case class MinhashSig(tokens: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def child: Expression = tokens

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = tokens.eval(input)
    if (v == null) null
    else MinhashSig.compute(v.asInstanceOf[ArrayData], numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinhashSig.getClass.getName.stripSuffix("$")
    if (tokens.dataType == NullType) {
      val javaType0 = CodeGenerator.javaType(dataType)
      return ev.copy(code =
        code"""
           |$javaType0 ${ev.value} = null;
           |boolean ${ev.isNull} = true;
         """.stripMargin)
    }
    val childGen = tokens.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
         |${childGen.code}
         |$javaType ${ev.value} = null;
         |if (!${childGen.isNull}) {
         |  ${ev.value} = $cls.compute(${childGen.value}, $numHashes);
         |}
         |boolean ${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinhashSig {
  /** Static form shared by eval and codegen. Returns null when the
    * array holds no non-null element. */
  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val m = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        any = true
        // Same chain as the built-in xxhash64(elem, i) with its fixed
        // 42 seed: hash the string once, then fold each component
        // index in as an int.
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < k) {
          val hj = XxHash64Function.hash(j, IntegerType, h)
          if (hj < sig(j)) sig(j) = hj
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(sig)
  }
}
