package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a shingle ARRAY, as one scalar expression:
  * component i (i = 0..numHashes-1) is the minimum over the array's
  * non-null elements of an md5-derived hash: one digest per element,
  * component i an affine mix (odd multiplier 2i+1) of the digest's
  * four unsigned 32-bit words — BIT-COMPATIBLE with
  * [[graft.operators.Dedup.minhashSignatures]], which computes the
  * same components as grouped min aggregations over exploded
  * (id, shingle) rows (parity pinned in DedupSpec), and exactly
  * replayable by the DuckDB oracle (d3 is hash-verified, not
  * rows-only). Null or element-free input yields NULL (the grouped
  * form produces no row for such a document).
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
  /** Per-thread MD5 instance: MessageDigest is not thread-safe and
    * allocation per element would dominate the loop. */
  private val digester = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

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
        // Same scheme as Dedup.minhashSignatures: ONE md5 per
        // element; component j mixes the digest's four unsigned
        // 32-bit words affinely with odd multiplier 2j+1 (exact
        // integer arithmetic below 2^63 — replayable by the DuckDB
        // oracle, so d3 is hash-verified rather than rows-only).
        val md = MinhashSig.digester.get()
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        def word(o: Int): Long =
          ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
            ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
        val (w0, w1, w2, w3) = (word(0), word(4), word(8), word(12))
        var j = 0
        while (j < k) {
          val mult = 2L * j + 1
          val a = (w0 + mult * w2) % 4294967296L
          val b = (w1 + mult * w3) % 4294967296L
          val hj = (if (a >= 2147483648L) a - 4294967296L else a) *
            4294967296L + b
          if (hj < sig(j)) sig(j) = hj
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(sig)
  }
}
