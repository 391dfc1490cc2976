package graft.functions.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition, UAX #15) as a
  * native codegen expression — the canonicalization step every text
  * pipeline needs before exact dedup or fingerprinting: the same
  * visible text arrives from the web in composed ("é") and decomposed
  * ("e" + U+0301) forms, and without normalization they hash apart,
  * defeating d1/f4 and splitting counts in every keyed aggregation.
  * (Reference analogue: the name canonicalization layer feeding
  * curation — collection-templates scripts/prepare_members_names.py
  * normalizes curated names before comparing; ASCII folding is a17's
  * layer, composition is this one.) Spark ships upper/lower/translate
  * but no Unicode normalizer; DuckDB exposes `nfc_normalize`, which
  * is what the oracle uses.
  *
  * The fast path costs one scan: `Normalizer.isNormalized` is O(n)
  * with no allocation, and real-world corpora are overwhelmingly
  * already-NFC, so the expression allocates only on the rare
  * decomposed row. Null → null.
  */
object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.NfcNormalizeUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}
