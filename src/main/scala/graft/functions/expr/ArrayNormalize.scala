package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** L2 normalization of an `array<float|double>` column in one fused
  * pass: norm over the non-null elements (float inputs widened to
  * double first), then each element divided by it — a zero norm
  * passes the cast elements through unchanged (cosine 0 downstream),
  * null elements stay null, a null array stays null.
  *
  * This is the entry stage of every ANN operator (all six similarity
  * entry points normalize the corpus and the queries before anything
  * else). The declarative form needs THREE projections — cast
  * transform, staged norm column, dividing transform — allocating two
  * intermediate arrays per row and running the division through an
  * interpreted lambda; this expression does one loop, one output
  * allocation, inside whole-stage codegen (the [[ArrayDot]] playbook
  * applied to the normalization stage). Arithmetic is BIT-COMPATIBLE
  * with the staged form: the same sequential sum of squares
  * [[ArrayDot]] computes, the same sqrt, the same per-element
  * division (parity pinned in SimilarityLshSpec).
  */
case class ArrayNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.catalogString}")
  }

  private def isDoubleElem: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val dbl = isDoubleElem
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (dbl) arr.getDouble(i) else arr.getFloat(i).toDouble
        ss += x * x
      }
      i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (dbl) arr.getDouble(i) else arr.getFloat(i).toDouble
        out(i) = if (norm == 0.0) x else x / norm
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val arrCls = classOf[GenericArrayData].getName
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val nrm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      val get = if (isDoubleElem) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      s"""
         |final int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final double $x = $get;
         |    $ss += $x * $x;
         |  }
         |}
         |final double $nrm = java.lang.Math.sqrt($ss);
         |final Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final double $x = $get;
         |    $out[$i] = $nrm == 0.0 ? (Object) (Double) $x : (Object) (Double) ($x / $nrm);
         |  }
         |}
         |${ev.value} = new $arrCls($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_l2_normalize"
}
