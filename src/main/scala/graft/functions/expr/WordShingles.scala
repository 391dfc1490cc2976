package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingling over a pre-tokenized `array<string>`
  * column: element i of the result is tokens[i..i+n-1] joined by a
  * single space; fewer than n tokens (or a null array) yields an
  * EMPTY array.
  *
  * This is the hot first stage of every shingle-based operator
  * (n-gram Jaccard, MinHash, SimHash blocking, decontamination,
  * span-level dup detection, fingerprints — reference analogue: the
  * document fingerprints behind related-collection search,
  * collection-templates research/related-collections). The
  * higher-order-function formulation (`transform(sequence(...),
  * i => concat_ws(" ", slice(toks, i+1, n)))`) runs INTERPRETED:
  * per shingle it allocates a slice array, boxes the index, and walks
  * an expression tree — the same per-element trap ArrayDot removed
  * from the vector path. This expression generates one fused loop
  * (`doGenCode`) that reads the token array directly and emits the
  * joined UTF8Strings, keeping shingling inside whole-stage codegen.
  *
  * Exact-parity contract with the HOF formulation (DedupSpec pins it
  * property-style): null array → empty array (the `when(size(toks)
  * >= n, ...)` guard turns null size into the otherwise branch);
  * null ELEMENTS are skipped by the separator join, matching
  * concat_ws.
  */
case class WordShingles(tokens: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def child: Expression = tokens

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    // A literal NULL (SQL `graft_shingles(NULL, 3)`) types as NullType;
    // the documented contract maps a null array to an empty array, so
    // it must pass analysis, not fail it.
    case NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // Null input folds to an EMPTY array, never a null result.
  override def nullable: Boolean = false

  private val separator = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) return new GenericArrayData(new Array[AnyRef](0))
    val arr = t.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](m - n + 1)
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) {
        buf(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(separator, buf: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // A NullType child generates an Object-typed value on which the
    // .numElements() call below would not compile; the result is a
    // constant empty array, so emit exactly that.
    if (tokens.dataType == NullType) {
      val arrCls0 = classOf[GenericArrayData].getName
      val javaType0 = CodeGenerator.javaType(dataType)
      return ev.copy(
        code = code"$javaType0 ${ev.value} = new $arrCls0(new Object[0]);",
        isNull = FalseLiteral)
    }
    val childGen = tokens.genCode(ctx)
    val arrCls = classOf[GenericArrayData].getName
    val u8 = classOf[UTF8String].getName
    val sep = ctx.addReferenceObj("sep", separator, u8)
    val m = ctx.freshName("m")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val buf = ctx.freshName("buf")
    val out = ctx.freshName("out")
    val javaType = CodeGenerator.javaType(dataType)
    val resultCode =
      code"""
         |${childGen.code}
         |$javaType ${ev.value};
         |if (${childGen.isNull} || ${childGen.value}.numElements() < $n) {
         |  ${ev.value} = new $arrCls(new Object[0]);
         |} else {
         |  final int $m = ${childGen.value}.numElements();
         |  final Object[] $out = new Object[$m - $n + 1];
         |  final $u8[] $buf = new $u8[$n];
         |  for (int $i = 0; $i + $n <= $m; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $buf[$j] = ${childGen.value}.isNullAt($i + $j)
         |        ? null : ${childGen.value}.getUTF8String($i + $j);
         |    }
         |    $out[$i] = $u8.concatWs($sep, $buf);
         |  }
         |  ${ev.value} = new $arrCls($out);
         |}
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)

  override def prettyName: String = "graft_shingles"
}
