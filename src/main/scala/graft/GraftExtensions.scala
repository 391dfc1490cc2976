package graft

import graft.functions.expr.ArrayDot
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_dot(a, b)")` works next to
  * the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def oneArg(name: String, usage: String, implClass: Class[_],
                     build: Expression => Expression): Descriptor =
    (FunctionIdentifier(name),
      new ExpressionInfo(implClass.getName, name, usage),
      { args =>
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        build(args.head)
      })

  private def twoArg(name: String, usage: String, implClass: Class[_],
                     build: (Expression, Expression) => Expression): Descriptor =
    (FunctionIdentifier(name),
      new ExpressionInfo(implClass.getName, name, usage),
      { args =>
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        build(args.head, args(1))
      })

  val descriptors: Seq[Descriptor] = Seq(
    twoArg("graft_dot",
      "graft_dot(a, b) - dot product of two float/double arrays",
      classOf[ArrayDot], ArrayDot(_, _)),
    oneArg("graft_keccak256",
      "graft_keccak256(expr) - Keccak-256 digest (Ethereum padding) of a string/binary",
      classOf[graft.functions.expr.Keccak256],
      graft.functions.expr.Keccak256(_)),
    oneArg("graft_nfc",
      "graft_nfc(text) - Unicode NFC normalization (canonical composition)",
      classOf[graft.functions.expr.NfcNormalize],
      graft.functions.expr.NfcNormalize(_)),
    oneArg("graft_namehash",
      "graft_namehash(name) - EIP-137 ENS namehash of a dotted name",
      classOf[graft.functions.expr.Namehash],
      graft.functions.expr.Namehash(_)),
    twoArg("graft_shingles",
      "graft_shingles(tokens, n) - word n-gram shingles of a string array (n a literal int)",
      classOf[graft.functions.expr.WordShingles],
      (toks, n) => {
        require(n.foldable && n.dataType == org.apache.spark.sql.types.IntegerType,
          "graft_shingles: n must be an integer literal")
        val v = n.eval()
        require(v != null && v.asInstanceOf[Int] >= 1,
          "graft_shingles: n must be a non-null integer literal >= 1")
        graft.functions.expr.WordShingles(toks, v.asInstanceOf[Int])
      }),
    // Aggregate: the analyzer wraps a bare AggregateFunction from a
    // registry builder in its AggregateExpression, same as built-ins.
    oneArg("graft_simhash",
      "graft_simhash(feature_hash) - SimHash aggregate over bigint feature hashes (64-bit fingerprint)",
      classOf[graft.functions.expr.SimhashAgg],
      graft.functions.expr.SimhashAgg(_)),
    twoArg("graft_minhash",
      "graft_minhash(shingles, k) - k-component MinHash signature of a string array (k a literal int)",
      classOf[graft.functions.expr.MinhashSig],
      (toks, k) => {
        require(k.foldable && k.dataType == org.apache.spark.sql.types.IntegerType,
          "graft_minhash: k must be an integer literal")
        val v = k.eval()
        require(v != null && v.asInstanceOf[Int] >= 1,
          "graft_minhash: k must be a non-null integer literal >= 1")
        graft.functions.expr.MinhashSig(toks, v.asInstanceOf[Int])
      }))

  /** Idempotently register the functions on an existing session. */
  def register(spark: SparkSession): Unit = descriptors.foreach {
    case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
