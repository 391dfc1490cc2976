package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Keccak-256 (the pre-SHA-3 padding variant Ethereum uses) and the
  * ENS namehash built on it, implemented from the public Keccak
  * specification (Bertoni/Daemen/Peeters/Van Assche, keccak.team) and
  * EIP-137. The reference pipeline stamps every collection member with
  * `namehash(curated + ".eth")` — collection-templates
  * scripts/prepare_collections2.py:116 — so an engine replacing it
  * needs the digest natively; Spark ships sha2/md5/crc32 but no
  * keccak.
  */
object KeccakUtil {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // Rotation offsets r[x][y], x = column, y = row (A[x,y] = state(x + 5y)).
  private val ROT: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private val RATE = 136 // bytes; 1600/8 - 2*256/8

  private def rotl(v: Long, n: Int): Long =
    if (n == 0) v else (v << n) | (v >>> (64 - n))

  private def keccakF(s: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // θ
      var x = 0
      while (x < 5) {
        c(x) = s(x) ^ s(x + 5) ^ s(x + 10) ^ s(x + 15) ^ s(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        val d = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { s(x + 5 * y) ^= d; y += 1 }
        x += 1
      }
      // ρ + π: B[y, 2x+3y] = rotl(A[x, y], r[x][y])
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(s(x + 5 * y), ROT(x)(y))
          y += 1
        }
        x += 1
      }
      // χ
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          s(x + 5 * y) = b(x + 5 * y) ^
            (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // ι
      s(0) ^= RC(round)
      round += 1
    }
  }

  /** Keccak-256 digest (Ethereum padding 0x01…0x80, NOT SHA-3's 0x06). */
  def keccak256(input: Array[Byte]): Array[Byte] = {
    val state = new Array[Long](25)
    val padded = new Array[Byte](((input.length / RATE) + 1) * RATE)
    System.arraycopy(input, 0, padded, 0, input.length)
    padded(input.length) = 0x01
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte
    var off = 0
    while (off < padded.length) {
      var lane = 0
      while (lane < RATE / 8) {
        var v = 0L
        var i = 7
        while (i >= 0) { v = (v << 8) | (padded(off + lane * 8 + i) & 0xffL); i -= 1 }
        state(lane) ^= v
        lane += 1
      }
      keccakF(state)
      off += RATE
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) { out(i) = ((state(i / 8) >>> (8 * (i % 8))) & 0xff).toByte; i += 1 }
    out
  }

  /** EIP-137 namehash: node("") = 0³²; node(name) folds labels
    * right-to-left as keccak(node ‖ keccak(label)). Label splitting
    * is Scala `split('.')` — TRAILING empty labels drop (so
    * "foo.eth." ≡ "foo.eth"), interior/leading empties are kept and
    * hashed; the committed vector generator
    * (tools/gen_namehash_vectors.py split_labels) mirrors exactly
    * this and pins "foo.", "foo..", "." as cross-engine vectors.
    * Normalized ENS names never carry a trailing dot — the choice
    * only shapes malformed-input behavior, and it is documented
    * rather than load-bearing. */
  def namehash(name: String): Array[Byte] = {
    var node = new Array[Byte](32)
    if (name != null && name.nonEmpty) {
      name.split('.').reverseIterator.foreach { label =>
        val lh = keccak256(label.getBytes("UTF-8"))
        val buf = new Array[Byte](64)
        System.arraycopy(node, 0, buf, 0, 32)
        System.arraycopy(lh, 0, buf, 32, 32)
        node = keccak256(buf)
      }
    }
    node
  }

  // Codegen entry points (UTF8String in, byte[] out).
  def keccak256(s: UTF8String): Array[Byte] = keccak256(s.getBytes)
  def namehash(s: UTF8String): Array[Byte] = namehash(s.toString)
}

/** keccak256 over a string/binary column → 32-byte binary. Codegen is
  * a single static call, so the expression stays inside whole-stage
  * codegen (no CodegenFallback). */
case class Keccak256(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => KeccakUtil.keccak256(v.asInstanceOf[UTF8String])
    case BinaryType => KeccakUtil.keccak256(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Static forwarder on the mirror class — valid Java in codegen.
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.KeccakUtil.keccak256($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_keccak256"
}

/** EIP-137 namehash over a string column → 32-byte binary. */
case class Namehash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    KeccakUtil.namehash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.KeccakUtil.namehash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_namehash"
}
