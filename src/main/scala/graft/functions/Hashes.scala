package graft.functions

import graft.functions.expr.{Keccak256, Namehash, SimhashAgg}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Column wrappers for graft's native digest expressions. */
object Hashes {

  /** SimHash aggregate over a bigint feature-hash column: one typed
    * 64-counter buffer instead of 64 declarative sum columns. */
  def simhash(featureHash: Column): Column =
    ColumnBridge.column(
      SimhashAgg(ColumnBridge.expression(featureHash)).toAggregateExpression())

  /** k-component MinHash signature of a shingle array column — the
    * scalar form of [[graft.operators.Dedup.minhashSignatures]]
    * (bit-compatible; parity pinned in DedupSpec). */
  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(
      graft.functions.expr.MinhashSig(ColumnBridge.expression(shingles), k))

  /** Keccak-256 (Ethereum variant) of a string/binary column, as a
    * 32-byte binary. */
  def keccak256(c: Column): Column =
    ColumnBridge.column(Keccak256(ColumnBridge.expression(c)))

  /** EIP-137 ENS namehash of a dotted name column, as a 32-byte
    * binary. (reference: collection-templates
    * scripts/prepare_collections2.py:116.) */
  def namehash(c: Column): Column =
    ColumnBridge.column(Namehash(ColumnBridge.expression(c)))

  /** Committed EIP-137 expected-vectors parquet (name → namehash hex),
    * generated once by tools/gen_namehash_vectors.py from an
    * independent pure-Python keccak. Both the Spark side (a23's query)
    * and the DuckDB oracle read this same file, so the path must be a
    * plain filesystem path resolvable OUTSIDE the JVM (DuckDB can't
    * read from a classpath) — resolved relative to the working
    * directory of whatever launched the session, which for sbt/driver
    * runs is the checkout root; `GRAFT_VECTORS_PATH` overrides when
    * the session runs elsewhere. */
  // The PATH resolves with no existence check: it is interpolated
  // into a23's oracle SQL inside GroupA3's `oracles` val, which query
  // REGISTRATION forces — a check here would make every query in a
  // foreign working directory fail at registry-construction time,
  // not just a23. The check lives in [[vectorsPathChecked]], which
  // only the actual parquet READ calls.
  lazy val vectorsPath: String = sys.env.getOrElse("GRAFT_VECTORS_PATH",
    java.nio.file.Paths.get(
      "src/main/resources/graft/namehash_vectors.parquet")
      .toAbsolutePath.toString)

  /** [[vectorsPath]] with a fail-fast existence check naming the
    * override knob — used by the READ side (a23's Spark plan), so a
    * session launched outside the checkout root (IDE runner,
    * spark-submit elsewhere) gets this message instead of an opaque
    * parquet error, while non-a23 queries stay unaffected. */
  def vectorsPathChecked: String = {
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(vectorsPath)),
      s"namehash expected-vectors parquet not found at $vectorsPath — " +
        "launch from the checkout root or set GRAFT_VECTORS_PATH to the " +
        "file (src/main/resources/graft/namehash_vectors.parquet)")
    vectorsPath
  }
}
