package graft.queries

/** Shared DuckDB oracle SQL fragments — ONE definition of the
  * tokenizer and n-gram constructions, so the oracles of every
  * shingle/token consumer (d2/d7/d8/d9/d10, f1-f4/f7-f10, p2) cannot
  * drift from `Text.tokens` / `Text.shingles` independently. Any
  * change to tokenization parity is made here and in Text, and the
  * driver's hash gate re-proves every affected oracle.
  */
private[graft] object DuckSql {

  /** Whitespace tokens, empties dropped (`Text.tokens` parity).
    * The explicit class, not `\s` (r13): RE2's `\s` omits VERTICAL
    * TAB where Java's includes it — `Text.wsClass` spelled into both
    * engines is what makes the tokenizer dialect-proof. */
  val toks: String =
    "list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'), t -> len(t) > 0)"

  /** Word n-gram list from a `words` list column (`Text.shingles`
    * parity: space-joined, len−n+1 grams, 1-based list indexing). */
  def grams(n: Int): String = {
    val parts = (0 until n).map(i => s"words[i+$i]").mkString(" || ' ' || ")
    s"list_transform(generate_series(1, greatest(len(words) - ${n - 1}, 0)), i -> $parts)"
  }

  /** The `w` CTE body both dedup and corpus oracles start from:
    * (doc_id, words). */
  val wordsCte: String = s"SELECT doc_id, $toks AS words FROM documents"

  /** Hex→int fold over an 8-char hex substring (DuckDB has no
    * conv()): one unsigned 32-bit word. */
  def hexFold(sub: String): String =
    "list_reduce(list_transform(string_split(" + sub + ", ''), " +
      "c -> strpos('0123456789abcdef', c) - 1)::BIGINT[], (a, b) -> a * 16 + b)"

  /** Shared CTE prefix for the hyperplane-LSH oracles (e2/d6):
    * L2-normalized embeddings `u` and per-(table, bit) ±1 plane lists
    * `pl`, replaying `Similarity.planes` (md5 parity, seed 42,
    * 16 tables × 5 bits × 64 dims) and `ArrayNormalize` (ascending
    * sum of squares, zero-norm pass-through) exactly. Every float
    * reduction below is an ascending left fold — the same operation
    * sequence as the codegen'd ArrayDot loop — so even the bucket
    * SIGN bits reproduce bit-for-bit, no rounding gamble. */
  val lshCtes: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
      |nr AS (SELECT vec_id, vd,
      |         sqrt(list_reduce(list_transform(vd, x -> x * x),
      |              (a, b) -> a + b)) AS nrm FROM e),
      |u AS (SELECT vec_id,
      |        CASE WHEN nrm = 0 THEN vd
      |             ELSE list_transform(vd, x -> x / nrm) END AS u FROM nr),
      |tj AS (SELECT t, j
      |       FROM (SELECT unnest(generate_series(0, 15)) AS t),
      |            (SELECT unnest(generate_series(0, 4)) AS j)),
      |pl AS (SELECT t, j, list_transform(generate_series(0, 63), i ->
      |         CASE WHEN (${hash64md5("t || ':' || j || ':' || i || ':' || 42")} & 1) = 0
      |              THEN 1.0 ELSE -1.0 END) AS s
      |       FROM tj),
      |bk AS (SELECT vec_id, t,
      |         cast(sum(CASE WHEN dot >= 0 THEN (1::BIGINT << j) ELSE 0 END)
      |              AS bigint) AS bucket
      |       FROM (SELECT vec_id, t, j,
      |               list_reduce(list_transform(generate_series(1, 64),
      |                 i -> u[i] * s[i]), (a, b) -> a + b) AS dot
      |             FROM u, pl)
      |       GROUP BY 1, 2)""".stripMargin

  /** `Text.hash64md5` parity: first 8 bytes of md5(utf8(expr)) as a
    * signed big-endian 64-bit value, assembled from the two 32-bit
    * hex halves (no intermediate overflows). */
  def hash64md5(expr: String): String = {
    val hi = hexFold(s"substr(md5($expr), 1, 8)")
    val lo = hexFold(s"substr(md5($expr), 9, 8)")
    s"((CASE WHEN $hi >= 2147483648 THEN $hi - 4294967296 ELSE $hi END) " +
      s"* 4294967296 + $lo)"
  }
}
