package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text building blocks. Everything here is built from
  * `org.apache.spark.sql.functions` (higher-order functions included)
  * so it stays inside whole-stage codegen — no UDFs in any hot path.
  */
object Text {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles as an array of strings; empty array when the
    * document has fewer than n words. (Reference analogue: the document
    * fingerprints behind related-collection search —
    * collection-templates research/related-collections.)
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }
}
