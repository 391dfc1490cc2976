package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MySQL-dump `INSERT INTO … VALUES (…),(…),…;` parsing — the
  * reference's second inlet format (collection-templates
  * scripts/parse_wiki_dump.py streams the Wikipedia pagelinks /
  * categorylinks / redirect SQL dumps and regex-splits each INSERT
  * line into tuples).
  *
  * Spark-first: `regexp_extract_all` + `explode` over a
  * `spark.read.text` scan — pure codegen'd Column work, one
  * embarrassingly parallel stage, no shuffle; typed field extraction
  * composes on top with further `regexp_extract`s.
  *
  * Tuple splitting is QUOTE-AWARE (r12 review fix): a tuple's
  * content is scanned as a sequence of single-quoted spans (with
  * MySQL's `\'` and `''` escapes) or non-paren/non-quote characters,
  * so parentheses INSIDE quoted string values — ubiquitous in the
  * Wikipedia title dumps this targets, e.g.
  * `'Python_(programming_language)'` — stay inside their tuple
  * instead of truncating it (the earlier `[^()]*` content class
  * silently corrupted any such row). Residual caveat, down from the
  * reference parser's own: a tuple with an UNTERMINATED quote (a
  * malformed dump line) fails the scan and is dropped, not
  * mis-split.
  */
object SqlDump {

  /** Tuple content: quoted spans consumed atomically (escapes `\x`
    * and `''` included), everything else must avoid parens/quotes.
    * Shared with the c4 DuckDB oracle, which replays the same
    * pattern in RE2. */
  val tupleRe: String = "\\(((?:'(?:[^'\\\\]|\\\\.|'')*'|[^()'])*)\\)"

  /** One row per `(…)` tuple (content without the parens, quotes
    * preserved) from each INSERT line. Non-INSERT lines (CREATE TABLE
    * column definitions, KEY clauses, comments — all of which contain
    * parenthesized spans in real dumps) are dropped first. */
  def tuples(lines: DataFrame, lineCol: String = "value"): DataFrame =
    lines.filter(col(lineCol).startsWith("INSERT "))
      .select(explode(
        regexp_extract_all(col(lineCol), lit(tupleRe), lit(1))).as("tuple"))
}
