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
  * composes on top with further `regexp_extract`s. Same caveat as the
  * reference's own parser: tuple splitting assumes values contain no
  * unescaped parentheses (true for the id/title/namespace dumps it
  * targets).
  */
object SqlDump {

  /** One row per `(…)` tuple (content without the parens, quotes
    * preserved) from each INSERT line. Non-INSERT lines (CREATE TABLE
    * column definitions, KEY clauses, comments — all of which contain
    * parenthesized spans in real dumps) are dropped first. */
  def tuples(lines: DataFrame, lineCol: String = "value"): DataFrame =
    lines.filter(col(lineCol).startsWith("INSERT "))
      .select(explode(
        regexp_extract_all(col(lineCol), lit("\\(([^()]*)\\)"), lit(1))).as("tuple"))
}
