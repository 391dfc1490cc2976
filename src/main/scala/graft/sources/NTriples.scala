package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-triples line parsing — the reference's dump inlet
  * (collection-templates scripts/create_kv.py `clean` /
  * `entity_generator`, which regex-strips wikidata URI prefixes from
  * grep-filtered dump lines).
  *
  * Spark-first: the parse is pure `Column` regex work, so it fuses into
  * whole-stage codegen over a `spark.read.text` scan — at cluster scale
  * a 100 TB dump parses as one embarrassingly parallel stage with no
  * shuffle, and the predicate filter that follows pushes into the scan.
  */
object NTriples {

  private val lineRe = "^<([^>]+)> <([^>]+)> (.+) \\.$"

  /** Last path segment of a URI — `<http://…/entity/Q42>` → `Q42`. */
  def uriLocal(c: Column): Column = regexp_extract(c, "([^/#]+)$", 1)

  /** Parse a column of N-triples lines into
    * (subject, predicate, obj, obj_is_uri); subject/predicate are
    * prefix-cleaned to their local names; URI objects likewise, literal
    * objects keep the lexical form — backslash escape sequences
    * (\" \\ \n …) included verbatim, language tags / datatypes
    * dropped, as in the reference's `clean`. Malformed lines yield
    * empty subjects and can be filtered by the caller.
    */
  def parse(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val raw = col(lineCol)
    val objRaw = regexp_extract(raw, lineRe, 3)
    val isUri = objRaw.startsWith("<")
    lines.select(
      uriLocal(regexp_extract(raw, lineRe, 1)).as("subject"),
      uriLocal(regexp_extract(raw, lineRe, 2)).as("predicate"),
      when(isUri, uriLocal(regexp_extract(objRaw, "^<([^>]+)>$", 1)))
        // Escape-aware literal body: a quote only terminates the
        // literal when not preceded by a backslash escape.
        .otherwise(regexp_extract(objRaw, "^\"((?:[^\"\\\\]|\\\\.)*)\"", 1)).as("obj"),
      isUri.as("obj_is_uri"))
  }
}
