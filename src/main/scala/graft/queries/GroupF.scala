package graft.queries

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group F — text analysis over the `documents` table: token counting,
  * quality scoring, language identification, document fingerprinting.
  * These are the per-document scoring stages a training-data pipeline
  * runs before dedup/filtering (reference analogue: the name-curation
  * and interesting-score stages of collection-templates
  * scripts/prepare_members_names.py, generalized to document content).
  *
  * Everything is a single narrow projection over the scan — no
  * shuffle, no UDFs (higher-order functions only), so at 100 TB each
  * of these runs as one embarrassingly-parallel codegen'd pass.
  */
object GroupF {
  type Q = (SparkSession, String) => DataFrame

  /** "BPE-ish" subword segmentation: letter runs, digit runs, single
    * punctuation marks — the standard pre-tokenizer regex shape. */
  private val subtokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

  private val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Per-language marker stopword lists (disjoint across languages so
    * the argmax is unambiguous). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => lit(w)): _*))).cast("long")

  val queries: Map[String, Q] = Map(
    // f1: token statistics — whitespace tokens, distinct tokens,
    // BPE-ish subword count, mean token length. The token array is
    // staged once: array lambdas run interpreted, so a repeated
    // `tokens(text)` expression would re-split per usage.
    "f1_token_stats" -> ((s, d) => {
      val toks = col("toks")
      Tables(s, d, "documents")
        .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"),
          regexp_count(col("text"), lit(subtokenRe)).cast("long").as("n_subtokens"),
          when(size(toks) === 0, lit(0.0))
            .otherwise(round(
              aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
                size(toks), 6)).as("avg_token_len"))
    }),

    // f2: quality score from length / punctuation-ratio /
    // stopword-ratio signals, combined into one [0,1] score.
    "f2_quality_score" -> ((s, d) => {
      val toks = col("toks")
      val nToks = size(toks).cast("double")
      val nChars = length(col("text")).cast("double")
      val punctRatio = when(nChars === 0, lit(0.0))
        .otherwise(regexp_count(col("text"), lit("[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]")).cast("double") / nChars)
      val stopRatio = when(nToks === 0, lit(0.0))
        .otherwise(countIn(toks, stopwords).cast("double") / nToks)
      val lenScore = least(nToks / 100.0, lit(1.0))
      Tables(s, d, "documents")
        .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          round(punctRatio, 6).as("punct_ratio"),
          round(stopRatio, 6).as("stopword_ratio"),
          round(lenScore * 0.5 + (lit(1.0) - stopRatio) * 0.3 +
            (lit(1.0) - punctRatio) * 0.2, 6).as("quality"))
    }),

    // f3: language guess by marker-stopword overlap, deterministic
    // priority order on ties, 'und' when no marker hits.
    "f3_lang_id" -> ((s, d) => {
      val toks = col("toks")
      val scored = Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id") +: col("lang") +:
          langMarkers.map { case (l, ws) => countIn(toks, ws).as(s"s_$l") }: _*)
      val best = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
      val guess = langMarkers.foldRight(lit("und")) { case ((l, _), els) =>
        when(col(s"s_$l") > 0 && col(s"s_$l") === best, lit(l)).otherwise(els)
      }
      scored.select(col("doc_id"), col("lang"), guess.as("guess"))
    }),

    // f4: content fingerprint — md5 of the sorted distinct 3-shingle
    // set, the canonical "same content modulo shingle order" key.
    // Tokens are staged in their own projection so the interpreted
    // shingle lambda reads a bound column, not a re-split per element.
    "f4_fingerprint" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          md5(concat_ws("|",
            array_sort(array_distinct(Text.shingles(col("toks"), 3)))))
            .as("fingerprint"))),

    // f6: PII scrubbing — the redaction pass every training-data
    // pipeline runs before exporting text (Text.scrubPii) plus
    // per-kind match counts on the original text.
    "f6_pii_scrub" -> ((s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"),
        Text.scrubPii(col("text")).as("scrubbed"),
        regexp_count(col("text"), lit(Text.emailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(Text.ipRe)).cast("long").as("n_ips"),
        regexp_count(col("text"), lit(Text.phoneRe)).cast("long").as("n_phones"))),

    // f5: deterministic stratified sampling — md5-bucketed keep/drop
    // with per-language rates (en 50%, rest 20%); reproducible across
    // engines/partitionings, no RNG. Narrow filter, zero shuffles.
    "f5_stratified_sample" -> ((s, d) =>
      graft.operators.Sampling.stratifiedSample(
        Tables(s, d, "documents"), col("doc_id"), col("lang"),
        rates = Map("en" -> 50), defaultRate = 20)
        .select("doc_id", "lang")),

    // f7: per-language token-count distribution — the corpus-shape
    // monitoring every curation pipeline keeps (length cutoffs,
    // truncation budgets key off these quantiles). Exact interpolated
    // percentiles here because they are oracle-able (DuckDB
    // quantile_cont shares the (n-1)p interpolation); the 100 TB form
    // is the same groupBy with approx_percentile (mergeable t-digest
    // partial aggs, no per-group sort) — drift vs exact is pinned in
    // TextEventsSpec.
    "f7_token_percentiles" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("lang"), size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             round(expr("percentile(n_tokens, 0.5D)"), 6).as("p50"),
             round(expr("percentile(n_tokens, 0.95D)"), 6).as("p95"),
             round(expr("percentile(n_tokens, 0.99D)"), 6).as("p99"),
             max(col("n_tokens")).as("max_tokens"))),
  )

  // PII patterns interpolated verbatim into the DuckDB oracles (both
  // engines take RE2/Java-compatible syntax) — single source in Text.
  import Text.{emailRe, ipRe, phoneRe}

  // Shared oracle fragment — single definition in DuckSql.
  private val duckToks = DuckSql.toks

  private def duckCountIn(words: Seq[String]): String =
    s"cast(len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")}))) AS bigint)"

  val oracles: Map[String, String] = Map(
    "f1_token_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $duckToks AS toks FROM documents)
         |SELECT doc_id,
         |  cast(len(toks) AS bigint) AS n_tokens,
         |  cast(len(list_distinct(toks)) AS bigint) AS n_distinct,
         |  cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) AS bigint) AS n_subtokens,
         |  CASE WHEN len(toks) = 0 THEN 0.0
         |       ELSE round(list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks), 6)
         |  END AS avg_token_len
         |FROM t""".stripMargin,

    "f2_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
         |r AS (SELECT doc_id,
         |  CASE WHEN len(text) = 0 THEN 0.0
         |       ELSE len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) * 1.0 / len(text) END AS punct_ratio,
         |  CASE WHEN len(toks) = 0 THEN 0.0
         |       ELSE ${duckCountIn(stopwords)} * 1.0 / len(toks) END AS stopword_ratio,
         |  least(len(toks) / 100.0, 1.0) AS len_score
         |FROM t)
         |SELECT doc_id, round(punct_ratio, 6) AS punct_ratio,
         |  round(stopword_ratio, 6) AS stopword_ratio,
         |  round(len_score * 0.5 + (1.0 - stopword_ratio) * 0.3 +
         |        (1.0 - punct_ratio) * 0.2, 6) AS quality
         |FROM r""".stripMargin,

    "f3_lang_id" ->
      s"""WITH t AS (SELECT doc_id, lang, $duckToks AS toks FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  ${langMarkers.map { case (l, ws) => s"${duckCountIn(ws)} AS s_$l" }.mkString(",\n  ")}
         |FROM t)
         |SELECT doc_id, lang,
         |  CASE ${langMarkers.map { case (l, _) =>
               s"WHEN s_$l > 0 AND s_$l = greatest(${langMarkers.map(m => s"s_${m._1}").mkString(", ")}) THEN '$l'"
             }.mkString(" ")}
         |       ELSE 'und' END AS guess
         |FROM sc""".stripMargin,

    "f6_pii_scrub" ->
      s"""SELECT doc_id,
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
         |      '$ipRe', '<IP>', 'g'),
         |    '$phoneRe', '<PHONE>', 'g') AS scrubbed,
         |  cast(len(regexp_extract_all(text, '$emailRe')) AS bigint) AS n_emails,
         |  cast(len(regexp_extract_all(text, '$ipRe')) AS bigint) AS n_ips,
         |  cast(len(regexp_extract_all(text, '$phoneRe')) AS bigint) AS n_phones
         |FROM documents""".stripMargin,

    "f5_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::BIGINT % 100 <
        |      CASE WHEN lang = 'en' THEN 50 ELSE 20 END""".stripMargin,

    "f4_fingerprint" ->
      s"""WITH w AS (SELECT doc_id, $duckToks AS words FROM documents),
         |sh AS (SELECT doc_id,
         |         list_sort(list_distinct(list_transform(
         |           generate_series(1, greatest(len(words) - 2, 0)),
         |           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS shingles
         |       FROM w)
         |SELECT doc_id, md5(array_to_string(shingles, '|')) AS fingerprint FROM sh""".stripMargin,

    "f7_token_percentiles" ->
      s"""WITH t AS (SELECT lang,
         |             cast(len($duckToks) AS bigint) AS n_tokens FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  round(quantile_cont(n_tokens, 0.5), 6) AS p50,
         |  round(quantile_cont(n_tokens, 0.95), 6) AS p95,
         |  round(quantile_cont(n_tokens, 0.99), 6) AS p99,
         |  max(n_tokens) AS max_tokens
         |FROM t GROUP BY 1""".stripMargin,
  )
}
