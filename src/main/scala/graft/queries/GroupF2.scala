package graft.queries

import graft.Tables
import graft.functions.Text
import graft.operators.Checkpoints.Cuttable
import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group F (cont.) — corpus-level text ops a training-data pipeline
  * runs between scoring and export: TF-IDF term extraction, context-
  * window chunking, repetition signals. (Reference analogue: keyword
  * extraction + ngram log-probability in collection-templates
  * scripts/prepare_members_names.py / prepare_collections2.py,
  * generalized from names to document content — same engine shapes:
  * explode → keyed agg → broadcast model join.)
  *
  * All three stay exact-oracled: the math is integer counts plus
  * IEEE-double `ln`/division with explicit operation order, so DuckDB
  * reproduces every bit before the final round(…, 6).
  */
object GroupF2 {
  type Q = (SparkSession, String) => DataFrame

  // Shared with p2's chunk accounting (GroupP) — one definition, so
  // tuning the window can't silently desynchronize the two laws.
  private[queries] val ChunkSize = 50
  private[queries] val ChunkStride = 40

  val queries: Map[String, Q] = Map(
    // f8: per-document top-3 terms by TF-IDF — the classic keyword
    // extraction every corpus pipeline ships (search keywords, topic
    // tags). One explode + two keyed aggs; the document-frequency
    // model and corpus size are dimension-sized and broadcast into
    // the scoring join, so at 100 TB this is: one shuffle on
    // (doc, term), one on term, then map-side math + a per-doc
    // window over data already partitioned by doc.
    // Ranking happens on the ROUNDED score so both engines order
    // identically; term asc breaks ties deterministically (terms are
    // unique per doc, so the ordering is total).
    "f8_tfidf" -> ((s, d) =>
      graft.operators.Corpus.tfidfTopTerms(
          Tables(s, d, "documents"), "doc_id", "text", k = 3)
        .select(col("id").as("doc_id"), col("term"), col("tf"),
          col("score"), col("rn"))),

    // f9: context-window chunking — split each document into
    // overlapping token windows (size 50, stride 40), the shape every
    // LLM ingestion pipeline needs before embedding/packing. Purely
    // narrow: stage tokens, explode the window starts, slice. Zero
    // shuffles, codegen'd end to end; at 100 TB this is a single
    // embarrassingly-parallel pass whose output is ~(n/stride)× the
    // input rows — the explode happens after column pruning, so only
    // the token array fans out.
    "f9_chunk_windows" -> ((s, d) =>
      graft.operators.Corpus.chunkWindows(Tables(s, d, "documents"),
          "doc_id", "text", ChunkSize, ChunkStride)
        .select(col("id").as("doc_id"), col("chunk_idx"), col("chunk_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))),

    // f12: sequence packing — f9's chunks laid end-to-end per source
    // and cut into 256-token training sequences by running offset
    // (Corpus.packSequences). The step between chunking and export:
    // packing concatenated examples into fixed-length sequences is
    // what keeps training batches padding-free. Aggregated per
    // (source, seq_id) so the compare stays compact — count and token
    // sum per packed sequence. The window partitions on `source` here
    // because the oracle needs a deterministic key; at corpus scale
    // the operator contract requires a shard-granular key (see
    // packSequences doc) — packing is sequential within a shard.
    "f12_pack_sequences" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val chunks = graft.operators.Corpus
        .chunkWindows(docs, "doc_id", "text", ChunkSize, ChunkStride)
        .join(docs.select(col("doc_id").as("id"), col("source")), "id")
      graft.operators.Corpus.packSequences(chunks, Seq(col("source")),
          Seq(col("id"), col("chunk_idx")), col("chunk_tokens"),
          budget = 256L)
        .groupBy("source", "seq_id")
        .agg(count(lit(1)).as("n_chunks"),
             sum(col("chunk_tokens")).as("n_tokens"))
    }),

    // f13: the composed keep/drop quality GATE with reject reasons —
    // the decision step the f2/f10/f11 signals exist to feed (the
    // C4/Gopher filtering stage: every corpus pipeline cuts documents
    // on token count, word-length sanity, duplicate-token mass and
    // top-bigram repetition, and records WHY each document died so
    // the cuts are auditable). Zero-shuffle by design: every signal —
    // including the top-bigram count, via a max-run scan over the
    // SORTED bigram array — is computed per row in one narrow
    // projection, so at 100 TB the gate runs as a pure map BEFORE any
    // pairing/shuffle stage ever sees the dropped rows (the p2 stage-
    // order rule). Threshold comparisons are on exact integer-ratio
    // doubles, identical in both engines; rounding is display-only.
    "f13_quality_gate" -> ((s, d) =>
      graft.operators.Corpus.qualityGate(
          Tables(s, d, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // f14: Unicode NFC normalization — graft's native NfcNormalize
    // expression against DuckDB's built-in nfc_normalize, proven
    // byte-for-byte via md5 of the composed output. The corpus text
    // is ASCII, so each row is decorated with DECOMPOSED sequences
    // (e+U+0301, n+U+0303, A+U+030A) built from identical literals in
    // both engines; composition must shrink the code-point count by
    // exactly 3 and produce the same bytes. Purely narrow: one
    // codegen'd projection, zero shuffles — the canonicalization step
    // that runs before any 100 TB dedup/fingerprint stage.
    "f14_nfc_normalize" -> ((s, d) => {
      val deco = concat(lit("Café "), substring(col("text"), 1, 40),
        lit(" niño Å"))
      Tables(s, d, "documents")
        .select(col("doc_id"), deco.as("raw"))
        .select(col("doc_id"), length(col("raw")).cast("long").as("raw_cp"),
          Text.nfc(col("raw")).as("nfc"))
        .select(col("doc_id"), col("raw_cp"),
          length(col("nfc")).cast("long").as("nfc_cp"),
          substring(col("nfc"), 1, 5).as("nfc_prefix"),
          md5(col("nfc").cast("binary")).as("nfc_md5"))
    }),

    // f11: character-level Shannon entropy (nats) — the third classic
    // quality cut (after length/ratio gates and repetition): binary
    // junk and encoding garbage score high, keyboard-mash and
    // single-char spam score low. Identity used on both engines:
    // H = ln N − (Σ c·ln c)/N over per-char counts c, so one keyed
    // agg per (doc, char) then one per doc — both map-side
    // combinable, no per-doc state beyond the running sums.
    "f11_char_entropy" -> ((s, d) => {
      Tables(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) > 0)
        .groupBy("doc_id", "ch").agg(count(lit(1)).cast("double").as("c"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_distinct_chars"),
             sum(col("c")).cast("long").as("n_chars"),
             round(log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c")), 6)
               .as("char_entropy"))
    }),

    // f10: repetition signals (the Gopher/C4-style quality cuts):
    // fraction of all word-bigrams taken by the most frequent bigram,
    // same for trigrams, plus the duplicate-token fraction. High
    // values = boilerplate/spam. Shuffles on (doc, gram) only — group
    // cardinality is bounded by document length, embarrassingly
    // parallel across docs, no cross-document state at all.
    "f10_repetition" -> ((s, d) => {
      // The tokenized frame feeds the dup-token branch AND both n-gram
      // branches — cut, or the corpus-wide tokenization runs once per
      // branch (the r14 scan audit caught documents scanned 3x here;
      // Catalyst does not dedupe common subplans).
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .cut()
      def topFrac(n: Int): DataFrame =
        docs.select(col("doc_id"), explode(Text.shingles(col("toks"), n)).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(round(max(col("c")).cast("double") / sum(col("c")), 6)
            .as(s"top${n}gram_frac"))
      val base = docs.select(col("doc_id"),
        when(size(col("toks")) === 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 6))
          .as("dup_token_frac"))
      // Docs shorter than n words have no n-grams → left join, 0.0.
      base.join(topFrac(2), Seq("doc_id"), "left")
        .join(topFrac(3), Seq("doc_id"), "left")
        .select(col("doc_id"), col("dup_token_frac"),
          coalesce(col("top2gram_frac"), lit(0.0)).as("top2gram_frac"),
          coalesce(col("top3gram_frac"), lit(0.0)).as("top3gram_frac"))
    }),

    // f15: CCNet-style head/middle/tail quality terciles by unigram
    // perplexity under a corpus-fit model (Corpus.perplexityBuckets;
    // Wenzek et al. LREC'20). The tercile cut is two exact
    // interpolated percentiles broadcast as a 1-row dim — never a
    // global ntile window (a single-partition sort of the corpus).
    "f15_perplexity_buckets" -> ((s, d) =>
      graft.operators.Corpus
        .perplexityBuckets(Tables(s, d, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"), col("nll"),
          col("bucket"))),

    // f16: domain-mixture sampling — target language shares applied
    // as a one-pass corpus cut (Sampling.mixtureSample): the largest
    // no-upsampling sample matching en .5 / de .2 / fr .2 / es .1;
    // zh is deliberately unlisted (the mixture defines the corpus,
    // so unlisted domains drop).
    "f16_domain_mixture" -> ((s, d) =>
      graft.operators.Sampling.mixtureSample(
        Tables(s, d, "documents"), col("doc_id"), col("lang"),
        Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.1))
        .select("doc_id", "lang")),

    // f17: token-budget selection — keep the highest-quality documents
    // until a 10k-token budget fills (Corpus.tokenBudgetSelect). The
    // bucketed two-phase cut: per-bucket sums (map-side combinable,
    // |buckets| rows), verdicts broadcast back, and only the single
    // boundary bucket pays an in-bucket window — never a global
    // score-ordered sort of the corpus (the 100 TB anti-pattern the
    // oracle's one-window replay is allowed to commit at sf scale).
    "f17_token_budget" -> ((s, d) =>
      graft.operators.Corpus.tokenBudgetSelect(
          Tables(s, d, "documents"), "doc_id", "text",
          budgetTokens = 10000L)
        .select(col("id").as("doc_id"), col("bucket"), col("n_tokens"))),

    // f18: epoch-based mixture materialization — the upsampling half
    // f16 deliberately excludes (The Pile's epochs: en 1.0, de 2.5,
    // fr 0.25, es 1.75; zh unlisted drops). Each row explodes into
    // floor(epochs) copies plus one more for the salted-md5-picked
    // epoch fraction; purely narrow, fan-out = the epoch multiplier.
    "f18_epoch_mix" -> ((s, d) =>
      graft.operators.Sampling.epochMixture(
          Tables(s, d, "documents"), col("doc_id"), col("lang"),
          Map("en" -> 1.0, "de" -> 2.5, "fr" -> 0.25, "es" -> 1.75))
        .select(col("doc_id"), col("lang"), col("copy_idx"))),

    // f19: weighted sampling without replacement (Efraimidis-
    // Spirakis) — sample documents proportional to token count (long
    // docs likelier, the "sample by content mass" cut f5's uniform
    // rates can't express). Deterministic md5 uniforms → the selected
    // SET is engine-reproducible bit-for-bit; ranking on ln(u)/w
    // avoids pow(). Narrow projection + global top-n (TakeOrdered),
    // never a corpus sort.
    "f19_weighted_sample" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"),
          (size(Text.tokens(col("text"))) + 1).cast("double").as("w"))
      graft.operators.Sampling.weightedSample(
          docs, col("doc_id"), col("w"), n = 120, salt = "f19")
        .select(col("id").as("doc_id"), col("weight"), col("priority"))
    }),

    // f20: count-min frequency estimation — "how often does each
    // benchmark gram occur in the corpus" answered from a depth×width
    // counter DIM instead of a corpus-sized per-gram aggregation (the
    // d9 probe-set question at sketch cost; one-sided error, never an
    // underestimate). n_exact rides along so the overestimate law is
    // visible in the gated output itself.
    "f20_cms_counts" -> ((s, d) => cmsCountsOf(Tables(s, d, "documents"))),

    // f21: feature hashing — text to a FIXED-width integer vector
    // with no vocabulary model (the 100 TB vectorizer: nothing
    // corpus-global to fit, broadcast, or OOM on). The dense array
    // renders as a canonical csv string for the dialect-stable hash
    // compare.
    "f21_hash_vectorize" -> ((s, d) => {
      graft.operators.Corpus.hashVectorize(
          Tables(s, d, "documents"), "doc_id", "text", dim = 64)
        .select(col("id").as("doc_id"),
          array_join(transform(col("vec"), _.cast("string")), ",").as("vec"),
          col("n_tokens"))
    }),

    // f22: bigram LM with add-one smoothing, fit on the 95% slice
    // and scored on the 5% holdout (the d13/f20 slice idiom) — so
    // unseen bigrams actually occur and the smoothing term is
    // exercised through the gate, unlike a self-scored model where
    // every bigram is in the fit by construction.
    "f22_bigram_nll" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      graft.operators.Corpus.bigramNll(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"), col("nll"))
    }),
  )

  /** The registered f20 body (shared with ScaleProbe so probe and
    * query cannot drift). The n_exact ride-along makes this query
    * consume the gram stream THREE times (build, probe set, exact
    * confirm) — cut it once so shingling+tokenization run once per
    * document. Pure sketch use (build only) touches the corpus
    * exactly once and needs no cut. */
  private[graft] def cmsCountsOf(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Text.shingles(col("toks"), 3)).as("gram"))
      .cut()
    val cms = graft.operators.Sketches.cmsCounters(
      grams.select("gram"), "gram", depth = 4, width = 1024)
    val probes = grams.filter(col("doc_id") % 20 === 0)
      .select("gram").distinct()
    val est = graft.operators.Sketches.cmsEstimate(cms, probes, "gram",
      depth = 4, width = 1024)
    grams.join(probes, Seq("gram"), "left_semi")
      .groupBy("gram").agg(count(lit(1)).as("n_exact"))
      .join(est, Seq("gram"))
      .select(col("gram"), col("n_exact"), col("n_est"))
  }

  // Shared oracle fragments — single definition in DuckSql.
  private val duckToks = DuckSql.toks
  private def duckGrams(n: Int): String = DuckSql.grams(n)

  val oracles: Map[String, String] = Map(
    "f8_tfidf" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |n AS (SELECT cast(count(*) AS double) AS n_docs FROM t),
         |tf AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df_t FROM tfc GROUP BY 1),
         |scored AS (SELECT doc_id, term, tf,
         |             round(tf * 1.0 * ln(n_docs / df_t), 6) AS score
         |           FROM tfc JOIN dfreq USING (term) CROSS JOIN n)
         |SELECT * FROM (
         |  SELECT doc_id, term, tf, score,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY score DESC, term ASC) AS rn
         |  FROM scored) WHERE rn <= 3""".stripMargin,

    "f12_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source, $duckToks AS toks FROM documents),
         |d AS (SELECT doc_id, source, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
         |st AS (SELECT doc_id, source, toks, n,
         |         unnest(generate_series(0, n - 1, $ChunkStride)) AS start
         |       FROM d),
         |c AS (SELECT doc_id, source, start // $ChunkStride AS chunk_idx,
         |        cast(len(list_slice(toks, start + 1, least(start + $ChunkSize, n))) AS bigint)
         |          AS chunk_tokens
         |      FROM st),
         |p AS (SELECT source, chunk_tokens,
         |        coalesce(sum(chunk_tokens) OVER (PARTITION BY source
         |          ORDER BY doc_id, chunk_idx
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS seq_offset
         |      FROM c)
         |SELECT source, cast(seq_offset // 256 AS bigint) AS seq_id,
         |  count(*) AS n_chunks,
         |  cast(sum(chunk_tokens) AS bigint) AS n_tokens
         |FROM p GROUP BY 1, 2""".stripMargin,

    "f9_chunk_windows" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |d AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
         |st AS (SELECT doc_id, toks, n,
         |         unnest(generate_series(0, n - 1, $ChunkStride)) AS start
         |       FROM d),
         |c AS (SELECT doc_id, start // $ChunkStride AS chunk_idx,
         |        list_slice(toks, start + 1, least(start + $ChunkSize, n)) AS chunk
         |      FROM st)
         |SELECT doc_id, chunk_idx,
         |  cast(len(chunk) AS bigint) AS chunk_tokens,
         |  md5(array_to_string(chunk, ' ')) AS chunk_hash
         |FROM c""".stripMargin,

    // The top-bigram count comes from a (doc, gram) GROUP BY here —
    // different plan, same value as the Spark side's narrow max-run
    // scan; the hash gate proves the equivalence on every document.
    "f13_quality_gate" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS words
         |           FROM (SELECT doc_id, coalesce(text, '') AS text
         |                 FROM documents)),
         |b AS (SELECT doc_id, words, len(words) AS n, ${duckGrams(2)} AS g2 FROM t),
         |tg AS (SELECT doc_id, max(c) AS topc FROM (
         |         SELECT doc_id, g, count(*) AS c
         |         FROM (SELECT doc_id, unnest(g2) AS g FROM b) GROUP BY 1, 2)
         |       GROUP BY 1),
         |sig AS (SELECT doc_id, cast(n AS bigint) AS n,
         |  CASE WHEN n = 0 THEN 0.0
         |       ELSE list_aggregate(list_transform(words, w -> len(w)), 'sum') * 1.0 / n
         |       END AS mwl,
         |  CASE WHEN n = 0 THEN 0.0
         |       ELSE 1.0 - len(list_distinct(words)) * 1.0 / n END AS dupf,
         |  CASE WHEN len(g2) = 0 THEN 0.0
         |       ELSE coalesce(topc, 0) * 1.0 / len(g2) END AS topgf
         |FROM b LEFT JOIN tg USING (doc_id))
         |SELECT doc_id, n AS n_tokens,
         |  round(mwl, 6) AS mean_word_len,
         |  round(dupf, 6) AS dup_token_frac,
         |  round(topgf, 6) AS top2gram_frac,
         |  concat_ws(',',
         |    CASE WHEN n < 25 THEN 'too_short' END,
         |    CASE WHEN n > 5000 THEN 'too_long' END,
         |    CASE WHEN mwl < 3.0 OR mwl > 8.0 THEN 'word_len' END,
         |    CASE WHEN dupf > 0.6 THEN 'dup_tokens' END,
         |    CASE WHEN topgf > 0.05 THEN 'repetitive' END) AS reasons,
         |  (n >= 25 AND n <= 5000 AND mwl >= 3.0 AND mwl <= 8.0
         |   AND dupf <= 0.6 AND topgf <= 0.05) AS keep
         |FROM sig""".stripMargin,

    "f14_nfc_normalize" ->
      """WITH raw AS (SELECT doc_id,
        |  'Café ' || substr(text, 1, 40) || ' niño Å' AS r
        |  FROM documents),
        |n AS (SELECT doc_id, r, nfc_normalize(r) AS nfc FROM raw)
        |SELECT doc_id, cast(length(r) AS bigint) AS raw_cp,
        |  cast(length(nfc) AS bigint) AS nfc_cp,
        |  substr(nfc, 1, 5) AS nfc_prefix,
        |  md5(nfc) AS nfc_md5
        |FROM n""".stripMargin,

    "f11_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
        |            FROM documents),
        |cc AS (SELECT doc_id, ch, count(*)::DOUBLE AS c
        |       FROM ch WHERE len(ch) > 0 GROUP BY 1, 2)
        |SELECT doc_id,
        |  count(*) AS n_distinct_chars,
        |  cast(sum(c) AS bigint) AS n_chars,
        |  round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS char_entropy
        |FROM cc GROUP BY 1""".stripMargin,

    "f10_repetition" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS words FROM documents),
         |g2 AS (SELECT doc_id, unnest(${duckGrams(2)}) AS g FROM t),
         |g3 AS (SELECT doc_id, unnest(${duckGrams(3)}) AS g FROM t),
         |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
         |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
         |f2 AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top2gram_frac
         |       FROM c2 GROUP BY 1),
         |f3 AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top3gram_frac
         |       FROM c3 GROUP BY 1),
         |base AS (SELECT doc_id,
         |           CASE WHEN len(words) = 0 THEN 0.0
         |                ELSE round(1.0 - len(list_distinct(words)) * 1.0 / len(words), 6)
         |           END AS dup_token_frac
         |         FROM t)
         |SELECT doc_id, dup_token_frac,
         |  coalesce(top2gram_frac, 0.0) AS top2gram_frac,
         |  coalesce(top3gram_frac, 0.0) AS top3gram_frac
         |FROM base LEFT JOIN f2 USING (doc_id) LEFT JOIN f3 USING (doc_id)""".stripMargin,

    // Per-token ln rounds to 9 dp before the doc sum (the a27
    // contract: sums of 9-dp multiples are order-independent well
    // below the final 6-dp round), and quantile_cont interpolates at
    // the same IEEE positions as Spark's percentile (1.0/3 and 1D/3
    // are the same double), over the same already-rounded nll values.
    "f15_perplexity_buckets" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |freq AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
         |tot AS (SELECT cast(sum(cnt) AS double) AS total FROM freq),
         |scored AS (SELECT doc_id, cast(count(*) AS bigint) AS n_tokens,
         |             round(-sum(round(ln(cnt / total), 9)) / count(*), 6) AS nll
         |           FROM tok JOIN freq USING (tok) CROSS JOIN tot
         |           GROUP BY 1),
         |cuts AS (SELECT quantile_cont(nll, 1.0/3) AS t1,
         |                quantile_cont(nll, 2.0/3) AS t2 FROM scored)
         |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens, nll,
         |  CASE WHEN nll IS NULL THEN NULL
         |       WHEN nll <= t1 THEN 'head'
         |       WHEN nll <= t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM (SELECT doc_id FROM documents) d
         |LEFT JOIN scored USING (doc_id) CROSS JOIN cuts""".stripMargin,

    // f16 replays the rate derivation with the SAME fixed-order
    // double expressions: weights cast ::DOUBLE (DuckDB bare decimals
    // are DECIMAL — decimal division is not IEEE double math), the
    // global MIN is order-free, floor-then-least quantizes rates
    // identically, and the keep test is f5's md5 bucket at grain 1e6.
    "f16_domain_mixture" ->
      """WITH c AS (SELECT lang AS domain, count(*) AS n
        |           FROM documents GROUP BY 1),
        |w AS (SELECT domain, n,
        |        CASE domain WHEN 'en' THEN 0.5::DOUBLE
        |                    WHEN 'de' THEN 0.2::DOUBLE
        |                    WHEN 'fr' THEN 0.2::DOUBLE
        |                    WHEN 'es' THEN 0.1::DOUBLE END AS w
        |      FROM c),
        |ww AS (SELECT * FROM w WHERE w IS NOT NULL),
        |t AS (SELECT min(cast(n AS DOUBLE) / w) AS t FROM ww),
        |r AS (SELECT domain,
        |        cast(least(1000000, floor(w * t / n * 1000000)) AS bigint)
        |          AS keep_buckets
        |      FROM ww, t)
        |SELECT d.doc_id, d.lang FROM documents d
        |JOIN r ON r.domain = d.lang
        |WHERE ('0x' || substr(md5(cast(d.doc_id AS varchar)), 1, 8))::BIGINT
        |        % 1000000 < r.keep_buckets""".stripMargin,

    // f17's oracle IS the greedy prefix law the bucketed operator
    // implements: one global window here (fine at oracle scale; the
    // operator never runs it), strict-< on the tokens BEFORE each doc
    // in (bucket DESC, shard ASC, doc_id ASC) order — shard is the
    // md5-derived refinement value (mod 100^2 at the default
    // buckets=100, refineLevels=2) whose base-100 digits the operator
    // cuts on. Bucket math is the same fixed-order double expression
    // as the Spark side; the hash is the shared hash64md5 parity
    // construction.
    "f17_token_budget" -> {
      val h = DuckSql.hash64md5("'tb:' || cast(doc_id AS varchar)")
      s"""WITH w AS (SELECT doc_id, $duckToks AS words FROM documents),
         |d AS (SELECT doc_id, len(words) AS nt, len(list_distinct(words)) AS nd
         |      FROM w WHERE len(words) > 0),
         |s AS (SELECT doc_id, cast(nt AS bigint) AS n_tokens,
         |        cast(floor(cast(nd AS DOUBLE) / nt * 100) AS bigint) AS bucket,
         |        (($h % 10000) + 10000) % 10000 AS shard
         |      FROM d),
         |o AS (SELECT doc_id, bucket, n_tokens,
         |        coalesce(sum(n_tokens) OVER (
         |          ORDER BY bucket DESC, shard ASC, doc_id ASC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
         |      FROM s)
         |SELECT doc_id, bucket, n_tokens FROM o WHERE bef < 10000""".stripMargin
    },

    // f18 replays the copy count exactly: floor(ep) plus the salted
    // md5-bucket fractional pick (same ":ep" salt), then fans out via
    // generate_series. Weights cast ::DOUBLE per the f16 rule.
    "f18_epoch_mix" ->
      """WITH e AS (SELECT doc_id, lang,
        |  CASE lang WHEN 'en' THEN 1.0::DOUBLE WHEN 'de' THEN 2.5::DOUBLE
        |            WHEN 'fr' THEN 0.25::DOUBLE WHEN 'es' THEN 1.75::DOUBLE
        |  END AS ep
        |  FROM documents),
        |c AS (SELECT doc_id, lang,
        |        cast(floor(ep) AS bigint)
        |        + CASE WHEN ('0x' || substr(md5(cast(doc_id AS varchar) || ':ep'), 1, 8))::BIGINT
        |                    % 1000000
        |               < cast(floor((ep - floor(ep)) * 1000000) AS bigint)
        |          THEN 1 ELSE 0 END AS n
        |      FROM e WHERE ep IS NOT NULL)
        |SELECT doc_id, lang, unnest(generate_series(1, n)) AS copy_idx
        |FROM c WHERE n > 0""".stripMargin,

    // f19 replays the Efraimidis-Spirakis priorities exactly: the
    // same md5-derived 53-bit uniform (never 0, so ln is total), the
    // same ln(u)/w operation order, the same (priority DESC, doc_id)
    // tiebreak. Both engines select on FULL precision; the 6-dp
    // round is display-only. Null-text docs: size()+1 is NULL on the
    // Spark side (ANSI size(null) = null) and NULL here — both
    // fail w > 0, dropped on both sides.
    "f19_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, len(${DuckSql.toks}) + 1 AS w
         |           FROM documents),
         |k AS (SELECT doc_id, w::DOUBLE AS weight,
         |        ln(((${DuckSql.hash64md5("'f19:' || doc_id")}
         |             & 9007199254740991) + 1) / 9007199254740992.0)
         |          / w::DOUBLE AS lnkey
         |      FROM t WHERE w > 0)
         |SELECT doc_id, weight, round(lnkey, 6) AS priority
         |FROM k ORDER BY lnkey DESC, doc_id LIMIT 120""".stripMargin,

    // f20 replays the count-min build and probe: ONE md5 per distinct
    // gram, Kirsch–Mitzenmacher positions (h1 + i·h2) mod width with
    // h2 forced odd — the operator's exact scheme. h1/h2 are the
    // digest's unsigned 32-bit words, so every term is non-negative
    // and plain % suffices; the estimate is an integer min over
    // integer counters, so the only remaining care is HUGEINT-free
    // counts (count(*), not sum).
    "f20_cms_counts" ->
      s"""WITH w AS (${DuckSql.wordsCte}),
         |g AS (SELECT doc_id, unnest(${DuckSql.grams(3)}) AS gram FROM w),
         |ks AS (SELECT unnest(generate_series(0, 3)) AS i),
         |hw AS (SELECT gram,
         |         ${DuckSql.hexFold("substr(md5('cms:' || gram), 1, 8)")} AS h1,
         |         (${DuckSql.hexFold("substr(md5('cms:' || gram), 9, 8)")} | 1) AS h2
         |       FROM (SELECT DISTINCT gram FROM g)),
         |cms AS (SELECT i, (h1 + i * h2) % 1024 AS pos, count(*) AS cnt
         |        FROM g JOIN hw USING (gram), ks GROUP BY 1, 2),
         |probe AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
         |pe AS (SELECT gram, i, (h1 + i * h2) % 1024 AS pos
         |       FROM probe JOIN hw USING (gram), ks),
         |est AS (SELECT gram, min(coalesce(cnt, 0)) AS n_est
         |        FROM pe LEFT JOIN cms USING (i, pos) GROUP BY 1),
         |ex AS (SELECT gram, count(*) AS n_exact
         |       FROM g JOIN probe USING (gram) GROUP BY 1)
         |SELECT gram, n_exact, n_est FROM ex JOIN est USING (gram)""".stripMargin,

    // f21 replays the one-digest position+sign scheme; sums cast to
    // BIGINT (DuckDB sum() promotes to HUGEINT, which would reach the
    // driver's comparer as a float). Empty docs cross-join the full
    // position range so they render as zero vectors, like the
    // operator's left join back to the id frame.
    "f21_hash_vectorize" ->
      s"""WITH w AS (${DuckSql.wordsCte}),
         |t AS (SELECT doc_id, unnest(words) AS tok FROM w),
         |h AS (SELECT doc_id,
         |        ${DuckSql.hexFold("substr(md5('htf:' || tok), 1, 8)")} % 64 AS pos,
         |        CASE WHEN ${DuckSql.hexFold("substr(md5('htf:' || tok), 9, 8)")} % 2 = 0
         |             THEN 1 ELSE -1 END AS sgn
         |      FROM t),
         |c AS (SELECT doc_id, pos, cast(sum(sgn) AS BIGINT) AS v,
         |        count(*) AS n
         |      FROM h GROUP BY 1, 2),
         |ks AS (SELECT unnest(generate_series(0, 63)) AS pos),
         |cells AS (SELECT d.doc_id, ks.pos, coalesce(c.v, 0) AS v
         |          FROM (SELECT doc_id FROM documents) d CROSS JOIN ks
         |          LEFT JOIN c ON c.doc_id = d.doc_id AND c.pos = ks.pos),
         |nt AS (SELECT doc_id, cast(sum(n) AS BIGINT) AS n_tokens
         |       FROM c GROUP BY 1)
         |SELECT cells.doc_id,
         |  string_agg(v::VARCHAR, ',' ORDER BY pos) AS vec,
         |  coalesce(any_value(n_tokens), 0) AS n_tokens
         |FROM cells LEFT JOIN nt ON nt.doc_id = cells.doc_id
         |GROUP BY 1""".stripMargin,

    // f22 replays fit and score with the same add-one arithmetic:
    // per-term ln rounded 9 dp, the mean 6 dp (the a27 contract —
    // sum order-dependence is absorbed by the coarser final round);
    // HUGEINT-promoting sums cast back to BIGINT.
    "f22_bigram_nll" ->
      s"""WITH w AS (${DuckSql.wordsCte}),
         |bgall AS (SELECT doc_id, unnest(${DuckSql.grams(2)}) AS bg FROM w),
         |mb AS (SELECT bg, count(*) AS cb FROM bgall
         |       WHERE doc_id % 20 <> 0 GROUP BY 1),
         |ctx AS (SELECT split_part(bg, ' ', 1) AS t1,
         |          cast(sum(cb) AS BIGINT) AS cctx FROM mb GROUP BY 1),
         |vv AS (SELECT count(DISTINCT tok) AS v
         |       FROM (SELECT unnest(words) AS tok FROM w
         |             WHERE doc_id % 20 <> 0)),
         |sc AS (SELECT doc_id, bg FROM bgall WHERE doc_id % 20 = 0),
         |t AS (SELECT doc_id,
         |        round(ln((coalesce(cb, 0) + 1)::DOUBLE
         |          / (coalesce(cctx, 0) + v)::DOUBLE), 9) AS lnp
         |      FROM sc LEFT JOIN mb USING (bg)
         |        LEFT JOIN ctx ON ctx.t1 = split_part(sc.bg, ' ', 1)
         |        CROSS JOIN vv),
         |agg AS (SELECT doc_id, count(*) AS n_bigrams,
         |          round(-sum(lnp) / count(*), 6) AS nll
         |        FROM t GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams, nll
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 = 0) d
         |LEFT JOIN agg USING (doc_id)""".stripMargin,
  )
}
