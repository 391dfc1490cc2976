package graft.operators

import graft.functions.Text
import graft.operators.Checkpoints.Cuttable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: chunking,
  * TF-IDF keyword extraction, benchmark decontamination. Kept separate
  * from [[Dedup]]/[[Similarity]]: these transform or score documents,
  * not identify duplicates. */
object Corpus {

  /** Per-document top-`k` terms by TF-IDF (tf · ln(N/df), whitespace
    * tokens). Output: (id, term, tf, score, rn) ordered by rounded
    * score desc then term asc (a total order — terms are unique per
    * doc — so results are deterministic and cross-engine stable).
    *
    * Scale shape: one shuffle on (doc, term) for tf, one on term for
    * the document-frequency model; the 1-row corpus count BROADCASTS
    * into the scoring join. The df model itself gets NO broadcast
    * hint: vocabulary grows with the corpus (Heaps' law), so it is
    * not dimension-sized at 100 TB — AQE broadcasts it when the
    * runtime size qualifies and falls back to a term-keyed shuffle
    * join when it doesn't (forcing the hint would OOM the driver on
    * a web-scale vocabulary). The per-doc top-k runs through the
    * WindowGroupLimit pushdown on data already partitioned by doc.
    * Nothing holds per-doc state beyond the window's k rows.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("toks"))
    val n = base.agg(count(lit(1)).cast("double").as("n_docs"))
    // tf feeds BOTH the df aggregation and the scoring join — without
    // a cut the corpus-wide tokenize+explode+(id, term) aggregation
    // runs once per branch (Catalyst does not dedupe common subplans;
    // the r14 scan audit caught documents scanned 3x here). The
    // skew-safe alternative forms lose: a count-over-Window by term
    // buffers a hot term's whole partition, and packing (id, tf)
    // lists per term does the same in the aggregation buffer — the
    // checkpoint keeps df a partial-aggregable groupBy.
    val tf = base.select(col("id"), explode(col("toks")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .cut()
    // tf already has one row per (doc, term): df is a plain count.
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"),
        round(col("tf").cast("double") * log(col("n_docs") / col("df_t")), 6)
          .as("score"))
    Relational.topKPerGroup(scored, Seq(col("id")),
      Seq(col("score").desc, col("term").asc), k)
  }

  /** Benchmark decontamination signal: for every document NOT in the
    * benchmark set (`isBench`, evaluated against the CALLER's columns
    * — e.g. `col("doc_id") % 20 === 0`), the count and fraction of
    * its distinct word-`n`-gram shingles that appear anywhere in the
    * benchmark documents. Output: (id, n_shingles, n_hits,
    * contamination); documents with fewer than `n` tokens have no
    * shingles and produce no row.
    *
    * Scale shape: benchmark shingle sets are tiny by construction at
    * any corpus scale (eval suites don't grow with the crawl), so the
    * distinct benchmark side BROADCASTS into one left join over the
    * corpus shingles, followed by one keyed aggregation — the corpus
    * is touched exactly once and nothing is all-pairs.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    n: Int, isBench: Column): DataFrame = {
    // isBench is resolved HERE, against the caller's schema — before
    // any rename — so callers filter on their own column names.
    // Materialized once: the bench and corpus branches below would
    // otherwise each re-scan and re-tokenize the input (Catalyst does
    // not share common subplans) — same rule as Dedup.ngramJaccardPairs.
    // coalesce(…, false): a row where the caller's predicate evaluates
    // to NULL (a null doc_id under the % example) must land in the
    // corpus branch and get its output row — bare null would fail BOTH
    // branch filters and silently drop the document (r12 review).
    val sh = docs
      .select(col(idCol).as("id"),
        coalesce(isBench, lit(false)).as("__bench"),
        Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("__bench"),
        explode(array_distinct(Text.shingles(col("toks"), n))).as("shingle"))
      .cut()
    val bench = sh.filter(col("__bench"))
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1L))
    sh.filter(!col("__bench"))
      .join(broadcast(bench), Seq("shingle"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
           coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .select(col("id"), col("n_shingles"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_shingles"), 6)
          .as("contamination"))
  }

  /** Span-level duplication signal — the n-gram-granular form of
    * exact-substring dedup (the approach popularized by Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022: duplicated SPANS matter even when whole documents
    * aren't near-dups). For every document: the count of its n-gram
    * occurrences (multiplicity kept — a gram repeated inside one doc
    * counts every time) whose gram text appears at least
    * `minOccurrences` times corpus-wide, and the fraction of gram
    * positions so covered. Documents shorter than `n` tokens have no
    * grams and produce no row.
    *
    * Scale shape: one map-side-combinable occurrence count per gram,
    * then a semi-join of the gram stream against the ≥threshold gram
    * set — both shuffles key on the gram (high cardinality; on real
    * text most spans are unique, so the hot set is the small side).
    * Nothing is all-pairs and no suffix structure is materialized:
    * this trades the suffix array's arbitrary-length guarantee for
    * fixed-n detection that runs as two keyed aggregations.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
               n: Int, minOccurrences: Long = 2L): DataFrame = {
    // Materialized once: totals, the hot-gram set and the dup counts
    // all read it (Catalyst does not share common subplans).
    // Materialized once, then consumed in ONE pass: a left join
    // against the hot-gram set with a hit marker feeds a single
    // per-doc aggregation computing totals and dup counts together
    // (same shape as [[contamination]]) — a separate totals agg +
    // outer join would re-scan and re-shuffle the gram stream, the
    // dominant dataset at corpus scale.
    val grams = docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(Text.shingles(col("toks"), n)).as("gram"))
      .cut()
    val hot = grams.groupBy("gram").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOccurrences).select("gram")
      .withColumn("hit", lit(1L))
    spanRatios(grams, hot)
  }

  /** Shared per-doc duplication tail of [[dupSpans]] /
    * [[dupSpansAgainst]] — ONE definition (r12 review: the two tails
    * were byte-identical copies), so the self-contained and serving
    * measurement paths cannot drift: occurrences left-join the hot
    * gram set, per-doc counts, 6-dp ratio. */
  private def spanRatios(grams: DataFrame, hot: DataFrame): DataFrame =
    grams.join(hot, Seq("gram"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
           coalesce(sum(col("hit")), lit(0L)).as("n_dup"))
      .select(col("id"), col("n_grams"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_grams"), 6)
          .as("dup_fraction"))

  /** Gram-count dim — the exact-substring family's persisted serving
    * state: (gram, cnt) occurrence counts over the corpus, one
    * map-side-combinable agg. Persist via
    * [[graft.sinks.ModelStore]] and feed [[dupSpansAgainst]] per
    * ingest cycle; fold a slice in by unioning its own gramCounts
    * and re-aggregating (slice-proportional upkeep). */
  def gramCounts(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(Text.tokens(col(textCol)).as("toks"))
      .select(explode(Text.shingles(col("toks"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /** Shared hot-set derivation of [[dupSpansAgainst]] /
    * [[dupSpanCutAgainst]] — one definition, so the measurement and
    * cut halves cannot disagree on which grams are hot: a slice gram
    * is hot iff corpus count + slice count ≥ `minOccurrences`. The
    * slice gram SET is eagerly checkpointed (§5 broadcast-provability
    * rule: its size is data-dependent, so the cut exposes the true
    * materialized size) — the planner then broadcasts it under the
    * corpus dim's semi-join exactly when genuinely small, and a
    * slice too large to broadcast falls back to the keyed join
    * itself. */
  private def hotGramsAgainst(counts: DataFrame, grams: DataFrame,
                              minOccurrences: Long): DataFrame = {
    val sliceCnt = grams.groupBy("gram").agg(count(lit(1)).as("s_cnt"))
    val sliceGrams = grams.select("gram").distinct().cut()
    val dimCnt = counts.select(col("gram"), col("cnt"))
      .join(sliceGrams, Seq("gram"), "left_semi")
    sliceCnt.join(dimCnt, Seq("gram"), "left")
      .filter(col("s_cnt") + coalesce(col("cnt"), lit(0L)) >= minOccurrences)
      .select("gram")
  }

  /** [[dupSpans]] for an INCOMING slice against a persisted
    * [[gramCounts]] dim — the exact-substring family's
    * slice-proportional serving form (d11/d16/e11/b4's sibling): a
    * slice occurrence is duplicated iff corpus count + slice count
    * of its gram reaches `minOccurrences`, which is EXACTLY a full
    * [[dupSpans]] over corpus ∪ slice restricted to the slice's
    * docs (the registered d17 proves it through d10's own replay).
    * Nothing re-aggregates the corpus: the slice gram stream builds
    * once, slice-internal counts are a slice-keyed agg, and the
    * corpus dim is STREAMED against the eagerly-checkpointed slice
    * gram set (left semi, broadcast when the slice is genuinely
    * small — see [[hotGramsAgainst]]) before the count join. */
  def dupSpansAgainst(counts: DataFrame, incoming: DataFrame,
                      idCol: String, textCol: String, n: Int,
                      minOccurrences: Long = 2L): DataFrame = {
    val grams = incoming
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(Text.shingles(col("toks"), n)).as("gram"))
      .cut()
    val hot = hotGramsAgainst(counts, grams, minOccurrences)
      .withColumn("hit", lit(1L))
    spanRatios(grams, hot)
  }

  /** The composed C4/Gopher-style quality GATE: per document, the
    * keep/drop decision plus the reject reasons that made it — token
    * count in [minTokens, maxTokens], mean word length in [3, 8],
    * duplicate-token fraction ≤ maxDupFrac, top-bigram fraction ≤
    * maxTopBigramFrac. Output: (id, n_tokens, mean_word_len,
    * dup_token_frac, top2gram_frac, reasons csv, keep).
    *
    * ZERO-shuffle by construction: every signal — including the
    * top-bigram count, via a max-identical-run scan over the SORTED
    * bigram array — computes per row in one narrow projection. At
    * 100 TB the gate therefore runs as a pure map BEFORE any
    * pairing/shuffle stage sees the dropped rows (the p2 stage-order
    * rule); threshold comparisons are exact integer-ratio doubles,
    * so independent engines agree on every decision bit.
    */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
                  minTokens: Long = 25L, maxTokens: Long = 5000L,
                  maxDupFrac: Double = 0.6,
                  maxTopBigramFrac: Double = 0.05): DataFrame = {
    // Max identical-run length over a sorted array = max duplicate
    // count, without a (doc, gram) shuffle. State is (prev, run,
    // best); empty arrays finish at best = 0.
    def maxRun(arr: Column): Column =
      aggregate(sort_array(arr),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"),
            acc.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
    // Null text gates like empty text (n = 0 → too_short) instead of
    // leaking size(null) = -1 as a token count; the f13 oracle applies
    // the same coalesce.
    val sig = docs
      .select(col(idCol).as("id"),
        Text.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .select(col("id"), col("toks"),
        size(col("toks")).cast("long").as("n"),
        Text.shingles(col("toks"), 2).as("g2"))
      .select(col("id"), col("n"),
        when(col("n") === 0, lit(0.0))
          .otherwise(aggregate(col("toks"), lit(0L),
            (a, x) => a + length(x)).cast("double") / col("n"))
          .as("mwl"),
        when(col("n") === 0, lit(0.0))
          .otherwise(lit(1.0) -
            size(array_distinct(col("toks"))).cast("double") / col("n"))
          .as("dupf"),
        when(size(col("g2")) === 0, lit(0.0))
          .otherwise(maxRun(col("g2")).cast("double") / size(col("g2")))
          .as("topgf"))
    val tooShort = col("n") < minTokens
    val tooLong = col("n") > maxTokens
    val wordLen = col("mwl") < 3.0 || col("mwl") > 8.0
    val dupToks = col("dupf") > maxDupFrac
    val repet = col("topgf") > maxTopBigramFrac
    sig.select(col("id"), col("n").as("n_tokens"),
      round(col("mwl"), 6).as("mean_word_len"),
      round(col("dupf"), 6).as("dup_token_frac"),
      round(col("topgf"), 6).as("top2gram_frac"),
      concat_ws(",",
        when(tooShort, "too_short"), when(tooLong, "too_long"),
        when(wordLen, "word_len"), when(dupToks, "dup_tokens"),
        when(repet, "repetitive")).as("reasons"),
      (!tooShort && !tooLong && !wordLen && !dupToks && !repet).as("keep"))
  }

  /** Sequence packing for training batches: lay chunks end-to-end in
    * `orderCols` order within each `partitionCols` group and assign
    * each chunk to the fixed-token-budget output sequence its FIRST
    * token lands in (`seq_id = floor(start_offset / budget)`) — the
    * streaming "fill until the budget, move on" pack that minimizes
    * padding when examples are concatenated into training sequences.
    * A chunk may straddle a boundary; the accounting convention is
    * start-offset ownership (exact splitting is a tokenizer-side
    * concern). Returns the input plus (seq_offset, seq_id).
    *
    * One window cumsum per partition group. Packing is inherently
    * sequential WITHIN a group, so the parallelism unit is the group
    * count — at corpus scale callers MUST pass a partition key of
    * output-shard granularity (a hash-salted shard id, a
    * source × shard pair), never a handful of global keys.
    */
  def packSequences(chunks: DataFrame, partitionCols: Seq[Column],
                    orderCols: Seq[Column], tokenCol: Column,
                    budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      // EXPLICIT exclusive-prefix ROWS frame (r12 review): the default
      // frame is RANGE-to-current-row, which hands every orderCols TIE
      // the same INCLUSIVE sum — two tied 10-token chunks would both
      // read seq_offset 10 and overlap in one sequence while another
      // stays empty. Under ROWS, ties pack correctly at
      // engine-chosen relative order; pass a total order for a
      // deterministic layout (the registered f12 does).
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    chunks
      .withColumn("seq_offset", coalesce(sum(tokenCol).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"seq_offset DIV $budget"))
  }

  /** Overlapping token-window chunks: each document's token array is
    * cut into windows of `size` tokens starting every `stride` tokens
    * (stride < size ⇒ overlap of size − stride). Output: (id,
    * chunk_idx, chunk_tokens, chunk array<string>) — one row per
    * window, chunk_idx dense from 0. Empty/whitespace-only documents
    * produce no rows. Purely narrow (stage tokens → explode starts →
    * slice): zero shuffles, the fan-out is ~n/stride per doc and
    * happens after column pruning.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1, s"size/stride must be >= 1, got $size/$stride")
    docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"),
        org.apache.spark.sql.functions.size(col("toks")).as("n"))
      .filter(col("n") > 0)
      // sequence(0, n-1, stride) = every chunk start < n.
      .select(col("id"), col("toks"),
        posexplode(sequence(lit(0), col("n") - 1, lit(stride))))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        slice(col("toks"), col("col") + 1, lit(size)).as("chunk"))
      .select(col("id"), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("chunk")).cast("long")
          .as("chunk_tokens"),
        col("chunk"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., LREC'20): score
    * every document by its mean negative log-likelihood under a
    * unigram model fit on the corpus itself, then split the corpus
    * into head / middle / tail terciles — the standard
    * quality-stratification step before mixing training data.
    * Output: (id, n_tokens, nll, bucket); documents with zero tokens
    * produce no row (no likelihood is defined for them).
    *
    * Scale shape: the model is one token-keyed count agg (map-side
    * combinable); like [[tfidfTopTerms]]'s df model it gets NO
    * broadcast hint — vocabulary grows with the corpus (Heaps' law),
    * so AQE broadcasts it only when the runtime size qualifies. The
    * tercile cut deliberately avoids a global `ntile` window (a
    * single-partition sort of the whole corpus — the canonical
    * 100 TB anti-pattern): the two thresholds come from one exact
    * interpolated-percentile aggregate (the approx_percentile drift
    * bound spec'd for f7 applies equally as the sketch form here),
    * broadcast as a 1-row dimension, and bucketing is then a narrow
    * comparison.
    *
    * Cross-engine exactness: per-token ln(count/total) rounds to 9 dp
    * before the per-doc sum (the a27 contract — the sum of 9-dp
    * multiples is order-independent far below the final 6-dp round),
    * and the thresholds interpolate over those already-rounded nll
    * values, so DuckDB replays every bit.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    perplexityBucketsWith(unigramFit(docs, idCol, textCol),
      docs, idCol, textCol)

  /** The unigram language model [[perplexityBuckets]] fits inline —
    * (tok, cnt) counts over the model corpus — exposed so a serving
    * pipeline can FIT ONCE, persist via
    * [[graft.sinks.ModelStore]], and score every later slice against
    * the same frozen model (the f15 registered query is the
    * model-corpus == score-corpus special case). Purely declarative:
    * no driver action at fit time; the total derives from the model
    * at score time with one model-sized aggregate. */
  def unigramFit(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** [[perplexityBuckets]] against a SUPPLIED unigram model
    * ([[unigramFit]]'s (tok, cnt) shape, fresh or reloaded) — the
    * serving form: tokens absent from the model are dropped from
    * scoring (n_tokens counts MODELED occurrences only), but every
    * input doc keeps its output row — a doc with NO modeled tokens
    * (new language, new domain) surfaces as (n_tokens 0, nll NULL,
    * bucket NULL) rather than silently vanishing and shifting the
    * terciles, which interpolate over the scoreable docs only. With
    * model = score corpus (f15) nothing is ever absent and this is
    * value-identical to the inline op — spec-pinned.
    *
    * CONTRACT: `idCol` must be unique per row — the per-doc output
    * contract ("one row per input doc") rests on it. The scored frame
    * left-joins back onto the doc-id projection, so duplicate ids
    * would each emit a row carrying the SAME merged score (their
    * token multisets aggregate under one id upstream) — deduplicate
    * ids first if the input can repeat them. (f15's doc_id is
    * unique; a distinct() here would tax every caller with a shuffle
    * to protect against a malformed input.) */
  def perplexityBucketsWith(model: DataFrame, docs: DataFrame,
                            idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(col("toks")).as("tok"))
    val freq = model.select(col("tok"), col("cnt"))
    val total = freq.agg(sum(col("cnt")).cast("double").as("total"))
    // cut(): the scored frame feeds BOTH the percentile aggregate and
    // the final projection — without the lineage cut the whole
    // toks→model-join→per-doc agg subtree evaluates twice per action
    // (ReuseExchange dedups the shuffles but not the post-shuffle
    // aggregation). Same reused-branch idiom as ngramJaccardAgainst.
    val scored = toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(round(log(col("cnt").cast("double") / col("total")), 9))
            / count(lit(1)), 6).as("nll"))
      .cut()
    // 1D/3 and 2D/3 are the exact IEEE doubles DuckDB's 1.0/3 and
    // 2.0/3 evaluate to, so both engines interpolate at identical
    // positions.
    val cuts = scored.agg(
      expr("percentile(nll, 1D/3)").as("t1"),
      expr("percentile(nll, 2D/3)").as("t2"))
    // LEFT join back onto the doc ids so all-out-of-vocabulary docs
    // keep a row (NULL nll/bucket) instead of disappearing through
    // the inner model join — with model = corpus (f15) this matches
    // every row and changes nothing.
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .crossJoin(broadcast(cuts))
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("nll"),
        when(col("nll").isNull, lit(null).cast("string"))
          .when(col("nll") <= col("t1"), lit("head"))
          .when(col("nll") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** The TRANSFORMATION half of [[dupSpans]]: remove from every
    * document the tokens covered by any n-gram occurring ≥
    * `minOccurrences` times corpus-wide (the fixed-n form of
    * exact-substring dedup's CUT step, Lee et al. ACL'22 — dupSpans
    * measures the duplication, this excises it). A token survives iff
    * NO duplicated n-gram occurrence covers its position. Output:
    * (id, n_tokens, n_kept, kept_hash) — the md5 of the space-joined
    * surviving tokens, so downstream compare stays compact while
    * pinning the exact cleaned text.
    *
    * Scale shape: same two gram-keyed aggregations as dupSpans (the
    * gram stream checkpoints once and feeds both), then the covered
    * positions collapse to ONE per-doc sorted array (bounded by
    * document length) and the cut itself is a narrow indexed-filter
    * projection — no suffix structure, nothing all-pairs. The
    * in-lambda membership probe is O(|toks|·|covered|) per document
    * (document-bounded, never corpus-bounded); real corpora with long
    * documents would bump n (50-gram spans), which SHRINKS the
    * covered-array fan-out per hit.
    */
  def dupSpanCut(docs: DataFrame, idCol: String, textCol: String,
                 n: Int, minOccurrences: Long = 2L): DataFrame = {
    // null text = empty document (size(null) is -1 under non-ANSI —
    // the f13 null-gating rule applies to every per-doc emitter).
    val toks = docs
      .select(col(idCol).as("id"),
        Text.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .cut()
    // (id, pos, gram) with 0-based pos; gram covers [pos, pos+n-1].
    val grams = toks
      .select(col("id"),
        posexplode(Text.shingles(col("toks"), n)).as(Seq("pos", "gram")))
      .cut()
    val hot = grams.groupBy("gram").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOccurrences).select(col("gram"))
    spanCutFromHot(toks, grams, hot, n)
  }

  /** Shared cut body of [[dupSpanCut]]/[[dupSpanCutAgainst]] — one
    * definition, so the full and incremental paths cannot drift:
    * hot-gram occurrences collapse to one per-doc sorted covered
    * array, the cut is a narrow indexed filter. */
  private def spanCutFromHot(toks: DataFrame, grams: DataFrame,
                             hot: DataFrame, n: Int): DataFrame = {
    val covered = grams.join(hot, Seq("gram"))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tokpos"))
      .groupBy("id")
      .agg(sort_array(collect_set(col("tokpos"))).as("covered"))
    val kept = toks.join(covered, Seq("id"), "left")
      .select(col("id"), col("toks"),
        when(col("covered").isNull, col("toks"))
          .otherwise(filter(col("toks"),
            (_, i) => !array_contains(col("covered"), i))).as("kept"))
    kept.select(col("id"),
      size(col("toks")).cast("long").as("n_tokens"),
      size(col("kept")).cast("long").as("n_kept"),
      md5(concat_ws(" ", col("kept")).cast("binary")).as("kept_hash"))
  }

  /** [[dupSpanCut]] for an INCOMING slice against a persisted
    * [[gramCounts]] dim — the CUT half of d17's measurement, same
    * equivalence: the slice's hot grams are those whose corpus count
    * + slice count reaches `minOccurrences`, so the cleaned slice is
    * byte-identical (kept_hash and all) to a full [[dupSpanCut]]
    * over corpus ∪ slice restricted to the slice's docs (d12's own
    * replay proves it as the registered d18). Same dim discipline as
    * [[dupSpansAgainst]]: the corpus dim is streamed against the
    * broadcast slice gram set, never shuffled. */
  def dupSpanCutAgainst(counts: DataFrame, incoming: DataFrame,
                        idCol: String, textCol: String, n: Int,
                        minOccurrences: Long = 2L): DataFrame = {
    val toks = incoming
      .select(col(idCol).as("id"),
        Text.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .cut()
    val grams = toks
      .select(col("id"),
        posexplode(Text.shingles(col("toks"), n)).as(Seq("pos", "gram")))
      .cut()
    spanCutFromHot(toks, grams,
      hotGramsAgainst(counts, grams.select("id", "gram"), minOccurrences), n)
  }

  /** The EXTRACTION half of the exact-substring family: the maximal
    * duplicated REGIONS of length ≥ `minLen` tokens, one row per
    * region — (id, span_start 0-based, span_len, span_hash).
    * [[dupSpans]] measures duplication and [[dupSpanCut]] excises it;
    * this names the regions, the diagnostic a pipeline inspects
    * before choosing a cut (and the general-length answer to "which
    * positions sit in duplicated text ≥ L" — not fixed-n: a 200-token
    * duplicated region surfaces as ONE row of span_len 200).
    *
    * A region is the union of OVERLAPPING duplicated substrings —
    * every position in it lies inside some corpus-duplicated
    * substring of length ≥ L, but the region's FULL text need not
    * recur verbatim anywhere (its halves may duplicate against
    * different partners). `span_hash` therefore fingerprints the
    * region's text for inspection and within-corpus grouping of
    * identically-repeated regions; equal full-region recurrence is
    * not the contract, coverage is.
    *
    * Correctness rests on the Lee et al. ACL'22 reduction: a position
    * lies inside some corpus-duplicated substring of length ≥ L iff it
    * is covered by a duplicated L-gram (a duplicated longer substring
    * duplicates every L-window inside it; a duplicated L-gram IS such
    * a substring). So the covered-position set from the fixed-n
    * machinery at n = L is EXACTLY the general-length coverage, and
    * maximal duplicated regions are the maximal runs of that set —
    * pinned by the brute-force all-substring enumeration in
    * BudgetMixCutSpec.
    *
    * Scale shape: the two gram-keyed aggregations of [[dupSpanCut]]
    * (nothing all-pairs, no suffix structure), then runs come from the
    * per-doc SORTED covered array by two indexed filters (a position
    * starts a run iff it has no predecessor, ends one iff no
    * successor) — document-bounded narrow lambdas, zero extra
    * shuffles beyond the covered-set aggregation itself.
    */
  def dupSpanExtract(docs: DataFrame, idCol: String, textCol: String,
                     minLen: Int, minOccurrences: Long = 2L): DataFrame = {
    val n = minLen
    val toks = docs
      .select(col(idCol).as("id"),
        Text.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .cut()
    val grams = toks
      .select(col("id"),
        posexplode(Text.shingles(col("toks"), n)).as(Seq("pos", "gram")))
      .cut()
    val hot = grams.groupBy("gram").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOccurrences).select(col("gram"))
    val covered = grams.join(hot, Seq("gram"))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tokpos"))
      .groupBy("id")
      .agg(sort_array(collect_set(col("tokpos"))).as("covered"))
    // Run boundaries from the sorted array. element_at is 1-based and
    // the lambda index 0-based, so element_at(covered, i) is the
    // PREVIOUS element and element_at(covered, i+2) the NEXT; the
    // `when` guards keep the out-of-range probes unevaluated (ANSI).
    val runs = covered.join(toks, Seq("id"))
      .select(col("id"), col("toks"),
        filter(col("covered"), (x, i) =>
          when(i === 0, lit(true))
            .otherwise(element_at(col("covered"), i) =!= x - 1)).as("starts"),
        filter(col("covered"), (x, i) =>
          when(i === size(col("covered")) - 1, lit(true))
            .otherwise(element_at(col("covered"), i + 2) =!= x + 1)).as("ends"))
    runs
      .select(col("id"), col("toks"),
        explode(arrays_zip(col("starts"), col("ends"))).as("span"))
      .select(col("id"),
        col("span.starts").cast("long").as("span_start"),
        (col("span.ends") - col("span.starts") + 1).cast("long")
          .as("span_len"),
        md5(concat_ws(" ",
          slice(col("toks"), col("span.starts") + 1,
            col("span.ends") - col("span.starts") + 1)).cast("binary"))
          .as("span_hash"))
  }

  /** Token-budget corpus selection: keep the highest-quality documents
    * until a token budget fills — the "best N tokens" cut every
    * fixed-compute training run makes (quality here = distinct-token
    * ratio, the inverse of f10's duplicate-token fraction; any
    * per-document score plugs in). Selection order is (quality bucket
    * DESC, shard ASC, id ASC) — `shard` is a deterministic md5-derived
    * value in [0, buckets^refineLevels), engine-replayable — and a
    * document is kept iff the tokens BEFORE it in that order are
    * < `budgetTokens` (greedy prefix — the last kept document may
    * overshoot). Within a quality bucket the order is an arbitrary
    * deterministic tiebreak either way; hashing it is what makes the
    * scale bound below hold even when quality values tie. Empty
    * documents are dropped (zero-token rows cannot spend budget and
    * would make the strict-< law ambiguous).
    *
    * Scale shape — the point of the bucketed design: a global
    * score-ordered cumulative window would sort the corpus into ONE
    * partition (the canonical 100 TB anti-pattern). Instead quality
    * quantizes to `buckets` integer levels; per-bucket token sums are
    * one map-side-combinable aggregation (|buckets| rows out), the
    * cumulative cut over THAT table is |buckets|-row cheap, and bucket
    * verdicts broadcast back: full-keep buckets pass as a narrow
    * filter, and only the single BOUNDARY bucket straddling the budget
    * continues. That bucket (~N/buckets rows) is then refined
    * `refineLevels` more times by successive base-`buckets` digits of
    * the shard — each level the same ≤|buckets|-row aggregate →
    * broadcast-verdict shape, shrinking the straddling cell by another
    * 1/buckets (uniformly, because the digits are hash digits — no
    * quality-tie degeneracy) — so the one in-cell cumulative window at
    * the end sees ~N/buckets^(refineLevels+1) rows in expectation,
    * never the corpus. Sizing rule for a target per-task row bound T:
    * refineLevels ≈ ceil(log_buckets(N / T)) − 1; the default (100, 2)
    * puts a 10^12-document corpus at ~10^6 window rows.
    *
    * Construction is EAGER: the corpus scoring pass, the per-level
    * verdict tables, and the boundary set are `cut()` (checkpointed)
    * while this method builds the plan, because the verdict joins are
    * data-dependent dims whose broadcastability neither static
    * planning nor AQE can prove from an agg subtree (SURVEY §5,
    * broadcast-provability rule). Calling this to merely inspect a
    * plan runs those jobs.
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, textCol: String,
                        budgetTokens: Long, buckets: Int = 100,
                        refineLevels: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets > 1 && refineLevels >= 0, "buckets > 1, refineLevels >= 0")
    require(math.pow(buckets.toDouble, refineLevels.toDouble) < 1e15,
      "buckets^refineLevels must stay well inside long/double precision")
    val shardMod = (0 until refineLevels)
      .foldLeft(1L)((m, _) => m * buckets)
    // floor(nd / nt * buckets) — identical fixed-order double math in
    // the DuckDB oracle, so bucket edges agree bit-for-bit. The shard
    // is hash64md5("tb:" ++ id) mod buckets^refineLevels — md5 family,
    // so the full selection order replays outside the JVM.
    val scored = docs
      .select(col(idCol).as("id"),
        Text.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .select(col("id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .filter(col("n_tokens") > 0)
      .select(col("id"), col("n_tokens"),
        floor(col("n_distinct").cast("double") / col("n_tokens") * buckets)
          .cast("long").as("bucket"),
        pmod(Text.hash64md5(concat(lit("tb:"), col("id").cast("string"))),
          lit(shardMod)).as("shard"))
      .cut()
    // |buckets|-row frame: the unpartitioned window is bounded by the
    // bucket count, not the corpus. cut(): BOTH union branches consume
    // the verdicts — without the cut each branch would re-run the
    // corpus-wide bucket aggregation (Catalyst does not share common
    // subplans across a union).
    val bcum = scored.groupBy("bucket").agg(sum(col("n_tokens")).as("btoks"))
      .withColumn("before",
        coalesce(sum(col("btoks")).over(
          Window.orderBy(col("bucket").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .cut()
    val joined = scored.join(broadcast(bcum), Seq("bucket"))
    // n_tokens ≥ 1 on every row, so before + btoks ≤ budget implies
    // every document's own prefix is strictly under budget.
    val keeps = scala.collection.mutable.ArrayBuffer[DataFrame](
      joined.filter(col("before") + col("btoks") <= budgetTokens)
        .select(col("id"), col("bucket"), col("n_tokens")))
    // ≤ one bucket straddles the budget. cut(): every refinement level
    // and the final window read this ~N/buckets set, not the corpus.
    var boundary = joined
      .filter(col("before") < budgetTokens &&
        col("before") + col("btoks") > budgetTokens)
      .select(col("id"), col("bucket"), col("n_tokens"), col("shard"),
        col("before"))
      .cut()
    var digitWeight = shardMod
    for (_ <- 0 until refineLevels) {
      digitWeight /= buckets
      // Integer floor-division (`div`), not `/`: double division of
      // long operands can round k−1/w up to k near the digit edges.
      val dig = expr(s"shard div $digitWeight") % buckets
      val cell = boundary.groupBy(dig.as("d"))
        .agg(sum(col("n_tokens")).as("dtoks"))
        .withColumn("dbefore",
          coalesce(sum(col("dtoks")).over(
            Window.orderBy(col("d").asc)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .cut()
      val j = boundary.join(broadcast(cell), dig === cell("d"))
      keeps += j
        .filter(col("before") + col("dbefore") + col("dtoks") <= budgetTokens)
        .select(col("id"), col("bucket"), col("n_tokens"))
      boundary = j
        .filter(col("before") + col("dbefore") < budgetTokens &&
          col("before") + col("dbefore") + col("dtoks") > budgetTokens)
        .select(col("id"), col("bucket"), col("n_tokens"), col("shard"),
          (col("before") + col("dbefore")).as("before"))
    }
    // The surviving straddling cell — N/buckets^(refineLevels+1) rows
    // in expectation — pays the one in-cell cumulative window; shard
    // is fully fixed inside it, so the residual order is id ASC.
    keeps += boundary
      .withColumn("inb",
        coalesce(sum(col("n_tokens")).over(
          Window.partitionBy(col("bucket")).orderBy(col("id").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("before") + col("inb") < budgetTokens)
      .select(col("id"), col("bucket"), col("n_tokens"))
    keeps.reduce(_ unionByName _)
  }

  /** Bigram language-model scoring with add-one smoothing: fit
    * P(t2|t1) = (c(t1 t2) + 1) / (c(t1 ·) + V) on `modelDocs`, score
    * each `scoreDocs` document's mean negative log-likelihood over
    * its bigrams — the held-out LM-quality signal next to f15's
    * self-scored unigram nll (CCNet's filter model in miniature; the
    * two-frame signature is what makes the smoothing REAL — unseen
    * bigrams actually occur). Context counts c(t1 ·) come from the
    * bigram model itself (t1's non-final occurrences), V is the
    * model's distinct-token count.
    *
    * Scale shape: the bigram model is one gram-keyed map-side-
    * combinable count; context counts reduce the MODEL (not the
    * corpus) a second time; V and the model totals are 1-row dims.
    * Scoring joins the held-out bigram stream against model and
    * context frames on their gram keys — NO broadcast hint on either
    * (vocabulary and bigram vocabulary grow with the corpus — f8's
    * df-model doctrine; AQE broadcasts when the runtime size
    * qualifies). Per-term ln rounds to 9 dp before the sum (a27's
    * determinism contract), the mean to 6 dp. Docs with < 2 tokens
    * survive with n_bigrams = 0 and NULL nll. Output: (id,
    * n_bigrams, nll). */
  private def docBigrams(df: DataFrame, idCol: String,
                         textCol: String): DataFrame = df
    .select(col(idCol).as("id"),
      explode(Text.shingles(Text.tokens(col(textCol)), 2)).as("bg"))

  def bigramNll(modelDocs: DataFrame, scoreDocs: DataFrame,
                idCol: String, textCol: String): DataFrame = {
    // The model frame has two consumers inside bigramScore (the
    // context-count agg and the scoring join); its upstream here is
    // the corpus-wide bigram aggregation, which would otherwise run
    // once per branch (the r14 scan audit caught documents scanned 5x
    // in f22). The cut is model-sized — bigram vocabulary, sublinear
    // in the corpus — and lives HERE, on the inline-fit path only:
    // bigramNllWith's reloaded model is a cheap pruned parquet
    // re-scan that a cut would only tax with a barrier.
    val model = docBigrams(modelDocs, idCol, textCol)
      .groupBy("bg").agg(count(lit(1)).as("cb"))
      .cut()
    val vocab = modelDocs
      .select(explode(Text.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    bigramScore(model, vocab, scoreDocs, idCol, textCol)
  }

  /** The bigram language model [[bigramNll]] fits inline — (bg, cb)
    * counts — exposed for the fit-once / persist / score-daily
    * lifecycle ([[graft.sinks.ModelStore]]). The smoothing
    * denominator needs |vocab| of the MODEL corpus, which bigram
    * counts alone cannot reproduce (a corpus-final or single-token
    * word reaches the vocabulary without reaching any bigram), so V
    * is STAMPED into the schema metadata of every column — the PQ
    * geometry-stamp pattern, and like [[Similarity.ivfPqFit]] this
    * runs Spark jobs at FIT time (one countDistinct action; model
    * fitting, not plan construction). [[bigramNllWith]] refuses a
    * model without the stamp rather than guessing V. */
  def bigramFit(modelDocs: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val model = docBigrams(modelDocs, idCol, textCol)
      .groupBy("bg").agg(count(lit(1)).as("cb"))
    val v = modelDocs
      .select(explode(Text.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("lm.vocab", v).build()
    model.select(model.columns.toIndexedSeq.map(c => col(c).as(c, meta)): _*)
  }

  /** [[bigramNll]] against a SUPPLIED [[bigramFit]] model (fresh or
    * reloaded): context counts re-derive from the model frame (a
    * model-sized agg), V comes from the vocab stamp. Byte-identical
    * to the inline op on the same corpora — spec-pinned across a
    * ModelStore round-trip. */
  def bigramNllWith(model: DataFrame, scoreDocs: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    val md = model.schema.fields.map(_.metadata).find(_.contains("lm.vocab"))
    require(md.nonEmpty,
      "bigramNllWith: model carries no lm.vocab stamp — fit it with " +
        "bigramFit (bigram counts alone cannot reproduce |vocab|)")
    val vocab = scoreDocs.sparkSession.range(1)
      .select(lit(md.get.getLong("lm.vocab")).as("v"))
    bigramScore(model.select(col("bg"), col("cb")), vocab,
      scoreDocs, idCol, textCol)
  }

  /** Shared scoring body of [[bigramNll]]/[[bigramNllWith]] — one
    * definition, so the inline query and the persisted-model path
    * cannot drift. `vocab` is a 1-row (v) frame. */
  private def bigramScore(model: DataFrame, vocab: DataFrame,
                          scoreDocs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    // model's two consumers here (ctx + the join) re-scan a frame the
    // callers guarantee cheap: bigramNll cuts its inline fit, and
    // bigramNllWith passes a reloaded parquet model (pruned re-scan).
    val ctx = model
      .groupBy(substring_index(col("bg"), " ", 1).as("t1"))
      .agg(sum(col("cb")).as("cctx"))
    val scored = docBigrams(scoreDocs, idCol, textCol)
      .join(model, Seq("bg"), "left")
      .join(ctx, substring_index(col("bg"), " ", 1) === col("t1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        round(log((coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("cctx"), lit(0L)) + col("v")).cast("double")), 9)
          .as("lnp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
           round(-sum(col("lnp")) / count(lit(1)), 6).as("nll"))
    scoreDocs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("nll"))
  }

  /** Feature-hashing vectorizer (Weinberger et al., ICML'09; the
    * HashingTF shape): each document's tokens become a FIXED `dim`-
    * wide integer vector with no vocabulary pass — position = md5
    * word mod dim, value = signed count (the sign hash makes the
    * implicit inner product unbiased, the property that lets hashed
    * vectors feed similarity search directly). The no-vocab property
    * is the 100 TB point: a CountVectorizer needs a corpus-wide
    * vocabulary model that grows with the data (Heaps' law); this
    * needs none, so the whole vectorization is two map-side-
    * combinable aggregations keyed on the document — (id, pos)
    * signed sums, then the ≤ `dim`-entry per-doc map assembled into
    * a dense array in one narrow projection. Documents with no
    * tokens (null/empty text) surface as zero vectors, not dropped
    * rows. Position and sign come from ONE digest's two 32-bit words
    * ("htf:" ++ token — md5 family, so vectors replay bit-for-bit in
    * any engine). Output: (id, vec array<long> of length dim,
    * n_tokens). */
  def hashVectorize(docs: DataFrame, idCol: String, textCol: String,
                    dim: Int = 64): DataFrame = {
    require(dim >= 2 && dim <= (1 << 20),
      s"hashVectorize: dim must be in [2, 2^20], got $dim")
    val ids = docs.select(col(idCol).as("id"))
    val cells = docs
      .select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("tok"))
      .withColumn("__hx", md5(concat(lit("htf:"), col("tok")).cast("binary")))
      .select(col("id"),
        pmod(conv(substring(col("__hx"), 1, 8), 16, 10).cast("long"),
          lit(dim.toLong)).cast("int").as("pos"),
        when(conv(substring(col("__hx"), 9, 8), 16, 10).cast("long")
          .bitwiseAND(lit(1L)) === 0L, lit(1L)).otherwise(lit(-1L)).as("sgn"))
      .groupBy("id", "pos")
      .agg(sum(col("sgn")).as("v"), count(lit(1)).as("n"))
    val vecs = cells.groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("pos"), col("v")))).as("__m"),
           sum(col("n")).as("n_tokens"))
      .select(col("id"),
        // try_element_at: almost every doc fills fewer than `dim`
        // positions, and plain element_at throws
        // MAP_KEY_DOES_NOT_EXIST under ANSI mode for each missing
        // one — the coalesce would never see its null (r12 review;
        // the file's ANSI-totality convention).
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(try_element_at(col("__m"), i.cast("int")), lit(0L)))
          .as("vec"),
        col("n_tokens"))
    ids.join(vecs, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("vec"),
          array_repeat(lit(0L), dim)).as("vec"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
