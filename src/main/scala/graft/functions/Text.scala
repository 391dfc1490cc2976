package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text building blocks. Everything here is built from
  * `org.apache.spark.sql.functions` (higher-order functions included)
  * so it stays inside whole-stage codegen — no UDFs in any hot path.
  */
object Text {

  /** Unicode NFC normalization (canonical composition) — native
    * codegen expression, see [[graft.functions.expr.NfcNormalize]].
    * Run it BEFORE tokenizing/hashing: composed and decomposed forms
    * of the same text otherwise hash apart. */
  def nfc(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expr.NfcNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Engine-portable 64-bit hash: the first 8 bytes of md5(utf8(s)),
    * big-endian, as a signed long — assembled from the two 32-bit hex
    * halves so no intermediate overflows even at the int64 boundaries.
    * xxhash64 would be faster, but nothing outside the JVM computes
    * Spark's seeded variant; md5 is bit-identical in every engine
    * (DuckDB replays this exact construction in the d3/d4 oracles),
    * which is what makes the sketch family EXACTLY verifiable rather
    * than rows-only. Use it wherever a hash value is part of an
    * operator's observable output; keep xxhash64 for purely internal
    * partitioning (salts, probes) where no oracle ever sees the value.
    */
  def hash64md5(c: Column): Column = {
    val h = md5(c.cast("binary"))
    val hi = conv(substring(h, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(h, 9, 8), 16, 10).cast("long")
    (when(hi >= 2147483648L, hi - 4294967296L).otherwise(hi)) * 4294967296L + lo
  }

  /** Whitespace tokens, empties dropped. `array_remove`, not a
    * `filter` lambda: higher-order functions are CodegenFallback
    * (interpreted, per-element lambda eval), and this call opens
    * every tokenize-shingle-hash pipeline in the repo — the r12
    * review caught the old HOF form contradicting this file's
    * stays-inside-codegen contract. Identical output: split never
    * yields nulls, so removing `""` IS dropping empties, order
    * preserved (DuckSql.toks replays the same semantics).
    *
    * The whitespace class is EXPLICIT, not `\s` (r13 review): the
    * engine and its oracle run different regex dialects, and Java's
    * `\s` includes VERTICAL TAB (\x0B) where DuckDB's RE2 `\s` does
    * not — measured live: `"a\x0Bb"` tokenizes to [a, b] on the JVM
    * and to one token in DuckDB, so every token-derived query would
    * diverge on real web text (VT occurs in crawled pages) while the
    * VT-free testdata keeps the gate green. The class below IS
    * Java's `\s` ([ \t\n\x0B\f\r]) spelled out, so engine behavior
    * and hashes are unchanged; the oracle side pins the same class. */
  val wsClass = " \\t\\n\\x0B\\f\\r"

  def tokens(text: Column): Column =
    array_remove(split(text, s"[$wsClass]+"), "")

  /** Word n-gram shingles from a PRE-TOKENIZED array column; empty
    * array when the document has fewer than n words (or the array is
    * null). (Reference analogue: the document fingerprints behind
    * related-collection search — collection-templates
    * research/related-collections.)
    *
    * Native codegen expression ([[graft.functions.expr.WordShingles]])
    * since round 4: the earlier higher-order-function formulation ran
    * interpreted and re-evaluated any expression captured in the
    * lambda PER ELEMENT (the §4 staging trap). The native form
    * evaluates its child once per ROW, so shingling no longer
    * requires pre-staging the token column — though staging remains
    * the rule for the remaining HOF consumers of `toks`.
    */
  def shingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expr.WordShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(toks), n))

  /** The pre-round-4 higher-order-function formulation — kept ONLY as
    * the independent reference the WordShingles parity spec checks
    * against. Interpreted; do not use in operators. */
  private[graft] def shinglesHof(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** One-shot tokenizer + shingler. */
  def wordShingles(text: Column, n: Int): Column = shingles(tokens(text), n)

  /** One pictographic character class (the common emoji blocks):
    * shared by [[emojiTokenRe]] and the emoji-token test. Plain
    * RE2/Java `\x{...}` syntax so SQL oracles reuse it verbatim. */
  val emojiClass = "[\\x{2600}-\\x{27BF}\\x{1F000}-\\x{1FAFF}\\x{2B00}-\\x{2BFF}]"

  /** One EMOJI token: a pictograph with optional variation selector
    * (FE0F) and skin-tone modifier (1F3FB-1F3FF), ZWJ-joined into
    * sequences (a family emoji is ONE token — the reference tokenizes
    * with keep_zwj=True). */
  private val emojiSeqRe =
    s"$emojiClass\\x{FE0F}?[\\x{1F3FB}-\\x{1F3FF}]?"

  /** One token: an emoji (ZWJ sequence) OR an alphanumeric run —
    * the engine form of the reference's emoji-aware name tokenizer
    * (collection-templates airflow/dags/load_custom_collections.py:
    * 126-158, emoji_split + tokenize_name): emoji are PRESERVED as
    * tokens where the plain tokenizers strip them; text between emoji
    * splits on `[a-zA-Z0-9']+` exactly like the reference's _SPLIT_RE.
    * (The reference additionally dictionary-splits simple tokens with
    * wordninja — [[segmentName]]/[[segmentNameParts]] below, a41.) */
  val emojiTokenRe =
    s"(?:$emojiSeqRe(?:\\x{200D}$emojiSeqRe)*|[a-zA-Z0-9']+)"

  /** Emoji-aware tokens of a name column (see [[emojiTokenRe]]).
    * Narrow, codegen'd regexp extraction — no shuffle. */
  def emojiTokens(name: Column): Column =
    regexp_extract_all(name, lit(emojiTokenRe), lit(0))

  /** PII patterns (shared verbatim with SQL oracles — plain RE2/Java
    * syntax, no lookarounds). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phoneRe = "\\+\\d{1,3}[- ]?\\d{3}[- ]?\\d{3,4}[- ]?\\d{3,4}"

  /** Redact emails, dotted-quad IPs, and international-format phone
    * numbers with typed placeholders — the standard pre-export scrub
    * of a training-data pipeline. Pure regexp_replace chain (narrow,
    * codegen'd, no shuffle). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(emailRe), lit("<EMAIL>")),
        lit(ipRe), lit("<IP>")),
      lit(phoneRe), lit("<PHONE>"))

  /** wordninja-style unigram-DP segmentation of a (lowercased) name
    * into dictionary words — native codegen expression, see
    * [[graft.functions.expr.WordSegment]] for the full contract.
    * `dict` is a `map<string,bigint>` token → micro-ln cost column
    * with SORTED keys (build it with [[segmentCostEntries]] →
    * map_from_entries), `maxWord` the dictionary's max token length —
    * both typically one broadcast crossJoin'd dim row. */
  def segmentName(name: Column, dict: Column, maxWord: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expr.WordSegment(
        org.apache.spark.sql.graft.ColumnBridge.expression(name),
        org.apache.spark.sql.graft.ColumnBridge.expression(dict),
        org.apache.spark.sql.graft.ColumnBridge.expression(maxWord)))

  /** The reference-parity composition (preprocessing_service.py:
    * wordninja pre-splits on `[^a-zA-Z0-9']+` before the DP): split
    * the name on that class, segment each piece, flatten — so
    * "president of america" yields [president, of, america] exactly
    * as the reference's own test pins. The lambda puts [[segmentName]]
    * under a higher-order `transform` (CodegenFallback) — use the
    * plain [[segmentName]] on delimiter-free names (a41's hot path)
    * and this form where reference-exact pre-splitting matters. */
  def segmentNameParts(name: Column, dict: Column, maxWord: Column): Column =
    flatten(transform(
      array_remove(split(name, "[^a-zA-Z0-9']+"), ""),
      piece => segmentName(piece, dict, maxWord)))

  /** [[segmentName]]'s dictionary dim from a (token, count) frequency
    * frame: ONE row `(dict map<string,bigint>, max_word int)` —
    * wordninja's Zipf cost `ln(rank · ln V)` with rank by (count DESC,
    * token) and V = |dictionary|, integerized to micro-ln units
    * (`round(·×10⁶)::long`) so the DP is exact integer arithmetic on
    * both engines, map keys sorted (the binary-search contract).
    * Callers `crossJoin(broadcast(...))` the result onto the names
    * frame. The global rank window runs over a VOCABULARY (dim-sized
    * by definition), never a corpus.
    *
    * CONTRACT: `cntCol` must be non-null on every row. The rank order
    * is realized by an ascending struct sort on `-cnt` — for non-null
    * counts this equals the former `cnt DESC` window exactly, but a
    * null count would sort FIRST here (rank 1, cheapest cost) where
    * the window's DESC ordering put nulls LAST. Both in-repo callers
    * derive counts from a groupBy().count(), which cannot be null. */
  def segmentDict(freq: org.apache.spark.sql.DataFrame,
                  tokCol: String, cntCol: String): org.apache.spark.sql.DataFrame = {
    // V (the vocabulary size, inside every cost's ln(rank·ln V)) is
    // counted in the SAME single-row aggregation that packs the
    // entries, and the costs are derived in a post-agg projection on
    // that one row — a separate count branch would give `freq` a
    // second consumer and re-run the corpus-sized token scan it
    // derives from (Catalyst does not dedupe common subplans; a41's
    // PlanSpec pins the resulting two-scan total).
    //
    // Ranks come from array position, NOT a window: the former
    // row_number() over a global Window.orderBy forced a
    // single-partition sort exchange + a WindowExec stage between the
    // token agg and the one-row pack — two extra stages whose codegen
    // compile dominated a41's fresh-JVM single-shot floor (the r14
    // verdict ask #4; the dict is dim-sized, so the sort belongs
    // inside the one packed row). array_sort over struct(-cnt, tok)
    // realizes the identical (cnt DESC, tok ASC) total order — tok is
    // unique post-groupBy, so the order is total and rank = index+1
    // is exactly the window's row_number.
    freq
      .select(col(tokCol).as("__tok"), col(cntCol).as("__cnt"))
      .agg(
        collect_list(struct((-col("__cnt")).as("__neg"),
          col("__tok"))).as("__e"),
        max(length(col("__tok"))).as("max_word"),
        count(lit(1)).cast("double").as("__v"))
      .select(
        map_from_entries(array_sort(transform(array_sort(col("__e")),
          (e, i) => struct(e.getField("__tok").as("__tok"),
            round(log((i + 1) * log(col("__v"))) * 1e6)
              .cast("long").as("__cost"))))).as("dict"),
        col("max_word"))
  }
}
