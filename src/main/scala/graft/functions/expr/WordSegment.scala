package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-frequency dynamic-programming word segmentation — the
  * wordninja algorithm (reference: collection-templates
  * collections-preprocessing/src/preprocessing_service.py:8-27, which
  * calls wordninja.split(name.lower()) on every member name; expected
  * splits pinned by the reference's own
  * collections-preprocessing/src/test_main.py: "CaptainAmerica" →
  * ["captain","america"], "deadpool" → ["dead","pool"]).
  *
  * `graft_segment(name, dict, maxWord)` lowercases `name` and splits
  * it into the token sequence minimizing the summed dictionary cost,
  * where `dict` is a `map<string,bigint>` of token → cost in
  * MICRO-LN units (the caller derives `round(ln(rank·ln V)·1e6)` from
  * corpus token frequencies — wordninja's Zipf cost, integerized so
  * both engines run EXACT integer arithmetic: the DuckDB oracle
  * replays the identical DP in a recursive CTE and argmin ties cannot
  * be flipped by float summation order). A substring absent from the
  * dictionary is admissible only at length 1, at [[WordSegment.UnknownCharCost]]
  * per character (chosen above any realistic dictionary cost:
  * ln(rank·lnV)·1e6 reaches ~2.1e7 only past rank ~10^9) — so unknown
  * runs degrade to single-character tokens, never an uncovered
  * position. Ties (equal total cost) break toward the SHORTEST last
  * token, matching the oracle's `list_min` over `(cost, k)` structs.
  *
  * DP over positions 0..n: `cost(i) = min_k cost(i-k) + dictCost(
  * s[i-k..i))`, k ≤ maxWord — O(n·maxWord) lookups per name. Lookups
  * binary-search the MapData's key array DIRECTLY, which requires the
  * map to be built with SORTED keys — `map_from_entries(array_sort(
  * collect_list(struct(tok, cost))))` — validated once per
  * (task, dictionary size) and failed LOUDLY otherwise; this keeps
  * the per-row cost at O(log V) per lookup with ZERO per-row
  * conversion of the (potentially 10^5-entry) broadcast dictionary.
  * The dictionary column is expected to be the same broadcast 1-row
  * dim on every row (the a27/a41 crossJoin(broadcast(...)) pattern);
  * the sortedness re-validation triggers on any size change but
  * cannot distinguish two same-size dictionaries — one dictionary per
  * plan is the documented contract.
  *
  * Scale posture: narrow per-row compute, no shuffle; the dictionary
  * fit upstream is one dim-sized aggregation. Codegen emits a single
  * virtual call into [[segment]] (the addReferenceObj pattern), so
  * the expression never breaks a WholeStageCodegen span.
  *
  * Divergences from wordninja, documented: (1) the reference
  * pre-splits on `[^a-zA-Z0-9']+` before the DP — compose that with
  * `Text.segmentNameParts` (split → segment each piece → flatten),
  * which reproduces the reference test's
  * "president of america" → [president, of, america]; (2) wordninja
  * re-attaches `'s` and digit-run tokens — corpus-specific cosmetics
  * over the same DP, not implemented; (3) positions are UTF-16 code
  * units (= characters for the ASCII/BMP names this serves).
  */
case class WordSegment(name: Expression, dict: Expression,
                       maxWord: Expression)
    extends TernaryExpression {

  override def first: Expression = name
  override def second: Expression = dict
  override def third: Expression = maxWord

  override def checkInputDataTypes(): TypeCheckResult =
    (name.dataType, dict.dataType, maxWord.dataType) match {
      case (StringType, MapType(StringType, LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (n, d, m) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, map<string,bigint>, int) inputs, " +
          s"got (${n.catalogString}, ${d.catalogString}, ${m.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // Sortedness is validated once per (deserialized instance, dict
  // size): the dictionary is a broadcast dim — the same value on
  // every row — so one O(V) scan per task amortizes to nothing, and
  // a size change (a second dictionary in the same plan, violating
  // the documented contract) re-validates.
  @transient private var checkedSize: Int = -1

  private def ensureSortedKeys(keys: ArrayData, size: Int): Unit = {
    if (checkedSize == size) return
    var i = 1
    while (i < size) {
      if (keys.getUTF8String(i - 1).compareTo(keys.getUTF8String(i)) >= 0)
        throw new IllegalArgumentException(
          s"$prettyName: dictionary keys must be strictly sorted — build " +
            "the map with map_from_entries(array_sort(collect_list(" +
            "struct(tok, cost)))) so lookups can binary-search the key " +
            "array without a per-row conversion")
      i += 1
    }
    checkedSize = size
  }

  /** The DP body — also the codegen target (one virtual call per row
    * via addReferenceObj keeps the surrounding WholeStageCodegen span
    * intact without generating the whole DP inline). */
  def segment(nameU: UTF8String, dictData: MapData, maxw: Int): ArrayData = {
    val s = nameU.toString.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    if (n == 0) return new GenericArrayData(new Array[AnyRef](0))
    // Names are short by contract (ENS labels, member titles). A
    // document-sized value reaching a NAME segmenter is a wiring
    // error — fail loudly at the first such row instead of silently
    // burning O(n·maxWord·log V) per row across the corpus (the d5
    // all-pairs-guard discipline: nothing accidentally quadratic-ish
    // can be copy-pasted into production).
    if (n > 65536)
      throw new IllegalArgumentException(
        s"$prettyName: input is $n chars — this is a NAME segmenter " +
          "(DP cost grows with length x maxWord); segment documents " +
          "with the chunking operators instead")
    val keys = dictData.keyArray()
    val vals = dictData.valueArray()
    val dsize = dictData.numElements()
    ensureSortedKeys(keys, dsize)

    def lookup(sub: String): Long = {
      val target = UTF8String.fromString(sub)
      var lo = 0
      var hi = dsize - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = keys.getUTF8String(mid).compareTo(target)
        if (c == 0) return vals.getLong(mid)
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      -1L
    }

    // costs(i) = minimal cost of s[0..i); lens(i) = the arg-min last
    // token length at i. k scans ascending with a STRICT '<', so an
    // exact tie keeps the smallest k — identical to the oracle's
    // list_min over (cost, k) structs.
    val costs = new Array[Long](n + 1)
    val lens = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var bestK = 1
      val kMax = math.min(i, maxw)
      var k = 1
      while (k <= kMax) {
        val dc = lookup(s.substring(i - k, i))
        val tokCost =
          if (dc >= 0L) dc
          else if (k == 1) WordSegment.UnknownCharCost
          else WordSegment.ForbiddenCost
        val c = costs(i - k) + tokCost
        if (c < best) { best = c; bestK = k }
        k += 1
      }
      costs(i) = best
      lens(i) = bestK
      i += 1
    }

    var cnt = 0
    var p = n
    while (p > 0) { cnt += 1; p -= lens(p) }
    val out = new Array[AnyRef](cnt)
    p = n
    var idx = cnt - 1
    while (p > 0) {
      val k = lens(p)
      out(idx) = UTF8String.fromString(s.substring(p - k, p))
      idx -= 1
      p -= k
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(n: Any, d: Any, m: Any): Any =
    segment(n.asInstanceOf[UTF8String], d.asInstanceOf[MapData],
      m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSegment", this,
      classOf[WordSegment].getName)
    val arrData = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, (n, d, m) =>
      s"${ev.value} = ($arrData) $ref.segment($n, $d, $m);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(name = newFirst, dict = newSecond, maxWord = newThird)

  override def prettyName: String = "graft_segment"
}

object WordSegment {
  /** Cost of an out-of-dictionary single character, in micro-ln
    * units (= ln-cost 25.0): above any realistic dictionary entry,
    * below 1/40th of ForbiddenCost so a 64-char all-unknown name
    * stays nowhere near Long overflow. The DuckDB oracle inlines the
    * same constant. */
  val UnknownCharCost: Long = 25000000L

  /** Out-of-dictionary substrings LONGER than one char are never
    * taken: any path through single-char unknowns is cheaper by
    * construction (k·UnknownCharCost < ForbiddenCost for k ≤ 64 the
    * engine's name-length scale — and even 10^6 unknown chars sum to
    * 2.5e13 < ForbiddenCost), so this arm exists only to keep the
    * candidate enumeration total rather than special-cased. */
  val ForbiddenCost: Long = 1000000000000000L
}
