package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** a41's segmentation contract, pinned against the REFERENCE'S OWN
  * test expectations (collection-templates
  * collections-preprocessing/src/test_main.py): the marvel/dc hero
  * names must segment exactly as the reference service returns them,
  * and the per-collection token counts must match its
  * tokenized_names_counts dicts. The dictionary here mirrors a
  * wordninja-like Zipf ranking over a small English vocabulary —
  * ranks chosen so the DP faces real choices (bat+man vs batman,
  * wonder+woman vs a glued token absent from the dictionary).
  */
class WordSegmentSpec extends GraftSuite {
  import org.apache.spark.sql.DataFrame

  // Frequency-ranked vocabulary (count DESC = rank ASC). batman is
  // IN the dictionary (rarer than bat/man individually) — the DP must
  // still prefer the single token: one ln-cost beats two.
  private val vocab: Seq[(String, Long)] = Seq(
    "of" -> 1000L, "america" -> 500L, "president" -> 400L,
    "man" -> 350L, "super" -> 300L, "captain" -> 250L, "woman" -> 200L,
    "bat" -> 180L, "dead" -> 160L, "doctor" -> 140L, "pool" -> 120L,
    "wonder" -> 100L, "strange" -> 80L, "hulk" -> 60L, "batman" -> 40L)

  private def dictDim(): DataFrame = {
    val freq = spark.createDataFrame(vocab).toDF("tok", "cnt")
    Text.segmentDict(freq, "tok", "cnt")
  }

  private def segmented(names: Seq[String]): Map[String, Seq[String]] = {
    val df = spark.createDataFrame(names.map(Tuple1(_))).toDF("name")
      .crossJoin(broadcast(dictDim()))
      .select(col("name"),
        Text.segmentNameParts(col("name"), col("dict"), col("max_word"))
          .as("toks"))
    df.collect().map(r => r.getString(0) ->
      r.getSeq[String](1).toList).toMap
  }

  test("reference test_main.py: marvel heroes segment exactly as the service returns") {
    val out = segmented(Seq(
      "hulk", "CaptainAmerica", "deadpool", "doctorstrange",
      "president of america"))
    assert(out("hulk") == Seq("hulk"))
    assert(out("CaptainAmerica") == Seq("captain", "america"))
    assert(out("deadpool") == Seq("dead", "pool"))
    assert(out("doctorstrange") == Seq("doctor", "strange"))
    // The reference pre-splits on non-alphanumerics before the DP —
    // segmentNameParts reproduces that composition.
    assert(out("president of america") == Seq("president", "of", "america"))
  }

  test("reference test_main.py: dc heroes — in-dictionary single token beats a two-word split") {
    val out = segmented(Seq("superwoman", "Batman", "wonderwoman"))
    assert(out("superwoman") == Seq("super", "woman"))
    // batman IS in the dictionary: ln(rank·lnV) of one rare token is
    // still below the SUM of two common ones — the wordninja
    // property the reference's ["batman"] expectation rests on.
    assert(out("Batman") == Seq("batman"))
    assert(out("wonderwoman") == Seq("wonder", "woman"))
  }

  test("reference test_main.py: per-collection token counts (tokenized_names_counts)") {
    val marvel = Seq("hulk", "CaptainAmerica", "deadpool", "doctorstrange",
      "president of america")
    val dc = Seq("superwoman", "Batman", "wonderwoman")
    val names = marvel.map(("marvel heroes", _)) ++ dc.map(("dc heroes", _))
    val counts = spark.createDataFrame(names).toDF("coll", "name")
      .crossJoin(broadcast(dictDim()))
      .select(col("coll"),
        explode(Text.segmentNameParts(col("name"), col("dict"),
          col("max_word"))).as("tok"))
      .groupBy("coll", "tok").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val marvelExpected = Map("hulk" -> 1L, "captain" -> 1L, "america" -> 2L,
      "dead" -> 1L, "pool" -> 1L, "doctor" -> 1L, "strange" -> 1L,
      "president" -> 1L, "of" -> 1L)
    val dcExpected = Map("super" -> 1L, "woman" -> 2L, "batman" -> 1L,
      "wonder" -> 1L)
    assert(counts.filter(_._1._1 == "marvel heroes")
      .map { case ((_, t), c) => t -> c } == marvelExpected)
    assert(counts.filter(_._1._1 == "dc heroes")
      .map { case ((_, t), c) => t -> c } == dcExpected)
  }

  test("unknown characters degrade to single-char tokens; empty and null behave") {
    val out = segmented(Seq("batmanq7", "q7", ""))
    assert(out("batmanq7") == Seq("batman", "q", "7"))
    assert(out("q7") == Seq("q", "7"))
    assert(out("") == Seq.empty)
    // Null name → null result through the plain expression (standard
    // null-intolerant ternary semantics).
    val nullRow = spark.sql("SELECT CAST(NULL AS STRING) AS name")
      .crossJoin(broadcast(dictDim()))
      .select(Text.segmentName(col("name"), col("dict"), col("max_word"))
        .as("toks")).collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("an unsorted dictionary map fails loudly, never binary-searches garbage") {
    val df = spark.createDataFrame(Seq(Tuple1("batman"))).toDF("name")
      .withColumn("dict",
        map_from_entries(expr(
          "array(struct('pool', 1000000L), struct('bat', 2000000L))")))
      .withColumn("max_word", lit(4))
      .select(Text.segmentName(col("name"), col("dict"), col("max_word")))
    val e = intercept[Exception] { df.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("strictly sorted")),
      s"expected the sortedness guard; got $e")
  }

  test("a41 body: a collection of all-empty names keeps its rows with empty counts (test_empty contract)") {
    // The reference's own test_empty pins that an empty-names
    // collection comes back with an empty counts dict, not dropped —
    // the engine equivalent: a name segmenting to zero tokens keeps
    // its row through a LEFT counts join with '' counts.
    val names = spark.createDataFrame(Seq(
      (1L, 10L, ""), (2L, 10L, ""), (3L, 20L, "batman")))
      .toDF("p_partkey", "coll", "name")
    val out = graft.queries.GroupA5.segmentNamesOf(names, dictDim())
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(3), r.getLong(4), r.getString(5))).toSet
    assert(out == Set(
      (10L, 1L, "", 0L, ""),
      (10L, 2L, "", 0L, ""),
      (20L, 3L, "batman", 1L, "batman:1")))
  }

  test("property: DP result equals exhaustive minimum-cost enumeration (independent oracle)") {
    // Brute force: enumerate EVERY split of the string (2^(n-1)
    // compositions), cost it with the same dictionary/penalty rules,
    // take the minimum with ties broken lexicographically-smallest on
    // reversed token lengths (= the DP's smallest-last-token-k rule
    // applied at every backtrack step). Independent of the DP: no
    // shared code, a different algorithm, so an off-by-one in either
    // cannot hide in both.
    val rnd = new scala.util.Random(42)
    val words = Seq("a", "ab", "ba", "abc", "cab", "bc", "c", "abcd")
    val costs: Map[String, Long] =
      words.zipWithIndex.map { case (w, i) =>
        w -> math.round(math.log((i + 1) * math.log(words.size)) * 1e6)
      }.toMap
    val unknown = graft.functions.expr.WordSegment.UnknownCharCost
    val maxw = words.map(_.length).max
    def cost(tok: String): Long =
      costs.getOrElse(tok,
        if (tok.length == 1) unknown
        else graft.functions.expr.WordSegment.ForbiddenCost)
    def splits(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq.empty)
      else (1 to math.min(s.length, maxw)).flatMap(k =>
        splits(s.drop(k)).map(s.take(k) +: _))
    def brute(s: String): Seq[String] = {
      import scala.math.Ordering.Implicits.seqOrdering
      splits(s).map(toks => (toks.map(cost).sum, toks)).minBy { case (c, toks) =>
        // Tie order: total cost, then k ascending at each backtrack
        // position FROM THE END — i.e. compare reversed token-length
        // sequences lexicographically (the DP's greedy smallest-k
        // backtrack picks exactly this representative among ties).
        (c, toks.reverse.map(_.length).toSeq)
      }._2
    }
    val strings = (1 to 60).map { _ =>
      val n = 1 + rnd.nextInt(10)
      (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.distinct
    val freq = spark.createDataFrame(
      words.zipWithIndex.map { case (w, i) => (w, (words.size - i).toLong * 10) })
      .toDF("tok", "cnt")
    val dict = Text.segmentDict(freq, "tok", "cnt")
    val got = spark.createDataFrame(strings.map(Tuple1(_))).toDF("name")
      .crossJoin(broadcast(dict))
      .select(col("name"),
        Text.segmentName(col("name"), col("dict"), col("max_word")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // segmentDict derives costs from (cnt DESC, tok) ranks — with the
    // cnt ladder above, rank i+1 = words(i), matching `costs` exactly.
    for (s <- strings)
      assert(got(s) == brute(s),
        s"'$s': DP ${got(s)} != brute ${brute(s)}")
  }

  test("interpreted eval matches codegen (the WordShingles parity discipline)") {
    val names = Seq("CaptainAmerica", "wonderwoman", "batmanq7", "hulk",
      "presidentofamerica", "deadpooldoctorstrange")
    val base = spark.createDataFrame(names.map(Tuple1(_))).toDF("name")
      .crossJoin(broadcast(dictDim()))
      // repartition so LocalRelation constant-folding can't collapse
      // the plan before codegen runs (the vacuous-parity trap the
      // WordShingles spec documents).
      .repartition(2)
    def run(codegen: String): Seq[(String, Seq[String])] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try base.select(col("name"),
          Text.segmentName(col("name"), col("dict"), col("max_word"))
            .as("toks"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
        .toSeq.sortBy(_._1)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }
}
