package graft

import graft.operators.Collections

/** Custom-collections ingestion (reference:
  * load_custom_collections.py prepare_custom_collection +
  * produce_custom_update_operations) — hand-built JSONL lines pinning
  * the label-defaulting rules, curator sort commands, malformed-line
  * survival, and the create/update/drop op split. */
class CustomCollectionsSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private def shape(lines: String*) =
    Collections.fromCustom(lines.toDF("value"))
      .collect().map(r => r.getAs[String]("collection_id") -> r).toMap

  test("label defaulting: normalized from tokens, tokens from normalized, both-present precedence") {
    val got = shape(
      // tokenized only -> normalized = concatenated tokens, ntok = 2
      """{"data":{"collection_id":"t","collection_name":"T","labels":[{"tokenized_label":["ab","cd"]}]},"commands":{}}""",
      // normalized only -> tokens = [a-z0-9]+ runs of the lowercased name
      """{"data":{"collection_id":"n","collection_name":"N","labels":[{"normalized_label":"Foo-Bar9 baz"}]},"commands":{}}""",
      // both present -> normalized name kept, token count from the given tokens
      """{"data":{"collection_id":"b","collection_name":"B","labels":[{"normalized_label":"keepme","tokenized_label":["x","y","z"]}]},"commands":{}}""")
    assert(got("t").getAs[String]("members") === "abcd")
    assert(got("t").getAs[Long]("n_tokens_total") === 2L)
    assert(got("n").getAs[String]("members") === "Foo-Bar9 baz")
    assert(got("n").getAs[Long]("n_tokens_total") === 3L) // foo, bar9, baz
    assert(got("b").getAs[String]("members") === "keepme")
    assert(got("b").getAs[Long]("n_tokens_total") === 3L)
    // tokenization defaulting is emoji-aware like the reference's
    // tokenize_name: the emoji is its own token
    val e = shape(
      """{"data":{"collection_id":"e","collection_name":"E","labels":[{"normalized_label":"fire🔥drill"}]},"commands":{}}""")
    assert(e("e").getAs[Long]("n_tokens_total") === 3L)
  }

  test("skip rule, empty and missing label lists, malformed lines") {
    val got = shape(
      """{"data":{"collection_id":"s","collection_name":"S","labels":[{"label":"raw only"},{"normalized_label":"ok"}]},"commands":{}}""",
      """{"data":{"collection_id":"e","collection_name":"E","labels":[]},"commands":{}}""",
      """{"data":{"collection_id":"m","collection_name":"M"},"commands":{}}""",
      """{"broken": """)
    assert(got("s").getAs[Long]("n_members") === 1L)
    assert(got("s").getAs[Long]("n_skipped") === 1L)
    assert(got("e").getAs[Long]("n_members") === 0L)
    assert(got("e").getAs[String]("members") === "")
    assert(got("e").isNullAt(got("e").fieldIndex("top_member")))
    assert(got("m").getAs[Long]("n_members") === 0L)
    val bad = got(null.asInstanceOf[String])
    assert(bad.getAs[Boolean]("malformed"))
    assert(bad.getAs[Long]("rank") === Collections.DefaultCollectionRank)
    assert(got("s").getAs[Boolean]("malformed") === false)
  }

  test("wrong-typed labels field is captured, not crashed on") {
    // A curator shipping labels as a STRING (schema violation, valid
    // JSON) must degrade like a malformed line — PERMISSIVE nulls the
    // row's fields and surfaces it via the corrupt column — never
    // kill the job or silently invent members.
    val got = shape(
      """{"data":{"collection_id":"w","collection_name":"W","labels":"oops"},"commands":{}}""")
    val row = got.values.head
    assert(row.getAs[Long]("n_members") === 0L)
    assert(row.getAs[Boolean]("malformed"),
      "type-violating lines must surface as malformed")
  }

  test("curator commands: rank defaults and all five sort orders") {
    def coll(id: String, commands: String) =
      s"""{"data":{"collection_id":"$id","collection_name":"X","labels":[
         |{"normalized_label":"bb"},{"tokenized_label":["a","a"]},{"normalized_label":"cc dd"}
         |]},"commands":{$commands}}""".stripMargin.replace("\n", "")
    // members: bb (1 tok), aa (2 toks), "cc dd" (2 toks). Input order: bb, aa, cc dd.
    val got = shape(
      coll("az", """"sort_labels":"a-z""""),
      coll("za", """"sort_labels":"z-a""""),
      coll("sh", """"sort_labels":"shortest""""),
      coll("lo", """"sort_labels":"longest""""),
      coll("no", """"sort_labels":"none""""),
      coll("ab", ""),
      coll("rk", """"member_rank":7,"collection_rank":9"""))
    assert(got("az").getAs[String]("top_member") === "aa")
    assert(got("za").getAs[String]("top_member") === "cc dd")
    assert(got("sh").getAs[String]("top_member") === "bb")      // 1 token
    assert(got("lo").getAs[String]("top_member") === "aa")      // 2 tokens, tiebreak asc
    assert(got("no").getAs[String]("top_member") === "bb")      // input order
    assert(got("ab").getAs[String]("top_member") === "bb")      // absent = none
    assert(got("ab").getAs[Long]("member_rank") === Collections.DefaultMemberRank)
    assert(got("ab").getAs[Long]("rank") === Collections.DefaultCollectionRank)
    assert(got("rk").getAs[Long]("member_rank") === 7L)
    assert(got("rk").getAs[Long]("rank") === 9L)
  }

  test("property: fromCustom matches an in-memory reimplementation on random lines") {
    val rnd = new scala.util.Random(77)
    def word(): String = {
      val c = ('a' + rnd.nextInt(4)).toChar.toString
      c * (1 + rnd.nextInt(3))
    }
    def phrase(): String = Seq.fill(1 + rnd.nextInt(3))(word()).mkString(" ")
    case class Lab(norm: Option[String], toks: Option[Seq[String]])
    case class Line(id: String, labs: Seq[Lab], mr: Option[Long],
                    cr: Option[Long], cmd: Option[String])
    val cmds = Seq("a-z", "z-a", "shortest", "longest", "none", "junk")
    val linesData: Seq[Line] = (0 until 80).map { i =>
      val labs = Seq.fill(rnd.nextInt(5))(rnd.nextInt(4) match {
        case 0 => Lab(Some(phrase()), None)
        case 1 => Lab(None, Some(Seq.fill(1 + rnd.nextInt(3))(word())))
        case 2 => Lab(Some(phrase()), Some(Seq.fill(1 + rnd.nextInt(3))(word())))
        case _ => Lab(None, None) // skipped
      })
      Line(s"id$i", labs,
        if (rnd.nextBoolean()) Some(rnd.nextInt(100).toLong) else None,
        if (rnd.nextBoolean()) Some(rnd.nextInt(100).toLong) else None,
        if (rnd.nextInt(6) == 0) None else Some(cmds(rnd.nextInt(cmds.length))))
    }
    def js(l: Line): String = {
      val labs = l.labs.map { lab =>
        (lab.norm.map(n => s""""normalized_label":"$n"""") ++
          lab.toks.map(t => s""""tokenized_label":[${t.map("\"" + _ + "\"").mkString(",")}]"""))
          .mkString("{", ",", "}")
      }.mkString("[", ",", "]")
      val cmds = (l.mr.map(v => s""""member_rank":$v""") ++
        l.cr.map(v => s""""collection_rank":$v""") ++
        l.cmd.map(c => s""""sort_labels":"$c"""")).mkString(",")
      s"""{"data":{"collection_id":"${l.id}","collection_name":"n","labels":$labs},"commands":{$cmds}}"""
    }
    val got = Collections.fromCustom(linesData.map(js).toDF("value"))
      .collect().map(r => r.getAs[String]("collection_id") -> r).toMap
    linesData.foreach { l =>
      // independent reimplementation of the contract
      val valid = l.labs.filter(x => x.norm.isDefined || x.toks.isDefined)
      val norms = valid.map(x => x.norm.getOrElse(x.toks.get.mkString("")))
      val ntoks = valid.map(x => x.toks.map(_.size.toLong)
        .getOrElse(x.norm.get.split(" ").length.toLong))
      val r = got(l.id)
      assert(r.getAs[Long]("n_members") === valid.size.toLong, l)
      assert(r.getAs[Long]("n_skipped") === (l.labs.size - valid.size).toLong, l)
      assert(r.getAs[String]("members") === norms.sorted.mkString(","), l)
      assert(r.getAs[Long]("n_tokens_total") === ntoks.sum, l)
      assert(r.getAs[Long]("member_rank") ===
        l.mr.getOrElse(Collections.DefaultMemberRank), l)
      assert(r.getAs[Long]("rank") ===
        l.cr.getOrElse(Collections.DefaultCollectionRank), l)
      val mem = norms.zip(ntoks).zipWithIndex
      val top: Option[String] =
        if (mem.isEmpty) None
        else l.cmd match {
          case Some("a-z") => Some(norms.min)
          case Some("z-a") => Some(norms.max)
          case Some("shortest") =>
            Some(mem.minBy { case ((n, t), _) => (t, n) }._1._1)
          case Some("longest") =>
            Some(mem.minBy { case ((n, t), _) => (-t, n) }._1._1)
          case _ => Some(norms.head) // none / junk / absent = input order
        }
      assert(Option(r.getAs[String]("top_member")) === top, l)
      assert(!r.getAs[Boolean]("malformed"), l)
    }
  }

  test("status counts: missing lookups, the +1 rank quirk, the 1e-8 ratio floor") {
    val members = Collections.customMembers(Seq(
      """{"data":{"collection_id":"c","collection_name":"C","labels":[
        |{"normalized_label":"sold"},{"normalized_label":"free"},{"normalized_label":"unknown"}
        |]},"commands":{}}""".stripMargin.replace("\n", ""),
      """{"data":{"collection_id":"all-free","collection_name":"F","labels":[{"normalized_label":"free"}]},"commands":{}}""")
      .toDF("value"))
    val domains = Seq(("sold", "taken"), ("free", "available"))
      .toDF("name", "status")
    val got = Collections.customStatusCounts(members, domains)
      .collect().map(r => r.getAs[String]("collection_id") -> r).toMap
    val c = got("c")
    assert(c.getAs[Long]("taken") === 1L)
    assert(c.getAs[Long]("available") === 1L)
    assert(c.getAs[Long]("never_registered") === 1L) // missing lookup
    // reference quirks: count gets +1 ("rank features cannot be
    // zero"), the ratio stays raw but floors at MIN_VALUE
    assert(c.getAs[Long]("nonavailable_count") === 2L) // 1 taken + 1
    assert(math.abs(c.getAs[Double]("nonavailable_ratio") - 1.0 / 3) < 1e-6)
    val f = got("all-free")
    assert(f.getAs[Long]("nonavailable_count") === 1L) // 0 + 1
    assert(f.getAs[Double]("nonavailable_ratio") === 1e-8) // floored, not 0
  }

  test("update ops: create vs full update vs member-cap drop vs malformed drop") {
    val custom = Collections.fromCustom(Seq(
      """{"data":{"collection_id":"known","collection_name":"K","labels":[{"normalized_label":"m"}]},"commands":{}}""",
      """{"data":{"collection_id":"fresh","collection_name":"F","labels":[{"normalized_label":"m"}]},"commands":{}}""",
      """{"data":{"collection_id":"fat","collection_name":"W","labels":[{"normalized_label":"m1"},{"normalized_label":"m2"}]},"commands":{}}""",
      """{"nope""").toDF("value"))
    val existing = Seq(("known", "es-1")).toDF("collection_id", "es_id")
    val ops = Collections.customUpdateOps(custom, existing, maxMembers = 1L)
      .collect().map(r => r.getAs[String]("collection_id") ->
        (r.getAs[String]("op"), r.getAs[String]("es_id"))).toMap
    assert(ops === Map(
      "known" -> ("update", "es-1"),
      "fresh" -> ("create", "new-fresh")))
  }

  test("p3 equals composing the standalone c7/a33 queries plus a recomputed log-prob") {
    // The pipeline promises it is EXACTLY the standalone queries
    // composed — verify against their registered outputs, with the
    // name log-prob and banner bucket recomputed independently.
    val spark2 = SparkTestBase.spark
    val p3 = SparkEntry.queries("p3_custom_pipeline")(spark2, sfDir).collect()
      .map(r => r.getAs[String]("collection_id") -> r).toMap
    val ops = SparkEntry.queries("a33_custom_update_ops")(spark2, sfDir)
      .collect().map(r => r.getAs[String]("collection_id") -> r).toMap
    val st = SparkEntry.queries("c7_custom_status")(spark2, sfDir)
      .collect().map(r => r.getAs[String]("collection_id") -> r).toMap
    assert(p3.keySet == ops.keySet, "p3 rows are exactly a33's op rows")
    // Independent log-prob model over the non-malformed c6 names.
    val names = SparkEntry.queries("c6_custom_jsonl")(spark2, sfDir)
      .filter(!org.apache.spark.sql.functions.col("malformed"))
      .select("collection_id", "collection_name")
      .as[(String, String)].collect()
    val tokens = names.map { case (id, n) =>
      id -> n.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty) }
    val freq = tokens.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val total = freq.values.sum.toDouble
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wantLp = tokens.map { case (id, ts) =>
      id -> ts.map(t => r9(math.log(freq(t) / total))).sum }.toMap
    for ((id, row) <- p3) {
      val o = ops(id)
      assert(row.getAs[String]("op") == o.getAs[String]("op"))
      assert(row.getAs[String]("es_id") == o.getAs[String]("es_id"))
      assert(row.getAs[Long]("n_members") == o.getAs[Long]("n_members"))
      st.get(id) match {
        case Some(s) =>
          assert(row.getAs[Long]("nonavailable_count") ==
            s.getAs[Long]("nonavailable_count"))
          assert(row.getAs[Double]("nonavailable_ratio") ==
            s.getAs[Double]("nonavailable_ratio"))
        case None => // empty collection: metrics stay NULL, never crash
          assert(row.isNullAt(row.fieldIndex("nonavailable_count")))
      }
      assert(math.abs(row.getAs[Double]("name_log_prob") - wantLp(id)) < 1e-5,
        s"$id log-prob")
      val bucket = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(id.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16) % 20
      assert(row.getAs[Long]("banner_number") == bucket, s"$id banner")
    }
  }
}
