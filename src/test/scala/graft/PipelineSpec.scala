package graft

import graft.operators.{Collections, Relational}
import graft.sinks.EsBulk
import org.apache.spark.sql.functions._

/** End-to-end pipeline: the composed Collections.build over testdata
  * playing the reference's roles (lineitem = membership edges, part =
  * entities, orders = collection seeds, the part-key binary tree =
  * type hierarchy), then snapshot-diffed and rendered as ES bulk ops —
  * the full reference flow in one test.
  */
class PipelineSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  // The exact role-mapping the oracled p1_pipeline query runs —
  // defined once on GroupP so spec and oracle cannot desynchronize.
  private lazy val members = graft.queries.GroupP.membersOf(spark, sfDir)
  private lazy val entities = graft.queries.GroupP.entitiesOf(spark, sfDir)
  private lazy val collections = graft.queries.GroupP.collectionsOf(spark, sfDir)
  private lazy val typeEdges = graft.queries.GroupP.typeEdgesOf(spark, sfDir)

  private lazy val built =
    Collections.build(members, entities, collections, typeEdges, topK = 5)
      .localCheckpoint()

  test("driver entry contract: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("pipeline produces one merged row per collection name") {
    val names = built.select("collection_name").as[String].collect()
    assert(names.nonEmpty)
    assert(names.length == names.distinct.length, "names must be unique after merge")
  }

  test("valid/invalid counts total the deduped membership rows") {
    val total = built.agg(sum($"valid_cnt" + $"invalid_cnt")).as[Long].head()
    // build() dedups (collection_id, member_id) unconditionally —
    // repeated membership edges count once, relations or not. NO
    // entities join here (r12): a member without an entity row counts
    // INVALID (reference parity), so every deduped membership edge
    // lands in exactly one bucket.
    val expected = members.select("collection_id", "member_id").distinct()
      .join(collections, "collection_id").count()
    assert(total == expected)
  }

  test("entity-less members count invalid; memberless collections emit 0/0") {
    // Reference parity (filter_articles2.py): a member with no entity
    // row never reaches valid_members but still counts in
    // invalid_members_count = len(members) - len(valid_members); and
    // EVERY input collection writes a row, members or not.
    val m = Seq((1L, 100L, 5.0), (1L, 999L, 9.0))
      .toDF("collection_id", "member_id", "score") // 999: no entity row
    val e = Seq((100L, "m100", 10L)).toDF("member_id", "member_name", "member_type")
    val c = Seq((1L, "list", 10L), (2L, "ghost", 10L))
      .toDF("collection_id", "collection_name", "required_type")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = Collections.build(m, e, c, noEdges, topK = 5)
      .select("collection_name", "valid_cnt", "invalid_cnt")
      .as[(String, Long, Long)].collect()
      .map { case (k, v, i) => k -> ((v, i)) }.toMap
    assert(out("list") == (1L, 1L),
      "member 100 validates (type == required); entity-less 999 counts invalid")
    assert(out("ghost") == (0L, 0L), "memberless collections keep their 0/0 row")
  }

  test("duplicate membership rows dedup identically with and without relations") {
    // ADVICE r3: the same input must yield the same counts whether the
    // relation stage is engaged (even vacuously) or not.
    val m = Seq((1L, 100L, 5.0), (1L, 100L, 9.0), (1L, 101L, 7.0))
      .toDF("collection_id", "member_id", "score")
    val e = Seq((100L, "m100", 10L), (101L, "m101", 10L))
      .toDF("member_id", "member_name", "member_type")
    val c = Seq((1L, "list", 10L)).toDF("collection_id", "collection_name", "required_type")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val emptyRel = Seq.empty[(Long, Long)].toDF("category_id", "list_id")
    val without = Collections.build(m, e, c, noEdges, topK = 5)
      .select("collection_name", "valid_cnt", "invalid_cnt").collect()
    val withEmpty = Collections.build(m, e, c, noEdges, topK = 5,
      relations = Some(emptyRel))
      .select("collection_name", "valid_cnt", "invalid_cnt").collect()
    assert(without.toSeq == withEmpty.toSeq)
    assert(without.head.getAs[Long]("valid_cnt") == 2L,
      "the duplicated member 100 must count once")
  }

  test("surviving collection id is the LEAST of the merged ids") {
    // ADVICE r3 (medium): the reference's merge_collections keeps
    // min(category.item, list.item) — a category with a SMALLER id
    // than its list must donate its id to the merged collection, and
    // everything keyed on the id (banner seed) must follow.
    val m = Seq((7L, 100L, 5.0), (3L, 101L, 7.0))
      .toDF("collection_id", "member_id", "score")
    val e = Seq((100L, "m100", 10L), (101L, "m101", 10L))
      .toDF("member_id", "member_name", "member_type")
    val c = Seq((7L, "list", 10L), (3L, "cat", 10L))
      .toDF("collection_id", "collection_name", "required_type")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val rel = Seq((3L, 7L)).toDF("category_id", "list_id")
    val out = Collections.build(m, e, c, noEdges, topK = 5, relations = Some(rel))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("collection_name") == "list",
      "the list's name survives")
    assert(out.head.getAs[Long]("stable_id") == 3L,
      "the category's smaller id survives")
    val expectedBanner = Seq(3L).toDF("stable_id")
      .select(graft.operators.Sampling.hashBucket(col("stable_id"), 20).as("b"))
      .as[Long].head()
    assert(out.head.getAs[Long]("banner_number") == expectedBanner,
      "banner seeding keys on the surviving (least) id")
  }

  test("multi-edge category merges into only its first sound list") {
    // ADVICE r3: a category related to several lists merges into ONE
    // (the reference breaks after the first merge) — smallest list id
    // among the SOUND edges; members must not double-count across
    // lists.
    val m = Seq((1L, 100L, 5.0), (2L, 101L, 7.0), (9L, 102L, 9.0))
      .toDF("collection_id", "member_id", "score")
    val e = Seq((100L, "m100", 10L), (101L, "m101", 10L), (102L, "m102", 10L))
      .toDF("member_id", "member_name", "member_type")
    val c = Seq((1L, "listA", 10L), (2L, "listB", 10L), (9L, "cat", 10L))
      .toDF("collection_id", "collection_name", "required_type")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val rel = Seq((9L, 2L), (9L, 1L)).toDF("category_id", "list_id")
    val out = Collections.build(m, e, c, noEdges, topK = 5, relations = Some(rel))
      .select("collection_name", "valid_cnt").as[(String, Long)].collect().toMap
    assert(out === Map("listA" -> 2L, "listB" -> 1L),
      "9's member lands in listA (smallest sound list id) only")
  }

  test("top member lists are bounded and namehashes well-formed") {
    assert(built.filter(size($"top_members") > 5).count() == 0)
    assert(built.filter(length($"namehash") =!= 64).count() == 0)
    // Deterministic: same name → same hash, across recomputations.
    val again = Collections.build(members, entities, collections, typeEdges, 5)
      .select("collection_name", "namehash").as[(String, String)].collect().toMap
    built.select("collection_name", "namehash").as[(String, String)].collect()
      .foreach { case (n, h) => assert(again(n) == h) }
  }

  test("relation merge absorbs category members into the list before name merge") {
    // Tiny hand-built case: category 2 relates to list 1; member 100
    // exists in both with different scores. After the merge the
    // category seed is gone, its members flow to the list, and the
    // duplicated member keeps its best score.
    val m = Seq((1L, 100L, 5.0), (2L, 101L, 7.0), (2L, 100L, 9.0))
      .toDF("collection_id", "member_id", "score")
    val e = Seq((100L, "m100", 10L), (101L, "m101", 10L))
      .toDF("member_id", "member_name", "member_type")
    val c = Seq((1L, "list", 10L), (2L, "cat", 10L))
      .toDF("collection_id", "collection_name", "required_type")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val rel = Seq((2L, 1L)).toDF("category_id", "list_id")
    val out = Collections.build(m, e, c, noEdges, topK = 5, relations = Some(rel))
      .collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[String]("collection_name") == "list")
    assert(row.getAs[Long]("stable_id") == 1L)
    assert(row.getAs[Long]("valid_cnt") == 2L, "100 deduped to best score + 101")
    assert(row.getAs[scala.collection.Seq[String]]("top_members").toSeq == Seq("m100", "m101"),
      "score 9.0 copy of m100 must win the dedup and rank first")
    // Without relations, both seeds survive as separate names.
    val plain = Collections.build(m, e, c, noEdges, topK = 5)
    assert(plain.count() == 2)
  }

  test("unsound relation edges are ignored, not silently member-dropping") {
    // Chain: category 3 → list 2, category 2 → list 1. Edge 3→2 is
    // unsound (its target is itself absorbed); applying it would remap
    // 3's members onto the vanished collection 2 and lose them. It
    // must be ignored: 3 stays standalone, 2→1 still applies. A
    // dangling edge (4→99, no such list) is likewise ignored.
    val m = Seq((1L, 100L, 5.0), (2L, 101L, 7.0), (3L, 102L, 9.0), (4L, 103L, 1.0))
      .toDF("collection_id", "member_id", "score")
    val e = Seq((100L, "m100", 10L), (101L, "m101", 10L),
      (102L, "m102", 10L), (103L, "m103", 10L))
      .toDF("member_id", "member_name", "member_type")
    val c = Seq((1L, "list", 10L), (2L, "cat2", 10L), (3L, "cat3", 10L), (4L, "cat4", 10L))
      .toDF("collection_id", "collection_name", "required_type")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val rel = Seq((3L, 2L), (2L, 1L), (4L, 99L)).toDF("category_id", "list_id")
    val out = Collections.build(m, e, c, noEdges, topK = 5, relations = Some(rel))
      .select("collection_name", "valid_cnt").as[(String, Long)].collect().toMap
    assert(out === Map("list" -> 2L, "cat3" -> 1L, "cat4" -> 1L),
      "2's members flow to list; 3 and 4 stay standalone with members intact")
  }

  test("diff + es bulk closes the loop on the reference flow") {
    // "Previous snapshot": the same build with a perturbed rank, so some
    // documents change, some match, and dropped names archive.
    val prev = built.filter($"stable_id" % 3 =!= 0)
      .withColumn("rank", $"rank" + 1.0)
    val ops = Relational.diffSnapshots(
      built, prev, "collection_name",
      xxhash64(col("rank"), col("valid_cnt")))
    val lines = EsBulk.bulkLines(
      ops.join(built, Seq("collection_name"), "left"),
      "collections", "collection_name", "op",
      struct(col("valid_cnt"), col("rank"))).as[String].collect()
    assert(lines.nonEmpty)
    // Names missing from prev re-insert; rank-perturbed ones update;
    // nothing archives (prev ⊂ current here).
    val expectInserts = built.filter($"stable_id" % 3 === 0).count()
    assert(lines.count(_.contains("\"archived\":true")) == 0)
    assert(lines.count(_.startsWith("{\"index\"")) == expectInserts,
      "names missing from prev must re-insert")
    assert(lines.forall(l => l.split("\n").length == 2))
  }
}
