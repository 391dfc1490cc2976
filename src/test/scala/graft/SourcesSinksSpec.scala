package graft

import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.operators.Relational
import graft.sinks.EsBulk
import org.apache.spark.sql.functions._

/** The ntriples DataSource V2 (format registration, parsing parity
  * with the Column parser, gzip, column pruning) and the ES bulk sink
  * formatting.
  */
class SourcesSinksSpec extends GraftSuite {
  private val ss = SparkTestBase.spark
  import ss.implicits._

  private val sample = Seq(
    """<http://www.wikidata.org/entity/Q42> <http://schema.org/name> "Douglas Adams"@en .""",
    """<http://www.wikidata.org/entity/Q42> <http://www.wikidata.org/prop/direct/P31> <http://www.wikidata.org/entity/Q5> .""",
    "garbage line",
    """<http://www.wikidata.org/entity/Q7> <http://schema.org/motto> "say \"hi\" there" .""",
    // Edge objects the r12 review found diverging between the two
    // parsers: a blank-node object and a trailing-slash URI object
    // (no local name) both yield obj = "" on BOTH paths now; a
    // trailing-slash SUBJECT is the Column side's filtered
    // empty-subject class, skipped by the reader.
    """<http://www.wikidata.org/entity/Q8> <http://schema.org/sameAs> _:b1 .""",
    """<http://www.wikidata.org/entity/Q9> <http://schema.org/url> <http://example.org/> .""",
    """<http://example.org/> <http://schema.org/name> "rootless" .""",
    """<http://www.wikidata.org/entity/Q1> <http://schema.org/description> "the universe" .""")

  private def writeSample(gzip: Boolean): String = {
    val dir = Files.createTempDirectory("nt").toFile
    val f = new java.io.File(dir, if (gzip) "part-0.nt.gz" else "part-0.nt")
    val out = if (gzip) new GZIPOutputStream(new java.io.FileOutputStream(f))
      else new java.io.FileOutputStream(f)
    out.write(sample.mkString("\n").getBytes("UTF-8"))
    out.close()
    dir.getAbsolutePath
  }

  test("format(ntriples) parses files and skips malformed lines") {
    val got = spark.read.format("ntriples").load(writeSample(gzip = false))
      .as[(String, String, String, Boolean)].collect().toSet
    assert(got == Set(
      ("Q42", "name", "Douglas Adams", false),
      ("Q42", "P31", "Q5", true),
      // Escaped quotes stay in the lexical form, un-truncated.
      ("Q7", "motto", """say \"hi\" there""", false),
      ("Q8", "sameAs", "", false),
      ("Q9", "url", "", true),
      ("Q1", "description", "the universe", false)))
  }

  test("format(ntriples) reads gzip transparently") {
    val n = spark.read.format("ntriples").load(writeSample(gzip = true)).count()
    assert(n == 6)
  }

  test("format(ntriples) prunes columns in the scan") {
    val df = spark.read.format("ntriples").load(writeSample(gzip = false))
      .select("subject")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) == Seq("subject"),
      s"scan must emit only the pruned column, got ${scan.output}")
    assert(df.as[String].collect().sorted.toSeq ==
      Seq("Q1", "Q42", "Q42", "Q7", "Q8", "Q9"))
  }

  test("format(ntriples) skips files under hidden/temp DIRECTORIES") {
    // A failed/concurrent Spark write leaves `_temporary/.../part-*`
    // shards whose BASENAMES look ordinary — the r12 review's
    // double-count hazard; filtering must check every path component.
    val dir = writeSample(gzip = false)
    val tmp = new java.io.File(dir, "_temporary/0/task_x")
    assert(tmp.mkdirs())
    val stray = new java.io.File(tmp, "part-0.nt")
    val out = new java.io.FileOutputStream(stray)
    out.write(sample.mkString("\n").getBytes("UTF-8")); out.close()
    val n = spark.read.format("ntriples").load(dir).count()
    assert(n == 6, s"stray _temporary shard must not be read (got $n rows)")
  }

  test("v2 source agrees with the Column-level parser") {
    val dir = writeSample(gzip = false)
    val v2 = spark.read.format("ntriples").load(dir)
      .as[(String, String, String, Boolean)].collect().toSet
    val colParsed = graft.sources.NTriples
      .parse(spark.read.text(dir))
      .filter(col("subject") =!= "")
      .as[(String, String, String, Boolean)].collect().toSet
    assert(v2 == colParsed)
  }

  test("sql dump tuple splitter handles multi-tuple lines and junk") {
    val lines = Seq(
      "INSERT INTO t VALUES (1,'a',10),(2,'b,c',20);",
      "-- comment, no tuples here",
      "CREATE TABLE t (`pl_from` int(8) unsigned NOT NULL DEFAULT '0',",
      "  KEY pl_namespace (pl_namespace,pl_title)",
      "INSERT INTO t VALUES (3,'d',30);").toDF("value")
    val got = graft.sources.SqlDump.tuples(lines).as[String].collect().toSet
    assert(got == Set("1,'a',10", "2,'b,c',20", "3,'d',30"))
  }

  test("sql dump tuple splitter keeps parens and escapes inside quoted values") {
    // The r12 review's corruption class: real Wikipedia title dumps
    // are full of parenthesized titles. A quoted span must be
    // consumed atomically — including MySQL's \' and '' escapes —
    // so its parens never terminate the tuple early.
    val lines = Seq(
      "INSERT INTO pagelinks VALUES (10,0,'Python_(programming_language)',0),(11,0,'plain',1);",
      raw"INSERT INTO t VALUES (12,'it\'s (a) test',2),(13,'don''t (stop)',3);")
      .toDF("value")
    val got = graft.sources.SqlDump.tuples(lines).as[String].collect().toSet
    assert(got == Set(
      "10,0,'Python_(programming_language)',0",
      "11,0,'plain',1",
      raw"12,'it\'s (a) test',2",
      "13,'don''t (stop)',3"), s"got $got")
  }

  test("es bulk sink renders insert/update/archive wire format") {
    val cur = Seq((1L, "a"), (2L, "b2"), (4L, "d")).toDF("k", "v")
    val prev = Seq((2L, "b"), (3L, "c"), (1L, "a")).toDF("k", "v")
    val ops = Relational.diffSnapshots(cur, prev, "k", col("v"))
      .join(cur.withColumnRenamed("k", "kk"), col("k") === col("kk"), "left")
    val lines = EsBulk.bulkLines(ops, "collections", "k", "op",
        struct(col("v"))).as[String].collect().toSet
    assert(lines.contains(
      "{\"index\":{\"_index\":\"collections\",\"_id\":\"4\"}}\n{\"v\":\"d\"}"))
    assert(lines.contains(
      "{\"update\":{\"_index\":\"collections\",\"_id\":\"2\"}}\n{\"doc\":{\"v\":\"b2\"}}"))
    assert(lines.contains(
      "{\"update\":{\"_index\":\"collections\",\"_id\":\"3\"}}\n{\"doc\":{\"archived\":true}}"))
    // unchanged rows (k = 1) are dropped by the op filter upstream? No:
    // diffSnapshots tags them; bulkLines keeps only real ops.
    assert(lines.size == 3)
  }
}
