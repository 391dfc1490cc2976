package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for N-triples dumps: `spark.read.format("ntriples")
  * .load(path)` → (subject, predicate, obj, obj_is_uri), with URI
  * prefixes cleaned to local names exactly like
  * [[NTriples.parse]]. Transparent gzip via the Hadoop codec factory —
  * the reference's inlets are grep-filtered *.gz dumps
  * (collection-templates Makefile:17, scripts/create_kv.py).
  *
  * Scale posture: one input partition per file (dump shards are
  * many-file; gzip is not splittable anyway), readers stream line by
  * line with no buffering of the file, and column pruning is pushed
  * into the reader (a `select(subject)` never materializes the other
  * fields). The Column-level [[NTriples.parse]] over `spark.read.text`
  * remains the fully codegen'd alternative when lines are already
  * decompressed; this format is the turnkey path.
  */
class NTriplesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ntriples"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NTriplesTable.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NTriplesTable(properties.getOrDefault("path", ""))

  override def supportsExternalMetadata(): Boolean = false
}

object NTriplesTable {
  val fullSchema: StructType = StructType(Seq(
    StructField("subject", StringType),
    StructField("predicate", StringType),
    StructField("obj", StringType),
    StructField("obj_is_uri", BooleanType)))
}

class NTriplesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"ntriples:$path"
  override def schema(): StructType = NTriplesTable.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NTriplesScanBuilder(Option(options.get("path")).getOrElse(path))
}

class NTriplesScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = NTriplesTable.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new NTriplesScan(path, required)
}

/** The session's Hadoop configuration, made serializable by writing
  * it through Hadoop's own Writable form — executors need the
  * spark.hadoop.* keys (object-store credentials, endpoints) that a
  * bare `new Configuration()` would drop. */
class HadoopConfBytes(@transient conf: Configuration) extends Serializable {
  private val bytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    conf.write(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }
  def value: Configuration = {
    val c = new Configuration(false)
    c.readFields(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    c
  }
}

class NTriplesScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def sessionConf: Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(sessionConf)
    val root = fs.makeQualified(p)
    // Hidden/temp filtering must check EVERY path component below the
    // root, not just the basename (r12 review): a recursive listing
    // descends into `_temporary/`/`.spark-staging*` leftovers from
    // failed or concurrent writes, whose part files have perfectly
    // ordinary basenames — Spark's own InMemoryFileIndex filters
    // per-component for exactly this reason.
    def hiddenUnder(f: Path): Boolean = {
      var cur = f
      while (cur != null && cur != root) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val files = ArrayBuffer.empty[FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && !hiddenUnder(f.getPath)) files += f
    }
    files.sortBy(_.getPath.toString)
      .map(f => NTriplesPartition(f.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NTriplesReaderFactory(required.fieldNames, new HadoopConfBytes(sessionConf))
}

case class NTriplesPartition(file: String) extends InputPartition

class NTriplesReaderFactory(fields: Array[String], conf: HadoopConfBytes)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NTriplesReader(partition.asInstanceOf[NTriplesPartition].file, fields,
      conf.value)
}

/** Streams one file line by line; parses with the same grammar AND
  * the same edge semantics as [[NTriples.parse]] (r12 review closed
  * the divergences): a URI object whose local name is empty (trailing
  * slash) or that fails extraction yields "", a non-URI non-literal
  * object (blank node `_:b1`) yields "", and `obj_is_uri` is the
  * starts-with-`<` test exactly as in the Column form. Lines the
  * Column parser surfaces as empty-SUBJECT rows (malformed, or a
  * subject URI with no local name) are skipped here — the documented
  * caller contract on the Column side is to filter them, and a file
  * reader has no use for them. */
class NTriplesReader(file: String, fields: Array[String],
                     hadoopConf: Configuration)
    extends PartitionReader[InternalRow] {

  private val lineRe = "^<([^>]+)> <([^>]+)> (.+) \\.$".r
  private val localRe = "([^/#]+)$".r.unanchored
  private val uriRe = "^<([^>]+)>$".r
  private val litRe = "^\"((?:[^\"\\\\]|\\\\.)*)\"".r.unanchored

  private val reader = {
    val p = new Path(file)
    val fs = p.getFileSystem(hadoopConf)
    val raw = fs.open(p)
    val codec = new CompressionCodecFactory(hadoopConf).getCodec(p)
    val in = if (codec != null) codec.createInputStream(raw) else raw
    new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
  }

  private var current: InternalRow = _

  // Parity with Column regexp_extract: no match => empty string,
  // never the raw input.
  private def local(uri: String): String =
    localRe.findFirstMatchIn(uri).map(_.group(1)).getOrElse("")

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      line match {
        case lineRe(s, p, o) =>
          val subj = local(s)
          if (subj.nonEmpty) { // empty-subject rows: the Column side's filtered class
            val (obj, isUri) =
              if (o.startsWith("<"))
                (uriRe.findFirstMatchIn(o).map(m => local(m.group(1)))
                  .getOrElse(""), true)
              else
                (litRe.findFirstMatchIn(o).map(_.group(1)).getOrElse(""), false)
            val vals = fields.map {
              case "subject" => UTF8String.fromString(subj)
              case "predicate" => UTF8String.fromString(local(p))
              case "obj" => UTF8String.fromString(obj)
              case "obj_is_uri" => java.lang.Boolean.valueOf(isUri)
            }
            current = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
            return true
          }
        case _ => // malformed: skip
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
