package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Elasticsearch bulk-sync formatting — the reference's output stage
  * (collection-templates scripts/update_elasticsearch.py) turns a
  * snapshot diff into insert / partial-update / archive operations and
  * POSTs them as bulk NDJSON. This sink renders the same wire format
  * distributively: each row becomes one bulk entry (action line +
  * payload line), written with the plain text writer so any executor
  * count streams directly to object storage; an HTTP shipper (or the
  * es-hadoop connector) would consume these files unchanged.
  *
  * Scale posture: pure row-local formatting (`to_json` over codegen'd
  * structs, no shuffle). `partitionBy`/`repartition` upstream controls
  * file sizing; ordering inside a bulk file is irrelevant to ES.
  */
object EsBulk {

  /** Render change ops to bulk NDJSON entries.
    *
    * `ops` must carry `idCol`, an `opCol` valued in
    * {insert, update, archive}, and `payload` (a struct column with
    * the document fields). Unchanged rows should be filtered upstream
    * (diffSnapshots emits them tagged, the sync skips them).
    */
  def bulkLines(ops: DataFrame, index: String, idCol: String,
                opCol: String, payload: Column): DataFrame = {
    // Action lines render through to_json so ids (arbitrary user
    // strings in ENS-land) and the index name are escaped correctly.
    // Null ids/payloads must FAIL the job, not render: a null
    // null-propagates through concat into a blank line, and ES's
    // _bulk parser rejects the ENTIRE request on one malformed
    // action/metadata line — a whole sync batch lost to one bad row,
    // silently at write time (r12 review). raise_error sits inside
    // the expression tree, so column pruning cannot drop the check.
    val idSafe = when(col(idCol).isNull, raise_error(lit(
        s"EsBulk: null $idCol would render a malformed bulk action line")))
      .otherwise(col(idCol).cast("string"))
    def action(op: String): Column = to_json(struct(
      struct(lit(index).as("_index"), idSafe.as("_id")).as(op)))
    val act = when(col(opCol) === "insert", action("index"))
      .otherwise(action("update"))
    val doc = when(col(opCol) === "insert", to_json(payload))
      .when(col(opCol) === "update", to_json(struct(payload.as("doc"))))
      .otherwise(lit("""{"doc":{"archived":true}}"""))
    val docSafe = when(doc.isNull, raise_error(lit(
        "EsBulk: null payload on an insert/update row would render a " +
          "malformed bulk document line"))).otherwise(doc)
    ops.filter(col(opCol).isin("insert", "update", "archive"))
      .select(concat(act, lit("\n"), docSafe).as("value"))
  }

  /** Write bulk files for a batch diff. `files > 0` coalesces to that
    * many output files; the default keeps the upstream partitioning
    * (one file per partition — the scalable path). */
  def write(ops: DataFrame, index: String, idCol: String, opCol: String,
            payload: Column, path: String, files: Int = 0): Unit = {
    val lines = bulkLines(ops, index, idCol, opCol, payload)
    (if (files > 0) lines.repartition(files) else lines)
      .write.mode("overwrite").text(path)
  }
}
