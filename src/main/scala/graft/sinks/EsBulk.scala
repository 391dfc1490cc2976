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
    val action = when(col(opCol) === "insert",
        concat(lit(s"""{"index":{"_index":"$index","_id":""""),
          col(idCol).cast("string"), lit("\"}}")))
      .otherwise(
        concat(lit(s"""{"update":{"_index":"$index","_id":""""),
          col(idCol).cast("string"), lit("\"}}")))
    val doc = when(col(opCol) === "insert", to_json(payload))
      .when(col(opCol) === "update",
        concat(lit("""{"doc":"""), to_json(payload), lit("}")))
      .otherwise(lit("""{"doc":{"archived":true}}"""))
    ops.filter(col(opCol).isin("insert", "update", "archive"))
      .select(concat(action, lit("\n"), doc).as("value"))
  }

  /** Write bulk files for a batch diff. */
  def write(ops: DataFrame, index: String, idCol: String, opCol: String,
            payload: Column, path: String, files: Int = 1): Unit =
    bulkLines(ops, index, idCol, opCol, payload)
      .repartition(files)
      .write.mode("overwrite").text(path)
}
