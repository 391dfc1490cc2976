package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The composed pipeline — every stage of the reference
    * flow in one plan — is the strongest single smoke signal. */
  def entry(spark: SparkSession): DataFrame =
    queries("p1_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GroupA.queries ++ graft.queries.GroupA2.queries ++
      graft.queries.GroupA3.queries ++ graft.queries.GroupA4.queries ++
      graft.queries.GroupA5.queries ++
      graft.queries.GroupB.queries ++ graft.queries.GroupC.queries ++
      graft.queries.GroupC2.queries ++
      graft.queries.GroupD.queries ++ graft.queries.GroupE.queries ++
      graft.queries.GroupF.queries ++ graft.queries.GroupF2.queries ++
      graft.queries.GroupG.queries ++ graft.queries.GroupG2.queries ++
      graft.queries.GroupH.queries ++ graft.queries.GroupP.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.GroupA.oracles ++ graft.queries.GroupA2.oracles ++
      graft.queries.GroupA3.oracles ++ graft.queries.GroupA4.oracles ++
      graft.queries.GroupA5.oracles ++
      graft.queries.GroupB.oracles ++ graft.queries.GroupC.oracles ++
      graft.queries.GroupC2.oracles ++
      graft.queries.GroupD.oracles ++ graft.queries.GroupE.oracles ++
      graft.queries.GroupF.oracles ++ graft.queries.GroupF2.oracles ++
      graft.queries.GroupG.oracles ++ graft.queries.GroupG2.oracles ++
      graft.queries.GroupH.oracles ++ graft.queries.GroupP.oracles
}
