package graft.tools

import org.apache.spark.sql.SparkSession

/** Duplicate-subplan audit: for every registered query, count how many
  * times each parquet table is scanned in the optimized physical plan.
  *
  * Motivation (round 14, a41): Catalyst does not dedupe common
  * subplans across join/union inputs, so a frame consumed by two
  * branches re-executes its whole upstream — including any expensive
  * per-row expression — once per branch. A table scanned N times is
  * not automatically wrong (incremental operators legitimately read a
  * table as both "existing" and "incoming"; dims re-scan cheaply),
  * but every count is worth an explanation. This tool prints the
  * per-query scan counts sorted by the worst table, so the audit is
  * one diff against the previous run instead of 141 hand-checks.
  *
  * Usage: sbt 'runMain graft.tools.ScanAudit [minCount]'
  *   minCount (default 3): only print queries where some table is
  *   scanned at least this many times.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val minCount = args.headOption.map(_.toInt).getOrElse(3)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val tables = graft.Tables.all
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // executedPlan: scan counts are fixed at planning time (AQE
        // re-plans exchanges, never scan counts). NOT fully lazy,
        // though: queries containing eager .cut() localCheckpoints
        // execute their upstream-of-cut jobs at plan-construction
        // time, and scans BELOW a cut vanish from the counts (the
        // cut surfaces as a scan-free LogicalRDD leaf) — so the audit
        // measures the post-cut plan, and a cut frame must not be
        // misread as a pruned one.
        val p = fn(s, d).queryExecution.executedPlan.toString
        val counts = tables.map { t =>
          t -> p.linesIterator.count(l =>
            l.contains("FileScan parquet") && l.contains(s"/$t.parquet"))
        }.filter(_._2 > 0)
        val worst = counts.map(_._2).foldLeft(0)(math.max)
        if (worst >= minCount) {
          flagged += 1
          val desc = counts.filter(_._2 >= 2)
            .map { case (t, c) => s"$t x$c" }.mkString(", ")
          println(f"[scan-audit] $name%-30s $desc")
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[scan-audit] $name PLAN FAILED: ${e.getMessage}")
      }
    }
    println(s"[scan-audit] done: $flagged queries with a table scanned >= $minCount times")
    s.stop()
  }
}
