package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    // Deliberately a VANILLA driver-shaped session: no UTC pin, no
    // nanosAsLong, default shuffle partitions — the confs the driver
    // may or may not set. entry() must still return rows.
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
