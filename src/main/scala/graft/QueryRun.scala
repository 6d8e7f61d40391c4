package graft
import org.apache.spark.sql.SparkSession

/** Dev main: run ONE named SparkEntry query under the BENCH session
  * config (AQE on) and surface its full stack trace — for chasing
  * failures that only reproduce outside Verify's config. Usage:
  *   sbt "runMain graft.QueryRun q_name [sfDir]"
  */
object QueryRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(s"QUERY_OK $name")
    } finally graft.operators.OpCache.clear()
    spark.stop()
  }
}
