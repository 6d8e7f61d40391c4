package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: steady-state timing / plan dumps for named queries.
  * Usage: runMain graft.Profile [sfDir] [reps] [query ...]
  * (no queries → all; add -explain to print formatted plans instead)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(2)
    val rest = args.drop(2).toSeq
    val explain = rest.contains("-explain")
    val names = rest.filterNot(_ == "-explain") match {
      case Seq() => SparkEntry.queries.keys.toSeq.sorted
      case qs => qs
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(n => Tables.load(spark, sfDir, n).count())
    for (q <- names) {
      if (explain) {
        println(s"========== $q ==========")
        SparkEntry.queries(q)(spark, sfDir).explain("formatted")
      } else for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
        graft.operators.OpCache.clear()
        println(f"$q rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
