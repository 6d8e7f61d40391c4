package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Tables.all.foreach(n => Tables.load(spark, dir, n).count())
    def time(name: String, reps: Int = 3): Unit =
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"$name rep$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    time("q_dedup_minhash_lsh")
    time("q_text_langid")
    time("q_sim_ann_lsh")
    spark.stop()
  }
}
