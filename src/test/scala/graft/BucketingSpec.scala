package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the storage-level answer to repeated
  * large-table joins at 100 TB: both sides pre-hashed into the same
  * bucket count on the join key, so the join needs NO shuffle exchange.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("equal-bucketed tables join without a shuffle exchange") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1L to 1000L).map(k => (k, s"order$k")).toDF("k", "o")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("orders_bkt")
      (1L to 5000L).map(i => (i % 1000 + 1, i)).toDF("k", "li")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("lineitem_bkt")

      val joined = spark.table("lineitem_bkt").join(spark.table("orders_bkt"), "k")
      assert(joined.count() == 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffled:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
