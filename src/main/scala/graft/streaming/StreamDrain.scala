package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Drains a BOUNDED file-backed stream through a streaming operator and
  * returns the sink contents as a batch DataFrame — the harness that
  * promotes streaming components to the DuckDB-oracle evidence tier
  * (round-4 verdict #4): the driver's correctness gate hash-compares a
  * drained streaming run against the same SQL oracle as the batch dual,
  * instead of trusting ScalaTest specs alone.
  *
  * `Trigger.AvailableNow` processes every file present then stops, so
  * the call is deterministic for a static directory. `outputMode` picks
  * the agreement surface: `append` compares the emitted-row set,
  * `complete` compares the final state. No checkpoint location is set
  * on purpose — each drain is a fresh end-to-end replay (a persisted
  * checkpoint would make the second run a no-op and the gate would
  * compare an empty sink). Production deployments run the same
  * operators with `start()` plus a durable checkpoint dir; only the
  * sink and trigger differ.
  */
object StreamDrain {
  def drain(spark: SparkSession, path: String, schema: StructType,
            name: String, outputMode: String)
           (op: DataFrame => DataFrame): DataFrame = {
    // the testdata tables are single parquet FILES; FileStreamSource
    // accepts only directories or globs, so wrap the file name in a
    // one-member {} glob — the source then lists exactly that file and
    // infers the (directory) basePath from the glob's parent
    val p = new org.apache.hadoop.fs.Path(path)
    val globbed = s"${p.getParent}/{${p.getName}}"
    // Stateful-operator partition count is pinned at query start from
    // spark.sql.shuffle.partitions (streaming plans skip AQE), and every
    // state store pays per-commit file I/O EVERY micro-batch regardless
    // of row volume — a stream-stream join carries 4 stores per
    // partition, so the session's batch-tuned fan-out of 32 costs 128
    // commits per batch of fixed overhead against the bounded testdata.
    // The drain pins a smaller fan-out for the harness run and restores
    // the session conf after; a production deployment sizes this to key
    // cardinality exactly like batch shuffle partitions.
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "8")
    try {
      val q = op(spark.readStream.schema(schema).parquet(globbed))
        .writeStream.format("memory").queryName(name)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        // AvailableNow self-terminates; the bound turns a wedged stream
        // into a loud failure instead of a silently hung gate
        if (!q.awaitTermination(600000L))
          throw new IllegalStateException(
            s"stream drain '$name' did not terminate within 600s")
      } finally if (q.isActive) q.stop()
    } finally spark.conf.set(key, saved)
    spark.table(name)
  }
}
