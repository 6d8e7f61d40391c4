package graft.operators

import org.apache.spark.sql.DataFrame

/** Stage-shape helpers. */
object Stage {

  /** Spread a lambda-heavy narrow stage across the cluster when the source
    * collapses to fewer partitions than the configured parallelism.
    *
    * A small unsplittable source (a single parquet row group, a tiny dim
    * file) gives the whole pre-shuffle pipeline ONE task, so per-row work
    * (tokenize→shingle→hash chains, fixed-point vector conversion) runs
    * single-threaded no matter how many cores exist. One cheap exchange of
    * the narrow input rows unlocks every core. No-op when the scan is
    * already parallel (the 100 TB case: thousands of splittable files),
    * so this never adds a shuffle where scale already provides
    * parallelism.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
