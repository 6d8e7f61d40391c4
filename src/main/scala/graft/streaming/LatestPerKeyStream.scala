package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST2/ST4 — the reference's stock-polling loop as a real stream (ref:
  * goods_stock_pipeline.py:135-140, 10-minute cron append;
  * dashboard.py:104-119 "current stock" = latest row per
  * (event_id, theater_name)).
  *
  * Batch W1 gives latest-per-key over history; the streaming dual keeps
  * only the current winner per key in state and emits an update whenever a
  * newer observation arrives. `dropDuplicates` can't express "keep
  * latest", so this is the one genuinely stateful operator:
  * `flatMapGroupsWithState` in Update mode.
  *
  * Scale: state is one row per live (event, theater) key — bounded by the
  * active-event dimension (ST6 expiry = state TTL in a real deployment);
  * keys hash-partition across executors, so throughput scales with the
  * cluster, not with history length.
  */
object LatestPerKeyStream {

  case class StockObs(event_id: String, theater_name: String,
                      scraped_at: Long, status: String, quantity: Double)

  /** Generic typed latest-by-version: keep the max-`ver` row per `key`
    * in state, emit an update whenever the key's winner changes — the
    * streaming dual of `Analytics.latestPerKey` for ANY row type whose
    * version is a totally ordered value (use a tuple for tie-broken
    * orderings, mirroring the batch dual's multi-column sort). State is
    * exactly one row per live key regardless of history length.
    */
  def latestByVersion[V, K, O](ds: Dataset[V])(key: V => K, ver: V => O)
      (implicit ke: Encoder[K], ve: Encoder[V], ord: Ordering[O]): Dataset[V] =
    ds.groupByKey(key)
      .flatMapGroupsWithState[V, V](
          OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, batch, state: GroupState[V]) =>
          val candidates = state.getOption.iterator ++ batch
          val winner = candidates.maxBy(ver)
          val isNew = state.getOption.forall(cur =>
            ord.compare(ver(winner), ver(cur)) != 0)
          state.update(winner)
          if (isNew) Iterator.single(winner) else Iterator.empty
      }

  def latestPerKey(spark: SparkSession, obs: Dataset[StockObs]): Dataset[StockObs] = {
    import spark.implicits._
    latestByVersion(obs)(o => (o.event_id, o.theater_name),
                         o => (o.scraped_at, o.status))
  }
}
