package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dual of [[graft.operators.Analytics.gapFillLocf]]: per-key
  * LOCF gap filling as observations arrive. When a key's next
  * observation lands, the days BETWEEN the stored frontier and it are
  * emitted with the carried value (`is_gap = 1`), then the observation
  * itself (`is_gap = 0`) — so the union of all emissions over a drain
  * is exactly the batch operator's dense spine, and the drained stream
  * hash-compares against the SAME DuckDB oracle as the batch query
  * (`q_timeseries_fill`'s SQL text, the corpus-gate dual pattern).
  *
  * Emissions are FINAL (a (key, day) row is emitted exactly once, when
  * the interval that closes it arrives), which is what lets the drain
  * run `OutputMode.Append` across MULTIPLE micro-batches — cross-batch
  * state carry is therefore part of the oracle-verified surface, not
  * just the spec suite. The frontier is monotone like the funnel's: a
  * cross-batch straggler at-or-before the last seen day cannot rewind
  * it (dropped, spec-pinned); intra-batch disorder is handled by the
  * per-key sort. Days ride as epoch-day ints (a pure function of the
  * DateType column) so the state row is 12 bytes per live key —
  * O(keys) state, hash-partitioned across executors; pair with a state
  * TTL in an always-on deployment exactly like the funnel.
  */
object StreamingGapFill {

  case class Obs(key: Long, day: Int, v: Double)
  case class FillState(day: Int, v: Double)
  case class Filled(key: Long, day: Int, v: Double, is_gap: Int)

  def filled(spark: SparkSession, obs: Dataset[Obs]): Dataset[Filled] = {
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[FillState, Filled](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (k, batch, state: GroupState[FillState]) =>
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Filled]
          // within one micro-batch, arrival order is partition luck —
          // sort by day (input is unique per (key, day): aggregate first)
          batch.toSeq.sortBy(_.day).foreach { o =>
            cur match {
              case Some(FillState(pd, pv)) if o.day > pd =>
                ((pd + 1) until o.day).foreach { g =>
                  out += Filled(k, g, pv, 1)
                }
                out += Filled(k, o.day, o.v, 0)
                cur = Some(FillState(o.day, o.v))
              case Some(_) =>
                // straggler at or before the frontier: monotone, no rewind
                ()
              case None =>
                out += Filled(k, o.day, o.v, 0)
                cur = Some(FillState(o.day, o.v))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
