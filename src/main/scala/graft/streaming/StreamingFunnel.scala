package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dual of [[graft.operators.Analytics.funnel]]: a per-user
  * monotone stage frontier. As events arrive, a user advances to stage
  * i+1 on the first event of that stage type strictly after their stage-i
  * time; each advancement is emitted as one (user, stage, ts) row.
  *
  * Semantics vs the batch funnel: identical when events arrive in
  * event-time order across micro-batches (each batch is sorted by ts
  * internally, so intra-batch disorder is handled); a cross-batch
  * straggler that lands BEFORE the already-reached frontier cannot
  * rewind it — the frontier is monotone, exactly like a watermark. At
  * scale, state is O(stages) per live user and keys hash-partition
  * across executors; pair with a state TTL in an always-on deployment.
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, event_type: String, ts: Long)
  case class FunnelState(times: List[Long])
  case class StageReached(user_id: Long, stage: Int, ts: Long)

  def stageProgress(spark: SparkSession, events: Dataset[FunnelEvent],
                    stages: Seq[String]): Dataset[StageReached] = {
    require(stages.nonEmpty && stages.distinct == stages,
      "funnel stages must be non-empty and distinct")
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
          OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (user, batch, state: GroupState[FunnelState]) =>
          var times = state.getOption.map(_.times).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[StageReached]
          // sort the batch by event time (ties by type for determinism):
          // within one micro-batch, arrival order is partition luck
          batch.toSeq.sortBy(e => (e.ts, e.event_type)).foreach { e =>
            stageIdx.get(e.event_type).foreach { idx =>
              if (idx == times.length && (times.isEmpty || e.ts > times.head)) {
                times = e.ts :: times // head = latest reached stage time
                out += StageReached(user, idx + 1, e.ts)
              }
            }
          }
          if (times.nonEmpty) state.update(FunnelState(times))
          out.iterator
      }
  }
}
