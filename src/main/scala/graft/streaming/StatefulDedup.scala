package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming exact-dedup: first occurrence of each content hash
  * passes, later duplicates are dropped — the streaming twin of
  * `TrainingOps.dedupExactSurvivors`, built on
  * `KeyValueGroupedDataset.flatMapGroupsWithState` (the brief's custom-state
  * primitive).
  *
  * State per key is a single boolean ("seen"), so state size is bounded by
  * distinct-hash cardinality; production deployments bound it further with
  * a processing-time timeout (`stateTtl`).
  */
object StatefulDedup {

  final case class HashedDoc(doc_id: String, h: Long)

  /** Emit only first-seen docs per hash. Deterministic within a micro-batch:
    * the smallest doc_id of a batch's new-hash group wins (groups are
    * unordered, so we pin a total order instead of taking iterator order). */
  def firstSeen(spark: SparkSession, docs: Dataset[HashedDoc],
      stateTtl: String = ""): Dataset[HashedDoc] = {
    import spark.implicits._
    val timeout =
      if (stateTtl.isEmpty) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.ProcessingTimeTimeout()
    docs.groupByKey(_.h)
      .flatMapGroupsWithState[Boolean, HashedDoc](
        OutputMode.Append(), timeout) {
        (h: Long, rows: Iterator[HashedDoc], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists || rows.isEmpty) Iterator.empty
          else {
            state.update(true)
            if (stateTtl.nonEmpty) state.setTimeoutDuration(stateTtl)
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }
}
