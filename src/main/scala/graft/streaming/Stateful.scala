package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** J8 — arbitrary stateful processing: the streaming form of CDC
  * materialization (graft.cdc.Materialize is the batch spec).
  *
  * Keyed upsert state machine over flattened change events:
  * per key keep (version, payload); an event applies iff its version is
  * newer; a delete clears state. State lives in Spark's per-partition
  * state stores (RocksDB-backed on a real cluster) and is the reason this
  * scales: state is sharded by key hash across executors, never
  * collected.
  */
object Stateful {

  /** One flattened change event: key, monotonically increasing version
    * (lsn), op in {c,u,d,r}, and an opaque JSON payload for the row image.
    */
  case class Change(key: Long, version: Long, op: String, payload: String)

  /** Current state per key. */
  case class KeyState(version: Long, payload: String)

  /** Emitted upsert view after each update. */
  case class Upsert(key: Long, version: Long, payload: String, deleted: Boolean)

  private def applyChanges(key: Long, changes: Iterator[Change],
                           state: GroupState[KeyState]): Iterator[Upsert] = {
    // replay in version order; late/duplicate versions are ignored
    val sorted = changes.toSeq.sortBy(_.version)
    var cur = state.getOption
    var emitted: Option[Upsert] = None
    sorted.foreach { c =>
      if (cur.forall(_.version < c.version)) {
        if (c.op == "d") {
          cur = None
          emitted = Some(Upsert(key, c.version, null, deleted = true))
        } else {
          cur = Some(KeyState(c.version, c.payload))
          emitted = Some(Upsert(key, c.version, c.payload, deleted = false))
        }
      }
    }
    cur match {
      case Some(s) => state.update(s)
      case None    => state.remove()
    }
    emitted.iterator
  }

  /** Streaming keyed upsert via flatMapGroupsWithState. Output mode:
    * Update. Works on batch Datasets too (state starts empty), which is
    * how the differential test pins it to Materialize.changelog.
    */
  def upsertStream(changes: Dataset[Change]): Dataset[Upsert] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(applyChanges)
  }

  /** Convenience: run the upsert over a batch frame of change events and
    * return the final materialized table (deleted keys absent) — must
    * equal Materialize.changelog on the same input.
    */
  def materializeBatch(changes: Dataset[Change]): DataFrame = {
    import changes.sparkSession.implicits._
    upsertStream(changes)
      .filter(!_.deleted)
      .toDF()
  }
}
