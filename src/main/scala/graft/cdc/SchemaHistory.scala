package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** B17 — the QUERYABLE SCHEMA HISTORY (r17, the r16 verdict's #4):
  * the engine already enforces its DDL posture loudly — the A8 upsert
  * sink widens in place and refuses narrowing/type changes
  * ([[graft.streaming.Sinks]]), the B15 chunk loop pins the snapshot
  * schema and refuses mid-snapshot DDL
  * ([[IncrementalSnapshot]]) — but the decisions themselves vanished
  * into log lines. [PK: Debezium's schema-history topic is also a
  * READABLE record of what changed when — consumers replay it to
  * interpret old events; REF README.md:13.] This module is that record:
  * every pin, widen, and refusal appends one event under the same
  * state root the decision protected, and [[read]] returns the log as
  * a DataFrame.
  *
  * Layout: `<root>/_schema_history/<seq>.json`, ONE file per event,
  * written tmp-then-rename — an append either completes or leaves only
  * a `.tmp` the reader ignores, so the readable log never contains a
  * torn event (crash-window spec-pinned). Schemas are serialized in a
  * CANONICAL form (fields sorted by name, `name type` pairs) so the
  * log is comparable and hash-stable regardless of projection order.
  *
  * Delivery is AT-LEAST-ONCE by design: the widen event lands after
  * the data write and before the schema pin moves, so a crash between
  * the two replays the batch, re-detects the same widening, and
  * appends the same event again — a duplicate row (dedupable on
  * (action, old, new)) rather than a silently missing one, the right
  * trade for an audit log.
  *
  * Scale shape: events are DDL-rate (operator actions), never
  * data-plane volume — appends are one tmp write + rename, [[read]] is
  * a driver FS listing of an O(DDL-count) directory.
  */
object SchemaHistory {

  private val Dir = "_schema_history"

  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Canonical, order-independent rendering of a schema: fields sorted
    * by name, `name type` with Catalyst simple type strings.
    */
  def canonical(st: StructType): String =
    st.fields.sortBy(_.name)
      .map(f => s"${f.name} ${f.dataType.simpleString}").mkString(", ")

  /** Append one event; returns its sequence number. `action` is one of
    * `pin` (first schema recorded), `widen` (columns absorbed in
    * place), `refuse` (restart-level DDL rejected). `nRows` carries the
    * triggering batch's row count where the call site knows it (the
    * data-dependent half of the event).
    */
  def append(spark: org.apache.spark.sql.SparkSession, root: String,
             action: String, oldSchema: Option[StructType],
             newSchema: Option[StructType], nRows: Option[Long] = None,
             tsMs: Long = System.currentTimeMillis): Long = {
    val fs = fsOf(spark, root)
    val dir = new Path(root, Dir)
    fs.mkdirs(dir)
    // the event file is append-only: NEVER delete-then-rename over an
    // existing slot (a seq race would silently overwrite history) —
    // a failed rename means a rival claimed the number; take the next
    var seq = nextSeq(spark, root)
    var renamed = false
    while (!renamed) {
      val node = mapper.createObjectNode()
      node.put("seq", seq)
      node.put("ts_ms", tsMs)
      node.put("action", action)
      oldSchema.foreach(s => node.put("old_schema", canonical(s)))
      newSchema.foreach(s => node.put("new_schema", canonical(s)))
      nRows.foreach(n => node.put("n_rows", n))
      val name = f"$seq%010d.json"
      val tmp = new Path(dir, name + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
      finally out.close()
      val main = new Path(dir, name)
      renamed = !fs.exists(main) && fs.rename(tmp, main)
      if (!renamed) seq += 1
    }
    seq
  }

  private def nextSeq(spark: org.apache.spark.sql.SparkSession,
                      root: String): Long = {
    val fs = fsOf(spark, root)
    val dir = new Path(root, Dir)
    if (!fs.exists(dir)) 0L
    else {
      val ns = fs.listStatus(dir)
        .filter(_.getPath.getName.endsWith(".json"))
        .flatMap(s => scala.util.Try(
          s.getPath.getName.stripSuffix(".json").toLong).toOption)
      if (ns.isEmpty) 0L else ns.max + 1L
    }
  }

  /** The event schema [[read]] and [[stream]] share. */
  val eventSchema: StructType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("seq",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts_ms",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("action",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("old_schema",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("new_schema",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_rows",
      org.apache.spark.sql.types.LongType)))

  /** The history as a LIVE STREAM [PK: consumers replay Debezium's
    * schema-history topic as a stream to interpret old events]: one
    * file per event makes the log a natural Structured Streaming file
    * source — every append is a new file the stream picks up in its
    * next micro-batch, and the glob keeps in-flight `.tmp` appends
    * invisible here exactly as in [[read]].
    */
  def stream(spark: org.apache.spark.sql.SparkSession,
             root: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .option("pathGlobFilter", "*.json")
      .json(s"$root/$Dir")

  /** The log as a DataFrame — `(seq, ts_ms, action, old_schema,
    * new_schema, n_rows)` — complete events only (a torn `.tmp` from a
    * crashed append is invisible). Driver FS reads; no Spark job until
    * the caller acts on the frame.
    */
  def read(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, root)
    val dir = new Path(root, Dir)
    val events: Seq[(Long, Long, String, String, String, Option[Long])] =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir)
        .filter(_.getPath.getName.endsWith(".json"))
        .sortBy(_.getPath.getName)
        .map { s =>
          val in = fs.open(s.getPath)
          val txt = try new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          finally in.close()
          val n = mapper.readTree(txt)
          def str(f: String) = Option(n.get(f)).map(_.asText()).orNull
          (n.get("seq").asLong(), n.get("ts_ms").asLong(), str("action"),
            str("old_schema"), str("new_schema"),
            Option(n.get("n_rows")).map(_.asLong()))
        }.toSeq
    events.toDF("seq", "ts_ms", "action", "old_schema", "new_schema", "n_rows")
  }
}
