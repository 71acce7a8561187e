package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Debezium-style change-event envelope and its single-event operators.
  *
  * The reference (/root/reference/README.md:13) describes itself as a "low
  * latency data streaming platform for change data capture (CDC)"; the
  * envelope layout below is the publicly documented Debezium event shape
  * (before/after row images + source provenance + op + ts_ms) that the
  * connectors hosted in that repo (Cassandra, Db2, Oracle —
  * README.md:21-23) all emit. Graft consumes such streams; it does not
  * mine database logs.
  *
  * All operators are narrow (per-row projections/filters) — they fuse into
  * the scan under whole-stage codegen and add zero shuffles, so a CDC
  * flatten over 100 TB is exactly one pass.
  */
object Envelope {

  /** Source-provenance block carried by every event. */
  val sourceSchema: StructType = StructType(Seq(
    StructField("connector", StringType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("lsn", LongType),
    StructField("snapshot", BooleanType),
    StructField("ts_ms", LongType)))

  /** Full envelope schema for a given row-image schema. */
  def schema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema, nullable = true),
    StructField("after", rowSchema, nullable = true),
    StructField("source", sourceSchema, nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("ts_ms", LongType, nullable = true)))

  /** B1 — parse a raw JSON `value` column (e.g. a Kafka message body) into
    * typed envelope columns. `from_json` is a Catalyst expression: combined
    * with Spark's JSON struct-field pruning, only referenced fields are
    * actually parsed.
    */
  def parse(df: DataFrame, rowSchema: StructType, valueCol: String = "value"): DataFrame =
    df.withColumn("e", from_json(col(valueCol).cast("string"), schema(rowSchema)))
      .select(col("e.*"))

  /** B14 — Kafka TOMBSTONE handling: a record with a key and a NULL
    * value is the compaction tombstone Debezium emits after every
    * delete (so a compacted topic eventually drops the key). A
    * tombstone-only pipeline (some deployments suppress the delete
    * envelope and keep just the tombstone) must still materialize
    * deletes from them; a naive `parse` would silently turn every
    * tombstone into an all-null row and the delete would be LOST.
    *
    * Non-null values parse as envelopes; null-value records become
    * synthetic delete envelopes — every payload field null, `op` =
    * `deleteOp` — with the record key and any pass-through columns
    * (Kafka timestamp/offset, which order the delete against the
    * key's other changes) preserved. One pass, two fused projections,
    * zero shuffles.
    */
  def parseWithTombstones(df: DataFrame, rowSchema: StructType,
                          keyCol: String = "key", valueCol: String = "value",
                          deleteOp: String = "d"): DataFrame = {
    require(df.columns.contains(keyCol),
      s"parseWithTombstones: key column '$keyCol' not present " +
        s"(have: ${df.columns.mkString(", ")}) — a tombstone is addressed " +
        "by its key; without one the delete cannot be materialized")
    val sch = schema(rowSchema)
    val parsed = from_json(col(valueCol).cast("string"), sch)
    val tombstone = struct(
      lit(null).cast(rowSchema).as("before"),
      lit(null).cast(rowSchema).as("after"),
      lit(null).cast(sourceSchema).as("source"),
      lit(deleteOp).as("op"),
      lit(null).cast("long").as("ts_ms"))
    // A NULL-keyed tombstone is unaddressable — fail loudly instead of
    // emitting a delete nobody can apply. The guard wraps the carried
    // key column itself, so column pruning can never drop it.
    val guardedKey = when(col(valueCol).isNull && col(keyCol).isNull,
        raise_error(lit("parseWithTombstones: tombstone record with a " +
          s"NULL '$keyCol' — the delete has no addressable key")))
      .otherwise(col(keyCol)).as(keyCol)
    val carry = df.columns.filterNot(_ == valueCol).toSeq
      .map(c => if (c == keyCol) guardedKey else col(c))
    df.withColumn("e",
        when(col(valueCol).isNotNull, parsed).otherwise(tombstone))
      .select(carry :+ col("e.*"): _*)
  }

  /** B13 — production parse with a DEAD-LETTER route: malformed
    * envelopes (a truncated Kafka record, a producer bug, a schema the
    * registry never saw) must never be dropped silently NOR poison the
    * typed stream. `from_json` yields a NULL struct for unparseable
    * input; this splits on that — (parsed frame, dead-letter frame) —
    * with the dead letters carrying the ORIGINAL raw value for
    * quarantine/replay. Both frames are narrow projections of one pass
    * (the filter fuses into the scan; zero shuffles), so routing costs
    * nothing at any scale.
    *
    * Detection is the corrupt-record-column idiom, NOT a null check:
    * `from_json` in PERMISSIVE mode materializes an all-null struct for
    * unparseable input (indistinguishable from a legitimately sparse
    * envelope), but with `columnNameOfCorruptRecord` in the schema the
    * raw text lands in that field EXACTLY when parsing failed.
    */
  def parseWithDeadLetter(df: DataFrame, rowSchema: StructType,
                          valueCol: String = "value"): (DataFrame, DataFrame) = {
    val corruptCol = "_graft_corrupt"
    val sch = schema(rowSchema).add(corruptCol, org.apache.spark.sql.types.StringType)
    val parsed = df.withColumn("e",
      from_json(col(valueCol).cast("string"), sch,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)))
    (parsed.where(col(s"e.$corruptCol").isNull).select(col("e.*")).drop(corruptCol),
      parsed.where(col(s"e.$corruptCol").isNotNull).select(col(valueCol)))
  }

  /** A4 — Kafka CDC source entry point: subscribe to a topic of envelope
    * JSON and parse into typed columns. This is the north star's
    * "Structured Streaming + Kafka source" composition; it compiles
    * against the Kafka source options and needs only the
    * `spark-sql-kafka` connector on the classpath at runtime (none — and
    * no broker — exists in this rig, so the transform chain is
    * batch-equivalence-tested through [[cdcFileStream]], which shares the
    * exact same `value`-column contract and parse path).
    */
  def cdcStream(spark: org.apache.spark.sql.SparkSession, bootstrapServers: String,
                topic: String, rowSchema: StructType,
                startingOffsets: String = "earliest",
                failOnDataLoss: Boolean = true): DataFrame = {
    // failOnDataLoss defaults TRUE (the Kafka source default): a CDC
    // consumer that silently skips expired offsets loses deletes/updates
    // and permanently corrupts the materialized table. Callers opt into
    // lossy resumption explicitly.
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
      .load()
    parse(raw, rowSchema) // Kafka's binary `value` casts to string inside parse
  }

  /** A4/A5 — broker-less stand-in with the identical downstream contract:
    * a directory watch of JSON-lines envelope files surfaces the same
    * `value` column the Kafka source emits, then the same parse path.
    */
  def cdcFileStream(spark: org.apache.spark.sql.SparkSession, watchDir: String,
                    rowSchema: StructType): DataFrame =
    parse(spark.readStream.format("text").load(watchDir), rowSchema)

  /** B2 — ExtractNewRecordState: unwrap `after.*` and keep op metadata.
    * Deletes are rewritten to their `before` image with `__deleted = true`
    * (the documented rewrite mode of the SMT) so downstream consumers see
    * one flat schema.
    */
  def extractNewRecordState(df: DataFrame): DataFrame = {
    val img = when(col("op") === "d", col("before")).otherwise(col("after"))
    val withLsn = if (df.columns.contains("source")) df.withColumn("__lsn", col("source.lsn"))
                  else df.withColumn("__lsn", lit(null).cast(LongType))
    withLsn.where(col("op").isNotNull) // drop tombstones
      .withColumn("__img", img)
      .select(col("__img.*"),
        col("op").as("__op"),
        col("ts_ms").as("__ts_ms"),
        col("__lsn"),
        (col("op") === "d").as("__deleted"))
  }

  /** B3 — keep only the given op kinds; optionally drop tombstones
    * (null op + null after).
    */
  def filterOps(df: DataFrame, ops: Seq[String], dropTombstones: Boolean = true): DataFrame = {
    val base = df.where(col("op").isin(ops: _*))
    // tombstone = null op AND null after; only meaningful on envelope frames
    if (dropTombstones && df.columns.contains("after"))
      base.where(col("op").isNotNull || col("after").isNotNull)
    else base
  }

  /** B19 (r19) — TRUNCATE routing for sinks that cannot apply one. [PK:
    * Debezium emits `op='t'` for TRUNCATE on supported connectors; a
    * truncate has no images and no key.] The upsert sinks clear the
    * key-space at the truncate's version
    * (graft.streaming.Sinks.applyUpsertBatchWithTruncates;
    * Materialize.changelogWithTruncates is the batch spec) — but a sink
    * whose state is not un-foldable key-space (the rollup sink's count
    * partials, an append-only export) CANNOT honor one. Dropping it
    * silently would leave the downstream table claiming rows the source
    * no longer has, so the unsupported path is the same as a torn
    * envelope's: split it out and QUARANTINE it on the B13 dead-letter
    * route, where an operator decides (rebuild the rollup, re-snapshot).
    * Both frames are fused filters of one pass — zero shuffles.
    */
  def splitTruncates(df: DataFrame, opCol: Column = col("op"),
                     truncateOp: String = "t"): (DataFrame, DataFrame) =
    (df.where(opCol =!= truncateOp || opCol.isNull),
      df.where(opCol === truncateOp))

  /** B4 — topic/table router: regex rewrite of the source table name into a
    * route column (write-side `partitionBy("route")` gives physical
    * routing; at scale this is how one stream fans out to N tables without
    * N scans).
    */
  def route(df: DataFrame, pattern: String, replacement: String,
            tableCol: Column = col("source.table")): DataFrame =
    df.withColumn("route", regexp_replace(tableCol, pattern, replacement))

  /** B10 — field masking (the MaskField/pseudonymization SMT family):
    * PII columns are either nulled (`hashSalt = None`) or replaced by a
    * salted SHA-256 (deterministic pseudonymization — equal inputs map to
    * equal tokens, so masked columns remain joinable/groupable across
    * tables, the property GDPR-style pipelines rely on). A narrow
    * projection: fuses into the scan, zero shuffles at any scale.
    */
  def maskFields(df: DataFrame, cols: Seq[String],
                 hashSalt: Option[String] = None): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      hashSalt match {
        case Some(salt) =>
          d.withColumn(c, sha2(concat(lit(salt), col(c).cast(StringType)), 256))
        case None =>
          d.withColumn(c, lit(null).cast(d.schema(c).dataType))
      }
    }

  /** B7 — outbox router: an events table with a JSON payload column becomes
    * routed domain events (payload parsed, route derived from the
    * aggregate type).
    */
  def outbox(events: DataFrame, payloadCol: String, payloadSchema: StructType,
             routeExpr: Column): DataFrame =
    events
      .withColumn("payload", from_json(col(payloadCol), payloadSchema))
      .withColumn("route", routeExpr)

  /** B8 — transaction assembly: per-transaction boundaries and event counts
    * (the Debezium transaction-metadata topic equivalent, derived from the
    * event stream itself).
    */
  def transactionSummary(df: DataFrame, txCol: Column, tsCol: Column): DataFrame =
    df.groupBy(txCol.as("tx_id"))
      .agg(
        count(lit(1)).as("event_count"),
        min(tsCol).as("first_ts"),
        max(tsCol).as("last_ts"))
}
