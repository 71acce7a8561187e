package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A8 — `foreachBatch` upsert sink: the standard way a CDC consumer applies
  * a change stream to a queryable target table (the reference's whole
  * purpose per /root/reference/README.md:13 is feeding such consumers).
  *
  * Target layout: parquet partitioned by a hash bucket of the key
  * (`__kb`), so each micro-batch rewrites ONLY the buckets it touches
  * (dynamic partition overwrite) and reads back only those buckets
  * (partition-pruned scan) — at 100 TB the per-batch cost is proportional
  * to the touched working set, not the table. On a lakehouse table format
  * this whole function is a single MERGE INTO; plain parquet needs the
  * read-merge-overwrite cycle below.
  *
  * The stored state keeps the latest event per key INCLUDING delete
  * tombstones, so a replayed or out-of-order batch can never resurrect a
  * deleted key; readers get live rows via [[currentState]]. Re-applying a
  * batch is idempotent (latest-version-wins), which is exactly what
  * foreachBatch's at-least-once contract requires for end-to-end
  * exactly-once tables.
  */
object Sinks {

  /** Rows-per-bucket target for auto bucket sizing: small enough that a
    * bucket rewrite is one task's worth of work, large enough that file
    * counts stay sane (100 TB / 64k-row buckets of ~1 KB rows ≈ 1.6M
    * buckets — cap at 65536 and revisit the layout if you hit it).
    */
  private val RowsPerBucket = 65536L
  private val MaxAutoBuckets = 65536

  /** The bucket count is part of the TABLE layout, not the batch: if two
    * batches bucketed a key differently, the merge would read the wrong
    * bucket and resurrect stale rows. First write pins the choice in a
    * sidecar file; every later batch (and any caller-supplied value) must
    * match it.
    */
  private def metaPath(targetDir: String) = new Path(targetDir, "_graft_buckets")

  private def readPinnedBuckets(fs: org.apache.hadoop.fs.FileSystem,
                                targetDir: String): Option[Int] = {
    val p = metaPath(targetDir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  private def writePinnedBuckets(fs: org.apache.hadoop.fs.FileSystem,
                                 targetDir: String, n: Int): Unit = {
    val out = fs.create(metaPath(targetDir), true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Resolve the table's bucket count: pinned value wins (a mismatched
    * explicit ask is an error); otherwise pin the caller's value or
    * auto-size from `rows` (evaluated lazily — only on first write).
    *
    * If bucketed data (`__kb=` dirs) already exists but the sidecar is
    * missing (a table written by older code, or a lost sidecar), blindly
    * auto-pinning a FRESH count would hash batch rows under the new count
    * while stored rows keep the old layout — touched-bucket pruning would
    * then miss the stored row for a key and the merge would silently
    * resurrect stale rows. That case REFUSES auto-sizing: the caller must
    * pass the table's real bucket count explicitly (which is then pinned).
    */
  private def resolvePinnedBuckets(fs: org.apache.hadoop.fs.FileSystem,
                                   targetDir: String, nBuckets: Int,
                                   rows: => Long): Int =
    readPinnedBuckets(fs, targetDir) match {
      case Some(p) =>
        require(nBuckets == 0 || nBuckets == p,
          s"table at $targetDir is bucketed with $p buckets; got nBuckets=$nBuckets")
        p
      case None =>
        val tdir = new Path(targetDir)
        val hasBucketDirs = fs.exists(tdir) &&
          fs.listStatus(tdir).exists(_.getPath.getName.startsWith("__kb="))
        require(!hasBucketDirs || nBuckets > 0,
          s"table at $targetDir has existing __kb= bucket directories but no " +
            "_graft_buckets sidecar; refusing to auto-size a fresh bucket count " +
            "over an unknown layout — pass nBuckets matching the existing layout " +
            "explicitly (it will be pinned)")
        val chosen =
          if (nBuckets > 0) nBuckets
          else math.min(math.max(16L, rows / RowsPerBucket + 1),
            MaxAutoBuckets.toLong).toInt
        writePinnedBuckets(fs, targetDir, chosen)
        chosen
    }

  /** The table's pinned SCHEMA sidecar (round 15 — the r14 verdict's #3):
    * a Debezium consumer's most common DDL is an added nullable column,
    * and restart-on-DDL (the declared policy for everything else) forced
    * a full rebuild for it. The pin makes widening absorbable in place:
    * batch schema ⊃ table schema → the new columns join the pinned
    * schema (forced nullable) and untouched buckets simply read as null
    * through the explicit-schema scan below — no rewrite of old files,
    * ONE metadata step. Narrowing (a table column missing from the
    * batch) and type changes REFUSE loudly — those stay restart-level
    * DDL. Readers and the compactor resolve the pinned schema, so a
    * table whose buckets straddle a widening never depends on which
    * parquet footer Spark happens to sample.
    */
  private def schemaPath(targetDir: String) = new Path(targetDir, "_graft_schema")
  private def schemaTmpPath(targetDir: String) = new Path(targetDir, "_graft_schema.tmp")

  /** The pin is re-read through a TMP-then-rename protocol (r15 review):
    * a kill during an in-place overwrite would leave a truncated file
    * that bricks every later read of the table. The writer stages the
    * full content at `.tmp`, deletes the old pin, renames — at every
    * crash point either the old pin, the staged tmp (complete by
    * construction once the rename window opens), or the new pin is
    * readable.
    *
    * The TMP read is LENIENT (r16 advice): a crash mid-write of the
    * FIRST schema pin (no main yet) leaves a partial tmp, and a strict
    * `DataType.fromJson` would then fail every later
    * applyUpsertBatch/currentState call. A malformed tmp degrades to
    * "no pin" — the first-write path simply re-pins from the batch (or
    * the footer schema). The MAIN file stays strict: it only appears
    * via rename of a complete tmp, so a parse failure there is real
    * corruption worth a loud error.
    */
  private def readPinnedSchema(fs: org.apache.hadoop.fs.FileSystem,
                               targetDir: String): Option[org.apache.spark.sql.types.StructType] = {
    def readAt(p: Path, lenient: Boolean): Option[org.apache.spark.sql.types.StructType] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        def parse = org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        if (lenient) scala.util.Try(parse).toOption else Some(parse)
      }
    // main wins; the tmp fallback covers the delete-before-rename window
    readAt(schemaPath(targetDir), lenient = false)
      .orElse(readAt(schemaTmpPath(targetDir), lenient = true))
  }

  private def writePinnedSchema(fs: org.apache.hadoop.fs.FileSystem,
                                targetDir: String,
                                st: org.apache.spark.sql.types.StructType): Unit = {
    val tmp = schemaTmpPath(targetDir)
    val out = fs.create(tmp, true)
    try out.write(st.json.getBytes("UTF-8")) finally out.close()
    val main = schemaPath(targetDir)
    if (fs.exists(main)) fs.delete(main, false)
    fs.rename(tmp, main)
  }

  /** Enforce the schema contract for one upsert batch against the table:
    * returns the (possibly widened) table schema to read existing
    * buckets with, and whether the pin must be rewritten after the data
    * write. Nullability is forced — every stored column is nullable once
    * a widening can backfill nulls.
    */
  private def resolveSchema(fs: org.apache.hadoop.fs.FileSystem,
                            targetDir: String, tableExists: Boolean,
                            batchSchema: org.apache.spark.sql.types.StructType,
                            existingSchema: => org.apache.spark.sql.types.StructType)
  : (org.apache.spark.sql.types.StructType, Boolean) = {
    import org.apache.spark.sql.types._
    // nullability is normalized RECURSIVELY (r15 review): a footer-
    // inferred array/struct column carries containsNull/field-nullable
    // flags an encoder-produced batch may not, and a strict DataType
    // comparison would misreport the identical schema as a type change
    def nullify(dt: DataType): DataType = dt match {
      case ArrayType(e, _)      => ArrayType(nullify(e), containsNull = true)
      case MapType(k, v, _)     => MapType(nullify(k), nullify(v), valueContainsNull = true)
      case StructType(fields)   => StructType(fields.map(f =>
        f.copy(dataType = nullify(f.dataType), nullable = true)))
      case other                => other
    }
    def nullable(st: StructType): StructType =
      nullify(st).asInstanceOf[StructType]
    val b = nullable(batchSchema)
    readPinnedSchema(fs, targetDir)
      .orElse(if (tableExists) Some(nullable(StructType(
        existingSchema.fields.filterNot(_.name == "__kb")))) else None) match {
      case None => (b, true) // first write pins the batch schema
      case Some(ts) =>
        val bByName = b.fields.map(f => f.name -> f).toMap
        val missing = ts.fields.map(_.name).filterNot(bByName.contains)
        require(missing.isEmpty,
          s"upsert batch is missing table columns ${missing.mkString(", ")} at " +
            s"$targetDir — NARROWING is restart-level DDL (rebuild the table " +
            "or project the dropped columns as nulls explicitly)")
        val clashes = ts.fields.flatMap { f =>
          bByName.get(f.name).filter(_.dataType != f.dataType)
            .map(bf => s"${f.name}: table ${f.dataType.simpleString} vs " +
              s"batch ${bf.dataType.simpleString}")
        }
        require(clashes.isEmpty,
          s"upsert batch changes column types at $targetDir — ${clashes.mkString("; ")}: " +
            "type changes are restart-level DDL")
        val newCols = b.fields.filterNot(f => ts.fieldNames.contains(f.name))
        if (newCols.isEmpty) (ts, false)
        else (StructType(ts.fields ++ newCols), true) // WIDEN: absorb in place
    }
  }

  /** Last-applied-batch sidecar: the rollup sink's replay FAST PATH. The
    * authoritative replay guard is the `__bid` column stamped into the
    * bucket data itself (see [[applyRollupBatch]]); the sidecar only
    * short-circuits the common case without reading any bucket. (The
    * upsert sink needs neither — its merge is idempotent.)
    */
  private def lastBatchPath(targetDir: String) = new Path(targetDir, "_graft_last_batch")

  private def readLastBatch(fs: org.apache.hadoop.fs.FileSystem,
                            targetDir: String): Option[Long] = {
    val p = lastBatchPath(targetDir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  private def writeLastBatch(fs: org.apache.hadoop.fs.FileSystem,
                             targetDir: String, id: Long): Unit = {
    val out = fs.create(lastBatchPath(targetDir), true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The layout-column sidecar (r18): `__kb` hashes `bucketCols`, which
    * default to the merge key but may be a SUBSET of it — the
    * cluster-by-join-key layout (e.g. lineitem merged on
    * (orderkey, linenumber) but bucketed by orderkey alone, so the
    * downstream fact join reads co-located buckets). Like the bucket
    * COUNT, the bucket COLUMNS are part of the table layout: a batch
    * hashed on different columns would prune the wrong buckets and
    * resurrect stale rows, so the first write pins the choice and every
    * later batch must match.
    */
  private def bucketColsPath(targetDir: String) =
    new Path(targetDir, "_graft_bucket_cols")

  private def resolveBucketCols(fs: org.apache.hadoop.fs.FileSystem,
                                targetDir: String, keyCols: Seq[String],
                                bucketCols: Seq[String]): Seq[String] = {
    val want = if (bucketCols.isEmpty) keyCols else bucketCols
    require(want.forall(keyCols.contains),
      s"bucketCols (${want.mkString(",")}) must be a subset of keyCols " +
        s"(${keyCols.mkString(",")}): the layout hash must be a pure " +
        "function of the merge key or a key's versions land in different buckets")
    val p = bucketColsPath(targetDir)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val pinned = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.split(",").toSeq
      finally in.close()
      require(pinned == want,
        s"table at $targetDir is bucketed on ${pinned.mkString(",")}; " +
          s"got bucketCols=${want.mkString(",")}")
      pinned
    } else {
      // pinned only when it differs from the default — legacy tables
      // (no sidecar) stay readable as keyCols-bucketed. A NON-default
      // choice may only be pinned on a FRESH table (r18 review): data
      // already bucketed under the keyCols hash re-hashed on a subset
      // would prune the wrong buckets and resurrect stale rows, exactly
      // the drift resolvePinnedBuckets refuses for the bucket COUNT.
      if (want != keyCols) {
        val tdir = new Path(targetDir)
        val hasBucketDirs = fs.exists(tdir) &&
          fs.listStatus(tdir).exists(_.getPath.getName.startsWith("__kb="))
        require(!hasBucketDirs,
          s"table at $targetDir already holds data bucketed on its merge " +
            s"key; refusing to pin bucketCols=${want.mkString(",")} over " +
            "the existing layout — rebuild the table to re-cluster it")
        val out = fs.create(p, true)
        try out.write(want.mkString(",").getBytes("UTF-8")) finally out.close()
      }
      want
    }
  }

  /** Merge one batch of flattened change events into the target.
    * `versionCol` must totally order events per key (e.g. lsn).
    *
    * `nBuckets = 0` (the default) auto-sizes on first write from the
    * batch volume (one bucket per [[RowsPerBucket]] rows, floor 16) and
    * pins the result in the table's `_graft_buckets` sidecar; later
    * batches reuse the pinned value, so the layout never shifts under a
    * live table. At 100 TB pass an explicit count sized from the TABLE
    * (≈ tableRows / 64k) on the first write — the first batch is a poor
    * proxy for eventual volume.
    *
    * `bucketCols` (r18): the layout hash columns — default the merge
    * key; pass a key subset (e.g. just the order key) to co-locate the
    * table for a downstream join. Pinned on first write.
    *
    * File-count note (r19): the merge shuffle is explicitly keyed on the
    * layout column ([[latestByKeyAligned]]), so every rewrite lands ~one
    * file per touched bucket REGARDLESS of how nBuckets relates to
    * `spark.sql.shuffle.partitions` — no alignment arithmetic needed,
    * and [[compact]] is only ever needed for tables fragmented by other
    * writers.
    */
  def applyUpsertBatch(batch: DataFrame, targetDir: String, keyCols: Seq[String],
                       versionCol: String, nBuckets: Int = 0,
                       bucketCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // LAZY (r18): the count is one full batch pass, but it's only needed
    // when auto-sizing fires (first write with nBuckets=0) or a schema
    // event records its triggering volume — the steady path (pinned
    // buckets, stable schema) must not pay a per-micro-batch count job
    lazy val batchRows = batch.count()
    val layoutCols = resolveBucketCols(fs, targetDir, keyCols, bucketCols)
    val n = resolvePinnedBuckets(fs, targetDir, nBuckets, batchRows)
    val tableExists =
      fs.exists(new Path(targetDir, "_SUCCESS")) || (fs.exists(new Path(targetDir)) &&
        fs.listStatus(new Path(targetDir))
          .exists(_.getPath.getName.startsWith("__kb=")))
    // what the table believed before this batch — the B17 history event's
    // old side (pin sidecar, else the footer schema of the live table)
    val priorSchema: Option[org.apache.spark.sql.types.StructType] =
      readPinnedSchema(fs, targetDir).orElse(
        if (tableExists) Some(org.apache.spark.sql.types.StructType(
          spark.read.parquet(targetDir).schema.fields.filterNot(_.name == "__kb")))
        else None)
    // schema contract: widen in place on added columns, refuse narrowing
    // and type changes (restart-level DDL) — see the schema-pin scaladoc.
    // A refusal is a B17 schema-history event BEFORE it throws: the
    // rejected DDL is exactly what an operator reads the log for.
    val (tableSchema, repin) =
      try resolveSchema(fs, targetDir, tableExists,
        batch.schema, spark.read.parquet(targetDir).schema)
      catch {
        case e: IllegalArgumentException =>
          graft.cdc.SchemaHistory.append(spark, targetDir, "refuse",
            priorSchema, Some(batch.schema), Some(batchRows))
          throw e
      }
    val b = batch.withColumn("__kb", pmod(hash(layoutCols.map(col): _*), lit(n)))
    // buckets touched by this batch — bounded by nBuckets, a driver-safe collect
    val touched = b.select(col("__kb")).distinct().collect().map(_.getInt(0)).toSeq
    def recordPin(): Unit = {
      // the B17 event lands BEFORE the pin moves: a crash between the
      // two re-detects the same widening on replay and re-appends —
      // at-least-once history, never a silently missing row
      graft.cdc.SchemaHistory.append(spark, targetDir,
        if (priorSchema.isEmpty) "pin" else "widen",
        priorSchema, Some(tableSchema), Some(batchRows))
      writePinnedSchema(fs, targetDir, tableSchema)
    }
    if (touched.isEmpty) { if (repin) recordPin(); return }
    val existing =
      if (tableExists)
        // partition-pruned: only the touched buckets are read. The
        // EXPLICIT widened schema (not footer sampling) makes buckets
        // written before a widening read their missing columns as null.
        Some(spark.read.schema(tableSchema
            .add("__kb", org.apache.spark.sql.types.IntegerType))
          .parquet(targetDir).where(col("__kb").isin(touched: _*)))
      else None
    val all = existing.map(_.unionByName(b, allowMissingColumns = true)).getOrElse(b)
    val merged = latestByKeyAligned(all, keyCols, versionCol)
    if (existing.isDefined)
      // r20 (guide §5/§2.4): stage-and-swap instead of
      // localCheckpoint + same-dir dynamic overwrite. The checkpoint
      // existed only to sever the self-overwrite hazard, but it cost a
      // whole extra pass per micro-batch: one job computing the merge
      // into the block cache, a second job re-reading the cache to
      // encode parquet. Writing the merge to a staging dir (a different
      // path — no hazard, nothing to sever) computes and encodes it in
      // ONE job; the driver then swaps each staged bucket dir into
      // place, metadata-only renames on the same FS.
      swapBucketDirsIntoTable(fs, targetDir, merged)
    else
      merged.write.mode("overwrite")
        // per-write option, NOT a session conf: scoping it here means other
        // overwrite-partitionBy writes on the same session keep Spark's
        // static default (truncate untouched partitions) instead of
        // silently inheriting dynamic mode
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__kb").parquet(targetDir)
    // the pin moves AFTER the data lands: a crash in between re-detects
    // the same widening next batch and rewrites the same content
    if (repin) recordPin()
  }

  /** Overwrite exactly the `__kb=` bucket dirs present in `df` — the
    * dynamic-partition-overwrite contract — WITHOUT materializing `df`
    * first (r20, guide §5): the rows land in one Spark write job under
    * the underscore-prefixed `_graft_stage` dir (invisible to every
    * parquet scan of the table, like `_SUCCESS` and the sidecars), then
    * each staged bucket dir is renamed into place. Reading the table
    * while writing elsewhere carries no self-overwrite hazard, so the
    * eager localCheckpoint this replaces (one extra whole-table-working-
    * set materialization per micro-batch: cache write + cache read) is
    * not needed. Crash windows are the same class as Spark's own
    * dynamic-overwrite job commit: a kill mid-swap leaves some buckets
    * new and some old, and the replayed batch's latest-wins merge
    * re-applies idempotently (a leftover stage dir is cleared here
    * before the next write). The root `_SUCCESS` marker advances after
    * the swap, keeping parity with the Spark-committed path.
    */
  private def swapBucketDirsIntoTable(fs: org.apache.hadoop.fs.FileSystem,
                                      targetDir: String, df: DataFrame): Unit = {
    val stage = new Path(targetDir, "_graft_stage")
    if (fs.exists(stage)) fs.delete(stage, true)
    df.write.mode("overwrite").partitionBy("__kb").parquet(stage.toString)
    fs.listStatus(stage).filter(_.getPath.getName.startsWith("__kb="))
      .foreach { st =>
        val dest = new Path(targetDir, st.getPath.getName)
        if (fs.exists(dest)) fs.delete(dest, true)
        fs.rename(st.getPath, dest)
      }
    fs.delete(stage, true)
    val ok = fs.create(new Path(targetDir, "_SUCCESS"), true)
    ok.close()
  }

  /** The upsert merge, keyed for the table LAYOUT (r19 optimization
    * round, guide §2.4/§6): semantically identical to
    * `Materialize.latestByKey(all, keyCols, version)` — `__kb` is a pure
    * function of a SUBSET of the merge key, so grouping on
    * (__kb, keyCols) partitions rows exactly like keyCols alone — but
    * the one shuffle it needs is an explicit repartition on `__kb`, the
    * same column the write below partitions directories by.
    * HashPartitioning(__kb) satisfies the window's
    * ClusteredDistribution(__kb :: keyCols) (partitioning ⊆ clustering),
    * so Catalyst plans exactly ONE exchange — and every task then holds
    * whole buckets, so the dynamic overwrite lands ~one file per touched
    * bucket instead of one per (merge-shuffle task × bucket): before
    * this, a lineitem-style layout (bucketCols ⊂ keyCols, hashes
    * unaligned) fragmented every micro-batch rewrite into up to
    * `spark.sql.shuffle.partitions` files PER BUCKET, each a parquet
    * commit now and a scan task next batch. Parallelism of the merge
    * becomes ≈ touched buckets — the sink's own cost model ("per-batch
    * cost ∝ touched working set", buckets sized ~64k rows) already
    * assumes that unit of work.
    */
  private def latestByKeyAligned(all: DataFrame, keyCols: Seq[String],
                                 versionCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((col("__kb") +: keyCols.map(col)): _*)
      .orderBy(col(versionCol).desc)
    all.repartition(col("__kb"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** A8 — attach the upsert sink to a (streaming) frame of flattened
    * change events. Batches apply serially in batch-id order; recovery
    * replays the in-flight batch, which [[applyUpsertBatch]] absorbs
    * idempotently.
    */
  def foreachBatchUpsert(changes: DataFrame, targetDir: String, checkpointDir: String,
                         keyCols: Seq[String], versionCol: String,
                         nBuckets: Int = 0,
                         trigger: Trigger = Trigger.AvailableNow(),
                         bucketCols: Seq[String] = Nil): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyUpsertBatch(batch, targetDir, keyCols, versionCol, nBuckets,
          bucketCols)
      }
      .start()

  /** A8e/B19 (r19) — the upsert sink with TRUNCATE support. [PK:
    * Debezium emits `op='t'` for TRUNCATE TABLE on supported connectors;
    * the event has no row images and no key — it addresses the whole
    * table.] Semantics match Materialize.changelogWithTruncates (the
    * batch spec, property-pinned in TruncateSpec): every stored row whose
    * version is at or below the batch's LAST truncate dies — whatever its
    * key and whichever earlier batch landed it — and batch rows versioned
    * after the truncate merge as usual. Earlier rows lose, later rows
    * win.
    *
    * Mechanics: (1) batch rows OUTLIVING the truncate merge through the
    * normal pruned [[applyUpsertBatch]] (schema pin / widen / B17 history
    * all apply; rows at or below the cutoff are dead on arrival and never
    * land); (2) the pre-truncate key-space clears — and because a
    * truncate addresses EVERY key, the touched-partition contract doesn't
    * bound it: a per-partition (min, max) version scan (one column-pruned
    * pass, collected bounded by the layout's partition count) classifies
    * each `__kb` dir as untouched (min outlives the cutoff), wholly dead
    * (max doesn't — the dir is deleted outright; dynamic overwrite cannot
    * delete a partition absent from its output), or mixed (rewritten
    * without its dead rows). A replayed batch (foreachBatch is
    * at-least-once) recomputes the same survivor set — both steps are
    * idempotent.
    *
    * Sinks that cannot honor a truncate (the rollup's count partials)
    * must route them to the B13 dead letter instead —
    * [[graft.cdc.Envelope.splitTruncates]].
    */
  def applyUpsertBatchWithTruncates(batch: DataFrame, targetDir: String,
                                    keyCols: Seq[String], versionCol: String,
                                    opCol: String = "op",
                                    truncateOp: String = "t",
                                    nBuckets: Int = 0,
                                    bucketCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the FLOOR is part of the table, not the batch: a batch arriving
    // AFTER the truncate's batch but carrying straggler rows versioned
    // BEFORE it must not resurrect the cleared key-space. The sidecar
    // persists the highest truncate version ever applied; every batch
    // drops its rows at or below it before merging.
    val floor: Option[Long] = readTruncateFloor(fs, targetDir)
    val cut = batch.where(col(opCol) === truncateOp)
      .agg(max(col(versionCol).cast("long"))).head() // one driver row
    val batchT: Option[Long] = if (cut.isNullAt(0)) None else Some(cut.getLong(0))
    val effT: Option[Long] = (floor.toSeq ++ batchT.toSeq).maxOption
    val rows = batch.where(col(opCol) =!= truncateOp || col(opCol).isNull)
    val live = effT.map(t => rows.where(col(versionCol) > lit(t))).getOrElse(rows)
    applyUpsertBatch(live, targetDir, keyCols, versionCol, nBuckets, bucketCols)
    // a truncate NEWER than the floor clears the stored pre-truncate
    // key-space, then moves the floor (floor moves LAST: a crash between
    // the two replays the clear idempotently — the survivor set
    // recomputes identically)
    if (batchT.exists(bt => floor.forall(_ < bt))) {
      val t = lit(effT.get)
      val hasParts = fs.exists(new Path(targetDir)) &&
        fs.listStatus(new Path(targetDir))
          .exists(_.getPath.getName.startsWith("__kb="))
      if (hasParts) {
        val cur = readPinned(spark, targetDir)
        val spans = cur.groupBy(col("__kb"))
          .agg(coalesce(min(col(versionCol)) <= t, lit(false)).as("__hasDead"),
            coalesce(max(col(versionCol)) <= t, lit(false)).as("__allDead"))
          .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getBoolean(2)))
        val toRewrite = spans.collect { case (kb, true, false) => kb }
        if (toRewrite.nonEmpty) {
          // stage-and-swap severs the read-before-overwrite hazard like
          // every rewrite here, without the extra materialization pass
          val kept = cur
            .where(col("__kb").isin(toRewrite.toIndexedSeq: _*) &&
              col(versionCol) > t)
            .repartition(col("__kb"))
          swapBucketDirsIntoTable(fs, targetDir, kept)
        }
        // fully-dead partitions: dynamic overwrite cannot DELETE a
        // partition absent from its output — remove their dirs outright
        spans.collect { case (kb, _, true) => kb }
          .foreach(kb => fs.delete(new Path(targetDir, s"__kb=$kb"), true))
      }
      writeTruncateFloor(fs, targetDir, effT.get)
    }
  }

  /** THE long-valued sidecar idiom, shared by the truncate floor and the
    * offset ledger (one implementation — a fix here fixes every sidecar,
    * they cannot drift). Writes are tmp-then-rename like the schema pin.
    * Reads fall back to the `.tmp` when the final file is MISSING: the
    * writer's delete→rename window would otherwise read as "no value",
    * silently LOWERING a floor after a crash between the delete and the
    * rename (the tmp is always fully written and closed before the
    * delete runs, so in that window it is the authoritative value; when
    * BOTH files exist the final one wins — a tmp from a crash mid-write
    * may be torn). A torn read parses as None, never a wrong number.
    */
  private def readLongSidecar(fs: org.apache.hadoop.fs.FileSystem,
                              dir: String, name: String): Option[Long] = {
    def readAt(p: Path): Option[Long] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        scala.util.Try(txt.toLong).toOption
      }
    readAt(new Path(dir, name)).orElse(readAt(new Path(dir, s"$name.tmp")))
  }

  private def writeLongSidecar(fs: org.apache.hadoop.fs.FileSystem,
                               dir: String, name: String, v: Long): Unit = {
    val tmp = new Path(dir, s"$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(new Path(dir, name), false)
    fs.rename(tmp, new Path(dir, name))
  }

  /** The truncate floor sidecar (a torn floor must not brick or silently
    * lower the cutoff). Versions are read as Long: the floor is a source
    * LSN.
    */
  private def readTruncateFloor(fs: org.apache.hadoop.fs.FileSystem,
                                targetDir: String): Option[Long] =
    readLongSidecar(fs, targetDir, "_graft_truncate")

  private def writeTruncateFloor(fs: org.apache.hadoop.fs.FileSystem,
                                 targetDir: String, t: Long): Unit =
    writeLongSidecar(fs, targetDir, "_graft_truncate", t)

  /** A8e — attach the truncate-aware upsert sink to a change stream. */
  def foreachBatchUpsertTruncates(changes: DataFrame, targetDir: String,
                                  checkpointDir: String, keyCols: Seq[String],
                                  versionCol: String, opCol: String = "op",
                                  nBuckets: Int = 0,
                                  trigger: Trigger = Trigger.AvailableNow(),
                                  bucketCols: Seq[String] = Nil): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyUpsertBatchWithTruncates(batch, targetDir, keyCols, versionCol,
          opCol, "t", nBuckets, bucketCols)
      }
      .start()

  /** B20 (r19) — HEARTBEATS and the consumer OFFSET LEDGER. [PK:
    * Debezium emits periodic heartbeat records (`heartbeat.interval.ms`,
    * the `__debezium-heartbeat.<server>` topic) so that source offsets
    * keep advancing even when the captured tables are QUIET — without
    * them the connector's committed position pins WAL/binlog retention
    * and downstream liveness monitoring goes blind.] Consumer side, the
    * twin concern: the sink's durably-consumed position is the floor
    * below which channel retention is safe (Signals.pruneChannel /
    * Notifications.prune document "prune only below every consumer's
    * committed offset") — and on a quiet stream that floor never moves
    * unless heartbeats move it. Convention: a heartbeat is a flattened
    * changelog row with `op='h'`, a valid version/lsn, and no images.
    * [[applyUpsertBatchWithHeartbeats]] merges the DATA rows through the
    * normal pruned upsert and then advances the `_graft_offset` ledger
    * to the batch's max lsn INCLUDING heartbeats — a heartbeat-only
    * batch is zero table IO, one monotone sidecar move. The ledger
    * advances only AFTER the data lands (a crash between the two
    * replays idempotently and re-advances), and never moves backwards
    * (an out-of-order replay cannot lower the consumed floor).
    */
  def applyUpsertBatchWithHeartbeats(batch: DataFrame, targetDir: String,
                                     keyCols: Seq[String], versionCol: String,
                                     opCol: String = "op",
                                     heartbeatOp: String = "h",
                                     nBuckets: Int = 0,
                                     bucketCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val data = batch.where(col(opCol) =!= heartbeatOp || col(opCol).isNull)
    applyUpsertBatch(data, targetDir, keyCols, versionCol, nBuckets, bucketCols)
    val hi = batch.agg(max(col(versionCol).cast("long"))).head()
    if (!hi.isNullAt(0)) {
      val fs = new Path(targetDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      advanceOffsetLedger(fs, targetDir, hi.getLong(0))
    }
  }

  /** B20 — attach the heartbeat-aware upsert sink to a change stream. */
  def foreachBatchUpsertHeartbeats(changes: DataFrame, targetDir: String,
                                   checkpointDir: String, keyCols: Seq[String],
                                   versionCol: String, opCol: String = "op",
                                   nBuckets: Int = 0,
                                   trigger: Trigger = Trigger.AvailableNow(),
                                   bucketCols: Seq[String] = Nil): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyUpsertBatchWithHeartbeats(batch, targetDir, keyCols, versionCol,
          opCol, "h", nBuckets, bucketCols)
      }
      .start()

  /** The sink's durably-consumed position (None before anything landed).
    * This is the channel-retention floor: pruning a signal/notification
    * channel at or below it can never drop something this consumer has
    * not applied.
    */
  def readOffsetLedger(spark: SparkSession, targetDir: String): Option[Long] = {
    val fs = new Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    readLongSidecar(fs, targetDir, "_graft_offset")
  }

  private def advanceOffsetLedger(fs: org.apache.hadoop.fs.FileSystem,
                                  targetDir: String, lsn: Long): Unit = {
    val cur = readLongSidecar(fs, targetDir, "_graft_offset")
    if (cur.forall(_ < lsn)) // monotone: replays never lower the floor
      writeLongSidecar(fs, targetDir, "_graft_offset", lsn)
  }

  /** Incrementally maintained aggregate rollup: each micro-batch folds its
    * per-key (count, decimal sum) PARTIALS into the bucket-partitioned
    * target — the streaming-materialized GROUP BY. Only mergeable partials
    * are stored (count/sum are associative), so a batch costs one narrow
    * partial agg plus a merge of the touched buckets, never a rescan; avg
    * and friends derive at read time. Decimal sums keep the stored value
    * bit-exact across engines and batch orders.
    *
    * Replay safety: count partials are NOT latest-wins, so a replayed
    * batch (foreachBatch is at-least-once) would double-count. The guard
    * lives IN the data: every bucket row carries `__bid`, the highest
    * batch id folded into it, so a replayed batch skips any touched
    * bucket whose stored `max(__bid)` already covers it. This closes the
    * crash window a sidecar-only guard leaves open (crash between the
    * data write and the sidecar write re-applied the batch permanently
    * and undetectably) — the sidecar remains only as a read-free fast
    * path for the common already-applied case. The bucket writes
    * themselves go through Spark's job commit, so a crash MID-write
    * leaves each touched bucket either old (guard misses → replay
    * re-merges it) or new (guard hits → replay skips it); either way the
    * replayed batch folds into each bucket exactly once.
    */
  def applyRollupBatch(batch: DataFrame, targetDir: String, keyCols: Seq[String],
                       valueCol: String, nBuckets: Int = 0,
                       batchId: Option[Long] = None): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (batchId.exists(id => readLastBatch(fs, targetDir).exists(_ >= id))) return
    val partial = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,6)")).as("sum_val"))
    val n = resolvePinnedBuckets(fs, targetDir, nBuckets, partial.count())
    val b = partial.withColumn("__kb", pmod(hash(keyCols.map(col): _*), lit(n)))
      .withColumn("__bid", lit(batchId.getOrElse(-1L)))
    val touched = b.select(col("__kb")).distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) { batchId.foreach(writeLastBatch(fs, targetDir, _)); return }
    val existing =
      if (fs.listStatus(new Path(targetDir)).exists(_.getPath.getName.startsWith("__kb=")))
        Some {
          val ex = spark.read.parquet(targetDir).where(col("__kb").isin(touched: _*))
          // tables written before the __bid column existed merge as "never
          // guarded" (-1): correct, since nothing ever stamped them.
          // Persisted: BOTH the per-bucket guard aggregate and the merge
          // read the touched buckets — one storage scan, not two.
          (if (ex.columns.contains("__bid")) ex
           else ex.withColumn("__bid", lit(-1L))).persist()
        }
      else None
    try {
      // buckets whose data already contains this batch (crash after their
      // write, before the sidecar) — bounded by nBuckets, driver-safe
      val applied: Set[Int] = (existing, batchId) match {
        case (Some(ex), Some(id)) =>
          ex.groupBy(col("__kb")).agg(max(col("__bid")).as("mb"))
            .where(col("mb") >= id)
            .select(col("__kb")).collect().map(_.getInt(0)).toSet
        case _ => Set.empty
      }
      val live = touched.filterNot(applied)
      if (live.isEmpty) { batchId.foreach(writeLastBatch(fs, targetDir, _)); return }
      // already-applied buckets are excluded from BOTH sides: their dirs are
      // simply not in the output, and dynamic overwrite leaves them untouched
      val bLive = b.where(col("__kb").isin(live: _*))
      val exLive = existing.map(_.where(col("__kb").isin(live: _*)))
      val all = exLive.map(_.unionByName(bLive)).getOrElse(bLive)
      // layout-aligned like the upsert merge (r20, guide §2.4/§6): the
      // one explicit exchange is keyed on the layout column —
      // HashPartitioning(__kb) satisfies the final aggregate's
      // ClusteredDistribution(keyCols :+ __kb), so no second exchange is
      // planned and each rewrite lands ~one file per touched bucket
      // instead of one per (agg task × bucket)
      val merged = all.repartition(col("__kb"))
        .groupBy((keyCols :+ "__kb").map(col): _*)
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("sum_val")).cast("decimal(18,6)").as("sum_val"),
          max(col("__bid")).as("__bid"))
      if (existing.isDefined)
        // stage-and-swap severs the self-overwrite hazard without the
        // checkpointed extra materialization pass (see the upsert path)
        swapBucketDirsIntoTable(fs, targetDir, merged)
      else
        merged.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__kb").parquet(targetDir)
      batchId.foreach(writeLastBatch(fs, targetDir, _))
    } finally existing.foreach(_.unpersist(false))
  }

  /** A8b — attach the incremental rollup to a change stream. */
  def foreachBatchRollup(events: DataFrame, targetDir: String, checkpointDir: String,
                         keyCols: Seq[String], valueCol: String,
                         nBuckets: Int = 0,
                         trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyRollupBatch(batch, targetDir, keyCols, valueCol, nBuckets, Some(id))
      }
      .start()

  /** The maintained rollup (layout + replay-guard columns dropped). */
  def currentRollup(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir).drop("__kb", "__bid")

  /** Compaction for the upsert table. Since the r19 layout-aligned merge
    * ([[latestByKeyAligned]]) every micro-batch rewrite already lands
    * ~one file per touched bucket, so a table maintained solely through
    * [[applyUpsertBatch]] stays compact by construction; this remains
    * the recovery path for buckets fragmented by OTHER writers (or by
    * pre-r19 binaries, whose merges emitted one file per shuffle task ×
    * bucket). Compacting rewrites each bucket as ONE file (the shuffle
    * key is the bucket column, so a task holds whole buckets). Dynamic
    * overwrite replaces only `__kb=*` directories — the `_graft_buckets`
    * layout pin survives; readers see either the old or the new files,
    * never a mix, because the checkpoint severs the
    * read-before-overwrite hazard the same way the batch path does.
    */
  def compact(spark: SparkSession, targetDir: String): Unit = {
    val fs = new Path(targetDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // stage-and-swap: one pass (read + re-cluster + encode) instead of a
    // checkpointed materialization followed by a cache re-read (r20)
    swapBucketDirsIntoTable(fs, targetDir,
      readPinned(spark, targetDir).repartition(col("__kb")))
  }

  /** Read the table through its pinned schema when one exists — buckets
    * written before a widening then read their missing columns as null
    * instead of depending on which footer Spark samples.
    */
  private def readPinned(spark: SparkSession, targetDir: String): DataFrame = {
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readPinnedSchema(fs, targetDir) match {
      case Some(st) =>
        spark.read.schema(st.add("__kb", org.apache.spark.sql.types.IntegerType))
          .parquet(targetDir)
      case None => spark.read.parquet(targetDir)
    }
  }

  /** Live rows of the materialized table (tombstones filtered, layout
    * column dropped), resolved through the pinned schema.
    */
  def currentState(spark: SparkSession, targetDir: String,
                   opCol: String = "op", deleteOp: String = "d"): DataFrame =
    readPinned(spark, targetDir).where(col(opCol) =!= deleteOp).drop("__kb")

  /** A8d (r18) — the CLUSTERED upsert sink: merge a change batch into a
    * CATALOG table that is both partitioned by `__kb` (the touched-set
    * pruning unit, a hash of the merge key) and BUCKETED by `bucketCols`
    * (the downstream JOIN key). The catalog's bucket spec is what the
    * plain directory layout can't give: readers see
    * `HashPartitioning(bucketCols, nBuckets)`, so two tables maintained
    * through this sink join with ZERO exchanges — the changelog-fed
    * answer to GauntletSpec's pre-bucketed fact pair, the layout a
    * reporting consumer wants when the same fact join runs every hour at
    * 100 TB.
    *
    * Per-batch cost is the dir sink's: read ONLY the touched `__kb`
    * partitions (CatalogFileIndex partition pruning), latest-wins merge,
    * dynamic-overwrite exactly those partitions back (bucket files are
    * rebuilt inside each rewritten partition; untouched partitions keep
    * their files byte-identical, so the bucket contract never breaks).
    *
    * Schema contract (r18, at parity with the dir sink): the CATALOG is
    * the schema pin. A batch that ADDS columns widens the table in
    * place (`ALTER TABLE … ADD COLUMNS` — old files read the new
    * columns as null through the catalog schema, nothing rewrites);
    * narrowing and type changes REFUSE loudly (restart-level DDL).
    * Every pin / widen / refusal lands as a B17 schema-history event
    * under the table's location, exactly like the dir sink's.
    * `bucketCols ⊆ keyCols` for the same colocation reason as the dir
    * sink's layout pin.
    */
  def applyUpsertBatchClustered(batch: DataFrame, table: String,
                                keyCols: Seq[String], versionCol: String,
                                bucketCols: Seq[String],
                                nBuckets: Int = 8, nKbParts: Int = 16): Unit = {
    val spark = batch.sparkSession
    require(bucketCols.nonEmpty && bucketCols.forall(keyCols.contains),
      s"bucketCols (${bucketCols.mkString(",")}) must be a non-empty subset " +
        s"of keyCols (${keyCols.mkString(",")})")
    lazy val batchRows = batch.count()
    val freshTable = !spark.catalog.tableExists(table)
    if (freshTable) {
      // batch 0 defines the table: data columns from the batch schema,
      // __kb as the partition column, the join key as the bucket spec.
      // The LAYOUT KNOBS (nKbParts, keyCols) are pinned as table
      // properties: like the dir sink's sidecars, a later batch hashing
      // __kb with a different modulus or key set would prune the wrong
      // partitions and silently resurrect stale rows — the pin turns
      // that into a loud refusal. (bucketCols need no extra pin: the
      // catalog's own bucket spec enforces them at write.)
      val colsDdl = batch.schema.toDDL
      val bk = bucketCols.mkString(", ")
      spark.sql(
        s"""CREATE TABLE $table ($colsDdl, __kb INT) USING parquet
           |PARTITIONED BY (__kb)
           |CLUSTERED BY ($bk) SORTED BY ($bk) INTO $nBuckets BUCKETS
           |TBLPROPERTIES ('graft.nKbParts' = '$nKbParts',
           |  'graft.keyCols' = '${keyCols.mkString(",")}')"""
          .stripMargin)
      graft.cdc.SchemaHistory.append(spark, tableLocation(spark, table),
        "pin", None, Some(batch.schema), Some(batchRows))
    } else {
      // the layout pin is MANDATORY on later batches: a modulus or
      // key-set drift would prune the wrong partitions; a table without
      // the pin (not created through this sink) is refused, not guessed
      val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      require(props.contains("graft.nKbParts"),
        s"table $table has no graft.nKbParts pin — it was not created " +
          "through this sink; recreate it here (the pin is the guard " +
          "against layout drift)")
      require(props("graft.nKbParts") == nKbParts.toString,
        s"table $table is partitioned with nKbParts=${props("graft.nKbParts")}; " +
          s"got $nKbParts — a different modulus would prune the wrong " +
          "partitions and resurrect stale rows")
      require(props.get("graft.keyCols").contains(keyCols.mkString(",")),
        s"table $table merges on keyCols=${props.get("graft.keyCols")
          .getOrElse("?")}; got ${keyCols.mkString(",")}")
      // the catalog is the pinned schema: widen on added columns,
      // refuse narrowing/type changes — each decision a B17 event
      val ts = org.apache.spark.sql.types.StructType(
        spark.table(table).schema.fields.filterNot(_.name == "__kb"))
      val bByName = batch.schema.fields.map(f => f.name -> f).toMap
      def refuse(msg: String): Nothing = {
        graft.cdc.SchemaHistory.append(spark, tableLocation(spark, table),
          "refuse", Some(ts), Some(batch.schema), Some(batchRows))
        throw new IllegalArgumentException(msg)
      }
      val missing = ts.fields.map(_.name).filterNot(bByName.contains)
      if (missing.nonEmpty)
        refuse(s"clustered upsert batch is missing table columns " +
          s"${missing.mkString(", ")} at $table — NARROWING is " +
          "restart-level DDL")
      val clashes = ts.fields.flatMap { f =>
        bByName.get(f.name).filter(_.dataType != f.dataType)
          .map(bf => s"${f.name}: table ${f.dataType.simpleString} vs " +
            s"batch ${bf.dataType.simpleString}")
      }
      if (clashes.nonEmpty)
        refuse(s"clustered upsert batch changes column types at $table — " +
          s"${clashes.mkString("; ")}: type changes are restart-level DDL")
      val newCols = batch.schema.fields
        .filterNot(f => ts.fieldNames.contains(f.name))
      if (newCols.nonEmpty) {
        val adds = newCols.map(f => s"${f.name} ${f.dataType.sql}")
          .mkString(", ")
        spark.sql(s"ALTER TABLE $table ADD COLUMNS ($adds)")
        graft.cdc.SchemaHistory.append(spark, tableLocation(spark, table),
          "widen", Some(ts),
          Some(org.apache.spark.sql.types.StructType(ts.fields ++ newCols)),
          Some(batchRows))
      }
    }
    val b = batch.withColumn("__kb",
      pmod(hash(keyCols.map(col): _*), lit(nKbParts)))
    val tableCols = spark.table(table).columns
    val touched = b.select(col("__kb")).distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val existing = spark.table(table).where(col("__kb").isin(touched: _*))
    // layout-aligned merge (see [[latestByKeyAligned]]): one exchange on
    // __kb, whole partitions per task — the bucketed insertInto then
    // writes ~one file per (touched __kb dir × bucket) instead of one
    // per (merge-shuffle task × dir × bucket)
    val merged0 = latestByKeyAligned(existing.unionByName(b), keyCols, versionCol)
    // sever the read-before-overwrite hazard exactly as the dir sink
    // does — except on the batch that just CREATED the (empty) table,
    // whose scan matches zero files (r19: skip the extra pass)
    val merged = (if (freshTable) merged0 else merged0.localCheckpoint(true))
      .select(tableCols.map(col): _*) // insertInto matches positionally
    dynamicOverwriteInsert(spark, merged, table)
  }

  /** insertInto ignores the per-write partitionOverwriteMode OPTION
    * (verified empirically on Spark 4.1: the option'd write replaced the
    * whole table) — the session conf is the only lever. But the conf is
    * session-GLOBAL, and the r18 set→insert→restore under a JVM lock
    * only serialized THIS sink's own calls (r18 advice): any other
    * writer sharing the SparkSession that inserted during the window ran
    * in dynamic mode unexpectedly, or had its own setting restored over.
    * So the insert executes in a CLONED session instead — newSession()
    * shares the SparkContext and catalog but owns its SQLConf, scoping
    * the dynamic mode to exactly this write with no mutation of (and no
    * lock against) the caller's session. The frame crosses sessions
    * through a global temp view (same shared catalog; the plan
    * re-resolves under the clone — cheap, and the upstream
    * localCheckpoint already severed the self-overwrite hazard).
    */
  // one dynamic-mode clone per parent session, built lazily: the clone's
  // only distinguishing state is a conf that never changes, so paying
  // newSession() (a full SessionState) on every micro-batch insert would
  // be pure hot-path overhead
  private val dynSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  private def dynamicOverwriteInsert(spark: SparkSession, df: DataFrame,
                                     table: String): Unit = {
    val s2 = dynSessions.computeIfAbsent(spark, { parent =>
      val c = parent.newSession()
      c.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      c
    })
    val view = "graft_dyn_insert_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    df.createOrReplaceGlobalTempView(view)
    try {
      val gdb = spark.conf.getOption("spark.sql.globalTempDatabase")
        .getOrElse("global_temp")
      s2.table(s"$gdb.$view").write.mode("overwrite").insertInto(table)
      // the write invalidated s2's relation cache, not the caller's: the
      // caller's next read of the table would list the OVERWRITTEN files
      // and fail (or silently read stale data) without this refresh
      spark.catalog.refreshTable(table)
    } finally {
      spark.catalog.dropGlobalTempView(view): Unit
    }
  }

  /** B19 parity for the CLUSTERED catalog sink: [[applyUpsertBatchClustered]]
    * with TRUNCATE support — the same semantics and floor discipline as
    * [[applyUpsertBatchWithTruncates]] (dir-sink scaladoc), adapted to
    * the catalog: the floor sidecar lives at the table LOCATION (beside
    * its B17 history), mixed partitions rewrite through the scoped
    * [[dynamicOverwriteInsert]], and wholly-dead partitions drop via
    * `ALTER TABLE … DROP PARTITION` (the catalog's delete — dynamic
    * overwrite cannot remove a partition absent from its output). The
    * bucket spec is catalog metadata, so the exchange-free join contract
    * survives the truncate untouched.
    */
  def applyUpsertBatchClusteredWithTruncates(batch: DataFrame, table: String,
                                             keyCols: Seq[String],
                                             versionCol: String,
                                             bucketCols: Seq[String],
                                             opCol: String = "op",
                                             truncateOp: String = "t",
                                             nBuckets: Int = 8,
                                             nKbParts: Int = 16): Unit = {
    val spark = batch.sparkSession
    val rows = batch.where(col(opCol) =!= truncateOp || col(opCol).isNull)
    val cut = batch.where(col(opCol) === truncateOp)
      .agg(max(col(versionCol).cast("long"))).head()
    val batchT: Option[Long] = if (cut.isNullAt(0)) None else Some(cut.getLong(0))
    val floor: Option[Long] =
      if (!spark.catalog.tableExists(table)) None
      else {
        val fs = new Path(tableLocation(spark, table))
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        readTruncateFloor(fs, tableLocation(spark, table))
      }
    val effT: Option[Long] = (floor.toSeq ++ batchT.toSeq).maxOption
    val live = effT.map(t => rows.where(col(versionCol) > lit(t))).getOrElse(rows)
    applyUpsertBatchClustered(live, table, keyCols, versionCol, bucketCols,
      nBuckets, nKbParts)
    if (batchT.exists(bt => floor.forall(_ < bt)) &&
        spark.catalog.tableExists(table)) {
      val t = lit(effT.get)
      val cur = spark.table(table)
      val spans = cur.groupBy(col("__kb"))
        .agg(coalesce(min(col(versionCol)) <= t, lit(false)).as("__hasDead"),
          coalesce(max(col(versionCol)) <= t, lit(false)).as("__allDead"))
        .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getBoolean(2)))
      val toRewrite = spans.collect { case (kb, true, false) => kb }
      if (toRewrite.nonEmpty) {
        val tableCols = cur.columns
        val kept = cur
          .where(col("__kb").isin(toRewrite.toIndexedSeq: _*) &&
            col(versionCol) > t)
          .localCheckpoint(true)
          .select(tableCols.map(col).toIndexedSeq: _*)
        dynamicOverwriteInsert(spark, kept, table)
      }
      spans.collect { case (kb, _, true) => kb }.foreach { kb =>
        spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (__kb=$kb)")
      }
      val fs = new Path(tableLocation(spark, table))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      writeTruncateFloor(fs, tableLocation(spark, table), effT.get)
    }
  }

  /** Live rows of a [[applyUpsertBatchClustered]] table (tombstones
    * filtered, layout column dropped). The frame keeps the catalog's
    * bucket distribution — join it on `bucketCols` exchange-free.
    */
  def currentStateClustered(spark: SparkSession, table: String,
                            opCol: String = "op",
                            deleteOp: String = "d"): DataFrame =
    spark.table(table).where(col(opCol) =!= deleteOp).drop("__kb")

  /** The table's storage location — the root its B17 schema-history
    * events live under (the clustered twin of the dir sink's targetDir).
    */
  def tableLocation(spark: SparkSession, table: String): String =
    spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .where(col("col_name") === "Location")
      .select("data_type").head().getString(0)

  /** Compaction for the clustered table. Since the r19 layout-aligned
    * merge each rewrite lands ~one task per touched `__kb` partition
    * (nBuckets files per dir — the catalog bucket spec splits within the
    * task), so tables maintained solely through this sink stay compact;
    * this remains the recovery path for partitions fragmented by other
    * writers or pre-r19 binaries (one file per merge-shuffle task ×
    * partition × bucket). Compacting re-clusters each `__kb` partition in one task
    * (`repartition(__kb)`) so the rewrite lands ~one file per
    * (partition, bucket) — the catalog's bucket spec is metadata and
    * survives untouched, so the exchange-free join contract holds
    * before and after. The checkpoint severs the read-before-overwrite
    * hazard exactly like the batch path and the dir sink's [[compact]].
    */
  def compactClustered(spark: SparkSession, table: String): Unit = {
    val tableCols = spark.table(table).columns
    val snap = spark.table(table)
      .repartition(col("__kb"))
      .localCheckpoint(true)
      .select(tableCols.map(col): _*)
    dynamicOverwriteInsert(spark, snap, table)
  }
}
