package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B5/B6 — changelog → current-state materialization, the core CDC
  * consumer operation: the latest event per key wins, deletes remove the
  * row.
  *
  * Batch form: one hash-partitioned window (single shuffle on the key —
  * the minimum possible for a keyed reduction) + `row_number` + filter.
  * At 100 TB the shuffle is unavoidable but the window is streaming-
  * friendly: no state beyond the current key group, AQE handles key skew.
  * The streaming form lives in graft.streaming.StatefulOps (keyed state
  * store upsert) and is property-tested equal to this batch spec.
  */
object Materialize {

  /** Latest row per key by `orderCols` (descending priority order given
    * ascending semantics — pass the natural "version" columns; ties broken
    * by the last column, which must make the order total per key).
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full changelog materialization: latest event per key, then drop keys
    * whose latest op is a delete. `opCol` defaults to the envelope's `op`.
    */
  def changelog(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                opCol: Column = col("op"), deleteOp: String = "d"): DataFrame =
    latestByKey(df, keyCols, orderCols)
      .where(opCol =!= deleteOp)

  /** B19 (r19) — changelog materialization with TRUNCATE events. [PK:
    * Debezium emits `op='t'` for TRUNCATE TABLE on supported connectors;
    * a truncate event has no before/after image and no key — it
    * addresses the whole table.] Semantics: the table's key-space is
    * cleared AT the truncate's position — every row whose version is at
    * or below the LAST truncate loses (whatever its key), rows versioned
    * after it win — then the usual latest-per-key materialization runs
    * over the survivors.
    *
    * `verCol` is the single comparable column that totally orders the
    * changelog against its truncates (the source LSN). The cutoff is a
    * scalar: one filter-pushed pass over the (rare) truncate rows
    * reduces to ONE row, broadcast back over the survivors — no keyed
    * shuffle is added to [[changelog]]'s single window, so the operator
    * scales exactly as the truncate-free form. Ties (a row at the
    * truncate's own version) go to the truncate: a connector's LSNs are
    * unique per event, so a tie only arises in synthetic replays, and
    * "the truncate saw it" is the conservative reading.
    */
  def changelogWithTruncates(df: DataFrame, keyCols: Seq[String],
                             orderCols: Seq[Column], verCol: Column,
                             opCol: Column = col("op"), deleteOp: String = "d",
                             truncateOp: String = "t"): DataFrame = {
    val cut = df.where(opCol === truncateOp)
      .agg(max(verCol).as("__t_ver")) // one row; null when no truncate
    // null-op rows are Kafka-compaction tombstones (B14), not truncates:
    // a bare `opCol =!= truncateOp` evaluates NULL for them and would
    // silently drop them BEFORE the window — resurrecting the tombstoned
    // key at its previous version even in a truncate-free batch
    val survivors = df.where(opCol =!= truncateOp || opCol.isNull)
      .crossJoin(broadcast(cut))
      .where(col("__t_ver").isNull || verCol > col("__t_ver"))
      .drop("__t_ver")
    changelog(survivors, keyCols, orderCols, opCol, deleteOp)
  }

  /** B6 — snapshot ∪ stream: union an initial consistent snapshot (op='r')
    * with a live change stream, then materialize. Snapshot rows sort below
    * any change with the same key (lsn 0), so replays at the boundary are
    * harmless — materialization is idempotent (property-tested).
    */
  def snapshotPlusDelta(snapshot: DataFrame, delta: DataFrame,
                        keyCols: Seq[String], orderCols: Seq[Column]): DataFrame =
    changelog(snapshot.unionByName(delta, allowMissingColumns = true), keyCols, orderCols)

  /** D8 — as-of join without an O(n·m) join: for each `probe` row, the
    * latest `build` row with the same key and build.ts <= probe.ts.
    *
    * Implementation is the union trick: tag both sides, union, and let one
    * hash-partitioned window carry the last build attributes forward onto
    * probe rows. ONE shuffle on the key, no join blowup, no per-key
    * collect — this scales to 100 TB where a naive join + filter + window
    * would first materialize every (probe × build) pair.
    *
    * Probe rows at the exact same timestamp as a build row see that build
    * row (at-or-before semantics); among equal-ts build rows the one with
    * the largest tiebreak wins.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, keyCol: String, tsCol: String,
               buildTiebreak: String, buildValueCols: Seq[String]): DataFrame = {
    val pTagged = probe.withColumn("__side", lit(1))
    val bCols = buildValueCols.map(c => col(c))
    val bTagged = build.withColumn("__side", lit(0))
    // align schemas: probe gets null build-value columns, build gets null probe columns
    val probeCols = probe.columns.toSeq
    val buildKeep = Seq(keyCol, tsCol, buildTiebreak) ++ buildValueCols
    val allProbe = pTagged.select(
      (probeCols.map(col) :+ col("__side")) ++
        buildValueCols.map(c => lit(null).cast(build.schema(c).dataType).as(s"__b_$c")) :+
        lit(null).cast(build.schema(buildTiebreak).dataType).as("__b_tb"): _*)
    val allBuild = bTagged.select(
      (probeCols.map(c => if (c == keyCol || c == tsCol) col(c)
      else lit(null).cast(probe.schema(c).dataType).as(c)) :+ col("__side")) ++
        buildValueCols.map(c => col(c).as(s"__b_$c")) :+
        col(buildTiebreak).as("__b_tb"): _*)
    // order: ts asc, then build rows BEFORE probe rows at equal ts
    // (at-or-before includes equal), then build tiebreak
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__b_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = buildValueCols.foldLeft(allProbe.unionByName(allBuild)) { (d, c) =>
      d.withColumn(s"__last_$c", last(col(s"__b_$c"), ignoreNulls = true).over(w))
    }
    carried
      .where(col("__side") === 1)
      .select(probeCols.map(col) ++ buildValueCols.map(c => col(s"__last_$c").as(s"${c}_asof")): _*)
  }

  /** B11 — snapshot diff: re-derive a change feed from two table
    * snapshots (the "CDC without a log" fallback every CDC platform
    * ships). Emits one row per changed key with `op` ∈ c/u/d and the
    * post-image (pre-image for deletes). One full-outer shuffle join on
    * the key — the minimum for an unordered diff; at 100 TB co-locate the
    * snapshots (bucket both by key) and the join is shuffle-free.
    * Null-safe struct comparison, so column nulls diff correctly.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    val valueCols = oldSnap.columns.filterNot(keyCols.contains).toSeq
    require(valueCols == newSnap.columns.filterNot(keyCols.contains).toSeq,
      "snapshots must share a schema")
    val o = oldSnap.select(keyCols.map(col) :+
      struct(valueCols.map(col): _*).as("__old"): _*)
    val n = newSnap.select(keyCols.map(col) :+
      struct(valueCols.map(col): _*).as("__new"): _*)
    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("__old").isNull, "c")
          .when(col("__new").isNull, "d")
          .when(!(col("__old") <=> col("__new")), "u"))
      .where(col("op").isNotNull)
      .withColumn("__img", coalesce(col("__new"), col("__old")))
      .select(keyCols.map(col) :+ col("op") :+ col("__img.*"): _*)
  }

  /** B12 — SCD Type-2 history: every change event becomes a versioned row
    * with a validity interval; the current row per key has a null
    * `valid_to`. One window per key (single shuffle) — the standard
    * warehouse materialization of a changelog when history must stay
    * queryable ("balance as of March").
    */
  def scd2(df: DataFrame, keyCols: Seq[String], orderCol: Column,
           tsCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol.asc)
    df.withColumn("valid_from", tsCol)
      .withColumn("valid_to", lead(tsCol, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
