package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ingest — the reference's core capability (SURVEY.md §0:
  * "incremental sync: read the max already-loaded timestamp from the
  * sink, pull only newer data, append; synthetic hash id for idempotent
  * re-loads"), rebuilt batch-native on Spark. The streaming-native form
  * is graft.streaming.StreamingOps (watermark + dropDuplicatesWithinWatermark).
  *
  * 100 TB design:
  *  - the high-water-mark read touches only the sink's footer stats
  *    (a max() over one column — parquet row-group stats make this a
  *    metadata-ish scan; on a date-partitioned sink it prunes to the
  *    last partitions);
  *  - the idempotency anti-join is NOT against the whole sink: only
  *    sink rows within `overlapSlack` of the high-water mark are read
  *    back, because older duplicates are already excluded by the
  *    watermark filter. State is O(slack window), not O(history) —
  *    the batch analogue of a streaming watermark.
  */
object IngestOps {
  /** Deterministic synthetic row id from the identifying columns —
    * idempotent re-loads dedup on it (the reference's hash id). */
  def rowId(keyCols: Seq[String]) =
    // JSON of a NAMED struct, not concatenation: this can never merge
    // adjacent values and it preserves NULLs (concat_ws drops them),
    // so distinct key tuples cannot collide
    sha2(to_json(struct(keyCols.map(col): _*)), 256)

  /** The not-yet-loaded source rows for one incremental round: rows
    * newer than the sink's high-water mark minus `overlapSlackSec`,
    * minus those already present (by synthetic `row_id`) in the sink's
    * overlap window. Both frames must carry `row_id`. The hwm read is
    * one scalar aggregate (parquet footer stats); the anti-join touches
    * only the O(slack) tail of the sink — never its history. */
  def freshRows(src: DataFrame, sink: DataFrame, tsCol: String,
                overlapSlackSec: Long): DataFrame = {
    val hwmRow = sink.agg(max(col(tsCol))).head()
    if (hwmRow.isNullAt(0)) src
    else {
      val hwm = hwmRow.getTimestamp(0)
      val cutoff = new java.sql.Timestamp(hwm.getTime - overlapSlackSec * 1000)
      // only newer-than-cutoff source rows can be new…
      val candidates = src.filter(col(tsCol) > lit(cutoff))
      // …and only the sink's overlap window can contain their dups
      val recentIds = sink.filter(col(tsCol) > lit(cutoff)).select("row_id")
      candidates.join(recentIds, Seq("row_id"), "left_anti")
    }
  }

  /** Append to `sinkDir` only source rows that are (a) newer than the
    * sink's high-water mark minus `overlapSlackSec` and (b) not already
    * present (by synthetic id) in the overlap window. Returns the number
    * of rows appended. */
  def incrementalAppend(
      spark: SparkSession,
      source: DataFrame,
      sinkDir: String,
      tsCol: String,
      keyCols: Seq[String],
      overlapSlackSec: Long = 3600): Long = {
    val src = source.withColumn("row_id", rowId(keyCols))
    // filesystem-agnostic existence check (java.io.File would always say
    // "no" for hdfs:// or s3a:// sinks and silently re-append everything)
    val sinkPath = new org.apache.hadoop.fs.Path(sinkDir)
    val fs = sinkPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sinkExists = fs.exists(sinkPath) && fs.listStatus(sinkPath).nonEmpty
    val fresh =
      if (!sinkExists) src
      else freshRows(src, spark.read.parquet(sinkDir), tsCol, overlapSlackSec)
    // persist: count + write would otherwise each re-run the full
    // source-scan + sink-scan + anti-join plan
    fresh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = fresh.count()
      if (n > 0)
        fresh.write.mode(SaveMode.Append).parquet(sinkDir)
      n
    } finally fresh.unpersist()
  }

  /** Latest-wins upsert of `deltaState` into `baseState`, keyed by
    * `keyCols` — the batch form of the reference's SQL-sink load step
    * (ON DUPLICATE KEY UPDATE: a delta row REPLACES the base row of its
    * key; keys absent from the delta keep their base row). Emits the
    * merged snapshot plus a `merge_status` column
    * (kept | updated | inserted) so callers can audit the round.
    *
    * Non-key columns must match between the two frames. One
    * co-partitioned full-outer join on the key — the scale-canonical
    * state-merge shape (both sides shuffle once on the same key; at
    * 100 TB bucketing the sink on the key removes even that). */
  def upsertSnapshot(baseState: DataFrame, deltaState: DataFrame,
                     keyCols: Seq[String]): DataFrame = {
    val valCols = baseState.columns.filterNot(keyCols.contains).toSeq
    require(valCols.forall(deltaState.columns.contains),
      s"delta is missing value columns: ${valCols.filterNot(deltaState.columns.contains)}")
    // dedicated presence markers, NOT a value column's null-ness: value
    // columns may be legitimately null, which would misclassify the row
    // (and a null delta value must still OVERWRITE the base value)
    val b = valCols.foldLeft(baseState)((df, c) => df.withColumnRenamed(c, s"b_$c"))
      .withColumn("b_present", lit(true))
    val dd = valCols.foldLeft(deltaState.select((keyCols ++ valCols).map(col): _*))(
      (df, c) => df.withColumnRenamed(c, s"d_$c"))
      .withColumn("d_present", lit(true))
    b.join(dd, keyCols, "full")
      .select(keyCols.map(col) ++
        valCols.map(c => when(col("d_present").isNotNull, col(s"d_$c"))
          .otherwise(col(s"b_$c")).as(c)) :+
        when(col("d_present").isNull, lit("kept"))
          .when(col("b_present").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("merge_status"): _*)
  }

  /** Seed instant for the q_ingest_incremental sink fixture: events
    * strictly before this are "already loaded". Sits ~10 days before
    * the events table's end (2024-01-30), so one incremental round has
    * a real backlog to pick up at every SF. */
  val SinkCutoff = "2024-01-21 00:00:00"

  /** Overlap slack for q_ingest_incremental — the batch analogue of a
    * 1-hour watermark. */
  val SlackSec = 3600L

  /** The pre-seeded ingest sink (parquet, with synthetic row ids):
    * events strictly before [[SinkCutoff]]. Materialized once per
    * source state via [[graft.sources.CachedDir]] — so the query below
    * genuinely reads its high-water mark back from a parquet sink, the
    * way a production incremental load does. */
  def ingestSinkDir(s: SparkSession, d: String): String =
    graft.sources.CachedDir.materialize(s, d, "events.parquet", "ingest_sink") {
      tmp =>
        graft.Tables.events(s, d)
          .filter(col("ts") < lit(SinkCutoff).cast("timestamp"))
          .withColumn("row_id", rowId(Seq("event_id")))
          .write.parquet(tmp)
    }

  /** q_ingest_incremental — the reference's defining capability as a
    * driver-checked query: one incremental-sync round against a real
    * parquet sink. Reads the sink's high-water mark (one scalar
    * aggregate over footer stats), pulls only source rows newer than
    * hwm − slack, anti-joins the sink's overlap window by synthetic id
    * (idempotency: re-running appends nothing twice), and emits the
    * appended-batch summary per event type. Read-only — the append
    * itself (and multi-round convergence) is incrementalAppend,
    * exercised by IngestReportSpec; this query IS its `fresh` plan.
    *
    * 100 TB shape: hwm = max over one column (row-group stats); the
    * anti-join reads O(slack window) of the sink, never its history; the
    * source filter pushes down to the scan. Output is a per-type rollup
    * — one partial-aggregable shuffle. */
  /** q_merge_upsert — the load half of the reference's sync as a
    * driver-checked query: per-(user, event_type) "current state"
    * snapshots from before/after the cutoff, the delta upserted into
    * the base ([[upsertSnapshot]]), summarized per event type with the
    * kept/updated/inserted audit counts.
    *
    * Each state snapshot is one partial-aggregable `max_by` on the key
    * (latest row by (ts, event_id) — the id tie-break keeps equal-ts
    * rows deterministic); the merge is the co-partitioned full join.
    * No windows anywhere. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    import graft.Fin._
    val e = graft.Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"),
              col("value"), col("event_id"))
    val cut = lit(SinkCutoff).cast("timestamp")
    def latestState(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"), col("event_type"))
        .agg(max_by(struct(col("ts"), col("value")),
                    struct(col("ts"), col("event_id"))).as("st"))
        .select(col("user_id"), col("event_type"),
                col("st.ts").as("ts"), col("st.value").as("value"))
    val merged = upsertSnapshot(
      latestState(e.filter(col("ts") < cut)),
      latestState(e.filter(col("ts") >= cut)),
      Seq("user_id", "event_type"))
    ord(
      merged.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_keys"),
             sum(when(col("merge_status") === "updated", 1L).otherwise(0L))
               .as("n_updated"),
             sum(when(col("merge_status") === "inserted", 1L).otherwise(0L))
               .as("n_inserted"),
             r4(sum(col("value"))).as("total_value"),
             epochSec(max(col("ts"))).as("last_sec")),
      col("event_type"))
  }

  /** q_scd2_history — slowly-changing-dimension type-2 history, the
    * warehouse-load companion of [[mergeUpsert]]: instead of keeping
    * only each key's current state, keep every state INTERVAL. Tracks
    * each user's event_type: consecutive equal values compress into one
    * row with [valid_from, valid_to) epoch-second bounds; the current
    * segment's valid_to is null; `ver` numbers a user's segments.
    *
    * Scale shape: one shuffle on user_id, then all three window passes
    * (change detection, interval close, version number) run over the
    * SAME (user_id, ts, event_id) sort — Spark plans one exchange + one
    * sort, reused. No joins, no second shuffle. Determinism: ordering
    * ties break on the unique event_id; interval bounds are integral
    * epoch seconds. */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    import graft.Fin._
    import org.apache.spark.sql.expressions.Window
    val e = graft.Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val seg = e.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    val iv = seg
      .withColumn("valid_from_sec", epochSec(col("ts")))
      .withColumn("valid_to_sec", lead(col("valid_from_sec"), 1).over(w))
      .withColumn("ver", row_number().over(w).cast("int"))
    ord(
      iv.select(col("user_id"), col("event_type"),
                col("valid_from_sec"), col("valid_to_sec"), col("ver")),
      col("user_id"), col("ver"))
  }

  /** q_as_of_state — the TIME-TRAVEL read over the SCD2 history: each
    * user's state segment valid AT [[SinkCutoff]] (half-open interval
    * semantics: valid_from ≤ T < valid_to, open segment = NULL
    * valid_to). This is the query a warehouse answers with "what did
    * the dimension look like last Tuesday" — the reporting companion
    * of [[scd2History]]'s load path.
    *
    * Scale shape: inherits the history's single user_id shuffle (the
    * three window passes share one exchange); the as-of predicate is a
    * post-window filter that keeps ≤ 1 row per user. A warehouse
    * would store the history valid_from-sorted and push the predicate
    * into the scan; the interval semantics are what's under test. */
  def asOfState(s: SparkSession, d: String): DataFrame = {
    import graft.Fin._
    val t = lit(SinkCutoff).cast("timestamp").cast("long")
    ord(
      scd2History(s, d)
        .filter(col("valid_from_sec") <= t &&
                (col("valid_to_sec").isNull || col("valid_to_sec") > t))
        .select(col("user_id"), col("event_type"),
                col("valid_from_sec"), col("ver")),
      col("user_id"))
  }

  def ingestIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.Fin._
    val sink = s.read.parquet(ingestSinkDir(s, d))
    val src = graft.Tables.events(s, d)
      .withColumn("row_id", rowId(Seq("event_id")))
    val fresh = freshRows(src, sink, "ts", SlackSec)
    ord(
      fresh.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_appended"),
             r4(sum(col("value"))).as("val_appended"),
             epochSec(min(col("ts"))).as("first_sec"),
             epochSec(max(col("ts"))).as("last_sec")),
      col("event_type"))
  }

  /** The standing (day, event_type) report over the history partition
    * (days strictly before [[SinkCutoff]]), materialized once per
    * source state. Additive metrics only — count and exact integer
    * cents — BECAUSE they merge: a stored aggregate can absorb a delta
    * iff every metric is partial-aggregable (sum/count/min/max; never
    * avg or a rounded double, which lose the information merging
    * needs — avg is re-derived from the merged sums at read time). */
  def historyReportDir(s: SparkSession, d: String): String =
    graft.sources.CachedDir.materialize(s, d, "events.parquet", "hist_report") {
      tmp =>
        graft.Tables.events(s, d)
          .filter(col("ts") < lit(SinkCutoff).cast("timestamp"))
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
               sum(round(col("value") * 100).cast("long")).as("cents"))
          .write.parquet(tmp)
    }

  private val historyReportSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("day",
      org.apache.spark.sql.types.DateType),
    org.apache.spark.sql.types.StructField("event_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cents",
      org.apache.spark.sql.types.LongType)))

  /** q_agg_incremental — incremental report refresh, the reference's
    * daily-report update loop as one query: the standing (day, type)
    * report is READ BACK from its parquet materialization (history is
    * never rescanned), the delta (events at/after the cutoff) is
    * aggregated fresh, and the two merge with one re-aggregation over
    * their union — the classic partial-aggregate merge. The oracle
    * recomputes the same report from scratch over all events, proving
    * the incremental path result-identical to the full rescan.
    *
    * 100 TB shape: the refresh costs O(delta) + O(standing report),
    * independent of history volume — exactly the reference's
    * high-water-mark economics applied to AGGREGATES instead of rows
    * (q_ingest_incremental covers the row path). Determinism: metrics
    * are exact integers end to end; the average derives from the merged
    * sums via the integer round4 division (the q_gap_fill rule). */
  def aggIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.Fin._
    val hist = s.read.schema(historyReportSchema).parquet(historyReportDir(s, d))
    val delta = graft.Tables.events(s, d)
      .filter(col("ts") >= lit(SinkCutoff).cast("timestamp"))
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(round(col("value") * 100).cast("long")).as("cents"))
    ord(
      hist.unionByName(delta)
        .groupBy(col("day"), col("event_type"))
        .agg(sum(col("n")).as("n_events"), sum(col("cents")).as("c"))
        .select(col("day"), col("event_type"), col("n_events"),
                (col("c").cast("double") / 100.0).as("total_value"),
                (expr("(20000 * c + 100 * n_events) DIV (200 * n_events)")
                  .cast("double") / lit(10000.0)).as("avg_value")),
      col("day"), col("event_type"))
  }

  /** q_snapshot_diff — CDC between two table snapshots: per change type
    * (insert / delete / update / unchanged), key count and exact-cent
    * totals of both sides. Completes the warehouse-sync triangle beside
    * [[mergeUpsert]] (apply a delta) and [[scd2History]] (keep history):
    * diff DERIVES the delta when the upstream can only hand over full
    * snapshots — the recurring full-export reality of most sources.
    *
    * Snapshots are carved deterministically from orders so the oracle
    * reproduces them: old = keys %13 ≠ 0 at original price, new = keys
    * %11 ≠ 0 with +10.00 on keys %7 = 0 (exact double addition — no
    * rounding ambiguity in the update predicate; %13-only keys surface
    * as inserts, %11 as deletes).
    *
    * Scale shape: ONE co-partitioned full-outer join on the key — both
    * snapshots shuffle once (bucketed snapshot layouts would kill even
    * that, q_join_bucketed's trade) — and a partial-aggregable rollup.
    * Totals in exact integer cents (the q_join_bucketed idiom):
    * change-class sums at warehouse scale accumulate enough doubles
    * that round(·,4) cannot rescue a float sum. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    import graft.Fin._
    val o = graft.Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
    val old = o.filter(col("k") % 13 =!= 0).select(col("k"), col("p").as("p_old"))
    val neu = o.filter(col("k") % 11 =!= 0)
      .select(col("k"),
              when(col("k") % 7 === 0, col("p") + lit(10.0))
                .otherwise(col("p")).as("p_new"))
    val cents = (c: Column) =>
      when(c.isNull, 0L).otherwise(round(c * 100).cast("long"))
    ord(
      old.join(neu, Seq("k"), "full_outer")
        .withColumn("change_type",
          when(col("p_old").isNull, "insert")
            .when(col("p_new").isNull, "delete")
            .when(col("p_old") =!= col("p_new"), "update")
            .otherwise("unchanged"))
        .groupBy(col("change_type"))
        .agg(count(lit(1)).as("n_keys"),
             sum(cents(col("p_new"))).as("total_new_c"),
             sum(cents(col("p_old"))).as("total_old_c")),
      col("change_type"))
  }

  /** q_cdc_apply — ordered change-log application with DELETES, the
    * piece [[mergeUpsert]] (latest-wins upsert, no tombstones) and
    * [[snapshotDiff]] (derive the delta) leave open: a CDC feed is a
    * SEQUENCE of I/U/D records per key, and only the LAST operation in
    * sequence order decides the key's fate. Emits the post-apply audit
    * per outcome class: untouched (no log record), updated, inserted,
    * deleted, ghost_delete (a delete for a key the base never had — the
    * at-least-once-delivery case an apply job must tolerate, not crash
    * on), with exact-cent totals of the surviving state.
    *
    * Deterministic carving (oracle reproduces it, and it makes ALL
    * FIVE outcome classes materialize at the driver's gate SF): base =
    * latest pre-[[SinkCutoff]] state of users with user_id % 5 ≠ 0
    * (the excluded fifth become insert candidates); log = post-cutoff
    * events of users with user_id % 7 ≠ 1 (the excluded ones surface
    * as untouched) in (ts, event_id) sequence order, op = D where
    * event_id % 5 = 0 else U (upsert).
    *
    * Scale shape: the log collapses to one record per key via a
    * partial-aggregable `max_by` on the (ts, event_id) struct — the
    * sequence NEVER materializes per key, so a key with a million
    * change records still ships one row past the shuffle. Base and
    * collapsed log meet in ONE co-partitioned full-outer join on the
    * key (both sides hash-partition identically; bucketed layouts would
    * kill even that). Surviving value totals are exact integer cents —
    * the snapshotDiff idiom. */
  def cdcApply(s: SparkSession, d: String): DataFrame = {
    import graft.Fin._
    val cut = lit(SinkCutoff).cast("timestamp")
    val e = graft.Tables.events(s, d)
    val base = e.filter(col("ts") < cut && col("user_id") % 5 =!= 0)
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("event_type"), col("value")),
                  struct(col("ts"), col("event_id"))).as("st"))
      .select(col("user_id"), col("st.event_type").as("base_type"),
              col("st.value").as("base_value"))
    val lastOp = e.filter(col("ts") >= cut && col("user_id") % 7 =!= 1)
      .groupBy(col("user_id"))
      .agg(max_by(struct(when(col("event_id") % 5 === 0, "D")
                           .otherwise("U").as("op"),
                         col("value").as("log_value")),
                  struct(col("ts"), col("event_id"))).as("lo"))
      .select(col("user_id"), col("lo.op").as("op"),
              col("lo.log_value").as("log_value"))
    val cents = (c: Column) =>
      when(c.isNull, 0L).otherwise(round(c * 100).cast("long"))
    ord(
      base.join(lastOp, Seq("user_id"), "full_outer")
        .withColumn("status",
          when(col("op").isNull, "untouched")
            .when(col("op") === "D" && col("base_type").isNull, "ghost_delete")
            .when(col("op") === "D", "deleted")
            .when(col("base_type").isNull, "inserted")
            .otherwise("updated"))
        .withColumn("final_value",
          when(col("op").isNull, col("base_value"))
            .when(col("op") === "U", col("log_value")))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_keys"),
             sum(cents(col("final_value"))).as("final_cents")),
      col("status"))
  }

  /** q_freshness — ingest-freshness audit: per event type, row count,
    * last-seen epoch second, lag behind the corpus high-water mark, and
    * a stale flag (>24 h behind). The monitoring face of the reference's
    * high-water-mark sync: a type whose feed silently stopped shows up
    * here before any report goes wrong. All-integer arithmetic.
    *
    * Scale shape: ONE partial-aggregable pass computes every type's max
    * and count; the corpus max rides a 1-row broadcast. */
  def freshness(s: SparkSession, d: String): DataFrame = {
    import graft.Fin._
    val e = graft.Tables.events(s, d)
      .select(col("event_type"), epochSec(col("ts")).as("sec"))
    val perType = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), max(col("sec")).as("last_sec"))
    val hwm = perType.agg(max(col("last_sec")).as("hwm_sec"))
    ord(
      perType.crossJoin(broadcast(hwm))
        .select(col("event_type"), col("n_events"), col("last_sec"),
          (col("hwm_sec") - col("last_sec")).as("lag_sec"),
          when(col("hwm_sec") - col("last_sec") > 86400, 1).otherwise(0)
            .as("stale")),
      col("event_type"))
  }
}
