package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
      else {
        val sink = spark.read.parquet(sinkDir)
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
}
