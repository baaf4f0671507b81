package graft.operators

import graft.{Fin, Schemas}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-layout operators: the bucketed co-located fact⋈fact join
  * (SURVEY.md §7.5; README design rule 3 — "co-locate joins via
  * bucketing").
  *
  * Scale notes (100 TB): a fact⋈fact equi-join is THE shuffle that
  * dominates a warehouse — both sides are too big to broadcast, so every
  * query re-partitions both on the join key. Bucketing pays that shuffle
  * ONCE at write time: both tables are hash-clustered (and bucket-sorted)
  * on the key into the same bucket count, and every subsequent join reads
  * matching buckets side by side — zero exchanges before the join, at any
  * data size. The layout cost amortizes across every downstream query,
  * exactly like the reference's day-split layout amortizes date filters.
  */
object LayoutOps {
  import Fin._

  private val Buckets = 8

  /** Publish a bucketed copy of `table` (hash-clustered + bucket-sorted
    * on `key`) once per source state via [[graft.sources.BucketedStore]]
    * and return the catalog table name. */
  private def bucketedTable(s: SparkSession, d: String, table: String,
                            key: String): String =
    graft.sources.BucketedStore.table(
        s, d, s"$table.parquet", s"${table}_bucketed", key, Buckets) {
      s.read.schema(Schemas.all(table)).parquet(s"$d/$table.parquet")
    }

  /** Publish both bucketed join tables up front (fixture pre-publish —
    * see [[graft.SparkEntry.prepareFixtures]]). */
  def prepare(s: SparkSession, d: String): Unit = {
    bucketedTable(s, d, "orders", "o_orderkey")
    bucketedTable(s, d, "lineitem", "l_orderkey")
  }

  /** q_join_bucketed — orders⋈lineitem revenue per order status, both
    * sides read from bucketed tables clustered on the order key: the
    * join consumes co-located buckets directly, with NO exchange between
    * the scans and the SortMergeJoin (asserted in PlanSpec). The merge
    * hint pins the plan shape — at real scale neither fact side is
    * broadcastable, so the hint only makes the test honest at sf0.01.
    * Result is identical to the plain shuffle join (the oracle). */
  def joinBucketed(s: SparkSession, d: String): DataFrame = {
    val o = s.table(bucketedTable(s, d, "orders", "o_orderkey"))
    val li = s.table(bucketedTable(s, d, "lineitem", "l_orderkey"))
    // revenue in exact integer 1e-6-dollar units: 3 status groups ×
    // 200k+ rows each is enough float accumulation for the sum to drift
    // past the 4th decimal at 1e10 magnitude, so round(·,4) cannot
    // rescue a double sum here (at warehouse scale this is DECIMAL
    // arithmetic; the integer form is its exact small-scale twin)
    val revE6 = round(col("l_extendedprice") * 100).cast("long") *
      (lit(10000L) - round(col("l_discount") * 10000).cast("long"))
    ord(
      o.hint("merge")
        .join(li.hint("merge"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
             (sum(revE6).cast("double") / lit(1000000.0)).as("revenue")),
      col("o_orderstatus"))
  }
}
