package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order layout claim behind q_zorder_stats: interleaving the two
  * keys' bits bounds EVERY file's span in BOTH dimensions, where a
  * linear sort leaves the trailing dimension's span at ~the full domain
  * (so only the leading key can prune files). */
class ZorderSpec extends AnyFunSuite {
  import TestBase._

  test("z-order bounds per-file spans in both dimensions; linear sort does not") {
    val stats = operators.LayoutOps.zorderStats(spark, sf0001).collect()
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_suppkey"))
    val Array(pkMax, skMax) = li
      .agg(max("l_partkey"), max("l_suppkey")).collect()
      .map(r => Array(r.getLong(0), r.getLong(1))).head

    // every z-file spans <= 1/2^(bits/2) of each domain (one cell),
    // +2 cells slack for the scaling arithmetic at tiny SF
    val cellPk = (pkMax + 1) / 16.0
    val cellSk = (skMax + 1) / 16.0
    stats.foreach { r =>
      val pkSpan = r.getAs[Long]("pk_max") - r.getAs[Long]("pk_min")
      val skSpan = r.getAs[Long]("sk_max") - r.getAs[Long]("sk_min")
      assert(pkSpan <= cellPk * 3, s"file ${r.get(0)} pk span $pkSpan")
      assert(skSpan <= cellSk * 3, s"file ${r.get(0)} sk span $skSpan")
    }

    // linear layout: same file count, files cut along the partkey
    // order — the suppkey span per file stays ~the whole domain
    val n = li.count()
    // monotonically_increasing_id is NOT dense across partitions; use a
    // deterministic single-partition rank for the tiny test frame
    val ranked = li.coalesce(1)
      .orderBy(col("l_partkey"), col("l_suppkey"))
      .withColumn("rn", monotonically_increasing_id())
      .withColumn("file_id", floor(col("rn") * 256 / n).cast("long"))
    val linSpans = ranked.groupBy(col("file_id"))
      .agg((max(col("l_suppkey")) - min(col("l_suppkey"))).as("sk_span"))
      .agg(max(col("sk_span"))).collect().head.getLong(0)
    assert(linSpans >= skMax / 2,
      s"linear layout unexpectedly bounded the trailing dim: $linSpans vs domain $skMax")
  }
}
