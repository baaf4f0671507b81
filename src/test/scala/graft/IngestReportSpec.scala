package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IngestOps, ReportOps}
import graft.operators.ReportOps.{Metric, ReportSpec}

/** The reference's two user surfaces rebuilt on Spark: incremental
  * high-water-mark ingest with idempotent re-loads, and declarative
  * dimension/metric reports. */
class IngestReportSpec extends AnyFunSuite {
  import TestBase._

  test("incremental append: overlap re-load is idempotent, new rows land once") {
    val sink = tmpDir("ingest_sink") + "/sink"
    val ev = Tables.events(spark, sf0001)
    val keys = Seq("event_id", "user_id", "event_type")

    // initial load: first half of the month
    val b1 = ev.filter(col("ts") < lit("2024-01-15").cast("timestamp"))
    val n1 = IngestOps.incrementalAppend(spark, b1, sink, "ts", keys)
    assert(n1 == b1.count())

    // second batch OVERLAPS (Jan 10 – 31): only post-hwm rows append
    val b2 = ev.filter(col("ts") >= lit("2024-01-10").cast("timestamp"))
    val n2 = IngestOps.incrementalAppend(spark, b2, sink, "ts", keys)
    val total = spark.read.parquet(sink).count()
    assert(total == ev.count(), s"sink=$total events=${ev.count()}")
    assert(n1 + n2 == ev.count())

    // exact re-load of the same batch: nothing appended (idempotent)
    val n3 = IngestOps.incrementalAppend(spark, b2, sink, "ts", keys)
    assert(n3 == 0, s"re-load appended $n3 rows")
    assert(spark.read.parquet(sink).select("row_id").distinct().count() == ev.count())
  }

  test("declarative report equals the handwritten aggregation") {
    val ev = Tables.events(spark, sf0001)
    val spec = ReportSpec(
      dimensions = Seq("event_type"),
      metrics = Seq(Metric("count", "event_id", "hits"),
                    Metric("sum", "value", "total_value"),
                    Metric("count_distinct", "user_id", "users")),
      dateCol = "ts", startDate = "2024-01-05", endDate = "2024-01-20")
    val got = ReportOps.run(ev, spec)
    val want = ev
      .filter(col("ts") >= lit("2024-01-05").cast("timestamp") &&
              col("ts") < lit("2024-01-20").cast("timestamp"))
      .groupBy(date_trunc("day", col("ts")).cast("date").as("period"), col("event_type"))
      .agg(count(col("event_id")).as("hits"),
           round(sum(col("value")), 4).as("total_value"),
           countDistinct(col("user_id")).as("users"))
    assert(collectSet(got) == collectSet(want))
    assert(got.count() > 0)
  }

  test("report without date bucket and with monthly bucket") {
    val ev = Tables.events(spark, sf0001)
    val flat = ReportOps.run(ev, ReportSpec(Seq("event_type"),
      Seq(Metric("avg", "value", "avg_value")), "ts",
      "2024-01-01", "2024-02-01", dateBucket = None))
    assert(flat.columns.toSeq == Seq("event_type", "avg_value"))
    assert(flat.count() == 5)
    val monthly = ReportOps.run(ev, ReportSpec(Seq(),
      Seq(Metric("count", "event_id", "hits")), "ts",
      "2024-01-01", "2024-02-01", dateBucket = Some("month")))
    assert(monthly.count() == 1)
  }

  test("unknown aggregation is rejected") {
    val ev = Tables.events(spark, sf0001)
    assertThrows[IllegalArgumentException] {
      ReportOps.run(ev, ReportSpec(Seq("event_type"),
        Seq(Metric("median", "value", "m")), "ts", "2024-01-01", "2024-02-01"))
    }
  }
}
