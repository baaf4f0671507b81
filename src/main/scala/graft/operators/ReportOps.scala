package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.SparkSession

/** Declarative report API — the reference's user surface: declare
  * dimensions + metrics + a date range, get an unsampled report
  * (SURVEY.md §0: "declarative config of which GA dimensions/metrics to
  * pull", day-bucketed). The "plan" here really is the config: it maps
  * 1:1 onto a Catalyst logical plan (filter → bucket → groupBy → agg),
  * so every optimizer rule applies and nothing is hand-scheduled.
  */
object ReportOps {

  /** One requested metric: aggregation ∈ {sum, avg, min, max, count,
    * count_distinct, approx_count_distinct}, input column, output alias. */
  final case class Metric(agg: String, column: String, alias: String)

  /** A report request. `dateBucket` ∈ {day, week, month, quarter, year}
    * adds a leading time dimension (the GA date axis). */
  final case class ReportSpec(
      dimensions: Seq[String],
      metrics: Seq[Metric],
      dateCol: String,
      startDate: String,
      endDate: String,
      dateBucket: Option[String] = Some("day"))

  private def metricCol(m: Metric): Column = {
    val c = col(m.column)
    val agg = m.agg match {
      case "sum" => round(sum(c), 4)
      case "avg" => round(avg(c), 4)
      case "min" => min(c)
      case "max" => max(c)
      case "count" => count(c)
      case "count_distinct" => countDistinct(c)
      case "approx_count_distinct" => approx_count_distinct(c, 0.01)
      case other => throw new IllegalArgumentException(s"unknown agg: $other")
    }
    agg.as(m.alias)
  }

  /** Run a report over a source table. Output is totally ordered on the
    * dimension columns (deterministic re-runs, SURVEY.md §2.10). */
  def run(source: DataFrame, spec: ReportSpec): DataFrame = {
    require(spec.metrics.nonEmpty, "a report needs at least one metric")
    val inRange = source.filter(
      col(spec.dateCol) >= lit(spec.startDate).cast("timestamp") &&
      col(spec.dateCol) < lit(spec.endDate).cast("timestamp"))
    val (bucketed, dims) = spec.dateBucket match {
      case Some(b) =>
        val bucket = date_trunc(b, col(spec.dateCol)).cast("date").as("period")
        (inRange.withColumn("period", bucket), "period" +: spec.dimensions)
      case None => (inRange, spec.dimensions)
    }
    bucketed
      .groupBy(dims.map(col): _*)
      .agg(metricCol(spec.metrics.head), spec.metrics.tail.map(metricCol): _*)
      .orderBy(dims.map(col): _*)
  }

  /** q_report_declarative — the reference's whole user surface as one
    * driver-checked query: a ReportSpec (dimensions + metrics + date
    * range + day bucket) compiled to filter → bucket → groupBy → agg.
    * The oracle is the SQL a GA user would have written by hand —
    * proving the declarative layer adds nothing and loses nothing. */
  def reportDeclarative(s: SparkSession, d: String): DataFrame =
    run(graft.Tables.events(s, d), ReportSpec(
      dimensions = Seq("event_type"),
      metrics = Seq(
        Metric("sum", "value", "total_value"),
        Metric("count", "event_id", "n"),
        Metric("count_distinct", "user_id", "n_users")),
      dateCol = "ts",
      startDate = "2024-01-05",
      endDate = "2024-01-20"))
}
