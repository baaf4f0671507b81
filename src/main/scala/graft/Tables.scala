package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-checked readers: sfDir => DataFrame (SURVEY.md §7.3).
  *
  * Every query funnels its scans through here so that:
  *  - the declared schema is applied (vectorized reader stays on,
  *    filter pushdown sees raw typed columns);
  *  - parquet written downstream uses µs timestamps (matching what the
  *    DuckDB oracle emits — SURVEY.md §2.10 rule 4);
  *  - at 100 TB the same entry point would take a partitioned root dir
  *    (date-partitioned layout, SURVEY.md §7.5) with no query changes.
  */
object Tables {
  /** Deliberate session side effect: the driver harness builds its own
    * SparkSession (Verify/Bench) that this library cannot configure up
    * front, so the two confs every query depends on are pinned at first
    * read (guarded — no churn on repeat calls). µs parquet output makes
    * driver-side DuckDB compares see the same timestamp unit the oracle
    * emits. */
  private def ensureConf(spark: SparkSession, key: String, value: String): Unit =
    if (!spark.conf.getOption(key).contains(value)) spark.conf.set(key, value)

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureConf(spark, "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.read.schema(Schemas.all(name)).parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")

  /** events.ts arrives as INT64 ns; convert with integral division
    * (`DIV`, not `/` — a double division would lose precision at 1.7e18)
    * to µs TimestampType, identical to DuckDB's `ts::TIMESTAMP`. */
  def events(s: SparkSession, d: String): DataFrame = {
    ensureConf(s, "spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    read(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
