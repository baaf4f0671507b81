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
  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // µs parquet output so driver-side pyarrow/duckdb compares see the
    // same physical unit as the DuckDB oracle's result timestamps.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
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
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    read(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
