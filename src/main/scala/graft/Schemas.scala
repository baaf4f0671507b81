package graft

import org.apache.spark.sql.types._

/** Declared schemas for every test table (SURVEY.md §1.2).
  *
  * Schemas are fixed and asserted at read time (`spark.read.schema(...)`)
  * so that drift in the driver-generated parquet fails loudly instead of
  * silently changing inference — mirroring the reference's config-declared
  * dimension/metric lists (SURVEY.md §1.1, capability-level).
  *
  * 100 TB note: declaring schemas (vs. inference) also avoids a
  * footer-listing job over millions of files on a real cluster.
  */
object Schemas {
  val region = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** The LOGICAL events schema every query sees: ts is µs TimestampType.
    * The physical parquet encoding of `ts` has drifted across driver
    * regenerations (INT64 TIMESTAMP(NANOS) through r8; TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) since 2026-08-13) — [[Tables.events]] detects
    * the file's logical type from the parquet footer and normalizes both
    * encodings to this schema (SURVEY.md §2.10 rule 4). */
  val events = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Physical read schema for the LEGACY ns encoding: Spark cannot read
    * INT64 TIMESTAMP(NANOS) as TimestampType, so it is declared LongType
    * (with spark.sql.legacy.parquet.nanosAsLong) and truncated to µs in
    * Tables.events — matching DuckDB's `ts::TIMESTAMP` truncation. */
  val eventsNsPhysical = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val all: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)
}
