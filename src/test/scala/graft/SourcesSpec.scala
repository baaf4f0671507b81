package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DataSources

/** CSV/JSON/ORC round trips are lossless against the parquet source,
  * and the flagship aggregation computes identical results over every
  * format (format-independence of the engine). */
class SourcesSpec extends AnyFunSuite {
  import TestBase._

  test("orders round-trips through csv, json, and orc losslessly") {
    val orders = Tables.orders(spark, sf0001)
    val base = collectSet(orders)

    val csvDir = tmpDir("src_csv")
    DataSources.writeCsv(orders, csvDir)
    assert(collectSet(DataSources.readCsv(spark, csvDir, Schemas.orders)) == base, "csv")

    val jsonDir = tmpDir("src_json")
    DataSources.writeJson(orders, jsonDir)
    assert(collectSet(DataSources.readJson(spark, jsonDir, Schemas.orders)) == base, "json")

    val orcDir = tmpDir("src_orc")
    DataSources.writeOrc(orders, orcDir)
    assert(collectSet(DataSources.readOrc(spark, orcDir, Schemas.orders)) == base, "orc")
  }

  test("gated round trips: csv/json query results equal the parquet-direct aggregate") {
    def direct = Tables.events(spark, sf0001)
      .groupBy(col("event_type"),
               date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
           sum(expr("cast(round(value * 100) as bigint)")).as("cents"),
           count_distinct(col("user_id")).as("n_users"),
           sum(length(col("props")).cast("long")).as("props_len"))
    val want = collectSet(direct)
    assert(collectSet(graft.operators.FormatOps.csvRoundtrip(spark, sf0001)) == want, "csv")
    assert(collectSet(graft.operators.FormatOps.jsonRoundtrip(spark, sf0001)) == want, "json")
    assert(collectSet(graft.operators.FormatOps.orcRoundtrip(spark, sf0001)) == want, "orc")
  }

  test("flagship aggregation is format-independent") {
    val li = Tables.lineitem(spark, sf0001)
    def agg(df: org.apache.spark.sql.DataFrame) =
      collectSet(df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 4).as("q"),
             count(lit(1)).as("n")))
    val want = agg(li)
    val orcDir = tmpDir("src_orc_li")
    DataSources.writeOrc(li, orcDir)
    assert(agg(DataSources.readOrc(spark, orcDir, Schemas.lineitem)) == want)
    val csvDir = tmpDir("src_csv_li")
    DataSources.writeCsv(li, csvDir)
    assert(agg(DataSources.readCsv(spark, csvDir, Schemas.lineitem)) == want)
  }

  test("nation and orders round-trip through an embedded-Derby JDBC sink") {
    val url = s"jdbc:derby:${tmpDir("src_derby")}/db;create=true"
    val nation = Tables.nation(spark, sf0001)
    DataSources.writeJdbc(nation, url, "nation")
    assert(collectSet(DataSources.readJdbc(spark, url, "nation")) ==
      collectSet(nation), "nation")
    // timestamps + doubles survive too (Derby TIMESTAMP holds micros)
    val orders = Tables.orders(spark, sf0001).limit(100)
    DataSources.writeJdbc(orders, url, "orders_rt")
    assert(collectSet(DataSources.readJdbc(spark, url, "orders_rt")) ==
      collectSet(orders), "orders")
  }

  test("date-partitioned write produces day directories readable as DateType") {
    val dir = tmpDir("src_byday")
    DataSources.writeDatePartitioned(Tables.events(spark, sf0001), "ts", dir)
    val back = DataSources.readDatePartitioned(spark, dir)
    assert(back.schema("day").dataType.typeName == "date")
    assert(back.count() == Tables.events(spark, sf0001).count())
  }

  test("parquet schema evolution: added column merges, old files read null") {
    // the incremental-sink reality: a source adds a column mid-history.
    // mergeSchema unions the footers; rows from pre-evolution files
    // surface the new column as null instead of failing the read.
    import spark.implicits._
    val dir = tmpDir("src_evolve")
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val v2 = Seq((3L, "c", 9.5)).toDF("id", "name", "score")
    v1.write.parquet(s"$dir/batch=1")
    v2.write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("id", "name", "score", "batch"))
    assert(merged.count() == 3)
    assert(merged.filter(col("score").isNull).count() == 2)
    assert(merged.filter(col("score") === 9.5).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("FAILFAST surfaces malformed csv rows instead of nulling them") {
    val dir = tmpDir("src_bad")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.csv"),
      "o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority\n1,2,O,notanumber,2024-01-01T00:00:00.000000Z,1-URGENT\n".getBytes)
    val ex = intercept[Exception] {
      DataSources.readCsv(spark, dir, Schemas.orders).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      ex.getCause != null, s"expected a parse failure, got: ${ex.getMessage}")
  }
}
