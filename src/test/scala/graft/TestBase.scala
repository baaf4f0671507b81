package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Shared SparkSession + fixture helpers for the suite. */
object TestBase {
  lazy val spark: SparkSession = {
    // the same tuned configuration Bench times and Verify gates
    // (GraftSession) — plan guards assert against the benched plans
    val s = GraftSession.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf0001 = "/root/testdata/sf0.001"
  /** The driver's correctness-gate SF — used by the suite only where an
    * assertion is about accuracy ON THE DRIVER'S OWN DATA (sketch
    * bounds); day-to-day fixtures stay at sf0.001 for speed. */
  val sf001 = "/root/testdata/sf0.01"

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  def writeTable(dir: String, name: String, schema: StructType,
                 rows: Seq[Row]): Unit = {
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/$name.parquet")
  }

  /** Encoding-neutral events fixture row: ts given in SECONDS since
    * epoch; [[writeEvents]] converts to the requested physical unit. */
  def eventRow(id: Long, tsSec: Long, user: Long, typ: String,
               value: Double, props: String = """{"k": 1}"""): Row =
    Row(id, tsSec, user, typ, value, props)

  /** Physical schema of the LEGACY driver encoding (INT64 ns). */
  val eventsNsSchema: StructType = Schemas.eventsNsPhysical

  /** Write an events fixture in a driver-observed physical encoding:
    * "us" (TIMESTAMP(MICROS) — current driver data since 2026-08-13,
    * the default) or "ns" (INT64 ns — the pre-r10 format Tables.events
    * still supports via footer detection). Specs default to µs so the
    * suite exercises what the driver actually ships; TsEncodingSpec
    * pins both branches explicitly. */
  def writeEvents(dir: String, rows: Seq[Row], unit: String = "us"): Unit =
    unit match {
      case "ns" =>
        writeTable(dir, "events", eventsNsSchema, rows.map(r =>
          Row(r.getLong(0), r.getLong(1) * 1000000000L,
              r.get(2), r.get(3), r.get(4), r.get(5))))
      case "us" =>
        // without the explicit conf Spark may write INT96, which neither
        // driver encoding ever used and the footer detector rejects
        spark.conf.set("spark.sql.parquet.outputTimestampType",
                       "TIMESTAMP_MICROS")
        writeTable(dir, "events", Schemas.events, rows.map(r =>
          Row(r.getLong(0),
              java.sql.Timestamp.from(
                java.time.Instant.ofEpochSecond(r.getLong(1))),
              r.get(2), r.get(3), r.get(4), r.get(5))))
      case other => sys.error(s"unknown events ts unit: $other")
    }

  val documentsSchema: StructType = Schemas.documents
  val embeddingsSchema: StructType = Schemas.embeddings

  def collectSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: Row) => r.toSeq)
}
