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

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Write a fixture table in the same physical shape the driver data
    * uses (events.ts = INT64 ns since epoch). */
  def writeTable(dir: String, name: String, schema: StructType,
                 rows: Seq[Row]): Unit = {
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/$name.parquet")
  }

  /** events fixture row: ts given in SECONDS since epoch, stored as ns. */
  def eventRow(id: Long, tsSec: Long, user: Long, typ: String,
               value: Double, props: String = """{"k": 1}"""): Row =
    Row(id, tsSec * 1000000000L, user, typ, value, props)

  val eventsNsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = Schemas.documents
  val embeddingsSchema: StructType = Schemas.embeddings

  def collectSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: Row) => r.toSeq)
}
