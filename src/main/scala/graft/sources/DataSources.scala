package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format adapters beyond parquet (round brief: "every
  * operator, source/sink"). All readers take the DECLARED schema —
  * inference is disabled engine-wide so schema drift fails loudly and
  * (for CSV/JSON) the reader skips the expensive inference pre-scan,
  * which at 100 TB would read the data twice.
  *
  * Timestamp handling is pinned (UTC, ISO-8601 with microseconds) so a
  * parquet→csv→parquet round trip is lossless to the µs.
  */
object DataSources {
  val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(dir)

  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not silently null
      .csv(dir)

  def writeJson(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", TsFmt)
      .json(dir)

  def readJson(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", TsFmt)
      .option("mode", "FAILFAST")
      .json(dir)

  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  def readOrc(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)
}
