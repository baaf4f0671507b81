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

  /** Date-partitioned parquet sink — the day-split layout (one directory
    * per day derived from `tsCol`). At 100 TB this is THE fact-table
    * layout: a day-range query prunes the directory listing down to the
    * selected partitions before any file is opened (PartitionFilters),
    * and incremental loads append whole new day directories
    * idempotently. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, dir: String): Unit = {
    import org.apache.spark.sql.functions.{col, to_date}
    // sortWithinPartitions(day, ts): rows land in their day-directory in
    // ts order, so every parquet row group carries tight min/max ts
    // stats — intra-day time-range predicates then skip row groups on
    // top of the directory-level partition pruning.
    // repartition on the partition column first: each day lands in one
    // task → one file per day-directory, instead of every input task
    // writing a sliver into every day it touches (tasks × days files)
    df.withColumn("day", to_date(col(tsCol)))
      .repartition(col("day"))
      .sortWithinPartitions(col("day"), col(tsCol))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
  }

  /** Companion reader; `day` comes back as a DateType partition column,
    * so filters on it prune directories, not rows. */
  def readDatePartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** JDBC sink (embedded Derby by default — the offline stand-in for the
    * reference's SQL-database sink). Embedded Derby tolerates only one
    * writer connection, hence `numPartitions = 1` default; a real RDBMS
    * takes a higher writer count. `repartition`, NOT `coalesce`: a
    * coalesce(1) would collapse the whole upstream computation into one
    * task, while a repartition keeps it parallel and funnels only the
    * final write. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                numPartitions: Int = 1): Unit =
    df.repartition(numPartitions).write.mode("overwrite")
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", DerbyDriver)
      .save()

  /** JDBC source; schema comes from the database's own metadata. */
  def readJdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", DerbyDriver)
      .load()
}
