package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Once-per-source-state BUCKETED materialization: [[CachedDir]]'s
  * fingerprint + ATOMIC_MOVE discipline, plus hash-clustered bucket
  * layout and catalog registration.
  *
  * Why bucketing for a derived store: every consumer that joins,
  * groups, or windows on the bucket key reads co-located buckets with
  * NO exchange — `HashPartitioning(key)` satisfies any
  * `ClusteredDistribution` whose clustering contains the key, so even
  * compound aggregations like groupBy(user_id, sid) run shuffle-free
  * on a user_id-bucketed store. The one-time layout cost amortizes
  * across every downstream query — the same economics as the
  * reference's day-split sink.
  *
  * The bucketed files are produced by `saveAsTable` into a temp
  * location (bucket ids live in the file names), the build table is
  * dropped (external — files stay), the dir is published atomically,
  * and an external `CLUSTERED BY` table is registered over it. The
  * catalog name embeds the source fingerprint, so a regenerated source
  * gets a fresh table, never a stale mapping; later JVMs reuse the
  * files and replay only the cheap DDL. */
object BucketedStore {
  /** Publish a bucketed (and optionally date-partitioned) derived
    * store. `partitionCol`, when set, layers hive-style directory
    * partitioning OVER the hash bucketing — the production 100 TB
    * session-store layout (SURVEY §2.8d): partition pruning cuts the
    * listing to the queried date range while `HashPartitioning(key)`
    * from the bucket spec still satisfies every per-key consumer's
    * ClusteredDistribution with no exchange. Each partition directory
    * holds one file per bucket (the scan groups files by bucket id
    * across partition dirs), so files = |partitions| × buckets —
    * bounded by the calendar, not the data. */
  def table(s: SparkSession, d: String, sourceFile: String, tag: String,
            key: String, buckets: Int = 8,
            partitionCol: Option[String] = None)(build: => DataFrame): String =
    synchronized {
      val dir = CachedDir.materialize(s, d, sourceFile, tag) { tmp =>
        val bn = s"graft_build_${tag}_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        // repartition to the bucket layout BEFORE the bucketed write:
        // both use murmur3(key) pmod n, so each write task owns exactly
        // one bucket and emits exactly one file (one per partition dir
        // when partitioned). Without this every write task emits a file
        // per bucket it sees — tasks × buckets files whose open/close
        // overhead dominates the publish, and whose tiny row groups tax
        // every later scan.
        val base = build
          .repartition(buckets, org.apache.spark.sql.functions.col(key))
          .write.mode("overwrite")
        partitionCol.fold(base)(p => base.partitionBy(p))
          .bucketBy(buckets, key).sortBy(key)
          .option("path", tmp).format("parquet")
          .saveAsTable(bn)
        s.sql(s"DROP TABLE IF EXISTS $bn")
      }
      val fp = dir.substring(dir.lastIndexOf('_') + 1)
      val name = s"graft_${tag}_$fp"
      if (!s.catalog.tableExists(name)) {
        // read.parquet discovers the partition column from the dir
        // layout, so the inferred schema carries data + partition cols
        val ddl = s.read.parquet(dir).schema.toDDL
        val partClause =
          partitionCol.fold("")(p => s"PARTITIONED BY ($p)\n")
        s.sql(
          s"""CREATE TABLE $name ($ddl)
             |USING PARQUET
             |${partClause}CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
             |LOCATION '$dir'""".stripMargin)
        // hive-style partition dirs must be registered in the catalog
        // before the first scan sees them
        partitionCol.foreach(_ => s.sql(s"ALTER TABLE $name RECOVER PARTITIONS"))
      }
      name
    }
}
