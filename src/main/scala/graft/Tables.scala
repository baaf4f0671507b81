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

  /** How a given events.parquet physically encodes `ts`. The driver has
    * shipped two encodings across regenerations (ns through r9-era data,
    * µs since 2026-08-13); the reader must serve both without a code
    * change, so the unit is read from the parquet footer, never assumed. */
  private sealed trait TsEncoding
  private case object TsNative extends TsEncoding    // µs/ms annotation: Spark reads TimestampType directly
  private case object TsNanosLong extends TsEncoding // TIMESTAMP(NANOS) or raw INT64 ns: Long + DIV 1000

  /** Memo keyed by (path, source fingerprint) so a rewritten fixture in
    * the suite can never serve a stale verdict; the fingerprint is one
    * listStatus, the footer open it saves is the expensive part. */
  private val tsEncodingMemo =
    new java.util.concurrent.ConcurrentHashMap[String, TsEncoding]()

  /** Reads the logical-type annotation of `ts` from the FIRST and LAST
    * parquet footers (driver-side, two footers at any scale — the unit
    * is uniform per dataset, and the last-file probe turns a partially
    * regenerated mixed-unit directory into a loud failure instead of a
    * silent misread). Recognized encodings, exhaustively:
    *  - TIMESTAMP(MICROS/MILLIS) annotation → native Spark read;
    *  - TIMESTAMP(NANOS) annotation, or unannotated raw INT64 (the
    *    legacy driver shape) → Long read + DIV 1000;
    *  - anything else (INT96, non-timestamp annotations, non-INT64
    *    physical types) → IllegalArgumentException, so format drift the
    *    reader cannot decode fails at the detector with the real cause,
    *    not downstream with a conversion error.
    * A magnitude probe is deliberately NOT used: it is data-dependent
    * (r9 ADVICE) — the footer is the contract. */
  private def tsEncoding(s: SparkSession, path: String): TsEncoding = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val dataFiles =
      if (!st.isDirectory) Seq(st)
      else {
        val fl = fs.listStatus(p).toSeq
          .filter(x => x.isFile && x.getLen > 0 && {
            val n = x.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          })
          .sortBy(_.getPath.getName)
        if (fl.isEmpty) throw new IllegalArgumentException(
          s"no parquet data files under $path")
        fl
      }
    def detect(f: org.apache.hadoop.fs.FileStatus): TsEncoding = {
      val reader =
        ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val prim = schema.getType(schema.getFieldIndex("ts")).asPrimitiveType()
        (prim.getPrimitiveTypeName, prim.getLogicalTypeAnnotation) match {
          case (PrimitiveType.PrimitiveTypeName.INT64,
                t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
            if (t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS) TsNanosLong
            else TsNative
          case (PrimitiveType.PrimitiveTypeName.INT64, null) => TsNanosLong
          case (phys, ann) => throw new IllegalArgumentException(
            s"unsupported ts encoding in ${f.getPath}: physical=$phys " +
              s"annotation=$ann (supported: INT64 TIMESTAMP(MICROS/MILLIS/" +
              "NANOS) or unannotated INT64 ns)")
        }
      } finally reader.close()
    }
    // memo keyed on the chosen data file's OWN len+mtime (not the parent
    // directory's — an in-place part-file overwrite need not bump the
    // directory mtime on POSIX, r10 ADVICE)
    val first = dataFiles.head
    val key = first.getPath.toString + "#" + first.getLen + "#" +
      first.getModificationTime
    tsEncodingMemo.computeIfAbsent(key, _ => {
      val enc = detect(first)
      if (dataFiles.size > 1) {
        val last = dataFiles.last
        val encLast = detect(last)
        if (encLast != enc) throw new IllegalArgumentException(
          s"mixed ts encodings under $path: ${first.getPath.getName}=$enc " +
            s"vs ${last.getPath.getName}=$encLast — partially regenerated " +
            "directory? (per-dataset ts unit must be uniform)")
      }
      enc
    })
  }

  /** events with `ts` normalized to µs TimestampType regardless of the
    * file's physical encoding (footer-detected — see [[tsEncoding]]):
    *  - µs/ms annotation → native TimestampType read, no conversion
    *    (isAdjustedToUTC=false is value-identical under the UTC session
    *    time zone GraftSession pins, matching DuckDB);
    *  - ns (legacy) → LongType read + integral `DIV 1000` (`DIV`, not
    *    `/` — a double division would lose precision at 1.7e18),
    *    identical to DuckDB's `ts::TIMESTAMP` truncation. */
  def events(s: SparkSession, d: String): DataFrame =
    tsEncoding(s, s"$d/events.parquet") match {
      case TsNative => read(s, d, "events")
      case TsNanosLong =>
        ensureConf(s, "spark.sql.legacy.parquet.nanosAsLong", "true")
        import org.apache.spark.sql.functions.{expr, timestamp_micros}
        ensureConf(s, "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        s.read.schema(Schemas.eventsNsPhysical).parquet(s"$d/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
