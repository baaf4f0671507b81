package graft.operators

import graft.{Fin, Tables, Schemas}
import graft.sources.{CachedDir, DataSources}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format-interop queries: the CSV and JSON source/sink round trips run
  * UNDER the DuckDB oracle gate (SURVEY §2.1 — the suite-only readers
  * promoted to hashed correctness rows). Each query exports the events
  * fact table to the text format once per source state (CachedDir), reads
  * it back through the declared-schema reader, and aggregates; the oracle
  * computes the same aggregate from the PARQUET source — so a single
  * character lost to quoting, escaping, timestamp formatting, or null
  * encoding anywhere in the writer→reader loop breaks the hash.
  *
  * `props` is embedded JSON (quotes, commas, braces) — the exact payload
  * class that breaks naive CSV quoting — and its per-row length feeds the
  * aggregate, so truncation is caught even when row COUNTS survive.
  *
  * Scale notes (100 TB): the export is an ingest-time artifact (published
  * once per source state, like the session store); the timed query reads
  * the text format straight into one partial-aggregable shuffle. Declared
  * schemas keep the readers single-pass (no inference pre-scan).
  */
object FormatOps {
  import Fin._

  /** Publish both text exports untimed (SparkEntry.prepareFixtures) —
    * they are ingest-time artifacts like the session store; the timed
    * queries then measure steady-state text-format READ throughput. */
  def prepare(s: SparkSession, d: String): Unit = {
    exportDir(s, d, "csv")
    exportDir(s, d, "json")
    exportDir(s, d, "orc")
  }

  /** Export events to the given format once per source state. */
  private def exportDir(s: SparkSession, d: String, fmt: String): String =
    CachedDir.materialize(s, d, "events.parquet", s"${fmt}rt") { tmp =>
      val ev = Tables.events(s, d)
      fmt match {
        case "csv"  => DataSources.writeCsv(ev, tmp)
        case "json" => DataSources.writeJson(ev, tmp)
        case _      => DataSources.writeOrc(ev, tmp)
      }
    }

  private def roundtripAgg(events: DataFrame): DataFrame =
    Fin.ord(
      events
        .groupBy(col("event_type"),
                 date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"),
             sum(expr("cast(round(value * 100) as bigint)")).as("cents"),
             count_distinct(col("user_id")).as("n_users"),
             sum(length(col("props")).cast("long")).as("props_len")),
      col("event_type"), col("day"))

  /** q_csv_roundtrip — the CSV writer→reader loop under the hash gate. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtripAgg(DataSources.readCsv(s, exportDir(s, d, "csv"), Schemas.events))

  /** q_json_roundtrip — the JSON-lines writer→reader loop under the
    * hash gate (escaping of the embedded-JSON props is the hard part). */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtripAgg(DataSources.readJson(s, exportDir(s, d, "json"), Schemas.events))

  /** q_orc_roundtrip — the ORC writer→reader loop under the hash gate
    * (binary-columnar: timestamp encoding and string dictionary
    * fidelity are the risk surface). Completes the format triple. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtripAgg(DataSources.readOrc(s, exportDir(s, d, "orc"), Schemas.events))
}
