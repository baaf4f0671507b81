package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Determinism helpers (SURVEY.md §2.10) — every query funnels through
  * these so its parquet dump hash-matches the DuckDB oracle:
  *  1. total order on a unique key list (`ord`);
  *  2. aggregated doubles rounded to 4 decimals (`r4`) — summation order
  *     differs across engines/partitions;
  *  3. explicit null ordering (Spark ASC default = NULLS FIRST; oracle SQL
  *     spells it out).
  */
object Fin {
  /** round(x, 4) — apply to EVERY aggregated/computed double column. */
  def r4(c: Column): Column = round(c, 4)

  /** Total order; ties must be broken by a real unique key. */
  def ord(df: DataFrame, cols: Column*): DataFrame = df.orderBy(cols: _*)

  /** Epoch seconds as long (floor), mirroring the oracle's
    * `epoch_us(ts)//1000000` — keeps timestamp math integral and avoids
    * ns/µs unit drift (SURVEY.md §2.10 rule 4). */
  def epochSec(c: Column): Column = unix_timestamp(c)
}
