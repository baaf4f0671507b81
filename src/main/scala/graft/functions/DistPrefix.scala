package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order window tier — the 100 TB form of
  * `Window.orderBy(...)` without a partition spec.
  *
  * A global ordered window funnels its whole input through ONE
  * partition (Spark warns "Moving all data to a single partition"):
  * correct at any test SF, dead at 100× on a data-proportional frame
  * (per-customer, per-user, per-order rollups). This helper computes
  * the same values with the classic two-phase prefix scheme every
  * distributed sort system uses:
  *
  *  1. `repartitionByRange` on the order keys — a parallel range
  *     shuffle (sampled bounds; equal keys always land in the same
  *     partition, so rank/peer semantics survive);
  *  2. the SAME window per range partition (partitioned by
  *     `spark_partition_id()`, so every window in the plan carries a
  *     partition spec and stays a parallel sort);
  *  3. per-partition totals — a ≤`parts`-row frame — self-joined
  *     (broadcast, strictly-prior partitions) into carried offsets
  *     that lift each local result to the global value. The offset
  *     frame is bounded by the PARTITION COUNT, a constant, never by
  *     the data; no window runs over it (window-free theta join), so
  *     plans built here contain zero unpartitioned windows.
  *
  * Equivalences (bit-exact, not approximate — the DuckDB oracle gate
  * re-verifies every consumer at three SFs):
  *  - global `row_number()`      = local row_number + prior-partition count
  *  - global running `sum(x)`    = local running sum + prior-partition Σx
  *  - global `rank()` / peer cnt = local value + prior count (ties never
  *    cross a range boundary)
  *  - `lead(x, 1)`               = local lead, else next partition's first x
  *  - `ntile`/`cume_dist`/`percent_rank` derive from the above plus the
  *    group total ([[ntileOf]], [[cumeDistOf]], [[percentRankOf]]).
  *
  * `part` generalizes to grouped-but-data-proportional windows (per
  * market segment, per day): ranges are cut on (part ++ order), so one
  * heavy group parallelizes across many range partitions while the
  * offsets stay per-group.
  *
  * Cost: one range exchange (with its sampling pass) + one pid-hash
  * exchange + broadcast joins against constant-bounded frames —
  * partition-count parallel at every step, which is the trade against
  * the single-partition sort this replaces.
  */
object Dist {

  /** Append distributed global-window columns to `df`.
    *
    * @param part   partition (group) column names; empty = one global order
    * @param order  window order — must match what the single-partition
    *               window used (same columns, same asc/desc); a TOTAL
    *               order wherever `rowNum` is read for row-identity
    * @param cums   (outName, expr): global running sum of `expr` over
    *               ROWS UNBOUNDED PRECEDING..CURRENT ROW, in `order`.
    *               Exprs must be integral (long) — the engine's exact-
    *               arithmetic determinism rule (SURVEY §2.10)
    * @param rowNum outName for the global row_number (long)
    * @param rankLe (rankOut, cntLeOut): global `rank()` (long) and the
    *               RANGE-frame peer-inclusive row count (long) — the
    *               cume_dist numerator
    * @param maxPrev (outName, expr): running max of `expr` over ROWS
    *               UNBOUNDED PRECEDING..-1 (strictly prior; NULL on the
    *               global first row) — max is associative, so the
    *               offset is the prior partitions' max under
    *               null-skipping `greatest`
    * @param groupN outName for the group (or global) row count (long)
    * @param lead1  (srcColName, outName): `lead(src, 1)` over the global
    *               order; `src` must be non-null (boundary stitch uses
    *               coalesce)
    * @param parts  explicit range partition count (tests use it to
    *               force many partitions on tiny frames); 0 = let AQE
    *               size the exchange — tiny frames coalesce to few
    *               tasks by advisory size, data-scale frames keep full
    *               parallelism (the session's parallelismFirst=false
    *               stance), and correctness is partition-count-
    *               invariant by construction
    */
  def prefix(df: DataFrame,
             part: Seq[String],
             order: Seq[Column],
             cums: Seq[(String, Column)] = Nil,
             rowNum: Option[String] = None,
             rankLe: Option[(String, String)] = None,
             groupN: Option[String] = None,
             lead1: Option[(String, String)] = None,
             maxPrev: Seq[(String, Column)] = Nil,
             parts: Int = 0): DataFrame = {
    val pid = "__dp_pid"
    val lrn = "__dp_lrn"
    val partCols = pid +: part

    // Phase 1: parallel range shuffle; pid materialized as a column so
    // the per-partition window and the offsets frame key on the same
    // attribute. The lazy localCheckpoint is LOAD-BEARING for
    // correctness, not a cache hint: the range bounds are SAMPLED from
    // shuffle output whose intra-partition order is nondeterministic,
    // so two independent evaluations of this subtree can assign
    // different pids — offsets computed on one assignment applied to
    // windows on another corrupt every global value. Checkpointing
    // pins ONE evaluation that every downstream branch (window,
    // offsets, totals, lead stitch) reads.
    val ranged =
      if (parts > 0)
        df.repartitionByRange(parts, (part.map(col) ++ order): _*)
      else df.repartitionByRange((part.map(col) ++ order): _*)
    val ordered = ranged
      .withColumn(pid, spark_partition_id())
      .localCheckpoint(false)

    // Phase 2: the same window, per range partition.
    val wBase = Window.partitionBy(partCols.map(col): _*).orderBy(order: _*)
    val wRows = wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var local = ordered.withColumn(lrn, row_number().over(wBase).cast("long"))
    cums.foreach { case (name, e) =>
      local = local.withColumn(s"__dp_l_$name", sum(e).over(wRows))
    }
    rankLe.foreach { case (rk, le) =>
      local = local
        .withColumn(s"__dp_l_$rk", rank().over(wBase).cast("long"))
        // default frame with orderBy = RANGE ..CURRENT ROW: counts peers
        .withColumn(s"__dp_l_$le", count(lit(1)).over(wBase))
    }
    lead1.foreach { case (src, out) =>
      local = local.withColumn(s"__dp_l_$out", lead(col(src), 1).over(wBase))
    }
    maxPrev.foreach { case (name, e) =>
      local = local.withColumn(s"__dp_l_$name",
        max(e).over(wBase.rowsBetween(Window.unboundedPreceding, -1)))
    }

    // Phase 3: per-(pid, group) totals — a ≤`n`·|adjacent groups| row
    // frame (ranges are contiguous, so Σ_pid groups ≤ |groups| + n).
    val totAggs =
      count(lit(1)).as("__dp_cnt") +:
        (cums.map { case (name, e) => sum(e).as(s"__dp_t_$name") } ++
         maxPrev.map { case (name, e) => max(e).as(s"__dp_m_$name") })
    val offs = ordered.groupBy(partCols.map(col): _*)
      .agg(totAggs.head, totAggs.tail: _*)

    // Strictly-prior offsets: window-free broadcast theta self-join over
    // the constant-bounded offsets frame.
    val sameGroup = (l: String, r: String) =>
      part.foldLeft(lit(true))((c, k) => c && col(s"$l.$k") <=> col(s"$r.$k"))
    val prior = offs.as("l")
      .join(broadcast(offs.as("r")),
            sameGroup("l", "r") && col(s"r.$pid") < col(s"l.$pid"), "left")
      .groupBy(partCols.map(k => col(s"l.$k")): _*)
      .agg(coalesce(sum(col("r.__dp_cnt")), lit(0L)).as("__dp_off_cnt"),
        (cums.map { case (name, _) =>
          coalesce(sum(col(s"r.__dp_t_$name")), lit(0L))
            .as(s"__dp_off_$name")
        } ++ maxPrev.map { case (name, _) =>
          max(col(s"r.__dp_m_$name")).as(s"__dp_offm_$name")
        }): _*)
      .select(partCols.map(k => col(s"l.$k").as(k)) ++
              ("__dp_off_cnt" +: (cums.map(c => s"__dp_off_${c._1}") ++
                                  maxPrev.map(c => s"__dp_offm_${c._1}")))
                .map(col): _*)

    var out = local.join(broadcast(prior), partCols)

    // Group totals (ntile / cume_dist denominators) — another rollup of
    // the tiny offsets frame, broadcast back per group.
    groupN.foreach { gn =>
      val tot =
        if (part.isEmpty)
          offs.agg(coalesce(sum(col("__dp_cnt")), lit(0L)).as(gn))
        else
          offs.groupBy(part.map(col): _*)
            .agg(sum(col("__dp_cnt")).as(gn))
      out =
        if (part.isEmpty) out.crossJoin(broadcast(tot))
        else out.join(broadcast(tot), part)
    }

    // lead(x, 1) boundary stitch: the next partition's first src value
    // (per group), from the local row_number=1 rows.
    lead1.foreach { case (src, outName) =>
      val firsts = local.filter(col(lrn) === 1L)
        .select(partCols.map(col) :+ col(src).as("__dp_first"): _*)
      val nexts = offs.as("l")
        .join(broadcast(firsts.as("r")),
              sameGroup("l", "r") && col(s"r.$pid") > col(s"l.$pid"), "left")
        .groupBy(partCols.map(k => col(s"l.$k")): _*)
        .agg(min_by(col("r.__dp_first"), col(s"r.$pid")).as("__dp_next"))
        .select(partCols.map(k => col(s"l.$k").as(k)) :+ col("__dp_next"): _*)
      out = out.join(broadcast(nexts), partCols)
        .withColumn(outName,
          coalesce(col(s"__dp_l_$outName"), col("__dp_next")))
        .drop("__dp_next", s"__dp_l_$outName")
    }

    // Lift local → global and drop the scaffolding.
    cums.foreach { case (name, _) =>
      out = out.withColumn(name, col(s"__dp_l_$name") + col(s"__dp_off_$name"))
        .drop(s"__dp_l_$name", s"__dp_off_$name")
    }
    maxPrev.foreach { case (name, _) =>
      // greatest SKIPS nulls: local-null (partition first row) reads the
      // offset, offset-null (first partition) reads local, both-null
      // (global first row) stays NULL — the single-partition semantics
      out = out.withColumn(name,
          greatest(col(s"__dp_l_$name"), col(s"__dp_offm_$name")))
        .drop(s"__dp_l_$name", s"__dp_offm_$name")
    }
    rowNum.foreach { rn =>
      out = out.withColumn(rn, col(lrn) + col("__dp_off_cnt"))
    }
    rankLe.foreach { case (rk, le) =>
      out = out
        .withColumn(rk, col(s"__dp_l_$rk") + col("__dp_off_cnt"))
        .withColumn(le, col(s"__dp_l_$le") + col("__dp_off_cnt"))
        .drop(s"__dp_l_$rk", s"__dp_l_$le")
    }
    out.drop(pid, lrn, "__dp_off_cnt")
  }

  /** Spark's exact `ntile(k)` from a global row_number and total count:
    * n = q·k + r → the first r buckets take q+1 rows, the rest q. All
    * arithmetic is exact integer DIV; the q=0 branch (n < k) is
    * unreachable when rn > r·(q+1) since that implies q ≥ 1, so the
    * lazy CASE WHEN never divides by zero under ANSI. */
  def ntileOf(k: Int, rn: Column, n: Column): Column = {
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    val q = idiv(n.cast("long"), lit(k.toLong))
    val r = n.cast("long") % lit(k.toLong)
    (when(rn <= (q + 1L) * r, idiv(rn - 1L, q + 1L))
       .otherwise(r + idiv(rn - 1L - (q + 1L) * r, q)) + 1L).cast("int")
  }

  /** `cume_dist()` from the peer-inclusive ≤-count and the group total. */
  def cumeDistOf(cntLe: Column, n: Column): Column =
    cntLe.cast("double") / n

  /** `percent_rank()` from the global rank and the group total (Spark's
    * n=1 → 0.0 convention). */
  def percentRankOf(rank: Column, n: Column): Column =
    when(n > 1L, (rank - 1L).cast("double") / (n - 1L)).otherwise(lit(0.0))
}
