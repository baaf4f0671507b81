package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, NullsFirst}
import org.apache.spark.sql.catalyst.plans.logical.Sort
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
  *  1. a DETERMINISTIC range-bucket id per row: cut points are sampled
  *     once (hash-gated, order-insensitive — a pure function of the
  *     data multiset, not of partition layout), sorted on the driver,
  *     and compiled into the plan as a literal comparison tree, so the
  *     bucket id is a pure row-local expression. Equal keys always map
  *     to the same bucket, so rank/peer semantics survive;
  *  2. the SAME window per range bucket (partitioned by the bucket id,
  *     so every window in the plan carries a partition spec and stays
  *     a parallel sort — the window's own hash exchange distributes
  *     the buckets; no extra range shuffle is needed);
  *  3. per-bucket totals — a ≤`buckets`-row frame — self-joined
  *     (broadcast, strictly-prior buckets) into carried offsets
  *     that lift each local result to the global value. The offset
  *     frame is bounded by the BUCKET COUNT, a constant, never by
  *     the data; no window runs over it (window-free theta join), so
  *     plans built here contain zero unpartitioned windows.
  *
  * Equivalences (bit-exact, not approximate — the DuckDB oracle gate
  * re-verifies every consumer at three SFs):
  *  - global `row_number()`      = local row_number + prior-bucket count
  *  - global running `sum(x)`    = local running sum + prior-bucket Σx
  *  - global `rank()` / peer cnt = local value + prior count (ties never
  *    cross a bucket boundary)
  *  - `lead(x, 1)`               = local lead, else next bucket's first x
  *  - `ntile`/`cume_dist`/`percent_rank` derive from the above plus the
  *    group total ([[ntileOf]], [[cumeDistOf]], [[percentRankOf]]).
  *
  * `part` generalizes to grouped-but-data-proportional windows (per
  * market segment, per day): cuts are taken on (part ++ order), so one
  * heavy group parallelizes across many buckets while the offsets stay
  * per-group.
  *
  * Determinism & fault tolerance (r15 — replaces the r14 lazy
  * localCheckpoint): because the bucket id is a literal expression over
  * the row's own key columns, ANY re-evaluation of the input subtree
  * assigns identical ids — nothing pins on a materialized RDD, so an
  * executor loss triggers ordinary lineage recompute instead of killing
  * the query (local checkpoint blocks are not recomputable). The input
  * IS `persist()`ed as a compute-once optimization (the window, totals,
  * and boundary branches all read it), but eviction or loss of those
  * blocks is safe by construction.
  *
  * Cost: TWO driver actions at plan-construction time (a count and a
  * hash-gated sample collect of ≤ ~128·buckets key tuples — both read
  * the persisted input, so the upstream pipeline executes once), plus
  * the window's hash exchange and broadcast joins against
  * constant-bounded frames — bucket-count parallel at every step, which
  * is the trade against the single-partition sort this replaces. The
  * literal comparison tree bounds `buckets` at 1024 (a larger fleet
  * would swap the tree for a native binary-search bucket Expression);
  * at the default 65,536 rows per bucket that caps the tier at ~67M
  * rows per (part) group spread — raise rows-per-bucket, not the cap,
  * beyond that.
  */
object Dist {

  /** One sort key: bare value column + resolved direction/null order. */
  private case class Key(c: Column, asc: Boolean, nullsFirst: Boolean)

  /** Resolve `order` to (bare column, direction, null order) through the
    * analyzer: a throwaway sortWithinPartitions plan is analyzed (no job
    * runs) and its Catalyst SortOrders read back — the one public path
    * from a `col(...).desc`-style Column to its direction. Order keys
    * must be plain (possibly pre-aliased) columns, the contract every
    * tier consumer already satisfies. */
  private def orderKeys(df: DataFrame, order: Seq[Column]): Seq[Key] = {
    val analyzed = df.sortWithinPartitions(order: _*).queryExecution.analyzed
    val sos = analyzed.collectFirst { case s: Sort => s.order }.getOrElse(
      throw new IllegalStateException("Dist.prefix: no Sort in probe plan"))
    sos.map { so =>
      val name = so.child match {
        case a: AttributeReference => a.name
        case e => throw new IllegalArgumentException(
          "Dist.prefix order keys must be plain columns " +
            s"(alias computed keys first): $e")
      }
      Key(col(name), so.direction == Ascending, so.nullOrdering == NullsFirst)
    }
  }

  /** Natural comparison of two non-null collected key values. Every
    * orderable Spark scalar collects to a java.lang.Comparable (Long,
    * Double — NaN greatest, matching Spark's sort —, String, Decimal,
    * Date, Timestamp); binary keys are unsupported, matching the
    * window's own orderability rules. */
  private def natural(x: Any, y: Any): Int = x match {
    case a: java.lang.Comparable[_] =>
      a.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
    case _ => throw new IllegalArgumentException(
      s"Dist.prefix: non-comparable key value of ${x.getClass}")
  }

  /** SORT-position comparison (direction + resolved null order). */
  private def cmp(x: Any, y: Any, k: Key): Int =
    if (x == null && y == null) 0
    else if (x == null) { if (k.nullsFirst) -1 else 1 }
    else if (y == null) { if (k.nullsFirst) 1 else -1 }
    else { val c = natural(x, y); if (k.asc) c else -c }

  private def tupleCmp(keys: Seq[Key])(a: Seq[Any], b: Seq[Any]): Int = {
    var i = 0
    while (i < keys.length) {
      val c = cmp(a(i), b(i), keys(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Column: does the row sort STRICTLY AFTER the cut tuple?
    * Lexicographic fold with per-key direction and null placement;
    * null-safe equality chains to the next key. */
  private def afterCut(keys: Seq[Key], cut: Seq[Any]): Column =
    keys.zip(cut).foldRight(lit(false)) { case ((k, cv), rest) =>
      val gt =
        if (cv == null) { if (k.nullsFirst) k.c.isNotNull else lit(false) }
        else {
          val natGt = if (k.asc) k.c > lit(cv) else k.c < lit(cv)
          if (k.nullsFirst) k.c.isNotNull && natGt
          else k.c.isNull || natGt
        }
      gt || (k.c <=> lit(cv) && rest)
    }

  /** Bucket id = |{cuts strictly below the row}| as a literal binary
    * decision tree: O(|keys|·log buckets) comparisons evaluated per
    * row, O(buckets) expression nodes compiled. Monotone because cuts
    * are sorted and deduped, so the midpoint probe is a valid split. */
  private def bucketExpr(keys: Seq[Key], cuts: IndexedSeq[Seq[Any]]): Column = {
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi + 1) / 2
        when(afterCut(keys, cuts(mid - 1)), tree(mid, hi))
          .otherwise(tree(lo, mid - 1))
      }
    if (cuts.isEmpty) lit(0) else tree(0, cuts.length)
  }

  /** Append distributed global-window columns to `df`.
    *
    * @param part   partition (group) column names; empty = one global order
    * @param order  window order — must match what the single-partition
    *               window used (same columns, same asc/desc); a TOTAL
    *               order wherever `rowNum` is read for row-identity
    * @param cums   (outName, expr): global running sum of `expr` over
    *               ROWS UNBOUNDED PRECEDING..CURRENT ROW, in `order`.
    *               Exprs must be NON-NULL integral (long) — the engine's
    *               exact-arithmetic determinism rule (SURVEY §2.10). A
    *               nullable expr would diverge from the global window on
    *               an all-null prefix (local NULL + non-null offset stays
    *               NULL where the window reads the prior buckets' sum),
    *               so nullability is a caller contract like lead1's
    *  @param rowNum outName for the global row_number (long)
    * @param rankLe (rankOut, cntLeOut): global `rank()` (long) and the
    *               RANGE-frame peer-inclusive row count (long) — the
    *               cume_dist numerator
    * @param maxPrev (outName, expr): running max of `expr` over ROWS
    *               UNBOUNDED PRECEDING..-1 (strictly prior; NULL on the
    *               global first row) — max is associative, so the
    *               offset is the prior buckets' max under
    *               null-skipping `greatest`
    * @param groupN outName for the group (or global) row count (long)
    * @param lead1  (srcColName, outName): `lead(src, 1)` over the global
    *               order; `src` must be non-null (boundary stitch uses
    *               coalesce)
    * @param parts  explicit bucket count (tests use it to force many
    *               buckets on tiny frames); 0 = size from the data —
    *               ⌈rows / 65536⌉ clamped to [1, 1024], so tiny frames
    *               pay one bucket of fixed overhead and data-scale
    *               frames keep full parallelism
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

    // Phase 1: deterministic bucket id. Cut points come from a
    // hash-gated sample — a pure function of the data multiset, so two
    // independent evaluations of ANY subtree here agree on every pid
    // (the correctness property the r14 version bought with a lazy
    // localCheckpoint). The persist is an optimization only: count()
    // materializes it, the sample and every downstream branch (window,
    // offsets, totals, lead stitch) then read the cache; eviction or
    // executor loss is recompute-safe. NOTE plan construction runs the
    // two sampling actions (and the upstream pipeline once) eagerly —
    // plan-only callers (explain, plan specs) execute real jobs, the
    // pre-existing behavior of this tier.
    val keys: Seq[Key] =
      part.map(p => Key(col(p), asc = true, nullsFirst = true)) ++
        orderKeys(df, order)
    val keyCols = keys.map(_.c)
    val cached = df.persist()
    val n = cached.count()
    // Floor at 2 buckets: a 1-bucket pid would be a foldable literal,
    // which Catalyst folds OUT of the window's partition spec — the
    // plan then reads as an unpartitioned window to every guard (and
    // genuinely becomes one). Two buckets keep the pid a real
    // expression at trivial cost (one cut, a 2-row offsets frame).
    val buckets =
      if (parts > 0) parts
      else math.min(1024L, math.max(2L, (n + 65535L) / 65536L)).toInt
    val cuts: IndexedSeq[Seq[Any]] =
      if (buckets <= 1 || n == 0) IndexedSeq.empty
      else {
        val gate = math.max(1L, n / (buckets.toLong * 128L))
        val sample = cached
          .select(keyCols: _*)
          .filter(pmod(xxhash64(keyCols: _*), lit(gate)) === 0)
          .collect()
          .map(_.toSeq.toIndexedSeq)
          .toIndexedSeq
        val lt = tupleCmp(keys) _
        val sorted = sample.sortWith((a, b) => lt(a, b) < 0)
        val len = sorted.length
        val raw = (1 until buckets).iterator
          .map(i => sorted(math.min(((i.toLong * len) / buckets).toInt,
                                    len - 1)))
        raw.foldLeft(Vector.empty[Seq[Any]]) { (acc, c) =>
          if (acc.nonEmpty && lt(acc.last, c) == 0) acc else acc :+ c
        }
      }
    val ordered = cached.withColumn(pid, bucketExpr(keys, cuts))

    // Phase 2: the same window, per range bucket.
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

    // Phase 3: per-(pid, group) totals — a ≤`buckets`·|adjacent groups|
    // row frame (buckets are contiguous ranges, so Σ_pid groups ≤
    // |groups| + buckets).
    val totAggs =
      count(lit(1)).as("__dp_cnt") +:
        (cums.map { case (name, e) => sum(e).as(s"__dp_t_$name") } ++
         maxPrev.map { case (name, e) => max(e).as(s"__dp_m_$name") })
    // persisted: the tiny totals frame is read 2-4× (both sides of the
    // prior join, the group totals, the lead stitch) — caching it makes
    // the input-cache re-aggregation run once; recompute-safe like the
    // input persist
    val offs = ordered.groupBy(partCols.map(col): _*)
      .agg(totAggs.head, totAggs.tail: _*)
      .persist()

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

    // lead(x, 1) boundary stitch: the next bucket's first src value
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
      // greatest SKIPS nulls: local-null (bucket first row) reads the
      // offset, offset-null (first bucket) reads local, both-null
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
