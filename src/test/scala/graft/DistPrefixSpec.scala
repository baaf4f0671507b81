package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dist

/** [[graft.functions.Dist.prefix]] must be BIT-EQUAL to the
  * single-partition global window it replaces — these tests pin every
  * primitive (running sum, row_number, rank/peer-count, lead stitch,
  * ntile/cume_dist/percent_rank derivations) against the reference
  * window on fixtures with ties, skewed groups, and row counts both
  * below and above the range partition count (so partition boundaries,
  * empty partitions, and the prior-offset join all exercise). */
class DistPrefixSpec extends AnyFunSuite {
  import TestBase.spark
  import spark.implicits._

  // 211 rows, heavy ties (v has ~30 distinct values), 3 groups with
  // skewed sizes; k unique → (v, k) is a total order
  private lazy val base: DataFrame = {
    val rows = (1 to 211).map { i =>
      val g = if (i % 7 == 0) "g2" else if (i % 3 == 0) "g1" else "g0"
      (g, ((i * 37) % 30).toLong, i.toLong, ((i * 13) % 11).toLong)
    }
    rows.toDF("g", "v", "k", "x").repartition(5).cache()
  }

  private def sortedRows(df: DataFrame, cols: String*): Seq[Seq[Any]] =
    df.orderBy(cols.head).select(cols.map(col): _*)
      .collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("global running sum + row_number match the single-partition window") {
    val w = Window.orderBy(col("v"), col("k"))
    val ref = base
      .withColumn("cs", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w).cast("long"))
    val got = Dist.prefix(base, Nil, Seq(col("v"), col("k")),
      cums = Seq("cs" -> col("x")), rowNum = Some("rn"), parts = 7)
    assert(sortedRows(got, "k", "cs", "rn") == sortedRows(ref, "k", "cs", "rn"))
  }

  test("descending order matches (the q_abc_pareto / q_pr_curve shape)") {
    val w = Window.orderBy(col("v").desc, col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = base.withColumn("cs", sum(col("x")).over(w))
    val got = Dist.prefix(base, Nil, Seq(col("v").desc, col("k")),
      cums = Seq("cs" -> col("x")), parts = 7)
    assert(sortedRows(got, "k", "cs") == sortedRows(ref, "k", "cs"))
  }

  test("rank + peer count + derived cume_dist/percent_rank match, with ties") {
    // order by v ALONE — every tie block crosses hash partitions in the
    // input and must land whole in one range partition
    val w = Window.orderBy(col("v"))
    val ref = base
      .withColumn("cd", cume_dist().over(w))
      .withColumn("pr", percent_rank().over(w))
    val got0 = Dist.prefix(base, Nil, Seq(col("v")),
      rankLe = Some(("rk", "le")), groupN = Some("n"), parts = 7)
    val got = got0
      .withColumn("cd", Dist.cumeDistOf(col("le"), col("n")))
      .withColumn("pr", Dist.percentRankOf(col("rk"), col("n")))
    assert(sortedRows(got, "k", "cd", "pr") == sortedRows(ref, "k", "cd", "pr"))
  }

  test("grouped: per-group sums/ranks match a partitioned window split across ranges") {
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("k"))
    val ref = base
      .withColumn("cs", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cd", cume_dist().over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
    val got0 = Dist.prefix(base, Seq("g"), Seq(col("v"), col("k")),
      cums = Seq("cs" -> col("x")), rowNum = Some("rn"), parts = 7)
    // cume_dist orders by v alone (peer semantics) — second call
    val got1 = Dist.prefix(base, Seq("g"), Seq(col("v")),
      rankLe = Some(("rk", "le")), groupN = Some("n"), parts = 7)
      .withColumn("cd", Dist.cumeDistOf(col("le"), col("n")))
    assert(sortedRows(got0, "k", "cs", "rn") == sortedRows(ref, "k", "cs", "rn"))
    assert(sortedRows(got1, "k", "cd") == sortedRows(ref, "k", "cd"))
  }

  test("maxPrev (running max over strictly-prior rows) matches, incl. the NULL first row") {
    val w = Window.orderBy(col("v"), col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = base.withColumn("pm", max(col("x")).over(w))
    val got = Dist.prefix(base, Nil, Seq(col("v"), col("k")),
      maxPrev = Seq("pm" -> col("x")), parts = 7)
    assert(sortedRows(got, "k", "pm") == sortedRows(ref, "k", "pm"))
  }

  test("lead(x,1) stitches across range-partition boundaries") {
    val w = Window.orderBy(col("v"), col("k"))
    val ref = base.withColumn("nx", lead(col("k"), 1).over(w))
    val got = Dist.prefix(base, Nil, Seq(col("v"), col("k")),
      lead1 = Some(("k", "nx")), parts = 7)
    assert(sortedRows(got, "k", "nx") == sortedRows(ref, "k", "nx"))
  }

  test("ntileOf reproduces Spark ntile at the bucket-boundary n values") {
    // n spans every formula branch per k: n<k (q=0), n=k, n%k=0,
    // n%k=k-1, n%k=1 — plus one comfortably larger than k (r16: the
    // redundant cross-product combos were trimmed for the suite
    // budget; every branch is still exercised for both k)
    for ((k, ns) <- Seq(4 -> Seq(3, 9, 10, 11, 20, 25),
                        10 -> Seq(9, 10, 11, 19, 20));
         n <- ns) {
      val df = (1 to n).map(_.toLong).toDF("v")
      val ref = df.withColumn("b", ntile(k).over(Window.orderBy(col("v"))))
      val got = Dist.prefix(df, Nil, Seq(col("v")),
        rowNum = Some("rn"), groupN = Some("n"), parts = 3)
        .withColumn("b", Dist.ntileOf(k, col("rn"), col("n")))
      assert(sortedRows(got.orderBy("v"), "v", "b") ==
             sortedRows(ref.orderBy("v"), "v", "b"), s"n=$n k=$k")
    }
  }

  test("more partitions than rows: empty ranges are harmless") {
    val df = Seq((5L, 1L), (3L, 2L), (5L, 3L)).toDF("v", "k")
    val ref = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("k"))).cast("long"))
    val got = Dist.prefix(df, Nil, Seq(col("v"), col("k")),
      rowNum = Some("rn"), parts = 16)
    assert(sortedRows(got, "k", "rn") == sortedRows(ref, "k", "rn"))
  }

  test("empty input stays empty") {
    val df = base.filter(col("v") < 0)
    val got = Dist.prefix(df, Nil, Seq(col("v"), col("k")),
      cums = Seq("cs" -> col("x")), rowNum = Some("rn"),
      groupN = Some("n"), parts = 4)
    assert(got.count() == 0)
  }

  /** r16 (r15 verdict ask #2): the executor-loss/eviction story must
    * be a TEST, not prose. The tier persists its input and totals
    * frames as compute-once optimizations; evicting BOTH after plan
    * construction — and again after a first materialization — must
    * leave results bit-identical, because the bucket pipeline is a
    * pure function of the data multiset (hash-gated sample, in-plan
    * sort, binary-search ids). clearCache() drops every cached block
    * in the session, the hardest eviction available. */
  test("cache eviction at every point leaves results bit-identical") {
    def mk() = Dist.prefix(base, Nil, Seq(col("v"), col("k")),
      cums = Seq("cs" -> col("x")), rowNum = Some("rn"),
      rankLe = Some(("rk", "le")), groupN = Some("n"),
      lead1 = Some(("k", "nx")), parts = 7)
    val cols = Seq("k", "cs", "rn", "rk", "le", "n", "nx")
    // evict between plan construction and the first action
    val df1 = mk()
    spark.sqlContext.clearCache()
    val r1 = sortedRows(df1, cols: _*)
    // evict after materialization, re-collect the SAME plan
    spark.sqlContext.clearCache()
    val r2 = sortedRows(df1, cols: _*)
    // evict, then an independent reconstruction
    spark.sqlContext.clearCache()
    val r3 = sortedRows(mk(), cols: _*)
    assert(r1 == r2, "re-collect after eviction diverged")
    assert(r1 == r3, "independent reconstruction after eviction diverged")
  }

  /** r16 (r15 verdict ask #3): plan construction must run ZERO Spark
    * jobs — r15 ran a count + a sample collect eagerly, so explain /
    * PlanAudit / plan specs executed real jobs and audit artifacts
    * shifted for visibility reasons. The cuts are now in-plan; even
    * forcing analysis + optimization must submit nothing. */
  test("plan construction and optimization run zero Spark jobs") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = Dist.prefix(base, Nil, Seq(col("v"), col("k")),
        cums = Seq("cs" -> col("x")), rowNum = Some("rn"),
        rankLe = Some(("rk", "le")), groupN = Some("n"),
        lead1 = Some(("k", "nx")), parts = 7)
      df.queryExecution.optimizedPlan // force analysis + optimization
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // Drain the listener bus DETERMINISTICALLY before asserting
      // (r16 ADVICE): a fixed sleep can false-pass on a slow bus —
      // an onJobStart still in flight would arrive after the assert.
      // LiveListenerBus.waitUntilEmpty is private[spark] (public at
      // the bytecode level), so reach it via reflection.
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      assert(jobs.get() == 0,
        s"plan construction submitted ${jobs.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** r16 (r15 verdict ask #5): bucket counts past the old 1024
    * literal-tree cap. 2048 requested buckets over 5000 rows exercises
    * DistBucket's binary search on a ~2000-cut array — bit-equal to
    * the single-partition window. */
  test("bucket counts past the old 1024 cap match the reference window") {
    val big = (1 to 5000)
      .map(i => (((i * 131) % 977).toLong, i.toLong)).toDF("v", "k")
      .repartition(7)
    val w = Window.orderBy(col("v"), col("k"))
    val ref = big
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cs", sum(col("k")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = Dist.prefix(big, Nil, Seq(col("v"), col("k")),
      cums = Seq("cs" -> col("k")), rowNum = Some("rn"), parts = 2048)
    assert(sortedRows(got, "k", "rn", "cs") == sortedRows(ref, "k", "rn", "cs"))
  }

  /** r17 (r16 ADVICE): DistBucket's INTERPRETED eval must use Spark's
    * sort semantics for floats — SQLOrderingUtil treats -0.0 == 0.0
    * and NaN greatest, while java.lang.Double.compareTo orders
    * -0.0 < 0.0. A -0.0 cut against a 0.0 row key is sort-EQUAL, so
    * the row must land in the LOWER bucket (ties never cross a cut)
    * on BOTH evaluation paths; the old boxed compareTo put the
    * interpreted path in bucket 1 and codegen in bucket 0. */
  test("interpreted and codegen dist_bucket agree on signed zeros and NaN") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import graft.functions.DistBucket
    val cutType = ArrayType(StructType(Seq(StructField("k0", DoubleType))))
    def mkCuts(vs: Double*) =
      new GenericArrayData(vs.map(v =>
        new GenericInternalRow(Array[Any](v)): Any).toArray)
    def bucketOf(cuts: Seq[Double], key: Double): (Int, Int) = {
      val e = DistBucket(Seq(
        Literal("af"),
        Literal.create(mkCuts(cuts: _*), cutType),
        BoundReference(0, DoubleType, nullable = false)))
      val row = InternalRow(key)
      val interpreted = e.eval(row).asInstanceOf[Int]
      // codegen path: same expression through the generated predicate
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(Seq(e))
      val codegen = proj(row).getInt(0)
      (interpreted, codegen)
    }
    // -0.0 cut, 0.0 key: sort-equal ⇒ NOT strictly before ⇒ bucket 0
    assert(bucketOf(Seq(-0.0), 0.0) == ((0, 0)))
    assert(bucketOf(Seq(0.0), -0.0) == ((0, 0)))
    // NaN is GREATEST: a NaN cut is never strictly before a finite key
    assert(bucketOf(Seq(Double.NaN), 1e300) == ((0, 0)))
    // and every finite cut is strictly before a NaN key
    assert(bucketOf(Seq(-1.0, 0.0, 1.0), Double.NaN) == ((3, 3)))
    // plain order still works on both paths
    assert(bucketOf(Seq(1.0, 2.0, 3.0), 2.5) == ((2, 2)))
  }

  /** r19: the grouped path's offsets now ride one scalar subquery
    * ([[graft.functions.DistFold]] prefix fold + dist_bucket lookup)
    * by default; `wideGroups = true` keeps the broadcast theta-join
    * stitch for data-proportional group domains. Both forms must be
    * bit-equal — to each other and to the reference window — including
    * on NULL group keys (the fold's group-change comparator and the
    * lookup's nulls-first spec both place nulls like the sort). */
  test("grouped subquery path == join path == reference, incl. null groups") {
    val withNulls = base.withColumn("g",
      when(col("k") % 5 === 0, lit(null: String)).otherwise(col("g")))
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("k"))
    val ref = withNulls
      .withColumn("cs", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("pm", max(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
    def mk(wide: Boolean) = Dist.prefix(withNulls, Seq("g"),
      Seq(col("v"), col("k")), cums = Seq("cs" -> col("x")),
      rowNum = Some("rn"), groupN = Some("n"),
      maxPrev = Seq("pm" -> col("x")), parts = 7, wideGroups = wide)
    val cols = Seq("k", "cs", "rn", "pm", "n")
    val sub = sortedRows(mk(false), cols: _*)
    val join = sortedRows(mk(true), cols: _*)
    val refRows = sortedRows(ref, cols: _*)
    assert(sub == refRows, "subquery grouped path diverged from window")
    assert(join == refRows, "join grouped path diverged from window")
  }

  /** r19: the grouped default path must carry NO join for the offsets
    * stitch — the whole point of the subquery redesign is zero join
    * machinery (and two fewer broadcast builds) per action. The only
    * joins the wide (escape-hatch) form keeps are the offsets stitch
    * ones. */
  test("grouped subquery path plans no offsets join; wideGroups keeps it") {
    def joins(wide: Boolean) = Dist.prefix(base, Seq("g"),
        Seq(col("v"), col("k")), cums = Seq("cs" -> col("x")),
        groupN = Some("n"), parts = 7, wideGroups = wide)
      .queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    assert(joins(wide = false) == 0,
      "grouped subquery path still plans a join")
    assert(joins(wide = true) >= 1,
      "wideGroups escape hatch lost its join stitch")
  }

  /** r19: [[graft.functions.DistFold]] pinned directly against a brute
    * force over the same array — strictly-prior sums/maxes reset per
    * group, per-entry group totals, null maxes skipped, empty input. */
  test("dist_fold matches a brute-force prefix walk") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import graft.functions.DistFold
    // layout: g=1 key (long), pid int, cnt long, c=1 cum long, m=1 max
    // (nullable long)
    val elem = StructType(Seq(
      StructField("k0", LongType), StructField("pid", IntegerType),
      StructField("cnt", LongType), StructField("c1", LongType),
      StructField("m1", LongType)))
    val rows: Seq[(Long, Int, Long, Long, Option[Long])] = Seq(
      (1L, 0, 3L, 10L, Some(5L)), (1L, 1, 2L, 7L, None),
      (1L, 2, 4L, 1L, Some(9L)), (2L, 3, 1L, 2L, None),
      (3L, 4, 6L, 6L, Some(2L)), (3L, 5, 2L, 3L, Some(1L)))
    val arr = new GenericArrayData(rows.map { case (k, p, n, c1, m1) =>
      new GenericInternalRow(
        Array[Any](k, p, n, c1, m1.map(Long.box).orNull)): Any
    }.toArray)
    val e = DistFold(Seq(
      Literal.create(arr, ArrayType(elem)), Literal(1), Literal(1)))
    val got = e.eval(InternalRow.empty).asInstanceOf[InternalRow]
    val entries = got.getArray(0)
    assert(got.getLong(1) == rows.map(_._3).sum) // grand total
    // brute force per entry
    rows.zipWithIndex.foreach { case ((k, _, _, _, _), i) =>
      val prior = rows.take(i).filter(_._1 == k)
      val grp = rows.filter(_._1 == k)
      val ent = entries.getStruct(i, 4)
      assert(ent.getLong(0) == prior.map(_._3).sum, s"cnt@$i")
      assert(ent.getLong(1) == prior.map(_._4).sum, s"c1@$i")
      val pm = prior.flatMap(_._5)
      if (pm.isEmpty) assert(ent.isNullAt(2), s"m1@$i should be null")
      else assert(ent.getLong(2) == pm.max, s"m1@$i")
      assert(ent.getLong(3) == grp.map(_._3).sum, s"gn@$i")
    }
    // empty array: empty entries, zero grand total
    val empty = DistFold(Seq(
      Literal.create(new GenericArrayData(Array.empty[Any]),
        ArrayType(elem)), Literal(1), Literal(1)))
      .eval(InternalRow.empty).asInstanceOf[InternalRow]
    assert(empty.getArray(0).numElements() == 0 && empty.getLong(1) == 0L)
  }

  test("plans carry no unpartitioned window and no cartesian product") {
    val got = Dist.prefix(base, Nil, Seq(col("v"), col("k")),
      cums = Seq("cs" -> col("x")), rowNum = Some("rn"),
      rankLe = Some(("rk", "le")), groupN = Some("n"),
      lead1 = Some(("k", "nx")), parts = 7)
    val qe = got.queryExecution
    qe.optimizedPlan.foreach {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        assert(w.partitionSpec.nonEmpty,
          s"unpartitioned window in Dist.prefix plan: ${w.windowExpressions}")
      case _ =>
    }
    val p = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
  }
}
