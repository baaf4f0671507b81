package graft

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.{LlmOps, WindowOps}

/** Algebraic laws (SURVEY.md §5.3) over generated fixtures:
  * dedup idempotency, sessionization invariants, union additivity.
  * Sample counts are small — each sample runs real Spark jobs. */
object PropertySpec extends Properties("graft") {
  import TestBase._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val word = Gen.oneOf("join", "filter", "window", "group", "scan",
    "sort", "hash", "merge", "read", "write")
  private val text = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("exact dedup survivors == distinct normalized texts, and is idempotent") =
    forAll(Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, text))) { texts =>
      val dir = tmpDir("prop_dedup")
      val rows = texts.zipWithIndex.map { case (t, i) =>
        Row(i.toLong, t, "en", "s0", t.length.toLong)
      }
      writeTable(dir, "documents", documentsSchema, rows)
      val out = LlmOps.dedupExact(spark, dir).collect()
      val survivors = out.map(_.getLong(1)).sum
      val expected = texts.map(_.toLowerCase.trim).distinct.size
      // idempotency: running dedup on already-unique texts keeps them all
      val dir2 = tmpDir("prop_dedup2")
      val uniq = texts.map(_.toLowerCase.trim).distinct.zipWithIndex
        .map { case (t, i) => Row(i.toLong, t, "en", "s0", t.length.toLong) }
      writeTable(dir2, "documents", documentsSchema, uniq)
      val survivors2 = LlmOps.dedupExact(spark, dir2).collect().map(_.getLong(1)).sum
      survivors == expected && survivors2 == expected
    }

  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 30)
    rows <- Gen.listOfN(n, for {
      user <- Gen.chooseNum(1L, 3L)
      off <- Gen.chooseNum(0L, 20000L)
    } yield (user, off))
  } yield rows.zipWithIndex.map { case ((u, o), i) => (i.toLong, u, 1700000000L + o) }

  property("sessionize: events partition exactly into sessions; session spans respect the gap") =
    forAll(eventsGen) { evs =>
      val dir = tmpDir("prop_sess")
      writeEvents(dir,
        evs.map { case (id, u, ts) => eventRow(id, ts, u, "view", 1.0) })
      val sessions = WindowOps.sessionize(spark, dir).collect()
      val totalEvents = sessions.map(_.getLong(4)).sum
      // per (user, session): start <= end; sessions of one user don't overlap
      val byUser = sessions.groupBy(_.getLong(0))
      val ordered = byUser.forall { case (_, ss) =>
        val sorted = ss.sortBy(_.getLong(1))
        sorted.forall(r => r.getLong(2) <= r.getLong(3)) &&
          sorted.sliding(2).forall {
            case Array(a, b) => b.getLong(2) - a.getLong(3) > 1800
            case _ => true
          }
      }
      totalEvents == evs.size && ordered
    }

  property("ngram dedup: a ubiquitous gram does not explode the pair count") =
    forAll(Gen.chooseNum(10, 20)) { n =>
      val dir = tmpDir("prop_ngram")
      // every doc shares the planted phrase (a hot 3-gram in each);
      // docs 0 and 1 are near-duplicates of each other; the rest are
      // pairwise-distinct junk.
      val shared = "alpha beta gamma delta"
      val rows = (0 until n).map { i =>
        val body =
          if (i == 1) s"dup one two three four five six seven $shared"
          else if (i == 0) s"dup one two three four five six eight $shared"
          else s"junk${i}a junk${i}b junk${i}c junk${i}d junk${i}e $shared"
        Row(i.toLong, body, "en", "s0", body.length.toLong)
      }
      writeTable(dir, "documents", documentsSchema, rows)
      // maxDf = 5 << n: the shared grams are dropped before the
      // self-join, so the only surviving pairs come from genuinely
      // shared rare grams — NOT the O(n²) hot-key explosion (every one
      // of the C(n,2) pairs shares the planted grams).
      val pairs = LlmOps.dedupNgram(spark, dir, 5).collect()
      val allPairs = n.toLong * (n - 1) / 2
      pairs.length < allPairs / 2 &&
        pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    }

  property("ccStars == ccMinLabel on random graphs, and both are true components") =
    forAll(Gen.chooseNum(0, 40).flatMap(m => Gen.listOfN(m, for {
      a <- Gen.chooseNum(0L, 25L)
      b <- Gen.chooseNum(0L, 25L)
    } yield (a, b)))) { rawEdges =>
      import spark.implicits._
      val edges = rawEdges.filter { case (a, b) => a != b }
      val df = edges.toDF("d1", "d2")
      val byLabel = graft.operators.CurationOps.ccMinLabel(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byStars = graft.operators.CurationOps.ccStars(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference components via plain union-find on the driver
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(v => v -> find(v)).toMap
      byLabel == want && byStars == want
    }

  property("heavy hitters: MG sketch lower-bounds within n/(cap+1); exact when cap >= vocab") =
    forAll(Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, text))) { texts =>
      val dir = tmpDir("prop_hh")
      writeTable(dir, "documents", documentsSchema,
        texts.zipWithIndex.map { case (t, i) =>
          Row(i.toLong, t, "en", "s0", t.length.toLong) })
      val truth = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val n = truth.values.sum
      val cap = 3 // << vocab (10 words) so the decrement step actually fires
      val approx = LlmOps.heavyHittersApprox(spark, dir, k = 50, capacity = cap)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // Misra–Gries guarantees: never overestimates, and the undercount
      // (including tokens shed entirely) is at most n/(capacity+1)
      val lowerBound = approx.forall { case (t, est) => est <= truth(t) }
      val errBound = truth.forall { case (t, c) =>
        c - approx.getOrElse(t, 0L) <= n.toDouble / (cap + 1) }
      // capacity >= vocabulary: no counter is ever evicted, counts exact
      val wide = LlmOps.heavyHittersApprox(spark, dir, k = 50, capacity = 1000)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      lowerBound && errBound && wide == truth
    }

  property("union-all count additivity over generated key sets") =
    forAll(Gen.listOf(Gen.chooseNum(0, 5)), Gen.listOf(Gen.chooseNum(0, 5))) { (a, b) =>
      import spark.implicits._
      val da = a.toDF("k"); val db = b.toDF("k")
      da.unionByName(db).count() == a.size + b.size
    }

  // (group, order value with heavy ties, unique key, summand): the
  // unique key makes (v, k) a total order, so the ROWS-frame running
  // sum is well-defined on both engines; group sizes and the
  // rows-vs-buckets ratio randomize so bucket boundaries, empty
  // buckets, and the carried-offset join all exercise (the
  // DistPrefixSpec fixtures pin the tie cases; this pins the SHAPES).
  private val distRowsGen: Gen[List[(String, Long, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(0L, 7L)
      x <- Gen.chooseNum(0L, 100L)
    } yield (g, v, x))
  } yield rows.zipWithIndex.map { case ((g, v, x), i) => (g, v, i.toLong, x) }

  property("Dist.prefix == single-partition window on random fixtures, global and grouped") =
    forAll(distRowsGen, Gen.chooseNum(2, 9)) { (rows, parts) =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val df = rows.toDF("g", "v", "k", "x").repartition(4)
      def dump(d: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        d.select(col("k"), col("cs"), col("rn"), col("n"))
          .collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
      def ref(w0: org.apache.spark.sql.expressions.WindowSpec) = df
        .withColumn("cs", sum(col("x")).over(w0.orderBy(col("v"), col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(
          w0.orderBy(col("v"), col("k"))).cast("long"))
        .withColumn("n", count(lit(1)).over(
          w0.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      def got(part: Seq[String]) = graft.functions.Dist.prefix(
        df, part, Seq(col("v"), col("k")),
        cums = Seq("cs" -> col("x")), rowNum = Some("rn"),
        groupN = Some("n"), parts = parts)
      dump(got(Nil)) == dump(ref(Window.partitionBy())) &&
        dump(got(Seq("g"))) == dump(ref(Window.partitionBy(col("g"))))
    }
}
