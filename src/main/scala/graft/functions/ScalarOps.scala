package graft.functions

import graft.{Fin, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Scalar function surface: string / date / math / json / array / map,
  * plus the UDF, UDAF (typed Aggregator) and Generator rows
  * (SURVEY.md §2.7, §2.4 q_udaf_geomean).
  *
  * Everything except the two deliberate UDx rows uses built-in
  * `functions._` so the expressions stay inside whole-stage codegen;
  * the UDF/UDAF rows exist to exercise that registration surface, with
  * their oracle re-expressed as plain SQL.
  */
object ScalarOps {
  import Fin._

  /** q_string_funcs — dimension munging: upper/substring/concat_ws/
    * length/regexp_extract (digits out of 'Brand#13'). */
  def stringFuncs(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    ord(
      p.filter(col("p_name").like("%e%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_type"), 1, 4).as("type4"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num")),
      col("p_partkey"))
  }

  /** q_date_funcs — date-bucketed everything (the GA organizing axis). */
  def dateFuncs(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    ord(
      o.select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).cast("date").as("due_date")),
      col("o_orderkey"))
  }

  /** q_math_funcs — math expression composites per returnflag. */
  def mathFuncs(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    ord(
      li.groupBy(col("l_returnflag"))
        .agg(
          r4(avg(sqrt(col("l_extendedprice")))).as("avg_sqrt_price"),
          r4(avg(pow(col("l_discount"), 2))).as("avg_disc_sq"),
          r4(avg(log(col("l_extendedprice") + 1))).as("avg_ln_price"),
          r4(abs(min(col("l_quantity") - 10))).as("abs_min_qty"),
          r4(sum(round(col("l_tax"), 2))).as("sum_round_tax")),
      col("l_returnflag"))
  }

  /** q_json_funcs — semi-structured props: extract $.k as int, avg per
    * event_type. JSON path evaluation is codegen'd (GetJsonObject). */
  def jsonFuncs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    ord(
      e.select(col("event_type"),
               get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(r4(avg(col("k"))).as("avg_k"), count(lit(1)).as("n"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k")),
      col("event_type"))
  }

  /** q_array_funcs — vector-column basics via higher-order functions.
    * Arrays are cast to double BEFORE any arithmetic so both engines
    * accumulate in f64 left-to-right (bit-stable; SURVEY.md §2.10). */
  def arrayFuncs(s: SparkSession, d: String): DataFrame = {
    val em = Tables.embeddings(s, d)
    val vecD = col("embedding").cast("array<double>")
    val sumSq = aggregate(vecD, lit(0.0), (acc, x) => acc + x * x)
    ord(
      em.select(col("label"),
                size(col("embedding")).as("dim"),
                sqrt(sumSq).as("l2"),
                element_at(vecD, 1).as("e1"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
             min(col("dim")).as("min_dim"), max(col("dim")).as("max_dim"),
             r4(avg(col("l2"))).as("avg_l2"),
             r4(avg(col("e1"))).as("avg_e1")),
      col("label"))
  }

  /** q_explode — the Generator row: split → explode → global top-20
    * tokens. At 100 TB the explode is map-side; the token count is a
    * partial-aggregated shuffle on token, then a global top-k. */
  def explodeTokens(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)
  }

  /** q_map_funcs — MapType construction round trip: groupBy → sorted
    * entries → `map_from_entries` → `posexplode` back to scalar
    * (pos, k, n) rows. The map is real (MapType in the plan); the OUTPUT
    * is scalar-only because top-level array/map columns can't be
    * hash-compared across engines (SURVEY.md §2.10 rule 5 — and the
    * driver's checker rejects them outright). */
  def mapFuncs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val counts = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val m = map_from_entries(
      sort_array(collect_list(struct(col("event_type"), col("n")))))
    ord(
      counts.agg(m.as("m"))
        .select(posexplode(col("m")).as(Seq("pos", "k", "n"))),
      col("pos"))
  }

  /** q_udf_scalar — the deliberate black-box UDF row (price banding).
    * NOTE: a UDF blocks codegen + pushdown; the engine-wide rule is
    * "functions, not UDFs" — this exists only to cover the surface. */
  def udfScalar(s: SparkSession, d: String): DataFrame = {
    val priceBand = udf((p: Double) =>
      if (p < 50000) "low" else if (p < 200000) "mid" else "high")
    val o = Tables.orders(s, d)
    ord(
      o.select(priceBand(col("o_totalprice")).as("band"))
        .groupBy(col("band")).agg(count(lit(1)).as("n")),
      col("band"))
  }

  /** Typed UDAF: geometric mean via log-sum — numerically stable and
    * mergeable (the only formulation that works as a partial aggregate
    * across 1000 executors). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
    def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder = Encoders.scalaDouble
  }

  /** q_udaf_geomean — custom typed Aggregator surface (SURVEY.md §2.4). */
  def udafGeomean(s: SparkSession, d: String): DataFrame = {
    val geo = udaf(GeoMean)
    val li = Tables.lineitem(s, d)
    ord(
      li.groupBy(col("l_returnflag"))
        .agg(r4(geo(col("l_extendedprice"))).as("geomean_price")),
      col("l_returnflag"))
  }
}
