package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types._

/** Native range-bucket assignment for [[Dist.prefix]] (r16, the r15
  * verdict ask #5): `dist_bucket(spec, cuts, k1, ..., km)` returns the
  * number of cut tuples that sort STRICTLY BEFORE the row's key tuple —
  * i.e. the row's range-partition id — by BINARY SEARCH over the
  * sorted cut array.
  *
  * This replaces r15's literal `when/otherwise` comparison tree, whose
  * O(buckets) expression-node count capped the tier at 1024 buckets
  * (and pushed large plans toward the codegen method-size cliff). Here
  * the cut array is DATA (one sorted, deduped `array<struct>` built
  * in-plan and broadcast on a 1-row frame), so the per-row cost is
  * O(|keys| · log buckets) regardless of the bucket count, and the
  * expression itself is a handful of codegen'd lines — the bucket cap
  * rises to [[Dist.MaxBuckets]] limited only by the sample size, not
  * by expression arity.
  *
  * `spec` is a foldable string literal, one comma-separated token per
  * key: direction `a`/`d` (ascending/descending) + null order `f`/`l`
  * (nulls first/last) — e.g. `"af,df"`. It mirrors the resolved
  * SortOrder of the window the tier replaces, so equal keys always
  * land in the same bucket (rank/peer semantics survive bucketing).
  *
  * Determinism: a pure function of (cuts, row keys). Re-evaluating any
  * subtree — executor loss, cache eviction, AQE re-plan — assigns
  * identical ids, which is the tier's recompute-safety contract
  * (DistPrefixSpec pins it by evicting every cache between runs).
  *
  * Comparison semantics match the driver-side comparator the r15 tier
  * sampled cuts with: natural `Comparable` order per key (Long, Int,
  * String, Decimal, Date, Timestamp), Double/Float via Spark's
  * `SQLOrderingUtil` (NaN greatest, -0.0 == 0.0 — NOT
  * java.lang.Double.compareTo, which orders -0.0 < 0.0 and would
  * split sort-equal keys across buckets), direction-flipped, nulls
  * placed by the resolved null order; codegen compares via the same
  * primitive comparators Spark's own SortOrder generates
  * (`ctx.genComp` → SQLOrderingUtil for floating types).
  */
case class DistBucket(children: Seq[Expression]) extends Expression {

  private def specExpr: Expression = children.head
  private def cutsExpr: Expression = children(1)
  @transient private lazy val keyExprs: Seq[Expression] = children.drop(2)

  /** (ascending, nullsFirst) per key, parsed from the spec literal. */
  @transient private lazy val flags: IndexedSeq[(Boolean, Boolean)] =
    specExpr.eval(null).toString.split(",").toIndexedSeq
      .map(t => (t.charAt(0) == 'a', t.charAt(1) == 'f'))

  @transient private lazy val keyTypes: IndexedSeq[DataType] =
    keyExprs.map(_.dataType).toIndexedSeq

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length < 3)
      return TypeCheckResult.TypeCheckFailure(
        "dist_bucket(spec, cuts, key, ...) needs at least one key")
    if (!(specExpr.foldable && specExpr.dataType == StringType))
      return TypeCheckResult.TypeCheckFailure(
        "dist_bucket spec must be a foldable string literal")
    cutsExpr.dataType match {
      case ArrayType(st: StructType, _) =>
        if (st.length != keyExprs.length)
          TypeCheckResult.TypeCheckFailure(
            s"dist_bucket cut struct has ${st.length} fields for " +
              s"${keyExprs.length} keys")
        else {
          val bad = st.fields.map(_.dataType).zip(keyExprs.map(_.dataType))
            .zipWithIndex.collect { case ((ct, kt), i) if ct != kt => i }
          if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"dist_bucket cut/key type mismatch at ${bad.mkString(",")}")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"dist_bucket cuts must be array<struct>, got ${other.simpleString}")
    }
  }

  override def prettyName: String = "dist_bucket"

  /** cut <sort-order-strictly-before> row? Lexicographic over the keys.
    * Floats/doubles compare via [[SQLOrderingUtil]] (NaN greatest,
    * -0.0 == 0.0) — the SAME semantics `doGenCode`'s `ctx.genComp`
    * emits and the in-plan `array_sort` cut comparator uses, so the
    * interpreted path (codegen fallback, constant folding) can never
    * split keys the sort treats as equal across buckets. */
  private def cutBeforeRow(cut: InternalRow, row: Array[Any]): Boolean = {
    var i = 0
    while (i < keyTypes.length) {
      val cv = if (cut.isNullAt(i)) null else cut.get(i, keyTypes(i))
      val rv = row(i)
      val (asc, nullsFirst) = flags(i)
      val c =
        if (cv == null && rv == null) 0
        else if (cv == null) { if (nullsFirst) -1 else 1 }
        else if (rv == null) { if (nullsFirst) 1 else -1 }
        else {
          val nat = keyTypes(i) match {
            case DoubleType => SQLOrderingUtil.compareDoubles(
              cv.asInstanceOf[Double], rv.asInstanceOf[Double])
            case FloatType => SQLOrderingUtil.compareFloats(
              cv.asInstanceOf[Float], rv.asInstanceOf[Float])
            case _ => cv.asInstanceOf[Comparable[Any]].compareTo(rv)
          }
          if (asc) nat else -nat
        }
      if (c != 0) return c < 0
      i += 1
    }
    false // equal tuple: NOT strictly before — ties stay in the lower bucket
  }

  override def eval(input: InternalRow): Any = {
    val arr = cutsExpr.eval(input)
    if (arr == null) return 0
    val cuts = arr.asInstanceOf[ArrayData]
    val k = keyTypes.length
    val row = new Array[Any](k)
    var i = 0
    while (i < k) { row(i) = keyExprs(i).eval(input); i += 1 }
    var lo = 0
    var hi = cuts.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cutBeforeRow(cuts.getStruct(mid, k), row)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsEv = cutsExpr.genCode(ctx)
    val keyEvs = keyExprs.map(_.genCode(ctx))
    val k = keyTypes.length
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val cut = ctx.freshName("cut")
    val cmp = ctx.freshName("cmp")
    // one comparison block per key, first-nonzero wins
    val perKey = keyTypes.zipWithIndex.map { case (dt, i) =>
      val (asc, nullsFirst) = flags(i)
      val jt = CodeGenerator.javaType(dt)
      val cv = ctx.freshName(s"cv$i")
      val cutNullBranch = if (nullsFirst) "-1" else "1"
      val rowNullBranch = if (nullsFirst) "1" else "-1"
      val natural = ctx.genComp(dt, cv, keyEvs(i).value)
      val signed = if (asc) natural else s"(-($natural))"
      s"""
         |if ($cmp == 0) {
         |  if ($cut.isNullAt($i)) {
         |    $cmp = ${keyEvs(i).isNull} ? 0 : $cutNullBranch;
         |  } else if (${keyEvs(i).isNull}) {
         |    $cmp = $rowNullBranch;
         |  } else {
         |    $jt $cv = ${CodeGenerator.getValue(cut, dt, i.toString)};
         |    $cmp = $signed;
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    val result = ctx.freshName("bucket")
    val search =
      s"""
         |int $lo = 0;
         |int $hi = ${cutsEv.isNull} ? 0 : ${cutsEv.value}.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  org.apache.spark.sql.catalyst.InternalRow $cut =
         |    ${cutsEv.value}.getStruct($mid, $k);
         |  int $cmp = 0;
         |  $perKey
         |  if ($cmp < 0) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |int $result = $lo;
       """.stripMargin
    ev.copy(
      code = cutsEv.code + keyEvs.map(_.code).fold(EmptyBlock)(_ + _) +
        code"$search",
      value = JavaCode.variable(result, IntegerType),
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DistBucket =
    copy(children = newChildren)
}

object DistBucket {
  /** Register `dist_bucket` in the session's function registry
    * (callable via functions.call_function). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dist_bucket", exprs => DistBucket(exprs), "built-in")
}
