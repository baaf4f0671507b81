package graft.operators

import graft.{Fin, Tables}
import graft.Iter.IterOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond connected components (CurationOps): PageRank
  * over a derived trade graph. Nodes are nations; a directed edge
  * src → dst carries the number of lineitems a customer in `src` bought
  * from a supplier in `dst` — a small dense graph derived from a large
  * fact table, the classic "aggregate events into an entity graph, then
  * rank" pipeline.
  *
  * Scale notes (100 TB):
  *  - edge derivation is the expensive half and it is pure relational
  *    work: fact-table joins against broadcast dimensions, then one
  *    partial-aggregable shuffle on (src, dst) — edge count is bounded
  *    by |nodes|², never by fact rows. It runs ONCE per source state:
  *    [[tradeEdgeStoreDir]] publishes the aggregate as an ingest-time
  *    edge store, and all 11 graph queries read the store — the fact
  *    tables never appear in a graph query's plan;
  *  - each PageRank iteration is an edge×rank equi-join on src plus one
  *    aggregate on dst — the same edge-join-iterate shape as
  *    [[CurationOps.dedupCluster]]; the iteration count is FIXED (3),
  *    so lineage stays shallow and no checkpoint is needed (an open
  *    convergence loop would reuse dedupCluster's lazy-checkpoint
  *    fusion);
  *  - dangling mass uses the simple formulation (no redistribution),
  *    mirrored exactly in the oracle.
  */
object GraphOps {
  import Fin._

  private val Damping = 0.85
  // Spelled as a literal, NOT 1.0 - Damping: the subtraction lands one
  // ulp away from the decimal literal 0.15 the oracle parses, and the
  // base term feeds every iteration. Same-literal-same-double is the
  // cross-engine rule.
  private val Base = 0.15
  private val Iters = 3

  /** The weighted trade-graph edge DERIVATION: src = buyer's nation,
    * dst = supplier's nation, w = lineitem count. Pure relational work —
    * fact joins against broadcast dimensions, one partial-aggregable
    * shuffle on (src, dst); the edge count is bounded by |nodes|²,
    * never by fact rows. Runs ONCE per source state inside
    * [[tradeEdgeStoreDir]]; queries never call it directly. */
  private def deriveTradeEdges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** The published trade-edge store (r12 verdict ask #1): the
    * |nodes|²-bounded (src, dst, w) aggregate materialized ONCE per
    * source state (CachedDir fingerprint + ATOMIC_MOVE publish, the
    * session/basket/cluster-store pattern) instead of re-deriving the
    * lineitem⋈orders fact join in each graph query — at
    * 100 TB the fact join IS the family's dominant cost, and it is
    * ingest-time work (edges change when data lands, not when a
    * ranking runs). Result-invisible by construction: the store holds
    * exact int64 aggregates, and a parquet round-trip of exact ints is
    * bit-identical, so every graph query hashes the same against the
    * fact-table-derived DuckDB oracle (the oracle never reads the
    * store). PlanSpec asserts no graph plan scans a fact table. */
  def tradeEdgeStoreDir(s: SparkSession, d: String): String =
    graft.sources.CachedDir.materialize(s, d, "lineitem.parquet",
                                        "trade_edges") { tmp =>
      deriveTradeEdges(s, d).write.mode("overwrite").parquet(tmp)
    }

  /** Every graph query's edge input: the published store, read with a
    * declared schema (no footer inference on the hot path). */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    s.read.schema(StructType(Seq(
        StructField("src", IntegerType), StructField("dst", IntegerType),
        StructField("w", LongType))))
      .parquet(tradeEdgeStoreDir(s, d))
  }

  /** q_centrality — all-pairs hop distances + harmonic centrality over
    * the UNDIRECTED trade graph: per nation, reachable-node count,
    * eccentricity (max hops) and harmonic centrality Σ 1/d — the
    * "which hub is closest to everyone" ranking that degree (local)
    * and PageRank (flow) both miss. Adds the shortest-path operator
    * class to the graph family.
    *
    * Distances come from frontier BFS expansion: each round joins the
    * current frontier against the adjacency list and anti-joins known
    * pairs; the loop stops when a round discovers nothing — ≤ diameter
    * rounds over |nodes|²-bounded frames (the CurationOps.cc
    * convergence pattern). The oracle recomputes true distances with a
    * recursive CTE, so an under-iterated BFS fails the hash loudly.
    *
    * Determinism: distances are exact integer hops; harmonic Σ 1/d is
    * computed as the EXACT integer Σ cnt·(2520/d) — 2520 = lcm(1..10)
    * makes every per-distance term integral (a diameter beyond 10
    * throws rather than rounding; no double accumulates across rows).
    *
    * Scale shape: at 100 TB the edge derivation dominates and stays
    * relational; the BFS frames are |nodes|²-bounded throughout. */
  def centrality(s: SparkSession, d: String): DataFrame = {
    val und = tradeEdges(s, d).filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      .distinct()
      .iterCut(true)
    var dist = adj.withColumn("dist", lit(1L)).iterCut(true)
    var frontier = dist
    var hop = 1L
    var advanced = true
    while (advanced && hop <= 10) {
      val next = frontier.as("f")
        .join(adj.as("x"), col("f.v") === col("x.u"))
        .select(col("f.u").as("u"), col("x.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .join(dist.select(col("u"), col("v")), Seq("u", "v"), "left_anti")
        .withColumn("dist", lit(hop + 1L))
        .iterCut(true)
      if (next.isEmpty) advanced = false
      else { dist = dist.unionAll(next).iterCut(true); frontier = next; hop += 1 }
    }
    require(hop <= 10, s"graph diameter exceeds 10 — the exact-integer " +
      "harmonic scaling (lcm 2520) no longer applies")
    ord(
      dist.groupBy(col("u").as("nationkey"))
        .agg(count(lit(1)).as("n_reachable"),
             max(col("dist")).as("eccentricity"),
             sum(expr("2520 DIV dist")).as("hscaled"))
        .select(col("nationkey"), col("n_reachable"), col("eccentricity"),
                r4(col("hscaled").cast("double") / 2520.0).as("harmonic")),
      col("nationkey"))
  }

  /** q_pagerank — 3 fixed PageRank iterations over the customer-nation →
    * supplier-nation trade graph; emits every nation's rank. */
  def pageRank(s: SparkSession, d: String): DataFrame = {
    val nation = Tables.nation(s, d)
    // edges feed both the out-weight aggregate and the transition join —
    // two tiny store scans; no checkpoint needed now the store exists
    val edges = tradeEdges(s, d)
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    // w/ow is an exact-integer ratio divided once — identical on both
    // engines; it is NOT rounded because it feeds further arithmetic.
    // Eager Iter.cut: the transition matrix is ≤|nodes|² rows, so
    // materializing it runs the expensive fact-table joins ONCE and
    // gives the planner real (tiny) size stats — every iteration then
    // broadcast-joins against it instead of re-deriving the edges from
    // lineitem⋈orders per round (measured: 47 exchanges → 12).
    val trans = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
      .iterCut(true)
    val nodes = nation.select(col("n_nationkey").as("v"))
    val nCnt = nodes.agg(count(lit(1)).as("nc"))
    var pr = nodes.crossJoin(broadcast(nCnt))
      .select(col("v"), (lit(1.0) / col("nc")).as("pr"))
    // Rank and contribution frames are ≤|nodes| rows by construction —
    // broadcast them explicitly (the planner cannot estimate derived
    // sizes through the iteration, and would fall back to SMJ).
    for (_ <- 1 to Iters) {
      val contrib = trans.join(broadcast(pr), trans("src") === pr("v"))
        .groupBy(col("dst")).agg(sum(col("pr") * col("p")).as("in_pr"))
      pr = nodes.crossJoin(broadcast(nCnt))
        .join(broadcast(contrib), col("v") === col("dst"), "left")
        .select(col("v"),
                (lit(Base) / col("nc") +
                 lit(Damping) * coalesce(col("in_pr"), lit(0.0))).as("pr"))
    }
    ord(
      pr.join(broadcast(nation), col("v") === col("n_nationkey"))
        .select(col("v").as("nationkey"), col("n_name").as("nation"),
                r4(col("pr")).as("pagerank")),
      col("nationkey"))
  }

  /** q_graph_degree — per-nation degree profile of the trade graph:
    * out/in degree (distinct counterpart nations) and out/in weighted
    * degree (lineitem volume). The basic "how connected is this
    * entity" readout that precedes any ranking.
    *
    * Scale shape: after the shared edge derivation, two aggregates over
    * a ≤|nodes|² frame plus broadcast left-joins onto the node list —
    * every count is an exact integer. */
  def graphDegree(s: SparkSession, d: String): DataFrame = {
    // two aggregates each scan the tiny published store — keeping the
    // plan declarative (no RDD break) beats saving a ~|nodes|^2 re-read
    val edges = tradeEdges(s, d)
    val out = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("out_degree"), sum(col("w")).as("out_weight"))
    val in = edges.groupBy(col("dst"))
      .agg(count(lit(1)).as("in_degree"), sum(col("w")).as("in_weight"))
    ord(
      Tables.nation(s, d)
        .join(broadcast(out), col("n_nationkey") === col("src"), "left")
        .join(broadcast(in), col("n_nationkey") === col("dst"), "left")
        .select(col("n_nationkey").as("nationkey"), col("n_name").as("nation"),
                coalesce(col("out_degree"), lit(0L)).as("out_degree"),
                coalesce(col("in_degree"), lit(0L)).as("in_degree"),
                coalesce(col("out_weight"), lit(0L)).as("out_weight"),
                coalesce(col("in_weight"), lit(0L)).as("in_weight")),
      col("nationkey"))
  }

  /** q_triangles — per-nation triangle count and local clustering
    * coefficient over the UNDIRECTED trade graph (edge direction and
    * self-loops dropped, pairs canonicalized a<b). Triangle counting is
    * the standard cohesion metric; the a<b<c join enumeration counts
    * each triangle exactly once.
    *
    * Scale shape: the graph is an entity graph (nations), so |V| is
    * vocabulary-bounded and |E| ≤ |V|² — the three-way self-join is
    * explicitly broadcast. On a billion-edge graph the same query would
    * pre-filter by degree (or sample) before enumeration; the
    * derivation from 100 TB of facts is the expensive half and stays
    * one partial-aggregable shuffle. Determinism: 2T/(deg·(deg−1)) is
    * an exact-integer ratio divided once, rounded once. */
  def triangles(s: SparkSession, d: String): DataFrame = {
    // the canonical edge set feeds three self-join branches and the
    // degree aggregate — each re-canonicalizes the tiny store scan;
    // declarative beats an RDD break at this frame size
    val und = tradeEdges(s, d).filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val tri = und.as("e1")
      .join(broadcast(und.as("e2")), col("e1.b") === col("e2.a"))
      .join(broadcast(und.as("e3")),
            col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val triPerNode = tri.select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
    ord(
      Tables.nation(s, d)
        .join(broadcast(deg), col("n_nationkey") === deg("v"), "left")
        .join(broadcast(triPerNode), col("n_nationkey") === triPerNode("v"), "left")
        .select(col("n_nationkey").as("nationkey"), col("n_name").as("nation"),
                coalesce(col("degree"), lit(0L)).as("degree"),
                coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
                when(coalesce(col("degree"), lit(0L)) < 2, lit(0.0))
                  .otherwise(r4(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
                                (col("degree") * (col("degree") - 1))))
                  .as("clustering")),
      col("nationkey"))
  }

  /** q_graph_jaccard — structural node similarity: Jaccard of neighbor
    * sets |N(u)∩N(w)|/|N(u)∪N(w)| for every nation pair sharing ≥1
    * common neighbor in the undirected trade graph — the link-
    * prediction / role-equivalence score beside q_triangles' cohesion.
    * Common neighbors come from a WEDGE JOIN on the shared-neighbor key
    * (each 2-path center contributes one candidate pair) — never an
    * all-pairs set compare; the union size derives from the exact
    * degree counts (du + dw − common).
    *
    * Scale shape: adjacency and degrees are |E|-bounded aggregates of
    * the once-derived canonical edge set; the wedge join fans out per
    * center degree (the bounded |V|² graph contract this family
    * documents). Ratio divides exact integers once — hash-safe r4. */
  def graphJaccard(s: SparkSession, d: String): DataFrame = {
    val und = tradeEdges(s, d).filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("v"), col("b").as("n"))
      .unionAll(und.select(col("b").as("v"), col("a").as("n")))
    val deg = adj.groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val l = adj.select(col("n").as("c"), col("v").as("u"))
    val r = adj.select(col("n").as("c2"), col("v").as("w"))
    val common = l.join(broadcast(r),
        col("c") === col("c2") && col("u") < col("w"))
      .groupBy(col("u"), col("w")).agg(count(lit(1)).as("common"))
    ord(
      common
        .join(broadcast(deg.select(col("v").as("u"), col("deg").as("du"))), "u")
        .join(broadcast(deg.select(col("v").as("w"), col("deg").as("dw"))), "w")
        .select(col("u"), col("w"), col("common"), col("du"), col("dw"),
          r4(col("common").cast("double") /
             (col("du") + col("dw") - col("common"))).as("jaccard")),
      col("u"), col("w"))
  }

  /** STRONG-tie edge set shared by the components / 2-hop /
    * reciprocity / assortativity queries: keep src≠dst edges whose
    * weight clears 2× the mean edge weight — w·|E| ≥ 2·Σw in exact
    * int64, a relative cutoff that scales with the corpus (the raw
    * trade graph is complete at every SF, so every structural query
    * needs it). The 1-row cutoff frame broadcasts. */
  private def strongEdges(s: SparkSession, d: String): DataFrame = {
    val edges = tradeEdges(s, d)
    val cut = edges.agg(sum(col("w")).as("tw"), count(lit(1)).as("ne"))
    edges.crossJoin(broadcast(cut))
      .filter(col("src") =!= col("dst") &&
              col("w") * col("ne") >= lit(2L) * col("tw"))
      .select(col("src"), col("dst"), col("w"))
  }

  /** q_graph_components — connected components of the STRONG-tie trade
    * graph: keep edges whose weight is ≥ 2× the mean edge weight
    * (w·|E| ≥ 2·Σw in exact int64 — a relative cutoff that scales with
    * the corpus, no magic absolute), then label every nation with the
    * minimum nationkey reachable over the undirected strong edges.
    * Nations outside any strong tie surface as singleton components —
    * the "trade bloc" readout (who actually clusters with whom once
    * weak background volume is cut).
    *
    * Scale shape: the edge derivation is the shared |nodes|²-bounded
    * tradeEdges; components run through [[CurationOps.cc]] — min-label
    * propagation with the O(log² n) large-star/small-star fallback, the
    * SAME engine the document cluster store uses at corpus scale, so
    * the operator inherits its convergence guarantees; the 1-row cutoff
    * frame and the node list broadcast. Labels are fixpoint-unique →
    * deterministic regardless of execution order. */
  def components(s: SparkSession, d: String): DataFrame = {
    val strong = strongEdges(s, d)
      .select(col("src").cast("long").as("d1"), col("dst").cast("long").as("d2"))
    val labeled = CurationOps.cc(strong)
      .select(col("doc_id").cast("int").as("nationkey"),
              col("component").cast("int").as("comp"))
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("nationkey"), col("n_name").as("nation"))
    val comp = nodes.join(broadcast(labeled), Seq("nationkey"), "left")
      .select(col("nationkey"), col("nation"),
              coalesce(col("comp"), col("nationkey")).as("component"))
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("csize"))
    ord(
      comp.join(broadcast(sizes), "component")
        .select(col("nationkey"), col("nation"), col("component"),
                col("csize").as("component_size")),
      col("nationkey"))
  }

  /** q_graph_2hop — two-hop link recommendation over the STRONG-tie
    * trade graph (q_graph_components' exact w·|E| ≥ 2·Σw cutoff — the
    * raw graph is complete at every SF, so 2-hop-minus-direct is empty
    * without it): pairs (a, c) with NO strong direct edge but at least
    * one strong intermediary a→b→c, scored by Σ_b min(w_ab, w_bc) —
    * the bottleneck-capacity score used by "people you may know" /
    * supplier-discovery recommenders. Adds the multi-hop reachability
    * operator class the degree/jaccard/PageRank family doesn't cover
    * (jaccard compares neighborhoods; this MATERIALIZES the reachable
    * non-neighbors and ranks them).
    *
    * Determinism: strong cutoff and scores are exact int64 (min/Σ of
    * counts); output ordered by the (src, dst) key.
    *
    * Scale shape: strong edges are a filtered |nodes|²-bounded frame
    * derived once (persisted — the self-join reads it twice); the
    * path self-join keys on the shared node b, the anti join removes
    * direct edges on (src, dst) — all |E_strong|·avg-degree bounded,
    * never fact-row bounded. At 100 TB only tradeEdges grows. */
  def twoHop(s: SparkSession, d: String): DataFrame = {
    val strong = strongEdges(s, d)
    val paths = strong.as("ab")
      .join(strong.as("bc"),
            col("ab.dst") === col("bc.src") && col("ab.src") =!= col("bc.dst"))
      .groupBy(col("ab.src").as("src"), col("bc.dst").as("dst"))
      .agg(count(lit(1)).as("n_paths"),
           sum(least(col("ab.w"), col("bc.w"))).as("score"))
    ord(
      paths.join(strong.select(col("src"), col("dst")),
                 Seq("src", "dst"), "left_anti"),
      col("src"), col("dst"))
  }

  /** q_hits — HITS hubs & authorities over the directed trade graph
    * (r13): two EXACT unnormalized iterations — a₁(v) = Σᵤ w(u,v),
    * h₁(u) = Σᵥ w(u,v)·a₁(v), a₂(v) = Σᵤ w(u,v)·h₁(u) — then each
    * score divided ONCE by its max. HITS separates "buys from the
    * best suppliers" (hub) from "supplies the biggest buyers"
    * (authority) — directions PageRank's single flow conflates; the
    * fixed-depth form trades the eigenvector limit for exact integer
    * arithmetic (the q_pagerank fixed-iteration stance, taken
    * further: no doubles until the terminal division).
    *
    * Determinism: every score is an exact integer (decimal(38,0)
    * sums — the q_zscore_scale overflow-closed idiom; DuckDB HUGEINT
    * mirrors); hub/auth are ONE division of two exact ints, r4'd.
    *
    * Scale shape: reads the published edge store; two broadcast-join
    * + aggregate rounds over the |nodes|²-bounded edge frame; node
    * list broadcast for the left join. */
  def hits(s: SparkSession, d: String): DataFrame = {
    val edges = tradeEdges(s, d)
    val wd = col("w").cast("decimal(18,0)")
    val a1 = edges.groupBy(col("dst").as("v")).agg(sum(wd).as("a1"))
    val h1 = edges.join(broadcast(a1), col("dst") === col("v"))
      .groupBy(col("src").as("u")).agg(sum(wd * col("a1")).as("h1"))
    val a2 = edges.join(broadcast(h1), col("src") === col("u"))
      .groupBy(col("dst").as("v2")).agg(sum(wd * col("h1")).as("a2"))
    val mx = h1.agg(max(col("h1")).as("mh"))
      .crossJoin(a2.agg(max(col("a2")).as("ma")))
    ord(
      Tables.nation(s, d)
        .join(broadcast(h1), col("n_nationkey") === col("u"), "left")
        .join(broadcast(a2), col("n_nationkey") === col("v2"), "left")
        .crossJoin(broadcast(mx))
        .select(col("n_nationkey").as("nationkey"), col("n_name").as("nation"),
          r4(coalesce(col("h1"), lit(0)).cast("double") /
             col("mh").cast("double")).as("hub_score"),
          r4(coalesce(col("a2"), lit(0)).cast("double") /
             col("ma").cast("double")).as("auth_score")),
      col("nationkey"))
  }

  /** q_graph_reciprocity — tie reciprocity over the STRONG trade
    * graph: per nation, strong out-edges, how many are returned
    * (dst→src also strong), and the reciprocity rate — the
    * relationship-symmetry readout (a high-volume one-way lane is a
    * dependency; a reciprocated one is a partnership) that
    * components/2-hop don't expose because they symmetrize away
    * direction.
    *
    * Determinism: counts exact; rate is one int division r4'd; nations
    * with no strong out-edge report 0/0 → rate NULL via nullif.
    *
    * Scale shape: the strong set is |nodes|²-bounded and derived from
    * the store; the reciprocation test is a self-semi-join on the
    * reversed key; node list broadcast. */
  def reciprocity(s: SparkSession, d: String): DataFrame = {
    val strong = strongEdges(s, d)
    // rename the reversed side's keys so the self-semi-join is
    // unambiguous (both frames share strongEdges' lineage)
    val rev = strong.select(col("dst").as("rsrc"), col("src").as("rdst"))
    val recip = strong.join(rev,
        col("src") === col("rsrc") && col("dst") === col("rdst"), "left_semi")
      .groupBy(col("src").as("ru")).agg(count(lit(1)).as("n_reciprocated"))
    val out = strong.groupBy(col("src").as("ou")).agg(count(lit(1)).as("n_out"))
    ord(
      Tables.nation(s, d)
        .join(broadcast(out), col("n_nationkey") === col("ou"), "left")
        .join(broadcast(recip), col("n_nationkey") === col("ru"), "left")
        .select(col("n_nationkey").as("nationkey"), col("n_name").as("nation"),
                coalesce(col("n_out"), lit(0L)).as("n_out"),
                coalesce(col("n_reciprocated"), lit(0L)).as("n_reciprocated"),
                r4(coalesce(col("n_reciprocated"), lit(0L)).cast("double") /
                   nullif(coalesce(col("n_out"), lit(0L)).cast("double"),
                          lit(0.0))).as("reciprocity")),
      col("nationkey"))
  }

  /** q_assortativity — degree assortativity of the UNDIRECTED strong
    * trade graph: Pearson r between the degrees at the two ends of
    * every edge (each undirected edge contributes both orientations —
    * the standard symmetrization), over the strong-tie set. r > 0 =
    * hubs trade with hubs (rich club); r < 0 = hub-and-spoke. The
    * one-number topology summary that degree listings don't give.
    *
    * Determinism: degrees and all five sufficient sums are exact
    * int64 (≤ 2|E|·deg², tiny — decimal at 100 TB would follow the
    * q_hits idiom); r = (nΣxy−ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))
    * is the identically-spelled OLS chain with nullif on zero
    * variance; by symmetry Σx=Σy but both are spelled independently
    * so the chain is the generic one.
    *
    * Scale shape: degrees from one aggregate of the strong set;
    * degree lookup broadcast onto the edge list; ONE 1-row rollup. */
  def assortativity(s: SparkSession, d: String): DataFrame = {
    val strong = strongEdges(s, d)
    val und = strong.select(least(col("src"), col("dst")).as("a"),
                            greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val ends = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    val deg = ends.groupBy(col("u")).agg(count(lit(1)).as("du"))
    val pairs = ends
      .join(broadcast(deg), "u")
      .join(broadcast(deg.select(col("u").as("v"), col("du").as("dv"))), "v")
      .select(col("du").as("x"), col("dv").as("y"))
    ord(
      pairs.agg(count(lit(1)).as("n_ends"),
                sum(col("x")).as("sx"), sum(col("y")).as("sy"),
                sum(col("x") * col("x")).as("sxx"),
                sum(col("y") * col("y")).as("syy"),
                sum(col("x") * col("y")).as("sxy"))
        .select(col("n_ends"),
          r4((col("n_ends") * col("sxy") - col("sx") * col("sy"))
               .cast("double") /
             nullif(sqrt((col("n_ends") * col("sxx") - col("sx") * col("sx"))
                           .cast("double")) *
                    sqrt((col("n_ends") * col("syy") - col("sy") * col("sy"))
                           .cast("double")), lit(0.0))).as("assortativity")),
      col("n_ends"))
  }

  /** q_local_clustering — per-node clustering coefficient of the
    * UNDIRECTED strong trade graph: C(v) = 2·T(v)/(deg(v)·(deg(v)−1)),
    * where T(v) counts CONNECTED pairs among v's neighbors — the
    * node-level "are my partners each other's partners" readout
    * (q_triangles counts closures globally; q_assortativity scores
    * degree mixing in one number; this localizes closure to each
    * nation, separating clique members from bridge nodes at the same
    * degree).
    *
    * Determinism: degrees and triangle counts are exact int64; C is
    * ONE division r4'd; deg < 2 → NULL via nullif; every nation
    * surfaces via the node-spine left join (§2.10 spine rule).
    *
    * Scale shape: the strong set is |nodes|²-bounded and derived from
    * the store (persisted — read three times: ends, pair
    * generation, closure probe); neighbor pairs are a self-join on
    * the shared endpoint and the closure test is one semi-join on the
    * canonical (min, max) key — all |E|·avg-degree bounded, never
    * fact-bounded. At 100 TB only tradeEdges grows. */
  def localClustering(s: SparkSession, d: String): DataFrame = {
    val und = strongEdges(s, d)
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .distinct().shared
    val ends = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    val deg = ends.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val nbrPairs = ends.as("e1")
      .join(ends.as("e2"),
            col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("n0"), col("e1.v").as("x"), col("e2.v").as("y"))
    val tri = nbrPairs
      .join(und, nbrPairs("x") === und("a") && nbrPairs("y") === und("b"),
            "left_semi")
      .groupBy(col("n0")).agg(count(lit(1)).as("t"))
    ord(
      Tables.nation(s, d)
        .join(broadcast(deg), col("n_nationkey") === col("u"), "left")
        .join(broadcast(tri), col("n_nationkey") === col("n0"), "left")
        .select(col("n_nationkey").as("nationkey"), col("n_name").as("nation"),
          coalesce(col("deg"), lit(0L)).as("degree"),
          coalesce(col("t"), lit(0L)).as("n_closed_pairs"),
          r4(lit(2.0) * coalesce(col("t"), lit(0L)).cast("double") /
             nullif((coalesce(col("deg"), lit(0L)) *
                     (coalesce(col("deg"), lit(0L)) - lit(1L))).cast("double"),
                    lit(0.0))).as("lcc")),
      col("nationkey"))
  }

  /** q_adamic_adar — Adamic–Adar link prediction over the undirected
    * strong trade graph: for every NON-adjacent pair with at least one
    * common neighbor, AA(a,b) = Σ_{z∈N(a)∩N(b)} 1/ln(deg z) — the
    * "which tie forms next" ranking (q_graph_2hop counts reachable
    * paths by weight; AA discounts common neighbors by how
    * promiscuous they are, the standard link-prediction baseline).
    *
    * Determinism: common-neighbor and degree counts are exact int64;
    * every common neighbor has deg ≥ 2 by construction (it touches
    * both endpoints), so ln(deg) > 0 always; the 1/ln terms fold in
    * NEIGHBOR-ID order (the q_anova ordered-fold rule — never an
    * unordered double sum), r4'd once.
    *
    * Scale shape: the strong set is |nodes|²-bounded
    * (persisted — read by ends, the pair join, and the
    * adjacency anti-join); the common-neighbor join keys on the
    * shared z; degree lookup broadcasts. */
  def adamicAdar(s: SparkSession, d: String): DataFrame = {
    val und = strongEdges(s, d)
      .select(least(col("src"), col("dst")).as("ua"),
              greatest(col("src"), col("dst")).as("ub"))
      .distinct().shared
    val ends = und.select(col("ua").as("u"), col("ub").as("v"))
      .unionAll(und.select(col("ub").as("u"), col("ua").as("v")))
    val deg = ends.groupBy(col("u")).agg(count(lit(1)).as("dg"))
    val pairs = ends.as("e1")
      .join(ends.as("e2"),
            col("e1.v") === col("e2.v") && col("e1.u") < col("e2.u"))
      .select(col("e1.u").as("a"), col("e2.u").as("b"), col("e1.v").as("z"))
    val nonadj = pairs
      .join(und, pairs("a") === und("ua") && pairs("b") === und("ub"),
            "left_anti")
    ord(
      nonadj
        .join(broadcast(deg.select(col("u").as("z"), col("dg"))), "z")
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_common"),
             r4(expr("aggregate(sort_array(collect_list(named_struct(" +
               "'z', z, 't', 1.0D / ln(cast(dg as double))))), " +
               "0.0D, (acc, x) -> acc + x.t)")).as("aa_score")),
      col("a"), col("b"))
  }

  /** q_graph_bfs — BFS hop distance over the DIRECTED strong trade
    * graph from the strongest exporter (max total strong out-weight,
    * smallest key on ties): how many strong-tie hops does influence
    * need to travel — the reachability DEPTH readout
    * (q_graph_components says who is connected; this says how FAR).
    *
    * Determinism: source selection is max_by on the exact
    * (weight, −key) pair; distances are exact ints from a fixed
    * |nodes|-round relaxation fold (Bellman-Ford over unit weights —
    * any shortest path has < |nodes| hops, so the fold REACHES the
    * fixpoint, and min-relaxation is order-free); an edge-free corpus
    * yields a NULL source and all-NULL hops (the nation spine still
    * surfaces every row). DuckDB mirrors with a capped recursive-CTE
    * BFS + min(hops) — same fixpoint by construction.
    *
    * Scale shape: the |nodes|²-bounded strong set collapses to ONE
    * array row; the fold is driver-free expression work; the node
    * spine joins the 1-row frame broadcast. At 100 TB only tradeEdges
    * grows (a fact-scale graph would swap in the dedupCluster
    * iterate-with-checkpoint engine; the nation graph never needs
    * it). */
  def graphBfs(s: SparkSession, d: String): DataFrame = {
    val strong = strongEdges(s, d).shared
    val src = strong.groupBy(col("src")).agg(sum(col("w")).as("tw"))
      .agg(expr("max_by(src, named_struct('tw', tw, 'ns', -src))")
        .as("source"))
    val mk = Tables.nation(s, d).agg(max(col("n_nationkey")).as("mk"))
    val ed = strong
      .agg(sort_array(collect_list(struct(col("src"), col("dst")))).as("ed"))
    val folded = ed.crossJoin(broadcast(src)).crossJoin(broadcast(mk))
      .withColumn("dists", expr(
        """aggregate(sequence(1, mk + 1),
             transform(sequence(0, mk), i -> IF(i = source, 0, 9999)),
             (acc, r) -> transform(sequence(0, mk), i ->
               LEAST(element_at(acc, i + 1),
                     coalesce(array_min(transform(
                       filter(ed, e -> e.dst = i),
                       e2 -> element_at(acc, e2.src + 1) + 1)), 9999))))"""))
    ord(
      Tables.nation(s, d).crossJoin(broadcast(folded))
        .select(col("n_nationkey").as("nationkey"), col("n_name").as("nation"),
          when(expr("element_at(dists, n_nationkey + 1)") < 9999,
               expr("element_at(dists, n_nationkey + 1)")).as("hops"),
          coalesce(col("n_nationkey") === col("source"), lit(false))
            .as("is_source")),
      col("nationkey"))
  }

  /** q_k_core — 2-core decomposition of the undirected strong trade
    * graph by iterated peeling: nodes with fewer than 2 alive strong
    * ties are removed, rounds repeat to the fixpoint, and each node
    * reports its PEEL LAYER (the round it fell) or 2-core membership —
    * the periphery-to-core onion that separates structural members
    * from hangers-on (q_graph_components groups; this grades depth).
    *
    * Determinism: peeling is SIMULTANEOUS per round (all degree tests
    * read the previous round's state), so the layer assignment is
    * unique regardless of evaluation order; all state is exact int;
    * the fixed |nodes|+1 rounds provably reach the fixpoint (each
    * non-final round removes ≥ 1 node). An edge-free graph peels
    * everything at layer 1 on both engines (empty edge array spelled
    * identically).
    *
    * Scale shape: the q_graph_bfs 1-row fold shape — |nodes|²-bounded
    * edge array, O(|nodes|) state, node-spine broadcast join. */
  def kCore(s: SparkSession, d: String): DataFrame = {
    val und = strongEdges(s, d)
      .select(least(col("src"), col("dst")).as("ua"),
              greatest(col("src"), col("dst")).as("ub"))
      .distinct()
    val ends = und.select(col("ua").as("u"), col("ub").as("v"))
      .unionAll(und.select(col("ub").as("u"), col("ua").as("v")))
    val mk = Tables.nation(s, d).agg(max(col("n_nationkey")).as("mk"))
    val ea = ends
      .agg(sort_array(collect_list(struct(col("u"), col("v")))).as("el"))
    val folded = ea.crossJoin(broadcast(mk))
      .withColumn("ra", expr(
        """aggregate(sequence(1, mk + 2),
             transform(sequence(0, mk), i -> 0),
             (acc, t) -> transform(sequence(0, mk), i ->
               IF(element_at(acc, i + 1) != 0, element_at(acc, i + 1),
                  IF(size(filter(el, x -> x.u = i AND
                                 element_at(acc, x.v + 1) = 0)) < 2,
                     t, 0))))"""))
    ord(
      Tables.nation(s, d).crossJoin(broadcast(folded))
        .select(col("n_nationkey").as("nationkey"), col("n_name").as("nation"),
          (expr("element_at(ra, n_nationkey + 1)") === 0).as("in_2core"),
          when(expr("element_at(ra, n_nationkey + 1)") > 0,
               expr("element_at(ra, n_nationkey + 1)")).as("peel_layer")),
      col("nationkey"))
  }

  /** q_modularity — Newman modularity of the REGION partition over the
    * undirected strong trade graph: per region c, internal-edge count
    * e_c, degree mass d_c, and the contribution e_c/m − (d_c/2m)²;
    * Σ contributions = Q, the "are regions real trade communities"
    * score (Q > 0 = denser inside regions than a degree-preserving
    * random graph; Q ≤ 0 = the region lines don't match the trade
    * blocs). Complements q_graph_components (which FINDS communities)
    * by SCORING a given partition — the eval half of community
    * structure.
    *
    * Determinism: e_c, d_c, m are exact int64 counts; each
    * contribution is ONE identically-spelled double chain
    * (e/m − (d/2m)²) r4'd, nullif on m = 0; every region appears
    * (left join from the region dim), edge-less regions report 0/0.
    *
    * Scale shape: the undirected strong set is |nodes|²-bounded and
    * derived from the published edge store; the nation → region map
    * broadcasts onto its two endpoint joins; ONE ≤|regions|-row
    * rollup; the 1-row m frame broadcasts. At 100 TB only the
    * ingest-time edge derivation grows. */
  def modularity(s: SparkSession, d: String): DataFrame = {
    val und = strongEdges(s, d)
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val n2r = Tables.nation(s, d)
      .select(col("n_nationkey").as("nk"), col("n_regionkey").as("rk"))
    val tagged = und
      .join(broadcast(n2r.select(col("nk").as("a"), col("rk").as("ra"))), "a")
      .join(broadcast(n2r.select(col("nk").as("b"), col("rk").as("rb"))), "b")
    val internal = tagged.filter(col("ra") === col("rb"))
      .groupBy(col("ra").as("rk0")).agg(count(lit(1)).as("e_c"))
    val degrees = tagged.select(col("ra").as("rk1"))
      .unionAll(tagged.select(col("rb").as("rk1")))
      .groupBy(col("rk1")).agg(count(lit(1)).as("d_c"))
    val m = und.agg(count(lit(1)).as("m"))
    val nations = n2r.groupBy(col("rk")).agg(count(lit(1)).as("n_nations"))
    ord(
      Tables.region(s, d)
        .join(broadcast(nations), col("r_regionkey") === col("rk"), "left")
        .join(broadcast(internal), col("r_regionkey") === col("rk0"), "left")
        .join(broadcast(degrees), col("r_regionkey") === col("rk1"), "left")
        .crossJoin(broadcast(m))
        .select(col("r_regionkey").as("regionkey"), col("r_name").as("region"),
          coalesce(col("n_nations"), lit(0L)).as("n_nations"),
          coalesce(col("e_c"), lit(0L)).as("internal_edges"),
          coalesce(col("d_c"), lit(0L)).as("degree_sum"),
          r4(coalesce(col("e_c"), lit(0L)).cast("double") /
               nullif(col("m").cast("double"), lit(0.0)) -
             (coalesce(col("d_c"), lit(0L)).cast("double") /
                nullif(lit(2.0) * col("m").cast("double"), lit(0.0))) *
             (coalesce(col("d_c"), lit(0L)).cast("double") /
                nullif(lit(2.0) * col("m").cast("double"), lit(0.0))))
            .as("contribution")),
      col("regionkey"))
  }
}
