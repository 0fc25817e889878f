package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the corpus similarity graph — the link-analysis
  * pass a training-data pipeline runs to weight documents by "authority"
  * inside their near-duplicate neighborhood (e.g. picking the canonical
  * representative of a template family by centrality instead of min-id).
  *
  * PageRank here is FIXED-POINT integer arithmetic end to end: ranks are
  * BIGINT units of 1e-12, per-edge contributions are integer divisions
  * (r DIV deg), and the damping factor is the rational 17/20 — so every
  * engine computes bit-identical ranks regardless of summation order, and
  * the DuckDB oracle replays the exact values (floating-point power
  * iteration could never hash-match across engines). The truncation bias
  * (mass lost to integer floor) is bounded by iters * (deg sum) * 1e-12 —
  * irrelevant at ranking granularity.
  *
  * Scale shape: one symmetrized edge list and one degree frame, each
  * shuffled ONCE per executed plan (ReuseExchange — every iteration
  * consumes the same hashpartitioning(node) exchange); each iteration is
  * one hash-join + partial-aggregable groupBy shuffle on node id — the
  * canonical Pregel-style plan. Long runs get periodic lineage truncation
  * (`ckptEvery`, see Dedup.connectedComponents for the rationale); only
  * the node COUNT — a model scalar — ever reaches the driver.
  */
object Graph {

  /** Rank unit: 1e12 fixed-point. Bounds: total mass ~= Scale, so
    * 17 * anyPartialSum stays far below 2^63. */
  val Scale: Long = 1000000000000L

  /** Undirected PageRank over a pair list, damping 17/20, `iters` fixed
    * power iterations. Returns (doc_id, deg, rank_p12) for every node that
    * appears in at least one pair (isolated documents have no edges and
    * keep the uniform prior by definition — they are excluded, as in the
    * oracle).
    *
    * `ckptEvery` bounds lineage depth: the rank frame is localCheckpointed
    * every that-many iterations rather than every iteration — each
    * checkpoint is an eager job barrier, and a handful of stacked
    * join+agg layers optimize and run as ONE job far faster than they
    * run as serialized materializations. Long runs (iters >> 8) still get
    * periodic truncation so the plan never grows unbounded. Checkpoint
    * placement cannot change the integer arithmetic, so results are
    * identical for any cadence. */
  def pageRank(
      pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
      iters: Int = 5, ckptEvery: Int = 8): DataFrame = {
    require(ckptEvery > 0, s"ckptEvery must be positive, got $ckptEvery")
    // NOT checkpointed: every iteration scans `edges` and `deg` through the
    // SAME hashpartitioning("a") exchange, and ReuseExchange shuffles each
    // exactly once per executed plan — the eager localCheckpoints this used
    // to do serialized three extra driver-blocking jobs (edges, deg, a mid-
    // iteration rank barrier) to materialize state the execution already
    // shares. Construction runs no jobs at all — even the node count stays
    // in-plan as a broadcast scalar.
    val edges = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .union(pairs
        .select(col(bCol).cast("long").as("a"), col(aCol).cast("long").as("b")))
    val deg = edges.groupBy("a").agg(count(lit(1)).as("deg"))
    // the node count n is a 1-row frame broadcast-crossed into each
    // iteration, NOT a driver-side collect: DIV arithmetic on `__n` is the
    // same integer math as a literal, and keeping it in-plan makes the
    // whole fixed-point run a single job (an empty graph yields an empty
    // result — zero rows never evaluate the division)
    val nDf = edges.agg(countDistinct(col("a")).as("__n"))
    var rank = deg.crossJoin(broadcast(nDf))
      .select(col("a").as("node"),
        expr(s"CAST($Scale AS BIGINT) DIV __n").as("r"))
    for (i <- 1 to iters) {
      val contrib = edges
        .join(rank.withColumnRenamed("node", "a"), "a")
        .join(deg, "a")
        .select(col("b").as("node"), expr("r DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      // left join + coalesce: in a symmetrized graph every node receives
      // contributions, but the shape must not silently drop nodes if a
      // caller feeds a directed list
      rank = deg.select(col("a").as("node"))
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nDf))
        .select(col("node"),
          (expr(s"(3 * CAST($Scale AS BIGINT)) DIV (20 * __n)") +
            expr("(17 * coalesce(s, CAST(0 AS BIGINT))) DIV 20"))
            .as("r"))
      if (i % ckptEvery == 0 && i < iters) rank = rank.localCheckpoint()
    }
    rank.join(deg.withColumnRenamed("a", "node"), "node")
      .select(col("node").as("doc_id"), col("deg"), col("r").as("rank_p12"))
  }

  /** Synchronous label propagation over a pair list — community detection
    * on the near-dup similarity graph (Raghavan et al. 2007, made fully
    * deterministic): every node starts labeled with its own id, and each
    * of `iters` synchronous rounds relabels every node with the most
    * frequent label among its neighbors AND itself (a self-loop carries
    * the node's current label into the vote), ties broken toward the
    * SMALLEST label. Communities differ from [[Dedup.connectedComponents]]
    * reachability: a node bridging two dense families joins the family
    * that dominates its neighborhood rather than gluing both into one
    * cluster — the structure a template-family report wants.
    *
    * Determinism: the vote is pure integer counting with a total-order
    * tie-break, so any engine replays it exactly — the DuckDB oracle
    * unrolls the same rounds as chained CTEs and hash-matches.
    *
    * Scale shape: per round, ONE hash join (neighbor labels, keyed on
    * node id) + two partial-aggregable groupBys — the (node, label) vote
    * count, then an argmax-by-struct per node (`max(struct(n, -label))`
    * picks highest count then smallest label WITHOUT the sort a
    * row_number window would pay) — all shuffles on the node key,
    * nothing quadratic, nothing driver-side. Labels are one row per node
    * per round; `ckptEvery` bounds lineage like [[pageRank]] (placement
    * cannot change the integer votes). */
  def labelPropagation(
      pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
      iters: Int = 4, ckptEvery: Int = 8): DataFrame = {
    require(ckptEvery > 0, s"ckptEvery must be positive, got $ckptEvery")
    val sym = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .union(pairs
        .select(col(bCol).cast("long").as("a"), col(aCol).cast("long").as("b")))
    val nodes = sym.select(col("a")).distinct()
    // self-loops: the node's own current label gets one vote per round
    val edges = sym.union(nodes.select(col("a"), col("a").as("b")))
    var lab = nodes.select(col("a").as("node"), col("a").as("label"))
    for (i <- 1 to iters) {
      // argmax by struct: lexicographic max = highest vote count, then
      // smallest label (labels are nonnegative ids, so -label orders
      // reversed) — same winner as ORDER BY n DESC, label ASC
      lab = edges
        .join(lab.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("a"))
        .agg(max(struct(col("n"), (-col("label")).as("nl"))).as("w"))
        .select(col("a").as("node"), (-col("w.nl")).as("label"))
      if (i % ckptEvery == 0 && i < iters) lab = lab.localCheckpoint()
    }
    lab.select(col("node").as("doc_id"), col("label").as("community"))
  }

  /** Per-node triangle counts + local clustering coefficient over a pair
    * list — the graph-density signal that separates genuine template
    * families (dense, near-clique neighborhoods) from chains of
    * borderline matches (sparse bridges) in the near-dup graph.
    *
    * Triangles enumerate as ordered triples a < b < c over the directed
    * (lower→higher) edge list: E(a,b) ⋈ E(b,c) ⋈ E(a,c) — each triangle
    * found exactly once, via two hash joins on edge endpoints (the
    * standard distributed algorithm; at extreme skew the classic
    * refinement orients edges by degree instead of id, same plan shape).
    * Each triple then votes +1 to its three corners in one explode +
    * groupBy. The clustering coefficient is the per-mille integer
    * `2000·T DIV (deg·(deg-1))` (0 for degree-1 nodes) — exact integer
    * arithmetic, so any engine reproduces it bit-for-bit.
    *
    * Returns (doc_id, deg, triangles, clustering_pm) for every node in
    * the pair list. Scale: nothing quadratic in the corpus — work is
    * bounded by the near-dup EDGE list (≪ corpus) and its wedge count;
    * all joins/aggs are hash-partitioned on node/edge keys. */
  def triangleStats(
      pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    // directed lower->higher ids; dedup defensively so a repeated input
    // pair cannot double-count wedges
    val e = pairs.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .where(col("a") < col("b")).distinct()
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("ta"), col("e1.b").as("tb"), col("e2.b").as("tc"))
    val perNode = tri
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node").as("doc_id"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") >= 2,
          expr("2000 * coalesce(triangles, CAST(0 AS BIGINT)) DIV (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("clustering_pm"))
  }
}
