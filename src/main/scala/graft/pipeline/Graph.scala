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
  * Scale shape: one symmetrized edge list (checkpointed once), degree and
  * rank frames partitioned by node id; each iteration is one hash-join +
  * partial-aggregable groupBy shuffle on node id — the canonical
  * Pregel-style plan. Lineage is truncated per iteration (see
  * Dedup.connectedComponents for the rationale); only the node COUNT — a
  * model scalar — ever reaches the driver.
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
      iters: Int = 5, ckptEvery: Int = 4): DataFrame = {
    require(ckptEvery > 0, s"ckptEvery must be positive, got $ckptEvery")
    val edges = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .union(pairs
        .select(col(bCol).cast("long").as("a"), col(aCol).cast("long").as("b")))
      .localCheckpoint()
    val deg = edges.groupBy("a").agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = deg.count() // model scalar: node count
    require(n > 0, "pageRank on an empty graph")
    val base = (3L * Scale) / (20L * n) // (1-d) * Scale / n, d = 17/20
    var rank = deg.select(col("a").as("node"), lit(Scale / n).as("r"))
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
        .select(col("node"),
          (lit(base) + expr("(17 * coalesce(s, CAST(0 AS BIGINT))) DIV 20"))
            .as("r"))
      if (i % ckptEvery == 0 && i < iters) rank = rank.localCheckpoint()
    }
    rank.join(deg.withColumnRenamed("a", "node"), "node")
      .select(col("node").as("doc_id"), col("deg"), col("r").as("rank_p12"))
  }
}
