package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic streaming sketches — approximate aggregates whose values
  * are pure functions of md5, so any engine (here: the DuckDB oracle)
  * reproduces them bit-for-bit. This is the property the engine-native
  * sketches (HLL++, t-digest, CountMinSketch with murmur seeds) lack: their
  * serialized layouts are implementation details, so results can only ever
  * be bounds-checked, never hash-gated. Reference behavior: the relay's
  * approximate-aggregate surface (SURVEY.md §2.2); algorithms are the
  * published ones (KMV: Bar-Yossef et al., RANDOM'02; CMS:
  * Cormode-Muthukrishnan, J.Alg'05).
  *
  * Scale shapes (100 TB):
  *  - KMV: per-group state is the k smallest 48-bit hashes — merge of two
  *    partial states is min-k of their union, so the whole sketch is one
  *    partial-aggregable pass. The k-smallest selection runs on the
  *    TopKPerGroup bounded-heap physical plan: O(n log k) per partition,
  *    partial+final phases, no full sort of the hash stream.
  *  - CMS: the counter table is ONE groupBy over the token stream with
  *    map-side partial counts; total state is depth*width cells regardless
  *    of corpus size. Probing joins a broadcast-sized candidate frame
  *    against the counters.
  */
object Sketches {

  /** 48-bit md5-derived hash of a column rendered as a string — the shared
    * hash family of the oracled sketch queries (ap1/ap2). 48 bits keeps
    * every product/scale below 2^63 for both engines' BIGINT arithmetic.
    *
    * Contract (narrower than the md5_48(cast(c as string)) SQL spelling it
    * replaced): the column must be string/integral (cast('string') first
    * otherwise — analysis fails loudly on date/decimal/double), and is
    * assumed NON-NULL. md5_key48 skips null children (concat_ws
    * semantics, hashing like the empty key) where the old spelling
    * propagated NULL and dropped the row; the oracled columns (TPC-H keys,
    * document tokens) are all non-null, so both engines see the same
    * stream. A nullable key column needs an explicit
    * `when(c.isNull, ...)` guard or a coalesce chosen by the caller. */
  // fused allocation-free spelling of md5_48(cast(c as string)) — the
  // cast's per-row UTF8String allocation made the sketch scans scale
  // negatively with local task width (see Md5Key48's doc)
  private def hash48(c: Column): Column =
    graft.functions.HashFunctions.md5_key48(c)

  private val HashSpace: Long = 1L << 48

  /** KMV distinct-count estimate per group: estimate = (k-1) * 2^48 / h_(k)
    * where h_(k) is the k-th smallest distinct hash; exact when the group
    * has fewer than k distinct values. Returns
    * (groupCol, exact_parts, kmv_parts) — exact alongside approximate, as
    * the ap1 query surfaces it (the exact count is a byproduct of the
    * distinct pass at test scale; at 100 TB one would drop it and keep only
    * the k-row-per-group sketch state).
    *
    * Standard error is ~1/sqrt(k-2) (≈12.7% at the default k=64). */
  def kmvDistinct(
      df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2 && k < 32768, s"k=$k out of range (2, 32768)")
    val hashed = df
      .select(col(groupCol).as("g"), hash48(col(valueCol)).as("hv"))
      .distinct()
    // ONE pass over the distinct hashes: the bounded-heap plan keeps the k
    // smallest per group AND counts the group's total rows (= the exact
    // distinct count, since the input is the distinct relation). h_(k) is
    // the max of the k survivors. The previous two-branch spelling scanned
    // and distinct-aggregated the corpus twice to get the exact count.
    val kmin = graft.plans.TopKPerGroup(
      hashed, keys = Seq("g"), orderBy = Seq(("hv", true)), k = k,
      countCol = Some("__nd"))
    val scale = (k - 1).toLong * HashSpace
    kmin.groupBy("g")
      .agg(max(col("hv")).as("hk"), max(col("__nd")).as("exact_parts"))
      .select(
        col("g").as(groupCol),
        col("exact_parts"),
        when(col("exact_parts") >= k,
          expr(s"$scale DIV greatest(hk, 1)"))
          .otherwise(col("exact_parts")).as("kmv_parts"))
  }

  /** Deterministic Bernoulli sample: keeps a row iff the 48-bit hash of its
    * key is 0 mod `oneIn` — the same rows in any engine, any partitioning,
    * any run. The ap1 sampled-median path uses oneIn=10 over
    * (orderkey, linenumber). */
  def hashSample(df: DataFrame, keyCols: Seq[String], oneIn: Int): DataFrame =
    df.where(graft.functions.HashFunctions
      .md5_key48(keyCols.map(col): _*) % oneIn === 0)

  /** EXACT per-group lower median (the element at rank `(n+1) div 2` in
    * ascending order — a real data value, never an interpolation) by
    * bucketed selection in two bounded passes:
    *
    *  1. histogram pass — one map-side-combined groupBy over
    *     `(group, floor(value/bucketWidth))` counts each bucket; the
    *     shuffled state is COUNTS ONLY (groups × occupied buckets rows,
    *     kilobytes — never row values);
    *  2. locate — cumulative counts over that histogram find the single
    *     bucket holding the target rank and the rank offset within it;
    *  3. pick pass — re-scan the input pruned by a BROADCAST join
    *     against the one target bucket per group (everything outside it
    *     drops at the scan stage), then `row_number` within the group
    *     reads off the `__r_in`-th value. The window input is one
    *     bucket's occupancy per group — the declared memory envelope,
    *     sized by `bucketWidth` — not the group.
    *
    * A per-group window sort (`row_number` over the whole group) degrades
    * to one task per group doing an O(n log n) sort of everything — the
    * plan that stops scaling first in a grouped-median query; Spark's
    * exact `percentile` buffers a value→count map per group in executor
    * memory, the other non-starter at corpus scale. An earlier spelling
    * here aggregated each bucket's sorted VALUE ARRAY in pass 1 to avoid
    * the second scan — one scan, but every row traveled the shuffle
    * inside a collect_list cell (an unbounded-array memory hazard and
    * the measured residual cost); two cheap codegen'd scans beat one
    * scan that materializes the stream. Value ties are immaterial: any
    * row at the target rank carries the same value. */
  def groupedLowerMedian(
      df: DataFrame, groupCol: String, valueCol: String,
      bucketWidth: Double = 1024.0): DataFrame = {
    val b = withBucket(df, groupCol, valueCol, bucketWidth)
    b.join(broadcast(targetBuckets(b, groupCol)), Seq(groupCol, "__bkt"))
      .withColumn("__rn", rankInGroup(groupCol, valueCol))
      .where(col("__rn") === col("__r_in"))
      .select(col(groupCol), col(valueCol).as("p50"))
  }

  /** [[groupedLowerMedian]] for an EXPENSIVELY-FILTERED input over FEW
    * groups (≤ dozens — ap1's 3 return flags): `base.where(rowFilter)` is
    * the logical input, but the filter (ap1's per-row md5 sample
    * predicate) is costly, so the pick pass must not re-pay it on every
    * scanned row. The histogram pass pays it once; its |groups| target
    * rows are then COLLECTED (bounded model state, the centroid/BPE
    * pattern) and compiled into literal predicates, so the pick pass is
    * `WHERE <bucket equalities> AND rowFilter` — conjunct order reaches
    * the scan intact, the cheap floor-div equality short-circuits the
    * expensive filter on the ~1/occupied-buckets out-of-bucket majority,
    * and no join machinery materializes probe-hit rows.
    *
    * A/B'd against a join-residual form (md5 inside the broadcast join's
    * CASE WHEN condition, one action, no collect): the join LOST by
    * ~0.35 s at sf1 interleaved — every full-table row in the target
    * bucket becomes a probe hit paying row construction before the
    * residual filter, outweighing the saved hash work. The collect costs
    * one extra job but its pass-2 plan is a bare codegen'd filter.
    * MedianFilterOrderSpec pins the shape. */
  def groupedLowerMedianFiltered(
      base: DataFrame, rowFilter: Column, groupCol: String, valueCol: String,
      bucketWidth: Double = 1024.0): DataFrame = {
    // the filter is evaluated TWICE (histogram pass + pick pass) — a
    // non-deterministic predicate (rand()-based sampling) would draw two
    // different samples and silently return a wrong or missing median.
    // Deterministic hash sampling (md5 on a key, ap1's form) is the
    // supported spelling.
    require(org.apache.spark.sql.graft.ColumnBridge
        .expression(rowFilter).deterministic,
      "groupedLowerMedianFiltered evaluates rowFilter in two passes; " +
        "it must be deterministic (use hash-based sampling, not rand())")
    val b = withBucket(base.where(rowFilter), groupCol, valueCol, bucketWidth)
    val targets = targetBuckets(b, groupCol).collect()
    if (targets.isEmpty)
      return base.limit(0).select(col(groupCol), col(valueCol).as("p50"))
    val inTarget = targets.map { r =>
      col(groupCol) === lit(r.get(0)) &&
        floor(col(valueCol) / bucketWidth).cast("long") === lit(r.getLong(1))
    }.reduce(_ || _)
    val rankWanted = targets.foldLeft(lit(null).cast("long")) { (acc, r) =>
      when(col(groupCol) === lit(r.get(0)), lit(r.getLong(2))).otherwise(acc)
    }
    base.where(inTarget && rowFilter) // bucket equalities FIRST: short-circuit
      .withColumn("__rn", rankInGroup(groupCol, valueCol))
      .where(col("__rn") === rankWanted)
      .select(col(groupCol), col(valueCol).as("p50"))
  }

  private def withBucket(
      df: DataFrame, groupCol: String, valueCol: String,
      bucketWidth: Double): DataFrame =
    df.select(col(groupCol), col(valueCol),
      floor(col(valueCol) / bucketWidth).cast("long").as("__bkt"))

  /** Histogram pass shared by both median forms: the single bucket per
    * group holding the target rank, plus the rank offset within it. */
  private def targetBuckets(b: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("__bkt"))
    val wAll = Window.partitionBy(col(groupCol))
    b.groupBy(col(groupCol), col("__bkt")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .where(expr("cum - c < (n + 1) DIV 2 AND cum >= (n + 1) DIV 2"))
      .select(col(groupCol), col("__bkt"),
        expr("(n + 1) DIV 2 - (cum - c)").as("__r_in"))
  }

  private def rankInGroup(groupCol: String, valueCol: String): Column = {
    import org.apache.spark.sql.expressions.Window
    row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(col(valueCol)))
  }

  /** Grouped histogram QUANTILES (p50/p90/p99-style) from fixed-width
    * bins — the monitoring-dashboard percentile the engine-native
    * approx_percentile/t-digest would serve, rebuilt deterministic:
    * bin = floor(value · binsPerUnit) is exact IEEE arithmetic in any
    * engine, the per-(group, bin) count is ONE partial-aggregable
    * shuffle bounded by groups × occupied bins (not rows), and each
    * quantile resolves to the first bin whose cumulative count reaches
    * rank ceil(n·q/100) — all integer math over the bin frame, so the
    * result hash-gates like the other sketches. Reported value is the
    * BIN INDEX (caller divides by binsPerUnit for the edge): integers
    * end to end, no float quantile interpolation to disagree across
    * engines. Scale: no task holds more than its bin counts; the windows
    * run over the histogram, never the stream. */
  def histogramQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      binsPerUnit: Int = 10, qs: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      s"quantiles must be in [1,100], got $qs")
    val hist = df
      .select(col(groupCol),
        floor(col(valueCol) * binsPerUnit).cast("long").as("bin"))
      .groupBy(col(groupCol), col("bin")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
    val wAll = Window.partitionBy(col(groupCol))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    val qCols = qs.map(q =>
      min(when(expr(s"cum >= ($q * n + 99) DIV 100"), col("bin")))
        .as(s"p${q}_bin"))
    cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), qCols: _*)
  }

  /** CMS counter table for a token column: depth rows of md5-derived
    * hashes, width buckets each. Counters are additive (partial-aggregable,
    * order-independent); the returned frame is (j, bucket, cnt) with
    * depth*width rows at most. The corpus is read ONCE (per-token count
    * groupBy with map-side combine); the depth-way explode runs over the
    * vocab-sized count frame — sums commute, so the counters equal the
    * per-occurrence spelling's. */
  def cmsCounters(
      tokens: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame =
    countersFromCounts(
      tokens.groupBy(col(tokenCol).as("token")).agg(count(lit(1)).as("c")),
      depth, width)

  /** Counters from a pre-aggregated (token, c) frame. */
  private def countersFromCounts(
      cnts: DataFrame, depth: Int, width: Int): DataFrame =
    cnts
      .select(col("c"), explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("token"))
      .select(col("j"), cmsBucket(col("j"), col("token"), width).as("bucket"),
        col("c"))
      .groupBy("j", "bucket").agg(sum(col("c")).cast("long").as("cnt"))

  private def cmsBucket(j: Column, token: Column, width: Int): Column =
    graft.functions.HashFunctions.md5_key48(j, token) % width

  /** Point-estimate a set of candidate tokens against a CMS counter table:
    * estimate(t) = min over rows j of counter[j][bucket_j(t)]. The
    * candidate frame is broadcast (heavy-hitter candidates are by
    * definition few); missing (j,bucket) cells mean count 0 and cannot
    * occur for a token that appears in the sketched stream. */
  def cmsEstimate(
      counters: DataFrame, candidates: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val probe = candidates
      .withColumn("j", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", cmsBucket(col("j"), col(tokenCol), width))
    val passthrough = candidates.columns.map(col).toSeq
    broadcast(probe).join(counters, Seq("j", "bucket"))
      .groupBy(passthrough: _*)
      .agg(min(col("cnt")).as("cms_estimate"))
  }

  /** The ap2 query as a library call: top-N exact tokens scored against the
    * deterministic CMS — (token, exact_count, cms_estimate) in score order. */
  def cmsHeavyHitters(
      tokens: DataFrame, tokenCol: String, topN: Int = 20,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    // ONE corpus pass: the per-token count groupBy feeds both the exact
    // top-N side and the counter table
    val cnts = tokens.groupBy(col(tokenCol).as("token"))
      .agg(count(lit(1)).as("c"))
    val exact = cnts.select(col("token"), col("c").as("exact_count"))
      .orderBy(col("exact_count").desc, col("token")).limit(topN)
    cmsEstimate(countersFromCounts(cnts, depth, width), exact, "token",
        depth, width)
      .orderBy(col("exact_count").desc, col("token"))
  }
}
