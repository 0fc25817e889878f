package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / sharding operators for training-data exports.
  *
  * Both are pure projections over a content-derived md5 hash — no shuffle,
  * no RNG state, and the same rows are selected on any cluster size or
  * retry (the property a 100 TB pipeline needs for reproducible dataset
  * builds; `rand()`-based sampling changes under task re-execution).
  * Hashes are compared as hex STRINGS so any engine with md5 reproduces
  * the selection bit-for-bit (the DuckDB oracles do).
  */
object Sampling {

  /** Hash of `salt` + the row's id rendered as two lowercase hex chars —
    * a uniform draw from 256 buckets, usable as a threshold test. Shared
    * across the package (Similarity's sample-trained quantizer draws with
    * the same discipline) so the engine-portable md5 sampling never forks. */
  private[pipeline] def hexDraw(idCol: Column, salt: String): Column =
    substring(md5(concat(lit(s"$salt:"), idCol.cast("string"))), 1, 2)

  /** `n`/256 as the fixed-width hex threshold [[hexDraw]] compares
    * against; "g" (sorts after every hex digit) encodes keep-all. */
  private[pipeline] def hexByte(n: Int): String =
    if (n >= 256) "g" else f"${math.max(n, 0)}%02x"

  /** Keep each row with probability `rates(stratum)/256` (default
    * `defaultRate`), deterministically: the row's 2-hex-char draw is
    * compared against the stratum's threshold. Rates are per-256 so the
    * threshold is exact in hex-string space. */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultRate: Int = 0,
      salt: String = "sp1"): DataFrame = {
    // 256 = keep-all: every 2-hex-char draw must beat the threshold, but
    // f"100" would LOSE lexicographically to "11".."ff" — hexByte encodes
    // it as "g", which sorts after every hex digit
    val threshold = rates.foldLeft(lit(hexByte(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexByte(rate))).otherwise(acc)
    }
    df.where(hexDraw(col(idCol), salt) < threshold)
  }

  /** Source-weighted corpus mixing — the training-data "mixture weights"
    * step (oversample high-quality sources, downsample noisy ones; cf. the
    * published Pile/LLaMA data recipes). Weight `w` emits `floor(w)` full
    * copies of every row plus one more with probability `frac(w)`, decided
    * by the row's deterministic md5 draw — so the mixture is reproducible
    * on any cluster size or retry. Weights have 1/256 granularity (the
    * exact hex-threshold space). Each copy also gets `ord_hash`, a
    * deterministic shuffle key: exports ORDER BY (or range-partition on)
    * it for a stable, source-interleaved training order. Row-local
    * (a per-row copy-count explode) — zero shuffles until the caller's
    * ordering step. */
  def sourceMix(
      df: DataFrame, idCol: String, srcCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "sp4", copyCol: String = "copy",
      ordCol: String = "ord_hash"): DataFrame = {
    def parts(w: Double): (Int, Int) = {
      require(w >= 0 && w < 64, s"weight $w out of range [0, 64)")
      val whole = math.floor(w).toInt
      val frac = math.round((w - whole) * 256).toInt
      if (frac == 256) (whole + 1, 0) else (whole, frac)
    }
    def hexByte(n: Int): String = if (n >= 256) "g" else f"${math.max(n, 0)}%02x"
    val (defWhole, defFrac) = parts(defaultWeight)
    val whole = weights.foldLeft(lit(defWhole)) { case (acc, (s, w)) =>
      when(col(srcCol) === s, lit(parts(w)._1)).otherwise(acc)
    }
    val fracThr = weights.foldLeft(lit(hexByte(defFrac))) { case (acc, (s, w)) =>
      when(col(srcCol) === s, lit(hexByte(parts(w)._2))).otherwise(acc)
    }
    val n = whole + when(hexDraw(col(idCol), salt) < fracThr, 1).otherwise(0)
    df.withColumn("__n", n)
      // slice(seq, 1, 0) is empty, so n = 0 rows vanish; a bare
      // sequence(0, n - 1) would DESCEND for n = 0 (Spark's step defaults
      // to -1 when start > stop) and emit phantom copies
      .withColumn(copyCol,
        explode(expr("slice(sequence(0, greatest(__n, 1) - 1), 1, __n)")))
      .drop("__n")
      .withColumn(ordCol, md5(concat(lit(s"$salt:ord:"), col(idCol).cast("string"),
        lit(":"), col(copyCol).cast("string"))))
  }

  /** Deterministic train/val/test split (library form of sp5): the row's
    * md5-byte draw against cumulative thresholds out of 256 — a pure
    * projection, reproducible under retry, resize, or another engine.
    * Defaults to 80/10/10. */
  def withSplit(
      df: DataFrame, idCol: String,
      trainUpTo: Int = 204, valUpTo: Int = 230,
      salt: String = "sp5", splitCol: String = "split"): DataFrame = {
    require(0 <= trainUpTo && trainUpTo <= valUpTo && valUpTo <= 256,
      "thresholds must satisfy 0 <= train <= val <= 256")
    val h = conv(hexDraw(col(idCol), salt), 16, 10).cast("int")
    df.withColumn(splitCol,
      when(h < trainUpTo, "train").when(h < valUpTo, "val").otherwise("test"))
  }

  /** Cluster-aware (leakage-safe) train/val/test split: every document
    * splits by the hash of its near-dup GROUP key — its cluster id when
    * a dedup run put it in a near-dup cluster, its own id otherwise — so
    * near-duplicates can never straddle train and eval. This is the
    * split-level guarantee that keeps held-out metrics honest: a test
    * document whose near-duplicate sits in train is contamination that
    * post-hoc n-gram decontamination (dc1/dc2) may miss when the overlap
    * is paraphrase-level. `clusters` is the (doc_id, cluster_id) frame a
    * dedup run stores ([[Dedup.connectedComponents]] output); at scale
    * it is read back as stored state and hash-joined on doc id — one
    * join on top of [[withSplit]]'s zero-shuffle projection. Adds
    * `split_group` (the group key) and `splitCol`. */
  def leakageSafeSplit(
      docs: DataFrame, idCol: String, clusters: DataFrame,
      trainUpTo: Int = 204, valUpTo: Int = 230,
      salt: String = "sp8", splitCol: String = "split"): DataFrame = {
    val cl = clusters.select(
      col("doc_id").as("__cc_id"), col("cluster_id").as("__cc_lbl"))
    // the group key is TYPE-STABLE: both alternatives render as strings
    // before coalescing. `cast(id as long)` would NULL out every
    // unclustered doc when the id column is a non-numeric string — they
    // would all hash the same NULL draw and silently pile into one split
    // bucket. Numeric ids render identically either way ("5" == cast of
    // 5L), so the md5 draws — and the DuckDB oracle — are unchanged.
    val keyed = docs.join(cl, col(idCol) === col("__cc_id"), "left")
      .withColumn("split_group",
        coalesce(col("__cc_lbl").cast("string"), col(idCol).cast("string")))
      .drop("__cc_id", "__cc_lbl")
    withSplit(keyed, "split_group", trainUpTo, valUpTo, salt, splitCol)
  }

  /** Frequency-weighted SOFT dedup — downweight near-duplicate clusters
    * instead of dropping them (the SemDeDup/Dolma-style alternative to
    * hard dedup: duplicated content is informative about importance, so
    * keep each cluster's expected contribution at ~one document). Every
    * doc keeps with probability ceil(256/n)/256 ≈ 1/n where n is its
    * near-dup cluster size (unclustered docs: n = 1, always kept), via
    * the deterministic per-doc md5 draw — reproducible on any cluster
    * size or retry, like every sampler here. Kept docs carry
    * `weight` = n so a loss-reweighting consumer can restore each
    * cluster's total mass instead of flattening it.
    *
    * `clusters` is the stored (doc_id, cluster_id) dedup artifact
    * ([[Dedup.connectedComponents]] output) — ≪ corpus-sized. Scale
    * shape: one groupBy over the cluster frame for sizes, one hash join
    * of docs against the labeled frame (broadcast when small — Catalyst
    * decides), then a row-local draw: the corpus itself never shuffles.
    * The keep test is integer arithmetic (`draw * n < 256`), exact in
    * both engines. */
  def softDedup(
      docs: DataFrame, idCol: String, clusters: DataFrame,
      salt: String = "sp9"): DataFrame = {
    val sizes = clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("__cc_n"))
    val cl = clusters.join(sizes, "cluster_id")
      .select(col("doc_id").as("__cc_id"), col("cluster_id").as("__cc_lbl"),
        col("__cc_n"))
    // cluster identity renders as STRING for the same reason split_group
    // does above: a non-numeric doc id cast to long is NULL, which would
    // silently erase cluster identity for every unclustered doc. Numeric
    // labels render identically either way ("5" == cast of 5L).
    docs.join(cl, col(idCol) === col("__cc_id"), "left")
      .withColumn("cluster_id",
        coalesce(col("__cc_lbl").cast("string"), col(idCol).cast("string")))
      .withColumn("cluster_size", coalesce(col("__cc_n"), lit(1L)))
      .withColumn("kept",
        conv(hexDraw(col(idCol), salt), 16, 10).cast("long") *
          col("cluster_size") < 256)
      .withColumn("weight",
        when(col("kept"), col("cluster_size")).otherwise(lit(0L)))
      .drop("__cc_id", "__cc_lbl", "__cc_n")
  }

  /** Deterministic shard id in [0, nShards) for training-shard export:
    * derived from the row's hash draw, so shards are balanced and stable
    * across runs/retries. Writing becomes
    * `df.repartition(col("shard")).write.partitionBy("shard")`. */
  def withShard(
      df: DataFrame, idCol: String, nShards: Int,
      salt: String = "sp2", shardCol: String = "shard"): DataFrame = {
    require(nShards > 0 && nShards <= 256, "nShards must be in 1..256")
    // hex pair -> 0..255; an md5-capable engine reproduces the same value
    // by positional hex decode (the DuckDB oracle uses position-in-string)
    val value = conv(hexDraw(col(idCol), salt), 16, 10).cast("int")
    df.withColumn(shardCol, pmod(value, lit(nShards)).cast("int"))
  }

  /** Temperature-based source rebalancing (library form of sp6 — the
    * multilingual-LM mixing rule): target share per source ∝ n_s^alpha,
    * served by per-row deterministic Bernoulli acceptance at rate
    * min(1, budget·q_s/n_s) against a 48-bit md5 uniform. Per-source
    * counts are MODEL STATE (one tiny aggregate collected to the driver);
    * the acceptance itself is a row-local projection joined from a
    * broadcast rate table — reproducible on any cluster size or retry.
    * Adds (rate, sampled) to every row; filter on `sampled` to take the
    * rebalanced corpus. */
  def temperatureMix(
      df: DataFrame, idCol: String, srcCol: String,
      alpha: Double = 0.5, budgetFrac: Double = 0.5,
      salt: String = "mix"): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // per-source counts: sources are few (model state); pow/sum run on the
    // driver in source-sorted order so rates are reproducible
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    // sqrt is correctly rounded where pow(x, 0.5) need not be — route the
    // default alpha through it so rates match an engine-side sqrt spelling
    // bit-for-bit (the sp6 oracle's contract)
    def powA(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    val z = counts.map { case (_, n) => powA(n.toDouble) }.sum
    val total = counts.map(_._2).sum
    val rates = counts.map { case (s, n) =>
      (s, math.min(1.0, total * budgetFrac * (powA(n.toDouble) / z) / n))
    }
    val rateDf = rates.toSeq.toDF(srcCol, "rate")
    val u = graft.functions.HashFunctions.md5_48(
        concat(lit(salt), col(idCol).cast("string")))
      .cast("double") / lit(281474976710656.0)
    df.join(broadcast(rateDf), srcCol)
      .withColumn("sampled", u < col("rate"))
  }

  /** sp7's library form: fill a per-group token budget with the
    * highest-quality documents first ("the best N tokens from each
    * source"). Quality = distinct-word fraction quantized to 1e-6, so the
    * greedy order (quality DESC, id) and the running token sum are exact
    * integers — the same rows are selected on any engine or cluster size.
    *
    * One shuffle: the per-group window. With `prePrune`, each map
    * partition first drops everything past a LOCAL budget prefix (sorted
    * within the partition, no exchange): any document inside the global
    * budget prefix is also inside its partition's local prefix — the
    * better-ranked documents local to its partition are a subset of those
    * globally — so the prune is lossless while bounding the exchange to
    * ~budget tokens per (group, partition) however large the corpus. */
  def budgetFill(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      budgetTokens: Long, prePrune: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(
      col(groupCol).cast("string").as("source"),
      col(idCol).cast("long").as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      round(size(array_distinct(split(col(textCol), " "))) /
        size(split(col(textCol), " ")).cast("double") * 1e6)
        .cast("long").as("quality_u6"))
    val pruned =
      if (!prePrune) d
      else {
        import docs.sparkSession.implicits._
        d.select("source", "doc_id", "n_tokens", "quality_u6")
          .as[(String, Long, Long, Long)]
          .sortWithinPartitions(col("source"), col("quality_u6").desc, col("doc_id"))
          .mapPartitions { it =>
            var cur: String = null
            var cum = 0L
            it.filter { case (src, _, nt, _) =>
              if (src != cur) { cur = src; cum = 0L }
              cum += nt
              cum <= budgetTokens
            }
          }
          .toDF("source", "doc_id", "n_tokens", "quality_u6")
      }
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_u6").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pruned
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budgetTokens)
      .select(col("source"), col("doc_id"), col("quality_u6"),
        col("n_tokens"), col("cum_tokens"))
      .orderBy(col("source"), col("quality_u6").desc, col("doc_id"))
  }
}
