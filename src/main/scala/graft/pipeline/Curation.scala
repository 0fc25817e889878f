package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data build runs
  * over raw documents — language filter -> quality gate -> exact dedup ->
  * deterministic downsample -> shard assignment.
  *
  * Every stage is a declarative, deterministic plan (quality features are
  * codegen'd built-ins, dedup keeps the min-id row per content hash,
  * sampling/sharding are md5-threshold projections): a retried or
  * re-partitioned 100 TB build emits byte-identical shards, and an
  * independent engine can reproduce the whole chain (the cp1 oracle does,
  * in DuckDB SQL). Stage order matters at scale: cheap row-local filters
  * run before the one shuffle (dedup's partition-by-hash), and the sample
  * runs before shard materialization.
  */
object Curation {

  /** Curate `docs` down to a sharded training subset. Returns the curated
    * rows with a `shard` column; aggregate or
    * `repartition(col("shard")).write.partitionBy("shard")` downstream.
    *
    * @param sampleRate keep probability numerator out of 256 (128 = 50%)
    */
  def curate(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      keepLang: String = "en", minTokens: Long = 5,
      minStopwordRatio: Double = 0.05, sampleRate: Int = 128,
      nShards: Int = 4): DataFrame = {
    val filtered = docs.where(col(langCol) === keepLang)
    val gated = TextAnalysis.quality(filtered, textCol)
      .where(col("n_tokens") >= minTokens &&
        col("stopword_ratio") >= minStopwordRatio)
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    val deduped = gated.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val sampled = Sampling.stratifiedSample(
      deduped, idCol, langCol, rates = Map.empty,
      defaultRate = sampleRate, salt = "cp1")
    Sampling.withShard(sampled, idCol, nShards, salt = "cp1s")
  }

  /** Text cleaning + PII redaction (library form of tc1): strip HTML tags,
    * redact emails and URLs to placeholder tokens, collapse whitespace.
    * Pure per-row regexp projections — zero shuffles at any scale. The
    * patterns avoid backslash escapes so the same text works under Java
    * and RE2 regex engines. Adds `n_emails`, `n_urls`, `clean_<textCol>`. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val UrlPattern = "https?://[^ ]+"
  val TagPattern = "<[^>]*>"

  /** Corpus snapshot diff — the dataset-versioning primitive an
    * incremental training-data build runs between two corpus versions:
    * per document, whether it was ADDED, REMOVED, CHANGED (same id,
    * different content hash) or UNCHANGED. One full outer join on the
    * id; content comparison is md5 on each side, so the diff never
    * ships document bodies — at 100 TB each side reduces to (id, 16-byte
    * hash) before the only shuffle. Returns (id, status) with status in
    * {added, removed, changed, unchanged}. */
  def snapshotDiff(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol).as("__id"), md5(col(textCol)).as("__oh"))
    val n = newDocs.select(col(idCol).as("__id"), md5(col(textCol)).as("__nh"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "changed")
          .otherwise("unchanged").as("status"))
  }

  def cleanText(df: DataFrame, textCol: String): DataFrame = {
    val stripped = regexp_replace(col(textCol), TagPattern, " ")
    df.withColumn("__s1", stripped)
      .withColumn("n_emails",
        size(expr(s"regexp_extract_all(__s1, '$EmailPattern', 0)")).cast("long"))
      .withColumn("n_urls",
        size(expr(s"regexp_extract_all(__s1, '$UrlPattern', 0)")).cast("long"))
      .withColumn(s"clean_$textCol",
        trim(regexp_replace(
          regexp_replace(regexp_replace(col("__s1"), EmailPattern, "[EMAIL]"),
            UrlPattern, "[URL]"),
          "  +", " ")))
      .drop("__s1")
  }

  /** Per-doc distinct word `n`-grams. Deduplication is ROW-LOCAL
    * (`array_distinct` before the explode): no corpus-wide distinct
    * shuffle, and the op stays valid on an unbounded stream. */
  def ngrams(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      carry: Seq[String] = Nil): DataFrame =
    df.select((col(idCol).as("doc_id") +: carry.map(col) :+
        explode(array_distinct(
          graft.functions.TextFunctions.word_ngrams(col(textCol), n))).as("gram")): _*)

  /** Per-doc contamination counts against a static eval corpus. `docs` may
    * be a BATCH or a STREAMING DataFrame — the identical declarative plan
    * serves both (streaming: a stream-static broadcast join + an update-
    * mode aggregation keyed by doc_id). The eval side is benchmark-sized,
    * so its distinct gram set broadcasts; no all-pairs work, one pass.
    *
    * On an UNBOUNDED stream the per-doc aggregation state must be bounded:
    * pass `watermark = Some((ingestTimeCol, delay))` so doc state is
    * evicted once the watermark passes (each doc's grams arrive inside one
    * micro-batch, so any delay covering batch skew is enough). Without it,
    * streaming use is only safe for bounded replays (as in the spec). */
  def contaminationCounts(
      docs: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      watermark: Option[(String, String)] = None,
      hashGrams: Boolean = false): DataFrame = {
    // hashGrams replaces each n-gram string (~50 bytes at n=8) with its
    // xxhash64 (8 bytes) on BOTH sides before the join: ~6x smaller
    // broadcast + join keys. False positives need a 64-bit collision
    // between a training and an eval gram — ~m*n/2^64, irrelevant below
    // ~10^9 distinct grams per side; the exact variant remains the
    // default (and the oracle's semantics).
    def keyed(g: DataFrame): DataFrame =
      if (hashGrams) g.withColumn("gram", xxhash64(col("gram"))) else g
    val evalGrams = keyed(ngrams(eval, idCol, textCol, n))
      .select(col("gram")).distinct()
      .withColumn("__hit", lit(1))
    val marked = watermark match {
      case Some((tsCol, delay)) => docs.withWatermark(tsCol, delay)
      case None => docs
    }
    val withTs = watermark.map(_._1).toSeq
    val g = ngrams(marked, idCol, textCol, n, carry = withTs)
    keyed(g).join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id") +: withTs.map(col): _*)
      .agg(
        count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_contaminated"),
        round(count(col("__hit")) / count(lit(1)).cast("double"), 4)
          .as("contamination"))
      .drop(withTs: _*)
  }

  /** Train/eval decontamination (library form of dc1): flag every training
    * document sharing an `n`-gram with the eval corpus, with overlap
    * counts (GPT-3 appendix-C shape). */
  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed-bigram features are under a TARGET
    * distribution (the slice matching `targetPred` — e.g. curated/English
    * text) than under the raw corpus, then keep the highest-weight
    * documents. The published recipe: hash n-gram features into a fixed
    * bucket table, fit two add-one-smoothed bucket LMs, weight =
    * Σ_features log(p_target(b) / p_source(b)).
    *
    * Determinism discipline: buckets are md5_48(gram) % `buckets`; each
    * bucket's two log-probs quantize separately through the suite's
    * fixed-point micro-nat floor (`floor(ln(p) * 1e6)` as BIGINT), so the
    * per-document weight is an integer SUM of (lt - ls) over its bigram
    * occurrences — order-free and engine-exact.
    *
    * Scale shape (100 TB): the two LMs are ONE groupBy over the hashed
    * bigram stream (bucket-table-sized state, partial-aggregable); the
    * model is `buckets` rows — broadcast back over the stream; the
    * per-doc weight is one partial-aggregable sum. Nothing corpus-sized
    * ever sits on the driver or shuffles twice. */
  def dsirWeights(
      docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 8192): DataFrame = {
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    val grams = docs.select(col(idCol).as("doc_id"),
      targetPred.as("__tgt"),
      explode(graft.functions.TextFunctions.word_ngrams(col(textCol), 2))
        .as("gram"))
    val bucketed = grams.select(col("doc_id"), col("__tgt"),
      (graft.functions.HashFunctions.md5_48(col("gram")) % buckets).as("b"))
    // one pass: per-bucket target/source counts (source = whole corpus,
    // target ⊂ source — the paper's estimator)
    val lm = bucketed.groupBy(col("b")).agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cs"))
    val tot = lm.agg(sum(col("ct")).as("nt"), sum(col("cs")).as("ns"))
    val model = lm.crossJoin(broadcast(tot)).select(col("b"),
      (floor(log((col("ct") + lit(1L)) /
          (col("nt").cast("double") + lit(buckets.toDouble))) * lit(1000000.0))
        .cast("long") -
        floor(log((col("cs") + lit(1L)) /
          (col("ns").cast("double") + lit(buckets.toDouble))) * lit(1000000.0))
          .cast("long")).as("lr_micro"))
    bucketed
      .join(broadcast(model), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lr_micro")).as("w_micro"))
  }

  /** Extract the fitted DSIR bucket model as serving state: index b →
    * lr_micro (the integer micro-nat log-ratio [[dsirWeights]] computes).
    * `buckets` longs — model state like ml1's weight table or ts3's
    * seasonal profile; buckets no training gram ever hit carry the
    * ct=0/cs=0 smoothed default so unseen-feature documents score the
    * same value any engine would compute. */
  def dsirModel(
      docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 8192): Array[Long] = {
    val grams = docs.select(targetPred.as("__tgt"),
      explode(graft.functions.TextFunctions.word_ngrams(col(textCol), 2))
        .as("gram"))
    val bucketed = grams.select(col("__tgt"),
      (graft.functions.HashFunctions.md5_48(col("gram")) % buckets).as("b"))
    val lm = bucketed.groupBy(col("b")).agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cs"))
    val rows = lm.collect() // buckets-bounded model state, never corpus rows
    val nt = rows.map(_.getLong(1)).sum.toDouble + buckets.toDouble
    val ns = rows.map(_.getLong(2)).sum.toDouble + buckets.toDouble
    def lr(ct: Long, cs: Long): Long =
      math.floor(math.log((ct + 1L) / nt) * 1000000.0).toLong -
        math.floor(math.log((cs + 1L) / ns) * 1000000.0).toLong
    val out = Array.fill(buckets)(lr(0L, 0L))
    rows.foreach(r => out(r.getLong(0).toInt) = lr(r.getLong(1), r.getLong(2)))
    out
  }

  /** Score documents against a FITTED DSIR bucket model — the serving
    * side of [[dsirWeights]] (identical integer weights on the training
    * corpus itself; spec-pinned). The model ships as ONE array literal
    * (a single reference object — no per-bucket literal tree), the
    * lookup is a row-local projection, and the per-doc sum is a
    * partial-aggregable groupBy, so the IDENTICAL plan scores a batch
    * frame or a Structured Streaming source of incoming documents in
    * update mode (the dc1/ts3 twin pattern: train offline, apply to the
    * live feed). */
  def dsirScore(
      docs: DataFrame, idCol: String, textCol: String,
      model: Array[Long]): DataFrame = {
    require(model.nonEmpty, "empty DSIR model")
    val marr = lit(model)
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.word_ngrams(col(textCol), 2))
          .as("gram"))
      .select(col("doc_id"), element_at(marr,
        (graft.functions.HashFunctions.md5_48(col("gram")) % model.length)
          .cast("int") + 1).as("lr"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lr")).as("w_micro"))
  }

  def decontaminate(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame =
    contaminationCounts(train, eval, idCol, textCol, n)
      .where(col("n_contaminated") > 0)

  /** Bloom-pruned decontamination — the 100 TB shape when even the hashed
    * eval gram set is uncomfortably large to broadcast-join against every
    * corpus gram: a ~10-bits-per-gram Bloom filter over the eval grams
    * (built once per eval suite — index state, like the ANN codebooks)
    * prunes the corpus with a row-local codegen'd `might_contain` probe,
    * and the exact gram join runs only over the candidate documents.
    * A Bloom false positive costs one wasted exact verification; false
    * negatives are impossible — so the output EQUALS [[decontaminate]]
    * while the corpus-wide join shrinks to the candidate slice. */
  def bloomDecontaminate(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      fpp: Double = 0.01, maxBroadcastGrams: Long = 8000000L): DataFrame = {
    import graft.functions.BloomFunctions
    // Threshold gate: when the eval gram set comfortably fits a broadcast,
    // the Bloom build + corpus probe is pure overhead over the exact
    // broadcast-join plan (measured slower at every sf where the eval side
    // broadcasts) — route to [[decontaminate]], which is the identical
    // answer by construction. The gate reads only token counts (one cheap
    // aggregate, no hashing, no distinct shuffle) and deliberately
    // OVER-estimates the distinct gram count, so the bloom path engages
    // only in the genuinely-huge-eval-set regime it exists for.
    val evalGramUpperBound = eval.select(
        greatest(size(split(col(textCol), " ")) - (n - 1), lit(0)).as("__g"))
      .agg(coalesce(sum(col("__g")), lit(0L))).collect()(0).getLong(0)
    if (evalGramUpperBound <= maxBroadcastGrams)
      return decontaminate(train, eval, idCol, textCol, n)
    // index build: distinct eval gram hashes -> Bloom sketch (driver-side
    // model state; the count is one scalar aggregate). Materialized once —
    // the hash set feeds both the sizing count and the sketch aggregation,
    // and eval-corpus shingling is the expensive part of both.
    val evalHashes = ngrams(eval, idCol, textCol, n)
      .select(xxhash64(col("gram")).as("h")).distinct()
      .localCheckpoint()
    val expected = math.max(evalHashes.count(), 1L)
    val bf = BloomFunctions.serialize(
      evalHashes.stat.bloomFilter("h", expected, fpp))
    // prune: docs owning at least one possibly-contaminated gram; the id
    // list is candidate-sized (Bloom survivors only), so broadcast the
    // semi-join rather than shuffling the corpus on ids
    val candIds = ngrams(train, idCol, textCol, n)
      .where(BloomFunctions.might_contain(bf, col("gram")))
      .select(col("doc_id")).distinct()
    val candidates = train.join(
      broadcast(candIds.withColumnRenamed("doc_id", "__cid")),
      col(idCol) === col("__cid"), "left_semi")
    // exact verification over the candidate slice only
    decontaminate(candidates, eval, idCol, textCol, n)
  }
}
