package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable text-analysis operators: language ID, quality scoring, token
  * counting, fingerprinting. All built-in-function plans (codegen'd), no
  * UDFs. */
object TextAnalysis {

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est"),
    "es" -> Seq("el", "los", "y", "es"))

  private def tokens(textCol: Column): Column = split(lower(textCol), " ")

  private def stopCount(textCol: Column, lang: String): Column =
    size(filter(tokens(textCol),
      t => t.isin(stopwords(lang).map(x => x: Any): _*))).cast("long")

  /** Per-row language scores + deterministic argmax prediction. */
  def langId(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val scored = docs
      .withColumn("en_score", stopCount(t, "en"))
      .withColumn("de_score", stopCount(t, "de"))
      .withColumn("fr_score", stopCount(t, "fr"))
      .withColumn("es_score", stopCount(t, "es"))
    scored.withColumn("predicted",
      when(col("en_score") >= greatest(col("de_score"), col("fr_score"), col("es_score")), "en")
        .when(col("de_score") >= greatest(col("fr_score"), col("es_score")), "de")
        .when(col("fr_score") >= col("es_score"), "fr")
        .otherwise("es"))
  }

  /** Length/stopword/avg-token-length quality features. */
  def quality(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = size(split(t, " ")).cast("double")
    docs
      .withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("avg_token_len", round(length(regexp_replace(t, " ", "")) / nTok, 4))
      .withColumn("stopword_ratio", round(stopCount(t, "en").cast("double") / nTok, 4))
      .withColumn("length_score", round(least(lit(1.0), nTok / 100.0), 4))
  }

  /** Whitespace + regex ("BPE-ish") token counts. */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val re = size(regexp_extract_all(t, lit("[a-z]+|[0-9]+"), lit(0))).cast("double")
    docs
      .withColumn("ws_tokens", size(split(t, " ")).cast("long"))
      .withColumn("re_tokens", re.cast("long"))
      .withColumn("chars_per_token", round(length(t) / re, 4))
  }

  /** Gopher/RefinedWeb-style repetition features + keep/drop verdict
    * (library form of tx5): duplicate-word fraction and the mass of the
    * most frequent bigram. Two partial-aggregable groupBys on doc-local
    * keys — no joins against the corpus, no UDFs. */
  def repetition(
      docs: DataFrame, idCol: String, textCol: String,
      maxTopBigramFrac: Double = 0.2, minDistinctWordFrac: Double = 0.3): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
    val bg = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.word_ngrams(col(textCol), 2)).as("gram"))
    val cnt = bg.groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
    val agg = cnt.groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("total"))
    val distinctFrac = size(array_distinct(col("w"))) / size(col("w")).cast("double")
    val topFrac = col("top_c") / col("total").cast("double")
    tok.join(agg, "doc_id")
      .select(col("doc_id"),
        round(lit(1.0) - distinctFrac, 4).as("dup_word_frac"),
        round(topFrac, 4).as("top_bigram_frac"),
        (distinctFrac >= minDistinctWordFrac && topFrac <= maxTopBigramFrac).as("keep"))
  }

  /** The full Gopher repetition-filter suite (Rae et al. 2021, Table A1)
    * over word n-grams — DataFrame form of tx11: per document, the
    * character mass of the most frequent {2,3,4}-gram and the character
    * mass of all duplicated {5,10}-grams, each over total document chars,
    * plus the conjunctive keep verdict at the paper's thresholds.
    *
    * One explode fans each document into (n, gram) rows for every n at
    * once; the two groupBys aggregate on doc-local keys (partial-agg
    * combinable, no corpus-wide state) — linear in corpus tokens at any
    * scale. The most-frequent tie-break (longest gram) rides an integer
    * (count * 100000 + len) key: deterministic without string collation. */
  def gopherRepetition(docs: DataFrame, idCol: String, textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = Seq(5, 10),
      topMax: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      dupMax: Map[Int, Double] = Map(5 -> 0.15, 10 -> 0.10)): DataFrame = {
    val ns = (topNs ++ dupNs).distinct.sorted
    val base = docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).as("total_chars"), split(col(textCol), " ").as("w"))
    val g = base
      .select(col("doc_id"), col("total_chars"), col("w"),
        explode(lit(ns.toArray)).as("n"))
      .select(col("doc_id"), col("total_chars"), col("n"),
        explode(sequence(lit(0), greatest(size(col("w")) - col("n"), lit(0)))).as("i"),
        col("w"))
      .where(col("i") + col("n") <= size(col("w")))
      .select(col("doc_id"), col("total_chars"), col("n"),
        concat_ws(" ", slice(col("w"), col("i") + 1, col("n"))).as("gram"))
    val cnt = g.groupBy(col("doc_id"), col("total_chars"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"), max(length(col("gram"))).as("glen"))
    val agg = cnt.groupBy(col("doc_id"), col("total_chars"), col("n"))
      .agg(
        max(col("c") * 100000 + col("glen")).as("top_key"),
        sum(when(col("c") > 1, col("c") * col("glen")).otherwise(0L)).as("dup_mass"))
    val topMass = (expr("top_key div 100000") * (col("top_key") % 100000))
    def frac(mass: Column): Column = round(mass / col("total_chars").cast("double"), 4)
    val pivots =
      topNs.map(n => coalesce(max(when(col("n") === n, topMass)), lit(0L)).as(s"top$n")) ++
      dupNs.map(n => coalesce(max(when(col("n") === n, col("dup_mass"))), lit(0L)).as(s"dup$n"))
    val piv = agg.groupBy(col("doc_id"), col("total_chars")).agg(pivots.head, pivots.tail: _*)
    val keep = (topNs.map(n =>
        col(s"top$n") / col("total_chars").cast("double") <= topMax(n)) ++
      dupNs.map(n =>
        col(s"dup$n") / col("total_chars").cast("double") <= dupMax(n)))
      .reduce(_ && _)
    piv.select(
      col("doc_id") +:
        (topNs.map(n => frac(col(s"top$n")).as(s"top${n}_char_frac")) ++
          dupNs.map(n => frac(col(s"dup$n")).as(s"dup${n}_char_frac")) :+
          keep.as("keep")): _*)
  }

  /** Corpus-level UNIGRAM language-model scoring — the model-based quality
    * signal (CCNet-style: score each document under a model of the corpus;
    * rare-token-heavy documents score low). Two passes: (1) one groupBy
    * builds the token-count model — a vocabulary-sized result, checkpointed
    * and broadcast; its total is the one driver-side scalar — then (2) the
    * token stream left-joins the broadcast model and per-doc log-likelihood
    * reduces in a single aggregation. Tokens below `minCount` are OOV and
    * score at a 0.5-count floor. Per-token log-probs are quantized to
    * integer MICRO-logs (round(ln(p)*1e6)) so document sums are exact
    * integer arithmetic — reproducible under any aggregation order and
    * engine (ln's last-ulp wobble is 10 orders of magnitude below the
    * quantum). At 100 TB the model is still vocabulary-sized (fits any
    * executor); nothing else leaves the token stream's partitioning. */
  def unigramLm(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("token"))
    val counts = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = counts.agg(sum(col("cnt"))).collect()(0).getLong(0)
    val model = counts.where(col("cnt") >= minCount)
    tok.join(broadcast(model), Seq("token"), "left")
      .select(col("doc_id"),
        when(col("cnt").isNull, lit(1L)).otherwise(lit(0L)).as("oov"),
        expr(s"CAST(round(ln(CAST(coalesce(cnt * 2, 1) AS DOUBLE) / ${2L * total}) * 1e6) AS BIGINT)")
          .as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("oov")).as("n_oov"),
        sum(col("lp")).as("logp_u6"))
      .withColumn("avg_logp_u6",
        expr("CAST(round(logp_u6 / CAST(n_tokens AS DOUBLE)) AS BIGINT)"))
  }

  /** Fixed-window chunking with overlap (library form of ch1): every
    * document becomes ceil(len/stride) chunks of `size` tokens starting
    * every `stride` tokens — the context-window prep for retrieval
    * corpora and long-document training. Entirely row-local (one explode,
    * no shuffle): the 100 TB shape is a map stage that inherits the input
    * partitioning. Returns (doc_id, chunk_id, n_tokens, chunk_text). */
  def chunkWithOverlap(
      docs: DataFrame, idCol: String, textCol: String,
      size: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && size >= stride,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(expr(s"sequence(0, (size(w) - 1) DIV $stride)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        expr(s"size(slice(w, chunk_id * $stride + 1, $size))").cast("long")
          .as("n_tokens"),
        expr(s"array_join(slice(w, chunk_id * $stride + 1, $size), ' ')")
          .as("chunk_text"))
  }

  /** Corpus-level BIGRAM language-model scoring (library form of tx10,
    * extending [[unigramLm]] to first-order context): add-one-smoothed
    * P(w2|w1) from corpus bigram/unigram counts, per-document NLL in
    * integer micro-nats.
    *
    * `broadcastModel` gates the model join the same way
    * [[graft.pipeline.Curation.bloomDecontaminate]] gates its gram set:
    * a bounded-vocabulary model (default) broadcasts — the scored stream
    * then never re-shuffles at all — while a web-corpus model (itself
    * huge) must pass `false` to hash-join distributed on the (w1, w2)
    * key. The gate must be EXPLICIT either way: Catalyst's size estimate
    * under the model's scalar cross-join is garbage, and left to itself
    * the planner broadcast-collected the STREAM-side frame (measured:
    * the whole per-doc bigram frame through the driver). */
  def bigramLm(docs: DataFrame, idCol: String, textCol: String,
      broadcastModel: Boolean = true): DataFrame = {
    // bigram extraction rides the native one-pass word_ngrams expression:
    // the previous index-explode spelling carried the WHOLE token array
    // through every exploded row (O(tokens²) bytes per document through
    // the generator), where a gram string is O(tokens) total. A document
    // with <2 words emits its whole (spaceless) token list as the single
    // "gram" — the contains-space filter reproduces the old size(w)>=2
    // guard exactly (tokens themselves can never contain a space, so a
    // real bigram always has exactly one).
    val bg = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.word_ngrams(col(textCol), 2)).as("g"))
      .where(col("g").contains(" "))
      .select(col("doc_id"),
        substring_index(col("g"), " ", 1).as("w1"),
        expr("substring(g, instr(g, ' ') + 1)").as("w2"))
    // vocabulary size rides the plan as a broadcast 1-row frame — no
    // driver collect, no separate job; the countDistinct subtree runs
    // inside the same action
    val vdf = docs.select(explode(split(col(textCol), " ")).as("token"))
      .agg(countDistinct(col("token")).as("v"))
    // The bigram STREAM never fully shuffles in the broadcast path: the
    // model side aggregates the stream down to distinct-bigram/context
    // frames with map-side combine (the (w1,w2) exchange ships combined
    // partials — vocab²-bounded, kilobytes per partition at any corpus
    // size), and the scoring side joins the broadcast model directly on
    // top of the scan+explode, so the per-doc rollup's groupBy(doc_id)
    // also combines map-side and ships only one partial row per
    // (partition, document). The corpus is scanned+exploded twice (model
    // pass + scoring pass) — strictly cheaper than the previous
    // spelling's repartition(doc_id), which wrote and re-read the ENTIRE
    // raw bigram stream through one full shuffle to anchor a per-doc
    // pre-aggregation whose 600k-group hash table cost more than the
    // instances it saved. For a web-scale vocabulary that cannot
    // broadcast (`broadcastModel = false`), the scoring join instead
    // hash-shuffles the stream on (w1, w2) — the irreducible cost of a
    // distributed model join, and still exactly one full-stream
    // exchange.
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy("w1").agg(sum(col("cb")).as("cu"))
    val model = cb.join(cu, "w1").crossJoin(broadcast(vdf))
      .select(col("w1"), col("w2"),
        expr("CAST(floor(ln((cb + 1) / CAST(cu + v AS DOUBLE)) * 1e6) AS BIGINT)")
          .as("lp"))
    val modelSide = if (broadcastModel) broadcast(model) else model.hint("shuffle_hash")
    bg.join(modelSide, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("lp"))).cast("long").as("nll_u6"))
  }

  /** CCNet-style perplexity filtering (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * train a language model on a trusted REFERENCE slice (`refFilter` —
    * CCNet's Wikipedia analogue), score every document's per-token
    * perplexity under that model, and bucket documents per language into
    * head / middle / tail perplexity tertiles — the canonical
    * quality-stratification step of a web-crawl training-data pipeline.
    *
    * The model is the add-one-smoothed bigram LM of [[bigramLm]], but
    * trained on the reference slice only and applied OUT-OF-DOMAIN:
    * unseen bigrams/contexts score with cb = 0 / cu = 0 against the
    * reference vocabulary. Scores are integer micro-nats per bigram
    * (`ppl_u6 = nll_u6 DIV n_bigrams` — order-independent, engine-exact);
    * documents with fewer than two tokens have no bigram probability and
    * are dropped, exactly as in [[bigramLm]].
    *
    * Scale shape: the reference model aggregates with map-side combine
    * and broadcasts (gate it with `broadcastModel = false` for a
    * web-scale reference corpus — same Catalyst-misestimate rationale as
    * [[bigramLm]]); the scored stream then never fully shuffles — two
    * broadcast left joins on top of the scan and a map-side-combined
    * per-doc rollup. The tertile window runs over the doc-level score
    * frame (one row per document), partitioned by language — the same
    * per-language global ordering CCNet itself computes. */
  def perplexityFilter(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, refFilter: Column,
      broadcastModel: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def bigrams(df: DataFrame): DataFrame =
      df.select(col(idCol).as("doc_id"),
          explode(graft.functions.TextFunctions.word_ngrams(col(textCol), 2)).as("g"))
        .where(col("g").contains(" "))
        .select(col("doc_id"),
          substring_index(col("g"), " ", 1).as("w1"),
          expr("substring(g, instr(g, ' ') + 1)").as("w2"))
    val ref = docs.where(refFilter)
    val cb = bigrams(ref).groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy("w1").agg(sum(col("cb")).as("cu"))
    val vdf = ref.select(explode(split(col(textCol), " ")).as("token"))
      .agg(countDistinct(col("token")).as("v"))
    val cbSide = if (broadcastModel) broadcast(cb) else cb.hint("shuffle_hash")
    val cuSide = if (broadcastModel) broadcast(cu) else cu.hint("shuffle_hash")
    val scored = bigrams(docs)
      .join(cbSide, Seq("w1", "w2"), "left")
      .join(cuSide, Seq("w1"), "left")
      .crossJoin(broadcast(vdf))
      .select(col("doc_id"),
        expr("CAST(floor(ln((coalesce(cb, 0) + 1) / " +
          "CAST(coalesce(cu, 0) + v AS DOUBLE)) * 1e6) AS BIGINT)").as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("lp"))).cast("long").as("nll_u6"))
    val pp = scored.select(col("doc_id"),
      expr("nll_u6 DIV n_bigrams").as("ppl_u6"))
    val lang = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
    val w = Window.partitionBy(col("lang")).orderBy(col("ppl_u6"), col("doc_id"))
    pp.join(lang, "doc_id")
      .withColumn("__t", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("ppl_u6"),
        when(col("__t") === 1, "head").when(col("__t") === 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** TF-IDF document scoring (library form of tx8): the document-frequency
    * model aggregates to a VOCABULARY-sized table, checkpointed and
    * broadcast back over the token stream — the corpus never shuffles for
    * the model join. IDF quantizes to integer micro-logs so per-doc sums
    * are exact integer math (order- and engine-independent). */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("token"))
    val n = docs.count()
    val df = tok.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .localCheckpoint()
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    tf.join(broadcast(df), Seq("token"))
      .select(col("doc_id"),
        (col("tf") * expr(s"CAST(floor(ln($n / CAST(df AS DOUBLE)) * 1000000) AS BIGINT)"))
          .as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).cast("long").as("tfidf_micro"),
        count(lit(1)).as("n_terms"))
  }

  /** Shannon-entropy quality signals (library form of tx9): character- and
    * token-level entropy per document, in integer micro-nats. H = ln N -
    * (Σ n_c ln n_c)/N; the per-symbol ln quantizes to round(ln(n)*1e6) so
    * the aggregation is exact integer arithmetic (unigramLm's trick) and
    * only the final per-doc combination is float. Two row-local explodes +
    * partial-aggregable groupBys — linear at any corpus size. */
  def entropySignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // symbol counting is doc-local, so the native one-pass text_stats
    // expression (codegen'd) replaces the two explode→groupBy chains and
    // the per-doc join this used to run — a pure projection, zero
    // shuffles. Empty documents return a NULL struct and are dropped,
    // exactly as the exploded form dropped them through its aggregates.
    val st = graft.functions.TextFunctions.text_stats(col(textCol))
    docs.select(col(idCol).as("doc_id"), st.as("st"))
      .where(col("st").isNotNull)
      .select(col("doc_id"),
        col("st.n_chars").as("n_chars"),
        col("st.distinct_chars").as("distinct_chars"),
        expr("CAST(round(ln(CAST(st.n_chars AS DOUBLE)) * 1e6 " +
          "- st.t_chars / CAST(st.n_chars AS DOUBLE)) AS BIGINT)").as("char_ent_u6"),
        col("st.n_tokens").as("n_tokens"),
        col("st.distinct_tokens").as("distinct_tokens"),
        expr("CAST(round(ln(CAST(st.n_tokens AS DOUBLE)) * 1e6 " +
          "- st.t_tokens / CAST(st.n_tokens AS DOUBLE)) AS BIGINT)").as("token_ent_u6"))
  }

  /** Hashed linear classifier scoring (library form of ml1 — the fastText-
    * style quality-classifier serving shape with the hashing trick): token
    * -> md5 bucket mod `weights.length` -> integer micro-weight looked up
    * in the broadcast literal weight array -> per-doc sum. Weights are
    * MODEL STATE (a trained classifier's, quantized to 1e-6); document
    * scores are exact integer sums — engine- and order-independent. The
    * whole plan is row-local projection + one groupBy. */
  def hashedLinearScore(
      docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Long]): DataFrame = {
    // ONE array literal (a single reference object), not array(lit...):
    // a per-bucket literal tree re-enters every AQE re-optimization pass
    // (the VectorScores finding) and bloats the codegen source
    val warr = lit(weights.toArray)
    docs.repartition(col(idCol))
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("token"))
      .select(col("doc_id"), element_at(warr,
        (graft.functions.HashFunctions.md5_48(col("token"))
          % weights.length).cast("int") + 1).as("wt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("score_u6"))
      .withColumn("avg_score_u6",
        expr("CAST(round(score_u6 / CAST(n_tokens AS DOUBLE)) AS BIGINT)"))
      .withColumn("keep_flag", col("score_u6") > 0)
  }

  /** The deterministic stand-in weight table the ml1 driver query uses
    * (bucket -> ((bucket * 2654435761) % 2000001) - 1000000). */
  def ml1Weights(buckets: Int = 1024): Seq[Long] =
    (0 until buckets).map(b => ((b.toLong * 2654435761L) % 2000001L) - 1000000L)

  /** Distributed logistic-regression TRAINING over hashed bag-of-words
    * features — the trainable half of [[hashedLinearScore]]'s serving
    * shape (a fastText-style quality classifier). Full-batch gradient
    * descent: each round, every executor scores its documents against the
    * current weights (shipped as literal constants — `buckets` doubles of
    * model state) and emits per-bucket gradient contributions, which
    * reduce in ONE partial-aggregable groupBy(bucket); only the
    * buckets-sized gradient vector reaches the driver. Features hash with
    * the same md5 bucketing the scorer uses, so learned weights quantize
    * straight into [[hashedLinearScore]] (micro-units): train -> quantize
    * -> serve, all three distributed. Deterministic given data, seed
    * weights (zeros), and `iters`: the two cross-row float sums (per-doc
    * margin, per-bucket gradient) accumulate in fixed-point BIGINT units
    * (1e-12 and 1e-9 respectively), so partial-aggregation order can
    * never move a weight — the serving-side integer-score discipline
    * applied to training. `labelCol` must be 0/1. */
  def trainLinearClassifier(
      docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      buckets: Int = 1024, iters: Int = 5, lr: Double = 0.5): Seq[Double] = {
    require(iters > 0 && buckets > 0)
    // featurize once: per-(doc, bucket) counts normalized by doc length —
    // reused every round, so materialize (docs-scale, bounded columns)
    val feats = docs.repartition(col(idCol))
      .select(col(idCol).as("doc_id"), col(labelCol).cast("double").as("y"),
        explode(split(col(textCol), " ")).as("token"))
      .select(col("doc_id"), col("y"),
        (graft.functions.HashFunctions.md5_48(col("token"))
          % buckets).cast("int").as("b"))
      .groupBy(col("doc_id"), col("y"), col("b")).agg(count(lit(1)).as("cnt"))
      .withColumn("x",
        col("cnt") / sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .localCheckpoint()
    var w = Array.fill(buckets)(0.0)
    for (_ <- 1 to iters) {
      val warr = lit(w.clone()) // one literal object per round, no lit-tree
      // margin per doc, then per-bucket gradient of the log-loss:
      // grad_b = sum_docs (sigmoid(s_d) - y_d) * x_{d,b}
      // margins sum <= 1024 elements of |wx| * 1e12 and gradients
      // <= n_docs elements of |g| <= 1e9 — both well inside BIGINT range
      // for any corpus the serving side can hash (~9e9 docs)
      val grad = feats
        .withColumn("wx_u",
          round(element_at(warr, col("b") + 1) * col("x") * lit(1e12), 0)
            .cast("long"))
        .groupBy(col("doc_id"), col("y")).agg(
          sum(col("wx_u")).as("s_u"),
          collect_list(struct(col("b"), col("x"))).as("bx"))
        .select(col("y"), explode(col("bx")).as("p"),
          (lit(1.0) / (lit(1.0) + exp(-col("s_u") / lit(1e12)))).as("prob"))
        .select(col("p.b").as("b"),
          round((col("prob") - col("y")) * col("p.x") * lit(1e9), 0)
            .cast("long").as("g_u"))
        .groupBy(col("b")).agg(sum(col("g_u")).as("grad_u"))
        .collect()
      grad.foreach(r => w(r.getInt(0)) -= lr * (r.getLong(1) / 1e9))
    }
    w.toSeq
  }

  /** Corpus-wide adjacent-token-pair counts over CURRENT token arrays —
    * the per-iteration statistic of BPE training (tok1's plan): row-local
    * pair explosion, one partial-aggregable groupBy. */
  def bpePairCounts(toks: DataFrame, toksCol: String = "toks"): DataFrame =
    toks.where(size(col(toksCol)) >= 2)
      .select(explode(expr(
        s"transform(sequence(0, size($toksCol) - 2), i -> struct($toksCol[i] AS a, $toksCol[i + 1] AS b))"))
        .as("pr"))
      .groupBy(col("pr.a").as("left_tok"), col("pr.b").as("right_tok"))
      .agg(count(lit(1)).as("cnt"))

  /** Distributed BPE tokenizer training (Sennrich '16 at corpus scale):
    * `numMerges` rounds of [count adjacent pairs corpus-wide -> pick the
    * (max count, lexicographically-least) pair -> apply the greedy
    * left-to-right merge to every document]. Pair counting is the tok1
    * plan; the merge application is genuinely imperative sequential
    * per-row work, so it runs in a typed map (the mapPartitions escape
    * hatch, like the multimodal codecs). The learned merge table is
    * driver-side MODEL STATE (numMerges entries); per-round lineage is
    * truncated the connectedComponents way. Merged tokens join with a
    * space, so the final arrays re-segment the original text. Returns
    * (merges in order, final (doc_id, toks) frame). Stops early when no
    * pair repeats. */
  def bpeTrain(
      docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int = 10): (Seq[(String, String)], DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs
      .select(col(idCol).cast("long"), split(col(textCol), " "))
      .as[(Long, Seq[String])]
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val top = bpePairCounts(cur.toDF("doc_id", "toks"))
        .orderBy(col("cnt").desc, col("left_tok"), col("right_tok"))
        .head(1)
      top.headOption.filter(_.getLong(2) >= 2) match {
        case None => done = true
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          cur = cur.map { case (id, toks) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < toks.length) {
              if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
                out += a + " " + b; i += 2
              } else { out += toks(i); i += 1 }
            }
            (id, out.toSeq)
          }.localCheckpoint()
      }
    }
    (merges.toSeq, cur.toDF("doc_id", "toks"))
  }

  /** BPE ENCODE (the serving phase of [[bpeTrain]], Sennrich '16 apply):
    * tokenize new text with an already-learned merge table by applying
    * the merges IN TRAINING ORDER, each as one greedy left-to-right pass
    * — exactly the per-round transform training ran, so encoding the
    * training corpus reproduces the trained tokenization row-for-row
    * (LibraryApiSpec pins it). Purely row-local: the merge table is tiny
    * MODEL STATE shipped in the task closure, each document encodes
    * independently, no shuffle at any corpus size. Split semantics match
    * Spark's `split(text, ' ')` (trailing empties kept). Returns
    * (doc_id, toks). Correctness is pinned twice: the train/encode
    * duality spec (LibraryApiSpec), and the tok2 driver oracle, which
    * replays the STORED merge table in DuckDB (one `replace()` pass per
    * merge over a delimiter-string encoding — see
    * `PipelineQueries.bpeEncodeOracle`). */
  def bpeEncode(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.toArray
    // null text encodes as empty (matching the other row-local stages'
    // null tolerance); a null id cannot unbox into (Long, String) and
    // would NPE the whole job, so those rows are dropped up front
    docs.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, text) =>
        var toks: Array[String] = text.split(" ", -1)
        var m = 0
        while (m < ms.length) {
          val (a, b) = ms(m)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              out += a + " " + b; i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.toArray
          m += 1
        }
        (id, toks.toSeq)
      }.toDF("doc_id", "toks")
  }

  /** Unigram-LM tokenizer VOCABULARY (the SentencePiece/Kudo-2018 model
    * family, deterministic): candidate pieces are every substring of
    * length 1..`maxPieceLen` of each doc's `prefixLen`-char prefix; the
    * vocabulary keeps ALL single characters (so segmentation can never
    * dead-end) plus the `topK` most frequent longer pieces
    * (count DESC, piece ASC — a total order), with integer micro-log
    * probabilities lp = floor(ln(cnt/total)·1e6) over the selected
    * vocabulary mass. Every step is count/rank/ln arithmetic both engines
    * replay bit-for-bit (the tx7/tx10 micro-log discipline).
    *
    * Scale shape: one substring explode (prefix-bounded: ≤ prefixLen ×
    * maxPieceLen rows per doc) into one partial-aggregable count groupBy;
    * the rank window runs over the candidate VOCABULARY frame, not the
    * corpus. Returns (piece, lp) — model state, vocabulary-sized. */
  def unigramVocab(
      docs: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 64, maxPieceLen: Int = 6, topK: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pre = docs.select(
      expr(s"substring(coalesce($textCol, ''), 1, $prefixLen)").as("t"))
    val sub = pre
      .select(col("t"), explode(sequence(lit(1), lit(maxPieceLen))).as("k"))
      .where(length(col("t")) >= col("k"))
      .select(col("t"), col("k"),
        explode(expr("sequence(1, length(t) - k + 1)")).as("i"))
      .select(expr("substring(t, i, k)").as("piece"), col("k"))
      .groupBy(col("piece"), col("k")).agg(count(lit(1)).as("cnt"))
    val chars = sub.where(col("k") === 1).select(col("piece"), col("cnt"))
    val longs = sub.where(col("k") >= 2)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("piece").asc)))
      .where(col("rnk") <= topK).select(col("piece"), col("cnt"))
    val voc0 = chars.union(longs)
    val tot = voc0.agg(sum(col("cnt")).as("__tot"))
    voc0.crossJoin(broadcast(tot))
      .select(col("piece"),
        floor(log(col("cnt") / col("__tot")) * 1000000).cast("long").as("lp"))
  }

  /** Viterbi max-likelihood segmentation under a unigram vocabulary (the
    * tokenizer SERVING phase, like [[bpeEncode]] for BPE): per doc, the
    * dynamic program dp[p] = max over piece lengths k of
    * dp[p-k] + lp(piece ending at p), ties broken toward the LONGER
    * piece (the argmax key dp·8+k is collision-free for k ≤ 7, and the
    * DuckDB oracle replays the identical key). Returns
    * (doc_id, n_tokens, score) for the `prefixLen`-char prefix.
    *
    * Row-local compute under a broadcast vocabulary — zero shuffle at
    * any corpus size; the prefix bound is what makes the cross-engine
    * oracle replay tractable (the library itself accepts any length).
    * Single characters are always in a [[unigramVocab]] trained on the
    * same prefixes, so the DP never dead-ends. */
  def unigramSegment(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: Map[String, Long],
      prefixLen: Int = 64, maxPieceLen: Int = 6): DataFrame = {
    // the dp·8+k argmax key packs the piece length into the low 3 bits —
    // collision-free only for k ≤ 7; a wider limit would silently corrupt
    // the tie-break rather than fail
    require(maxPieceLen >= 1 && maxPieceLen <= 7,
      s"maxPieceLen must be in 1..7 (tie-break key packs k into 3 bits), got $maxPieceLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    docs.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, text0) =>
        val text = text0.substring(0, math.min(prefixLen, text0.length))
        val v = bc.value
        val n = text.length
        val ws = new Array[Long](n + 1)
        val wt = new Array[Long](n + 1)
        var p = 1
        while (p <= n) {
          var bestKey = Long.MinValue
          var bs = 0L
          var bt = 0L
          var k = 1
          while (k <= maxPieceLen && k <= p) {
            v.get(text.substring(p - k, p)) match {
              case Some(lp) =>
                val sc = ws(p - k) + lp
                val key = sc * 8 + k
                if (key > bestKey) { bestKey = key; bs = sc; bt = wt(p - k) + 1 }
              case None =>
            }
            k += 1
          }
          // a trained vocab always contains every single char of its own
          // corpus prefixes, so a dead-end means vocab and input come from
          // different corpora — fail loudly instead of silently resetting
          // the dp to score 0 (which would publish a plausible-looking but
          // meaningless segmentation)
          if (bestKey == Long.MinValue)
            throw new IllegalArgumentException(
              s"unigramSegment dead-end at doc $id pos $p: no vocab piece " +
                s"ends here (char '${text.charAt(p - 1)}'); the vocabulary " +
                "was trained on a different corpus than this input")
          ws(p) = bs
          wt(p) = bt
          p += 1
        }
        (id, wt(n), ws(n))
      }.toDF("doc_id", "n_tokens", "score")
  }

  /** WINNOWING fingerprints (MOSS), staged as two expressions — single
    * source for the tx6 driver query and its guarantee spec. The gram
    * array MUST be materialized into a column before the window pass:
    * inlining it into the window lambda would re-hash every gram per
    * window (interpreted HOFs do no common-subexpression elimination), an
    * O(n^2) blowup on long documents. */
  def gramHashesSparkExpr(textCol: String, k: Int = 4): String =
    s"""transform(sequence(0, greatest(size(split($textCol, ' ')) - $k, 0)),
       |  i -> md5(concat_ws(' ', slice(split($textCol, ' '), i + 1, $k))))""".stripMargin

  /** Window-min selection over a MATERIALIZED gram-hash array column. */
  def winnowFromGramsSparkExpr(gramsCol: String, w: Int = 5): String =
    s"""array_distinct(transform(sequence(0, greatest(size($gramsCol) - $w, 0)),
       |  i -> array_min(slice($gramsCol, i + 1, $w))))""".stripMargin

  /** Exact md5 fingerprint + min-shingle (winnowing-style) fingerprint. */
  def fingerprints(docs: DataFrame, textCol: String, shingleLen: Int = 5): DataFrame =
    docs
      .withColumn("fp_exact", md5(lower(col(textCol))))
      .withColumn("fp_min_shingle", expr(
        s"""array_min(transform(sequence(0, greatest(size(split($textCol, ' ')) - $shingleLen, 0)),
           |  i -> md5(concat_ws(' ', slice(split($textCol, ' '), i + 1, $shingleLen)))))""".stripMargin))

  /** BM25 top-k document retrieval (Robertson-Sparck Jones; the Okapi
    * formula with k1/b) for a SMALL query set over an arbitrarily large
    * corpus — the retrieval core of RAG-style training-data selection.
    *
    * Scale shape (100 TB corpus, q queries of a few terms each) — the
    * corpus NEVER shuffles:
    *  - per-term tfs + the doc token count come from the native
    *    [[graft.functions.TokenTermCounts]] kernel — one compiled pass
    *    over the string bytes, zero per-token allocation (tokenize-
    *    explode spellings allocate per token and scale negatively with
    *    local task width);
    *  - ALL model state (N, total token mass, per-term document
    *    frequencies) folds into ONE scalar aggregation pass over that
    *    kernel — a single broadcast row;
    *  - scoring is a row-local projection over hit docs; the final
    *    ranking runs on the TopKPerGroup bounded-heap plan —
    *    O(hits log k), no per-query global sort.
    *
    * Cross-engine determinism (the DuckDB oracle hash-gates this): idf is
    * quantized through the suite's fixed-point-micro discipline
    * (`floor(ln(..) * 1e6)` as BIGINT — tx8's trick), the tf
    * normalization is pure IEEE +,*,/ on doubles derived from integers,
    * and the per-(query, doc) score is an integer SUM of per-term micro
    * scores — no float-summation-order hazard.
    *
    * Reference scope: the reference engine has no retrieval surface; this
    * is north-star pipeline coverage (BASELINE.json) like the rest of
    * graft.pipeline. */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    val allTerms = queries.flatMap(_._2).distinct
    val m = allTerms.size
    // the corpus NEVER shuffles: per-term tfs + the doc's token count come
    // from the native token_term_counts kernel (one compiled byte pass,
    // zero per-token allocation — a split+explode spelling allocates per
    // token and scales negatively with local task width); corpus stats and
    // document frequencies fold into ONE scalar aggregation pass, and the
    // per-doc frame is a row-local projection pruned to docs with >= 1 hit
    val tc = graft.functions.TextFunctions
      .token_term_counts(col(textCol), allTerms)
    // TWO scoring spellings, dispatched on the distinct-term count:
    //  - m <= 10: fully-codegen'd per-term COLUMN expansion — the fastest
    //    per-row form (rt1's shape; ~25% faster than the array form).
    //  - m > 10: expression size must be O(1) in m — the column form
    //    expands per-term tf/df columns into every term-score and
    //    has-hit subtree, Catalyst's project-collapse re-inlines the
    //    kernel and the stats row per reference, and OPTIMIZATION time
    //    grows exponentially in m (measured at sf0.001: m=12 → 2 s,
    //    m=15 → 6 s, m=18 → 67 s — rt4's expanded query sets fell off
    //    that cliff). The array form keeps the tf vector as ONE column,
    //    per-term dfs as ONE array, per-query term positions as tiny
    //    index literals, and scores through a single aggregate/exists
    //    lambda pair per query — constant-size expressions at any m
    //    (flat 0.94 s at sf0.001 for m = 6..18). Both forms are
    //    hash-gated against the same DuckDB oracle.
    if (m <= 10)
      bm25Columnar(docs, idCol, textCol, queries, k, k1, b, allTerms, tc)
    else
      bm25ArrayForm(docs, idCol, textCol, queries, k, k1, b, allTerms, tc)
  }

  /** Shared stats row of both bm25 forms: N, total token mass, per-term
    * document frequencies — ONE scalar aggregation pass. NULL-text docs
    * are outside the document universe: the oracle derives n_docs from
    * tokenized docs (string_split(NULL) emits no rows), so an unfiltered
    * count(lit(1)) would inflate N/avgdl on any corpus holding null text
    * while the oracle's idf/avgdl ignore those rows. */
  private def bm25Stats(
      docs: DataFrame, textCol: String, allTerms: Seq[String],
      tc: Column): DataFrame = {
    def dfc(t: String) = s"__df_${allTerms.indexOf(t)}"
    val m = allTerms.size
    val statAggs = Seq(count(lit(1)).as("n_docs"),
      sum(element_at(col("__tc"), m + 1)).as("total_len")) ++
      allTerms.zipWithIndex.map { case (t, i) =>
        sum(when(element_at(col("__tc"), i + 1) > 0, 1L).otherwise(0L))
          .as(dfc(t))
      }
    docs.where(col(textCol).isNotNull)
      .select(tc.as("__tc")).agg(statAggs.head, statAggs.tail: _*)
  }

  /** Shared ranking tail of both bm25 forms: broadcast the stats row over
    * the hit-pruned per-doc frame, stack per-query (qid, score) structs,
    * bounded-heap top-k. */
  private def bm25StackAndRank(
      perDoc: DataFrame, one: DataFrame, perQ: Seq[Column],
      k: Int): DataFrame = {
    val stacked = perDoc
      .crossJoin(broadcast(one))
      .select(col("doc_id"), explode(array(perQ: _*)).as("qs"))
      .where(col("qs.score_micro").isNotNull)
      .select(col("qs.qid").as("qid"), col("doc_id"),
        col("qs.score_micro").as("score_micro"))
    graft.plans.TopKPerGroup(stacked, keys = Seq("qid"),
      orderBy = Seq(("score_micro", false), ("doc_id", true)), k = k)
  }

  /** Per-term tf column name shared by the columnar batch form and the
    * frozen serving form — ONE naming scheme, so the projections below
    * stay interchangeable. */
  private def bm25TfCol(allTerms: Seq[String], t: String): String =
    s"__tf_${allTerms.indexOf(t)}"

  /** Shared per-document projection of the columnar batch form AND the
    * frozen serving form: (doc_id, dl, per-term tf columns), pruned to
    * docs with >= 1 hit. ONE builder so the two forms cannot drift —
    * their bit-identity contract (RetrievalStreamSpec) is structural,
    * not merely spec-detected. */
  private def bm25PerDocColumnar(
      docs: DataFrame, idCol: String,
      allTerms: Seq[String], tc: Column): DataFrame = {
    val m = allTerms.size
    docs
      .select(col(idCol).as("doc_id"), tc.as("__tc"))
      .select(Seq(col("doc_id"),
        element_at(col("__tc"), m + 1).as("dl")) ++
        allTerms.zipWithIndex.map { case (t, i) =>
          element_at(col("__tc"), i + 1).as(bm25TfCol(allTerms, t))
        }: _*)
      .where(allTerms.map(t => col(bm25TfCol(allTerms, t)) > 0)
        .reduce(_ || _))
  }

  /** Shared Okapi term score: floor(idf_micro · tf·(k1+1)/(tf + k1·(1−b +
    * b·dl/avgdl))) as BIGINT. idf/avgdl arrive as Columns so the batch
    * form references the broadcast stats row and the frozen form injects
    * driver-side literals — the expression SHAPE (and so the float
    * operation order both oracles replay) is identical in both. */
  private def bm25TermScoreCol(
      tf: Column, idfMicro: Column, avgdl: Column,
      k1: Double, b: Double): Column = {
    val tfn = tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    floor(idfMicro * tfn).cast("long")
  }

  private def bm25Columnar(
      docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int, k1: Double, b: Double,
      allTerms: Seq[String], tc: Column): DataFrame = {
    def tfc(t: String) = bm25TfCol(allTerms, t)
    def dfc(t: String) = s"__df_${allTerms.indexOf(t)}"
    val perDoc = bm25PerDocColumnar(docs, idCol, allTerms, tc)
    val one = bm25Stats(docs, textCol, allTerms, tc)
    val avgdl = col("total_len").cast("double") / col("n_docs")
    def termScore(t: String): Column = {
      val idfMicro =
        floor(log((col("n_docs") - col(dfc(t)) + lit(0.5)) /
          (col(dfc(t)) + lit(0.5)) + lit(1.0)) * lit(1000000.0)).cast("long")
      bm25TermScoreCol(col(tfc(t)), idfMicro, avgdl, k1, b)
    }
    val perQ = queries.map { case (qid, terms) =>
      val ts = terms.distinct
      val score = ts.map(termScore).reduce(_ + _)
      val hasHit = ts.map(t => col(tfc(t)) > 0).reduce(_ || _)
      struct(lit(qid).as("qid"),
        when(hasHit, score).as("score_micro"))
    }
    bm25StackAndRank(perDoc, one, perQ, k)
  }

  private def bm25ArrayForm(
      docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int, k1: Double, b: Double,
      allTerms: Seq[String], tc: Column): DataFrame = {
    def dfc(t: String) = s"__df_${allTerms.indexOf(t)}"
    val m = allTerms.size
    val perDoc = docs
      .select(col(idCol).as("doc_id"), tc.as("__tc"))
      .where(expr(s"exists(slice(__tc, 1, $m), x -> x > 0)"))
      .select(col("doc_id"), col("__tc"),
        element_at(col("__tc"), m + 1).as("dl"))
    // the shared stats row, with the per-term dfs packed into ONE array
    // so downstream expressions stay O(1) in m
    val one = bm25Stats(docs, textCol, allTerms, tc)
      .select(col("n_docs"), col("total_len"),
        array(allTerms.map(t => col(dfc(t))): _*).as("__df"))
    // operation order mirrors the oracle SQL text exactly (left-assoc
    // IEEE +,*,/): idf_micro = floor(ln((N - df + 0.5)/(df + 0.5) + 1)*1e6);
    // a zero-tf term scores exactly 0 (floor(idf * 0)), so the per-query
    // fixed-order integer sum equals the oracle's present-terms-only sum
    def scoreExpr(idx: Seq[Int]): String = {
      val arr = idx.mkString("array(", ", ", ")")
      s"""aggregate($arr, CAST(0 AS BIGINT), (acc, i) -> acc +
         |  CAST(floor(
         |    CAST(floor(ln((n_docs - element_at(__df, i) + 0.5)
         |          / (element_at(__df, i) + 0.5) + 1.0) * 1000000.0) AS BIGINT)
         |    * (element_at(__tc, i) * ${k1 + 1.0}
         |       / (element_at(__tc, i) + $k1 * (${1.0 - b}
         |          + $b * dl / (CAST(total_len AS DOUBLE) / n_docs))))
         |  ) AS BIGINT))""".stripMargin
    }
    // per-query score = one aggregate lambda over the query's term
    // positions; a doc emits a (qid, score) element only when it contains
    // at least one of the query's terms (join-form semantics)
    val perQ = queries.map { case (qid, terms) =>
      val idx = terms.distinct.map(t => allTerms.indexOf(t) + 1)
      val arr = idx.mkString("array(", ", ", ")")
      struct(lit(qid).as("qid"),
        when(expr(s"exists($arr, i -> element_at(__tc, i) > 0)"),
          expr(scoreExpr(idx))).as("score_micro"))
    }
    bm25StackAndRank(perDoc, one, perQ, k)
  }

  /** rt4's SHARED corpus kernel: one `token_counts` pass materializes the
    * per-doc (term -> tf) map + token count, and BOTH BM25 passes of a
    * PRF pipeline read tfs from it by map lookup instead of re-running
    * the term-count kernel over the corpus strings. The map is exactly
    * `split(text, ' ')` frequencies (the token_term_counts contract, so
    * `element_at(map, term)` == the kernel's count for any term) and the
    * row count is non-null-text docs (token_counts(NULL) = NULL rows are
    * kept and filtered by the stats pass like the text column was).
    * Call `.localCheckpoint()` on the result before feeding two passes —
    * the two consumers prune different columns, which defeats exchange
    * reuse (the rt5/ap2 lesson). */
  def bm25DocTermCounts(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.token_counts(col(textCol)).as("__tcmap"))
      .withColumn("__dl", expr(
        "aggregate(map_values(__tcmap), CAST(0 AS BIGINT), (a, x) -> a + x)"))

  /** [[bm25TopK]] over a [[bm25DocTermCounts]] frame: identical scoring
    * expression shapes (the per-term tf vector is assembled from map
    * lookups instead of the byte-scan kernel; every downstream double op
    * is unchanged), so scores are bit-identical — only the corpus pass
    * differs. */
  def bm25TopKCounts(
      perDoc: DataFrame, queries: Seq[(Int, Seq[String])], k: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopKCounts needs at least one query")
    val allTerms = queries.flatMap(_._2).distinct
    val tc = array(allTerms.map(t =>
      coalesce(element_at(col("__tcmap"), lit(t)), lit(0L))) :+ col("__dl"): _*)
    // same m-dispatch as bm25TopK (the column form's optimizer blowup is
    // about expression shape, not where tfs come from)
    if (allTerms.size <= 10)
      bm25Columnar(perDoc, "doc_id", "__tcmap", queries, k, k1, b, allTerms, tc)
    else
      bm25ArrayForm(perDoc, "doc_id", "__tcmap", queries, k, k1, b, allTerms, tc)
  }

  /** The engine-exact expansion-selection tail shared by both prfExpand
    * variants: per-query top-`expK` non-original terms by integer tf sum
    * over the feedback docs, term tiebreaks. */
  private def prfSelect(
      spark: org.apache.spark.sql.SparkSession, fb: DataFrame, tc: DataFrame,
      queries: Seq[(Int, Seq[String])], expK: Int): Seq[(Int, Seq[String])] = {
    import org.apache.spark.sql.expressions.Window
    val orig = spark.createDataFrame(
      queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) })
      .toDF("qid", "term")
    val expw = fb.join(tc, "doc_id")
      .where(col("term") =!= "")
      .groupBy("qid", "term").agg(sum("tf").as("w"))
      .join(orig, Seq("qid", "term"), "left_anti")
    val wE = Window.partitionBy(col("qid"))
      .orderBy(col("w").desc, col("term"))
    val top = expw.withColumn("__r", row_number().over(wE))
      .where(col("__r") <= expK).select("qid", "term").collect()
    queries.map { case (q, ts) =>
      q -> (ts ++ top.filter(_.getInt(0) == q).map(_.getString(1))).distinct
    }
  }

  /** [[prfExpand]] over a shared [[bm25DocTermCounts]] frame: the
    * feedback pass ranks with [[bm25TopKCounts]] and term frequencies
    * explode straight from the materialized maps (broadcast-semi-join
    * pruned to the queries×fbK feedback docs) — no second kernel pass. */
  def prfExpandCounts(
      perDoc: DataFrame, queries: Seq[(Int, Seq[String])], fbK: Int = 10,
      expK: Int = 5, k1: Double = 1.2, b: Double = 0.75): Seq[(Int, Seq[String])] = {
    val spark = perDoc.sparkSession
    val fb = bm25TopKCounts(perDoc, queries, k = fbK, k1 = k1, b = b)
      .select(col("qid"), col("doc_id"))
      .localCheckpoint() // bounded (queries x fbK); consumed twice below
    val tc = perDoc
      .join(broadcast(fb.select(col("doc_id")).distinct()), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(col("__tcmap")).as(Seq("term", "tf")))
    prfSelect(spark, fb, tc, queries, expK)
  }

  /** Frozen BM25 index stats — the single broadcast-row model state of
    * [[bm25TopK]] collected to the driver: (N, total token mass, per-term
    * document frequency). This is the STORED index a serving/streaming
    * deployment scores against (build once over the indexed corpus, then
    * score arriving documents row-locally — the streaming twin in
    * `streaming/RetrievalStream` consumes it). */
  final case class Bm25Frozen(
      nDocs: Long, totalLen: Long, dfs: Map[String, Long])

  def bm25FrozenStats(
      docs: DataFrame, textCol: String,
      queries: Seq[(Int, Seq[String])]): Bm25Frozen = {
    val allTerms = queries.flatMap(_._2).distinct
    val tc = graft.functions.TextFunctions
      .token_term_counts(col(textCol), allTerms)
    val row = bm25Stats(docs, textCol, allTerms, tc).collect()(0)
    // an empty / all-null-text corpus leaves the sum() NULL — name the
    // contract instead of an opaque NPE from getLong on a null cell
    require(!row.isNullAt(1) && row.getLong(0) > 0,
      "bm25FrozenStats: corpus has no tokenizable documents " +
        "(empty input or all-null text) — nothing to index")
    Bm25Frozen(row.getLong(0), row.getLong(1),
      allTerms.zipWithIndex
        .map { case (t, i) => t -> row.getLong(2 + i) }.toMap)
  }

  /** Row-local BM25 scoring against FROZEN stats: (qid, doc_id,
    * score_micro) for every (query, hit-doc) pair — no aggregation, no
    * shuffle, so it runs identically on a batch frame or a streaming one
    * (the rt1 streaming twin's map stage). Arithmetic is bit-identical to
    * [[bm25TopK]]'s columnar form: idf_micro is precomputed here with the
    * same floor(ln(..)*1e6) on the same doubles, and the tf normalization
    * is the same IEEE expression tree (a batch/stream equality spec pins
    * it). */
  def bm25ScoreFrozen(
      docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], stats: Bm25Frozen,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25ScoreFrozen needs at least one query")
    val allTerms = queries.flatMap(_._2).distinct
    // serving drift guard: a query term absent from the frozen stats
    // means the index generation predates the query set — name the
    // contract instead of throwing a bare key-not-found from dfs(t)
    val missing = allTerms.filterNot(stats.dfs.contains)
    require(missing.isEmpty,
      s"frozen BM25 stats lack term(s) ${missing.mkString("[", ", ", "]")}" +
        " — rebuild the index (bm25FrozenStats) for the new query set")
    def tfc(t: String) = bm25TfCol(allTerms, t)
    val tc = graft.functions.TextFunctions
      .token_term_counts(col(textCol), allTerms)
    val perDoc = bm25PerDocColumnar(docs, idCol, allTerms, tc)
    val avgdl = stats.totalLen.toDouble / stats.nDocs
    def termScore(t: String): Column = {
      val df = stats.dfs(t)
      val idfMicro = math.floor(math.log(
        (stats.nDocs - df + 0.5) / (df + 0.5) + 1.0) * 1000000.0).toLong
      bm25TermScoreCol(col(tfc(t)), lit(idfMicro), lit(avgdl), k1, b)
    }
    val perQ = queries.map { case (qid, terms) =>
      val ts = terms.distinct
      val score = ts.map(termScore).reduce(_ + _)
      val hasHit = ts.map(t => col(tfc(t)) > 0).reduce(_ || _)
      struct(lit(qid).as("qid"), when(hasHit, score).as("score_micro"))
    }
    perDoc
      .select(col("doc_id"), explode(array(perQ: _*)).as("qs"))
      .where(col("qs.score_micro").isNotNull)
      .select(col("qs.qid").as("qid"), col("doc_id"),
        col("qs.score_micro").as("score_micro"))
  }

  /** Pseudo-relevance-feedback query expansion (Rocchio/RM-style PRF):
    * retrieve each query's top-`fbK` documents with [[bm25TopK]], then
    * expand the query with the `expK` highest-total-tf terms across
    * those feedback docs (original terms and the empty token excluded).
    * Selection is INTEGER tf sums with term tiebreaks — engine-exact.
    * Returns the expanded query defs; callers re-run [[bm25TopK]] over
    * them (rt4). The expansion table is bounded model state
    * (queries × expK terms — the centroid/BPE-merge collect pattern);
    * term frequency rides the doc-local token_counts kernel, so the
    * feedback pass adds no corpus shuffle beyond the semi-join. */
  def prfExpand(
      docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], fbK: Int = 10,
      expK: Int = 5, k1: Double = 1.2, b: Double = 0.75): Seq[(Int, Seq[String])] = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    // pass 1 must rank with the SAME k1/b the caller will score pass 2
    // with — defaults here would silently pick feedback docs under a
    // different model
    val fb = bm25TopK(docs, idCol, textCol, queries, k = fbK, k1 = k1, b = b)
      .select(col("qid"), col("doc_id"))
      .localCheckpoint() // bounded (queries x fbK); consumed twice below
    // tokenize ONLY the feedback docs: a broadcast semi-join prunes the
    // corpus BEFORE token_counts, so the expansion pass neither explodes
    // nor shuffles the full token stream (the unpruned spelling exploded
    // every document's tokens and then discarded all but queries x fbK
    // docs in the join)
    val fbDocs = docs.join(
      broadcast(fb.select(col("doc_id").as(idCol)).distinct()),
      Seq(idCol), "left_semi")
    val tc = fbDocs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.token_counts(col(textCol)))
        .as(Seq("term", "tf")))
    prfSelect(spark, fb, tc, queries, expK)
  }

  /** Hybrid retrieval fusion — Reciprocal Rank Fusion (Cormack, Clarke
    * & Buettcher, SIGIR'09) of a lexical (BM25) and a vector top-k list:
    * `rrf_micro = Σ_sides 1e6 DIV (rrfK + rank)` — the standard
    * production hybrid-search shape (sparse+dense). Integer arithmetic
    * end to end, so any engine reproduces the fused ranking exactly;
    * documents surfaced by only one side score with that side alone.
    *
    * Inputs are each side's ALREADY-BOUNDED per-query top lists
    * ((qid, doc_id, score_micro) from [[bm25TopK]]; (qid, vec_id, cos)
    * from `Similarity.bruteForceTopK` or any ANN variant) — so fusion
    * itself is a queries×kEach-row union + one tiny groupBy + a bounded
    * top-k: ALL corpus-scale work lives inside the side operators
    * (BM25's shuffle-free corpus pass, the ANN index). Ranks are
    * per-side row_numbers with doc-id tiebreaks, deterministic in any
    * engine. */
  def hybridRrf(
      bm25: DataFrame, vector: DataFrame, k: Int = 10,
      rrfK: Int = 60, kEach: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wb = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    val wv = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    // the per-side cutoff is enforced HERE, not assumed of the caller:
    // an input bounded differently from kEach would otherwise silently
    // shift single-side documents' contributions relative to the oracle's
    // `WHERE r <= kEach` (callers normally pre-bound to kEach, making the
    // filter a no-op — it exists for the unbounded/misbounded caller)
    def contrib(df: DataFrame, id: String,
        w: org.apache.spark.sql.expressions.WindowSpec) = df
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= kEach)
      .select(col("qid").cast("long").as("qid"),
        col(id).cast("long").as("doc_id"),
        expr(s"CAST(1000000 DIV ($rrfK + __r) AS BIGINT)").as("__c"))
    val fused = contrib(bm25, "doc_id", wb)
      .unionByName(contrib(vector, "vec_id", wv))
      .groupBy("qid", "doc_id").agg(sum(col("__c")).as("rrf_micro"))
    graft.plans.TopKPerGroup(fused, keys = Seq("qid"),
      orderBy = Seq(("rrf_micro", false), ("doc_id", true)), k = k)
  }

  /** DPR-style hard-negative mining (Karpukhin et al., EMNLP'20 — the
    * standard training-pair prep for dense retrievers): per query, the
    * POSITIVE is its nearest neighbour by embedding cosine, and the hard
    * negatives are the BM25 top hits that are lexically close but NOT the
    * positive (and not the query document itself) — exactly the
    * plausible-but-wrong candidates a contrastive loss needs.
    *
    * Inputs are the two side operators' outputs ([[bm25TopK]] rows
    * (qid, doc_id, score_micro) and `Similarity.bruteForceTopK(k = 1)`
    * rows (qid, vec_id, cos)); like [[hybridRrf]], every frame here is
    * queries×k bounded model state — the corpus-scale work lives in the
    * side operators, so the mining step itself is flat at any corpus
    * size. The per-query re-rank after exclusion is a row_number window
    * over that bounded frame (the rt3 precedent — never corpus-wide).
    *
    * Determinism: negatives rank by (score_micro DESC, doc_id); the
    * positive's score is its cosine quantized to 1e-6 integers (the
    * mmrRerank discipline), so any engine reproduces the pair set
    * bit-for-bit. Emits (qid, doc_id, role 'pos'|'neg', rnk [0 = pos,
    * 1..nNeg = negatives], score_micro [cos-micro for the positive,
    * BM25 micro-score for negatives]). */
  def hardNegatives(bm25: DataFrame, pos: DataFrame, nNeg: Int): DataFrame = {
    require(nNeg >= 1, s"nNeg must be >= 1, got $nNeg")
    import org.apache.spark.sql.expressions.Window
    // the positives frame is consumed twice (emitted rows + the exclusion
    // join) with DIFFERENT column pruning, which defeats exchange reuse
    // (the ap2/count() lesson) — without this the vector side's corpus
    // pass runs twice. It is queries×1 bounded, so materializing is free.
    val posM = pos.localCheckpoint()
    val p = posM.select(col("qid").cast("long").as("qid"),
      col("vec_id").cast("long").as("doc_id"),
      lit("pos").as("role"), lit(0L).as("rnk"),
      round(col("cos") * 1e6, 0).cast("long").as("score_micro"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    val n = bm25.select(col("qid").cast("long").as("qid"),
        col("doc_id").cast("long").as("doc_id"), col("score_micro"))
      .join(posM.select(col("qid").cast("long").as("qid"),
        col("vec_id").cast("long").as("__pos_doc")), Seq("qid"))
      .where(col("doc_id") =!= col("__pos_doc") &&
        col("doc_id") =!= col("qid"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= nNeg)
      .select(col("qid"), col("doc_id"), lit("neg").as("role"),
        col("rnk"), col("score_micro"))
    p.unionByName(n)
  }

  /** Deterministic overlapping character chunking — the RAG/long-context
    * pre-processing step that fans each document into fixed-size windows
    * with `chunkSize - stride` characters of overlap. Pure row-local
    * explode (sequence + substr): zero shuffles, linear in corpus bytes,
    * codegen'd end to end. Chunk count uses integer arithmetic only
    * (`(len - chunkSize + stride - 1) DIV stride + 1`), so any engine
    * reproduces the same windows byte-for-byte.
    *
    * Emits one row per chunk: (doc_id, chunk_idx, chunk_start [1-based],
    * chunk_len, chunk_md5, n_chunks). The md5 keeps downstream rows
    * narrow at 100 TB; consumers that need the text substr it back from
    * the source by (doc_id, chunk_start, chunk_len). */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 200, stride: Int = 150): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val len = length(col(textCol)).cast("long")
    val nChunks = when(len <= chunkSize, lit(1L))
      .otherwise(expr(s"(length($textCol) - $chunkSize + $stride - 1) DIV $stride") + lit(1L))
    docs
      .withColumn("n_chunks", nChunks)
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("chunk_start", col("chunk_idx") * stride + 1)
      .withColumn("__chunk", substr(col(textCol), col("chunk_start"), lit(chunkSize)))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        length(col("__chunk")).cast("long").as("chunk_len"),
        md5(col("__chunk")).as("chunk_md5"), col("n_chunks"))
  }
}
