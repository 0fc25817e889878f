package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable deduplication operators over arbitrary document DataFrames.
  * Same algorithms as the oracle-checked queries (PipelineQueries), exposed
  * as library functions: every step is a declarative plan a 1000-executor
  * cluster can run — explode-shaped shingling, partial-aggregable minhash
  * signatures, hash-joins on band signatures, pair-joins for verification.
  */
object Dedup {

  /** Exact dedup on a content hash: one row per distinct content with the
    * minimal id as keeper. Single shuffle on the hash. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("sig"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_docs"))

  /** Distinct word n-gram shingles per document: (id, shingle). Documents
    * are hash-repartitioned first — a small input file otherwise yields one
    * partition and the explode+hash work runs on a single core. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    shinglesRaw(docs, idCol, textCol, n).distinct()

  /** Shingles WITHOUT the per-document dedup (and its corpus-wide shuffle).
    * Correct wherever duplicates are harmless — minhash signatures take a
    * min, which duplicate shingles cannot change. `tagCol` (if set) rides
    * along as `__tag` — one small column on the exploded relation, so a
    * per-document attribute (e.g. mesh provenance) can flow through the
    * whole LSH chain instead of being re-joined onto the pair output. */
  private def shinglesRaw(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
      tagCol: Option[String] = None): DataFrame =
    Partitioning.fanOut(docs, idCol).select(
      col(idCol).as("__id") +: tagCol.map(t => col(t).as("__tag")).toSeq :+
        explode(graft.functions.TextFunctions.word_ngrams(col(textCol), n)).as("shingle"): _*)

  /** Largest prime below 2^31 — the permutation modulus. */
  val MinhashPrime: Long = graft.functions.MinhashSigs.P

  /** Affine-permutation constants for hash j: a_j odd and < 2^14 so that
    * a_j * h stays < 2^62 for a 48-bit base hash (no BIGINT overflow in
    * either Spark or DuckDB, which checks), b_j < 2^16. Canonical
    * definition lives with the native MinhashSigs expression. */
  def mhA(j: Int): Long = graft.functions.MinhashSigs.a(j)
  def mhB(j: Int): Long = graft.functions.MinhashSigs.b(j)

  /** MinHash signature columns mh0..mh{k-1} per id — one groupBy pass.
    *
    * One md5 per SHINGLE, k affine permutations of its leading 48 bits:
    * mh_j = min over shingles of (a_j * h + b_j) mod (2^31 - 1). The
    * one-hash + affine-family construction is the standard universal-
    * hashing minhash (Broder '97); computing k independent md5s per
    * shingle costs k× the digest work for no extra LSH power — measured
    * ~2× the whole dd2 chain at sf0.1. 48-bit h keeps base-hash
    * collisions negligible at corpus scale (~10^12 shingles ⇒ ~2^-9
    * per-pair collision odds), while a_j < 2^14 bounds a_j*h < 2^62. */
  def minhashSignatures(sh: DataFrame, k: Int = 12, fastHash: Boolean = false): DataFrame = {
    // md5 is the cross-engine-reproducible choice (the DuckDB oracles
    // re-derive it); fastHash swaps the base hash for xxhash64's low 48
    // bits — cheaper per digest, same LSH power, for production runs that
    // don't need engine-portable hashes (cf. dc1's hashed-gram option).
    // Measured at sf0.1 the signature stage is shuffle-bound and the two
    // time ~equal; the digest saving matters where hashing dominates
    // (long documents, many shingles per core). Downstream banding/
    // verification is identical; exact verification makes precision
    // independent of the hash family.
    // md5_48 = the Md5Prefix48 native expression, value-identical to the
    // conv(substring(md5)) SQL spelling the oracles use, ~3x cheaper
    val base: Column =
      if (fastHash) expr("xxhash64(shingle) & 281474976710655")
      else graft.functions.HashFunctions.md5_48(col("shingle"))
    // a `__tag` column (from shinglesRaw's tagCol) is functionally dependent
    // on __id, so grouping by both keeps cardinality and carries it through
    val keys =
      if (sh.columns.contains("__tag")) Seq(col("__id"), col("__tag"))
      else Seq(col("__id"))
    sh.select(keys :+ base.as("__h"): _*)
      .groupBy(keys: _*)
      .agg(
        min((col("__h") * lit(mhA(0)) + lit(mhB(0))) % lit(MinhashPrime)).as("mh0"),
        (1 until k).map(j =>
          min((col("__h") * lit(mhA(j)) + lit(mhB(j))) % lit(MinhashPrime)).as(s"mh$j")): _*)
  }

  /** LSH band signatures: (id, band, bsig) — b bands of r signature rows.
    * mh values are BIGINTs; ':'-separated decimal rendering keeps the
    * digest input unambiguous and engine-identical. */
  def bandSignatures(sigs: DataFrame, bands: Int = 4, rows: Int = 3): DataFrame = {
    val bandCol = (b: Int) =>
      md5(concat_ws(":", lit(b.toString) +:
        (0 until rows).map(r => col(s"mh${b * rows + r}").cast("string")): _*))
    val carry =
      if (sigs.columns.contains("__tag")) Seq(col("__id"), col("__tag"))
      else Seq(col("__id"))
    sigs.select(carry :+
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), bandCol(b).as("bsig"))): _*)).as("bb"): _*)
      .select(carry :+ col("bb.band") :+ col("bb.bsig"): _*)
  }

  /** Candidate pairs sharing any band signature (da < db), generated by
    * grouping the band index into (band, bsig) buckets and exploding each
    * bucket's in-bucket pair combinations — ONE shuffle of the band index,
    * versus two for the equivalent self-join (which shuffles both sides),
    * and no materialization barrier since nothing is consumed twice.
    * Per-bucket work is quadratic in bucket size exactly like the
    * self-join (the same key lands on the same task either way); LSH
    * bucket sizes are small by construction. A `__tag` column on the index
    * comes out per side as (tag_a, tag_b). Output set is identical to
    * [[lshCandidates]] (DedupSpec asserts equality).
    *
    * `maxBucketSize` is the degenerate-signature valve for production
    * corpora: a band bucket orders of magnitude larger than any plausible
    * near-dup cluster means a pathological signature (boilerplate/empty
    * docs that exact dedup should have removed first), and its s² pair
    * work would dominate the job from one task. Capped buckets are SKIPPED
    * entirely — deliberately trading recall on exact-dup-like mega-groups
    * (which dd1 catches at 1/s² the cost) for bounded per-task work. */
  def lshCandidatesGrouped(
      bands: DataFrame, maxBucketSize: Option[Int] = None): DataFrame = {
    val hasTag = bands.columns.contains("__tag")
    val member =
      if (hasTag) struct(col("__id"), col("__tag")) else struct(col("__id"))
    // struct ordering compares fields left-to-right, so the sort is by id;
    // pairs (i < j) over the sorted array give each unordered pair once
    // with da < db already normalized
    val buckets = bands.groupBy(col("band"), col("bsig"))
      .agg(array_sort(collect_list(member)).as("__ms"))
      .where(size(col("__ms")) > 1 &&
        maxBucketSize.map(size(col("__ms")) <= _).getOrElse(lit(true)))
    val pairs = buckets.select(explode(expr(
      """flatten(transform(__ms, (x, i) ->
        |  transform(slice(__ms, i + 2, size(__ms) - i - 1),
        |    y -> struct(x AS pa, y AS pb))))""".stripMargin)).as("p"))
    val tags =
      if (hasTag)
        Seq(col("p.pa.__tag").as("tag_a"), col("p.pb.__tag").as("tag_b"))
      else Seq.empty[Column]
    pairs
      .select(col("p.pa.__id").as("da") +: col("p.pb.__id").as("db") +: tags: _*)
      .distinct()
  }

  /** Candidate pairs sharing any band signature (da < db) via band-index
    * self-join. Prefer [[lshCandidatesGrouped]] (one shuffle instead of
    * two, no need to materialize the index); this form remains for callers
    * that already hold a materialized index on both sides. A `__tag` column
    * on the index comes out per side as (tag_a, tag_b). */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.as("a"); val b = bands.as("b")
    val tags =
      if (bands.columns.contains("__tag"))
        Seq(col("a.__tag").as("tag_a"), col("b.__tag").as("tag_b"))
      else Seq.empty[Column]
    a.join(b,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("da") +: col("b.__id").as("db") +: tags: _*)
      .distinct()
  }

  /** Exact Jaccard over exploded (id, shingle) rows for the given candidate
    * pairs, filtered at `threshold`. Adapter over [[jaccardVerifySets]]. */
  def jaccardVerify(sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame =
    jaccardVerifySets(
      sh.groupBy(col("__id")).agg(collect_set(col("shingle")).as("__sh")),
      cand, threshold)

  /** Exact Jaccard for candidate pairs over per-doc shingle-SET arrays
    * (`__id`, `__sh`): two id-equality joins bring both sets onto the pair
    * row, then intersection/union sizes are row-local array ops. Each
    * array is bounded by its document's length — the same bound as the
    * text column itself — so this carries no more per-row weight than the
    * corpus scan, while replacing the shingle-equality shuffle join (and
    * the three-way reuse of the exploded shingle relation) with one
    * aggregation and two hash joins. */
  def jaccardVerifySets(
      shSets: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    // columns beyond the pair ids (e.g. lshCandidates' tag_a/tag_b) pass
    // through to the verified output
    val extras = cand.columns.filterNot(Set("da", "db")).toSeq.map(col)
    cand
      .join(shSets.as("sa"), col("sa.__id") === col("da"))
      .join(shSets.as("sb"), col("sb.__id") === col("db"))
      .select(Seq(col("da").as("doc_a"), col("db").as("doc_b")) ++ extras ++ Seq(
        size(array_intersect(col("sa.__sh"), col("sb.__sh"))).as("__i"),
        size(col("sa.__sh")).as("__na"), size(col("sb.__sh")).as("__nb")): _*)
      .select(Seq(col("doc_a"), col("doc_b")) ++ extras :+
        (col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")))
          .as("jaccard"): _*)
      .where(col("jaccard") >= threshold)
  }

  /** MinHash+LSH near-duplicate pairs end-to-end, FUSED single-shuffle
    * form: shingle set, minhash signature, and band digests are all
    * row-local array expressions (no per-shingle explode, no per-doc
    * groupBy), the ONE corpus shuffle is the (band, bsig) bucket groupBy —
    * which carries each document's shingle set into the bucket row — and
    * exact-Jaccard verification is row-local array arithmetic on the
    * in-bucket pairs. Candidate generation and verification run in the
    * SAME job: no materialization barrier, no second pass over the corpus.
    *
    * Shuffle volume is `bands` copies of the corpus's distinct-shingle
    * sets. When near-dup rates are low and the corpus is huge, the staged
    * form ([[minhashLshPairsStaged]]) — which shuffles only the slim band
    * index and re-reads text for just the candidate documents — moves
    * fewer bytes; the fused form wins wherever per-job overhead or the
    * extra corpus passes dominate, and is the default.
    */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, threshold: Double = 0.8,
      fastHash: Boolean = false, tagCol: Option[String] = None,
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    val tagged = tagCol.isDefined
    val tagSel = if (tagged) Seq(col("__tag")) else Seq.empty[Column]
    // row-local shingle SET (array_distinct before anything explodes) —
    // exactly the set the staged form aggregates with collect_set. The
    // fan-out sits UNDER the projection (docs first, shingling after) so
    // the heavy text work runs cluster-wide even over a one-split file;
    // docs with no shingles are dropped at the band explode below rather
    // than by a filter here — a filter on __sh would be predicate-pushed
    // beneath the exchange, cloning the shingling into the narrow scan
    // stage.
    val base = Partitioning.fanOut(docs, idCol).select(
      col(idCol).as("__id") +: tagCol.map(t => col(t).as("__tag")).toSeq :+
        array_distinct(
          graft.functions.TextFunctions.word_ngrams(col(textCol), 3)).as("__sh"): _*)
    // one base hash per shingle, k cheap affine min-passes — the same
    // one-digest universal-hash family as minhashSignatures. The md5
    // family runs on the native one-pass MinhashSigs expression (the
    // lambda spelling is interpreted and allocation-bound — it scaled
    // NEGATIVELY with local parallelism); fastHash keeps the lambda
    // spelling since xxhash64 is only reachable as a SQL function.
    graft.functions.HashFunctions.register(docs.sparkSession)
    val sigs =
      if (fastHash) {
        val hs = base.withColumn("__hs",
          expr("transform(__sh, s -> xxhash64(s) & 281474976710655)"))
        hs.select(Seq(col("__id")) ++ tagSel ++ Seq(col("__sh"),
          array((0 until k).map(j => array_min(expr(
            s"transform(__hs, h -> (h * ${mhA(j)} + ${mhB(j)}) % $MinhashPrime)"))): _*)
            .as("__mh")): _*)
      } else base.select(Seq(col("__id")) ++ tagSel ++ Seq(col("__sh"),
        graft.functions.HashFunctions.minhash_sigs(col("__sh"), k).as("__mh")): _*)
    val bandCol = (b: Int) =>
      md5(concat_ws(":", lit(b.toString) +:
        (0 until rows).map(r =>
          element_at(col("__mh"), b * rows + r + 1).cast("string")): _*))
    // the when-guard drops zero-shingle docs (explode of NULL emits no
    // rows) — same vanishing as the staged form's aggregation, without a
    // pushable predicate that would drag shingling below the exchange
    val banded = sigs.select(Seq(col("__id")) ++ tagSel ++ Seq(col("__sh")) :+
        explode(when(size(col("__sh")) > 0,
          array((0 until bands).map(b =>
            struct(lit(b).as("band"), bandCol(b).as("bsig"))): _*))).as("bb"): _*)
      .select(Seq(col("__id")) ++ tagSel ++
        Seq(col("__sh"), col("bb.band"), col("bb.bsig")): _*)
    // struct ordering compares fields left-to-right, so the sort is by id
    // (ids are unique within a bucket — each doc contributes a band once)
    val member = struct(Seq(col("__id")) ++ tagSel :+ col("__sh"): _*)
    val buckets = banded.groupBy(col("band"), col("bsig"))
      .agg(array_sort(collect_list(member)).as("__ms"))
      .where(size(col("__ms")) > 1 &&
        maxBucketSize.map(size(col("__ms")) <= _).getOrElse(lit(true)))
    val pairStructs = buckets.select(explode(expr(
      """flatten(transform(__ms, (x, i) ->
        |  transform(slice(__ms, i + 2, size(__ms) - i - 1),
        |    y -> struct(x AS pa, y AS pb))))""".stripMargin)).as("p"))
    val tagOut =
      if (tagged) Seq(col("p.pa.__tag").as("tag_a"), col("p.pb.__tag").as("tag_b"))
      else Seq.empty[Column]
    val tagNames = if (tagged) Seq(col("tag_a"), col("tag_b")) else Seq.empty[Column]
    // a pair surfaces once per shared bucket; jaccard is a pure function of
    // the pair, so the post-filter distinct collapses the copies (the
    // staged form dedupes candidates pre-verify — same output set, and the
    // distinct here shuffles only VERIFIED pairs)
    pairStructs
      .select(Seq(col("p.pa.__id").as("doc_a"), col("p.pb.__id").as("doc_b")) ++
        tagOut ++ Seq(
          size(array_intersect(col("p.pa.__sh"), col("p.pb.__sh"))).as("__i"),
          size(col("p.pa.__sh")).as("__na"), size(col("p.pb.__sh")).as("__nb")): _*)
      .select(Seq(col("doc_a"), col("doc_b")) ++ tagNames :+
        (col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")))
          .as("jaccard"): _*)
      .where(col("jaccard") >= threshold)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash+LSH near-duplicate pairs, STAGED two-phase form: signature
    * derivation streams the RAW (duplicate-bearing) shingle explosion
    * straight into the per-document partial aggregation — min is
    * duplicate-insensitive, so the corpus-wide `distinct` shuffle (and the
    * full-corpus shingle cache it fed) is unnecessary. Shingle SETS are
    * aggregated only for the candidate documents the verification
    * actually touches, and consumed once (no intermediate cache).
    *
    * Same output as [[minhashLshPairs]] (DedupSpec asserts equality).
    * Prefer this form when the corpus is huge relative to its near-dup
    * rate: the only corpus-wide shuffle is the slim (id, band, bsig)
    * index, at the price of a candidate-id materialization barrier and a
    * second corpus scan for verification.
    */
  def minhashLshPairsStaged(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, threshold: Double = 0.8,
      fastHash: Boolean = false, tagCol: Option[String] = None): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    // grouped candidate generation consumes the band index exactly once
    // (groupBy buckets → in-bucket pair explosion), so the shingle+minhash
    // chain needs no materialization barrier and the index is shuffled
    // once — the self-join form shuffled it twice and forced an eager
    // checkpoint to avoid running the chain once per side. `tagCol` (a
    // per-document attribute, e.g. mesh provenance) rides the chain as
    // `__tag` and emerges as (tag_a, tag_b) on each pair — no post-hoc
    // re-join against the corpus.
    val bandIdx = bandIndexRowLocal(docs, idCol, textCol, k, bands, fastHash, tagCol)
    // candidates are tiny (pair ids only) and consumed twice: the id
    // broadcast below and the verification join. EAGER checkpoint, on
    // purpose: with a lazy one the broadcast build and the verify join
    // race to materialize it and can each recompute the band-index
    // aggregation (measured slower); eager guarantees the chain runs once
    // before either consumer plans
    val cand = lshCandidatesGrouped(bandIdx).localCheckpoint()
    // verification touches only the candidate docs' shingles: semi-filter
    // the documents by the (tiny, broadcast) candidate id list and
    // re-shingle just those — at scale this is the difference between
    // shuffling the whole corpus's shingles and shuffling ~|candidates| docs
    val candIds = cand.select(col("da").as("__cid"))
      .union(cand.select(col("db").as("__cid"))).distinct()
    val candDocs = docs.join(
      broadcast(candIds), col(idCol) === col("__cid"), "left_semi")
    val shSets = shinglesRaw(candDocs, idCol, textCol)
      .groupBy(col("__id")).agg(collect_set(col("shingle")).as("__sh"))
    // NOT checkpointed: every intermediate above is consumed exactly once,
    // so the caller's first action computes the verify tail in ONE job
    // (a trailing checkpoint would spend a whole extra job materializing
    // the tiny pair list). Callers that consume the output repeatedly
    // cache it themselves (dd7's pair index does).
    jaccardVerifySets(shSets, cand, threshold)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Passage-level exact dedup (library form of pd1 — the CCNet/RefinedWeb
    * paragraph-dedup shape on fixed `window`-word passages): drop every
    * passage seen in more than `maxDocs` distinct documents, reassemble
    * the survivors in order. Returns (doc_id, n_passages, n_dup_passages,
    * cleaned_text). One corpus-wide state: the passage-frequency table,
    * partitioned by passage hash. */
  def passageDedup(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 10, maxDocs: Int = 1): DataFrame = {
    val seg = docs.select(col(idCol).as("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, CAST((size(split($textCol, ' ')) - 1) div $window AS INT)),
           |  i -> concat_ws(' ', slice(split($textCol, ' '), i * $window + 1, $window)))"""
          .stripMargin)).as(Seq("seg_idx", "passage")))
    val freq = seg.groupBy(md5(col("passage")).as("ph"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    seg.join(freq, md5(col("passage")) === col("ph"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(col("nd") > maxDocs, 1L).otherwise(0L)).as("n_dup_passages"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("nd") <= maxDocs, struct(col("seg_idx"), col("passage"))))),
          x => x.getField("passage"))).as("cleaned_text"))
  }

  /** Identifies the signature scheme a band index was built with. Bumped
    * whenever the signature derivation changes incompatibly (v2 = one-md5 /
    * xxhash64 48-bit base hash + affine permutation family + ':'-joined
    * band digests; v1 was the retired per-permutation-md5 scheme).
    * Signatures from different schemes never collide, so an unversioned
    * mismatch would silently find zero candidates — hence the stamp. */
  def hashFamily(fastHash: Boolean): String =
    if (fastHash) "xxh48-affine-v2" else "md5-48-affine-v2"

  /** The reusable LSH band index for a corpus: (id, band, bsig,
    * hash_family). In production this is stored state, written once per
    * corpus build and appended at each ingest — the input to
    * [[incrementalNearDupPairs]], which refuses an index whose
    * `hash_family` stamp does not match its own parameters. */
  def bandIndex(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, fastHash: Boolean = false): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    bandIndexRowLocal(docs, idCol, textCol, k, bands, fastHash, tagCol = None)
      .withColumn("hash_family", lit(hashFamily(fastHash)))
  }

  /** The slim (id[, __tag], band, bsig) band index computed ROW-LOCALLY:
    * one projection from text to k minhash minima (min over the raw
    * multiset == min over the distinct set, so there is no distinct, no
    * per-shingle explode, and no per-doc aggregation — the corpus's only
    * shuffle stays the consumer's bucket groupBy). The md5 family runs on
    * the native one-pass [[graft.functions.MinhashSigs]]; values are
    * identical to the exploded minhashSignatures spelling (DedupSpec's
    * staged ≡ fused assertion covers the whole chain). Zero-shingle docs
    * drop at the when-guarded band explode — a filter here would be
    * predicate-pushed beneath the fan-out exchange, dragging the whole
    * signature projection into the narrow scan stage. */
  private def bandIndexRowLocal(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, fastHash: Boolean,
      tagCol: Option[String]): DataFrame = {
    val rows = k / bands
    val tagSel = tagCol.map(_ => col("__tag")).toSeq
    graft.functions.HashFunctions.register(docs.sparkSession)
    val grams = graft.functions.TextFunctions.word_ngrams(col(textCol), 3)
    val mh =
      if (fastHash) {
        val hs = transform(grams,
          s => xxhash64(s).bitwiseAND(lit(281474976710655L)))
        array((0 until k).map(j => array_min(transform(hs,
          h => (h * lit(mhA(j)) + lit(mhB(j))) % lit(MinhashPrime)))): _*)
      } else graft.functions.HashFunctions.minhash_sigs(grams, k)
    val sigs = Partitioning.fanOut(docs, idCol).select(
      col(idCol).as("__id") +: tagCol.map(t => col(t).as("__tag")).toSeq :+
        mh.as("__mh"): _*)
    val bandCol = (b: Int) =>
      md5(concat_ws(":", lit(b.toString) +:
        (0 until rows).map(r =>
          element_at(col("__mh"), b * rows + r + 1).cast("string")): _*))
    sigs.select(Seq(col("__id")) ++ tagSel :+
        explode(when(element_at(col("__mh"), 1).isNotNull,
          array((0 until bands).map(b =>
            struct(lit(b).as("band"), bandCol(b).as("bsig"))): _*))).as("bb"): _*)
      .select(Seq(col("__id")) ++ tagSel :+ col("bb.band") :+ col("bb.bsig"): _*)
  }

  /** Incremental ingest dedup: near-dup pairs between a NEW batch and an
    * already-indexed corpus (plus batch-internal pairs) — the production
    * shape where the corpus's band index is stored state and ONLY the
    * batch is shingled/hashed at ingest time. Corpus-vs-corpus pairs were
    * found when the corpus was built and are not recomputed. Candidate
    * verification reads original text for just the candidate docs (both
    * sides). Batch and corpus ids must be disjoint. */
  def incrementalNearDupPairs(
      batch: DataFrame, corpus: DataFrame, index: DataFrame,
      idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, threshold: Double = 0.8,
      fastHash: Boolean = false): DataFrame = {
    // the stored index MUST carry the signature scheme it was built with:
    // signatures from different schemes never collide, so a silent mismatch
    // (wrong fastHash, or an index predating a scheme change) would find
    // zero candidates with no error. Fail loudly instead. The probe reads
    // one row, not the index (the stamp is constant per index).
    require(index.columns.contains("hash_family"),
      "stored band index has no hash_family column — built by a pre-versioning " +
        "Dedup.bandIndex; rebuild it (signature schemes are not cross-compatible)")
    val expectedFamily = hashFamily(fastHash)
    index.select(col("hash_family")).head(1).foreach { r =>
      val got = r.getString(0)
      require(got == expectedFamily,
        s"stored band index was built with hash family '$got' but this ingest " +
          s"uses '$expectedFamily' — signatures never collide across families; " +
          "rebuild the index or pass the matching fastHash")
    }
    // eager localCheckpoint: the batch's band index feeds BOTH sides of the
    // candidate join (directly and through the union), and a lazy plan
    // would shingle+hash the batch once per side; blocks are
    // ContextCleaner-managed, so no unpersist bookkeeping
    val bi = bandIndex(batch, idCol, textCol, k, bands, fastHash)
      .select(col("__id"), col("band"), col("bsig")).localCheckpoint()
    // candidates: batch vs (stored index ∪ batch); normalize pair order
    val all = index.select(col("__id"), col("band"), col("bsig")).union(bi)
    val cand = bi.as("a").join(all.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.__id") =!= col("b.__id"))
      .select(least(col("a.__id"), col("b.__id")).as("da"),
        greatest(col("a.__id"), col("b.__id")).as("db"))
      .distinct()
      .localCheckpoint()
    val candIds = cand.select(col("da").as("__cid"))
      .union(cand.select(col("db").as("__cid"))).distinct()
    val allDocs = corpus.select(col(idCol), col(textCol))
      .union(batch.select(col(idCol), col(textCol)))
    val candDocs = allDocs.join(
      broadcast(candIds), col(idCol) === col("__cid"), "left_semi")
    val shSets = shinglesRaw(candDocs, idCol, textCol)
      .groupBy(col("__id")).agg(collect_set(col("shingle")).as("__sh"))
    // NOT checkpointed (see minhashLshPairs): the ingest's consumer writes
    // or caches the verified pair list itself; intermediates above are
    // consumed once, so the first action runs the tail in one job
    jaccardVerifySets(shSets, cand, threshold)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Connected components over an undirected near-dup pair list — the
    * step that turns pairwise matches into dedup decisions (cluster id =
    * min doc id in the component; keep that doc, drop the rest).
    * Iterative one-hop min-label propagation: each round is one
    * edges⋈labels hash join + per-node min aggregation, so rounds =
    * component diameter (near-dup clusters are shallow; `maxIters` guards
    * pathological chains and the method THROWS rather than return
    * unconverged labels). No driver-side graph state — labels live as a
    * persisted DataFrame, the convergence check is an isEmpty probe. */
  def connectedComponents(
      pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
      maxIters: Int = 20): DataFrame = {
    // localCheckpoint (eager), NOT persist: persist caches the data but the
    // logical plan still nests per round, and Catalyst re-analyzes the
    // whole growing lineage on every action — iteration cost inflates even
    // on tiny label sets. Checkpointing truncates the lineage so each
    // round plans against a flat scan. (On a fault-tolerant production
    // run, swap for checkpoint(dir) — localCheckpoint trades lineage
    // recovery for speed.)
    val edges = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .union(pairs.select(col(bCol).cast("long").as("a"), col(aCol).cast("long").as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("node").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a").as("node")).agg(min(col("nl")).as("nbr"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next
        .join(labels.withColumnRenamed("label", "old"), "node")
        .where(col("label") < col("old")).isEmpty
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters iterations")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** SimHash near-dup pairs within `maxHamming` via block-combination
    * banding (the simhash-dedup design from Manku/Jain/Sarma, WWW'07
    * "Detecting Near-Duplicates for Web Crawling"): split the 64-bit simhash
    * into `blocks` equal blocks; a pair within hamming <= blocks-2 has at
    * least two entirely-clean blocks, so an equality hash-join on every
    * 2-block combination's concatenated value is an EXHAUSTIVE candidate
    * generator — no O(n^2) pass at scale. Join-key cardinality per
    * combination is 2^(2*width) (vs 2^width for single-block banding), so
    * candidates shrink from ~n^2/2^width per band to
    * ~C(blocks,2)*n^2/2^(2*width) total: the shape that survives a corpus
    * 10^6x larger. Verification is one xor+popcount per candidate. */
  def simhashPairs(
      sim: DataFrame, blocks: Int = 8, maxHamming: Int = 6,
      persistSignatures: Boolean = true): DataFrame = {
    require(maxHamming <= blocks - 2,
      "pigeonhole exhaustiveness needs maxHamming <= blocks - 2")
    require(64 % blocks == 0, "blocks must divide 64")
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val combos = for { i <- 0 until blocks; j <- (i + 1) until blocks } yield (i, j)
    // (doc_id, simhash) is 16 bytes/doc; caching it stops the whole upstream
    // signature computation (tokenize + md5 + 64 bit-sums) from running once
    // per self-join side — the explode below re-derives band keys from the
    // cached rows instead
    val simIn = if (persistSignatures)
      sim.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sim
    val banded = simIn.select(col("doc_id"), col("simhash"),
      explode(array(combos.zipWithIndex.map { case ((i, j), ci) =>
        struct(lit(ci).as("band"),
          expr(s"(shiftright(simhash, ${i * width}) & $mask) | " +
            s"shiftleft(shiftright(simhash, ${j * width}) & $mask, $width)").as("bv"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bv"))
    val a = banded.as("a"); val b = banded.as("b")
    // filter on hamming BEFORE deduplicating: a pair can appear once per
    // shared combination, but deduping the full candidate stream shuffles
    // the pre-filter join output — popcount first, then distinct survivors
    a.join(b,
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Incremental simhash ingest: near-dup pairs (hamming <= maxHamming)
    * between a NEW batch and an already-indexed corpus, plus batch-internal
    * pairs — the signature index is stored state ((doc_id, simhash): 16
    * bytes/doc), and ONLY the batch is tokenized/hashed at ingest. The
    * same 2-of-`blocks` combination banding as [[simhashPairs]] makes the
    * candidate join exhaustive; corpus-vs-corpus pairs are not recomputed.
    * Batch and corpus ids must be disjoint. */
  def incrementalSimhashPairs(
      batch: DataFrame, index: DataFrame, idCol: String, textCol: String,
      blocks: Int = 8, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= blocks - 2,
      "pigeonhole exhaustiveness needs maxHamming <= blocks - 2")
    require(64 % blocks == 0, "blocks must divide 64")
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val combos = for { i <- 0 until blocks; j <- (i + 1) until blocks } yield (i, j)
    def banded(sig: DataFrame) = sig.select(col("doc_id"), col("simhash"),
      explode(array(combos.zipWithIndex.map { case ((i, j), ci) =>
        struct(lit(ci).as("band"),
          expr(s"(shiftright(simhash, ${i * width}) & $mask) | " +
            s"shiftleft(shiftright(simhash, ${j * width}) & $mask, $width)").as("bv"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bv"))
    // only the batch pays signature derivation; the banded batch feeds both
    // sides (directly and unioned with the stored index), so materialize it
    val bsig = simhash(batch, idCol, textCol).localCheckpoint()
    val bb = banded(bsig)
    val all = banded(index.select(col("doc_id"), col("simhash"))).union(bb)
    bb.as("a").join(all.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash per document from md5 token hashes: bit b of a token's
    * contribution is bit (3 - b%4) of hex char (b div 4) of its md5 — the
    * top 64 bits of the digest, nibble-MSB-first (the low 32 bits coincide
    * with the former 32-bit variant). Computed WITHOUT a per-bit row
    * explosion: the two 32-bit halves are decoded once per token (`conv`)
    * and 64 codegen'd bit-count sums run in a single per-doc groupBy —
    * |tokens| aggregated rows vs |tokens|*64 in the naive explode shape.
    * Majority vote: bit b set iff 2*count_ones(b) > n_tokens. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = Partitioning.fanOut(docs, idCol).select(col(idCol).as("__id"),
      explode(split(col(textCol), " ")).as("token"))
    // native Md5Words: both 32-bit halves from ONE digest, no hex
    // rendering/conv parse — value-identical to the SQL spelling the
    // oracle replays (the two-expression form digested twice and
    // allocated three strings per half, GC-bound at 32 threads)
    val halves = tok
      .select(col("__id"),
        graft.functions.HashFunctions.md5_words(col("token")).as("__w"))
      .select(col("__id"),
        element_at(col("__w"), 1).as("h1"), element_at(col("__w"), 2).as("h2"))
    // hex char i holds bits (31-4i)..(28-4i) of its half, so logical bit b
    // (char b div 4, in-char bit 3 - b%4) is physical bit 31-b / 63-b
    val bitSums = (0 until 64).map { b =>
      val h = if (b < 32) s"shiftright(h1, ${31 - b})" else s"shiftright(h2, ${63 - b})"
      sum(expr(s"$h & 1")).as(s"s$b")
    }
    val agg = halves.groupBy(col("__id"))
      .agg(count(lit(1)).as("n"), bitSums: _*)
    val simExpr = (0 until 64)
      .map(b => when(col(s"s$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("__id").as("doc_id"), simExpr.as("simhash"))
  }

  /** Exact duplicated-SPAN diagnostic (substring-level dedup, the
    * Lee et al. 2021 "Deduplicating Training Data" shape): for every
    * document with at least `k` tokens, how many of its k-token sliding
    * windows also occur verbatim in some OTHER document, and what
    * per-mille fraction of its windows that is. Doc-level dedup (dd1-dd7)
    * misses partial copies — boilerplate headers, quoted passages,
    * licence blocks — which this surfaces for span-level excision.
    *
    * Scale shape: windows travel as md5 digests (16 bytes regardless of
    * k), so the shuffle key is fixed-width; one groupBy on the digest
    * (count-distinct-docs partial-aggregates), one hash join back, one
    * per-doc agg. Window count is linear in corpus tokens — the
    * declarative analogue of the suffix-array pass, trading its
    * O(n log n) construction for embarrassingly-parallel shuffles.
    * The per-mille fraction is integer arithmetic (engine-exact). */
  def duplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, k: Int = 15): DataFrame = {
    require(k > 0, s"span length must be positive, got $k")
    // the size(w) >= k gate must precede the explode: Spark's
    // sequence(0, negative) counts DOWN rather than returning empty
    val wins = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .where(expr(s"size(w) >= $k"))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, size(w) - $k)")).as("i"), col("w"))
      .select(col("doc_id"),
        md5(expr(s"array_join(slice(w, i + 1, $k), ' ')")).as("gh"))
    val dup = wins.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") > 1)
      .select("gh")
    wins.join(dup, Seq("gh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("dup_windows"))
      .join(wins.groupBy("doc_id").agg(count(lit(1)).as("n_windows")),
        Seq("doc_id"), "right")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
      .withColumn("dup_pm",
        expr("dup_windows * 1000 DIV n_windows").cast("long"))
  }
}
