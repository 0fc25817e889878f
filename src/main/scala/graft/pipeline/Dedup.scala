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
    docs.repartition(col(idCol)).select(col(idCol).as("__id"),
        split(col(textCol), " ").as("__w"))
      .select(col("__id"), explode(expr(
        s"transform(sequence(0, greatest(size(__w) - $n, 0)), i -> concat_ws(' ', slice(__w, i + 1, $n)))"))
        .as("shingle"))
      .distinct()

  /** MinHash signature columns mh0..mh{k-1} per id — one groupBy pass,
    * min(md5('j:' || shingle)) per permutation j. */
  def minhashSignatures(sh: DataFrame, k: Int = 12): DataFrame =
    sh.groupBy(col("__id"))
      .agg(
        min(md5(concat(lit("0:"), col("shingle")))).as("mh0"),
        (1 until k).map(j =>
          min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"mh$j")): _*)

  /** LSH band signatures: (id, band, bsig) — b bands of r signature rows. */
  def bandSignatures(sigs: DataFrame, bands: Int = 4, rows: Int = 3): DataFrame = {
    val bandCol = (b: Int) =>
      md5(concat(lit(s"$b:") +: (0 until rows).map(r => col(s"mh${b * rows + r}")): _*))
    sigs.select(col("__id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), bandCol(b).as("bsig"))): _*)).as("bb"))
      .select(col("__id"), col("bb.band"), col("bb.bsig"))
  }

  /** Candidate pairs sharing any band signature (da < db). */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("da"), col("b.__id").as("db"))
      .distinct()
  }

  /** Exact Jaccard over shingle sets for the given candidate pairs,
    * filtered at `threshold`. */
  def jaccardVerify(sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val cnt = sh.groupBy(col("__id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("s1"), col("s1.__id") === col("da"))
      .join(sh.as("s2"),
        col("s2.__id") === col("db") && col("s2.shingle") === col("s1.shingle"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    inter
      .join(cnt.as("ca"), col("ca.__id") === col("da"))
      .join(cnt.as("cb"), col("cb.__id") === col("db"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        (col("i").cast("double") / (col("ca.n") + col("cb.n") - col("i"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash+LSH near-duplicate pairs end-to-end.
    *
    * @param persistShingles cache the exploded shingle set — it is consumed
    *   four times (signatures, both sides of the verification join, counts)
    *   and Catalyst inlines CTEs, so without caching the explode runs 4x.
    */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, threshold: Double = 0.8,
      persistShingles: Boolean = true): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val sh0 = shingles(docs, idCol, textCol)
    val sh = if (persistShingles)
      sh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sh0
    // candidates are tiny but expensive to derive — persist so the id
    // broadcast below doesn't recompute the whole LSH chain
    val cand = lshCandidates(bandSignatures(minhashSignatures(sh, k), bands, k / bands))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // verification touches only the candidate docs' shingles: semi-filter
    // the shingle set by the (tiny, broadcast) candidate id list before the
    // pair-join — at scale this is the difference between shuffling the
    // whole corpus's shingles three times and shuffling ~|candidates| docs
    val candIds = cand.select(col("da").as("__id"))
      .union(cand.select(col("db").as("__id"))).distinct()
    val shCand = sh.join(broadcast(candIds), Seq("__id"), "left_semi")
    jaccardVerify(shCand, cand, threshold)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup pairs within `maxHamming` via pigeonhole banding:
    * split the 32-bit simhash into `bands` equal bands; any pair with
    * hamming <= bands-1 must share at least one band, so a band-equality
    * hash-join is an EXHAUSTIVE candidate generator for small distances —
    * no O(n^2) pass at scale. Verification is one xor+popcount per
    * candidate. */
  def simhashPairs(
      sim: DataFrame, bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < bands, "pigeonhole exhaustiveness needs maxHamming < bands")
    val width = 32 / bands
    val banded = sim.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          expr(s"shiftright(simhash, ${b * width}) & ${(1 << width) - 1}").as("bv"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bv"))
    val a = banded.as("a"); val b = banded.as("b")
    // filter on hamming BEFORE deduplicating: a pair can appear once per
    // shared band, but deduping the full candidate stream shuffles the
    // pre-filter join output — popcount first, then distinct the survivors
    a.join(b,
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash per document from md5 token hashes. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.repartition(col(idCol)).select(col(idCol).as("__id"),
      explode(split(col(textCol), " ")).as("token"))
    val th = tok.withColumn("h8", substring(md5(col("token")), 1, 8))
    val bits = th
      .select(col("__id"), col("h8"), explode(expr("sequence(0, 31)")).as("b"))
      .withColumn("bit", expr(
        "shiftright(CAST(position(substring(h8, CAST(b div 4 AS INT) + 1, 1) IN '0123456789abcdef') AS INT) - 1, 3 - CAST(b % 4 AS INT)) % 2"))
      .groupBy(col("__id"), col("b"))
      .agg(sum(when(col("bit") === 1, 1).otherwise(-1)).as("s"))
    bits.groupBy(col("__id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
        .otherwise(lit(0L))).as("simhash"))
      .withColumnRenamed("__id", "doc_id")
  }
}
