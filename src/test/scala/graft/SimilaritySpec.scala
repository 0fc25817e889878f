package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.mesh.Fixtures
import graft.pipeline.Similarity

/** Learned-centroid IVF: spherical k-means improves cluster cohesion over
  * the raw seeds, and the probe-2 search keeps useful recall against the
  * exact brute-force baseline. */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark
  private def emb = {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    spark.table("embeddings")
  }
  private val seeds = 0L until 16L

  /** The raw seed vectors unit-normalized — the iteration-0 centroids
    * both cohesion tests compare against. */
  private def rawSeedCents: Seq[Seq[Double]] = {
    val v = Similarity.withNorm(emb, "vec_id", "embedding")
    v.where(col("__id").isin(seeds: _*)).orderBy(col("__id"))
      .collect().map { r =>
        val raw = r.getSeq[Float](1).map(_.toDouble)
        val n = math.sqrt(raw.map(x => x * x).sum)
        raw.map(_ / n).toSeq
      }.toSeq
  }

  /** Mean best-centroid cosine over the corpus — the spherical k-means
    * objective (higher = tighter cells). */
  private def cohesion(cents: Seq[Seq[Double]]): Double = {
    import graft.functions.VectorFunctions.{vec_dot => dot}
    Similarity.withNorm(emb, "vec_id", "embedding").where(col("nrm") > 0)
      .withColumn("best", array_max(array(cents.map(c =>
        dot(col("__v"), array(c.map(x => lit(x.toFloat)): _*))): _*)) / col("nrm"))
      .agg(avg(col("best"))).head.getDouble(0)
  }

  test("spherical k-means strictly improves cohesion over raw seeds") {
    val seedCents = rawSeedCents
    val learned = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 2)
    assert(learned.size == 16)
    // every learned centroid is unit-length
    learned.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    assert(cohesion(learned) > cohesion(seedCents))
  }

  test("learned-IVF top-k keeps recall against the brute-force baseline") {
    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val k = 5
    val cents = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 2)
    val approx = Similarity.ivfTopKLearned(
        emb, "vec_id", "embedding", queries, cents, k = k, nprobe = 2)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", queries, k = k)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every query returns a full k, and probing 2/16 cells of a
    // near-random corpus still recovers a usable share of the true top-k
    queries.foreach(q => assert(approx.count(_._1 == q) == k))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall@5 = $recall")
  }

  test("blocked (skew-valve) within-cluster pairing equals the unblocked path") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 0L until 16L)
    val plain = Similarity.semanticDedupSeeded(emb, "vec_id", "embedding", cents)
    // blockTarget far below cluster sizes forces real multi-block triangles
    val blocked = Similarity.semanticDedupSeeded(
      emb, "vec_id", "embedding", cents, blockTarget = Some(7))
    assert(plain.collect().toSeq == blocked.collect().toSeq)
    assert(plain.count() > 0)
  }

  test("learned-centroid semantic dedup: projection assignment, high pair recall") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val cents = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = 0L until 16L, iters = 2)
    val sd = Similarity.semanticDedupLearned(emb, "vec_id", "embedding", cents)
    // ground truth: every pair at cos >= threshold, regardless of cluster
    val v = Similarity.withNorm(emb, "vec_id", "embedding")
    val truth = v.as("a").join(v.as("b"), col("a.__id") < col("b.__id"))
      .select(col("b.__id").as("vec_id"),
        // same 6-decimal rounding as the operator, so the subset assertion
        // is exact at the threshold boundary
        round(graft.functions.VectorFunctions.vec_dot(col("a.__v"), col("b.__v"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .where(col("cos") >= 0.4)
      .select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSet
    val found = sd.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(truth.nonEmpty)
    // within-cluster cosine is computed exactly, so every reported drop is
    // a true near-dup (precision 1.0 by construction — verify it)
    assert(found.subsetOf(truth), s"false positives: ${found -- truth}")
    // recall is inherently partial: SemDeDup compares only within a cell,
    // and this corpus's near-dups are WEAK (no pair above cos 0.5 — near-
    // random geometry), the hardest case for co-location. The envelope
    // pins that learned cells still catch a usable share; production
    // tuning trades cell count vs recall.
    val recall = found.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.2, s"semantic-dedup recall = $recall")
    // the scale property: assignment is a projection — no window, no
    // cross join before the within-cluster pair join
    val plan = sd.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("targetK / lshBits scale index parameters with the corpus") {
    // k sits at the floor for small corpora, then grows linearly with n
    assert(Similarity.targetK(500, 256) == 16)
    assert(Similarity.targetK(2000, 256) == 16)
    assert(Similarity.targetK(20000, 256) == 79)
    assert(Similarity.targetK(1000000, 4096) == 245)
    // a 10x data step adds ~log2(10) bits, holding the EXPECTED bucket
    // population at/below the target; clamps at [4, 20]
    assert(Similarity.lshBits(500, 125) == 4)
    assert(Similarity.lshBits(2000, 125) == 4)
    assert(Similarity.lshBits(20000, 125) == 8)
    assert(Similarity.lshBits(200000, 125) == 11)
    assert(Similarity.lshBits(Long.MaxValue, 1) == 20)
    (Seq(1000L, 10000L, 100000L, 1000000L)).foreach { n =>
      assert(n.toDouble / (1L << Similarity.lshBits(n, 64)) <= 64.0 ||
        Similarity.lshBits(n, 64) == 20)
    }
  }

  test("scaled semantic dedup keeps the pair envelope linear across a 4x data step") {
    // pair work = Σ(cluster size)²; with k = targetK(n) the PER-ROW
    // envelope Σs²/n must stay bounded as n grows — with a FIXED k it
    // grows linearly in n (the measured sd1 sf1 pathology)
    def pairWork(df: org.apache.spark.sql.DataFrame, target: Int): (Long, Long, Long) = {
      val n = df.count()
      val k = Similarity.targetK(n, target)
      val cents = Similarity.sphericalKMeans(
        df, "vec_id", "embedding", seedIds = 0L until k.toLong, iters = 2)
      val sizes = Similarity.assignClusters(df, "vec_id", "embedding", cents)
        .groupBy(col("cid")).count().collect().map(_.getLong(1))
      (n, k.toLong, sizes.map(s => s * s).sum)
    }
    val small = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val target = 50
    val (n1, k1, w1) = pairWork(small, target) // n=500  -> k floor (16)
    val (n2, k2, w2) = pairWork(big, target)   // n=2000 -> k=40
    assert(k1 == 16 && k2 == 40)
    // absolute envelope: within a constant of the balanced-cluster ideal
    assert(w2 <= 8L * n2 * target, s"pair work $w2 vs bound ${8L * n2 * target}")
    // linearity: the per-row envelope must not scale with n (fixed k=16
    // would have quadrupled it: n2/16 = 125 vs n1/16 = 31 per row)
    assert(w2.toDouble / n2 <= 3.0 * (w1.toDouble / n1),
      s"per-row pair work grew ${w2.toDouble / n2} vs ${w1.toDouble / n1}")
  }

  test("scaled sign-LSH keeps bucket populations bounded") {
    val big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n = big.count()
    val target = 125
    val bits = Similarity.lshBits(n, target)
    val sizes = Similarity.signLshBuckets(big, "vec_id", "embedding", bits)
      .groupBy(col("bucket")).count().collect().map(_.getLong(1))
    assert(sizes.sum == n)
    // the expected population honors the target; correlated data clumps,
    // so the max gets a constant allowance
    assert(n.toDouble / (1L << bits) <= target.toDouble)
    assert(sizes.max <= 8L * target, s"max bucket ${sizes.max}")
  }

  test("int8-quantized ranking keeps high recall vs exact cosine top-5") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    graft.functions.VectorFunctions.register(spark)
    val quant = graft.pipeline.PipelineQueries
      .queries("ss4_quantized_topk")(spark, TestSessions.sfDir)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", Seq(0L, 1L, 2L, 3L, 4L), k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 symmetric quantization perturbs each coordinate by <0.5%, so
    // the quantized ordering nearly reproduces the exact one
    val recall = quant.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall@5 = $recall")
  }

  test("PQ/ADC with rerank keeps recall vs exact top-5; codes pack to one long") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val books = Similarity.pqTrain(emb, "vec_id", "embedding")
    assert(books.length == 8 && books.forall(_.length == 16) &&
      books.forall(_.forall(_.length == 8)))
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", queries, books)
    val got = pq.collect()
    // a full page per query, rerank column is the true cosine
    queries.foreach(q => assert(got.count(_.getLong(0) == q) == 5))
    val pqSet = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", queries, k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 32x-compressed codes + top-20 rerank still recover a usable share
    // of the true neighbours on a near-random corpus
    val recall = pqSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"pq recall@5 = $recall")
  }

  test("IVF+PQ composition returns full pages with usable recall") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val cents = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 2)
    val books = Similarity.pqTrain(emb, "vec_id", "embedding")
    val got = Similarity.ivfPqTopK(
        emb, "vec_id", "embedding", queries, cents, books, nprobe = 4)
      .collect()
    queries.foreach(q => assert(got.count(_.getLong(0) == q) == 5))
    val gotSet = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", queries, k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pruning to 4/16 cells THEN quantizing compounds both error sources;
    // the composition must still surface a share of the true top-5
    val recall = gotSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.15, s"ivfpq recall@5 = $recall")
  }

  test("broadcast-join centroid assignment equals the projection path, ties included") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val learned = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 1)
    // duplicate two centroids at higher cids to force EXACT score ties:
    // first-max-wins must resolve to the lower cid in both paths
    val cents = learned ++ Seq(learned.head, learned(3))
    val viaExpr = Similarity.assignClusters(emb, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val viaJoin = Similarity.assignClustersJoin(emb, "vec_id", "embedding",
        Similarity.centroidFrame(spark, cents))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(viaExpr.nonEmpty && viaExpr == viaJoin)
    // the duplicated centroids (cids 16, 17) can never win a tie
    assert(!viaJoin.values.exists(c => c == 16 || c == 17))
    // both original duplicates still receive members through their low cid
    assert(viaJoin.values.toSet.contains(0) && viaJoin.values.toSet.contains(3))
  }

  test("sample-trained k-means: rate=256 equals full training; sampled stays usable") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val full = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 2)
    // keep-all sampling delegates to full training (no filter at all —
    // even a null-id row cannot diverge); compared at epsilon because two
    // executions merge partial averages in shuffle-arrival order
    val all = Similarity.sphericalKMeansSampled(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 2, rate = 256)
    assert(all.size == full.size)
    all.zip(full).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
    // a 1/4 sample still learns unit centroids whose corpus-wide cohesion
    // beats the raw seeds (the quantizer-quality property that matters;
    // FAISS-style index builds train on samples of this order)
    val sampled = Similarity.sphericalKMeansSampled(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 2, rate = 64)
    assert(sampled.size == 16)
    sampled.foreach(c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9))
    assert(cohesion(sampled) > cohesion(rawSeedCents))
  }

  test("assignClustersJoin plans a broadcast join, never a cartesian product") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val learned = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 1)
    val df = Similarity.assignClustersJoin(emb, "vec_id", "embedding",
      Similarity.centroidFrame(spark, learned))
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // the centroid side must ride a broadcast (corpus never moves for the
    // scoring) and the heap's partial phase must appear before the final
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("TopKPerGroup".r.findAllIn(plan).size >= 2, plan)
  }

  test("table-state k-means equals the driver-Seq trainer at small k") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val full = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 2)
    // same seeds (k lowest ids), same Lloyd arithmetic — centroid state as
    // a DataFrame end to end; ε because two executions merge partial
    // averages in shuffle-arrival order
    val table = Similarity.sphericalKMeansTable(
        emb, "vec_id", "embedding", k = 16, iters = 2)
      .orderBy("cid").collect().map(_.getSeq[Double](1).toSeq)
    assert(table.length == full.size)
    table.zip(full).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("table-state SAMPLED training matches the Seq sampled trainer") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val seq = Similarity.sphericalKMeansSampled(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 2, rate = 64)
    val table = Similarity.sphericalKMeansTable(
        emb, "vec_id", "embedding", k = 16, iters = 2, rate = 64)
      .orderBy("cid").collect().map(_.getSeq[Double](1).toSeq)
    assert(table.length == seq.size)
    table.zip(seq).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("seed-centroid frame labels by seed id with no single-task window") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val seedFrame = Similarity.seedCentroidFrame(emb, "vec_id", "embedding", 16)
    // the round-13 form renumbered seeds with an unpartitioned
    // row_number() window — ONE task sorting all k centroid rows, the
    // last k-sized serialization point in the training path. The label
    // is now the seed id itself: no Window node of any kind may appear.
    val plan = seedFrame.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // labels = the k lowest distinct ids (not a dense 0..k-1 renumbering)
    val cids = seedFrame.select("cid").collect().map(_.getLong(0)).sorted.toSeq
    assert(cids == seeds.sorted.toSeq)
  }

  test("table-trained centroids serve through a parquet round-trip") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val cents = Similarity.sphericalKMeansTable(
      emb, "vec_id", "embedding", k = 16, iters = 1)
    val serving = Similarity.centroidServingFrame(cents)
    val dir = java.nio.file.Files.createTempDirectory("graft_tcents").toString
    serving.write.mode("overwrite").parquet(dir)
    val direct = Similarity.assignClustersJoin(emb, "vec_id", "embedding", serving)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val stored = Similarity.assignClustersJoin(
        emb, "vec_id", "embedding", spark.read.parquet(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(direct.nonEmpty && direct == stored)
  }

  test("semanticDedupScaled arms the skew valve by default, result unchanged") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    // the manual small-k composition WITHOUT the valve (pre-round-13
    // default): same seeds, same trainer, unblocked pair join
    val seeds16 = 0L until 16L
    val cents = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = seeds16, iters = 2)
    val unblocked = Similarity.semanticDedupLearned(
      emb, "vec_id", "embedding", cents)
    val byDefault = Similarity.semanticDedupScaled(emb, "vec_id", "embedding")
    assert(byDefault.collect().toSeq == unblocked.collect().toSeq)
    assert(byDefault.count() > 0)
  }

  test("assignClustersJoin serves from a STORED centroid table round-trip") {
    Fixtures.registerRaw(spark, TestSessions.sfDir)
    val learned = Similarity.sphericalKMeans(
      emb, "vec_id", "embedding", seedIds = seeds, iters = 1)
    // the production shape: the centroid frame is WRITTEN index state
    // (parquet preserves the float vectors bit-for-bit), read back and
    // served via the broadcast join — never driver/expression state
    val dir = java.nio.file.Files.createTempDirectory("graft_cents").toString
    Similarity.centroidFrame(spark, learned)
      .write.mode("overwrite").parquet(dir)
    val viaStored = Similarity.assignClustersJoin(
        emb, "vec_id", "embedding", spark.read.parquet(dir))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val viaExpr = Similarity.assignClusters(emb, "vec_id", "embedding", learned)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(viaStored.nonEmpty && viaStored == viaExpr)
  }
}
