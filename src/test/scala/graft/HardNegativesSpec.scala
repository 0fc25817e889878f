package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Similarity, TextAnalysis}

/** Guarantees for rt5's hard-negative mining (TextAnalysis.hardNegatives):
  * the pair-set contract a contrastive-training consumer relies on. */
class HardNegativesSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  // ids 1..3 are the "queries"; text is built so BM25 pools are known.
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "cat dog cat"),
      (2L, "cat mouse mouse"),
      (3L, "dog bird cat"),
      (4L, "cat cat dog dog"),
      (5L, "cat dog bird"),
      (6L, "tree rock sky")
    ).toDF("doc_id", "text")
  }

  // vectors arranged so query 1's nearest is 4, query 2's is 5, query 3's
  // is 4 (self is excluded by bruteForceTopK)
  private def emb = {
    import spark.implicits._
    Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.6f, 0f, 0.8f, 0f)),
      (4L, Array(0.9f, 0f, 0.1f, 0f)),
      (5L, Array(0.1f, 0.9f, 0f, 0f)),
      (6L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
  }

  private def mine(nNeg: Int = 3) = {
    val queries = Seq(1 -> Seq("cat", "dog"), 2 -> Seq("cat", "mouse"),
      3 -> Seq("dog", "bird"))
    val bm = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, k = 5)
    val pos = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryIds = Seq(1L, 2L, 3L), k = 1)
    TextAnalysis.hardNegatives(bm, pos, nNeg = nNeg)
  }

  test("one positive per query at rnk 0; it is the embedding top-1") {
    val rows = mine().collect()
    val pos = rows.filter(_.getString(2) == "pos")
    assert(pos.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 4L, 2L -> 5L, 3L -> 4L))
    assert(pos.forall(_.getLong(3) == 0L))
  }

  test("negatives exclude the positive and the query doc; ranks contiguous") {
    val rows = mine().collect()
    val posByQ = rows.filter(_.getString(2) == "pos")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val negs = rows.filter(_.getString(2) == "neg")
    negs.foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(1))
      assert(d != q, s"query doc $q leaked into its own negatives")
      assert(d != posByQ(q), s"positive $d leaked into negatives of $q")
    }
    // per query: ranks are 1..n with scores non-increasing in rank order
    negs.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getLong(4))
      assert(scores.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      })
    }
  }

  test("nNeg caps the negative count per query") {
    val rows = mine(nNeg = 1).collect()
    val byQ = rows.filter(_.getString(2) == "neg").groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 1))
  }

  test("positive score is the 1e-6-quantized cosine of the top-1 pair") {
    // query 1 vs doc 4: cos = 0.9 / (1 * sqrt(0.81 + 0.01)) — compute the
    // same float path the library takes (round to 6 dp, then micro-ints)
    val cos = BigDecimal(0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = math.round(cos * 1e6)
    val got = mine().collect()
      .filter(r => r.getString(2) == "pos" && r.getLong(0) == 1L)
      .head.getLong(4)
    assert(got == expect, s"got $got expect $expect")
  }
}
