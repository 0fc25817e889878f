package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Native WordNGrams expression: must equal the interpreted lambda form
  * (transform/sequence/slice/concat_ws) exactly on real documents and on
  * the edge shapes, and stay inside whole-stage codegen. */
class WordNGramsSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  private def lambdaForm(n: Int) = expr(
    s"""transform(sequence(0, greatest(size(split(text, ' ')) - $n, 0)),
       |  i -> concat_ws(' ', slice(split(text, ' '), i + 1, $n)))""".stripMargin)

  test("word_ngrams equals the lambda form on real documents for n=2,3,8") {
    TextFunctions.register(spark)
    val docs = spark.read.parquet(s"${TestSessions.sfDir}/documents.parquet")
    docs.createOrReplaceTempView("wng_docs")
    Seq(2, 3, 8).foreach { n =>
      val diff = docs
        .select(TextFunctions.word_ngrams(col("text"), n).as("fast"),
          lambdaForm(n).as("slow"))
        .where(!(col("fast") <=> col("slow")))
        .count()
      assert(diff == 0, s"n=$n")
    }
  }

  test("edges: short docs, single word, empty string, nulls") {
    TextFunctions.register(spark)
    import spark.implicits._
    val df = Seq("a b", "a", "", "a b c d").toDF("text")
    val got = df.select(TextFunctions.word_ngrams(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("a b"), List("a"), List(""), List("a b c", "b c d")))
    val nul = df.select(TextFunctions.word_ngrams(lit(null).cast("string"), 3).as("g")).head()
    assert(nul.isNullAt(0))
  }

  test("token_counts equals the explode+groupBy spelling on real documents") {
    TextFunctions.register(spark)
    val docs = spark.read.parquet(s"${TestSessions.sfDir}/documents.parquet")
    docs.createOrReplaceTempView("tc_docs")
    // the reference spelling tx8 used before the kernel: one row per
    // (doc, token) with the within-doc occurrence count
    val slow = spark.sql(
      """SELECT doc_id, token, count(*) AS tf FROM tc_docs
        |LATERAL VIEW explode(split(text, ' ')) t AS token
        |GROUP BY doc_id, token""".stripMargin)
    val fast = spark.sql(
      """SELECT doc_id, token, tf FROM tc_docs
        |LATERAL VIEW explode(token_counts(text)) t AS token, tf""".stripMargin)
    assert(fast.count() == slow.count())
    assert(fast.exceptAll(slow).count() == 0)
    assert(slow.exceptAll(fast).count() == 0)
  }

  test("token_counts edges: empty tokens kept, empty string, null") {
    TextFunctions.register(spark)
    import spark.implicits._
    // "a  b " splits to [a, "", b, ""] under split(text,' ') semantics
    val m = Seq("a  b ").toDF("text")
      .select(TextFunctions.token_counts(col("text")).as("m"))
      .head().getMap[String, Long](0)
    assert(m == Map("a" -> 1L, "" -> 2L, "b" -> 1L))
    val empty = Seq("").toDF("text")
      .select(TextFunctions.token_counts(col("text")).as("m"))
      .head().getMap[String, Long](0)
    assert(empty == Map("" -> 1L))
    val nul = Seq("x").toDF("text")
      .select(TextFunctions.token_counts(lit(null).cast("string")).as("m"))
      .head()
    assert(nul.isNullAt(0))
  }

  test("property: token_counts equals a from-scratch split-count on arbitrary unicode") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // pure-JVM property against an independent reference: Java split with
    // limit -1 on single spaces (the split(text, ' ') contract), counted
    // with a plain Scala groupBy — arbitrary unicode incl. multi-space
    // runs, leading/trailing spaces, empty strings
    val genStr = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', ' ', ':', 'é', '中', 'ß', '€')))
      .map(_.mkString)
    val p = Prop.forAll(genStr) { s =>
      val m = graft.functions.TokenCounts
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val got = (0 until m.numElements()).map(i =>
        m.keyArray().getUTF8String(i).toString ->
          m.valueArray().getLong(i)).toMap
      val exp = s.split(" ", -1).toSeq.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      got == exp
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("multi-space and non-ASCII text match the lambda form byte-for-byte") {
    TextFunctions.register(spark)
    import spark.implicits._
    // double spaces produce empty tokens (regex split, limit -1) and
    // multi-byte UTF-8 tokens must concatenate without byte damage
    val df = Seq("a  b c", "héllo wörld ünïcode 日本 語", " leading", "trailing ")
      .toDF("text")
    Seq(1, 2, 3).foreach { n =>
      val diff = df.select(TextFunctions.word_ngrams(col("text"), n).as("fast"),
          lambdaForm(n).as("slow"))
        .where(!(col("fast") <=> col("slow")))
        .count()
      assert(diff == 0, s"n=$n")
    }
  }

  test("whole-stage codegen stays enabled around word_ngrams") {
    TextFunctions.register(spark)
    val docs = spark.read.parquet(s"${TestSessions.sfDir}/documents.parquet")
    docs.createOrReplaceTempView("wng_docs2")
    val df = spark.sql(
      "SELECT count(DISTINCT g) FROM wng_docs2 LATERAL VIEW explode(word_ngrams(text, 3)) t AS g")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Generate"), plan)
  }
}
