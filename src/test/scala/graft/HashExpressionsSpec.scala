package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashFunctions

/** Md5Prefix48 must be bit-identical to the SQL spelling the DuckDB
  * oracles compute — CAST(conv(substring(md5(s), 1, 12), 16, 10) AS
  * BIGINT) — on every input shape (ASCII, UTF-8 multibyte, empty,
  * numeric casts), in both the Column API and the registered SQL form. */
class HashExpressionsSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  test("md5_48 equals conv(substring(md5)) on corpus text") {
    graft.mesh.Fixtures.registerRaw(spark, TestSessions.sfDir)
    val docs = spark.table("documents")
    val mismatch = docs.select(
        HashFunctions.md5_48(col("text")).as("fast"),
        expr("CAST(conv(substring(md5(text), 1, 12), 16, 10) AS BIGINT)").as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mismatch == 0)
  }

  test("md5_48 equals the SQL spelling on edge inputs") {
    import spark.implicits._
    // the length cases cover every MD5 padding branch: within one block,
    // the 0x80/length split at 55/56, exact block multiples, and
    // multi-block tails (a custom compression loop fails exactly here)
    val edge = (Seq("", "a", "é中文 mixed", " leading", "trailing ",
      "1234567890", ":", "a:b:c") ++
      Seq(1, 54, 55, 56, 57, 63, 64, 65, 119, 120, 121, 128, 300)
        .map(n => "x" * n)).toDF("s")
    val mismatch = edge.select(
        HashFunctions.md5_48(col("s")).as("fast"),
        expr("CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT)").as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mismatch == 0)
    // never negative: the value is 48 bits
    assert(edge.select(HashFunctions.md5_48(col("s")).as("h"))
      .where(col("h") < 0 || col("h") >= (1L << 48)).count() == 0)
  }

  test("minhash_sigs equals the k-lambda array_min spelling; null/empty edges") {
    graft.mesh.Fixtures.registerRaw(spark, TestSessions.sfDir)
    graft.functions.HashFunctions.register(spark)
    val k = 12
    val sh = spark.table("documents").select(col("doc_id"),
      expr("array_distinct(split(text, ' '))").as("__sh"))
    val lambdaCols = (0 until k).map { j =>
      expr(s"""array_min(transform(transform(__sh, s -> md5_48(s)),
              |  h -> (h * ${graft.pipeline.Dedup.mhA(j)} +
              |        ${graft.pipeline.Dedup.mhB(j)}) % 2147483647))"""
        .stripMargin).as(s"ref$j")
    }
    val cmp = sh.select(Seq(
      HashFunctions.minhash_sigs(col("__sh"), k).as("fast")) ++ lambdaCols: _*)
    val mismatch = cmp.where((0 until k)
        .map(j => element_at(col("fast"), j + 1) =!= col(s"ref$j"))
        .reduce(_ || _)).count()
    assert(mismatch == 0)
    // empty array -> k nulls (array_min over an empty transform is NULL);
    // null elements are skipped exactly like array_min's null handling
    import spark.implicits._
    val edge = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("a")),
      (3L, Seq("a", "b", "c"))).toDF("id", "__sh")
      .withColumn("__sh",
        when(col("id") === 2, array(lit(null).cast("string"), lit("a")))
          .otherwise(col("__sh")))
    val rows = edge.select(col("id"),
        HashFunctions.minhash_sigs(col("__sh"), k).as("mh"),
        expr("array_min(transform(transform(__sh, s -> md5_48(s)), " +
          s"h -> (h * ${graft.pipeline.Dedup.mhA(0)} + " +
          s"${graft.pipeline.Dedup.mhB(0)}) % 2147483647))").as("ref0"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Any](1).forall(_ == null), "empty -> all null")
    rows.drop(1).foreach { r =>
      assert(r.getSeq[Any](1).head == r.get(2), s"row $r")
    }
  }

  test("md5_words equals the conv(substring(md5)) halves on corpus tokens") {
    graft.mesh.Fixtures.registerRaw(spark, TestSessions.sfDir)
    val tok = spark.table("documents")
      .select(explode(split(col("text"), " ")).as("token")).limit(5000)
    val mismatch = tok.select(
        HashFunctions.md5_words(col("token")).as("w"),
        expr("CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)").as("r1"),
        expr("CAST(conv(substring(md5(token), 9, 8), 16, 10) AS BIGINT)").as("r2"))
      .where(element_at(col("w"), 1) =!= col("r1") ||
        element_at(col("w"), 2) =!= col("r2")).count()
    assert(mismatch == 0)
  }

  test("property: MinhashSigs/Md5Words match direct digest math on arbitrary unicode") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // pure-JVM property (no Spark job per case): the eval helpers the
    // expression and its codegen both call, against digest math done here
    // from scratch — arbitrary unicode including surrogates-free strings
    val genStr = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', ':', '#', 'é', '中', 'ß', '€', '\t')))
      .map(_.mkString)
    def md5bytes(s: String): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val pWords = Prop.forAll(genStr) { s =>
      val d = md5bytes(s)
      val w = graft.functions.Md5Words
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      def be(off: Int) = (0 until 4).map(i => (d(off + i) & 0xffL) << (24 - 8 * i)).sum
      w.getLong(0) == be(0) && w.getLong(1) == be(4)
    }
    val k = 12
    val pSigs = Prop.forAll(Gen.listOf(genStr)) { shingles =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        shingles.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      val got = graft.functions.MinhashSigs.compute(arr, k)
      if (shingles.isEmpty) (0 until k).forall(got.isNullAt)
      else (0 until k).forall { j =>
        val exp = shingles.map { s =>
          val d = md5bytes(s)
          val h = (0 until 6).map(i => (d(i) & 0xffL) << (40 - 8 * i)).sum
          (h * graft.functions.MinhashSigs.a(j) +
            graft.functions.MinhashSigs.b(j)) % graft.functions.MinhashSigs.P
        }.min
        got.getLong(j) == exp
      }
    }
    Seq(pWords, pSigs).foreach { p =>
      val res = check(Parameters.default.withMinSuccessfulTests(300), p)
      assert(res.passed, res.status.toString)
    }
  }

  test("md5_key48 equals md5_48(concat_ws(':', casts)) across types and nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 7, "tok"),
      (-42L, 0, ""),
      (Long.MinValue, Int.MinValue, "a:b"),
      (0L, 123456789, "δ unicode ✓"),
      (987654321012345L, -1, "x")
    ).toDF("l", "i", "s")
    val got = df.select(
      graft.functions.HashFunctions.md5_key48(col("l"), col("i"), col("s")).as("k"),
      graft.functions.HashFunctions.md5_48(concat_ws(":",
        col("l").cast("string"), col("i").cast("string"), col("s"))).as("ref"),
      graft.functions.HashFunctions.md5_key48(col("l")).as("k1"),
      graft.functions.HashFunctions.md5_48(col("l").cast("string")).as("ref1"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), r.toString)
      assert(r.getLong(2) == r.getLong(3), r.toString)
    }
    // null children skip WITHOUT a separator — concat_ws semantics
    val n = Seq((Some(5L), Option.empty[String], Some("t")))
      .toDF("a", "b", "c")
      .select(
        graft.functions.HashFunctions.md5_key48(col("a"), col("b"), col("c")).as("k"),
        graft.functions.HashFunctions.md5_48(concat_ws(":",
          col("a").cast("string"), col("b"), col("c"))).as("ref"))
      .head
    assert(n.getLong(0) == n.getLong(1))
    // interpreted eval path agrees with codegen
    val e = graft.functions.Md5Key48(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(99L),
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("q"),
        org.apache.spark.sql.types.StringType)))
    val viaSql = spark.sql(
      "SELECT CAST(conv(substring(md5('99:q'), 1, 12), 16, 10) AS BIGINT)").head.getLong(0)
    assert(e.eval(null) == viaSql)
  }

  test("nested md5_key48 is rejected at analysis (shared render buffer)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a nested key would be type-legal (LongType child) but the inner
    // expression resets the SAME per-thread KeyBuf mid-render of the outer
    // key — silently wrong hashes. Must fail loudly instead.
    val df = Seq((1L, 2L, "x")).toDF("a", "b", "s")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.HashFunctions.md5_key48(
        col("s"),
        graft.functions.HashFunctions.md5_key48(col("a"), col("b")))).collect()
    }
    assert(e.getMessage.contains("must not be nested"), e.getMessage)
  }

  test("registered SQL form works inside transform lambdas") {
    graft.functions.HashFunctions.register(spark)
    val r = spark.sql(
      """SELECT transform(array('x', 'y'), s -> md5_48(s)) AS hs,
        |       array(CAST(conv(substring(md5('x'), 1, 12), 16, 10) AS BIGINT),
        |             CAST(conv(substring(md5('y'), 1, 12), 16, 10) AS BIGINT)) AS ref
        |""".stripMargin).head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }
}
