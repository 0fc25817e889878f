package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Native VectorDot expression: codegen path must equal the interpreted
  * lambda computation bit-for-bit, nulls propagate, Column API works. */
class VectorDotSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  test("vec_dot equals the lambda aggregate bit-for-bit on real embeddings") {
    val e = spark.read.parquet(s"${TestSessions.sfDir}/embeddings.parquet")
    VectorFunctions.register(spark)
    e.createOrReplaceTempView("emb")
    val diff = spark.sql(
      """SELECT vec_id,
        |  vec_dot(embedding, embedding) AS fast,
        |  aggregate(zip_with(embedding, embedding,
        |            (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |            CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS slow
        |FROM emb""".stripMargin)
      .where(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0)
  }

  test("vec_scores equals the per-centroid dot spelling bit-for-bit") {
    import graft.functions.VectorFunctions.{vec_dot, vec_scores}
    val e = spark.read.parquet(s"${TestSessions.sfDir}/embeddings.parquet")
    // deterministic "centroids" drawn from the data itself
    val cents = e.orderBy("vec_id").limit(7).collect()
      .map(_.getSeq[Float](1).toIndexedSeq).toIndexedSeq
    val bias = cents.indices.map(j => j * 0.125 - 0.375)
    val perJ = cents.zip(bias).map { case (c, b) =>
      vec_dot(col("embedding"), array(c.map(lit(_)): _*)) + lit(b)
    }
    val mismatch = e.select(
        vec_scores(col("embedding"), cents, bias).as("fast"),
        array(perJ: _*).as("slow"))
      .where(cents.indices
        .map(j => element_at(col("fast"), j + 1) =!= element_at(col("slow"), j + 1))
        .reduce(_ || _)).count()
    assert(mismatch == 0)
    // null vector -> null array
    val r = e.select(vec_scores(lit(null).cast("array<float>"), cents, bias)).head()
    assert(r.isNullAt(0))
  }

  test("vec_cos_scores equals round(vec_dot/(nrm*cn), 6) bit-for-bit") {
    import graft.functions.VectorFunctions.{vec_dot, vec_cos_scores}
    val e = spark.read.parquet(s"${TestSessions.sfDir}/embeddings.parquet")
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions
        .vec_dot(col("embedding"), col("embedding"))))
    val rows = e.orderBy("vec_id").limit(5).collect()
    val cents = rows.map(_.getSeq[Float](1).toIndexedSeq).toIndexedSeq
    val norms = rows.map(_.getAs[Double]("nrm")).toIndexedSeq
    val perJ = cents.zip(norms).map { case (c, cn) =>
      round(vec_dot(col("embedding"), array(c.map(lit(_)): _*))
        / (col("nrm") * lit(cn)), 6)
    }
    val mismatch = e.where(col("nrm") > 0).select(
        vec_cos_scores(col("embedding"), col("nrm"), cents, norms).as("fast"),
        array(perJ: _*).as("slow"))
      .where(cents.indices
        .map(j => element_at(col("fast"), j + 1) =!= element_at(col("slow"), j + 1))
        .reduce(_ || _)).count()
    assert(mismatch == 0)
  }

  test("null vectors propagate null; Column API cosine is 1.0 on self") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS d")
      .head()
    assert(r.isNullAt(0))
    val e = spark.read.parquet(s"${TestSessions.sfDir}/embeddings.parquet").limit(5)
    val self = e.select(
      VectorFunctions.vec_cosine(col("embedding"), col("embedding")).as("c"))
      .collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("vec_dot_i64 equals the aggregate/zip_with integer spelling (random arrays)") {
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextLong() % 1000000L),
        Seq.fill(64)(rnd.nextLong() % 1000000L))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      VectorFunctions.vec_dot_i64(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (s, x) -> s + x)")
        .as("slow"),
      VectorFunctions.vec_dot_i64(col("a"), col("a")).as("fast_self"),
      expr("aggregate(transform(a, x -> x * x), CAST(0 AS BIGINT), (s, x) -> s + x)")
        .as("slow_self"))
    assert(both.where(col("fast") =!= col("slow") ||
      col("fast_self") =!= col("slow_self")).count() == 0)
    // null propagates like the lambda form
    val n = df.select(VectorFunctions.vec_dot_i64(
      expr("CAST(NULL AS ARRAY<BIGINT>)"), col("b")).as("d")).head()
    assert(n.isNullAt(0))
    // ragged lengths go NULL (zip_with null-pads and the sum goes NULL) —
    // never a plausible truncated dot
    val ragged = df.select(VectorFunctions.vec_dot_i64(
      expr("slice(a, 1, 63)"), col("b")).as("d")).head()
    assert(ragged.isNullAt(0))
  }

  test("whole-stage codegen stays enabled around vec_dot") {
    VectorFunctions.register(spark)
    val e = spark.read.parquet(s"${TestSessions.sfDir}/embeddings.parquet")
    e.createOrReplaceTempView("emb")
    val df = spark.sql("SELECT sum(vec_dot(embedding, embedding)) FROM emb")
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages; the aggregate over
    // vec_dot must be inside one (a CodegenFallback would break the star)
    assert(plan.contains("*(1) HashAggregate"), plan)
  }
}
