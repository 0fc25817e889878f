package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Md5Key48, Md5Prefix48, TextEntropyStats, TokenCounts, VectorDot, WordNGrams}

/** Spark-native entry point: `SparkSessionExtensions` installer so a plain
  * `spark.sql.extensions=graft.GraftExtensions` config (no code) gives every
  * session the library's native expressions — the idiomatic way to ship
  * Catalyst extensions with a Spark library. Sessions built programmatically
  * can keep calling `VectorFunctions.register`/`TextFunctions.register` for
  * the same effect.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, "vec_dot takes exactly 2 arguments")
          VectorDot(exprs.head, exprs(1))
        }))
    ext.injectFunction(
      (FunctionIdentifier("word_ngrams"),
        new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, "word_ngrams takes exactly 2 arguments")
          WordNGrams(exprs.head, exprs(1))
        }))
    ext.injectFunction(
      (FunctionIdentifier("text_stats"),
        new ExpressionInfo(classOf[TextEntropyStats].getName, "text_stats"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "text_stats takes exactly 1 argument")
          TextEntropyStats(exprs.head)
        }))
    // the SQL-exposed pipeline kernels: per-doc token frequency map and
    // the allocation-free 48-bit md5 family (the sketch/sampling hash the
    // SQL-form queries spell as md5_48 / md5_key48) — an extensions-only
    // session must run the same SQL the library's query inventory ships
    ext.injectFunction(
      (FunctionIdentifier("token_counts"),
        new ExpressionInfo(classOf[TokenCounts].getName, "token_counts"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "token_counts takes exactly 1 argument")
          TokenCounts(exprs.head)
        }))
    ext.injectFunction(
      (FunctionIdentifier("md5_48"),
        new ExpressionInfo(classOf[Md5Prefix48].getName, "md5_48"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "md5_48 takes exactly 1 argument")
          Md5Prefix48(exprs.head)
        }))
    ext.injectFunction(
      (FunctionIdentifier("md5_key48"),
        new ExpressionInfo(classOf[Md5Key48].getName, "md5_key48"),
        (exprs: Seq[Expression]) => {
          require(exprs.nonEmpty, "md5_key48 takes at least 1 argument")
          Md5Key48(exprs)
        }))
    // whole-operator extension: bounded-heap top-k per group (no total sort)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
