package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram generator: `word_ngrams(text, n)` ==
  * `transform(sequence(0, greatest(size(split(text,' ')) - n, 0)),
  *            i -> concat_ws(' ', slice(split(text,' '), i + 1, n)))`
  * — the shingling shape every dedup/decontamination operator explodes.
  *
  * The lambda form runs INTERPRETED per element (3 HOF closures per gram:
  * slice allocation, per-word concat, sequence materialization); for a
  * ~200-word document that is ~600 closure invocations per row, which
  * dominates the shingle production stage of dd2/dm2/dd7/dc1/cp1. This
  * expression computes all grams in one compiled pass over the token
  * array: one allocation per gram (the output string), zero per-element
  * closures, inside whole-stage codegen.
  *
  * Semantics match the lambda form exactly, including edges: `split` keeps
  * empty tokens (regex split, limit -1); when the document has fewer than
  * `n` words the single gram is the whole (possibly short) token list;
  * gram count is `max(len - n, 0) + 1`.
  */
case class WordNGrams(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams requires (string, int) inputs, got $l / $r")
    }

  override def nullSafeEval(text: Any, n: Any): Any =
    WordNGrams.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.WordNGrams.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGrams =
    copy(left = newLeft, right = newRight)
}

object WordNGrams {
  private val Space = UTF8String.fromString(" ")

  /** One compiled pass: split once, emit `max(len - n, 0) + 1` grams. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // the slice-based lambda form throws on a non-positive length — match
    // it loudly instead of silently emitting empty shingles
    require(n > 0, s"word_ngrams: n must be positive, got $n")
    val tokens = text.split(Space, -1)
    val len = tokens.length
    val out = new Array[AnyRef](math.max(len - n, 0) + 1)
    var i = 0
    while (i < out.length) {
      val hi = math.min(i + n, len)
      // join tokens[i, hi) with single spaces
      var width = hi - i - 1 // separator bytes
      var j = i
      while (j < hi) { width += tokens(j).numBytes(); j += 1 }
      val bytes = new Array[Byte](math.max(width, 0))
      var off = 0
      j = i
      while (j < hi) {
        val tk = tokens(j)
        tk.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += tk.numBytes()
        if (j < hi - 1) { bytes(off) = ' '.toByte; off += 1 }
        j += 1
      }
      out(i) = UTF8String.fromBytes(bytes)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Column-API surface. */
  def word_ngrams(text: Column, n: Int): Column =
    column(WordNGrams(expression(text), Literal(n)))

  /** Register `word_ngrams` for SQL use on this session. Idempotent: a
    * session that already has it is left alone (re-registering is harmless
    * but logs a replacement warning per call). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("word_ngrams")))
      reg.createOrReplaceTempFunction(
        "word_ngrams", exprs => WordNGrams(exprs(0), exprs(1)), "scala_udf")
  }
}
