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

/** Native one-pass entropy statistics: `text_stats(text)` returns
  * `struct(n_chars, distinct_chars, t_chars, n_tokens, distinct_tokens,
  * t_tokens)` where `t_*` = Σ n_c · round(ln(n_c)·1e6) over the symbol
  * counts — the exact integer micro-nat partial every entropy consumer
  * (tx9) previously assembled from TWO explode→groupBy chains plus a
  * per-doc join. One compiled pass over the string replaces five
  * operators and two shuffles with a row-local projection: symbol
  * counting is doc-local state, so distributing it was pure overhead.
  *
  * Parity contract (what the DuckDB oracle checks): characters iterate
  * by code point like `split(text, '')`; tokens split on single spaces
  * with limit -1 (empty tokens kept, `split(text, ' ')` semantics); the
  * per-symbol round is Spark's `round(DOUBLE)` — HALF_UP on the
  * shortest-decimal representation (`BigDecimal.valueOf`). An EMPTY
  * string returns NULL: the exploded form emitted no symbol rows for it,
  * so the document vanished through the aggregate+join — consumers
  * filter `st IS NOT NULL` to reproduce that. */
case class TextEntropyStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = TextEntropyStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_stats requires a string input, got $other")
    }

  override def nullSafeEval(text: Any): Any =
    TextEntropyStats.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = graft.functions.TextEntropyStats.compute($t);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): TextEntropyStats =
    copy(child = newChild)
}

object TextEntropyStats {
  val schema: StructType = StructType(
    Seq("n_chars", "distinct_chars", "t_chars",
      "n_tokens", "distinct_tokens", "t_tokens")
      .map(StructField(_, LongType, nullable = false)))

  /** Σ over counts of (n, k, t): total symbols, distinct symbols, and the
    * integer micro-nat partial Σ n_c · HALF_UP(ln(n_c)·1e6). */
  private def fold(counts: java.util.Collection[Integer]): (Long, Long, Long) = {
    var n = 0L; var k = 0L; var t = 0L
    val it = counts.iterator()
    while (it.hasNext) {
      val nc = it.next().intValue()
      n += nc; k += 1
      if (nc > 1) // ln(1) = 0 — skip the BigDecimal for the common case
        t += nc * java.math.BigDecimal.valueOf(math.log(nc.toDouble) * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    (n, k, t)
  }

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    if (s.isEmpty) return null
    val charCounts = new java.util.HashMap[Integer, Integer]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = charCounts.get(cp)
      charCounts.put(cp, if (prev == null) 1 else prev + 1)
      i += Character.charCount(cp)
    }
    val tokCounts = new java.util.HashMap[String, Integer]()
    val toks = s.split(" ", -1)
    var j = 0
    while (j < toks.length) {
      val prev = tokCounts.get(toks(j))
      tokCounts.put(toks(j), if (prev == null) 1 else prev + 1)
      j += 1
    }
    val (cn, ck, ct) = fold(charCounts.values())
    val (tn, tk, tt) = fold(tokCounts.values())
    org.apache.spark.sql.catalyst.InternalRow(cn, ck, ct, tn, tk, tt)
  }
}

/** Native per-term token counts: `token_term_counts(text, terms)` ==
  * `array(size(filter(split(text,' '), x -> x = t0)), ...,
  *        size(split(text,' ')))` — per-term tf counts plus the total
  * token count (last element), from ONE compiled pass over the string's
  * UTF-8 bytes with zero allocation beyond the m+1-long output.
  *
  * This is the BM25/retrieval scan kernel: the split+explode+filter
  * spelling allocates a UTF8String per token (hundreds per document) and
  * under local multi-task scans that allocation pressure scales
  * NEGATIVELY with parallelism (the MinhashSigs pathology). Token
  * boundaries are single 0x20 bytes — UTF-8 guarantees 0x20 never occurs
  * inside a multi-byte sequence, so byte scanning matches
  * `split(text, ' ')` exactly, including empty tokens between adjacent
  * separators and after a trailing separator (Java split limit -1, which
  * is what Spark's split uses). TokenTermCountsSpec property-pins the
  * equality on arbitrary unicode. */
case class TokenTermCounts(child: Expression, terms: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(terms.nonEmpty, "token_term_counts needs at least one term")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_term_counts requires a string input, got $other")
    }

  override def prettyName: String = "token_term_counts"

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    TokenTermCounts.compute(input.asInstanceOf[UTF8String], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the term byte table through a codegen reference object so the
    // generated code carries no per-term literal trees
    val tbRef = ctx.addReferenceObj("termBytes", termBytes,
      "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenTermCounts.compute($c, $tbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenTermCounts =
    copy(child = newChild)
}

object TokenTermCounts {
  def compute(s: UTF8String, termBytes: Array[Array[Byte]]): ArrayData = {
    val m = termBytes.length
    val out = new Array[Long](m + 1)
    val n = s.numBytes()
    var total = 0L
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == 0x20) {
        total += 1
        val len = i - tokStart
        var j = 0
        while (j < m) {
          val tb = termBytes(j)
          if (tb.length == len) {
            var k = 0
            var eq = true
            while (eq && k < len) {
              if (s.getByte(tokStart + k) != tb(k)) eq = false
              k += 1
            }
            if (eq) out(j) += 1
          }
          j += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    out(m) = total
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Native doc-local token frequency: `token_counts(text)` returns
  * `map<string, bigint>` of each token's occurrence count —
  * `explode(token_counts(text))` ≡ the (token, count) rows of
  * `GROUP BY doc, token COUNT(*)` over `explode(split(text, ' '))`,
  * computed WITHOUT the corpus-wide token shuffle: term frequency is
  * per-document state, so aggregating it across the cluster was pure
  * overhead (the tx8 shape — the raw token stream shuffled on
  * (doc_id, token) only to collapse within-document duplicates).
  * One compiled pass; tokens split on single spaces with limit -1
  * (empty tokens kept — `split(text, ' ')` semantics, same contract as
  * [[WordNGrams]]/[[TextEntropyStats]]); map keys appear in first-seen
  * order (consumers aggregate, so order never reaches a result). */
case class TokenCounts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_counts requires a string input, got $other")
    }

  override def prettyName: String = "token_counts"

  override def nullSafeEval(input: Any): Any =
    TokenCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {
  private val Space = UTF8String.fromString(" ")

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val tokens = text.split(Space, -1)
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      val c = m.get(t)
      m.put(t, if (c == null) 1L else c + 1L)
      i += 1
    }
    val keys = new Array[AnyRef](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Column-API surface. */
  def word_ngrams(text: Column, n: Int): Column =
    column(WordNGrams(expression(text), Literal(n)))

  /** Per-term token counts + total token count (last element). */
  def token_term_counts(text: Column, terms: Seq[String]): Column =
    column(TokenTermCounts(expression(text), terms))

  def text_stats(text: Column): Column =
    column(TextEntropyStats(expression(text)))

  /** Doc-local token frequency map (see [[TokenCounts]]). */
  def token_counts(text: Column): Column =
    column(TokenCounts(expression(text)))

  /** Register `word_ngrams`/`text_stats` for SQL use on this session.
    * Idempotent: a session that already has them is left alone
    * (re-registering is harmless but logs a replacement warning per
    * call). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("word_ngrams")))
      reg.createOrReplaceTempFunction(
        "word_ngrams", exprs => WordNGrams(exprs(0), exprs(1)), "scala_udf")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("text_stats")))
      reg.createOrReplaceTempFunction(
        "text_stats", exprs => TextEntropyStats(exprs(0)), "scala_udf")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("token_counts")))
      reg.createOrReplaceTempFunction(
        "token_counts", exprs => TokenCounts(exprs(0)), "scala_udf")
  }
}
