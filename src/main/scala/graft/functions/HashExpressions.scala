package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 48-bit md5 prefix: `md5_48(s)` ==
  * `CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT)` — the shared
  * deterministic hash family of every oracled sketch/dedup operator
  * (Sketches.hash48, the dd2/dm2 per-shingle minhash base, CMS buckets).
  *
  * The SQL spelling pays, per value: a 32-char hex rendering of the digest,
  * a substring slice, and `Conv`'s radix parse back to a long — all string
  * allocations — plus a fresh MessageDigest per call inside Spark's `Md5`.
  * This expression digests the UTF-8 bytes with a REUSED per-thread
  * MessageDigest and assembles the first 6 digest bytes into the long
  * directly (12 hex chars == 6 bytes, big-endian, < 2^48 so never
  * negative. The value is bit-identical to the SQL spelling, which is what
  * the DuckDB oracles compute — HashExpressionsSpec pins the equality).
  *
  * Hot-path shape: inside whole-stage codegen (and inside `transform`
  * lambdas when registered for SQL), ~3-4x cheaper per value than the
  * Md5+Conv chain; on a single-row-group local scan that difference is
  * wall-clock, not noise.
  */
case class Md5Prefix48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_48 requires a string or binary input, got $other")
    }

  private def isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) Md5Prefix48.computeString(input.asInstanceOf[UTF8String])
    else Md5Prefix48.computeBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (isString)
        s"${ev.value} = graft.functions.Md5Prefix48.computeString($c);"
      else
        s"${ev.value} = graft.functions.Md5Prefix48.computeBytes($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix48 =
    copy(child = newChild)
}

object Md5Prefix48 {
  def computeBytes(bytes: Array[Byte]): Long =
    FastMd5.hash48(bytes, bytes.length)

  // per-thread input scratch: UTF8String.getBytes copies a slice-backed
  // value into a FRESH array per call — on the minhash hot path that is
  // one allocation per shingle; writing into a reused buffer instead
  // keeps the digest loop allocation-free end to end
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  def computeString(s: UTF8String): Long = {
    val n = s.numBytes()
    var buf = scratch.get()
    if (buf.length < n) {
      // next power of two, clamped: highestOneBit(n)*2 overflows to
      // negative at n >= 2^30 — grow exactly to n there (inputs can be
      // any string Spark holds, up to ~2 GiB)
      val grown = java.lang.Integer.highestOneBit(n) * 2
      buf = new Array[Byte](if (grown > 0) grown else n)
      scratch.set(buf)
    }
    s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    FastMd5.hash48(buf, n)
  }
}

/** Native one-pass minhash signature: `minhash_sigs(shingles, k)` ==
  * `transform(sh, s -> md5_48(s))` fed into k separate
  * `array_min(transform(hs, h -> (h * a_j + b_j) % P))` columns — but
  * computed in a single loop over the shingle array with a reused digest
  * and one long[k] of running minima.
  *
  * The lambda spelling is semantically fine but evaluates interpreted
  * (higher-order functions have no codegen) and allocates k+1
  * intermediate arrays per document; measured on a 32-thread local run
  * the allocation pressure made the signature stage scale NEGATIVELY
  * with parallelism (per-doc cost 0.2 ms at 3 threads -> 2.3 ms at 32).
  * This expression is allocation-free per shingle and bit-identical to
  * the lambda spelling (HashExpressionsSpec pins it), which is in turn
  * what the DuckDB oracles re-derive.
  *
  * Null elements are skipped (md5_48(null) -> null, array_min skips
  * nulls); an empty or all-null input yields k NULL minima, matching
  * `array_min` over an empty transform. */
case class MinhashSigs(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"minhash_sigs needs k > 0, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSigs.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  /** Largest prime below 2^31 — the permutation modulus (shared with
    * Dedup's SQL spelling and the DuckDB oracles). */
  val P: Long = 2147483647L

  /** Affine-permutation constants for hash j: a_j odd and < 2^14 so that
    * a_j * h stays < 2^62 for a 48-bit base hash, b_j < 2^16. The single
    * source of truth — Dedup.mhA/mhB delegate here. */
  def a(j: Int): Long = ((j * 2654435761L) % 8191) * 2 + 1
  def b(j: Int): Long = (j * 40503L + 12289) % 65521

  def compute(
      arr: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = Md5Prefix48.computeString(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val v = (h * a(j) + b(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](k))
    else
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(mins)
  }
}

/** Native md5 word pair: `md5_words(s)` == array(
  * CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT),
  * CAST(conv(substring(md5(s), 9, 8), 16, 10) AS BIGINT)) — the two
  * unsigned 32-bit halves the simhash family consumes, from ONE digest
  * with no hex rendering, substring slicing, or radix parsing (the SQL
  * spelling digests twice and allocates three strings per half).
  * Bit-identical to the SQL spelling (HashExpressionsSpec pins it). */
case class Md5Words(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_words requires a string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Words.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Words.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Words =
    copy(child = newChild)
}

object Md5Words {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val w0 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val w1 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(w0, w1))
  }
}

/** Native 64-bit document SimHash: `simhash64(text)` == the
  * explode(split(text, ' ')) → md5 token halves → 64 majority bit-sums
  * aggregation, fused into ONE row-local pass over the document's token
  * stream. A signature depends only on its own document's text, so the
  * aggregation spelling's per-TOKEN exchange (|tokens| rows of
  * (id, h1, h2) shuffled per corpus/batch, then a 65-aggregate groupBy)
  * buys nothing — this expression keeps the token stream inside the
  * scan stage. The kernel is the one the streaming ingest twin already
  * runs per arrival ([[graft.pipeline.Dedup.simhashOf]] delegates here);
  * SimhashStreamSpec pins bit-equality against GOLDEN literals plus an
  * independent md5-hex re-derivation doc-by-doc (the aggregation
  * spelling is retired), and the dd6/dd12 DuckDB oracles re-derive the
  * same values independently. Same tokenization as Spark's split(text, ' ')
  * with limit -1: trailing empty tokens KEPT; a null text is null (the
  * aggregation form dropped the row — callers filter nulls first). */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires a string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimhashSig.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): Long = compute(digest.get(), s.toString)

  /** The shared kernel (caller-supplied digest — the streaming twin holds
    * one per partition): the same `split(text, " ", -1)` tokenization as
    * Spark's split (trailing empty tokens KEPT), md5 leading halves
    * ([[Md5Words]]'s byte packing), physical bit mapping logical bit b =
    * bit 31-b of half 1 / 63-b of half 2, majority rule over the raw
    * (duplicate-bearing) token multiset. */
  def compute(md: java.security.MessageDigest, text: String): Long = {
    val toks = text.split(" ", -1)
    val counts = new Array[Int](64)
    var n = 0
    var t = 0
    while (t < toks.length) {
      val d = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val w0 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val w1 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b = 0
      while (b < 32) { counts(b) += ((w0 >>> (31 - b)) & 1L).toInt; b += 1 }
      while (b < 64) { counts(b) += ((w1 >>> (63 - b)) & 1L).toInt; b += 1 }
      n += 1
      t += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (2 * counts(b) > n) sim |= (1L << b); b += 1 }
    sim
  }
}

/** Per-thread byte buffer for rendering multi-column hash keys without
  * allocation — the backing state of [[Md5Key48]]. Rendering rules mirror
  * `concat_ws(':', cast(c as string)...)` byte for byte: decimal digits
  * for integral values, UTF-8 pass-through for strings, null elements
  * skipped WITHOUT a separator. */
final class KeyBuf {
  private var buf = new Array[Byte](256)
  private var len = 0
  private var elems = 0

  def reset(): Unit = { len = 0; elems = 0 }

  private def ensure(extra: Int): Unit =
    if (len + extra > buf.length) {
      var n = buf.length * 2
      while (n < len + extra) n *= 2
      buf = java.util.Arrays.copyOf(buf, n)
    }

  private def sep(): Unit = {
    if (elems > 0) { ensure(1); buf(len) = ':'.toByte; len += 1 }
    elems += 1
  }

  /** Append the decimal rendering of `v` (== `CAST(v AS STRING)`). */
  def putLong(v: Long): Unit = {
    sep()
    ensure(20)
    if (v == Long.MinValue) {
      val s = "-9223372036854775808".getBytes
      System.arraycopy(s, 0, buf, len, s.length); len += s.length
      return
    }
    var x = v
    if (x < 0) { buf(len) = '-'.toByte; len += 1; x = -x }
    if (x == 0) { buf(len) = '0'.toByte; len += 1; return }
    val start = len
    while (x > 0) { buf(len) = ('0' + (x % 10)).toByte; len += 1; x /= 10 }
    var i = start; var j = len - 1
    while (i < j) {
      val t = buf(i); buf(i) = buf(j); buf(j) = t; i += 1; j -= 1
    }
  }

  /** Append a string's UTF-8 bytes verbatim. */
  def putUTF8(s: UTF8String): Unit = {
    sep()
    val n = s.numBytes()
    ensure(n)
    s.writeToMemory(buf,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
    len += n
  }

  def hash48(): Long = FastMd5.hash48(buf, len)
}

object KeyBuf {
  private val tl = new ThreadLocal[KeyBuf] {
    override def initialValue(): KeyBuf = new KeyBuf
  }
  def get(): KeyBuf = tl.get()
}

/** Allocation-free multi-column 48-bit hash key: `md5_key48(c1, c2, ...)`
  * == `md5_48(concat_ws(':', cast(c1 as string), cast(c2 as string), ...))`
  * — the deterministic row-key draw of the sketch/sampling family
  * (Sketches.hash48/hashSample), fused into ONE expression.
  *
  * The concat_ws spelling allocates per row: one UTF8String per numeric
  * cast plus the joined key. Under a multi-task local scan those
  * allocations scale NEGATIVELY with parallelism (the MinhashSigs
  * finding: GC pressure, not CPU, dominates) — measured 2.3 -> 7.3 us/row
  * going 4 -> 12 scan tasks on ap1's sample filter. This expression
  * renders every child into one reused per-thread buffer and digests in
  * place; bit-identical to the SQL spelling (HashExpressionsSpec pins
  * it), which is what the DuckDB oracles compute.
  *
  * Null children are skipped without a separator (concat_ws semantics),
  * so the expression itself never returns null. */
case class Md5Key48(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // a nested md5_key48 would be type-legal (LongType child) but resets
    // the SHARED per-thread KeyBuf mid-render of the outer key — silently
    // wrong hashes in both eval and codegen. Fail loudly at analysis.
    if (children.exists(_.exists(_.isInstanceOf[Md5Key48])))
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "md5_key48 must not be nested inside another md5_key48 (the render " +
          "buffer is shared per-thread); materialize the inner key first")
    val bad = children.map(_.dataType).collectFirst {
      case other if other != StringType && other != LongType &&
        other != IntegerType && other != ShortType && other != ByteType =>
        other
    }
    bad match {
      case Some(t) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_key48 takes string/integral children, got $t (cast to string first)")
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val kb = KeyBuf.get()
    kb.reset()
    children.foreach { c =>
      val v = c.eval(input)
      if (v != null) c.dataType match {
        case StringType => kb.putUTF8(v.asInstanceOf[UTF8String])
        case LongType => kb.putLong(v.asInstanceOf[Long])
        case IntegerType => kb.putLong(v.asInstanceOf[Int].toLong)
        case ShortType => kb.putLong(v.asInstanceOf[Short].toLong)
        case ByteType => kb.putLong(v.asInstanceOf[Byte].toLong)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
    kb.hash48()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val kb = ctx.freshName("kb")
    val childGen = children.map(_.genCode(ctx))
    val writes = children.zip(childGen).map { case (c, g) =>
      val put = c.dataType match {
        case StringType => s"$kb.putUTF8(${g.value});"
        case _ => s"$kb.putLong((long) ${g.value});"
      }
      s"""${g.code}
         |if (!${g.isNull}) { $put }""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        graft.functions.KeyBuf $kb = graft.functions.KeyBuf.get();
        $kb.reset();
        $writes
        final long ${ev.value} = $kb.hash48();
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Md5Key48 = copy(children = newChildren)
}

/** Codegen'd hamming-radius probe against a DRIVER-LITERAL signature set:
  * `hamming_matches(doc_id, sig)` returns array<struct<mid, hamming>> of
  * every (id, signature) in the embedded batch whose 64-bit signature is
  * within `maxHamming` of `sig` (excluding the row's own id) — the
  * small-batch ingest tier of dd12/mm9/mm10 (round 16).
  *
  * Why an expression and not a join: the batch side is gate-bounded
  * (≤ ~1024 sigs = 16 KB), and every join spelling of this probe pays a
  * per-stored-row toll this loop does not — the banded equality join
  * materializes C(blocks,2) struct rows per stored row (allocation-bound:
  * 15 s task-time / 2.5 s CPU on dd12's 64-task probe stage at sf0.1),
  * and a broadcast nested-loop join evaluates its condition INTERPRETED
  * per (row, sig) pair (~500 ns/pair measured — a full A/B regressed
  * dd12 0.40 → 0.55 s). This kernel runs inside whole-stage codegen,
  * costs |batch| xor+popcounts per stored row, and allocates ONLY for
  * matches — which near-dup probes make rare by construction. */
case class HammingMatches(
    left: Expression, right: Expression,
    ids: Array[Long], sigs: Array[Long], maxHamming: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(ids.length == sigs.length, "ids/sigs must be parallel arrays")

  override def dataType: DataType = ArrayType(
    new StructType().add("mid", LongType).add("hamming", LongType),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hamming_matches requires (bigint, bigint) inputs, got $other")
    }

  override def nullSafeEval(id: Any, sig: Any): Any =
    HammingMatches.compute(id.asInstanceOf[Long], sig.asInstanceOf[Long],
      ids, sigs, maxHamming)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("hmIds", ids, "long[]")
    val sigsRef = ctx.addReferenceObj("hmSigs", sigs, "long[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HammingMatches.compute(" +
        s"$a, $b, $idsRef, $sigsRef, $maxHamming);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingMatches =
    copy(left = newLeft, right = newRight)
}

object HammingMatches {
  def compute(docId: Long, sig: Long, ids: Array[Long], sigs: Array[Long],
      maxHamming: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    var buf: scala.collection.mutable.ArrayBuffer[Any] = null
    var i = 0
    while (i < sigs.length) {
      val h = java.lang.Long.bitCount(sig ^ sigs(i))
      if (h <= maxHamming && ids(i) != docId) {
        if (buf == null) buf = new scala.collection.mutable.ArrayBuffer[Any](4)
        buf += org.apache.spark.sql.catalyst.InternalRow(ids(i), h.toLong)
      }
      i += 1
    }
    if (buf == null) HammingMatches.empty
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  }

  private val empty =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
}

object HashFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Column-API surface: 48-bit md5 prefix of the column rendered as-is
    * (cast to string first for non-string inputs to match the SQL family). */
  def md5_48(c: Column): Column = column(Md5Prefix48(expression(c)))

  /** One-pass k-wide minhash signature over an array<string> column. */
  def minhash_sigs(c: Column, k: Int): Column =
    column(MinhashSigs(expression(c), k))

  /** Allocation-free multi-column key hash:
    * `md5_48(concat_ws(':', cast(c1 as string), ...))` fused. */
  def md5_key48(cs: Column*): Column =
    column(Md5Key48(cs.map(expression)))

  /** Both unsigned 32-bit md5 halves from one digest: array<long>[2]. */
  def md5_words(c: Column): Column = column(Md5Words(expression(c)))

  /** Row-local 64-bit document SimHash over a text column. */
  def simhash64(c: Column): Column = column(SimhashSig(expression(c)))

  /** Hamming-radius matches of (idCol, sigCol) against a driver-literal
    * signature set — the small-batch ingest probe. */
  def hamming_matches(idCol: Column, sigCol: Column,
      ids: Array[Long], sigs: Array[Long], maxHamming: Int): Column =
    column(HammingMatches(expression(idCol), expression(sigCol),
      ids, sigs, maxHamming))

  /** Register `md5_48` / `md5_key48` for SQL use (e.g. inside `transform`
    * lambdas, or the SQL-form sketch queries). Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("md5_48")))
      reg.createOrReplaceTempFunction(
        "md5_48", exprs => Md5Prefix48(exprs.head), "scala_udf")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("md5_key48")))
      reg.createOrReplaceTempFunction(
        "md5_key48", exprs => Md5Key48(exprs), "scala_udf")
  }
}
