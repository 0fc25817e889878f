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

object HashFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Column-API surface: 48-bit md5 prefix of the column rendered as-is
    * (cast to string first for non-string inputs to match the SQL family). */
  def md5_48(c: Column): Column = column(Md5Prefix48(expression(c)))

  /** One-pass k-wide minhash signature over an array<string> column. */
  def minhash_sigs(c: Column, k: Int): Column =
    column(MinhashSigs(expression(c), k))

  /** Both unsigned 32-bit md5 halves from one digest: array<long>[2]. */
  def md5_words(c: Column): Column = column(Md5Words(expression(c)))

  /** Register `md5_48` for SQL use (e.g. inside `transform` lambdas) on
    * this session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("md5_48")))
      reg.createOrReplaceTempFunction(
        "md5_48", exprs => Md5Prefix48(exprs.head), "scala_udf")
  }
}
