package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two float-vector columns.
  *
  * Spark's lambda higher-order functions (`aggregate`/`zip_with`) are
  * interpreted per element — for 64-dim embeddings that is ~200 closure
  * invocations per pair, which dominates similarity/near-dup plans. This
  * expression compiles to a tight Java loop inside whole-stage codegen and
  * computes the exact same value as
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, (acc,x) -> acc+x)`:
  * per-index float->double widening, products summed in index order — so
  * results stay bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(...))`.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** k dot-products of a vector column against a CONSTANT centroid matrix,
  * plus a per-centroid bias: scores[j] = vec_dot(v, cents(j)) + bias(j).
  *
  * Value-identical to the `array(vec_dot(v, array(lit...)) + lit(b), ...)`
  * spelling, with two structural differences that matter at plan scale:
  * the matrix rides as ONE reference object instead of k*dim literal
  * nodes (a 16x64 matrix inlined four times made sd1's analysis and
  * per-stage AQE re-optimization a visible driver cost), and the loop is
  * codegen'd/allocation-free instead of k separate expression evals.
  * Null vector -> null array (each per-j dot would be null). */
case class VectorScores(
    child: Expression,
    cents: Seq[Seq[Float]], bias: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cents.nonEmpty && cents.size == bias.size,
    s"vec_scores needs matching non-empty cents/bias, got ${cents.size}/${bias.size}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_scores requires array<float>, got $other")
    }

  @transient private lazy val centsArr: Array[Array[Float]] =
    cents.map(_.toArray).toArray
  @transient private lazy val biasArr: Array[Double] = bias.toArray

  override def nullSafeEval(input: Any): Any =
    VectorScores.compute(input.asInstanceOf[ArrayData], centsArr, biasArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", centsArr, "float[][]")
    val bRef = ctx.addReferenceObj("bias", biasArr, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorScores.compute($v, $cRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): VectorScores =
    copy(child = newChild)
}

object VectorScores {
  def compute(
      v: ArrayData, cents: Array[Array[Float]],
      bias: Array[Double]): ArrayData = {
    val k = cents.length
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      // same length guard as VectorDot: min of the two lengths
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * c(i).toDouble
        i += 1
      }
      out(j) = acc + bias(j)
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** k rounded cosines of (v, nrm) against a constant centroid matrix with
  * precomputed norms: scores[j] = round(vec_dot(v, cents(j)) /
  * (nrm * norms(j)), 6) — the seeded SemDeDup assignment page, computed
  * like [[VectorScores]] but through the exact Round(…, 6) HALF_UP
  * double semantics Spark's `round` applies (BigDecimal.valueOf +
  * setScale), so results stay bit-identical to the SQL spelling and to
  * the DuckDB oracle's replay. */
case class VectorCosScores(
    left: Expression, right: Expression,
    cents: Seq[Seq[Float]], norms: Seq[Double])
  extends BinaryExpression {
  require(cents.nonEmpty && cents.size == norms.size,
    s"vec_cos_scores needs matching non-empty cents/norms, got ${cents.size}/${norms.size}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_cos_scores requires (array<float>, double), got $other")
    }

  @transient private lazy val centsArr: Array[Array[Float]] =
    cents.map(_.toArray).toArray
  @transient private lazy val normsArr: Array[Double] = norms.toArray

  override def nullSafeEval(v: Any, nrm: Any): Any =
    VectorCosScores.compute(v.asInstanceOf[ArrayData],
      nrm.asInstanceOf[Double], centsArr, normsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", centsArr, "float[][]")
    val nRef = ctx.addReferenceObj("norms", normsArr, "double[]")
    nullSafeCodeGen(ctx, ev, (v, nrm) =>
      s"${ev.value} = graft.functions.VectorCosScores.compute($v, $nrm, $cRef, $nRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorCosScores =
    copy(left = newLeft, right = newRight)
}

object VectorCosScores {
  /** Spark's Round(double, 6) HALF_UP — RoundBase's DoubleType branch. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(
      v: ArrayData, nrm: Double, cents: Array[Array[Float]],
      norms: Array[Double]): ArrayData = {
    val k = cents.length
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * c(i).toDouble
        i += 1
      }
      out(j) = round6(acc / (nrm * norms(j)))
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Native codegen'd integer dot product over two BIGINT-array columns —
  * the fixed-point (1e-6-unit) counterpart of [[VectorDot]] for the
  * integer-exact embedding passes (emb1/emb2's quantized cosine parts).
  * Value-identical to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc+x)`
  * (long arithmetic is exact and order-free incl. two's-complement
  * wrap), but compiled to a tight loop instead of ~2·dim interpreted
  * closure calls per row. UNEQUAL lengths yield NULL, exactly like the
  * lambda spelling (zip_with null-pads the shorter side and the sum goes
  * NULL) — a ragged row must stay visibly invalid, not produce a
  * plausible truncated dot. NOTE this differs from [[VectorDot]], which
  * mins the lengths. */
case class VectorDotI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot_i64 requires array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += x.getLong(i) * y.getLong(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotI64 =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Column-API surface (Spark 4 classic Column<->Expression bridge). */
  def vec_dot(a: Column, b: Column): Column =
    column(VectorDot(expression(a), expression(b)))

  /** Exact integer dot over BIGINT arrays (fixed-point micro units). */
  def vec_dot_i64(a: Column, b: Column): Column =
    column(VectorDotI64(expression(a), expression(b)))

  /** k biased dots against a constant matrix: array<double>. */
  def vec_scores(v: Column, cents: Seq[Seq[Float]], bias: Seq[Double]): Column =
    column(VectorScores(expression(v), cents, bias))

  /** k rounded cosines against a constant matrix with precomputed norms. */
  def vec_cos_scores(
      v: Column, nrm: Column, cents: Seq[Seq[Float]], norms: Seq[Double]): Column =
    column(VectorCosScores(expression(v), expression(nrm), cents, norms))

  def vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))
  }

  /** Register `vec_dot` for SQL use on this session. Idempotent: a session
    * that already has it is left alone (re-registering is harmless but logs
    * a replacement warning per call — thousands in a bench run). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")))
      reg.createOrReplaceTempFunction(
        "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "scala_udf")
  }
}
