package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ArrowLikeType

/** Arrow-dtype-string ⇄ Spark DataType codec roundtrips (config fidelity
  * with the reference's serialized Arrow types). */
class CodecSpec extends AnyFunSuite {

  test("roundtrip for every type the reference configs use") {
    val types: Seq[DataType] = Seq(
      ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
      StringType, BooleanType, DateType, BinaryType,
      DecimalType(12, 3), ArrayType(DoubleType), ArrayType(ArrayType(LongType)))
    types.foreach { dt =>
      assert(ArrowLikeType.toSpark(ArrowLikeType.fromSpark(dt)) == dt, dt.toString)
    }
  }

  test("reference spellings parse (case-insensitive, Arrow names)") {
    assert(ArrowLikeType.toSpark("Float64") == DoubleType)
    assert(ArrowLikeType.toSpark("Int64") == LongType)
    assert(ArrowLikeType.toSpark("Utf8") == StringType)
    assert(ArrowLikeType.toSpark("Date32") == DateType)
    assert(ArrowLikeType.toSpark("timestamp(us)") == TimestampType)
    assert(ArrowLikeType.toSpark("list<float32>") == ArrayType(FloatType))
    intercept[IllegalArgumentException](ArrowLikeType.toSpark("frobnicate"))
  }
}
