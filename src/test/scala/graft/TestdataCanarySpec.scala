package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary: the driver regenerates /root/testdata between
  * rounds, and a silent dtype change (events.ts went TIMESTAMP(NANOS)-as-long
  * -> timestamp[us] between rounds 4 and 5) once broke EVERY query while the
  * engine exited 0. This spec pins the physical dtypes Fixtures/EventStream
  * assume and fails with a readable message naming the drifted column, so
  * the next regeneration is a red named test instead of two dark rounds.
  */
class TestdataCanarySpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  private def schemaOf(table: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"${TestSessions.sfDir}/$table.parquet").schema
  }

  private def assertCol(table: String, col: String, allowed: Set[DataType]): Unit = {
    val schema = schemaOf(table)
    assert(schema.fieldNames.contains(col),
      s"TESTDATA DRIFT: $table.parquet lost column '$col' " +
        s"(has: ${schema.fieldNames.mkString(", ")})")
    val dt = schema(col).dataType
    assert(allowed.contains(dt),
      s"TESTDATA DRIFT: $table.$col is $dt; engine code assumes one of " +
        s"${allowed.mkString(" | ")} — update Fixtures.registerRaw / " +
        "EventStream.readEvents alongside this canary")
  }

  test("events.ts is nanos-long or timestamp (Fixtures/EventStream contract)") {
    assertCol("events", "ts", Set(LongType, TimestampType, TimestampNTZType))
  }

  test("events core columns hold their dtypes") {
    assertCol("events", "event_id", Set(LongType))
    assertCol("events", "user_id", Set(LongType))
    assertCol("events", "event_type", Set(StringType))
    assertCol("events", "value", Set(DoubleType))
    assertCol("events", "props", Set(StringType))
  }

  test("documents columns hold their dtypes") {
    assertCol("documents", "doc_id", Set(LongType))
    assertCol("documents", "text", Set(StringType))
    assertCol("documents", "lang", Set(StringType))
    assertCol("documents", "source", Set(StringType))
    assertCol("documents", "n_chars", Set(LongType))
  }

  test("embeddings vector column is array<float> or array<double>") {
    assertCol("embeddings", "vec_id", Set(LongType))
    assertCol("embeddings", "embedding",
      Set(ArrayType(FloatType, true), ArrayType(FloatType, false),
        ArrayType(DoubleType, true), ArrayType(DoubleType, false)))
  }

  test("lineitem join/agg key columns hold their dtypes") {
    assertCol("lineitem", "l_orderkey", Set(LongType))
    assertCol("lineitem", "l_quantity", Set(DoubleType))
    assertCol("lineitem", "l_extendedprice", Set(DoubleType))
    assertCol("lineitem", "l_returnflag", Set(StringType))
    // Fixtures maps CAST({v} AS DATE): valid from any of these
    assertCol("lineitem", "l_shipdate",
      Set(DateType, TimestampType, TimestampNTZType, StringType))
  }

  test("orders/customer key columns hold their dtypes") {
    assertCol("orders", "o_orderkey", Set(LongType))
    assertCol("orders", "o_custkey", Set(LongType))
    assertCol("orders", "o_totalprice", Set(DoubleType))
    assertCol("orders", "o_orderdate",
      Set(DateType, TimestampType, TimestampNTZType, StringType))
    assertCol("customer", "c_custkey", Set(LongType))
    assertCol("customer", "c_mktsegment", Set(StringType))
  }

  test("all ten raw tables exist at every local scale factor") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1");
         t <- graft.mesh.Fixtures.RawTables) {
      val f = new java.io.File(s"/root/testdata/$sf/$t.parquet")
      assert(f.exists, s"TESTDATA DRIFT: missing /root/testdata/$sf/$t.parquet")
    }
  }
}
