package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.types.BinaryType

/** Column surface over Spark's runtime-filter Bloom probe.
  *
  * `BloomFilterMightContain` is the codegen'd expression Spark itself
  * injects for runtime join filters; reusing it (instead of a Scala UDF
  * over `BloomFilter.mightContain`) keeps Bloom membership probes inside
  * whole-stage codegen. The filter bytes ship as a binary literal — one
  * broadcast-sized constant per plan, exactly like the injected runtime
  * filters. */
object BloomFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Membership probe: does the serialized Bloom filter (built over
    * xxhash64 longs) possibly contain xxhash64(value)? Never a false
    * negative; false-positive rate set at build time. */
  def might_contain(filterBytes: Array[Byte], value: Column): Column =
    column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      new XxHash64(Seq(expression(value)))))

  /** Serialize a driver-side sketch (`df.stat.bloomFilter`) for
    * [[might_contain]]. */
  def serialize(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
