package graft.functions

/** Allocation-free MD5 (RFC 1321) specialized for the 48-bit-prefix hot
  * path.
  *
  * The JDK's `MessageDigest` is correct but pays, per call: the
  * reset/update/digest virtual-call chain, an internal buffer copy, and a
  * fresh 16-byte result array. The dedup/sketch operators digest SHORT
  * inputs (a 3-word shingle is ~20 UTF-8 bytes — one MD5 block after
  * padding) millions of times per corpus pass, where that fixed overhead
  * is most of the cost. This implementation runs the 64-round compression
  * in a single static method over a caller-provided byte buffer and
  * returns the first 6 digest bytes as a long — no objects, no arrays, no
  * ThreadLocal state beyond the caller's reused input buffer.
  *
  * Scope: `hash48` only (the value every oracled operator consumes). The
  * full 16-byte digest paths ([[Md5Words]]) keep `MessageDigest`.
  * Bit-compatibility with `md5()` is pinned by HashExpressionsSpec's
  * corpus, edge-length, and arbitrary-unicode property tests.
  */
object FastMd5 {

  // K(i) = floor(abs(sin(i+1)) * 2^32) — the RFC 1321 sine table
  private val K: Array[Int] = Array.tabulate(64)(i =>
    (math.abs(math.sin(i + 1.0)) * 4294967296.0).toLong.toInt)

  // per-round left-rotation amounts
  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  // scratch for the final (padded) block(s); 128 covers the worst case
  // where the 0x80 pad byte lands past offset 55 and forces a second block
  private val tail = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](128)
  }

  /** First 6 MD5-digest bytes of `buf[0, len)` as a big-endian long —
    * exactly `CAST(conv(substring(md5(x), 1, 12), 16, 10) AS BIGINT)`. */
  def hash48(buf: Array[Byte], len: Int): Long = {
    var a0 = 0x67452301
    var b0 = 0xefcdab89
    var c0 = 0x98badcfe
    var d0 = 0x10325476

    // full 64-byte blocks straight from the input buffer
    val fullBlocks = len >>> 6
    var blk = 0
    var off = 0
    while (blk < fullBlocks) {
      val r = compress4(buf, off, a0, b0, c0, d0)
      a0 = r(0); b0 = r(1); c0 = r(2); d0 = r(3)
      blk += 1
      off += 64
    }

    // final block(s): remaining bytes + 0x80 + zero pad + 64-bit LE length
    val rem = len - off
    val t = tail.get()
    java.util.Arrays.fill(t, 0.toByte)
    System.arraycopy(buf, off, t, 0, rem)
    t(rem) = 0x80.toByte
    val twoBlocks = rem >= 56
    val lenOff = if (twoBlocks) 120 else 56
    val bits = len.toLong << 3
    var i = 0
    while (i < 8) {
      t(lenOff + i) = ((bits >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    var r = compress4(t, 0, a0, b0, c0, d0)
    a0 = r(0); b0 = r(1); c0 = r(2); d0 = r(3)
    if (twoBlocks) {
      r = compress4(t, 64, a0, b0, c0, d0)
      a0 = r(0); b0 = r(1); c0 = r(2); d0 = r(3)
    }

    // digest bytes are the little-endian rendering of (A, B, C, D);
    // bytes 0-5 = A's four bytes then B's low two, assembled big-endian
    ((a0 & 0xffL) << 40) | ((a0 >>> 8 & 0xffL) << 32) |
      ((a0 >>> 16 & 0xffL) << 24) | ((a0 >>> 24 & 0xffL) << 16) |
      ((b0 & 0xffL) << 8) | (b0 >>> 8 & 0xffL)
  }

  // reusable 4-int result to avoid tuple boxing in the block loop
  private val reg = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](4)
  }

  // per-thread decoded-message words (16 ints per block)
  private val words = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](16)
  }

  /** One MD5 compression of the 64 bytes at `buf[off, off+64)`. */
  private def compress4(
      buf: Array[Byte], off: Int,
      a0: Int, b0: Int, c0: Int, d0: Int): Array[Int] = {
    val mw = words.get()
    var i = 0
    while (i < 16) {
      val p = off + (i << 2)
      mw(i) = (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8) |
        ((buf(p + 2) & 0xff) << 16) | ((buf(p + 3) & 0xff) << 24)
      i += 1
    }
    var a = a0; var b = b0; var c = c0; var d = d0
    i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val sum = f + a + K(i) + mw(g)
      a = d; d = c; c = b
      b = b + java.lang.Integer.rotateLeft(sum, S(i))
      i += 1
    }
    val out = reg.get()
    out(0) = a0 + a
    out(1) = b0 + b
    out(2) = c0 + c
    out(3) = d0 + d
    out
  }
}
