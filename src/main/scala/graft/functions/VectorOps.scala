package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop kernels invoked from both interpreted eval and generated
  * code (Scala objects compile to static forwarders, so generated Java can
  * call `graft.functions.VectorOps.cosineFloat(a, b)` directly — the call
  * stays inside whole-stage codegen, no boxing, no UDF serialization).
  *
  * Accumulation is double, strictly in array order — deterministic across
  * partitionings and engines.
  */
object VectorOps {

  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def normFloat(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** 64-bit SimHash of a token array: per token a 64-bit hash (xxHash64,
    * seed 42); each hash bit votes +1/-1 per position; the sign vector is
    * the fingerprint. Near-duplicate texts land within a small Hamming
    * distance (compare with bit_count(a ^ b), a Spark built-in).
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
      // widen the 32-bit murmur to 64 bits deterministically
      val h64 = (h.toLong << 32) | (Integer.reverse(h).toLong & 0xffffffffL)
      var j = 0
      while (j < 64) {
        if (((h64 >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}
