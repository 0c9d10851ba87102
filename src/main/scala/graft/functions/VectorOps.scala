package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

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

  /** Normalized sub-slice of a FLOAT vector as doubles:
    * out(i) = vec(start+i) / ‖vec‖₂ for len elements (0-based start,
    * truncated at the vector end like SQL `slice`). Replaces the HOF
    * `slice(transform(vec, x -> x / l2_norm(vec)), …)` — which re-evaluated
    * the O(d) norm once PER ELEMENT in interpreted lambdas (O(d²) per
    * vector) — with one norm + one pass. Accumulation order matches
    * [[normFloat]] / DuckDB's list arithmetic, so values are
    * bit-identical. Zero norm divides through like the HOF did
    * (IEEE Inf/NaN, no special case). */
  def normSlice(vec: ArrayData, start: Int, len: Int): ArrayData = {
    val nrm = normFloat(vec)
    val n = vec.numElements()
    val m = math.max(0, math.min(len, n - start))
    val out = new Array[Any](m)
    var i = 0
    while (i < m) { out(i) = vec.getFloat(start + i).toDouble / nrm; i += 1 }
    new GenericArrayData(out)
  }

  /** Squared L2 distance between two DOUBLE vectors, accumulated in array
    * order — the kernel form of
    * `aggregate(zip_with(a, b, (x,y) -> (x-y)²), 0.0, acc+v)`.
    * Ragged pairs return null exactly like the HOF (zip_with null-pads
    * the shorter side, the lambda propagates it, and the aggregate
    * collapses to NULL) — so a short vector is excluded from a ranking
    * rather than handed a spuriously small partial distance. Returns a
    * boxed java.lang.Double (null = ragged). */
  def l2sqDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Top-`nProbe` centroid cells by (cosine DESC, cell ASC) — the IVF
    * assignment/probe kernel as ONE tight loop over a centroid matrix.
    *
    * Arithmetic is EXACTLY [[cosineFloat]] per centroid (double
    * accumulation in array order, zero-denominator → 0.0), and the
    * ordering is exactly the struct-compare the expression-per-centroid
    * formulation used — `array_max(struct(cos, -cell))` for the argmax,
    * ascending `array_sort(struct(-cos, cell))` for the probe list — so
    * results are bit-identical to that form. The point is shape: the
    * literal-per-centroid plan is nCells separate expression trees
    * (2·nCells cosine kernels per row at assignment+probe), which at the
    * IVF scale sizing nCells = ⌈√n⌉ overflows the 64 KB JIT method limit
    * and falls out of whole-stage codegen — measured 100×-slice
    * (n=200k, 448 cells): >150 s per kNN-join build vs ~8 s with this
    * kernel. Selection is an insertion pass over a bounded nProbe
    * buffer; iterating cells in ascending order with strictly-greater
    * comparisons makes the (cos DESC, cell ASC) tie-break fall out of
    * insertion stability. */
  def topCellsByCos(vec: ArrayData, cents: Array[Array[Float]],
      nProbe: Int): ArrayData = {
    val m = cents.length
    val take = math.min(nProbe, m)
    val topCos = new Array[Double](take)
    val topCell = new Array[Int](take)
    var filled = 0
    var c = 0
    while (c < m) {
      val cent = cents(c)
      val n = math.min(vec.numElements(), cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = vec.getFloat(i).toDouble; val y = cent(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      if (filled < take || cos > topCos(filled - 1)) {
        // find insertion point: first slot whose cos is STRICTLY less
        // (equal-cos keeps the earlier = smaller cell first)
        var j = if (filled < take) filled else take - 1
        while (j > 0 && topCos(j - 1) < cos) {
          topCos(j) = topCos(j - 1); topCell(j) = topCell(j - 1); j -= 1
        }
        topCos(j) = cos; topCell(j) = c
        if (filled < take) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(topCell, filled))
  }

  /** The maximum cosine over the centroid matrix — [[topCellsByCos]]'s
    * arithmetic at nProbe = 1, returning the COSINE instead of the cell:
    * how well a vector FITS its argmax cell under a frozen quantizer,
    * the per-row term of the index-health drift gauge. */
  def topCosByCentroids(vec: ArrayData, cents: Array[Array[Float]]): Double = {
    var best = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(vec.numElements(), cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = vec.getFloat(i).toDouble; val y = cent(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      if (cos > best) best = cos
      c += 1
    }
    if (cents.length == 0) 0.0 else best
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

  /** Cosine of a float vector against a double vector (computed
    * centroids on a decimal grid) — same accumulation order as
    * [[cosineFloat]], matching DuckDB's CAST-to-DOUBLE list arithmetic. */
  def cosineFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** EXACT replication of `split(trim(text), "\s+")` as both Spark and
    * the DuckDB oracles (`string_split_regex(trim(text), '\s+')`) compute
    * it: trim strips SPACES only (0x20 — NOT Java String.trim, which also
    * strips \t/\n/\r), and the regex split keeps leading/trailing empty
    * tokens (NOT Java split's default trailing-empty drop). Tab/newline-
    * edged text therefore tokenizes with the same boundary "" tokens in
    * kernel, Spark-expression and oracle forms. */
  private def sqlWhitespaceTokens(
      text: org.apache.spark.unsafe.types.UTF8String): Array[String] = {
    val s0 = text.toString
    var b = 0
    var e = s0.length
    while (b < e && s0.charAt(b) == ' ') b += 1
    while (e > b && s0.charAt(e - 1) == ' ') e -= 1
    s0.substring(b, e).split("\\s+", -1)
  }

  /** Distinct word k-shingles of a document, first-occurrence order —
    * semantics of `array_distinct(transform(...))` over whitespace tokens
    * ([[sqlWhitespaceTokens]], identical to `split(trim(text), "\s+")`),
    * as one tight loop instead of an interpreted per-shingle
    * slice+concat. */
  def wordShingles(text: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    val toks = sqlWhitespaceTokens(text)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator
    var x = 0
    while (it.hasNext) {
      arr(x) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      x += 1
    }
    new GenericArrayData(arr)
  }

  private def widen64(h32: Int): Long =
    (h32.toLong << 32) | (Integer.reverse(h32).toLong & 0xffffffffL)

  /** MinHash signature of a shingle set: `numHashes` minima of the hash
    * family g_i(s) = h1(s) + i*h2(s) (Kirsch-Mitzenmacher double hashing
    * — 2 byte scans per shingle, not `numHashes`). Empty input yields all
    * Long.MaxValue, the same "no shingles" sentinel as the HOF form this
    * kernel replaces (16 interpreted Catalyst evals per shingle -> one
    * tight loop inside whole-stage codegen). */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var t = 0
    while (t < n) {
      val s = shingles.getUTF8String(t)
      val a = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x12345678)
      val b = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x5bd1e995)
      val h1 = widen64(a)
      val h2 = widen64(b) | 1L // odd stride => full-period over Z_2^64
      var g = h1
      var i = 0
      while (i < numHashes) {
        if (g < mins(i)) mins(i) = g
        g += h2
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** MinHash signature over the ORACLE-REPRODUCIBLE md5 hash family —
    * the codegen kernel form of the HOF chain
    * `transform(sig_i, array_min(transform(harr, h => (h>>30 + i*(h&2^30-1)) % p)))`
    * with `harr = conv(substring(md5(shingle), 1, 15), 16, 10)` that
    * [[graft.operators.Dedup.nearDuplicatePairsMd5]] shipped as
    * interpreted Catalyst lambdas (numHashes × |sh| evals per row).
    * Bit-identical by construction: h is the first 60 bits of the md5 of
    * the shingle's UTF-8 bytes (= parsing the first 15 lowercase hex
    * chars base-16, always positive), and every g_i term stays under
    * 2^35, so the Long arithmetic cannot overflow and `%` operands are
    * positive in both engines. Empty input yields all Long.MaxValue (the
    * same sentinel as [[minhashSig]]; callers filter empty shingle sets
    * before signing, as the HOF form did). */
  def md5MinhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val prime = 1073741789L
    val mask = 1073741823L // 2^30 - 1
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = md5Digest.get()
    val n = shingles.numElements()
    var t = 0
    while (t < n) {
      md.reset()
      val d = md.digest(shingles.getUTF8String(t).getBytes)
      // first 60 bits: 7 full bytes + the high nibble of byte 7
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = (h << 4) | ((d(7) & 0xffL) >>> 4)
      val base = h >>> 30
      val step = h & mask
      var g = base
      var i = 0
      while (i < numHashes) {
        val v = g % prime
        if (v < mins(i)) mins(i) = v
        g += step
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  /** Signed random-hyperplane signature: bit b of the result =
    * sign(dot(vec, planes[b])). `planes` is a row-major [bits x dim]
    * array baked into the (deterministically seeded) expression. */
  def hyperplaneSig(vec: ArrayData, planes: Array[Double], bits: Int): Int = {
    val dim = planes.length / bits
    val n = math.min(vec.numElements(), dim)
    var sig = 0
    var b = 0
    while (b < bits) {
      val off = b * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += vec.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (dot > 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** 64-bit SimHash of a token array: per token a 64-bit hash (Murmur3
    * 32-bit, seed 42, widened deterministically); each hash bit votes
    * +1/-1 per position; the sign vector is the fingerprint.
    * Near-duplicate texts land within a small Hamming distance (compare
    * with bit_count(a ^ b), a Spark built-in).
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

  /** Banded average-hash (aHash) perceptual fingerprint of a byte
    * payload: 64 evenly-sampled bytes v_j = payload[⌊j·n/64⌋]
    * (j = 0..63), bit_j = [64·v_j > Σv] (strictly-above-mean in exact
    * integer arithmetic — no FP mean), packed as FOUR 16-bit bands
    * band_b = Σ_{j=0..15} bit_{16b+j} << j. Returned banded rather than
    * as one 64-bit word because (a) 4×16 banding is the multi-index
    * recipe that makes Hamming-radius-≤3 search pigeonhole-EXACT (any
    * pair within distance 3 shares at least one intact band), and (b) a
    * signed 64-bit compose would need a sign-bit shift DuckDB's BIGINT
    * `<<` rejects, killing oracle parity.
    *
    * For REAL images, run the same sampling over the codec's luminance
    * grid bytes ([[graft.multimodal.Multimodal.ImageIoCodec]]); over raw
    * payload bytes it is the deterministic oracle-hashable stand-in, the
    * same stub contract as the fake decode. Empty payload → all-zero
    * bands. */
  def aHashBands(payload: Array[Byte]): ArrayData = {
    val out = new Array[Int](4)
    val n = payload.length
    if (n == 0) return new GenericArrayData(out)
    val v = new Array[Int](64)
    var s = 0L
    var j = 0
    while (j < 64) {
      val b = payload(((j.toLong * n) / 64L).toInt) & 0xff
      v(j) = b; s += b; j += 1
    }
    j = 0
    while (j < 64) {
      if (64L * v(j) > s) out(j >> 4) |= (1 << (j & 15))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ALL word k-shingles in document order (non-distinct) — one entry
    * per position, so `posexplode` recovers span positions for
    * substring-span coverage arithmetic. Same tokenization contract as
    * [[wordShingles]] (trim + `\s+`); empty when fewer than k tokens. */
  def wordShinglesAll(text: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    val toks = sqlWhitespaceTokens(text)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - k + 1)
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Spark's `round(x, 0)` on a double: shortest-repr BigDecimal HALF_UP,
    * NaN/Infinity passed through (Catalyst RoundBase codegen does exactly
    * this guard). Kept bit-identical so the quantization oracle's
    * ROUND(...) comparison stays a hash match. */
  private def sparkRound0(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One-pass int8 symmetric quantization stats over a float vector:
    * (absmax, q1, q_sum, mse) with scale = 127/absmax. Reproduces the
    * exact composite-HOF semantics it replaces —
    * `array_max(transform(abs))`, `round(x*scl, 0).cast(int)` per
    * element, `aggregate` sums strictly in array order, `/ size` as
    * double division — so the DuckDB oracle comparison is unchanged.
    * Empty vectors (out of fixture contract) yield an all-null row. */
  def quantStatsFloat(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
    if (n == 0) {
      row.setNullAt(0); row.setNullAt(1); row.setNullAt(2); row.setNullAt(3)
      return row
    }
    var absmax = math.abs(a.getFloat(0).toDouble)
    var i = 1
    while (i < n) {
      val v = math.abs(a.getFloat(i).toDouble)
      // array_max ordering: NaN sorts greater than any double
      if (v > absmax || java.lang.Double.isNaN(v)) absmax = v
      i += 1
    }
    val scl = 127.0 / absmax
    var q1 = 0
    var qsum = 0L
    var sse = 0.0
    i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val q = sparkRound0(x * scl).toInt // non-ANSI double->int cast
      if (i == 0) q1 = q
      qsum += q
      val e = x - q.toDouble / scl
      sse += e * e
      i += 1
    }
    row.update(0, absmax); row.update(1, q1); row.update(2, qsum)
    row.update(3, sse / n)
    row
  }

  /** One-pass character-class counts feeding the quality-feature scorer:
    * (n_chars, n_tokens, n_ws, n_alnum) from the raw UTF-8 bytes — exact
    * replication of `length(text)`, `size(split(trim(text), "\s+"))`,
    * `length(regexp_replace(text, "\s", ""))` and the alnum class of
    * `regexp_replace(text, "[A-Za-z0-9\s]", "")`, without materializing
    * the three rewritten strings or the token array (the replaced chain
    * was 3 full regex passes + a split allocation per row — the dominant
    * cost of quality scoring at the 100× slice).
    *
    * Conventions replicated bit-for-bit:
    *  - trim strips SPACES only (0x20) — Spark `trim`, not String.trim;
    *  - the split keeps boundary empty tokens (limit −1): token count =
    *    (#maximal \s runs in the trimmed text) + 1, and 1 for empty;
    *  - \s is the Java-regex ASCII class [ \t\n\x0B\f\r];
    *  - n_chars counts code points (UTF-8 lead bytes), matching
    *    `length()`; continuation bytes (0b10xxxxxx) collide with no
    *    ASCII class, so non-ASCII code points classify as "other". */
  def qualityCounts(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    var nChars = 0L
    var nWs = 0L
    var nAlnum = 0L
    var i = 0
    while (i < n) {
      val c = bytes(i).toInt & 0xFF
      if ((c & 0xC0) != 0x80) nChars += 1
      if (c == 0x20 || (c >= 0x09 && c <= 0x0D)) nWs += 1
      else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9')) nAlnum += 1
      i += 1
    }
    var s = 0
    var e = n
    while (s < e && bytes(s) == ' ') s += 1
    while (e > s && bytes(e - 1) == ' ') e -= 1
    var nTokens = 1L
    var inWs = false
    i = s
    while (i < e) {
      val c = bytes(i).toInt & 0xFF
      val ws = c == 0x20 || (c >= 0x09 && c <= 0x0D)
      if (ws && !inWs) nTokens += 1
      inWs = ws
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
    row.update(0, nChars)
    row.update(1, nTokens)
    row.update(2, nWs)
    row.update(3, nAlnum)
    row
  }

  /** Hilbert-curve index of a 2-d cell: the classic iterative xy→d walk
    * (quadrant digit + rotation per level, most significant first).
    * Pure integer arithmetic — the same per-level update runs as a
    * chained-CTE DuckDB oracle (Layout.hilbertStageSql). Inputs must lie
    * in [0, 2^order). */
  def hilbertKey(order: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
