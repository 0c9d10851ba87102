package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded top-k as a REAL aggregate (map-side partial heaps), not a
  * window function.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` — the usual
  * top-k-per-group formulation — shuffles EVERY row to its group's
  * partition and sorts there (WindowExec; Spark's WindowGroupLimit
  * pre-filter helps but still ships a sorted run per partition). An
  * aggregate with a bounded buffer instead combines partial top-k heaps
  * map-side, so the exchange carries at most k rows per (group,
  * map-partition): at 100 TB with k=3 and thousands of groups the
  * shuffle is KBs instead of the fact table. This is preference order
  * (b) of the brief — a typed `Aggregator` (ObjectHashAggregate), the
  * idiomatic Spark shape for order-statistics aggregation.
  *
  * Determinism: the ordering is the total order (value, id) descending,
  * so ties cannot reorder across partitionings and the result is
  * oracle-exact.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]]
    with Serializable {
  require(k > 0)

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  /** Insert one (value, id) into an ascending-(value,id) bounded buffer. */
  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = {
    if (b.values.length == k && !gt(a._1, a._2, b.values(0), b.ids(0))) b
    else {
      // position of the first element greater than `a` in ascending order
      var i = 0
      while (i < b.values.length && !gt(b.values(i), b.ids(i), a._1, a._2)) i += 1
      val drop = if (b.values.length == k) 1 else 0 // evict current min
      val nv = new Array[Double](b.values.length - drop + 1)
      val ni = new Array[Long](nv.length)
      System.arraycopy(b.values, drop, nv, 0, i - drop)
      System.arraycopy(b.ids, drop, ni, 0, i - drop)
      nv(i - drop) = a._1; ni(i - drop) = a._2
      System.arraycopy(b.values, i, nv, i - drop + 1, b.values.length - i)
      System.arraycopy(b.ids, i, ni, i - drop + 1, b.values.length - i)
      TopKBuf(nv, ni)
    }
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    var acc = x
    var i = 0
    while (i < y.values.length) { acc = reduce(acc, (y.values(i), y.ids(i))); i += 1 }
    acc
  }

  /** Descending (value, id) — rank 1 first. */
  override def finish(b: TopKBuf): Seq[(Double, Long)] =
    b.values.indices.reverse.map(i => (b.values(i), b.ids(i)))

  /** Total order matching Spark's double ordering (NaN greatest,
    * -0.0 < 0.0) — primitive > would make NaN incomparable and the
    * result partitioning-dependent. */
  private def gt(v1: Double, i1: Long, v2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(v1, v2)
    c > 0 || (c == 0 && i1 > i2)
  }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** Ascending-(value,id) parallel arrays, length ≤ k. */
final case class TopKBuf(values: Array[Double], ids: Array[Long])

object TopK {
  /** The registered UDAF form of [[TopKAggregator]] — one definition of
    * the (value, id) input encoding for every call site (batch query,
    * streaming aggregate, specs). */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
}
