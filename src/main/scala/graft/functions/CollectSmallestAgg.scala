package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Aggregation buffer: the cap smallest DISTINCT values seen so far,
  * sorted ascending. Never longer than the cap, anywhere — map side,
  * shuffle, merge — which is the whole point. */
case class SmallestBuf(var items: Array[Long])

/** Bounded distinct-smallest collector: `collect_smallest(x, cap)` =
  * the cap smallest DISTINCT BIGINT values of the group, as a sorted
  * ascending array.
  *
  * This is the skew-safe truncating collector the pair families need
  * (guide §2.5): `sort_array(collect_list(x))` buffers EVERY row of a
  * group in one aggregation buffer (a degenerate mega-group OOMs — a
  * single buffer cannot spill mid-group), and the window-based
  * truncation ships every row of the group to one reducer before
  * dropping any. This buffer is <= cap longs per group AT EVERY
  * STAGE: partial aggregation truncates map-side, so a mega-group
  * ships <= cap values per mapper instead of its full row set, and
  * no task ever holds more than cap values per group. Dedup rides
  * the same sorted buffer (binary-search insert), so upstream
  * `.distinct()` becomes unnecessary for callers that only need
  * distinct-truncated groups.
  */
class CollectSmallestAgg(cap: Int)
    extends Aggregator[Long, SmallestBuf, Array[Long]] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def zero: SmallestBuf = SmallestBuf(Array.emptyLongArray)

  override def reduce(b: SmallestBuf, a: Long): SmallestBuf = {
    val arr = b.items
    val idx = java.util.Arrays.binarySearch(arr, a)
    if (idx >= 0) return b // already present (distinct semantics)
    val ins = -idx - 1
    if (arr.length < cap) {
      val out = new Array[Long](arr.length + 1)
      System.arraycopy(arr, 0, out, 0, ins)
      out(ins) = a
      System.arraycopy(arr, ins, out, ins + 1, arr.length - ins)
      b.items = out
    } else if (ins < cap) {
      // full buffer and a beats the current largest: insert, drop max
      val out = new Array[Long](cap)
      System.arraycopy(arr, 0, out, 0, ins)
      out(ins) = a
      System.arraycopy(arr, ins, out, ins + 1, cap - ins - 1)
      b.items = out
    }
    b
  }

  override def merge(x: SmallestBuf, y: SmallestBuf): SmallestBuf = {
    if (y.items.isEmpty) return x
    if (x.items.isEmpty) { x.items = y.items; return x }
    val a = x.items; val b = y.items
    val out = new Array[Long](math.min(cap, a.length + b.length))
    var i = 0; var j = 0; var k = 0
    while (k < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v } // equal: dedup
      out(k) = take; k += 1
    }
    x.items = if (k == out.length) out else java.util.Arrays.copyOf(out, k)
    x
  }

  override def finish(b: SmallestBuf): Array[Long] = b.items

  override def bufferEncoder: Encoder[SmallestBuf] =
    Encoders.product[SmallestBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CollectSmallestAgg {
  /** Column form: collect_smallest(x, cap) for groupBy().agg(). */
  def collectSmallest(c: Column, cap: Int): Column =
    udaf(new CollectSmallestAgg(cap)).apply(c)
}
