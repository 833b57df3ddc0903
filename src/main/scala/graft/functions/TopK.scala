package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed top-k aggregator (`Aggregator[IN, BUF, OUT]`): keeps the k
  * largest (value, id) pairs per group, ordered by value DESC with id
  * ASC as the deterministic tiebreak.
  *
  * Why an aggregator and not `row_number().over(window)`: the window
  * form shuffles EVERY row to its group's partition before ranking —
  * at 100 TB that is a full-data shuffle to keep k rows per group.
  * The aggregator reduces map-side: each task keeps at most k pairs
  * per group, so only `k × groups × partitions` pairs reach the
  * exchange. Same result (TopKSpec + the x19 oracle prove it), a
  * fraction of the shuffle.
  *
  * The buffer is a plain sorted ArrayBuffer, not a heap: k is
  * report-sized (single digits to hundreds), and for tiny k a binary
  * search + insert into a flat array beats heap constant factors —
  * while staying trivially serializable by the product encoder.
  */
object TopK {

  type Pair = (Double, Long)

  /** Insert keeping `buf` sorted best-first and capped at k. */
  private def insert(buf: ArrayBuffer[Pair], k: Int, p: Pair): ArrayBuffer[Pair] = {
    // ordering: value DESC, id ASC. Double.compare (not >/==) so NaN
    // sorts largest and -0.0 < 0.0 — identical to Spark's SQL double
    // ordering, keeping the documented equivalence to the
    // row_number-window form even on NaN inputs.
    def better(a: Pair, b: Pair): Boolean = {
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
    if (buf.size == k && !better(p, buf.last)) return buf
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(buf(mid), p)) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, p)
    if (buf.size > k) buf.remove(buf.size - 1)
    buf
  }

  case class TopKAgg(k: Int) extends Aggregator[Pair, ArrayBuffer[Pair], Seq[Pair]] {
    override def zero: ArrayBuffer[Pair] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[Pair], a: Pair): ArrayBuffer[Pair] = insert(b, k, a)
    override def merge(b1: ArrayBuffer[Pair], b2: ArrayBuffer[Pair]): ArrayBuffer[Pair] = {
      b2.foreach(insert(b1, k, _))
      b1
    }
    override def finish(r: ArrayBuffer[Pair]): Seq[Pair] = r.toSeq
    override def bufferEncoder: Encoder[ArrayBuffer[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: array<struct<_1: value, _2: id>> of the group's
    * top k, best first.
    */
  def topK(value: Column, id: Column, k: Int): Column =
    udaf(TopKAgg(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(value, id)
}
