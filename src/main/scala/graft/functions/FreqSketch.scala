package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items ("heavy hitters") sketch as a typed
  * Aggregator: at most k-1 counters per buffer, so at 100 TB the
  * shuffle carries O(k) entries per group regardless of vocabulary
  * size — the sub-linear-memory alternative to the exact
  * explode+groupBy top-k (t07) when only the heavy tail matters.
  *
  * Guarantees (standard MG, preserved under merge): every item with
  * true frequency > n/k is present in the output, and each reported
  * count under-estimates the true count by at most n/k (n = stream
  * length). The merge is Agarwal et al.'s mergeable-summaries rule:
  * sum counters, then subtract the k-th largest count from all and
  * drop the non-positive — which keeps the same error bound, so
  * partial aggregation across partitions/executors is sound.
  *
  * Output is (item, lower-bound count) sorted by count desc, item asc.
  */
class FreqSketch(k: Int = 50) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k - 1 => buf.updated(x, 1L)
      case None =>
        // Decrement-all step: drop zeros, the arriving item is absorbed.
        buf.collect { case (i, c) if c > 1 => i -> (c - 1) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = mutable.Map.empty[String, Long]
    a.foreach { case (i, c) => sum(i) = sum.getOrElse(i, 0L) + c }
    b.foreach { case (i, c) => sum(i) = sum.getOrElse(i, 0L) + c }
    if (sum.size < k) sum.toMap
    else {
      // Subtract the k-th largest count, keep the strictly positive —
      // at most k-1 survive, and every count drops by the same bound.
      val kth = sum.values.toArray.sortBy(-_).apply(k - 1)
      sum.collect { case (i, c) if c > kth => i -> (c - kth) }.toMap
    }
  }

  def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (i, c) => (-c, i) }

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
