package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer wrapper so encoder derivation stays product-shaped. */
final case class TopKBuf(items: List[(Double, Long)])

/** Typed top-k aggregator: keeps the k (score, id) pairs with the
  * highest score (ties broken by lower id), as a PARTIAL-AGGREGATABLE
  * buffer — Spark runs it map-side before the shuffle, so per key
  * only k entries ever cross the exchange. The window formulation
  * (row_number over score desc, then rk <= k) must shuffle and sort
  * EVERY scored row; this one reduces first. This is extension
  * preference (b) from the build plan: a typed aggregation function,
  * no custom physical operator needed.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def zero: TopKBuf = TopKBuf(Nil)

  // Buffer invariant: items sorted WORST-first, size <= k. The common
  // reduce case — buffer full, x no better than the current worst —
  // is a single comparison with zero allocation, so streaming millions
  // of scored rows through the map-side partial stays cheap.
  def reduce(buf: TopKBuf, x: (Double, Long)): TopKBuf = {
    val items = buf.items
    if (items.lengthCompare(k) >= 0 && !better(x, items.head)) buf
    else {
      val withX = insertWorstFirst(x, items)
      TopKBuf(if (withX.lengthCompare(k) > 0) withX.tail else withX)
    }
  }

  private def insertWorstFirst(
      x: (Double, Long), items: List[(Double, Long)]): List[(Double, Long)] =
    items match {
      case h :: t if better(x, h) => h :: insertWorstFirst(x, t)
      case _ => x :: items
    }

  def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    val all = (a.items ++ b.items).sortWith((x, y) => better(y, x))
    val n = all.length
    TopKBuf(if (n > k) all.drop(n - k) else all)
  }

  def finish(buf: TopKBuf): Seq[(Double, Long)] = buf.items.reverse

  def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder[Seq[(Double, Long)]]()
}
