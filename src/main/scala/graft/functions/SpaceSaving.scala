package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch (ClickHouse `topK`/`anyHeavy` family;
  * Metwally et al., "Efficient Computation of Frequent and Top-k Elements
  * in Data Streams", ICDT 2005 — public algorithm).
  *
  * Bounded state: at most `capacity` counters. Guarantee: any element with
  * true frequency > N/capacity is present in the sketch, and each
  * reported count overestimates by at most the counter's `error` field.
  * Merge is the standard counter-wise combine (count+error add through
  * the same bound), so the Aggregator is safe as a distributed partial
  * aggregate — the 100 TB answer to "top K values of an unbounded-domain
  * column" where an exact groupBy would shuffle every distinct key.
  *
  * Results depend on merge order for elements near the eviction boundary
  * (inherent to the sketch), so the operator is verified by ScalaTest
  * properties (guaranteed hitters present; bounds hold) rather than a
  * SQL oracle.
  */
case class SSEntry(item: String, count: Long, error: Long)
case class SSBuf(capacity: Int, entries: List[SSEntry])

class SpaceSavingTopK(capacity: Int, k: Int)
    extends Aggregator[String, SSBuf, Seq[SSEntry]] {

  override def zero: SSBuf = SSBuf(capacity, Nil)

  override def reduce(b: SSBuf, item: String): SSBuf = {
    val m = mutable.LinkedHashMap(b.entries.map(e => e.item -> e): _*)
    m.get(item) match {
      case Some(e) => m(item) = e.copy(count = e.count + 1)
      case None if m.size < b.capacity =>
        m(item) = SSEntry(item, 1L, 0L)
      case None =>
        // evict the minimum counter; inherit its count as error bound
        val min = m.values.minBy(e => (e.count, e.item))
        m.remove(min.item)
        m(item) = SSEntry(item, min.count + 1, min.count)
    }
    SSBuf(b.capacity, m.values.toList)
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS 2012): an item
    * absent from one side may still have occurred up to that side's
    * minimum counter times, so credit that minimum as both count and
    * error. Keeps est >= true and est - true <= error across the merge
    * tree, and heavy hitters (> N/capacity) always survive truncation.
    */
  override def merge(a: SSBuf, b: SSBuf): SSBuf = {
    if (a.entries.isEmpty) return b
    if (b.entries.isEmpty) return a
    val cap  = a.capacity max b.capacity
    val minA = if (a.entries.size >= a.capacity) a.entries.map(_.count).min else 0L
    val minB = if (b.entries.size >= b.capacity) b.entries.map(_.count).min else 0L
    val mapA = a.entries.map(e => e.item -> e).toMap
    val mapB = b.entries.map(e => e.item -> e).toMap
    val combined = (mapA.keySet ++ mapB.keySet).toSeq.map { it =>
      (mapA.get(it), mapB.get(it)) match {
        case (Some(x), Some(y)) => SSEntry(it, x.count + y.count, x.error + y.error)
        case (Some(x), None)    => SSEntry(it, x.count + minB, x.error + minB)
        case (None, Some(y))    => SSEntry(it, y.count + minA, y.error + minA)
        case _                  => SSEntry(it, 0L, 0L) // unreachable
      }
    }
    val kept = combined.sortBy(e => (-e.count, e.item)).take(cap)
    SSBuf(cap, kept.toList)
  }

  override def finish(b: SSBuf): Seq[SSEntry] =
    b.entries.sortBy(e => (-e.count, e.item)).take(k)

  override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  override def outputEncoder: Encoder[Seq[SSEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSEntry]]()
}
