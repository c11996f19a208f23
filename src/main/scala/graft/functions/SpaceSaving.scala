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
  * The buffer is a LIVE mutable hash map (Spark's ScalaAggregator keeps
  * the object across reduce calls, encoding it only at shuffle
  * boundaries): the hit path is one HashMap lookup + counter bump, O(1);
  * the O(capacity) minimum scan runs only on the miss-with-full-sketch
  * eviction path. (The previous immutable-List buffer rebuilt a
  * LinkedHashMap per input row.)
  *
  * Results depend on merge order for elements near the eviction boundary
  * (inherent to the sketch), so the operator is verified by ScalaTest
  * properties (guaranteed hitters present; bounds hold) rather than a
  * SQL oracle.
  */
case class SSEntry(item: String, count: Long, error: Long)

object SSBuf {
  final class Counter(var count: Long, var error: Long) extends Serializable
}

/** Mutable sketch state: item → (count, error), ≤ capacity entries. */
final class SSBuf(val capacity: Int) extends Serializable {
  private[functions] val m = new java.util.HashMap[String, SSBuf.Counter]()

  /** Immutable snapshot view (tests / finish). */
  def entries: Seq[SSEntry] = {
    val b = Seq.newBuilder[SSEntry]
    m.forEach((k, c) => b += SSEntry(k, c.count, c.error))
    b.result()
  }
}

class SpaceSavingTopK(capacity: Int, k: Int)
    extends Aggregator[String, SSBuf, Seq[SSEntry]] {

  override def zero: SSBuf = new SSBuf(capacity)

  override def reduce(b: SSBuf, item: String): SSBuf = {
    val c = b.m.get(item)
    if (c != null) c.count += 1
    else if (b.m.size < b.capacity) b.m.put(item, new SSBuf.Counter(1L, 0L))
    else {
      // evict the minimum (count, item) counter; inherit its count as the
      // error bound — O(capacity) scan, miss-with-full-sketch path only
      var minK: String = null
      var minC: SSBuf.Counter = null
      val it = b.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (minC == null || e.getValue.count < minC.count ||
            (e.getValue.count == minC.count && e.getKey < minK)) {
          minK = e.getKey; minC = e.getValue
        }
      }
      b.m.remove(minK)
      b.m.put(item, new SSBuf.Counter(minC.count + 1, minC.count))
    }
    b
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS 2012): an item
    * absent from one side may still have occurred up to that side's
    * minimum counter times, so credit that minimum as both count and
    * error. Keeps est >= true and est - true <= error across the merge
    * tree, and heavy hitters (> N/capacity) always survive truncation.
    */
  override def merge(a: SSBuf, b: SSBuf): SSBuf = {
    if (a.m.isEmpty) return b
    if (b.m.isEmpty) return a
    val cap = a.capacity max b.capacity
    def minOf(x: SSBuf): Long =
      if (x.m.size >= x.capacity) {
        var mn = Long.MaxValue
        x.m.forEach((_, c) => mn = math.min(mn, c.count))
        mn
      } else 0L
    val minA = minOf(a)
    val minB = minOf(b)
    val combined = mutable.ArrayBuffer.empty[SSEntry]
    a.m.forEach { (k, ca) =>
      val cb = b.m.get(k)
      if (cb != null) combined += SSEntry(k, ca.count + cb.count, ca.error + cb.error)
      else combined += SSEntry(k, ca.count + minB, ca.error + minB)
    }
    b.m.forEach { (k, cb) =>
      if (!a.m.containsKey(k)) combined += SSEntry(k, cb.count + minA, cb.error + minA)
    }
    val out = new SSBuf(cap)
    combined.sortBy(e => (-e.count, e.item)).take(cap)
      .foreach(e => out.m.put(e.item, new SSBuf.Counter(e.count, e.error)))
    out
  }

  override def finish(b: SSBuf): Seq[SSEntry] =
    b.entries.sortBy(e => (-e.count, e.item)).take(k)

  override def bufferEncoder: Encoder[SSBuf] =
    Encoders.javaSerialization(classOf[SSBuf])
  override def outputEncoder: Encoder[Seq[SSEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSEntry]]()
}

/** The -State half for PERSISTENCE (ClickHouse `topKState`): emits the
  * COMPLETE buffer (never top-k-truncated) plus a capacity SENTINEL
  * entry, so the -Merge side can DETECT a truncated or
  * capacity-mismatched state instead of silently undercounting — a
  * bare entry list of length < merger capacity is indistinguishable
  * from a genuinely small input, which was exactly the blind spot of
  * the old length check.
  */
object SpaceSavingState {
  /** Reserved item name carrying the builder capacity in `count`.
    * NUL-prefixed: no whitespace-split token can collide with it.
    */
  val Sentinel = "\u0000graft_ss_capacity"
}

class SpaceSavingState(capacity: Int)
    extends Aggregator[String, SSBuf, Seq[SSEntry]] {
  private val inner = new SpaceSavingTopK(capacity, capacity)
  override def zero: SSBuf = inner.zero
  override def reduce(b: SSBuf, item: String): SSBuf = inner.reduce(b, item)
  override def merge(a: SSBuf, b: SSBuf): SSBuf = inner.merge(a, b)
  override def finish(b: SSBuf): Seq[SSEntry] =
    inner.finish(b) :+ SSEntry(SpaceSavingState.Sentinel, capacity.toLong, 0L)
  override def bufferEncoder: Encoder[SSBuf] =
    Encoders.javaSerialization(classOf[SSBuf])
  override def outputEncoder: Encoder[Seq[SSEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSEntry]]()
}

/** The -Merge half of the SpaceSaving state pair (ClickHouse
  * `topKState`/`topKMerge`): each INPUT row is one shard's COMPLETE
  * persisted sketch (its entry list, as finish() emits it), rebuilt into
  * a live buffer and folded through the exact same mergeable-summaries
  * combine as the in-flight partials — so states written to parquet by
  * one job merge in a later job with identical guarantees (heavy hitters
  * survive, est ≥ true, error bound holds across the merge tree).
  */
class SpaceSavingMergeState(capacity: Int, k: Int)
    extends Aggregator[Seq[SSEntry], SSBuf, Seq[SSEntry]] {
  private val inner = new SpaceSavingTopK(capacity, k)
  override def zero: SSBuf = new SSBuf(capacity)
  override def reduce(b: SSBuf, state: Seq[SSEntry]): SSBuf = {
    // ENFORCE the completeness contract via the SpaceSavingState
    // sentinel: a length check alone cannot tell a TRUNCATED state
    // (builder k < builder capacity — minOf() would then credit absent
    // items 0 instead of the evicted min and undercount a guaranteed
    // heavy hitter) from a genuinely small input. The sentinel carries
    // the builder's capacity: missing → the state wasn't persisted by
    // SpaceSavingState (reject), mismatched → the merge-tree error
    // bound no longer holds (reject).
    // POSITIONAL check — finish() appends the sentinel LAST and parquet
    // preserves array order: a DATA item whose string happens to equal
    // the sentinel token (arbitrary binary-ish inputs, not just
    // whitespace tokens) then still merges as data. The old
    // partition()-by-item pulled such an entry out of the list and
    // either aborted a valid merge or silently dropped its count.
    val sentinel = state.lastOption
    require(sentinel.exists(_.item == SpaceSavingState.Sentinel),
      "SpaceSavingMergeState fed a state without the capacity sentinel — " +
        "persist states with SpaceSavingState, not a truncating top-k")
    require(sentinel.get.count == capacity.toLong,
      s"SpaceSavingMergeState(capacity=$capacity) fed a state built at " +
        s"capacity ${sentinel.get.count} — capacities must match")
    val entries = state.init
    val s = new SSBuf(capacity)
    entries.foreach(e => s.m.put(e.item, new SSBuf.Counter(e.count, e.error)))
    inner.merge(b, s)
  }
  override def merge(a: SSBuf, b: SSBuf): SSBuf = inner.merge(a, b)
  override def finish(b: SSBuf): Seq[SSEntry] = inner.finish(b)
  override def bufferEncoder: Encoder[SSBuf] =
    Encoders.javaSerialization(classOf[SSBuf])
  override def outputEncoder: Encoder[Seq[SSEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSEntry]]()
}
