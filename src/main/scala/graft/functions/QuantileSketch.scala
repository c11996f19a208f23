package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Mergeable quantile sketch (ClickHouse `quantileTDigestState` /
  * `-Merge` analog; Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", 2019 — public algorithm, merging-digest
  * variant). Dependency-free like the CountMin/SpaceSaving siblings.
  *
  * State is a SORTED list of (mean, weight) centroids bounded by the
  * compression parameter δ: compaction walks the sorted run and merges
  * a cluster while it spans ≤ 1 unit of the k1 scale function
  * k1(q) = (δ/2π)·arcsin(2q−1) — k1's range is δ/2, so the centroid
  * count is hard-bounded at O(δ) independent of W, while k1's infinite
  * derivative at q→0,1 keeps tails near-exact (singleton centroids).
  * That size-bounded criterion is what makes the state MERGEABLE
  * (Agarwal et al., PODS 2012): merge
  * = concatenate + re-compact, so partial states computed per shard /
  * per day / per parquet part fold into the same bounded summary an
  * all-at-once pass would give, within the sketch's rank error.
  *
  * This is the piece `agg_state_merge` (count/sum/min/max states)
  * couldn't cover: percentile states for incremental MV rollups, where
  * exact `percentile` would need the raw rows again. Rank error is
  * O(q(1−q)/δ); with δ=100 the p50 estimate sits within ~1% rank of
  * exact (error-bound + merge-shape-invariance tests in SketchSpec).
  *
  * Estimates depend on input order at the margin (inherent to any
  * bounded quantile summary), so the operator is rows-only: verified by
  * ScalaTest bounds, not a SQL hash oracle.
  *
  * Input is WEIGHTED (value, weight) so one Aggregator serves both
  * phases: raw rows enter as (x, 1); persisted centroids re-enter as
  * (mean, weight) and fold back in by the same rule.
  */
final class QSketch(val delta: Int) extends Serializable {
  // parallel arrays kept sorted by mean after each compact()
  private[functions] var means: Array[Double] = Array.empty
  private[functions] var weights: Array[Long] = Array.empty
  // unsorted insert buffer, folded in by compact()
  private[functions] val pm = ArrayBuffer.empty[Double]
  private[functions] val pw = ArrayBuffer.empty[Long]

  def totalWeight: Long = {
    var s = 0L
    var i = 0
    while (i < weights.length) { s += weights(i); i += 1 }
    var j = 0
    while (j < pw.length) { s += pw(j); j += 1 }
    s
  }

  /** Centroid count of the COMPACTED run — pure (pending inserts are
    * not centroids yet; the old variant compacted as a side effect, so
    * reading a size statistic silently changed later estimates).
    */
  def nCentroids: Int = means.length

  /** Guarded insertion — the one entry point for raw points AND
    * re-entering persisted state rows. A zero/negative weight would
    * silently produce W=0 → NaN quantile walks; a NaN mean would
    * poison the sort. Fail loudly at the boundary instead.
    */
  def insert(m: Double, w: Long): Unit = {
    require(w > 0, s"non-positive centroid weight $w")
    require(!m.isNaN, "NaN centroid mean")
    pm += m
    pw += w
  }

  /** In-place quicksort of the parallel (mean, weight) pairs over
    * [lo0, hi0] by mean — no boxed index sort on the compact hot path.
    */
  private def sortPairs(m: Array[Double], w: Array[Long],
      lo0: Int, hi0: Int): Unit = {
    if (hi0 <= lo0) return
    val stack = new java.util.ArrayDeque[Int]()
    stack.push(lo0); stack.push(hi0)
    while (!stack.isEmpty) {
      val hi = stack.pop(); val lo = stack.pop()
      if (hi - lo < 16) {
        var i = lo + 1
        while (i <= hi) {
          val km = m(i); val kw = w(i)
          var j = i - 1
          while (j >= lo && m(j) > km) {
            m(j + 1) = m(j); w(j + 1) = w(j); j -= 1
          }
          m(j + 1) = km; w(j + 1) = kw
          i += 1
        }
      } else {
        // median-of-three pivot to dodge sorted-input quadratics
        val mid = (lo + hi) >>> 1
        def swap(a: Int, b: Int): Unit = {
          val tm = m(a); m(a) = m(b); m(b) = tm
          val tw = w(a); w(a) = w(b); w(b) = tw
        }
        if (m(mid) < m(lo)) swap(mid, lo)
        if (m(hi) < m(lo)) swap(hi, lo)
        if (m(hi) < m(mid)) swap(hi, mid)
        val pivot = m(mid)
        var i = lo; var j = hi
        while (i <= j) {
          while (m(i) < pivot) i += 1
          while (m(j) > pivot) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (lo < j) { stack.push(lo); stack.push(j) }
        if (i < hi) { stack.push(i); stack.push(hi) }
      }
    }
  }

  /** Fold the pending buffer into the sorted centroid run, then merge
    * adjacent centroids while the t-digest scale bound allows.
    */
  private[functions] def compact(): Unit = {
    if (pm.isEmpty && means.length <= 2 * delta) return
    val sortedLen = means.length
    val n = sortedLen + pm.length
    if (n == 0) return
    val tm = new Array[Double](pm.length)
    val tw = new Array[Long](pm.length)
    var i = 0
    while (i < pm.length) { tm(i) = pm(i); tw(i) = pw(i); i += 1 }
    pm.clear(); pw.clear()
    // the centroid prefix is ALREADY sorted: sort only the pending
    // tail, then merge the two sorted runs — O(p log p + n), no boxing
    sortPairs(tm, tw, 0, tm.length - 1)
    val am = new Array[Double](n)
    val aw = new Array[Long](n)
    var a = 0; var b = 0; var o = 0
    while (a < sortedLen && b < tm.length) {
      if (means(a) <= tm(b)) { am(o) = means(a); aw(o) = weights(a); a += 1 }
      else { am(o) = tm(b); aw(o) = tw(b); b += 1 }
      o += 1
    }
    while (a < sortedLen) { am(o) = means(a); aw(o) = weights(a); a += 1; o += 1 }
    while (b < tm.length) { am(o) = tm(b); aw(o) = tw(b); b += 1; o += 1 }
    val W = { var s = 0L; var j = 0; while (j < n) { s += aw(j); j += 1 }; s }
    val om = ArrayBuffer.empty[Double]
    val ow = ArrayBuffer.empty[Long]
    // k1 scale function: cluster while it spans <= 1 k-unit
    val norm = delta / (2.0 * math.Pi)
    def k1(q: Double): Double = norm * math.asin(2.0 * math.min(1.0, q) - 1.0)
    var curM = am(0)
    var curW = aw(0)
    var wLeft = 0L // weight fully emitted before the current cluster
    var kLeft = k1(0.0)
    var k = 1
    while (k < n) {
      val m = am(k); val w = aw(k)
      val projected = curW + w
      if (k1((wLeft + projected).toDouble / W) - kLeft <= 1.0) {
        // weighted mean, numerically stable for large weights
        curM = curM + (m - curM) * (w.toDouble / projected)
        curW = projected
      } else {
        om += curM; ow += curW
        wLeft += curW
        kLeft = k1(wLeft.toDouble / W)
        curM = m; curW = w
      }
      k += 1
    }
    om += curM; ow += curW
    means = om.toArray
    weights = ow.toArray
  }

  /** Quantile estimate by linear interpolation between centroid
    * midpoints (the classic t-digest read path). q in [0, 1].
    */
  def quantile(q: Double): Double = {
    compact()
    if (means.isEmpty) return Double.NaN
    if (means.length == 1) return means(0)
    val W = totalWeight.toDouble
    val target = q * W
    // cumulative weight at centroid i's midpoint
    var cum = 0.0
    var i = 0
    var prevMid = 0.0
    var prevMean = means(0)
    while (i < means.length) {
      val mid = cum + weights(i) / 2.0
      if (target < mid) {
        if (i == 0) return means(0)
        val frac = (target - prevMid) / (mid - prevMid)
        return prevMean + (means(i) - prevMean) * frac
      }
      cum += weights(i)
      prevMid = mid
      prevMean = means(i)
      i += 1
    }
    means(means.length - 1)
  }
}

/** Typed Aggregator over weighted points. finish() emits the centroid
  * list as (mean, weight) rows — the persistable STATE; quantiles are
  * read from a rebuilt sketch (`QuantileState.quantileOf`) or by
  * folding the state rows back through this same Aggregator.
  */
class QuantileState(delta: Int)
    extends Aggregator[(Double, Long), QSketch, Seq[(Double, Long)]] {

  override def zero: QSketch = new QSketch(delta)

  override def reduce(b: QSketch, in: (Double, Long)): QSketch = {
    b.insert(in._1, in._2)
    if (b.pm.length >= 4 * delta) b.compact()
    b
  }

  override def merge(a: QSketch, b: QSketch): QSketch = {
    b.compact()
    var i = 0
    while (i < b.means.length) {
      a.pm += b.means(i)
      a.pw += b.weights(i)
      i += 1
    }
    a.compact()
    a
  }

  override def finish(b: QSketch): Seq[(Double, Long)] = {
    b.compact()
    b.means.zip(b.weights).toSeq
  }

  override def bufferEncoder: Encoder[QSketch] =
    Encoders.javaSerialization(classOf[QSketch])
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[QuantileState]]'s read-side twin: the same weighted-point fold,
  * finishing with ONE quantile estimate instead of the centroid list —
  * the `-Merge` combinator to QuantileState's `-State`. This is the
  * aggregate the MV routing rule substitutes for `percentile_approx`
  * over a registered sketch projection: exploded (mean, weight) state
  * rows fold back through the same t-digest rule and the requested
  * quantile is read off the merged digest. Same rank-error bound
  * O(q(1−q)/δ) and the same order-sensitivity-at-the-margin, so routed
  * keys are rows-only (SketchSpec asserts the bound on the ROUTED
  * result).
  */
class QuantileMerge(delta: Int, q: Double)
    extends Aggregator[(Double, Long), QSketch, Double] {

  override def zero: QSketch = new QSketch(delta)

  override def reduce(b: QSketch, in: (Double, Long)): QSketch = {
    b.insert(in._1, in._2)
    if (b.pm.length >= 4 * delta) b.compact()
    b
  }

  override def merge(a: QSketch, b: QSketch): QSketch = {
    b.compact()
    var i = 0
    while (i < b.means.length) {
      a.pm += b.means(i)
      a.pw += b.weights(i)
      i += 1
    }
    a.compact()
    a
  }

  override def finish(b: QSketch): Double = b.quantile(q)

  override def bufferEncoder: Encoder[QSketch] =
    Encoders.javaSerialization(classOf[QSketch])
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object QuantileState {
  /** Rebuild a sketch from persisted state rows and read quantiles. */
  def quantileOf(state: Seq[(Double, Long)], delta: Int,
      qs: Seq[Double]): Seq[Double] = {
    val sk = new QSketch(delta)
    state.foreach { case (m, w) => sk.insert(m, w) }
    qs.map(sk.quantile)
  }
}
