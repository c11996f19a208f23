package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ClickHouse `groupBitmap`: exact distinct count of an integer key via a
  * bitmap partial aggregate. Partials are tiny (proportional to touched
  * key range, independent of row count) and merge is a container-wise OR —
  * the scale answer for "exact distinct of an int key" where
  * COUNT(DISTINCT) would shuffle every value.
  *
  * Layout is Roaring-shaped but dependency-free: keys are chunked by
  * `v >> 16`, and each chunk holds ONE of two container forms with the
  * real RoaringBitmap promotion rule:
  *
  *  - SPARSE: a sorted array of 16-bit offsets (2 bytes/element) while
  *    cardinality < 4096 — a chunk touched by a single key costs ~16
  *    bytes, not 8 KiB, so very sparse key spreads over huge domains
  *    (surrogate ids hashed across 2^63) stay proportional to the number
  *    of DISTINCT KEYS, not the number of touched 64 Ki ranges;
  *  - DENSE: a 64 Ki-bit word array (1024 longs = 8 KiB) once the 4096
  *    threshold crosses — beyond that point the bitmap is smaller than
  *    the array would be (4096 × 2 B = 8 KiB = the dense cost).
  *
  * The FULL signed-64 domain is accepted — real surrogate keys exceed
  * Int.MaxValue. Merge promotes sparse+sparse to dense only when the
  * union crosses the threshold, so the merge tree keeps the same
  * memory contract as a single pass (SketchSpec asserts serialized
  * partial size on a 10^9-spread domain).
  *
  * The buffer is LIVE and mutable: Spark's ScalaAggregator is a
  * TypedImperativeAggregate, so the map persists across reduce calls and
  * is serialized only at shuffle boundaries — per-row cost is one probe +
  * one sorted-insert or bit-set.
  */
object BitmapDistinct {
  /** Sparse→dense promotion threshold (RoaringBitmap's 4096): above this
    * the 2-byte-per-element array outgrows the fixed 8 KiB bitmap.
    */
  final val SparseMax = 4096
  final val ChunkWords = 1024 // 64 Ki bits

  /** One 64 Ki-key container: sorted Char offsets while sparse, word
    * bitmap once dense (`words != null` ⇒ dense, `arr` dropped).
    */
  final class Container extends Serializable {
    var arr: Array[Char] = new Array[Char](8)
    var n: Int = 0
    var words: Array[Long] = null

    def dense: Boolean = words != null

    private def densify(): Unit = {
      val w = new Array[Long](ChunkWords)
      var i = 0
      while (i < n) {
        val off = arr(i).toInt
        w(off >> 6) |= 1L << (off & 63)
        i += 1
      }
      words = w
      arr = null
      n = 0
    }

    /** Lower bound over the sorted sparse prefix — THE one binary
      * search `add` and `contains` share (previously duplicated in the
      * codec, where a boundary fix could miss one copy).
      */
    private def lowerBound(c: Char): Int = {
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < c) lo = mid + 1 else hi = mid
      }
      lo
    }

    /** Membership probe, both forms. */
    def contains(off: Int): Boolean =
      if (dense) (words(off >> 6) & (1L << (off & 63))) != 0L
      else {
        val c = off.toChar
        val lo = lowerBound(c)
        lo < n && arr(lo) == c
      }

    def add(off: Int): Unit = {
      if (dense) {
        words(off >> 6) |= 1L << (off & 63)
        return
      }
      val c = off.toChar
      val lo = lowerBound(c)
      if (lo < n && arr(lo) == c) return // already present
      if (n == SparseMax) { densify(); add(off); return }
      if (n == arr.length) {
        val grown = new Array[Char](math.min(arr.length * 2, SparseMax))
        System.arraycopy(arr, 0, grown, 0, n)
        arr = grown
      }
      System.arraycopy(arr, lo, arr, lo + 1, n - lo)
      arr(lo) = c
      n += 1
    }

    /** OR `other` into this container. */
    def or(other: Container): Unit = {
      if (other.dense) {
        if (!dense) densify()
        var i = 0
        while (i < ChunkWords) { words(i) |= other.words(i); i += 1 }
      } else if (dense) {
        var i = 0
        while (i < other.n) {
          val off = other.arr(i).toInt
          words(off >> 6) |= 1L << (off & 63)
          i += 1
        }
      } else {
        // sparse ∪ sparse: merge the two sorted runs
        val merged = new Array[Char](math.min(n + other.n, SparseMax + 1))
        var i = 0; var j = 0; var k = 0
        while (i < n && j < other.n && k < merged.length) {
          val a = arr(i); val b = other.arr(j)
          if (a < b) { merged(k) = a; i += 1 }
          else if (b < a) { merged(k) = b; j += 1 }
          else { merged(k) = a; i += 1; j += 1 }
          k += 1
        }
        while (i < n && k < merged.length) { merged(k) = arr(i); i += 1; k += 1 }
        while (j < other.n && k < merged.length) {
          merged(k) = other.arr(j); j += 1; k += 1
        }
        if (k > SparseMax || i < n || j < other.n) {
          // union crosses the threshold: go dense directly from both
          // source runs (the merged prefix is a subset of their union)
          val w = new Array[Long](ChunkWords)
          var x = 0
          while (x < n) {
            val off = arr(x).toInt
            w(off >> 6) |= 1L << (off & 63)
            x += 1
          }
          x = 0
          while (x < other.n) {
            val off = other.arr(x).toInt
            w(off >> 6) |= 1L << (off & 63)
            x += 1
          }
          words = w
          arr = null
          n = 0
        } else {
          arr = merged
          n = k
        }
      }
    }

    def cardinality: Long =
      if (dense) {
        var s = 0L
        var i = 0
        while (i < ChunkWords) {
          s += java.lang.Long.bitCount(words(i)); i += 1
        }
        s
      } else n.toLong
  }
}

class BitmapDistinct
    extends Aggregator[Long, java.util.HashMap[Long, BitmapDistinct.Container], Long] {
  import BitmapDistinct.Container

  override def zero: java.util.HashMap[Long, Container] =
    new java.util.HashMap[Long, Container]()

  override def reduce(b: java.util.HashMap[Long, Container],
      v: Long): java.util.HashMap[Long, Container] = {
    val chunk = v >> 16 // arithmetic shift: negatives get their own chunks
    var c = b.get(chunk)
    if (c == null) { c = new Container; b.put(chunk, c) }
    c.add((v & 0xffffL).toInt)
    b
  }

  // ONE copy of the iterate-adopt-or-merge loop (and its
  // adoption-by-reference contract): BitmapCodec.or — a fix to the
  // adoption semantics applied here alone would silently miss the
  // codec-side callers, and vice versa
  override def merge(a: java.util.HashMap[Long, Container],
      b: java.util.HashMap[Long, Container]): java.util.HashMap[Long, Container] =
    BitmapCodec.or(a, b)

  override def finish(b: java.util.HashMap[Long, Container]): Long = {
    var n = 0L
    val it = b.values().iterator()
    while (it.hasNext) { n += it.next().cardinality }
    n
  }

  override def bufferEncoder: Encoder[java.util.HashMap[Long, BitmapDistinct.Container]] =
    Encoders.javaSerialization(classOf[java.util.HashMap[Long, BitmapDistinct.Container]])
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
