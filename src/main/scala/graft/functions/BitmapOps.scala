package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bitmap ALGEBRA over the chunked container layout of [[BitmapDistinct]]
  * — the ClickHouse `groupBitmapState` / `groupBitmapAnd` /
  * `groupBitmapOr` family: build a bitmap per segment, then combine
  * segment bitmaps with set algebra (audience intersection/union) without
  * ever re-touching the fact rows. The bitmap travels between the two
  * aggregation levels as a compact binary column —
  * `[nChunks][chunkKey, form, payload]*` where a sparse container ships
  * its sorted 16-bit offsets (2 B each) and only dense containers ship
  * the full 8 KiB word array — exactly how ClickHouse ships -State
  * columns into an AggregatingMergeTree, with Roaring's size rule
  * deciding the wire form per chunk.
  *
  * Scale: level 1 shuffles fact rows once (by segment); level 2 moves
  * only |segments| bitmaps, each proportional to the keys actually
  * present (sparse chunks no longer pay the dense 8 KiB floor).
  */
object BitmapCodec {
  import BitmapDistinct.{ChunkWords, Container, SparseMax}
  type BM = java.util.HashMap[Long, Container]

  def toBytes(b: BM): Array[Byte] = {
    // Long accumulator: ~135M chunks would overflow an Int and surface
    // as an obscure allocate/BufferOverflow crash instead of this error
    var size = 4L
    val sit = b.values().iterator()
    while (sit.hasNext) {
      val c = sit.next()
      size += 8 + 4 + (if (c.dense) ChunkWords * 8 else c.n * 2)
    }
    require(size <= Int.MaxValue,
      s"bitmap state wire form exceeds 2 GiB ($size bytes) — " +
        "split the group or use an approximate distinct")
    val bb = java.nio.ByteBuffer.allocate(size.toInt)
    bb.putInt(b.size)
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      val c = e.getValue
      if (c.dense) {
        bb.putInt(-1)
        var i = 0
        while (i < ChunkWords) { bb.putLong(c.words(i)); i += 1 }
      } else {
        bb.putInt(c.n)
        var i = 0
        while (i < c.n) { bb.putChar(c.arr(i)); i += 1 }
      }
    }
    bb.array()
  }

  def fromBytes(a: Array[Byte]): BM = {
    val bb = java.nio.ByteBuffer.wrap(a)
    val n = bb.getInt
    val m = new BM(n * 2)
    var c = 0
    while (c < n) {
      val key = bb.getLong
      val form = bb.getInt
      val cont = new Container
      if (form < 0) {
        val w = new Array[Long](ChunkWords)
        var i = 0
        while (i < ChunkWords) { w(i) = bb.getLong; i += 1 }
        cont.words = w
        cont.arr = null
      } else {
        val arr = new Array[Char](math.max(form, 8))
        var i = 0
        while (i < form) { arr(i) = bb.getChar; i += 1 }
        cont.arr = arr
        cont.n = form
      }
      m.put(key, cont)
      c += 1
    }
    m
  }

  /** x ∩= y IN PLACE; returns false when the result is empty (caller
    * removes the chunk). No fresh map or 8 KiB word array per input
    * bitmap — the level-2 AND path runs once per segment row, so the
    * old build-a-new-map-per-row shape was pure GC churn. Dense∩dense
    * ANDs x's own words; a sparse x filters its offsets in place; a
    * dense x probed by a sparse y shrinks to y's surviving offsets
    * (result ⊆ y). Demotion to sparse walks WORDS via
    * numberOfTrailingZeros, not all 65 536 bit positions.
    */
  private def intersectInPlace(x: Container, y: Container): Boolean = {
    if (x.dense && y.dense) {
      var card = 0L
      var i = 0
      while (i < ChunkWords) {
        x.words(i) &= y.words(i)
        card += java.lang.Long.bitCount(x.words(i))
        i += 1
      }
      if (card == 0) return false
      if (card < SparseMax) {
        // demote: AND results are usually much smaller than their inputs
        val arr = new Array[Char](math.max(card.toInt, 8))
        var k = 0
        i = 0
        while (i < ChunkWords) {
          var w = x.words(i)
          while (w != 0L) {
            arr(k) = ((i << 6) | java.lang.Long.numberOfTrailingZeros(w)).toChar
            k += 1
            w &= w - 1 // clear lowest set bit
          }
          i += 1
        }
        x.arr = arr
        x.n = k
        x.words = null
      }
      true
    } else if (!x.dense) {
      // filter x's sorted offsets in place by probing y (either form)
      var k = 0
      var i = 0
      while (i < x.n) {
        if (y.contains(x.arr(i).toInt)) { x.arr(k) = x.arr(i); k += 1 }
        i += 1
      }
      x.n = k
      k > 0
    } else {
      // x dense, y sparse: result ⊆ y — collect y's survivors
      val arr = new Array[Char](math.max(y.n, 8))
      var k = 0
      var i = 0
      while (i < y.n) {
        if (x.contains(y.arr(i).toInt)) { arr(k) = y.arr(i); k += 1 }
        i += 1
      }
      x.arr = arr
      x.n = k
      x.words = null
      k > 0
    }
  }

  /** a ∩= b in place (chunks absent from either side vanish); returns a.
    * MUTATES a only — b is read, never adopted.
    */
  def andInPlace(a: BM, b: BM): BM = {
    val it = a.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val theirs = b.get(e.getKey)
      if (theirs == null || !intersectInPlace(e.getValue, theirs))
        it.remove()
    }
    a
  }

  /** a ∪= b in place; ADOPTS b's containers by reference (the
    * BitmapDistinct.merge contract — both call sites feed deserialized
    * shuffle buffers that are never reused). Callers that need b intact
    * afterwards must pass a copy.
    */
  def or(a: BM, b: BM): BM = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = a.get(e.getKey)
      if (mine == null) a.put(e.getKey, e.getValue)
      else mine.or(e.getValue)
    }
    a
  }

  def cardinality(b: BM): Long = {
    var n = 0L
    val it = b.values().iterator()
    while (it.hasNext) n += it.next().cardinality
    n
  }
}

/** Level 1: long keys → serialized bitmap (`groupBitmapState`). */
class BitmapBuild
    extends Aggregator[Long, BitmapCodec.BM, Array[Byte]] {
  private val inner = new BitmapDistinct
  override def zero: BitmapCodec.BM = inner.zero
  override def reduce(b: BitmapCodec.BM, v: Long): BitmapCodec.BM =
    inner.reduce(b, v)
  override def merge(a: BitmapCodec.BM, b: BitmapCodec.BM): BitmapCodec.BM =
    inner.merge(a, b)
  override def finish(b: BitmapCodec.BM): Array[Byte] = BitmapCodec.toBytes(b)
  override def bufferEncoder: Encoder[BitmapCodec.BM] =
    Encoders.javaSerialization(classOf[BitmapCodec.BM])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** AND's identity is the universe, so the buffer tracks "not yet seeded"
  * explicitly (a serializable holder, not a sentinel bitmap).
  */
class AndBuf extends java.io.Serializable {
  var seeded: Boolean = false
  var bm: BitmapCodec.BM = new BitmapCodec.BM()
}

/** Level 2: serialized bitmaps → |∩ segments| (`groupBitmapAnd`). */
class BitmapAndCard extends Aggregator[Array[Byte], AndBuf, Long] {
  override def zero: AndBuf = new AndBuf
  override def reduce(b: AndBuf, v: Array[Byte]): AndBuf = {
    // skip NULL states (ClickHouse groupBitmapAnd semantics — e.g. a
    // segment enriched via LEFT JOIN with no persisted state): wrapping
    // null would NPE the whole aggregation stage
    if (v == null) return b
    val bm = BitmapCodec.fromBytes(v)
    if (!b.seeded) { b.bm = bm; b.seeded = true }
    else BitmapCodec.andInPlace(b.bm, bm)
    b
  }
  override def merge(a: AndBuf, b: AndBuf): AndBuf =
    if (!a.seeded) b
    else if (!b.seeded) a
    else { BitmapCodec.andInPlace(a.bm, b.bm); a }
  override def finish(b: AndBuf): Long =
    if (b.seeded) BitmapCodec.cardinality(b.bm) else 0L
  override def bufferEncoder: Encoder[AndBuf] =
    Encoders.javaSerialization(classOf[AndBuf])
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Level 2: serialized bitmaps → |∪ segments| (`groupBitmapOr`). */
class BitmapOrCard extends Aggregator[Array[Byte], BitmapCodec.BM, Long] {
  override def zero: BitmapCodec.BM = new BitmapCodec.BM()
  override def reduce(b: BitmapCodec.BM, v: Array[Byte]): BitmapCodec.BM =
    // skip NULL states (the BitmapAndCard rule)
    if (v == null) b else BitmapCodec.or(b, BitmapCodec.fromBytes(v))
  override def merge(a: BitmapCodec.BM, b: BitmapCodec.BM): BitmapCodec.BM =
    BitmapCodec.or(a, b)
  override def finish(b: BitmapCodec.BM): Long = BitmapCodec.cardinality(b)
  override def bufferEncoder: Encoder[BitmapCodec.BM] =
    Encoders.javaSerialization(classOf[BitmapCodec.BM])
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
