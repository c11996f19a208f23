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
    var size = 4
    val sit = b.values().iterator()
    while (sit.hasNext) {
      val c = sit.next()
      size += 8 + 4 + (if (c.dense) ChunkWords * 8 else c.n * 2)
    }
    val bb = java.nio.ByteBuffer.allocate(size)
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

  private def containsOff(c: Container, off: Int): Boolean =
    if (c.dense) (c.words(off >> 6) & (1L << (off & 63))) != 0L
    else {
      var lo = 0
      var hi = c.n
      val t = off.toChar
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (c.arr(mid) < t) lo = mid + 1 else hi = mid
      }
      lo < c.n && c.arr(lo) == t
    }

  /** x ∩ y as a fresh container, or null when empty. Dense∩dense stays
    * word-wise; any sparse side probes the other (Roaring's galloping
    * shape) and the result demotes to sparse when it fits.
    */
  private def intersect(x: Container, y: Container): Container = {
    if (x.dense && y.dense) {
      val w = new Array[Long](ChunkWords)
      var card = 0L
      var i = 0
      while (i < ChunkWords) {
        w(i) = x.words(i) & y.words(i)
        card += java.lang.Long.bitCount(w(i))
        i += 1
      }
      if (card == 0) return null
      val out = new Container
      if (card < SparseMax) {
        // demote: AND results are usually much smaller than their inputs
        val arr = new Array[Char](math.max(card.toInt, 8))
        var k = 0
        var off = 0
        while (off < ChunkWords * 64) {
          if ((w(off >> 6) & (1L << (off & 63))) != 0L) {
            arr(k) = off.toChar; k += 1
          }
          off += 1
        }
        out.arr = arr
        out.n = k
      } else {
        out.words = w
        out.arr = null
      }
      out
    } else {
      // probe the sparse side's sorted offsets against the other
      val (sp, other) = if (!x.dense) (x, y) else (y, x)
      val arr = new Array[Char](math.max(sp.n, 8))
      var k = 0
      var i = 0
      while (i < sp.n) {
        if (containsOff(other, sp.arr(i).toInt)) { arr(k) = sp.arr(i); k += 1 }
        i += 1
      }
      if (k == 0) null
      else {
        val out = new Container
        out.arr = arr
        out.n = k
        out
      }
    }
  }

  private def copyOf(c: Container): Container = {
    val out = new Container
    if (c.dense) { out.words = c.words.clone(); out.arr = null }
    else { out.arr = c.arr.clone(); out.n = c.n }
    out
  }

  /** a ∩ b (chunks absent from either side vanish). */
  def and(a: BM, b: BM): BM = {
    val out = new BM()
    val it = a.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val theirs = b.get(e.getKey)
      if (theirs != null) {
        val c = intersect(e.getValue, theirs)
        if (c != null) out.put(e.getKey, c)
      }
    }
    out
  }

  /** a ∪= b in place. */
  def or(a: BM, b: BM): BM = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = a.get(e.getKey)
      if (mine == null) a.put(e.getKey, copyOf(e.getValue))
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
    val bm = BitmapCodec.fromBytes(v)
    if (!b.seeded) { b.bm = bm; b.seeded = true }
    else b.bm = BitmapCodec.and(b.bm, bm)
    b
  }
  override def merge(a: AndBuf, b: AndBuf): AndBuf =
    if (!a.seeded) b
    else if (!b.seeded) a
    else { a.bm = BitmapCodec.and(a.bm, b.bm); a }
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
    BitmapCodec.or(b, BitmapCodec.fromBytes(v))
  override def merge(a: BitmapCodec.BM, b: BitmapCodec.BM): BitmapCodec.BM =
    BitmapCodec.or(a, b)
  override def finish(b: BitmapCodec.BM): Long = BitmapCodec.cardinality(b)
  override def bufferEncoder: Encoder[BitmapCodec.BM] =
    Encoders.javaSerialization(classOf[BitmapCodec.BM])
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
