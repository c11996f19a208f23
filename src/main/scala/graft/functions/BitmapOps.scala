package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bitmap ALGEBRA over the chunked layout of [[BitmapDistinct]] — the
  * ClickHouse `groupBitmapState` / `groupBitmapAnd` / `groupBitmapOr`
  * family: build a bitmap per segment, then combine segment bitmaps with
  * set algebra (audience intersection/union) without ever re-touching the
  * fact rows. The bitmap travels between the two aggregation levels as a
  * compact binary column ([nChunks][chunkKey, 1024 words]*), exactly how
  * ClickHouse ships -State columns into an AggregatingMergeTree.
  *
  * Scale: level 1 shuffles fact rows once (by segment); level 2 moves
  * only |segments| bitmaps, each proportional to the touched key ranges.
  */
object BitmapCodec {
  type BM = java.util.HashMap[Long, Array[Long]]
  val chunkWords = 1024

  def toBytes(b: BM): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * (8 + chunkWords * 8))
    bb.putInt(b.size)
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      val w = e.getValue
      var i = 0
      while (i < chunkWords) { bb.putLong(w(i)); i += 1 }
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
      val w = new Array[Long](chunkWords)
      var i = 0
      while (i < chunkWords) { w(i) = bb.getLong; i += 1 }
      m.put(key, w)
      c += 1
    }
    m
  }

  /** a ∩= b (chunks absent from either side vanish). */
  def and(a: BM, b: BM): BM = {
    val out = new BM()
    val it = a.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val theirs = b.get(e.getKey)
      if (theirs != null) {
        val w = new Array[Long](chunkWords)
        var i = 0
        var any = false
        while (i < chunkWords) {
          w(i) = e.getValue()(i) & theirs(i)
          any ||= w(i) != 0L
          i += 1
        }
        if (any) out.put(e.getKey, w)
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
      if (mine == null) a.put(e.getKey, e.getValue.clone())
      else {
        var i = 0
        while (i < chunkWords) { mine(i) |= e.getValue()(i); i += 1 }
      }
    }
    a
  }

  def cardinality(b: BM): Long = {
    var n = 0L
    val it = b.values().iterator()
    while (it.hasNext) {
      val w = it.next()
      var i = 0
      while (i < chunkWords) { n += java.lang.Long.bitCount(w(i)); i += 1 }
    }
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
