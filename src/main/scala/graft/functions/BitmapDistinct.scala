package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** ClickHouse `groupBitmap`: exact distinct count of a dense integer key
  * via a bitmap partial aggregate. The buffer is the bitmap's word array,
  * so partials are tiny (|domain|/8 bytes, independent of row count) and
  * merge is a word-wise OR — the scale answer for "exact distinct of a
  * bounded-int key" where COUNT(DISTINCT) would shuffle every value.
  * Production note: an unbounded/sparse domain wants RoaringBitmap
  * (compressed containers); `java.util.BitSet` keeps this dependency-free
  * and identical in contract for the dense fixture ids.
  */
class BitmapDistinct extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    require(v >= 0 && v < Int.MaxValue, s"bitmap key out of range: $v")
    val bs = java.util.BitSet.valueOf(b)
    bs.set(v.toInt)
    bs.toLongArray
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val x = java.util.BitSet.valueOf(a)
    x.or(java.util.BitSet.valueOf(b))
    x.toLongArray
  }

  override def finish(b: Array[Long]): Long =
    java.util.BitSet.valueOf(b).cardinality().toLong

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
