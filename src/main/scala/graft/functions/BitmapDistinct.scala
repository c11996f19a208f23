package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ClickHouse `groupBitmap`: exact distinct count of a dense integer key
  * via a bitmap partial aggregate. The buffer is the bitmap itself, so
  * partials are tiny (|domain|/8 bytes, independent of row count) and
  * merge is a word-wise OR — the scale answer for "exact distinct of a
  * bounded-int key" where COUNT(DISTINCT) would shuffle every value.
  *
  * The buffer is a LIVE mutable java.util.BitSet: Spark's ScalaAggregator
  * is a TypedImperativeAggregate, so the object persists across reduce
  * calls and is encoded only at shuffle boundaries — `set`/`or` mutate in
  * place, O(1) amortized per row (the previous Array[Long] buffer paid a
  * BitSet.valueOf + toLongArray copy per input row).
  *
  * Production note: an unbounded/sparse domain wants RoaringBitmap
  * (compressed containers); `java.util.BitSet` keeps this dependency-free
  * and identical in contract for the dense fixture ids.
  */
class BitmapDistinct extends Aggregator[Long, java.util.BitSet, Long] {

  override def zero: java.util.BitSet = new java.util.BitSet()

  override def reduce(b: java.util.BitSet, v: Long): java.util.BitSet = {
    require(v >= 0 && v < Int.MaxValue, s"bitmap key out of range: $v")
    b.set(v.toInt)
    b
  }

  override def merge(a: java.util.BitSet, b: java.util.BitSet): java.util.BitSet = {
    a.or(b)
    a
  }

  override def finish(b: java.util.BitSet): Long = b.cardinality().toLong

  override def bufferEncoder: Encoder[java.util.BitSet] =
    Encoders.javaSerialization(classOf[java.util.BitSet])
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
