package graft

import graft.functions.{SpaceSavingTopK, SSBuf}
import org.apache.spark.sql.functions._

/** SpaceSaving sketch guarantees (Metwally et al. 2005): bounded state,
  * guaranteed heavy hitters, count over-estimation bounded by the error
  * field — checked against the exact frequency table, plus the sample
  * operator's statistical bounds.
  */
class SketchSpec extends GraftSpec {

  test("distributed sketch estimates bound the exact counts under eviction") {
    import spark.implicits._
    val tokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val exact = tokens.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    // 31-token vocabulary vs capacity 16: every partial sketch evicts and
    // every merge truncates, so this exercises the lossy path end to end.
    val sketch = SparkEntry.queries("udaf_sketch_topk")(spark, sf)
      .select("token", "est_count", "max_error")
      .as[(String, Long, Long)].collect()
    assert(sketch.length == 10)
    sketch.foreach { case (tok, est, err) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(est >= truth && est - truth <= err, s"$tok est=$est true=$truth err=$err")
    }
  }

  test("skewed stream: guaranteed heavy hitters survive partial merges") {
    val agg = new SpaceSavingTopK(8, 8)
    // 500 "hot" + 100 cold items x 3 = N 800; threshold N/8 = 100 < 500
    val stream = new scala.util.Random(7).shuffle(
      (Seq.fill(500)("hot") ++ (1 to 100).flatMap(i => Seq.fill(3)(s"cold_$i")))
        .toList)
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // fold each chunk into its own partial sketch, then merge the partials
    val merged = stream.grouped(100)
      .map(chunk => chunk.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    val out = agg.finish(merged)
    val hot = out.find(_.item == "hot")
    assert(hot.isDefined, "heavy hitter evicted")
    out.foreach { e =>
      val truth = exact.getOrElse(e.item, 0L)
      assert(e.count >= truth && e.count - truth <= e.error,
        s"${e.item} est=${e.count} true=$truth err=${e.error}")
    }
  }

  test("sketch state is bounded by capacity under any input") {
    val agg = new SpaceSavingTopK(8, 5)
    val stream = (1 to 1000).map(i => s"item_${i % 40}")
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(buf.entries.size <= 8)
    val merged = agg.merge(buf, stream.reverse.foldLeft(agg.zero)(agg.reduce))
    assert(merged.entries.size <= 8)
    assert(agg.finish(merged).size <= 5)
  }

  test("count-min: one-sided error, bounded overcount, partials merge") {
    import spark.implicits._
    val agg = new graft.functions.CountMin(4, 256)
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val exact = toks.groupBy("token").count().as[(String, Long)]
      .collect().toMap
    val n = exact.values.sum
    val cmUdaf = udaf(agg)
    val sketch = toks.agg(cmUdaf(col("token"))).head.getSeq[Long](0)
    // CM guarantee: never undercounts; overcount ≤ (e/w)·N whp — use a
    // generous deterministic bound of 4·N/w for the fixed fixture
    exact.foreach { case (tok, truth) =>
      val est = graft.functions.CountMin.estimate(sketch, 4, 256, tok)
      assert(est >= truth, s"$tok undercounted: $est < $truth")
      assert(est - truth <= 4 * n / 256, s"$tok overcount ${est - truth}")
    }
    // mergeability: two partials == one pass
    val half = exact.keys.toSeq.sorted
    val (a, b) = half.splitAt(half.size / 2)
    def fold(keys: Seq[String]) = keys.foldLeft(agg.zero) { (buf, k) =>
      (1L to exact(k)).foldLeft(buf)((bb, _) => agg.reduce(bb, k))
    }
    val merged = agg.merge(fold(a), fold(b))
    assert(merged.toSeq == sketch.toSeq,
      "merged partials must equal the single-pass sketch")
  }

  test("chunked bitmap counts the full long domain, partials merge exactly") {
    val agg = new graft.functions.BitmapDistinct
    // keys far beyond Int.MaxValue (64-bit surrogate ids), negatives,
    // chunk boundaries, and duplicates across the two partials
    val a = Seq(0L, 1L, 65535L, 65536L, Int.MaxValue.toLong + 10,
      5_000_000_000L, -1L, -65536L)
    val b = Seq(1L, 65536L, 5_000_000_000L, 5_000_000_001L,
      Long.MaxValue - 1, Long.MinValue + 1)
    val pa = a.foldLeft(agg.zero)(agg.reduce)
    val pb = b.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(pa, pb)) == (a ++ b).distinct.size.toLong)
    // dense-range sanity: 100k consecutive ids in few chunks
    val dense = (0L until 100000L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(dense) == 100000L)
    assert(dense.size() == 2, "100k consecutive ids must touch 2 chunks")
  }

  test("HLL sketch-merge estimate tracks exact distinct counts") {
    import spark.implicits._
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    val est = SparkEntry.queries("agg_hll_merge")(spark, sf)
      .select("event_type", "est_users")
      .as[(String, Double)].collect()
    assert(est.length == exact.size)
    // lgConfigK=12 → rsd ≈ 1.04/sqrt(2^12) ≈ 1.6%; allow 5%
    est.foreach { case (t, e) =>
      val truth = exact(t).toDouble
      assert(math.abs(e - truth) / truth < 0.05, s"$t est=$e exact=$truth")
    }
  }

  test("seeded sample lands near the expected fraction") {
    import spark.implicits._
    val sampled = SparkEntry.queries("scan_sample")(spark, sf)
      .agg(sum("n_sampled")).as[Long].collect()(0)
    val total = Tables.lineitem(spark, sf).count()
    val frac = sampled.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"fraction $frac out of bounds")
  }
}
