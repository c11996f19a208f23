package graft

import graft.functions.{SpaceSavingTopK, SSBuf}
import org.apache.spark.sql.functions._

/** SpaceSaving sketch guarantees (Metwally et al. 2005): bounded state,
  * guaranteed heavy hitters, count over-estimation bounded by the error
  * field — checked against the exact frequency table, plus the sample
  * operator's statistical bounds.
  */
class SketchSpec extends GraftSpec {

  test("KMV set algebra: estimates track exact sizes and intersections") {
    import spark.implicits._
    val got = SparkEntry.queries("udaf_kmv_intersect")(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty, "at least one segment pair")
    val exact = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct()
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    got.foreach { case (a, b, ea, eb, ei, eu, jac) =>
      val (sa, sb) = (exact(a), exact(b))
      def ok(est: Long, ex: Int, what: String): Unit = {
        // k=256 → σ ≈ 1/√k ≈ 6.25%; 4σ + small-count slack
        val tol = math.max(6.0, 0.25 * ex)
        assert(math.abs(est - ex) <= tol, s"$a×$b $what: est $est exact $ex")
      }
      ok(ea, sa.size, "A"); ok(eb, sb.size, "B")
      ok(ei, sa.intersect(sb).size, "inter")
      ok(eu, sa.union(sb).size, "union")
      assert(jac >= 0.0 && jac <= 1.0)
    }
  }

  test("KMV merge is order-insensitive and state-bounded") {
    import graft.operators.UdfOps
    val sk = new UdfOps.KmvSketch(UdfOps.Kmv.K)
    val xs = (1L to 5000L).map(x => x * 2654435761L % 100000L)
    val oneShot = xs.foldLeft(sk.zero)(sk.reduce)
    val (l, r) = xs.splitAt(1234)
    val merged = sk.merge(
      l.foldLeft(sk.zero)(sk.reduce), r.foldLeft(sk.zero)(sk.reduce))
    assert(oneShot == merged, "merge must equal the one-shot fold")
    assert(oneShot.length <= UdfOps.Kmv.K)
    assert(oneShot == oneShot.sorted, "state is kept sorted")
  }

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

  test("merge-state rejects truncated or capacity-mismatched states") {
    import graft.functions.{SpaceSavingMergeState, SpaceSavingState, SSEntry}
    val m = new SpaceSavingMergeState(16, 10)
    // a bare entry list (no sentinel) is indistinguishable from a
    // TRUNCATED top-k persist — which would make minOf() credit absent
    // items 0 and silently undercount a guaranteed heavy hitter
    intercept[IllegalArgumentException] {
      m.reduce(m.zero, Seq(SSEntry("a", 5L, 0L)))
    }
    // a state built at a different capacity breaks the merge-tree bound
    intercept[IllegalArgumentException] {
      m.reduce(m.zero, Seq(SSEntry("a", 5L, 0L),
        SSEntry(SpaceSavingState.Sentinel, 32L, 0L)))
    }
    // the real state builder's output passes, merges, and the sentinel
    // never leaks into the merged top-k
    val b = new SpaceSavingState(16)
    val st = b.finish(Seq("x", "x", "y").foldLeft(b.zero)(b.reduce))
    assert(st.exists(_.item == SpaceSavingState.Sentinel))
    val merged = m.finish(m.reduce(m.zero, st))
    assert(merged.exists(e => e.item == "x" && e.count == 2L))
    assert(!merged.exists(_.item == SpaceSavingState.Sentinel),
      "capacity sentinel must not surface in merged results")
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
    // geometry read from the aggregator itself, not restated as magic
    // literals that could desynchronize from the constructor args
    exact.foreach { case (tok, truth) =>
      val est = graft.functions.CountMin.estimate(
        sketch, agg.depth, agg.width, tok)
      assert(est >= truth, s"$tok undercounted: $est < $truth")
      assert(est - truth <= 4 * n / agg.width, s"$tok overcount ${est - truth}")
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

  test("bitmap sparse containers: huge-spread domain stays small") {
    val agg = new graft.functions.BitmapDistinct
    // 20k keys spread over ~2e13: every key lands in its own 64 Ki chunk,
    // so a dense-only layout would hold 20k × 8 KiB = 160 MB of words
    val keys = (0 until 20000).map(i => i.toLong * 1_000_000_007L)
    val sk = keys.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(sk) == 20000L)
    sk.values().forEach(c => assert(!c.dense, "singleton chunk went dense"))
    // wire form (the -State column): proportional to keys present
    val bytes = graft.functions.BitmapCodec.toBytes(sk)
    assert(bytes.length < (1 << 20),
      s"serialized sparse bitmap ${bytes.length} B; dense floor would be " +
        s"${sk.size().toLong * 8 * 1024} B")
    // shuffle-boundary form (java serialization of the live buffer)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(sk); oos.close()
    assert(bos.size() < (4 << 20),
      s"java-serialized buffer ${bos.size()} B exceeds sparse expectation")
    // round-trip through the codec preserves cardinality
    val rt = graft.functions.BitmapCodec.fromBytes(bytes)
    assert(graft.functions.BitmapCodec.cardinality(rt) == 20000L)
  }

  test("bitmap container promotion: crossing 4096 stays exact") {
    import graft.functions.BitmapDistinct.SparseMax
    val agg = new graft.functions.BitmapDistinct
    // single chunk filled past the threshold by reduce
    val n = SparseMax * 2
    val sk = (0L until n.toLong).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(sk) == n.toLong)
    assert(sk.get(0L).dense, "chunk past 4096 keys must promote to dense")
    // sparse + sparse merge whose UNION crosses the threshold
    val a = (0L until 3000L).foldLeft(agg.zero)(agg.reduce)
    val b = (2000L until 6000L).foldLeft(agg.zero)(agg.reduce)
    assert(!a.get(0L).dense && !b.get(0L).dense)
    val m = agg.merge(a, b)
    assert(agg.finish(m) == 6000L)
    assert(m.get(0L).dense, "merged union of 6000 must be dense")
    // sparse + sparse merge that stays under the threshold
    val c = (0L until 1000L).foldLeft(agg.zero)(agg.reduce)
    val d = (500L until 1500L).foldLeft(agg.zero)(agg.reduce)
    val m2 = agg.merge(c, d)
    assert(agg.finish(m2) == 1500L)
    assert(!m2.get(0L).dense, "1500-key union must stay sparse")
  }

  test("bitmap AND/OR algebra is exact across mixed container forms") {
    import graft.functions.BitmapCodec
    val agg = new graft.functions.BitmapDistinct
    def bm(keys: Seq[Long]) = keys.foldLeft(agg.zero)(agg.reduce)
    // segment A dense in chunk 0, sparse in a far chunk; B overlaps both
    val aKeys = (0L until 5000L) ++ Seq(10_000_000_000L, 10_000_000_001L)
    val bKeys = (4000L until 9000L) ++ Seq(10_000_000_001L, 77L)
    val aS = aKeys.toSet
    val bS = bKeys.toSet
    // andInPlace mutates its left side and or() adopts its right
    // side's containers — build fresh operands per call
    assert(BitmapCodec.cardinality(
      BitmapCodec.andInPlace(bm(aKeys), bm(bKeys))) ==
      (aS & bS).size.toLong)
    assert(BitmapCodec.cardinality(BitmapCodec.or(bm(aKeys), bm(bKeys))) ==
      (aS | bS).size.toLong)
    // codec round-trip preserves both forms bit-exactly
    val rt = BitmapCodec.fromBytes(BitmapCodec.toBytes(bm(aKeys)))
    assert(BitmapCodec.cardinality(BitmapCodec.andInPlace(rt, bm(bKeys))) ==
      (aS & bS).size.toLong)
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

  // ---- mergeable quantile state (QuantileState / QSketch) ----

  /** True rank of estimate v in sorted data, as a fraction of n. */
  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val below = sorted.count(_ <= v)
    below.toDouble / sorted.length
  }

  test("quantile sketch: rank error bounded vs exact, state bounded by δ") {
    val delta = 100
    val agg = new graft.functions.QuantileState(delta)
    // heavy-tailed deterministic data: exp of uniform, fixed seed
    val rnd = new scala.util.Random(42)
    val data = Array.fill(50000)(math.exp(rnd.nextDouble() * 10))
    val sk = data.foldLeft(agg.zero)((b, x) => agg.reduce(b, (x, 1L)))
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = sk.quantile(q)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= 0.02, s"q=$q est=$est rank err $err > 0.02")
    }
    assert(sk.nCentroids <= 2 * delta,
      s"state ${sk.nCentroids} centroids exceeds 2δ")
    assert(sk.totalWeight == data.length)
  }

  test("quantile sketch: estimate is merge-shape invariant within bounds") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val delta = 100
    val agg = new graft.functions.QuantileState(delta)
    val gen = for {
      n <- Gen.choose(500, 3000)
      xs <- Gen.listOfN(n, Gen.choose(-1e6, 1e6))
      nSplits <- Gen.choose(2, 12)
    } yield (xs.toArray, nSplits)
    (1 to 6).foreach { seed =>
      val (data, nSplits) =
        gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val sorted = data.sorted
      // split into shards, sketch each shard independently
      val shards = data.grouped(math.max(1, data.length / nSplits)).toSeq
        .map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, (x, 1L))))
      // two different merge trees: left fold and balanced pairwise
      val leftFold = shards.reduceLeft(agg.merge)
      def pairwise(s: Seq[graft.functions.QSketch]): graft.functions.QSketch =
        if (s.length == 1) s.head
        else pairwise(s.grouped(2).map(g =>
          if (g.length == 2) agg.merge(g(0), g(1)) else g(0)).toSeq)
      // leftFold mutates its operands; rebuild shards for the second tree
      val shards2 = data.grouped(math.max(1, data.length / nSplits)).toSeq
        .map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, (x, 1L))))
      val balanced = pairwise(shards2)
      for (q <- Seq(0.1, 0.5, 0.9); sk <- Seq(leftFold, balanced)) {
        val err = math.abs(rankOf(sorted, sk.quantile(q)) - q)
        assert(err <= 0.05, s"seed=$seed q=$q rank err $err > 0.05")
      }
      assert(leftFold.totalWeight == data.length)
      assert(balanced.totalWeight == data.length)
    }
  }

  test("quantile sketch: persisted state rows fold back losslessly") {
    val delta = 100
    val agg = new graft.functions.QuantileState(delta)
    val rnd = new scala.util.Random(7)
    val data = Array.fill(20000)(rnd.nextGaussian() * 100)
    val sk = data.foldLeft(agg.zero)((b, x) => agg.reduce(b, (x, 1L)))
    val state = agg.finish(sk) // the parquet-persistable centroid rows
    assert(state.map(_._2).sum == data.length)
    // rebuild from state (the -Merge read path) — same bounded error
    val sorted = data.sorted
    val qs = Seq(0.1, 0.5, 0.9)
    val re = graft.functions.QuantileState.quantileOf(state, delta, qs)
    qs.zip(re).foreach { case (q, est) =>
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= 0.03, s"rebuilt q=$q est=$est rank err $err")
    }
  }

  test("agg_topk_state: guarantees survive the parquet state roundtrip") {
    import spark.implicits._
    val exact = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val got = SparkEntry.queries("agg_topk_state")(spark, sf)
      .select("token", "est_count", "max_error")
      .as[(String, Long, Long)].collect()
    assert(got.length == 10)
    got.foreach { case (tok, est, err) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(est >= truth && est - truth <= err,
        s"$tok est=$est true=$truth err=$err")
    }
    // guaranteed heavy hitters (> N/capacity) must be present
    val guaranteed = exact.filter(_._2 > n / 16).keySet
    val present = got.map(_._1).toSet
    assert(guaranteed.subsetOf(present),
      s"missing guaranteed hitters: ${guaranteed -- present}")
  }

  test("stream_quantile_mv: incremental sketch MV tracks exact percentiles") {
    import spark.implicits._
    val rows = SparkEntry.queries("stream_quantile_mv")(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    val exact = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (et, vs) => et -> vs.map(_._2).sorted }
    assert(rows.map(_._1).toSet == exact.keySet)
    rows.foreach { case (et, n, p50, p90, p99) =>
      val vs = exact(et)
      assert(n == vs.length, s"$et folded $n of ${vs.length} events")
      assert(p50 <= p90 && p90 <= p99, s"$et quantiles out of order")
      for ((q, est) <- Seq(0.5 -> p50, 0.9 -> p90)) {
        val rank = vs.count(_ <= est).toDouble / vs.length
        assert(math.abs(rank - q) <= 0.03, s"$et q=$q rank=$rank est=$est")
      }
    }
  }

  test("agg_quantile_state query: ordered percentiles, all groups present") {
    import spark.implicits._
    val rows = SparkEntry.queries("agg_quantile_state")(spark, sf)
      .as[(String, Long, Int, Double, Double, Double)].collect()
    assert(rows.length == 3) // l_returnflag ∈ {A, N, R}
    val exactN = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (g, n, nc, p50, p90, p99) =>
      assert(n == exactN(g), s"$g row count $n != ${exactN(g)}")
      assert(nc <= 8 * 200, s"$g state unexpectedly large")
      assert(p50 <= p90 && p90 <= p99, s"$g quantiles out of order")
    }
    // p50 within 2% rank of the exact median per group
    val exact = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    rows.foreach { case (g, _, _, p50, _, _) =>
      val vs = exact(g)
      val rank = vs.count(_ <= p50).toDouble / vs.length
      assert(math.abs(rank - 0.5) <= 0.02, s"$g p50 rank $rank")
    }
  }

  test("mv_refresh_quantile_delete: spliced sketch rank-bounded pre and post mutation") {
    import spark.implicits._
    // the key's own requires prove pre→qdmv1 / post_refresh→qdmv2 plan
    // shapes, the strict-subset partition read, and (when the proof
    // gate is armed) verbatim survival of un-admitted centroid rows;
    // here the VALUE contract — each probe rank-bounded against exact
    // order statistics of the probe-time row set
    val rows = SparkEntry.queries("mv_refresh_quantile_delete")(spark, sf)
      .as[(String, String, Double, Double)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq ==
      Seq("post_refresh", "pre_mutation"))
    val ev = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(col("ts")).as("day"),
        col("event_type"), col("value").cast("double").as("v"))
    val cut = ev.agg(org.apache.spark.sql.functions
      .date_sub(org.apache.spark.sql.functions.max(col("day")), 7))
      .collect()(0).getDate(0)
    val pre = ev.select(col("event_type"), col("v"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    val post = ev.filter(!(col("event_type") === "click" &&
        col("day") >= org.apache.spark.sql.functions.lit(cut)))
      .select(col("event_type"), col("v"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    rows.foreach { case (probe, g, p50, p90) =>
      assert(p50 <= p90, s"$probe/$g quantiles out of order")
      val vs = if (probe == "pre_mutation") pre(g) else post(g)
      for ((q, est) <- Seq(0.5 -> p50, 0.9 -> p90)) {
        val rank = vs.count(_ <= est).toDouble / vs.length
        assert(math.abs(rank - q) <= 0.03,
          s"$probe/$g q=$q rank=$rank est=$est")
      }
    }
  }

  test("mv_route_quantile: percentile_approx served from the sketch MV, rank-bounded") {
    import spark.implicits._
    // the ROUTED result: plan must read the exploded t-digest projection,
    // never the fact table — the no-oracle key's named correctness test
    val df = SparkEntry.queries("mv_route_quantile")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("lineitem_qtl1_"),
      s"percentile_approx not routed to the sketch MV:\n${p.take(900)}")
    assert(!p.contains("lineitem.parquet"),
      s"routed quantile must not scan the fact table:\n${p.take(900)}")
    val rows = df.as[(String, Double, Double, Double)].collect()
    assert(rows.length == 3) // l_returnflag ∈ {A, N, R}
    // rank-error bound on the ROUTED estimates vs exact order statistics
    // (δ=200 → bound well inside 3% at the median, tails tighter by k1)
    val exact = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    rows.foreach { case (g, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99, s"$g quantiles out of order")
      val vs = exact(g)
      for ((q, est) <- Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99)) {
        val rank = vs.count(_ <= est).toDouble / vs.length
        assert(math.abs(rank - q) <= 0.03, s"$g q=$q rank=$rank est=$est")
      }
    }
    // refresh loop (mv_refresh_quantile): the key's own requires prove
    // pre→qmv1 / post_append→base / post_refresh→qmv2 plan shapes and
    // the O(new-files)-only delta read; here the VALUE contract — every
    // probe's estimates rank-bounded against exact order statistics of
    // the probe's OWN row set (slice pre-append, full set after)
    val refreshRows = SparkEntry.queries("mv_refresh_quantile")(spark, sf)
      .as[(String, String, Double, Double)].collect()
    assert(refreshRows.map(_._1).distinct.sorted.toSeq ==
      Seq("post_append", "post_refresh", "pre_append"))
    val slice = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    val full = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 3 === 0 || col("l_orderkey") % 3 === 1)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    refreshRows.foreach { case (probe, g, p50, p90) =>
      assert(p50 <= p90, s"$probe/$g quantiles out of order")
      val vs = if (probe == "pre_append") slice(g) else full(g)
      for ((q, est) <- Seq(0.5 -> p50, 0.9 -> p90)) {
        val rank = vs.count(_ <= est).toDouble / vs.length
        assert(math.abs(rank - q) <= 0.03,
          s"$probe/$g q=$q rank=$rank est=$est")
      }
    }
    // negative gates on an armed session: shapes the sketch MV cannot
    // serve exactly/at all must stay on the fact table
    val s = graft.Sessions.isolatedClone(spark)
    graft.operators.MvOps.ensureMv(s, sf)
    // (a) a column with no registered sketch
    val other = Tables.lineitem(s, sf).groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p"))
      .queryExecution.executedPlan.toString
    assert(other.contains("lineitem.parquet"),
      s"unregistered quantile column must not route:\n${other.take(600)}")
    // (b) a MIXED query (quantile + count): the scalar defs can't serve
    // the percentile, the sketch def refuses everything else — whole
    // query falls through rather than half-routing
    val mixed = Tables.lineitem(s, sf).groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
        .as("p"), count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(mixed.contains("lineitem.parquet"),
      s"mixed quantile+count must fall through whole:\n${mixed.take(600)}")
    // (c) DISTINCT / FILTER forms have no sketch semantics
    val filtered = Tables.lineitem(s, sf).groupBy(col("l_returnflag"))
      .agg(expr("""percentile_approx(l_extendedprice, 0.5, 1000)
                   filter (where l_linestatus = 'F')""").as("p"))
      .queryExecution.executedPlan.toString
    assert(filtered.contains("lineitem.parquet"),
      s"FILTERed percentile must not route:\n${filtered.take(600)}")
  }
}
