package graft

import org.apache.spark.sql.functions._

/** Round-4 analytics additions: ANOVA, correlation matrix, OHLC
  * downsample, tolerance as-of join, unigram LM score, radius search —
  * each checked against an independent driver-side recomputation on the
  * sf0.001 fixture (the DuckDB oracle is the cross-engine gate; these
  * pin the math itself).
  */
class AnalyticsOpsSpec extends GraftSpec {

  test("ts_holt equals a sequential Holt recursion, bit for bit") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_holt")(spark, sf)
      .as[(Long, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val evs = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val want = evs.groupBy(_._1).map { case (uid, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      var l = xs.head; var b = 0.0
      xs.tail.foreach { x =>
        val nl = 0.3 * x + 0.7 * (l + b)
        b = 0.2 * (nl - l) + 0.8 * b
        l = nl
      }
      uid -> ((xs.length, l, b, l + b))
    }
    assert(got == want)
  }

  test("agg_rank_corr equals naive Spearman with tie-averaged ranks") {
    import spark.implicits._
    val Array(row) = SparkEntry.queries("agg_rank_corr")(spark, sf)
      .as[(Long, Double)].collect()
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("double"),
        col("l_discount").cast("double"))
      .as[(Double, Double)].collect()
    def avgRanks(xs: Array[Double]): Array[Double] = {
      val byVal = xs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](xs.length)
      var i = 0
      while (i < byVal.length) {
        var j = i
        while (j < byVal.length && byVal(j)._1 == byVal(i)._1) j += 1
        val r = (i + 1 + j) / 2.0 // average of ranks i+1..j
        (i until j).foreach(k => out(byVal(k)._2) = r)
        i = j
      }
      out
    }
    val rq = avgRanks(rows.map(_._1)); val rd = avgRanks(rows.map(_._2))
    val n = rows.length.toDouble
    val (sq, sd) = (rq.sum, rd.sum)
    val sqq = rq.map(x => x * x).sum; val sdd = rd.map(x => x * x).sum
    val sqd = rq.zip(rd).map { case (a, b) => a * b }.sum
    val rho = (n * sqd - sq * sd) /
      math.sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd))
    assert(row._1 == rows.length)
    assert(math.abs(row._2 - rho) < 1e-5, s"got ${row._2}, want $rho")
  }

  test("agg_auc equals the naive pairwise win probability") {
    import spark.implicits._
    val Array((n1, n2, auc)) = SparkEntry.queries("agg_auc")(spark, sf)
      .as[(Long, Long, Double)].collect()
    val evs = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type") === "purchase", col("value"))
      .as[(Boolean, Double)].collect()
    val pos = evs.filter(_._1).map(_._2); val neg = evs.filterNot(_._1).map(_._2)
    assert(n1 == pos.length && n2 == neg.length)
    var wins = 0.0
    pos.foreach(p => neg.foreach { q =>
      if (p > q) wins += 1 else if (p == q) wins += 0.5
    })
    val want = wins / (pos.length.toDouble * neg.length)
    assert(math.abs(auc - want) < 1e-5, s"got $auc, want $want")
  }

  test("fn_id: roundtrip decodes, time-sortable, unique on the fixture") {
    import spark.implicits._
    val rows = SparkEntry.queries("fn_id")(spark, sf)
      .select(col("sfid"), col("ms_dec"), col("ok"))
      .as[(Long, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._3), "every decode must match")
    assert(rows.map(_._1).distinct.length == rows.length, "ids unique")
    // sorting by id must equal sorting by decoded timestamp (stable
    // within a ms by shard/seq — time-prefix property of the layout)
    val byId = rows.sortBy(_._1).map(_._2)
    assert(byId.sameElements(byId.sorted), "id order is time order")
  }

  test("ts_period_detect: one winner, acf bounded, pair counts shrink") {
    import spark.implicits._
    val rows = SparkEntry.queries("ts_period_detect")(spark, sf)
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length == 47 && rows.map(_._1).toSeq == (2L to 48L))
    assert(rows.count(_._4 == 1) == 1, "exactly one best lag")
    assert(rows.forall(r => r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9))
    // n_pairs = series_length - lag: strictly decreasing by 1
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 == a._2 - 1, s"pair counts must shrink by 1: $a -> $b")
    }
  }

  test("ts_changepoint equals the naive argmax-|CUSUM| recomputation") {
    import spark.implicits._
    val Array((tStar, cusum, _, _)) =
      SparkEntry.queries("ts_changepoint")(spark, sf)
        .as[(java.sql.Timestamp, Double, Double, Double)].collect()
    val counts = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("h")).count()
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val hours = counts.keys.map(_.getTime).toSeq
    val spine = (hours.min to hours.max by 3600000L).map { ms =>
      counts.getOrElse(new java.sql.Timestamp(ms), 0L)
    }
    val tot = spine.sum.toDouble; val n = spine.length.toDouble
    var prefix = 0L; var best = 0.0; var bestT = -1; var t = 0
    spine.foreach { x =>
      t += 1; prefix += x
      val c = prefix - t * (tot / n)
      if (math.abs(c) > best) { best = math.abs(c); bestT = t }
    }
    assert(tStar.getTime == hours.min + (bestT - 1) * 3600000L)
    assert(math.abs(math.abs(cusum) - best) < 1e-6)
  }

  test("graph_triangle_count equals brute force on the co-purchase graph") {
    import spark.implicits._
    val Array((nTri, _)) = SparkEntry.queries("graph_triangle_count")(spark, sf)
      .as[(Long, Long)].collect()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect()
    // affinity graph: pair must co-occur in >= 2 distinct orders
    val edges = li.groupBy(_._1).toSeq.flatMap { case (ok, lines) =>
      val ps = lines.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield ((ps(i), ps(j)), ok)
    }.groupBy(_._1)
      // .filter + .keySet, NOT .collect: Map.collect over tuple-valued
      // results rebuilds a Map and silently dedups edges by first node
      .filter { case (_, occs) => occs.map(_._2).distinct.size >= 2 }
      .keySet
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    var want = 0L
    edges.foreach { case (a, b) =>
      adj.getOrElse(a, Set.empty).foreach { c =>
        if (c > b && edges.contains((b, c))) want += 1
      }
    }
    assert(nTri == want, s"got $nTri triangles, brute force says $want")
  }

  test("graph edge cache is keyed per session — no stale cross-session reuse") {
    import graft.operators.DedupGraph
    // a localCheckpoint'd DataFrame is bound to its owning session's
    // context: a dir-only cache key would hand session B a frame built
    // under session A (and, as a library, one backed by DEAD checkpoint
    // RDDs after A's context stops). Prove each session derives its own
    // entry and both compute identical results.
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val r1 = SparkEntry.queries("graph_triangle_count")(s1, sf).collect()
      .map(_.toString).toSeq
    val k1 = DedupGraph.edgeCache.keys
    val r2 = SparkEntry.queries("graph_triangle_count")(s2, sf).collect()
      .map(_.toString).toSeq
    val k2 = DedupGraph.edgeCache.keys
    // key carries the fixture fingerprint (stale-testdata guard), so
    // match on the dir prefix rather than equality
    assert(k1.exists { case (s, d) => (s eq s1) && d.startsWith(s"$sf@") })
    assert(k2.exists { case (s, d) => (s eq s2) && d.startsWith(s"$sf@") },
      "second session must derive its own cache entry, not reuse s1's")
    assert(r1 == r2)
  }

  test("udaf_uniq_upto caps at 6 and is exact below the cap") {
    import spark.implicits._
    val got = SparkEntry.queries("udaf_uniq_upto")(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val exact = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty && got.keySet == exact.keySet)
    got.foreach { case (u, v) =>
      assert(v == math.min(exact(u), 6L), s"user $u: $v vs exact ${exact(u)}")
    }
    assert(got.values.exists(_ == 6L) || exact.values.max < 6L,
      "fixture should exercise the cap")
  }

  test("sample_soft_dedup: effective mass bounded by raw and unique") {
    import spark.implicits._
    val rows = SparkEntry.queries("sample_soft_dedup")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nUniq, eff) =>
      assert(nUniq <= nDocs, src)
      assert(eff <= 1000000L * nDocs, src)
      // every doc keeps at least 1/nDocs-global of a unit of mass
      assert(eff > 0L, src)
    }
  }

  test("dtw: identity, symmetry, pointwise-L1 upper bound, shift absorption") {
    import graft.operators.EventAnalytics.dtw
    val x = Seq(1.0, 3.0, 2.0, 5.0, 4.0)
    val y = Seq(2.0, 1.0, 4.0, 2.0, 6.0)
    assert(dtw(x, x) == 0.0)
    assert(dtw(x, y) == dtw(y, x))
    val l1 = x.zip(y).map { case (a, b) => math.abs(a - b) }.sum
    assert(dtw(x, y) <= l1 + 1e-12, "DTW never exceeds the rigid alignment")
    // a phase shift that wrecks pointwise distance is absorbed by DTW
    val spike = Seq(0.0, 0.0, 9.0, 0.0, 0.0)
    val shifted = Seq(0.0, 0.0, 0.0, 9.0, 0.0)
    assert(dtw(spike, shifted) == 0.0, "one-step shift aligns at zero cost")
    assert(spike.zip(shifted).map(p => math.abs(p._1 - p._2)).sum == 18.0)
  }

  test("ts_dtw: pair grid over top users, self-consistent with local dtw") {
    import graft.operators.EventAnalytics.dtw
    import spark.implicits._
    val rows = SparkEntry.queries("ts_dtw")(spark, sf)
      .as[(Long, Long, Int, Int, Double)].collect()
    val k = ((1 + math.sqrt(1 + 8.0 * rows.length)) / 2).round.toInt
    assert(k * (k - 1) / 2 == rows.length, "a full a<b pair grid")
    rows.foreach { case (a, b, la, lb, d) =>
      assert(a < b && la > 0 && lb > 0 && d >= 0.0)
    }
    // recompute one pair end-to-end from the raw events
    val (ua, ub, _, _, want) = rows.head
    def series(u: Long): Seq[Double] = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("user_id") === u)
      .groupBy(to_date(col("ts")).as("d")).count()
      .orderBy(col("d")).as[(java.sql.Date, Long)]
      .collect().map(_._2.toDouble).toSeq
    val local = dtw(series(ua), series(ub))
    assert(math.abs(math.rint(local * 1e6) / 1e6 - want) < 1e-9,
      s"pair ($ua,$ub): $local vs $want")
  }

  test("lttb: endpoints kept, size exact, subset of input, spikes survive") {
    import graft.operators.EventAnalytics.lttb
    // deterministic sawtooth with one extreme spike per 10-point block
    val pts = (0 until 100).map { i =>
      val v = if (i % 10 == 5) 1000.0 + i else (i % 7).toDouble
      (i.toLong, v)
    }
    val out = lttb(pts, 12)
    assert(out.length == 12)
    assert(out.head == pts.head && out.last == pts.last)
    assert(out.map(_._1) == out.map(_._1).sorted, "t must stay ordered")
    assert(out.forall(pts.contains), "output must be a subset of the input")
    // visual-shape preservation: the output must carry real amplitude —
    // its value range spans the spike band, not just the flat floor
    // (LTTB legitimately ALTERNATES extremes after a kept spike, so
    // per-bucket spike retention is not an invariant; range is)
    assert(out.map(_._2).max >= 1000.0, "all spikes lost")
    assert(out.map(_._2).min <= 6.0, "floor lost")
    // hand-computed golden (buckets=2): bucket0 keeps the spike (1,10)
    // vs centroid (3.5, 2.5) of bucket1; bucket1 then keeps (4,0) — the
    // alternation — because prev=(1,10) makes (3,5) collinear (area 0)
    val golden = lttb(IndexedSeq((0L, 0.0), (1L, 10.0), (2L, 0.0),
      (3L, 5.0), (4L, 0.0), (5L, 0.0)), 4)
    assert(golden == IndexedSeq((0L, 0.0), (1L, 10.0), (4L, 0.0), (5L, 0.0)),
      s"golden mismatch: $golden")
    // degenerate shapes
    assert(lttb(pts, 200) == pts, "n >= len returns the series unchanged")
    assert(lttb(pts.take(2), 10) == pts.take(2))
    val two = lttb(pts, 2)
    assert(two == IndexedSeq(pts.head, pts.last))
    // operator output agrees with a direct application per series
    val op = SparkEntry.queries("ts_lttb")(spark, sf)
    val n = op.groupBy(col("event_type")).count().collect()
    assert(n.nonEmpty && n.forall(_.getLong(1) <= 20))
  }

  test("graph_pagerank_step equals a sequential fixed-point recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("graph_pagerank_step")(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (k, pr, n) => k -> ((pr, n)) }.toMap
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey").as[(Long, Long)].collect()
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val edges = li.flatMap { case (ok, sk) => ord.get(ok).map(_ -> sk) }
      .distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length).toMap
    val want = edges.groupBy(_._2).view.mapValues { es =>
      (150000L + es.map(e => 850000L / outdeg(e._1)).sum, es.length.toLong)
    }.toMap
    assert(got == want)
  }

  test("seq_next_node: successor of the FIRST signup, null when last") {
    import spark.implicits._
    val got = SparkEntry.queries("seq_next_node")(spark, sf)
      .as[(Long, Option[String])].collect().toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val want = evs.groupBy(_._1).collect { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val i = ordered.indexWhere(_._4 == "signup")
      if (i < 0) None
      else Some(u -> ordered.lift(i + 1).map(_._4))
    }.flatten.toMap
    assert(got == want)
  }

  test("agg_anova matches an independent one-way ANOVA") {
    import spark.implicits._
    val row = SparkEntry.queries("agg_anova")(spark, sf)
      .select("k", "n_total", "f_stat")
      .as[(Int, Long, Double)].collect().head
    val vals = Tables.events(spark, sf)
      .select("event_type", "value").as[(String, Double)].collect()
    val groups = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = vals.length.toDouble
    val grand = vals.map(_._2).sum / n
    val ssb = groups.values.map { g =>
      val m = g.sum / g.length; g.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { g =>
      val m = g.sum / g.length; g.map(v => (v - m) * (v - m)).sum
    }.sum
    val f = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
    assert(row._1 == groups.size && row._2 == vals.length)
    assert(math.abs(row._3 - f) < 1e-3, s"F: ${row._3} vs $f")
  }

  test("agg_corr_matrix matches independent Pearson per pair") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_corr_matrix")(spark, sf)
      .as[(String, Double)].collect().toMap
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rows = Tables.lineitem(spark, sf).select(cols.map(col): _*)
      .as[(Double, Double, Double, Double)].collect()
      .map(t => Array(t._1, t._2, t._3, t._4))
    def corr(i: Int, j: Int): Double = {
      val n = rows.length.toDouble
      val (x, y) = (rows.map(_(i)), rows.map(_(j)))
      val (sx, sy) = (x.sum, y.sum)
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      (n * sxy - sx * sy) / math.sqrt(
        (n * x.map(v => v * v).sum - sx * sx) *
          (n * y.map(v => v * v).sum - sy * sy))
    }
    assert(got.size == 6)
    for (i <- cols.indices; j <- cols.indices if i < j) {
      val want = corr(i, j)
      val g = got(s"${cols(i)}~${cols(j)}")
      assert(math.abs(g - want) < 1e-4, s"${cols(i)}~${cols(j)}: $g vs $want")
    }
  }

  test("ts_downsample OHLC equals a per-bucket sequential recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_downsample")(spark, sf)
      .select("user_id", "bucket", "n_events", "open", "high", "low", "close")
      .as[(Long, java.sql.Timestamp, Long, Double, Double, Double, Double)]
      .collect()
    assert(got.nonEmpty)
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
    val byBucket = raw.groupBy(e => (e._1, e._2.getTime / 1000 / 300 * 300))
    assert(got.length == byBucket.size)
    got.foreach { case (uid, bucket, nEv, open, high, low, close) =>
      val evs = byBucket((uid, bucket.getTime / 1000))
        .sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
      assert(evs.length == nEv, s"($uid,$bucket) count")
      assert(open == evs.head._4 && close == evs.last._4, s"($uid,$bucket) o/c")
      assert(high == evs.map(_._4).max && low == evs.map(_._4).min)
    }
  }

  test("join_asof_tol: latest prior view within 15 min, else null") {
    import spark.implicits._
    val got = SparkEntry.queries("join_asof_tol")(spark, sf)
      .as[(Long, Option[Long])].collect().toMap
    val evs = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts")
      .as[(Long, Long, String, java.sql.Timestamp)].collect()
    val views = evs.filter(_._3 == "view").groupBy(_._2)
    val purchases = evs.filter(_._3 == "purchase")
    assert(got.size == purchases.length)
    // compare at the fixture's FULL µs precision: getTime truncates to
    // ms, so same-ms-different-µs views would diverge from the
    // operator's full-timestamp window ordering
    purchases.foreach { case (pid, uid, _, pts) =>
      val pUs = tsUs(pts)
      val want = views.getOrElse(uid, Array.empty)
        .filter(v => tsUs(v._4) < pUs && tsUs(v._4) >= pUs - 900000000L)
        .sortBy(v => (-tsUs(v._4), -v._1)).headOption.map(_._1)
      assert(got(pid) == want, s"purchase $pid: ${got(pid)} vs $want")
    }
  }

  test("text_lm_score: rare-token docs score below stopword-soup docs") {
    import spark.implicits._
    val scores = SparkEntry.queries("text_lm_score")(spark, sf)
      .select("doc_id", "n_tokens", "lm_score")
      .as[(Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(scores.length == docs.size)
    // independent recompute of the corpus unigram model
    val counts = docs.values.flatMap(_.split(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum.toDouble
    scores.foreach { case (id, nTok, score) =>
      val toks = docs(id).split(" ")
      assert(toks.length == nTok)
      val want = toks.map(t => math.log(counts(t) / total)).sum / toks.length
      assert(math.abs(score - want) < 1e-4, s"doc $id: $score vs $want")
      assert(score < 0)
    }
  }

  test("dedup_semantic: keep set equals brute-force SemDeDup per cluster") {
    import spark.implicits._
    val rows = SparkEntry.queries("dedup_semantic")(spark, sf)
      .select("vec_id", "cluster", "keep")
      .as[(Long, Int, Boolean)].collect()
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    assert(rows.length == embs.size)
    rows.groupBy(_._2).foreach { case (c, members) =>
      val ids = members.map(_._1).sorted
      val kept = members.filter(_._3).map(_._1).toSet
      // brute-force survivorship in id order within the cluster
      ids.foreach { id =>
        val dup = ids.filter(_ < id)
          .exists(e => round6(refCos(embs(e), embs(id))) >= 0.35)
        assert(kept.contains(id) == !dup, s"cluster $c vec $id")
      }
    }
    // something must actually be dropped for the op to mean anything
    assert(rows.exists(!_._3), "no near-duplicates dropped")
  }

  test("decontam_exact matches an independent substring scan") {
    import spark.implicits._
    val got = SparkEntry.queries("decontam_exact")(spark, sf)
      .as[(Long, String, Long)].collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val evals = docs.filter(_._1 % 97 == 0)
    assert(got.length == evals.length)
    got.foreach { case (eid, needle, n) =>
      val text = docs.find(_._1 == eid).get._2
      assert(needle == text.split(" ").take(3).mkString(" "))
      val want = docs.count { case (id, t) =>
        id % 97 != 0 && t.contains(needle)
      }
      assert(n == want, s"eval $eid: $n vs $want")
    }
  }

  test("sample_temperature: shares flatten the source distribution") {
    import spark.implicits._
    val rows = SparkEntry.queries("sample_temperature")(spark, sf)
      .as[(String, Long, Double, Long)].collect()
    val nTotal = rows.map(_._2).sum
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares sum to 1")
    rows.foreach { case (src, n, share, kept) =>
      assert(kept <= n, src)
      val want = math.min(n,
        math.floor(share * math.floor(nTotal * 0.2)).toLong)
      assert(kept == want, s"$src: $kept vs $want")
    }
    // temperature flattens: kept share of a big source < its natural share
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    assert(big._4.toDouble / big._2 <= small._4.toDouble / small._2 + 1e-9,
      "head not downsampled relative to tail")
  }

  test("dedup_prefix groups exactly by 8-token prefix, keeps first") {
    import spark.implicits._
    val got = SparkEntry.queries("dedup_prefix")(spark, sf)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val groups = docs.groupBy(_._2.split(" ").take(8).mkString(" "))
    assert(got.size == groups.size)
    groups.values.foreach { ms =>
      val ids = ms.map(_._1).sorted
      assert(got.get(ids.head).contains(ids.length.toLong),
        s"group of ${ids.head}")
      ids.tail.foreach(id => assert(!got.contains(id), s"dup $id survived"))
    }
  }

  test("fn_hash digests match java.security.MessageDigest") {
    import spark.implicits._
    val rows = SparkEntry.queries("fn_hash")(spark, sf)
      .as[(Long, String, String, Long)].collect()
    val names = Tables.customer(spark, sf)
      .select("c_custkey", "c_name").as[(Long, String)].collect().toMap
    def hex(alg: String, s: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { case (k, m, sh, bucket) =>
      assert(m == hex("MD5", names(k)))
      assert(sh == hex("SHA-256", names(k)))
      assert(bucket == java.lang.Long.parseLong(m.take(8), 16) % 1024)
    }
  }

  test("win_running_distinct equals a sequential seen-set scan") {
    import spark.implicits._
    val got = SparkEntry.queries("win_running_distinct")(spark, sf)
      .select("event_id", "n_distinct_types")
      .as[(Long, Long)].collect().toMap
    val evs = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts")
      .as[(Long, Long, String, java.sql.Timestamp)].collect()
    assert(got.size == evs.length)
    evs.groupBy(_._1).values.foreach { es =>
      val seen = scala.collection.mutable.Set[String]()
      es.sortBy(e => (e._4.getTime, e._4.getNanos, e._2)).foreach { e =>
        seen += e._3
        assert(got(e._2) == seen.size, s"event ${e._2}")
      }
    }
  }

  test("fn_retention_matrix: triangle counts match a direct recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("fn_retention_matrix")(spark, sf)
      .as[(java.sql.Timestamp, Int, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    val dayMs = 24L * 3600 * 1000
    val e = Tables.events(spark, sf)
      .select("user_id", "ts").as[(Long, java.sql.Timestamp)].collect()
      .map { case (u, t) => (u, t.getTime / dayMs * dayMs) }.distinct
    val cohort = e.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = e.map { case (u, d) =>
      (cohort(u), ((d - cohort(u)) / dayMs).toInt) -> u
    }.filter(_._1._2 <= 7).groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(got == want)
    // offset 0 row of each cohort counts the whole cohort
    cohort.values.toSeq.distinct.foreach { d =>
      assert(got((d, 0)) == cohort.count(_._2 == d).toLong)
    }
  }

  test("tok_bpe_step: top merge candidates match a sequential count") {
    import spark.implicits._
    val got = SparkEntry.queries("tok_bpe_step")(spark, sf)
      .as[(String, Long)].collect()
    val words = Tables.documents(spark, sf)
      .select("text").as[String].collect().flatMap(_.split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairs = scala.collection.mutable.Map[String, Long]()
    words.foreach { case (w, f) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairs(p) = pairs.getOrElse(p, 0L) + f
      }
    }
    val want = pairs.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == want)
  }

  test("dataset_fingerprint is order-independent and content-sensitive") {
    import spark.implicits._
    // fingerprint is emitted as a canonical digit STRING (the >2^63
    // DECIMAL representation diverged between engine comparators in r4)
    val base = SparkEntry.queries("dataset_fingerprint")(spark, sf)
      .select("source", "fingerprint")
      .as[(String, String)].collect().toMap
    // independent recompute: JCA sha256, 60-bit prefix, plain BigInt sum
    val docs = Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val want = docs.groupBy(_._1).view.mapValues(_.map { case (_, t) =>
      val hex = md.digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      BigInt(hex, 16)
    }.sum).toMap
    assert(base.keySet == want.keySet)
    base.foreach { case (s, f) => assert(BigInt(f) == want(s), s) }
    // editing any single doc must move its source's fingerprint
    val h0 = BigInt(md.digest(docs.head._2.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16)
    val h1 = BigInt(md.digest((docs.head._2 + " x").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16)
    assert(h0 != h1)
  }

  test("sim_hard_negative: top-3 cross-label neighbors, brute-forced") {
    import spark.implicits._
    val got = SparkEntry.queries("sim_hard_negative")(spark, sf)
      .select("probe_id", "rnk", "cand_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect()
    val probes = embs.filter(_._1 % 50 == 0)
    assert(got.size == probes.length)
    probes.foreach { case (pid, plabel, pv) =>
      val want = embs.filter(_._2 != plabel)
        .map(c => (c._1, round6(refCos(pv, c._3))))
        .sortBy { case (cid, s) => (-s, cid) }.take(3).map(_._1).toSeq
      assert(got(pid) == want, s"probe $pid")
    }
  }

  test("agg_delta_sum equals a sequential positive-delta scan") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_delta_sum")(spark, sf)
      .select("user_id", "delta_sum").as[(Long, Double)].collect().toMap
    val byUser = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().groupBy(_._1)
    assert(got.size == byUser.size)
    byUser.foreach { case (uid, evs) =>
      val vs = evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
      val want = vs.zip(vs.drop(1)).map { case (a, b) => math.max(b - a, 0) }.sum
      assert(math.abs(got(uid) - want) < 1e-4, s"user $uid")
    }
  }

  test("agg_max_intersections / agg_interval_length_sum match a sweep") {
    import spark.implicits._
    val maxes = SparkEntry.queries("agg_max_intersections")(spark, sf)
      .as[(Long, Int)].collect().toMap
    val lens = SparkEntry.queries("agg_interval_length_sum")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val evs = Tables.events(spark, sf)
      .select("user_id", "ts").as[(Long, java.sql.Timestamp)].collect()
      .groupBy(_._1)
    assert(maxes.size == evs.size && lens.size == evs.size)
    val lenMs = 30L * 60 * 1000
    val lenUs = lenMs * 1000
    evs.foreach { case (uid, es) =>
      // TWO sweeps at the operators' OWN precisions: max_intersections
      // nets per full µs TIMESTAMP, interval_length_sum per unix_millis
      // — a single ms sweep would wrongly cancel same-ms-different-µs
      // boundary points for the former
      val ptsUs = es.flatMap(e => Seq((tsUs(e._2), 1), (tsUs(e._2) + lenUs, -1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var active = 0L; var maxA = 0L
      ptsUs.foreach { case (_, net) =>
        active += net; maxA = math.max(maxA, active)
      }
      val ptsMs = es.flatMap(e => Seq((e._2.getTime, 1), (e._2.getTime + lenMs, -1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var activeMs = 0L; var covered = 0L
      ptsMs.zipWithIndex.foreach { case ((t, net), i) =>
        activeMs += net
        if (activeMs > 0 && i + 1 < ptsMs.length) covered += ptsMs(i + 1)._1 - t
      }
      assert(maxes(uid) == maxA, s"user $uid max")
      assert(lens(uid) == covered, s"user $uid covered")
      // union length never exceeds the naive sum, never less than one interval
      assert(covered <= es.length * lenMs && covered >= lenMs)
    }
  }

  test("sim_ivfpq_knn equals an independent IVF-PQ (route + ADC) recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("sim_ivfpq_knn")(spark, sf)
      .select("probe_id", "rnk", "cand_id", "adc_dist")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect()
      .map { case (id, l, v) => (id, l, v.map(_.toDouble)) }
    // centroids exactly as Det.davg: per-element decimal(,6) sum / count
    def dec6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val cents = embs.groupBy(_._2).view.mapValues { ms =>
      (0 until 64).map(p =>
        ms.map(m => dec6(m._3(p))).sum.toDouble / ms.length).toArray
    }.toMap
    // per (vec, codeword, subspace) distance, sequential fold order
    def subD(v: Array[Double], cv: Array[Double], m: Int): Double = {
      var acc = 0.0
      (1 to 8).foreach { i =>
        val diff = v(m * 8 + i - 1) - cv(m * 8 + i - 1); acc += diff * diff
      }
      acc
    }
    val labels = cents.keys.toSeq.sorted
    val codes = embs.map { case (id, l, v) =>
      (id, l, (0 until 8).map(m =>
        labels.minBy(c => (subD(v, cents(c), m), c))).toArray)
    }
    embs.filter(_._1 % 100 == 0).foreach { case (pid, _, pv) =>
      val routed = labels.sortBy(c =>
        ((0 until 8).map(m => dec6(subD(pv, cents(c), m))).sum.toDouble, c))
        .take(2).toSet
      val want = codes
        .filter(c => routed.contains(c._2) && c._1 != pid)
        .map { case (cid, _, code) =>
          val adc = (0 until 8).map(m => dec6(subD(pv, cents(code(m)), m)))
            .sum.toDouble
          (cid, BigDecimal(adc).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (cid, d) => (d, cid) }.take(3)
      val g = got(pid).map(r => (r._3, r._4))
      assert(g.length == want.length, s"probe $pid count")
      g.zip(want).foreach { case ((gc, gd), (wc, wd)) =>
        assert(gc == wc && math.abs(gd - wd) < 1e-6, s"probe $pid: $g vs $want")
      }
    }
  }

  test("sim_range_search equals brute force for every probe") {
    import spark.implicits._
    val got = SparkEntry.queries("sim_range_search")(spark, sf)
      .select("probe_id", "cand_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val want = for {
      (pid, pv) <- embs if pid % 50 == 0
      (cid, cv) <- embs if cid != pid
      s = BigDecimal(refCos(pv, cv)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      if s >= 0.30
    } yield (pid, cid) -> s
    assert(got.keySet == want.map(_._1).toSet,
      s"pair set: ${got.size} vs ${want.size}")
    want.foreach { case (k, s) =>
      assert(math.abs(got(k) - s) < 2e-6, s"$k: ${got(k)} vs $s")
    }
  }

  test("dedup_substring: spans never overlap, coverage bounded by doc length") {
    import spark.implicits._
    val rows = SparkEntry.queries("dedup_substring")(spark, sf)
      .select("doc_id", "n_tokens", "n_rep_grams", "n_spans",
        "covered_tokens", "max_span_tokens")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, nGrams, nSpans, covered, maxSpan) =>
      // merged spans are disjoint, so coverage can never exceed the doc
      assert(covered <= nTok, s"doc $id covers $covered of $nTok tokens")
      assert(maxSpan <= covered && nSpans >= 1 && nGrams >= nSpans, s"doc $id")
      // k=5: every span covers at least one whole gram
      assert(maxSpan >= 5, s"doc $id max span $maxSpan < k")
    }
  }

  test("pack_bestfit: no overflow, beats first-fit-in-id-order, deterministic") {
    import spark.implicits._
    val cap = 512
    val run1 = SparkEntry.queries("pack_bestfit")(spark, sf)
      .as[(Long, Long, Int, Int)].collect()
    // 1. no bin exceeds capacity
    run1.groupBy(r => (r._1, r._4)).foreach { case ((sh, bin), rs) =>
      val load = rs.map(_._3).sum
      assert(load <= cap, s"shard $sh bin $bin overflows: $load")
    }
    // 2. every doc packed exactly once
    val docIds = run1.map(_._2)
    assert(docIds.length == docIds.distinct.length)
    assert(docIds.length == Tables.documents(spark, sf).count())
    // 3. any-fit THEOREM (not a per-instance BFD-vs-FF comparison, which
    // classic bin-packing anomalies can violate): since a new bin opens
    // only when the item fits in none, at most ONE bin per shard can end
    // at most half full, so bins <= floor(2*total/cap) + 1
    run1.groupBy(_._1).foreach { case (sh, rs) =>
      val binLoads = rs.groupBy(_._4).map { case (_, xs) => xs.map(_._3).sum }
      val halfOrLess = binLoads.count(_ <= cap / 2)
      assert(halfOrLess <= 1,
        s"shard $sh: $halfOrLess bins at most half full — not an any-fit packing")
      val total = rs.map(_._3).sum
      assert(binLoads.size <= 2 * total / cap + 1,
        s"shard $sh: ${binLoads.size} bins for $total tokens")
    }
    // 4. deterministic across reruns
    val run2 = SparkEntry.queries("pack_bestfit")(spark, sf)
      .as[(Long, Long, Int, Int)].collect()
    assert(run1.toSeq == run2.toSeq)
  }

  test("fn_geohash: SQL path equals an independent Scala geohash; " +
    "bit-interleave reproduces the canonical test vector") {
    val ab = "0123456789bcdefghjkmnpqrstuvwxyz"
    def bitsToHash(lonq: Long, latq: Long): String = {
      var code = 0L
      for (i <- 0 to 14) {
        code |= ((lonq >> i) & 1L) << (2 * i + 1)
        code |= ((latq >> i) & 1L) << (2 * i)
      }
      (0 until 6).map(j => ab(((code >> (25 - 5 * j)) & 31).toInt)).mkString
    }
    // canonical vector (precision 6): (57.64911, 10.40744) → "u4pruy"
    def q(x: Double, off: Double, span: Double): Long =
      math.min(math.floor((x + off) / span * 32768.0).toLong, 32767L)
    assert(bitsToHash(q(10.40744, 180, 360), q(57.64911, 90, 180))
      == "u4pruy")
    // the SQL path's lattice points, requantized EXACTLY (pure integer
    // division — independent of the generated SQL's %/CASE route)
    val got = SparkEntry.queries("fn_geohash")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ck = r.getLong(0)
      val latk = ck % 180; val lonk = (ck * 7) % 360
      val latq = ((2 * latk + 1) * 16384L) / 180
      val lonq = ((2 * lonk + 1) * 16384L) / 360
      assert(r.getDouble(1) == latk.toDouble - 89.5)
      assert(r.getDouble(2) == lonk.toDouble - 179.5)
      assert(r.getString(3) == bitsToHash(lonq, latq),
        s"custkey $ck: ${r.getString(3)} vs ${bitsToHash(lonq, latq)}")
    }
  }
}
