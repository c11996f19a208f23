package graft

import graft.operators.DedupGraph
import org.apache.spark.sql.functions._

/** Round-4 pipeline operators: IPv4 codec expressions, transitive
  * dedup clustering, context-window chunking, stratified sampling, and
  * aggregate-state merge.
  */
class PipelineOpsSpec extends GraftSpec {

  test("ipv4 codec: roundtrip, strict parse, null on malformed") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // roundtrip over the full octet range incl. boundaries (codegen path:
    // whole-stage compiles the expression pair into the generated loop)
    val nums = Seq(0L, 1L, 255L, 256L, 65535L, 16777216L,
      3232235777L /* 192.168.1.1 */, 0xffffffffL)
    val rt = nums.toDF("n")
      .selectExpr("n", "ipv4_to_long(long_to_ipv4(n)) AS back")
      .as[(Long, Long)].collect()
    rt.foreach { case (n, back) => assert(back == n, s"roundtrip $n") }
    // out-of-range numeric → null string
    val oob = Seq(-1L, 4294967296L).toDF("n")
      .selectExpr("long_to_ipv4(n) AS s").filter(col("s").isNotNull).count()
    assert(oob == 0)
    // malformed strings → null, valid ones parse to the packed value
    val cases = Seq(
      "1.2.3.4" -> Some((1L << 24) + (2L << 16) + (3L << 8) + 4L),
      "0.0.0.0" -> Some(0L),
      "255.255.255.255" -> Some(0xffffffffL),
      "256.1.1.1" -> None, "1.2.3" -> None, "1.2.3.4.5" -> None,
      "1..3.4" -> None, "a.b.c.d" -> None, "" -> None,
      " 1.2.3.4" -> None, "1.2.3.4 " -> None, "-1.2.3.4" -> None)
    val got = cases.map(_._1).toDF("ip")
      .selectExpr("ip", "ipv4_to_long(ip) AS v")
      .as[(String, Option[Long])].collect().toMap
    cases.foreach { case (ip, want) =>
      assert(got(ip) == want, s"parse '$ip': got ${got(ip)} want $want")
    }
  }

  test("sink_zorder: per-file z-ranges are disjoint (clustered layout)") {
    import spark.implicits._
    val root = graft.operators.Scans.zorderPath(spark, sf)
    // range-partitioned + sorted-within-partition ⇒ every file owns a
    // contiguous, non-overlapping slice of z-space (THE property min/max
    // file stats need to prune on either underlying key)
    val ranges = spark.read.parquet(root)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("zv")).as("lo"), max(col("zv")).as("hi"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
      .sortBy(_._2)
    assert(ranges.length > 1, "expected multiple output files")
    ranges.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) =>
        assert(hi1 <= lo2, s"overlapping file z-ranges: $hi1 > $lo2")
      case _ =>
    }
    // and the z-value really is the Morton interleave of (xk, yk)
    val probe = spark.read.parquet(root).limit(200)
      .as[(Long, Long, Long)].collect()
    def spread(v: Long): Long = {
      var x = v & 0xffffL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }
    probe.foreach { case (xk, yk, zv) =>
      assert(zv == (spread(xk) | (spread(yk) << 1)), s"z($xk,$yk)")
    }
  }

  test("dedup_cluster equals union-find over the same edge set") {
    import spark.implicits._
    val pairs = DedupGraph.edges(spark, sf).as[(Long, Long)].collect()
    val labels = SparkEntry.queries("dedup_cluster")(spark, sf)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    // reference: driver-side union-find over the identical edge list
    val parent = scala.collection.mutable.Map(labels.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = labels.keys.groupBy(find).map { case (_, ms) => ms.min -> ms.toSet }
    labels.foreach { case (id, c) =>
      assert(comp(c).contains(id), s"doc $id labelled $c but not in that component")
    }
    assert(labels.values.toSet == comp.keySet,
      "cluster ids must be exactly the component minima")
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"edge ($a,$b) split across clusters")
    }
  }

  test("doc_chunk: stride-48 windows reassemble the source text exactly") {
    import spark.implicits._
    val chunks = SparkEntry.queries("doc_chunk")(spark, sf)
      .select("doc_id", "chunk_id", "start_tok", "chunk_len", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    texts.foreach { case (id, text) =>
      val toks = text.split(" ")
      val cs = chunks(id)
      // offsets are the stride grid; every token lands in some chunk
      cs.zipWithIndex.foreach { case ((_, cid, start, len, body), i) =>
        assert(cid == i && start == 48L * i)
        val want = toks.slice(start.toInt, start.toInt + 64)
        assert(len == want.length)
        assert(body == want.mkString(" "), s"doc $id chunk $cid")
      }
      // dropping each chunk's 16-token overlap tail reassembles the doc
      val rebuilt = cs.flatMap { case (_, _, start, _, body) =>
        body.split(" ").take(48)
      }
      assert(rebuilt.sameElements(toks), s"doc $id reassembly")
    }
  }

  test("sample_stratified: exact per-stratum quotas, stable across runs") {
    import spark.implicits._
    val out = SparkEntry.queries("sample_stratified")(spark, sf)
      .as[(String, Long, Int)].collect()
    val strata = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val perLang = out.groupBy(_._1).view.mapValues(_.length).toMap
    strata.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(n, 20L).toInt, lang)
    }
    val again = SparkEntry.queries("sample_stratified")(spark, sf)
      .as[(String, Long, Int)].collect()
    assert(out.sorted.sameElements(again.sorted), "draw must be deterministic")
  }

  test("png codec: genuine PNG magic, lossless gray roundtrip via ImageIO") {
    import graft.operators.Multimodal
    val q = (0 until 64).map(i => (i * 4) % 256)
    val blob = Multimodal.pngEncode(q)
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A — a real compressed format,
    // not a fake byte bag
    assert((blob(0) & 0xff) == 0x89 && blob(1) == 'P' && blob(2) == 'N'
      && blob(3) == 'G', blob.take(8).map(b => f"${b & 0xff}%02x").mkString(" "))
    val (w, h, px) = Multimodal.pngDecode(blob)
    assert(w == 8 && h == 8)
    assert(px.toSeq == q, "gray PNG roundtrip must be lossless")
  }

  test("wav codec: canonical RIFF container, chunk-walk parse, " +
    "lossless PCM16 roundtrip incl. extra chunks") {
    import graft.operators.Multimodal
    val q = Seq(-32768, 32767, 0, -1, 1, 12345, -12345, 255) ++
      (8 until 64).map(i => (i * 517 - 16000) % 32768)
    val blob = Multimodal.wavEncode(q)
    assert(new String(blob.take(4), "US-ASCII") == "RIFF")
    assert(new String(blob.slice(8, 12), "US-ASCII") == "WAVE")
    assert(blob.length == 44 + q.length * 2, "canonical 44-byte header")
    val (rate, ch, bits, smp) = Multimodal.wavDecode(blob)
    assert(rate == 8000 && ch == 1 && bits == 16)
    assert(smp.toSeq == q, "PCM16 roundtrip must be lossless")
    // a real demuxer must skip unknown chunks by declared length: splice
    // a LIST chunk between fmt and data and re-parse
    val bb = java.nio.ByteBuffer.allocate(blob.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(blob, 0, 36)                       // RIFF..fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(4)
    bb.put("INFO".getBytes("US-ASCII"))       // 4-byte payload
    bb.put(blob, 36, blob.length - 36)        // data chunk
    // patch the RIFF size field (+12 for the spliced chunk): the
    // container must stay SPEC-VALID so a future demuxer that bounds
    // its walk by the declared size doesn't fail on our own fixture
    bb.putInt(4, java.nio.ByteBuffer.wrap(blob, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt + 12)
    val (r2, c2, b2, s2) = Multimodal.wavDecode(bb.array())
    assert(r2 == 8000 && c2 == 1 && b2 == 16 && s2.toSeq == q,
      "chunk walk must skip foreign chunks")
  }

  test("fft: matches the direct DFT to 1e-9; pure tone peaks in its bin") {
    import graft.operators.Multimodal
    val n = 64
    // deterministic pseudo-signal
    val x = Array.tabulate(n)(i => math.sin(i * 0.37) + 0.5 * math.cos(i * 1.1))
    val re = x.clone(); val im = new Array[Double](n)
    Multimodal.fft(re, im)
    var k = 0
    while (k < n) {
      var dr = 0.0; var di = 0.0
      var i = 0
      while (i < n) {
        val a = -2.0 * math.Pi * k * i / n
        dr += x(i) * math.cos(a); di += x(i) * math.sin(a)
        i += 1
      }
      assert(math.abs(re(k) - dr) < 1e-9 && math.abs(im(k) - di) < 1e-9,
        s"bin $k: fft (${re(k)}, ${im(k)}) vs dft ($dr, $di)")
      k += 1
    }
    // a pure tone at bin 5 puts (essentially) all one-sided energy there
    val tone = Array.tabulate(n)(i => math.cos(2.0 * math.Pi * 5 * i / n))
    val tr = tone.clone(); val ti = new Array[Double](n)
    Multimodal.fft(tr, ti)
    val mags = (0 to n / 2).map(b => tr(b) * tr(b) + ti(b) * ti(b))
    assert(mags.zipWithIndex.maxBy(_._1)._2 == 5,
      s"tone must peak at bin 5: ${mags.zipWithIndex.sortBy(-_._1).take(3)}")
    assert(mags(5) > 1000 * (mags.sum - mags(5)).max(1e-18),
      "off-bin leakage for an exact-bin tone must be ~zero")
  }

  test("rename column is metadata-only: data files byte-identical, " +
    "logical schema renamed") {
    val rows = SparkEntry.queries("mutation_rename_column")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // files_unchanged is computed in-query from pre/post sha-256 of
    // every data file — 1 everywhere or the mutation touched data
    rows.foreach(r => assert(r.getAs[Int]("files_unchanged") == 1))
    assert(rows.head.schema.fieldNames.contains("sum_amount"),
      "logical schema must carry the NEW column name")
  }

  test("materialize column: recent partitions stay virtual, split is exact") {
    import spark.implicits._
    val rows = SparkEntry.queries("mutation_materialize_column")(spark, sf)
      .as[(Int, Long, Long, Double)].collect()
    val events = Tables.events(spark, sf)
    val total = events.count()
    val cut = events.select(date_add(max(to_date(col("ts"))), -7)).head.getDate(0)
    val recent = events.filter(to_date(col("ts")) >= cut).count()
    assert(rows.map(_._2).sum == total, "no row lost in the mutation")
    // n_virtual counts exactly the rows in never-rewritten partitions
    assert(rows.map(_._3).sum == recent,
      s"virtual rows ${rows.map(_._3).sum} != post-cutoff rows $recent")
    assert(recent > 0 && recent < total, "fixture must span the cutoff")
  }

  test("mutation: non-admitting partitions byte-identical; admitting rewritten") {
    import graft.operators.Scans
    val scratch = graft.Scratch.dir("muttest")
    val (root, cut) = Scans.mutationStage(spark, sf, scratch)
    def digests(): Map[String, Seq[(String, String)]] =
      Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(_.getName.startsWith("day=")).map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .sortBy(_.getName).toSeq.map { f =>
              f.getName -> java.util.Base64.getEncoder.encodeToString(
                java.security.MessageDigest.getInstance("SHA-256").digest(
                  java.nio.file.Files.readAllBytes(f.toPath)))
            }
        }.toMap
    val before = digests()
    val admitted = Scans.mutatePartitions(spark, root, "day",
      d => !java.time.LocalDate.parse(d).isBefore(cut),
      _.filter(col("event_type") =!= "click"),
      s"ALTER TABLE t DELETE WHERE day >= $cut AND event_type = 'click'")
    assert(admitted.nonEmpty, "fixture must span the cutoff")
    val after = digests()
    val untouched = before.keySet -- admitted
    assert(untouched.nonEmpty, "fixture must have pre-cutoff partitions")
    // ClickHouse-mutation contract: parts the predicate cannot admit are
    // not rewritten — their FILES (names and bytes) are identical
    untouched.foreach { p =>
      assert(after(p) == before(p), s"partition $p was rewritten")
    }
    admitted.foreach { p =>
      assert(!after.get(p).contains(before(p)), s"partition $p not rewritten")
    }
    // row-level effect: no clicks remain past the cutoff, none lost before
    val out = spark.read.parquet(root)
    assert(out.filter(col("day") >= java.sql.Date.valueOf(cut)
      && col("event_type") === "click").count() == 0)
    val preClicks = out.filter(col("day") < java.sql.Date.valueOf(cut)
      && col("event_type") === "click").count()
    assert(preClicks > 0, "pre-cutoff clicks must survive the mutation")
  }

  test("ttl_rollup: old tier collapses storage, logical counts survive") {
    import spark.implicits._
    val rows = SparkEntry.queries("ttl_rollup")(spark, sf)
      .select("tier", "n_stored", "n_logical")
      .as[(String, Long, Long)].collect()
    val (rolled, raw) = rows.partition(_._1 == "rolled")
    assert(rolled.nonEmpty && raw.nonEmpty, s"both tiers must exist: $rows")
    // rolled days store one row per group key, never more than logical
    rolled.foreach { case (_, st, lg) => assert(st <= lg && st > 0) }
    assert(rolled.exists { case (_, st, lg) => st < lg },
      "rollup never collapsed anything")
    // raw days are untouched
    raw.foreach { case (_, st, lg) => assert(st == lg) }
    // nothing is lost logically
    val totalLogical = rows.map(_._3).sum
    assert(totalLogical == Tables.events(spark, sf).count())
  }

  test("ts_ema: fold equals an independent sequential recursion") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_ema")(spark, sf)
      .select("user_id", "ema").as[(Long, Double)].collect().toMap
    val byUser = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
      .groupBy(_._1)
    assert(got.nonEmpty && got.size == byUser.size)
    byUser.foreach { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
        .map(_._4)
      val want = ordered.tail.foldLeft(ordered.head)((acc, x) =>
        x * 0.1 + acc * 0.9)
      assert(got(uid) == want, s"user $uid: ${got(uid)} != $want")
    }
  }

  test("dedup_canonical keeps exactly the best-quality member per cluster") {
    import spark.implicits._
    val rows = SparkEntry.queries("dedup_canonical")(spark, sf)
      .select("doc_id", "cluster_id", "quality", "keep")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (c, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"cluster $c: ${keepers.length} keepers")
      val best = members.map(m => (-m._3, m._1)).min
      assert((- keepers.head._3, keepers.head._1) == best,
        s"cluster $c keeper is not argmax-quality")
    }
  }

  test("agg_ttest matches an independent Welch computation") {
    import spark.implicits._
    val row = SparkEntry.queries("agg_ttest")(spark, sf)
      .select("n_a", "n_b", "t_stat", "df")
      .as[(Long, Long, Double, Double)].collect().head
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select("event_type", "value").as[(String, Double)].collect()
    val a = vals.filter(_._1 == "purchase").map(_._2)
    val b = vals.filter(_._1 == "view").map(_._2)
    def stats(x: Array[Double]) = {
      val m = x.sum / x.length
      (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
    }
    val (ma, va) = stats(a); val (mb, vb) = stats(b)
    val se2 = va / a.length + vb / b.length
    val t = (ma - mb) / math.sqrt(se2)
    val df = se2 * se2 / (math.pow(va / a.length, 2) / (a.length - 1) +
      math.pow(vb / b.length, 2) / (b.length - 1))
    assert(row._1 == a.length && row._2 == b.length)
    assert(math.abs(row._3 - t) < 1e-4, s"t: ${row._3} vs $t")
    assert(math.abs(row._4 - df) < 1e-2, s"df: ${row._4} vs $df")
  }

  test("agg_state_merge: merged partial states equal the direct aggregate") {
    import spark.implicits._
    val merged = SparkEntry.queries("agg_state_merge")(spark, sf)
      .select("o_orderpriority", "n", "total", "min_price", "max_price")
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("total"),
        min("o_totalprice"), max("o_totalprice"))
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
    // exact equality, not tolerance: decimal states merge losslessly
    assert(merged.sameElements(direct))
  }
}
