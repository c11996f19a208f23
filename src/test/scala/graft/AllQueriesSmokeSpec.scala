package graft

/** One spec per registered operator (SURVEY.md §2): every `queries` entry
  * must run to completion on sf0.001 and — unless listed as legitimately
  * empty at this scale — produce rows.
  */
class AllQueriesSmokeSpec extends GraftSpec {

  /** Keys whose correct sf0.001 result can be empty (near-dup thresholds
    * exceed the fixture's max pair similarity at this scale, etc.).
    */
  private val mayBeEmpty = Set("dedup_jaccard", "dedup_minhash",
    "dedup_minhash_native", "dedup_ngram_jaccard", "dedup_embed",
    "sim_lsh_knn", "set_except", "join_anti")

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has an oracle or is a documented rows-only check") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val documented = Set("agg_distinct_approx", "agg_quantile_approx",
      "agg_quantile_state", "src_rate", "dedup_simhash", "dedup_minhash",
      "dedup_minhash_native", "sim_lsh_knn", "scan_sample", "agg_hll_merge",
      "udaf_sketch_topk", "udaf_cm_sketch", "text_compress_ratio",
      "stream_quantile_mv", "agg_topk_state",
      "vec_kmeans_train", "sim_ivf_trained_knn",
      "udaf_kmv_intersect", "ml_quality_filter",
      "tok_bpe_train", "mv_route_quantile", "mv_refresh_quantile",
      "mv_refresh_quantile_delete")
    assert(rowsOnly == documented,
      s"undocumented rows-only keys: ${rowsOnly -- documented}; " +
        s"stale documented entries: ${documented -- rowsOnly}")
    // the reverse direction: both maps currently derive from the same
    // QueryDef list (orphans unrepresentable), but this locks that
    // derivation invariant against a future hand-maintained oracleSql
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a query: $orphaned")
  }

  test("fixture invariant: 1-URGENT orders exist (NULL-order trap)") {
    // join_anti_null_aware injects a NULL-key probe row whose survival
    // depends on the NOT IN subquery being NON-empty: against an empty
    // set, NULL NOT IN () is TRUE on both engines and the surviving
    // NULL row sorts FIRST on Spark (ASC NULLS FIRST) but LAST in
    // DuckDB (ASC NULLS LAST) — a positional-compare gate break.
    // Assert the precondition loudly here (the VectorTextSpec
    // zero-norm pattern) instead of burying a guard in the key.
    val n = Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions
        .col("o_orderpriority") === "1-URGENT").count()
    assert(n > 0, "fixture has no 1-URGENT orders — " +
      "join_anti_null_aware's NULL-probe semantics become order-divergent")
  }

  test("bench total excludes the -1 failure sentinel") {
    val (total, nOk, nFailed) =
      Bench.summarize(Map("a" -> 2.0, "b" -> -1.0, "c" -> 3.5))
    assert(total == 5.5 && nOk == 2 && nFailed == 1)
    assert(Bench.summarize(Map("x" -> -1.0)) == ((0.0, 0, 1)))
  }

  test("bench regression guard: >1.5x over a >=0.2s prior, worst first") {
    val prev = Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "d" -> 0.5)
    val now = Map("a" -> 1.6, "b" -> 0.9, "c" -> 2.9, "d" -> -1.0,
      "e" -> 9.9)
    // b: prior under the 0.2s noise floor; c: under 1.5x; d: failed now
    // (sentinel never compares); e: no prior → not a regression
    assert(Bench.regressions(prev, now) == Seq(("a", 1.0, 1.6)))
    assert(Bench.regressions(Map.empty, now).isEmpty)
    // load normalization (VERDICT r9 finding 1): a calibration ratio of
    // 1.2 raises a's threshold to 1.8x — the uniform-multiplier false
    // positive disappears; a genuine 2x regression still flags
    assert(Bench.regressions(prev, now, 1.2).isEmpty)
    assert(Bench.regressions(prev, Map("a" -> 2.0), 1.2)
      == Seq(("a", 1.0, 2.0)))
  }

  test("bench median-ratio normalization absorbs uniform load, flags outliers") {
    // the r11 driver-run replay in miniature: every key uniformly 2×
    // slower (pure mid-run host load the bracketed probes missed) plus
    // ONE genuine 10× regression. median(now/prev) = 2 → threshold 3×
    // → only the real regression survives.
    val prev = (1 to 20).map(i => s"k$i" -> 1.0).toMap
    val uniform = prev.map { case (k, v) => k -> v * 2.0 }
    val m = Bench.medianRatio(prev, uniform)
    assert(m == 2.0, s"median of a uniform 2x shift must be 2.0, got $m")
    assert(Bench.regressions(prev, uniform, m).isEmpty,
      "uniform load must flag nothing once median-normalized")
    val withBug = uniform + ("k7" -> 10.0)
    val m2 = Bench.medianRatio(prev, withBug)
    assert(Bench.regressions(prev, withBug, m2) == Seq(("k7", 1.0, 10.0)),
      "a genuine outlier must still flag under median normalization")
    // clamped >= 1: a baseline taken UNDER load (now uniformly faster)
    // must never tighten the at-rest threshold below 1.5x
    assert(Bench.medianRatio(prev, prev.map { case (k, v) => k -> v / 2 })
      == 1.0)
    // too few overlapping keys (scoped dev run) → no normalization
    assert(Bench.medianRatio(Map("a" -> 1.0), Map("a" -> 9.0)) == 1.0)
    // sub-floor priors and failed keys are excluded from the median
    assert(Bench.medianRatio(
      prev ++ (1 to 10).map(i => s"sub$i" -> 0.1) ++ Seq("f" -> 1.0),
      uniform ++ (1 to 10).map(i => s"sub$i" -> 0.9) ++ Seq("f" -> -1.0))
      == 2.0)
  }

  test("bench record adoption: loaded runs keep the prior at-rest baseline") {
    // at rest (all ratios ≈ 1, incl. the no-prior-record default) → adopt
    assert(Bench.adoptRecord(1.0, 1.0, 1.0))
    assert(Bench.adoptRecord(1.1, 1.05, 1.02))
    // any single load signal past 1.1 blocks adoption — the r13 driver
    // run (cpu 1.5–2×, io 3–10×, median ≈2×) must never become the
    // baseline the next run's regression guard diffs against
    assert(!Bench.adoptRecord(1.54, 1.0, 1.0))
    assert(!Bench.adoptRecord(1.0, 3.2, 1.0))
    assert(!Bench.adoptRecord(1.0, 1.0, 2.0))
    // the explicit re-baseline escape hatch (-Dgraft.bench.forceAdopt=1,
    // r14 ADVICE finding 4): force overrides every blocked signal —
    // a code change slowing most keys past 1.1× can still re-baseline —
    // while force=false leaves the gate's verdict untouched
    assert(Bench.adoptDecision(1.54, 3.2, 2.0, force = true))
    assert(!Bench.adoptDecision(1.54, 1.0, 1.0, force = false))
    assert(Bench.adoptDecision(1.0, 1.0, 1.0, force = false))
  }

  test("bench prev-map parse: queries extracted, garbage disables guard") {
    val dir = java.nio.file.Files.createTempDirectory("benchprev")
    val good = dir.resolve("good.json")
    java.nio.file.Files.writeString(good,
      """{"metric":"total","value":3.0,"queries":{"q1":1.25,"q2":1.75},"sf":"x"}""")
    assert(Bench.readPrev(good.toString) == Map("q1" -> 1.25, "q2" -> 1.75))
    val bad = dir.resolve("bad.json")
    java.nio.file.Files.writeString(bad, "not json at all")
    assert(Bench.readPrev(bad.toString).isEmpty)
    assert(Bench.readPrev(dir.resolve("absent.json").toString).isEmpty)
    // calibration record: parsed when present AFTER the queries map
    // (where the writer puts it), 0.0 when absent/garbled/missing
    val cal = dir.resolve("cal.json")
    java.nio.file.Files.writeString(cal,
      """{"metric":"total","value":3.0,"queries":{"q1":1.25},"calibration":0.4125,"sf":"x"}""")
    assert(Bench.readPrevCalibration(cal.toString) == 0.4125)
    assert(Bench.readPrev(cal.toString) == Map("q1" -> 1.25),
      "calibration field must not disturb the queries-map parse")
    assert(Bench.readPrevCalibration(good.toString) == 0.0)
    assert(Bench.readPrevCalibration(bad.toString) == 0.0)
    assert(Bench.readPrevCalibration(
      dir.resolve("absent.json").toString) == 0.0)
    // the I/O probe record must parse independently of the CPU one —
    // and the shorter "calibration": key must never match inside the
    // longer "calibration_io": field name (or vice versa), whatever
    // their order on the line
    val both =
      """{"queries":{"q1":1.0},"calibration":0.11,"calibration_io":0.27,"sf":"x"}"""
    assert(Bench.parseCalibration(both) == 0.11)
    assert(Bench.parseCalibrationIo(both) == 0.27)
    val ioFirst =
      """{"queries":{"q1":1.0},"calibration_io":0.27,"calibration":0.11}"""
    assert(Bench.parseCalibration(ioFirst) == 0.11)
    assert(Bench.parseCalibrationIo(ioFirst) == 0.27)
    // pre-r11 baselines carry no io record → 0.0 disables the io ratio
    assert(Bench.parseCalibrationIo(
      """{"queries":{"q1":1.0},"calibration":0.11}""") == 0.0)
  }

  /** Keys allowed to plan CartesianProduct. Empty by policy: every
    * cross join in the library is against a broadcast bounded frame
    * (1-row totals, probe sets, codebooks), which plans
    * BroadcastNestedLoopJoin — an unhinted CartesianProduct is the
    * 100 TB scale killer (both sides shuffle-replicated), so any new
    * entry here needs a written bound justification.
    */
  private val mayCartesian = Set.empty[String]

  /** Keys whose plans legitimately carry user code (ScalaUDF /
    * ScalaAggregator / typed-op markers); every other key must stay on
    * codegen'd built-ins or native Catalyst expressions — the
    * "functions, not UDFs" discipline, machine-checked like the
    * CartesianProduct ban. Members: the UDF-surface demos themselves
    * (udf_scalar, udaf_typed, udaf_uniq_upto), typed-Aggregator folds
    * whose sequential/sketch semantics have no built-in spelling
    * (agg_sum_kahan compensated sum, ts_dtw pair DP, ts_lttb bucket
    * selection, mm_mel_filterbank DSP fold, the bitmap/CM/KMV/top-k
    * sketch states and the t-digest quantile state), and MLlib LSH
    * internals (dedup_minhash, sim_lsh_knn).
    */
  private val mayUdf = Set("agg_sum_kahan", "dedup_minhash",
    "mm_mel_filterbank", "sim_lsh_knn", "ts_dtw", "ts_lttb",
    "udaf_typed", "udaf_uniq_upto", "udf_scalar",
    "agg_quantile_state", "agg_topk_state", "udaf_bitmap",
    "udaf_bitmap_and", "udaf_cm_sketch", "udaf_kmv_intersect",
    "udaf_sketch_topk",
    // the ROUTED plan substitutes the QuantileMerge typed fold for
    // percentile_approx — the sketch-state exception class above
    "mv_route_quantile")

  /** The plan-string substring check alone is BLIND to udaf()-wrapped
    * typed Aggregators: ScalaAggregator renders as the aggregator's own
    * class name (e.g. `kahansum$(...)`) with no "udf" marker, so a
    * sketch UDAF would pass the ban unlisted. Walk the optimized
    * logical plan's expression trees for the actual user-code
    * expression classes instead.
    */
  private def userCodeMarkers(
      lp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Set[String] = {
    val found = scala.collection.mutable.Set[String]()
    // subqueriesAll too: a ScalarSubquery/Exists holds its LogicalPlan
    // INSIDE an expression leaf that Expression.foreach does not
    // descend into — without this, user code hiding in a subquery's
    // aggregate would evade the ban
    (lp +: lp.subqueriesAll).foreach(_.foreach { node =>
      node.expressions.foreach(_.foreach { e =>
        val n = e.getClass.getSimpleName
        if (n == "ScalaUDF" || n == "ScalaAggregator" || n == "ScalaUDAF")
          found += n
      })
    })
    found.toSet
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (key, fn) =>
    test(s"operator $key runs on sf0.001") {
      val df = fn(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      if (!mayCartesian(key)) assert(!plan.contains("CartesianProduct"),
        s"$key plans a CartesianProduct — broadcast the bounded side " +
          "or add an equi-key:\n" + plan.take(1200))
      if (!mayUdf(key)) {
        assert(!plan.toLowerCase.contains("udf"),
          s"$key plans a UDF — prefer built-in functions or a native " +
            "Catalyst expression, or justify an allowlist entry:\n" +
            plan.take(1200))
        val markers = userCodeMarkers(df.queryExecution.optimizedPlan)
        assert(markers.isEmpty,
          s"$key plans user code (${markers.mkString(", ")}) — prefer " +
            "built-ins or a native Catalyst expression, or justify an " +
            "allowlist entry")
      }
      val n = df.count()
      if (!mayBeEmpty(key)) assert(n > 0, s"$key returned no rows")
    }
  }
}
