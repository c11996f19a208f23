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
      "udaf_sketch_topk", "udaf_cm_sketch", "text_compress_ratio", "ts_holt",
      "pack_bestfit", "stream_quantile_mv", "agg_topk_state")
    assert(rowsOnly == documented,
      s"undocumented rows-only keys: ${rowsOnly -- documented}")
  }

  test("bench total excludes the -1 failure sentinel") {
    val (total, nOk, nFailed) =
      Bench.summarize(Map("a" -> 2.0, "b" -> -1.0, "c" -> 3.5))
    assert(total == 5.5 && nOk == 2 && nFailed == 1)
    assert(Bench.summarize(Map("x" -> -1.0)) == ((0.0, 0, 1)))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (key, fn) =>
    test(s"operator $key runs on sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(key)) assert(n > 0, s"$key returned no rows")
    }
  }
}
