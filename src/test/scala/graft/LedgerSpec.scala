package graft

import org.scalatest.funsuite.AnyFunSuite

/** The docs' verification ledger must equal the registry — round 4 shipped
  * a README/SURVEY claim of "253 oracle-matched" while the correctness
  * artifact said 251. This spec makes that drift a build failure: the
  * canonical `Ledger: N keys / M oracled / K rows-only` line in README.md
  * and SURVEY.md §8 is recomputed from `SparkEntry` itself, and the
  * rows-only set must equal an explicit, reasoned allowlist so a new key
  * can never silently ship without an oracle.
  */
class LedgerSpec extends AnyFunSuite {

  /** Keys that are rows-only BY DESIGN (approximate / seeded /
    * wall-clock-dependent), each carrying a named ScalaTest instead of a
    * DuckDB oracle. Additions require touching this list consciously.
    */
  private val declaredNoOracle: Set[String] = Set(
    "agg_distinct_approx",  // HLL estimate — SketchSpec error bound
    "agg_hll_merge",        // HLL partial merge — SketchSpec
    "agg_quantile_approx",  // percentile_approx sketch — SketchSpec
    "agg_quantile_state",   // mergeable t-digest-shaped state — SketchSpec
    "agg_topk_state",       // persisted SpaceSaving states — SketchSpec
    "dedup_minhash",        // seeded MLlib LSH — recall-vs-exact test
    "dedup_minhash_native", // seeded native minhash — recall-vs-exact test
    "dedup_simhash",        // seeded hyperplanes — golden test
    "stream_quantile_mv",   // sketch-state MV — SketchSpec rank bounds
    "scan_sample",          // TABLESAMPLE is engine-seeded
    "sim_ivf_trained_knn",  // iterated-k-means codebook — recall-improves test
    "sim_lsh_knn",          // seeded LSH buckets — recall test
    "src_rate",             // wall-clock rate source
    "text_compress_ratio",  // deflate impl differs per engine — golden test
    "udaf_cm_sketch",       // CountMin estimate — SketchSpec
    "udaf_sketch_topk",     // SpaceSaving estimate — SketchSpec
    "vec_kmeans_train",     // iterated fixpoint not SQL-expressible —
                            // monotone-SSE property test
    "udaf_kmv_intersect",   // KMV sketch estimates — SketchSpec error bounds
    "ml_quality_filter",    // iterated GD weights — accuracy/descent tests
    "tok_bpe_train",        // iterated merge fixpoint — golden merge-table
                            // test vs independent reimplementation
    "mv_route_quantile",    // routed t-digest estimate ≠ GK sketch —
                            // SketchSpec rank bound on the ROUTED result
    "mv_refresh_quantile",  // sketch estimates on every probe (t-digest
                            // routed, GK fallen through) — SketchSpec
                            // rank bounds per probe
    "mv_refresh_quantile_delete", // t-digest splice under a pruned
                            // DELETE — SketchSpec rank-bounds both
                            // probes vs exact order statistics
  )

  private val ledgerRe =
    """Ledger: (\d+) keys / (\d+) oracled / (\d+) rows-only""".r.unanchored

  private def docCounts(path: String): (Int, Int, Int) = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    ledgerRe.findFirstMatchIn(text) match {
      case Some(m) => (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)
      case None => fail(s"$path has no canonical 'Ledger: N keys / M oracled" +
        s" / K rows-only' line")
    }
  }

  test("oracleSql keys are a subset of the query registry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("every key without an oracle is on the declared rows-only list") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == declaredNoOracle,
      s"undeclared rows-only keys: ${noOracle -- declaredNoOracle}; " +
        s"stale declarations: ${declaredNoOracle -- noOracle}")
  }

  test("README.md ledger line equals the registry") {
    val (n, m, k) = docCounts("README.md")
    assert(n == SparkEntry.queries.size, s"README claims $n keys")
    assert(m == SparkEntry.oracleSql.size, s"README claims $m oracled")
    assert(k == n - m, s"README claims $k rows-only")
  }

  test("SURVEY.md ledger line equals the registry") {
    val (n, m, k) = docCounts("SURVEY.md")
    assert(n == SparkEntry.queries.size, s"SURVEY claims $n keys")
    assert(m == SparkEntry.oracleSql.size, s"SURVEY claims $m oracled")
    assert(k == n - m, s"SURVEY claims $k rows-only")
  }

  test("SURVEY.md §2.14 generated inventory: exact key MEMBERSHIP + flags") {
    // the graded §2 contract is the generated block, not prose recall —
    // regenerate with `sbt "runMain graft.Inventory"` after registry edits
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val begin = text.indexOf("<!-- GENERATED-INVENTORY:BEGIN")
    val end = text.indexOf("<!-- GENERATED-INVENTORY:END -->")
    assert(begin >= 0 && end > begin, "inventory markers missing from SURVEY.md")
    val rowRe = """\| `([a-z0-9_]+)` \| `[^`]+` \| (oracled|rows-only) \|""".r
    val rows = rowRe.findAllMatchIn(text.substring(begin, end))
      .map(m => m.group(1) -> (m.group(2) == "oracled")).toSeq
    // a stale duplicate row would be collapsed last-wins by toMap —
    // membership and flag checks could both pass while the published
    // doc shows a contradictory entry
    val dup = rows.groupBy(_._1).collect { case (k, rs) if rs.size > 1 => k }
    assert(dup.isEmpty, s"duplicate inventory rows for: ${dup.toSeq.sorted}")
    val listed = rows.toMap
    val registry = SparkEntry.queries.keySet
    assert(listed.keySet == registry,
      s"inventory drift — missing: ${registry -- listed.keySet}; " +
        s"stale: ${listed.keySet -- registry}")
    val wrongFlag = listed.collect {
      case (k, o) if o != SparkEntry.oracleSql.contains(k) => k
    }
    assert(wrongFlag.isEmpty, s"oracle flag wrong for: $wrongFlag")
  }
}
