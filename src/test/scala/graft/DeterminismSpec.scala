package graft

/** Run-to-run determinism harness: the DuckDB oracle gate proves a key
  * is right ONCE, but a distributed plan can still be partitioning- or
  * scheduling-dependent (collect_list without a sort, double sums in
  * shuffle arrival order, sampled RNG keyed on partition id) and flap
  * between runs — the class of bug a single-run gate cannot see. Each
  * representative key here is executed TWICE with DIFFERENT shuffle
  * partition counts (4 then 7 — also proving the result does not depend
  * on the session's partitioning) and the full collected results must
  * be bit-identical.
  *
  * The sample (41 keys) is chosen adversarially: keys that reassemble
  * arrays from aggregations (agg_foreach, agg_resample,
  * agg_group_array_sorted, agg_array_intersect, agg_moving_sum_array),
  * rank after rounding (sim_ann_recall, sim_triplet_mine), hash-order
  * windows (sample_stratified), per-partition kernels (mm_spectrogram),
  * exact decimal window sums (win_share), distance arithmetic
  * (fn_distance_family), a custom physical operator
  * (topk_per_group_native), an AQE-replanned join (join_skew_aqe), a
  * checkpoint-derived graph traversal (graph_triangle_count — each
  * session derives its OWN edge-cache entry, so this exercises
  * re-derivation determinism under the two partitionings, not
  * cross-session reuse), and the sequential per-group recurrences fed
  * by shuffle-ordered input — greedy re-rank (sim_mmr), best-fit
  * packing (pack_bestfit), LTTB downsampling (ts_lttb), and the DTW
  * pair DP (ts_dtw).
  */
class DeterminismSpec extends GraftSpec {

  private val keys = Seq("agg_foreach", "agg_resample", "sim_ann_recall",
    "sim_triplet_mine", "sample_stratified", "mm_spectrogram", "win_share",
    "topk_per_group_native", "join_skew_aqe", "fn_distance_family",
    "agg_group_array_sorted", "agg_array_intersect",
    "agg_moving_sum_array", "graph_triangle_count", "sim_mmr",
    "pack_bestfit", "ts_lttb", "ts_dtw",
    // round-9 second wave: rank-after-integer-score with a LIMIT edge,
    // sorted-fold entropy over collected counts, per-node triangle
    // credit through the oriented wedge join, exact-integer ACF moments
    "graph_resource_alloc", "text_char_entropy", "graph_cluster_coeff",
    "ts_acf",
    // round-9 third wave: the reflection-identity window pair — two
    // stacked stock windows whose exact-decimal chain must not depend
    // on which partitioning assembled the frames
    "win_cum_clamp", "ts_drawdown",
    // heap-order-sensitive: bounded-heap top-N feeding array reassembly
    "agg_group_array_last",
    // banded self-join + distinct over ARRAY-typed carry columns: the
    // candidate set must not depend on which partitioning met the bands
    "mm_phash_dedup",
    // exact-percentile pick-middle over shuffle-assembled pair slopes
    "ts_theil_sen",
    // round-10 wave: the bloom-position index built via collect_set
    // (set membership must not depend on which partitioning collected
    // the positions) feeding a driver-side admission decision
    "scan_text_index",
    // optimizer-rule rewrite (Aggregate-over-Filter re-targeted at the
    // MV): the routed plan's decimal re-aggregation under two
    // partitionings of the re-aggregation shuffle
    "mv_route_filtered",
    // per-part type resolution: two unioned scan tiers whose long sums
    // must agree regardless of which partitioning merged them
    "mutation_modify_column",
    // round-11 wave: the routed min/max/avg — Average's decimal divide
    // tree reconstructed over MV partials must be partitioning-stable,
    // and min-of-mins/max-of-maxes exact under any re-aggregation order
    "mv_route_minmax",
    // transparent token-index pruning: the admitted-file scan (and the
    // empty-relation fast path) must return identical rows under two
    // partitionings of the index build's collect_set aggregate
    "scan_text_index_routed",
    // round-12 wave: plain-integral-sum routing (bigint monoid over MV
    // partials re-aggregated under either partitioning), the
    // mutate→invalidate→refresh timeline (each probe's snapshot must
    // not depend on how its scan/aggregate was partitioned), OR-of-
    // token-probes over the union-admitted file set, and the
    // incremental index append (new-file bloom build is a collect_set
    // aggregate under the test's two partitionings)
    "mv_route_sum_long", "mv_route_stale", "scan_text_index_routed_or",
    "scan_text_index_append",
    // expression-grouping-key routing: the semantic template match plus
    // decimal/min/max re-aggregation keyed by the materialized month
    // column must be partitioning-stable, as must the filtered flavor's
    // pre-aggregation MV filter
    "mv_route_expr_key", "mv_route_expr_filtered",
    // grouping-key distinct/min/max answered from MV rows: the routed
    // Count(DISTINCT) plans its own distinct shuffle over the MV scan
    "mv_route_grouping_stats",
    // multi-projection choice (the def-list walk must not depend on
    // partitioning) and the routed SELECT DISTINCT's dedup shuffle
    "mv_route_second_proj", "mv_route_distinct")

  private def runOnce(key: String, parts: Int): Seq[String] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    SparkEntry.queries(key)(s, sf).collect()
      .map(r => r.toSeq.map {
        case null => "∅"
        case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
        case x => x.toString
      }.mkString("|")).toSeq
  }

  keys.foreach { key =>
    test(s"$key is bit-identical across runs and partition counts") {
      val a = runOnce(key, 4)
      val b = runOnce(key, 7)
      assert(a.nonEmpty, s"$key returned no rows")
      assert(a == b, {
        val diff = a.zip(b).zipWithIndex.collect {
          case ((x, y), i) if x != y => s"row $i:\n  4p: $x\n  7p: $y"
        }
        // zip truncates, so a pure row-count divergence would otherwise
        // report "0 rows differ" with no detail — show the unpaired tail
        val sizeNote =
          if (a.size != b.size)
            s"sizes differ: 4p=${a.size} 7p=${b.size}; unpaired tail: " +
              (if (a.size > b.size) a.drop(b.size) else b.drop(a.size))
                .take(3).mkString("; ") + "\n"
          else ""
        s"$key differs across partitionings (${diff.size} paired rows):\n" +
          sizeNote + diff.take(3).mkString("\n")
      })
    }
  }
}
