package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2.5 Aggregations — ClickHouse's signature aggregate surface (argMax,
  * uniq, quantile, countIf, groupArray, ROLLUP/CUBE) + standard SQL grouped
  * aggregation, expressed as codegen'd Spark built-ins (HashAggregateExec
  * partial→final; no UDFs on the hot path).
  *
  * Scale notes (100 TB posture): every groupBy aggregates map-side before
  * the shuffle, so shuffle volume is O(groups). approx_count_distinct is
  * the ClickHouse-`uniq` scale path (HLL sketches merge associatively;
  * exact distinct is a second shuffle). collect_set is only safe on
  * bounded per-group domains — here event_type, cardinality 5.
  */
object Aggregates {

  /** Flagship: TPC-H-Q1-shaped pricing summary over lineitem.
    * Proves scan→filter→partial agg→shuffle→final agg→sort end-to-end.
    */
  def flagship(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val flagshipOracle: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${Det.oSum("l_quantity")} AS sum_qty,
      ${Det.oSum("l_extendedprice")} AS sum_base_price,
      ${Det.oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${Det.oSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
      ${Det.oAvg("l_quantity")} AS avg_qty,
      ${Det.oAvg("l_extendedprice")} AS avg_price,
      ${Det.oAvg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  private def aggDistinctExact(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** ClickHouse `uniq` — HLL++ sketch; no oracle (approx ≠ exact), bounds
    * asserted in ScalaTest against the exact twin.
    */
  private def aggDistinctApprox(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        approx_count_distinct(col("event_id"), 0.02).as("approx_events"))
      .orderBy(col("event_type"))

  /** Exact percentiles (interpolated) — rounded to 6dp: both engines
    * interpolate linearly on doubles and may differ in the last ulp.
    */
  private def aggQuantile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("q25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("q50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("q75"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"))
      .orderBy(col("l_returnflag"))

  /** ClickHouse plural `quantiles(p1..pk)(x)` — the multi-quantile array
    * form (the workhorse spelling: one sorted pass, k cut points at
    * once). Same interpolated definition as agg_quantile; the result
    * array leaves as a canonical CSV string (DECIMAL(20,6) components)
    * per the array-representation rule.
    *
    * Scale notes: identical plan to agg_quantile — one aggregate pass
    * per group computes all k quantiles; no extra shuffle per cut point.
    */
  private def aggQuantilesArray(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr(
        """array_join(transform(
             percentile(l_quantity, array(0.25D, 0.5D, 0.75D, 0.9D)),
             x -> cast(cast(round(x, 6) as decimal(20,6)) as string)),
           ',')""").as("quantiles"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** ClickHouse argMax(x, ord) with a deterministic composite ordinal:
    * richest customer per nation, ties broken by highest custkey.
    */
  private def aggArgmax(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey")))
          .as("richest"),
        min_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey")))
          .as("poorest"),
        max(col("c_acctbal")).as("max_bal"))
      .orderBy(col("n_name"))

  private def aggCond(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count_if(col("l_quantity") > 25).as("n_bulk"),
        sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_discounted"),
        Det.dsum(when(col("l_linestatus") === "F",
          col("l_extendedprice")).otherwise(lit(0.0))).as("sum_f_price"))
      .orderBy(col("l_returnflag"))

  private def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), Det.dsum(col("c_acctbal")).as("sum_bal"),
        grouping(col("r_name")).cast("int").as("g_r"),
        grouping(col("n_name")).cast("int").as("g_n"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  private def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Explicit grouping sets — SQL entry point (E2); the DataFrame API has
    * no direct groupingSets call.
    */
  private def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    s.sql(s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        ${Det.oSum("o_totalprice")} AS sum_price
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
  }

  /** ClickHouse `groupArraySorted(N)` — the N smallest values per group
    * as one SORTED array. Scale-honest decomposition: a per-group
    * window rank bounds each group to N rows BEFORE any array exists
    * (collecting the whole group then slicing would ship every row to
    * one reducer per group); the bounded survivors then collect into
    * the sorted array. Ties broken by orderkey so the kept SET is
    * deterministic, array content is values only (the public
    * function's shape). The array leaves as a canonical CSV string —
    * DECIMAL(20,2)-formatted components — per the representational rule
    * above (the driver's comparator hashes scalar cells only).
    */
  private def aggGroupArraySorted(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy(col("o_orderstatus"))
      .agg(expr(
        """array_join(transform(
             array_sort(collect_list(struct(o_totalprice, o_orderkey))),
             p -> cast(cast(round(p.o_totalprice, 2) as decimal(20,2))
               as string)), ',')""").as("smallest5"),
        count(lit(1)).as("n_kept"))
      .orderBy(col("o_orderstatus"))
  }

  /** ClickHouse `groupArrayIntersect` — the intersection of array values
    * across ALL rows of a group (the common vocabulary of a document
    * block). Decomposed relationally: explode to (group, token) pairs,
    * count DISTINCT DOCS per token, keep tokens whose doc count equals
    * the group size — no per-group array state ever exists, so the
    * shuffle carries (group, token) scalars and the operator survives
    * groups of any cardinality (a fold-style intersect would serialize
    * each group through one task).
    */
  private def aggArrayIntersect(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .filter(col("doc_id") % 50 === 0)
      .select(col("lang"), col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
      // two consumers (sizes + the explode chain) and NO exchange in
      // the shared subtree, so ReuseExchange cannot save it: without
      // the checkpoint the full-text tokenization runs twice. The
      // frame is bounded (doc_id % 50 — 2% of documents).
      .localCheckpoint()
    val sizes = docs.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    docs.select(col("lang"), col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(countDistinct(col("doc_id")).as("in_docs"))
      .join(broadcast(sizes), "lang")
      .filter(col("in_docs") === col("n_docs"))
      // n_docs is functionally determined by lang after the filter —
      // carrying it through the grouping key spares a second broadcast
      // join for a value already on every row
      .groupBy(col("lang"), col("n_docs"))
      .agg(array_join(sort_array(collect_list(col("tok"))), ",")
          .as("common_tokens"),
        count(lit(1)).as("n_common"))
      .select(col("lang"), col("n_docs"), col("n_common"),
        col("common_tokens"))
      .orderBy(col("lang"))
  }

  /** ClickHouse bitmap algebra (`bitmapAnd`/`bitmapOr`/`bitmapAndnot`
    * cardinalities, `bitmapJaccard`-style similarity) — the audience-
    * overlap matrix every segment/targeting job computes: for each pair
    * of event-type segments, |A∩B|, |A∪B|, |A\\B| and Jaccard over the
    * user sets. Spark-first decomposition: the per-user "bitmap" is the
    * SORTED SET of its segment memberships, assembled in the ONE fact
    * shuffle (user_id, map-side partial sets, ≤|types| entries each);
    * the pair fanout a<b then happens MAP-SIDE inside a HOF over that
    * bounded set — no self-join, no second fact shuffle — and the
    * intersection counts partial-aggregate into O(types²) cells.
    * Inclusion-exclusion gives |A∪B| and |A\\B| from exact counts; the
    * Jaccard quotient ships raw (one division of identical exact
    * bigints, the win_share rule).
    *
    * Scale notes: exactly one shuffle touches the fact table; pair
    * fanout is bounded by |types|² (5² here) per user and the final
    * matrix is O(types²) rows. At 100 TB this is the roaring-bitmap
    * join shape with the bitmap replaced by Spark's per-key set
    * aggregation.
    */
  private def aggSegmentOverlap(s: SparkSession, dir: String): DataFrame = {
    // the a<=b fanout INCLUDES the diagonal so one (sa, sb) aggregation
    // yields both the pair intersections AND the singleton segment
    // sizes — the fact table aggregates exactly once (PlanShapeSpec
    // pins a single user_id exchange; a separate sizes branch would
    // recompute the set assembly per consumer)
    val cells = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      .select(explode(expr(
        """flatten(transform(ts, (a, i) ->
             transform(slice(ts, i + 1, size(ts)),
               b -> struct(a AS sa, b AS sb))))""")).as("p"))
      .groupBy(col("p.sa").as("seg_a"), col("p.sb").as("seg_b"))
      .agg(count(lit(1)).as("n_and"))
      .localCheckpoint() // O(types²) rows; three consumers below
    val sizes = cells.filter(col("seg_a") === col("seg_b"))
      .select(col("seg_a").as("seg"), col("n_and").as("n"))
    cells.filter(col("seg_a") < col("seg_b"))
      .join(broadcast(sizes.select(col("seg").as("seg_a"),
        col("n").as("na"))), "seg_a")
      .join(broadcast(sizes.select(col("seg").as("seg_b"),
        col("n").as("nb"))), "seg_b")
      .select(col("seg_a"), col("seg_b"), col("na"), col("nb"),
        col("n_and"),
        (col("na") + col("nb") - col("n_and")).as("n_or"),
        (col("na") - col("n_and")).as("n_andnot"),
        (col("n_and").cast("double") /
          (col("na") + col("nb") - col("n_and")).cast("double"))
          .as("jaccard"))
      .orderBy(col("seg_a"), col("seg_b"))
  }

  /** ClickHouse groupArray — deterministic via sorted distinct lists over a
    * bounded domain (event_type, |domain| = 5). The list is serialized to a
    * canonical CSV string at the query edge: the driver's comparator hashes
    * scalar cells, so array-typed outputs must leave as strings.
    */
  private def aggCollect(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** ClickHouse `sumMap` — SummingMergeTree's map-column semantics: per
    * group, values are summed BY MAP KEY and the result is one map column
    * (here per user: event_type → spend in cents). Money is fixed-point
    * (`floor(value·100)` — floor, not cast: Spark's double→int cast
    * truncates while DuckDB's rounds) so the sums are exact bigints. The
    * map serializes to a canonical sorted `k:v` string at the comparison
    * edge — same representational guard as agg_collect/fn_map.
    *
    * Scale notes: one partial-agg shuffle on (user, key) then a
    * map-assembly agg on user — never a collect of raw rows into maps;
    * per-group state is O(distinct keys), the SummingMergeTree invariant.
    */
  private def aggSumMap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("cents")).as("v"))
      .groupBy(col("user_id"))
      .agg(expr("""array_join(transform(
             array_sort(collect_list(struct(event_type, v))),
             s -> concat(s.event_type, ':', s.v)), ',')""").as("spend_map"),
        sum(col("v")).as("total_cents"))
      .orderBy(col("user_id"))

  /** ClickHouse `minMap` / `maxMap` — per-key extrema assembled into one
    * map column per group (cheapest/priciest event per type per user).
    * Same fixed-point cents + canonical sorted `k:v` string edge as
    * agg_sum_map; extrema are exact bigints so no rounding anywhere.
    *
    * Scale notes: identical shape to sumMap — partial min/max on
    * (user, key) then O(distinct keys) map assembly per user; min/max
    * partials are idempotent merges, the cheapest combiner there is.
    */
  private def aggMinMaxMap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      .groupBy(col("user_id"))
      .agg(
        expr("""array_join(transform(
               array_sort(collect_list(struct(event_type, mn))),
               s -> concat(s.event_type, ':', s.mn)), ',')""").as("min_map"),
        expr("""array_join(transform(
               array_sort(collect_list(struct(event_type, mx))),
               s -> concat(s.event_type, ':', s.mx)), ',')""").as("max_map"))
      .orderBy(col("user_id"))

  /** Weight-of-evidence / Information Value — the feature-screening
    * statistic every scoring pipeline computes before training: per
    * feature bin, WOE = ln((good_i/goodΣ)/(bad_i/badΣ)) and
    * IV_i = (good_i/goodΣ − bad_i/badΣ)·WOE. Outcome: line item returned
    * (l_returnflag = 'R'); feature bins: the discount tiers. Counts are
    * exact; the ratios and ln run in double with an IDENTICAL operation
    * order on both engines and round to 6dp at the edge (the lm_score
    * transcendental-parity pattern).
    *
    * Scale notes: one partial-count shuffle on the bin key (|bins| ≈ 11),
    * the totals broadcast back as a 1-row cross join — nothing touches
    * the fact table twice.
    */
  private def aggInfoValue(s: SparkSession, dir: String): DataFrame = {
    val binned = Tables.lineitem(s, dir)
      .groupBy(col("l_discount").as("bin"))
      .agg(count(when(col("l_returnflag") =!= "R", 1)).as("n_good"),
        count(when(col("l_returnflag") === "R", 1)).as("n_bad"))
      .localCheckpoint() // O(bins); two consumers — fact agg runs once
    val tot = binned.agg(sum(col("n_good")).as("tg"), sum(col("n_bad")).as("tb"))
    val pg = col("n_good").cast("double") / col("tg").cast("double")
    val pb = col("n_bad").cast("double") / col("tb").cast("double")
    binned.crossJoin(broadcast(tot))
      // pure-bin guard (class 6, the agg_categorical_iv rule): a bin
      // with n_good = 0 or n_bad = 0 makes ln(0)/x÷0 NULL on Spark but
      // ±inf on DuckDB — filter identically on both engines. Totals are
      // computed BEFORE the filter so the probabilities keep their
      // all-bins denominator.
      .filter(col("n_good") > 0 && col("n_bad") > 0)
      .select(col("bin"), col("n_good"), col("n_bad"),
        round(log(pg / pb), 6).as("woe"),
        round((pg - pb) * log(pg / pb), 6).as("iv_term"))
      .orderBy(col("bin"))
  }

  /** Gini coefficient of spend concentration per nation — the standard
    * inequality statistic (0 = spend spread evenly across customers,
    * →1 = one whale): G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over per-customer
    * spend sorted ascending. The event log first collapses to O(customers)
    * exact decimal spends; the rank window runs per nation over that
    * dimension-sized table; moments are decimal-exact and only the final
    * closed form is double, one op order, rounded at the edge.
    */
  private def aggGini(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spend = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(Det.dsum(col("o_totalprice")).as("x"))
    val bySpend = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("x"), col("c_custkey"))
    spend
      .withColumn("i", row_number().over(bySpend))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("x")).as("sx"),
        Det.dsum(col("i").cast("double") * col("x")).as("six"))
      .select(col("c_nationkey"), col("n"),
        round(lit(2.0) * col("six")
          / (col("n").cast("double") * col("sx"))
          - (col("n") + 1).cast("double") / col("n").cast("double"), 6)
          .as("gini"))
      .orderBy(col("c_nationkey"))
  }

  /** Population Stability Index — the model-monitoring statistic for
    * "did this feature's distribution shift between snapshots":
    * PSI = Σ_bins (pA−pB)·ln(pA/pB) over price bands, comparing early
    * vs late orders (split at the median order date's year). Bin counts
    * are exact; per-bin terms run one double op order, round to 6dp and
    * decimal-sum — the same ln-parity discipline as the JSD drift op,
    * on numeric bins instead of a vocabulary. PSI < 0.1 = stable.
    */
  private def aggPsi(s: SparkSession, dir: String): DataFrame = {
    val half = year(col("o_orderdate")) < 1998
    val bin = least(floor(col("o_totalprice") / 50000.0), lit(5.0)).cast("int")
    val binned = Tables.orders(s, dir)
      .groupBy(bin.as("bin"))
      .agg(count(when(half, 1)).as("na"), count(when(!half, 1)).as("nb"))
      .localCheckpoint() // O(bins); two consumers — fact agg runs once
    val tot = binned.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    val pa = col("na").cast("double") / col("ta").cast("double")
    val pb = col("nb").cast("double") / col("tb").cast("double")
    binned.crossJoin(broadcast(tot))
      // empty-half guard (class 6): a band present in only one snapshot
      // gives ln(0) or x/0 — NULL on Spark, ±inf on DuckDB
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("bin"), col("na"), col("nb"),
        round((pa - pb) * log(pa / pb), 6).as("psi_term"))
      .orderBy(col("bin"))
  }

  /** Median absolute deviation — the outlier-robust dispersion every
    * monitoring rule should use instead of stddev (one wild value moves
    * stddev arbitrarily, moves MAD not at all). Two exact-percentile
    * passes over the group: median first, then the median of absolute
    * deviations from it; both interpolate identically across engines
    * (the agg_quantile parity) and the deviation arithmetic is one op
    * order, rounded at the edge.
    */
  private def aggMad(s: SparkSession, dir: String): DataFrame = {
    val med = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
    Tables.lineitem(s, dir)
      .join(broadcast(med), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 6).as("median_price"),
        round(expr("percentile(abs(l_extendedprice - med), 0.5)"), 6)
          .as("mad"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q3 (shipping priority) — the classic three-table
    * join-aggregate-topk: segment-filtered customers ⋈ pre-cutoff orders
    * ⋈ post-cutoff lineitems, revenue per order, top 10. The value here
    * is the PLAN: both dimension-side filters cut before the joins,
    * customer broadcasts, the aggregation is two-phase, and the top-10
    * is TakeOrderedAndProject — the optimizer doing on one recognizable
    * query everything the individual operator keys assert in isolation.
    */
  private def q3Shipping(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir)
        .filter(expr("o_orderdate < TIMESTAMP_NTZ '1998-03-15'")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .filter(expr("l_shipdate > TIMESTAMP '1998-03-15'")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)

  /** ClickHouse aggregate-combinator algebra (`-If` family) spelled out
    * as one query: countIf / sumIf / avgIf / minIf / maxIf, each the
    * plain aggregate over a predicate-masked input — in Spark a
    * conditional expression INSIDE the aggregate, so everything stays in
    * one two-phase hash aggregation (one scan, one shuffle, regardless
    * of how many conditions ride along).
    */
  private def aggCombinators(s: SparkSession, dir: String): DataFrame = {
    val isR = col("l_returnflag") === "R"
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        count(when(isR, 1)).as("count_if"),
        Det.dsum(when(isR, col("l_quantity")).otherwise(0.0)).as("sum_if"),
        // empty-group guard (class 6): NULL on both engines when no row
        // matches — Spark's 0/0 is NULL but DuckDB's is NaN
        when(count(when(isR, 1)) > 0,
          Det.dsum(when(isR, col("l_quantity")).otherwise(0.0))
            / count(when(isR, 1)).cast("double")).as("avg_if"),
        min(when(isR, col("l_extendedprice"))).as("min_if"),
        max(when(isR, col("l_extendedprice"))).as("max_if"))
      .orderBy(col("l_linestatus"))
  }

  /** χ² over the (returnflag, linestatus) contingency table with the
    * marginal totals — the shared core of agg_cramers_v and the
    * bias-corrected variant. Returns one row (n, r, c, chi2).
    */
  private def chiSquared(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
      .agg(count(lit(1)).as("o"))
      // FOUR consumers (rowTot, colTot, tot, main join): checkpoint the
      // O(cells) contingency table so the lineitem scan+shuffle runs
      // once, not per consumer (the agg_categorical_iv rule)
      .localCheckpoint()
    val rowTot = cells.groupBy(col("rf")).agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy(col("ls")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("rf")).as("r"), countDistinct(col("ls")).as("c"))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    cells
      .join(broadcast(rowTot), "rf").join(broadcast(colTot), "ls")
      .crossJoin(broadcast(tot))
      .select(col("n"), col("r"), col("c"), col("rf"), col("ls"),
        ((col("o").cast("double") - e) * (col("o").cast("double") - e) / e)
          .as("term"))
      .groupBy(col("n"), col("r"), col("c"))
      // sorted-fold, NOT Det.dsum: the χ² terms are off-grid doubles,
      // and the double→DECIMAL(30,6) cast inside dsum is the confirmed
      // Spark-shortest-repr vs DuckDB-exact-binary midpoint split (the
      // agg_anova incident class). Folding the O(cells) terms in
      // (rf, ls) order fixes ONE IEEE summation order on both engines
      // with no decimal cast anywhere.
      .agg(expr("array_sort(collect_list(struct(rf, ls, term)))").as("ts"))
      .select(col("n"), col("r"), col("c"),
        expr("""aggregate(ts, cast(0.0 as double),
                (acc, s) -> acc + s.term)""").as("chi2"))
  }

  /** ClickHouse `cramersV` / `contingency` — association strength between
    * two categoricals (returnflag × linestatus) from the exact
    * contingency table: χ² = Σ(o−e)²/e with e = rowΣ·colΣ/n, then
    * V = √(χ²/(n·min(r−1,c−1))) and C = √(χ²/(χ²+n)). Cell counts are
    * exact; per-cell χ² terms run in double with one operation order and
    * fold in sorted cell order before the closed forms round at the edge.
    *
    * Scale notes: one partial-count shuffle on the (tiny) cell key;
    * row/col margins broadcast back onto the cells. The fact table is
    * scanned once.
    */
  private def aggCramersV(s: SparkSession, dir: String): DataFrame = {
    val chi = chiSquared(s, dir)
    chi.select(col("n"), round(col("chi2"), 6).as("chi2"),
      // single-category guard (class 6): a one-row or one-column table
      // makes min(r−1, c−1) = 0 — V is undefined; NULL on both engines
      // (Spark's unguarded ANSI divide would THROW, DuckDB's gives NaN)
      round(when(least(col("r") - 1, col("c") - 1) === 0,
          lit(null).cast("double"))
        .otherwise(sqrt(col("chi2") / (col("n").cast("double")
          * least(col("r") - 1, col("c") - 1).cast("double")))), 6)
        .as("cramers_v"),
      round(sqrt(col("chi2") / (col("chi2") + col("n").cast("double"))), 6)
        .as("contingency_c"))
  }

  /** ClickHouse `cramersVBiasCorrected` — the Bergsma (2013) correction
    * that keeps V honest on small / sparse tables: φ²⁺ = max(0, χ²/n −
    * (r−1)(c−1)/(n−1)), with the row/col counts shrunk the same way
    * (r̃ = r − (r−1)²/(n−1)). Same single-scan χ² core as agg_cramers_v
    * ([[chiSquared]]); only the closed form differs.
    */
  private def aggCramersVCorrected(s: SparkSession, dir: String): DataFrame = {
    chiSquared(s, dir).select({
      val n = col("n").cast("double")
      val r = col("r").cast("double"); val c = col("c").cast("double")
      val phi2 = col("chi2") / n
      val phi2c = greatest(lit(0.0),
        phi2 - (r - 1) * (c - 1) / (n - 1))
      val rc = r - (r - 1) * (r - 1) / (n - 1)
      val cc = c - (c - 1) * (c - 1) / (n - 1)
      // degenerate guards (class 6), checked in order: n = 1 divides by
      // (n−1) = 0 INSIDE the shrunk counts (must short-circuit before
      // rc/cc evaluate under ANSI), and a single-category table makes
      // the shrunk min(r̃−1, c̃−1) = 0 — NULL on both engines
      Seq(col("n"), round(col("chi2"), 6).as("chi2"),
        when(col("n") === 1, lit(null).cast("double"))
          .when(least(rc - 1, cc - 1) === 0, lit(null).cast("double"))
          .otherwise(round(sqrt(phi2c / least(rc - 1, cc - 1)), 6))
          .as("cramers_v_corrected"))
    }: _*)
  }

  /** Shared oracle CTE chain ending in `chi(n, r, c, chi2)` — the DuckDB
    * twin of [[chiSquared]] (cells → margins → per-cell χ² terms →
    * fold in sorted (rf, ls) cell order, mirroring the Spark side's
    * array_sort(collect_list) fold; both Cramér oracles reuse it
    * verbatim so the χ² arithmetic lives in ONE place per engine).
    */
  private val chiCte: String =
    """cells AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
         COUNT(*) AS o FROM lineitem GROUP BY rf, ls),
       rtot AS (SELECT rf, CAST(SUM(o) AS BIGINT) AS rt
         FROM cells GROUP BY rf),
       ctot AS (SELECT ls, CAST(SUM(o) AS BIGINT) AS ct
         FROM cells GROUP BY ls),
       tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
         COUNT(DISTINCT rf) AS r, COUNT(DISTINCT ls) AS c
         FROM cells),
       terms AS (SELECT n, r, c, rf, ls,
         (CAST(o AS DOUBLE)
           - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             / CAST(n AS DOUBLE))
         * (CAST(o AS DOUBLE)
           - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             / CAST(n AS DOUBLE))
         / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             / CAST(n AS DOUBLE)) AS term
         FROM cells JOIN rtot USING (rf) JOIN ctot USING (ls)
         CROSS JOIN tot),
       chi AS (SELECT n, r, c,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(term ORDER BY rf, ls)), (a, b) -> a + b) AS chi2
         FROM terms GROUP BY n, r, c)"""

  /** ClickHouse `quantileExactLow` / `quantileExactHigh` — the exact
    * quantile pair that brackets an even-count median instead of
    * interpolating: low = element at 0-based index ⌊p·(n−1)⌋, high at
    * ⌈p·(n−1)⌉, both located by cumulative counts over the compressed
    * value DOMAIN. Indices are computed in PURE integer arithmetic
    * ((a·(n−1)) div b and (a·(n−1)+b−1) div b for p = a/b) — no double
    * ever enters, so engines cannot disagree even at floor boundaries.
    *
    * Scale notes: the window rides O(distinct values) per group (the
    * agg_histogram_eq domain-compression argument); a high-cardinality
    * measure would bin first and bracket the bins.
    */
  private def aggQuantileExactBounds(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dom = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("rf"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val part = Window.partitionBy(col("rf"))
    val cumW = Window.partitionBy(col("rf")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dom
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(part))
      .groupBy(col("rf"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n - 1) div 2") + 1, col("v")))
          .as("q50_low"),
        min(when(col("cum") >= expr("n div 2") + 1, col("v")))
          .as("q50_high"),
        min(when(col("cum") >= expr("(9 * (n - 1)) div 10") + 1, col("v")))
          .as("q90_low"),
        min(when(col("cum") >= expr("(9 * (n - 1) + 9) div 10") + 1,
          col("v"))).as("q90_high"))
      .orderBy(col("rf"))
  }

  /** ClickHouse `groupBitAnd` / `groupBitOr` / `groupBitXor` — bitwise
    * aggregate reduction of the order-key domain per returnflag (the
    * permission-mask / feature-flag rollup). Bitwise ops are exact,
    * associative, and commutative, so partial aggregation is free and
    * the result is partitioning-independent by construction.
    *
    * Scale notes: plain two-phase hash aggregate; 8 bytes of state per
    * (group, op) regardless of input size.
    */
  private def aggBit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(bit_and(col("l_orderkey")).as("keys_and"),
        bit_or(col("l_orderkey")).as("keys_or"),
        bit_xor(col("l_orderkey")).as("keys_xor"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** ClickHouse `avgWeighted(x, w)` — quantity-weighted mean price per
    * returnflag. Numerator and denominator accumulate decimal-exact
    * (2dp·integer products — order-free, the Det pattern); ONE final
    * divide is the only inexact op — shipped UNROUNDED (both engines
    * compute the identical IEEE quotient; a 6dp edge round is the
    * confirmed midpoint-split hazard, Core.scala).
    *
    * Scale notes: plain two-phase hash aggregate — map-side partial
    * decimal sums, one key shuffle, no window.
    */
  private def aggAvgWeighted(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        Det.dsum(col("l_extendedprice") * col("l_quantity")).as("wsum"),
        Det.dsum(col("l_quantity")).as("wtot"))
      .select(col("l_returnflag"),
        (col("wsum") / col("wtot")).as("avg_weighted"),
        // floor before the long cast (the agg_sum_map rule): exact
        // today (integral quantities) but Spark truncates while DuckDB
        // rounds if a future drop ships fractional weights
        floor(col("wtot")).cast("long").as("total_weight"))
      .orderBy(col("l_returnflag"))

  /** ClickHouse `singleValueOrNull` — the group's value IF it is unique,
    * else NULL: the data-validation aggregate behind "this dimension
    * should be functionally determined by the key" checks (here: is a
    * customer's order status homogeneous?). Exact and order-free:
    * countDistinct decides, min supplies the witness value.
    *
    * Scale notes: map-side partial distinct-sets collapse per group
    * before the single key shuffle (two-phase distinct aggregate); no
    * window, no second pass.
    */
  private def aggSingleValue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderstatus")).as("n_distinct"),
        min(col("o_orderstatus")).as("mn"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey"),
        when(col("n_distinct") === 1, col("mn")).as("single_status"),
        col("n_distinct"), col("n_orders"))
      .orderBy(col("o_custkey"))

  /** ClickHouse `anyHeavy` — the heavy-hitter value per group, made
    * DETERMINISTIC: ClickHouse's anyHeavy is a single-pass
    * majority-vote (Boyer-Moore) whose answer can depend on arrival
    * order; here the same contract ("a value that occurs at least half
    * the time, if one exists") is computed exactly over the compressed
    * (group, value) domain — the top value by (count DESC, value ASC)
    * qualifies as heavy only when count·2 > group total, else NULL.
    *
    * Scale notes: raw lineitem contributes map-side partial counts into
    * the tiny (returnflag × linestatus) cell table; the window rides
    * O(distinct cells), never O(rows) — the same domain-compression
    * shape as agg_mode/agg_rank_corr. A Boyer-Moore single-pass would
    * save nothing here: the cell table IS the mergeable partial state.
    */
  private def aggAnyHeavy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val part = Window.partitionBy(col("rf"))
    val rk = Window.partitionBy(col("rf"))
      .orderBy(col("cnt").desc, col("v"))
    counts
      .withColumn("tot", sum(col("cnt")).over(part))
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") === 1)
      .select(col("rf"),
        when(col("cnt") * 2 > col("tot"), col("v")).as("heavy"),
        col("cnt").as("top_count"), col("tot").as("n"))
      .orderBy(col("rf"))
  }

  /** Equi-HEIGHT histogram (the quantile-bucket complement of
    * agg_histogram's equi-width buckets): each distinct value lands in
    * bucket ⌊cumBefore·k/N⌋ — ties are atomic (a value never splits), so
    * the bucketing is deterministic at any parallelism.
    *
    * Scale notes: the fact table collapses to its value DOMAIN with one
    * partial-count shuffle; the cumulative runs over the aggregated
    * domain (O(distinct values), not O(rows)) — if even the domain is
    * huge, the same win_ntile cut-point decomposition applies one level
    * down.
    */
  private def aggHistogramEq(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 10
    val domain = Tables.orders(s, dir)
      .groupBy(col("o_totalprice").as("v")).agg(count(lit(1)).as("cnt"))
      // two consumers (cumulative window + n_total agg): checkpoint so
      // the orders aggregation runs once. NOTE (documented limit): on
      // near-unique value domains like o_totalprice this compresses
      // little and the unpartitioned cumulative window below funnels
      // the domain through one task — acceptable at the fixture's
      // O(10^5) orders; at 100 TB use the win_ntile cut-point
      // decomposition one level down (see Scale notes above).
      .localCheckpoint()
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    domain
      .withColumn("cum_before", sum(col("cnt")).over(cum) - col("cnt"))
      .crossJoin(broadcast(domain.agg(sum(col("cnt")).as("n_total"))))
      .withColumn("bucket", expr(s"cum_before * $k div n_total"))
      .groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      .orderBy(col("bucket"))
  }

  /** One full-batch logistic-regression gradient step — distributed ML
    * as an aggregation, with NO transcendental in sight: from zero
    * weights σ(0) = ½ exactly, so the gradient is Σ xⱼ·(½ − y) (a
    * decimal-exact sum), and the post-step prediction threshold
    * σ(w·x) > ½ ⇔ w·x > 0 needs only IEEE mult/add — bit-identical on
    * both engines since w itself is rounded to 6dp first. Features:
    * quantity/50, discount·10, bias; label: line item returned.
    *
    * Scale notes: the gradient is one map-side partial agg (three
    * moments); the evaluation pass broadcasts three scalars. This is the
    * exact shape every distributed full-batch GD iteration has — per
    * step: one agg, one broadcast.
    */
  private def mlLogregStep(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      (col("l_quantity") / 50.0).as("x1"),
      (col("l_discount") * 10.0).as("x2"),
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"))
    val g = li.agg(
      count(lit(1)).as("n"),
      Det.dsum(col("x1") * (lit(0.5) - col("y"))).as("g1"),
      Det.dsum(col("x2") * (lit(0.5) - col("y"))).as("g2"),
      Det.dsum(lit(0.5) - col("y")).as("g0"))
      .select(col("n"),
        round(lit(-0.1) * col("g1") / col("n").cast("double"), 6).as("w1"),
        round(lit(-0.1) * col("g2") / col("n").cast("double"), 6).as("w2"),
        round(lit(-0.1) * col("g0") / col("n").cast("double"), 6).as("w0"))
    li.crossJoin(broadcast(g))
      .select(col("n"), col("w1"), col("w2"), col("w0"),
        when((col("w0") + col("x1") * col("w1") + col("x2") * col("w2") > 0)
          === (col("y") === 1.0), 1L).otherwise(0L).as("hit"))
      .groupBy(col("n"), col("w1"), col("w2"), col("w0"))
      .agg(sum(col("hit")).as("n_correct"))
      .select(col("n"), col("w0"), col("w1"), col("w2"), col("n_correct"))
  }

  /** ClickHouse `simpleLinearRegression` / `corr` / `covarPop` — but
    * cross-engine deterministic: the five moments (n, Σx, Σy, Σxy, Σx²,
    * Σy²) are summed EXACTLY in decimal (products of 2dp fixture values
    * are dyadic-exact doubles, so cast-to-decimal is lossless), then the
    * closed forms run in double with an identical operation order on both
    * engines. Moments are a single map-side partial agg — the textbook
    * one-pass distributed regression.
    */
  private def aggRegression(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity"); val y = col("l_extendedprice")
    def m(c: Column) = sum(c.cast(DecimalType(30, 6))).cast("double")
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n"),
        m(x).as("sx"), m(y).as("sy"), m(x * y).as("sxy"),
        m(x * x).as("sxx"), m(y * y).as("syy"))
      // zero-variance guard (class 6/8): a constant-x or single-row
      // group makes dx exactly 0 on both engines (identical fl
      // products of exact moments) — but Spark Divide(x, 0) is NULL
      // while DuckDB gives ±inf/NaN, so NULL is forced explicitly on
      // BOTH sides (the ts_acf / graph_assortativity rule)
      .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
      .select(col("l_returnflag"),
        when(col("dx") === 0, lit(null).cast("double"))
          .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy"))
            / col("dx"), 6)).as("slope"),
        when(col("dx") === 0, lit(null).cast("double"))
          .otherwise(round((col("sy")
            - (col("n") * col("sxy") - col("sx") * col("sy"))
              / col("dx") * col("sx")) / col("n"), 6)).as("intercept"),
        when(col("dx") === 0 || col("dy") === 0, lit(null).cast("double"))
          .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy"))
            / sqrt(col("dx") * col("dy")), 6)).as("corr"),
        col("n").cast("long").as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** ClickHouse `welchTTest` — the A/B-testing aggregate: Welch's unequal-
    * variance t statistic and Welch–Satterthwaite degrees of freedom
    * comparing purchase vs view values. Same determinism scheme as
    * agg_regression: counts and (value, value²) sums accumulate EXACTLY
    * in decimal in ONE conditional-aggregation pass, then the closed
    * forms run in double with an identical operation order on both
    * engines and ship UNROUNDED — every op (÷, √, ×, −) is IEEE-exact
    * on identical inputs, so the bits match, while a 6dp edge round is
    * the confirmed midpoint-split hazard (Core.scala).
    */
  private def aggTtest(s: SparkSession, dir: String): DataFrame = {
    def m(c: Column) = sum(c.cast(DecimalType(30, 6))).cast("double")
    val v = col("value")
    val isA = col("event_type") === "purchase"
    val isB = col("event_type") === "view"
    Tables.events(s, dir).filter(isA || isB)
      .agg(
        count(when(isA, 1)).cast("double").as("na"),
        count(when(isB, 1)).cast("double").as("nb"),
        m(when(isA, v)).as("sa"), m(when(isA, v * v)).as("qa"),
        m(when(isB, v)).as("sb"), m(when(isB, v * v)).as("qb"))
      .select({
        val ma = col("sa") / col("na"); val mb = col("sb") / col("nb")
        val va = (col("qa") - col("sa") * col("sa") / col("na")) /
          (col("na") - 1)
        val vb = (col("qb") - col("sb") * col("sb") / col("nb")) /
          (col("nb") - 1)
        val sea = va / col("na"); val seb = vb / col("nb")
        val se2 = sea + seb
        // degenerate-sample guard (class 6/9): na<2 or nb<2 divides by
        // zero (Spark NULL vs DuckDB inf), all-constant samples make
        // se2 exactly 0 (identical chains both engines) — NULL both
        val degenerate = col("na") < 2 || col("nb") < 2 || se2 === 0
        Seq(col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          ma.as("mean_a"), mb.as("mean_b"),
          when(degenerate, lit(null).cast("double"))
            .otherwise((ma - mb) / sqrt(se2)).as("t_stat"),
          when(degenerate, lit(null).cast("double"))
            .otherwise(se2 * se2 / (sea * sea / (col("na") - 1) +
              seb * seb / (col("nb") - 1))).as("df"))
      }: _*)
  }

  /** ClickHouse `studentTTest` — the pooled-variance twin of agg_ttest's
    * Welch variant (ClickHouse ships both; Student's form assumes equal
    * variances and gives integer df = na+nb−2). Same exact-decimal
    * moment accumulation, same one-pass conditional aggregation; only
    * the closed form differs.
    */
  private def aggTtestStudent(s: SparkSession, dir: String): DataFrame = {
    def m(c: Column) = sum(c.cast(DecimalType(30, 6))).cast("double")
    val v = col("value")
    val isA = col("event_type") === "purchase"
    val isB = col("event_type") === "view"
    Tables.events(s, dir).filter(isA || isB)
      .agg(
        count(when(isA, 1)).cast("double").as("na"),
        count(when(isB, 1)).cast("double").as("nb"),
        m(when(isA, v)).as("sa"), m(when(isA, v * v)).as("qa"),
        m(when(isB, v)).as("sb"), m(when(isB, v * v)).as("qb"))
      .select({
        val ma = col("sa") / col("na"); val mb = col("sb") / col("nb")
        val ssa = col("qa") - col("sa") * col("sa") / col("na")
        val ssb = col("qb") - col("sb") * col("sb") / col("nb")
        val dfree = col("na") + col("nb") - 2
        val t = (ma - mb) / sqrt(((ssa + ssb) / dfree) *
          (lit(1.0) / col("na") + lit(1.0) / col("nb")))
        // degenerate-sample guard (class 6), the Welch twin's rule:
        // na<2 or nb<2 makes dfree 0 for the minimal (1,1) split (and
        // covers empty sides), all-constant samples make ssa+ssb
        // exactly 0 — the pooled-variance divisor; NULL on both engines
        // (Spark's unguarded ANSI divide would THROW, DuckDB gives NaN)
        val degenerate =
          col("na") < 2 || col("nb") < 2 || (ssa + ssb) === 0
        Seq(col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          ma.as("mean_a"), mb.as("mean_b"),
          when(degenerate, lit(null).cast("double"))
            .otherwise(t).as("t_stat"),
          dfree.cast("long").as("df"))
      }: _*)
  }

  /** ClickHouse `meanZTest(pop_var_x, pop_var_y, conf)(x, y)` — the
    * known-variance member of the hypothesis-test family: when the
    * population variances are given (here the A/B harness constants
    * 1000/800), the statistic needs only the two conditional means, so
    * the whole test is ONE pass of count + exact-decimal sum with no
    * second-moment accumulation at all.
    *
    * Scale notes: single partial-aggregated scan, 1-row shuffle.
    */
  private def aggZtest(s: SparkSession, dir: String): DataFrame = {
    def m(c: Column) = sum(c.cast(DecimalType(30, 6))).cast("double")
    val v = col("value")
    val isA = col("event_type") === "purchase"
    val isB = col("event_type") === "view"
    val varA = lit(1000.0); val varB = lit(800.0)
    Tables.events(s, dir).filter(isA || isB)
      .agg(
        count(when(isA, 1)).cast("double").as("na"),
        count(when(isB, 1)).cast("double").as("nb"),
        m(when(isA, v)).as("sa"), m(when(isB, v)).as("sb"))
      .select({
        val ma = col("sa") / col("na"); val mb = col("sb") / col("nb")
        val z = (ma - mb) / sqrt(varA / col("na") + varB / col("nb"))
        Seq(col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          ma.as("mean_a"), mb.as("mean_b"),
          z.as("z_stat"))
      }: _*)
  }

  /** Wilson 95% score interval for a per-group binomial proportion —
    * the conversion-rate CI an A/B readout reports (the inverse of the
    * agg_min_sample_size planner). Successes/trials are exact integer
    * counts; the interval is ONE double chain of +,−,×,÷,√ — all
    * IEEE-correctly-rounded operations (unlike ln/exp/pow, √ is exact
    * by the standard), so both engines produce bit-identical doubles
    * from IDENTICAL DOUBLE inputs and the bounds ship unrounded (the
    * win_share/agg_ztest rule; a libm call would need the 6dp edge).
    * The identical-inputs clause is load-bearing: the z constant must
    * enter as a DOUBLE on BOTH engines — DuckDB types a bare decimal
    * literal as DECIMAL(7,6) and computes z·z as an exact decimal
    * product, a 1-ulp split from fl(z·z) for most z values (1.644854,
    * 2.575829), which 1.959964 only escapes by coincidence. The oracle
    * therefore spells CAST(1.959964 AS DOUBLE).
    *
    * Scale notes: one partial-count shuffle on the group key; the CI
    * math is O(groups) post-aggregation projection.
    */
  private def aggBinomialCi(s: SparkSession, dir: String): DataFrame = {
    val z = lit(1.959964)
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("double").as("n"),
        count(when(col("o_orderkey") % 3 === 0, 1)).cast("double").as("k"))
      .select({
        val n = col("n"); val k = col("k")
        val p = k / n
        val z2n = z * z / n
        val denom = lit(1.0) + z2n
        val center = (p + z2n / 2) / denom
        val half = z * sqrt(p * (lit(1.0) - p) / n +
          z * z / (n * n * 4)) / denom
        Seq(col("o_orderpriority"),
          n.cast("long").as("trials"), k.cast("long").as("successes"),
          p.as("rate"),
          (center - half).as("ci_low"),
          (center + half).as("ci_high"))
      }: _*)
      .orderBy(col("o_orderpriority"))
  }

  /** ClickHouse `GROUP BY ... WITH TOTALS`: the per-group rows PLUS one
    * grand-total row in the same result (ClickHouse ships it in a
    * separate totals block; relationally it is exactly a one-level
    * ROLLUP). Spark's `rollup` computes both levels in ONE partial-agg
    * pass — the totals row is a map-side re-aggregation, not a second
    * scan (vs the naive UNION ALL of two GROUP BYs, which reads the
    * table twice).
    *
    * Scale notes: rollup duplicates each partial row across its 2
    * grouping sets BEFORE the shuffle, so the totals row costs one
    * extra combiner cell per mapper, not a second 100 TB scan.
    */
  private def aggWithTotals(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"))
      .agg(grouping(col("o_orderstatus")).cast("int").as("is_total"),
        count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("rev"))
      .select(col("is_total"),
        coalesce(col("o_orderstatus"), lit("TOTALS")).as("status"),
        col("n"), round(col("rev"), 2).as("revenue"))
      .orderBy(col("is_total"), col("status"))

  /** ClickHouse `-ForEach` combinator (`sumForEach`, `countForEach`):
    * element-wise aggregation over array columns — the per-dimension
    * reduction every embedding-stats job needs (dimension means for
    * centering, per-dim counts for ragged inputs). Decomposed
    * Spark-first: posexplode to (label, pos, x), ONE partial-agg
    * shuffle on (label, pos) with exact-decimal sums, then the arrays
    * are reassembled per label from the sorted struct list — the array
    * never travels through the aggregation, only scalars do.
    *
    * Scale notes: the (label, pos) key fans a d-dim vector into d
    * scalar cells that partial-aggregate map-side, so shuffle volume is
    * O(labels × dims), independent of row count; reassembly is
    * O(labels) rows.
    */
  private def aggForeach(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"),
        posexplode(slice(transform(col("embedding"), x => x.cast("double")),
          1, 8)).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(Det.dsum(col("x")).as("sv"), count(lit(1)).as("cnt"))
      .groupBy(col("label"))
      .agg(
        expr("""array_join(transform(
             array_sort(collect_list(struct(pos, sv))),
             p -> cast(cast(round(p.sv, 6) as decimal(20,6)) as string)),
             ',')""").as("sum_foreach"),
        expr("""array_join(transform(
             array_sort(collect_list(struct(pos, cnt))),
             p -> cast(p.cnt as string)), ',')""").as("count_foreach"))
      .orderBy(col("label"))

  /** ClickHouse `-Resample` combinator (`countResample(0,1000,100)` /
    * `sumResample`): the aggregate split into fixed key-range buckets,
    * returned as one array per group with EVERY bucket present (zeros
    * filled) — the histogram-of-aggregates shape. The bucket id is a
    * plain derived grouping column, so the whole thing is one
    * partial-agg shuffle on (group, bucket); the dense array is rebuilt
    * from a map so missing buckets can't silently shift positions on a
    * skewed data drop.
    *
    * Scale notes: shuffle keyed on (status, bucket) — cardinality
    * groups × 10 regardless of row count; zero-fill happens on the
    * O(groups) result, never over the fact table.
    */
  private def aggResample(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("b",
        floor(pmod(col("o_custkey"), lit(1000)) / 100).cast("int"))
      .groupBy(col("o_orderstatus"), col("b"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("o_totalprice")).as("sv"))
      .groupBy(col("o_orderstatus"))
      .agg(
        map_from_arrays(collect_list(col("b")), collect_list(col("cnt")))
          .as("cm"),
        map_from_arrays(collect_list(col("b")), collect_list(col("sv")))
          .as("sm"))
      .select(col("o_orderstatus"),
        expr("""array_join(transform(sequence(0, 9),
             i -> cast(coalesce(cm[i], 0L) as string)), ',')""")
          .as("count_resample"),
        expr("""array_join(transform(sequence(0, 9),
             i -> cast(cast(round(coalesce(sm[i], 0d), 2) as decimal(20,2))
               as string)), ',')""")
          .as("sum_resample"))
      .orderBy(col("o_orderstatus"))

  /** ClickHouse `groupArrayMovingSum(3)` / `groupArrayMovingAvg(3)` — the
    * array-form running window per group: element i is the sum (resp.
    * fixed-divisor avg, ClickHouse's sum/N with leading elements
    * included) of the last 3 values at position i, the group's whole
    * series returned as ONE array — distinct from win_moving's
    * row-per-row frame. Group = order, position = (linenumber, partkey,
    * suppkey) — linenumber ALONE is not unique per order in this
    * testdata drop, and a moving sum under a nondeterministic order is
    * partitioning-dependent, so the full composite key pins the series
    * (groups stay small — measured ≤14 rows/order in this synthetic
    * data, vs real TPC-H's 7; an unbounded series would be windowed
    * first). Quantities floor to exact bigints; the avg is one exact
    * IEEE division rounded 6dp at the string edge.
    *
    * Scale notes: one shuffle on the group key; the moving sums come
    * from a bounded 3-row window frame computed row-wise, and the array
    * only materializes at the O(groups) result edge — per-row window
    * state never exceeds the frame.
    */
  private def aggMovingSumArray(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 10 === 0)
      // floor, not a bare cast: Spark's double→bigint cast truncates
      // while DuckDB's rounds to nearest (the agg_sum_map rule) — floor
      // pins one semantics on both engines for non-integral quantities
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), floor(col("l_quantity")).cast("bigint").as("q"))
      .withColumn("mv", sum(col("q")).over(w))
      .groupBy(col("l_orderkey"))
      .agg(
        expr("""array_join(transform(
             array_sort(collect_list(
               struct(l_linenumber, l_partkey, l_suppkey, mv))),
             p -> cast(p.mv as string)), ',')""").as("moving_sum"),
        expr("""array_join(transform(
             array_sort(collect_list(
               struct(l_linenumber, l_partkey, l_suppkey, mv))),
             p -> cast(cast(round(p.mv / 3.0, 6) as decimal(20,6))
               as string)), ',')""").as("moving_avg"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_orderkey"))
  }

  /** ClickHouse `minSampleSizeConversion` / `minSampleSizeContinuous`:
    * the A/B power-analysis planners. Baseline conversion (purchase
    * rate) and metric variance come from ONE exact-decimal pass over
    * events; the z-quantiles for α=0.05 two-sided and power=0.80 are
    * the published constants (1.9599639845400545, 0.8416212335729143 —
    * closed-form, no Φ⁻¹ needed at fixed levels). n per group:
    * conversion form (zα+zβ)²·(p₁q₁+p₂q₂)/mde², continuous form
    * (zα+zβ)²·2σ²/mde², both ceil'd to whole subjects.
    *
    * Scale notes: one partial-aggregated scan → 1 row; the planner
    * arithmetic is driver-scale.
    */
  private def aggMinSampleSize(s: SparkSession, dir: String): DataFrame = {
    def m(c: Column) = sum(c.cast(DecimalType(30, 6))).cast("double")
    val za = lit(1.9599639845400545); val zb = lit(0.8416212335729143)
    val mdeP = lit(0.02); val mdeC = lit(2.0)
    Tables.events(s, dir)
      .agg(count(lit(1)).cast("double").as("n"),
        count(when(col("event_type") === "purchase", 1)).cast("double")
          .as("np"),
        m(col("value")).as("sv"), m(col("value") * col("value")).as("qv"))
      .select({
        val p1 = col("np") / col("n"); val p2 = p1 + mdeP
        val zz = (za + zb) * (za + zb)
        val nConv = ceil(zz * (p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
          / (mdeP * mdeP))
        val varV = (col("qv") - col("sv") * col("sv") / col("n")) /
          (col("n") - 1)
        val nCont = ceil(zz * lit(2.0) * varV / (mdeC * mdeC))
        Seq(p1.as("p_baseline"),
          nConv.cast("long").as("n_conversion"),
          round(varV, 6).as("sigma2"),
          nCont.cast("long").as("n_continuous"))
      }: _*)
  }

  /** ClickHouse `mannWhitneyUTest` — the rank-based non-parametric
    * member of the hypothesis-test family (with agg_ttest's Welch t,
    * agg_anova, agg_cramers_v): purchase vs view values compared by
    * rank sums, tie-aware (average ranks). Formulated over the
    * DISTINCT-value table: R₁ = Σ_v cntA(v)·(below(v) + (ties(v)+1)/2),
    * where below(v) is a running count over values — every term is a
    * dyadic rational (counts and halves), so the double sum is EXACT
    * and order-independent on both engines; only the final z divides.
    * The z denominator carries the standard TIE CORRECTION (ClickHouse
    * does the same): σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1))) with
    * t = ties(v) — on the heavily tied integer `value` domain the
    * uncorrected variance would overstate σ and deflate |z|. Σ(t³−t)
    * terms are integers (exact in double below 2⁵³), so the correction
    * sum is order-independent too.
    *
    * Scale notes: the running count rides the compressed distinct-value
    * domain (the same object a quantile/histogram sketch bins); at
    * 100 TB values bin first and the window becomes a range-partitioned
    * prefix sum over O(bins) — never a sort of the raw rows.
    */
  /** The purchase-vs-view per-distinct-value count table every rank
    * statistic (Mann-Whitney U, AUC, KS) rides: per value, ca =
    * purchase count, cb = view count — one definition so the three
    * formulas cannot drift on the shared compressed domain.
    */
  private def purchaseViewByValue(s: SparkSession, dir: String): DataFrame = {
    val isA = col("event_type") === "purchase"
    Tables.events(s, dir)
      .filter(isA || col("event_type") === "view")
      .select(when(isA, 1L).otherwise(0L).as("a"), col("value"))
      .groupBy(col("value"))
      .agg(sum(col("a")).as("ca"), (count(lit(1)) - sum(col("a"))).as("cb"))
  }

  /** [[purchaseViewByValue]] with the strictly-below running count the
    * midrank formulas (Mann-Whitney, AUC) share.
    */
  private def purchaseViewWithBelow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    purchaseViewByValue(s, dir)
      .withColumn("below",
        coalesce(sum(col("ca") + col("cb")).over(w), lit(0L)))
  }

  private def aggMannWhitney(s: SparkSession, dir: String): DataFrame = {
    purchaseViewWithBelow(s, dir)
      .agg(
        sum(col("ca")).as("n1"), sum(col("cb")).as("n2"),
        sum(col("ca").cast("double") *
          (col("below").cast("double")
            + (col("ca") + col("cb") + 1).cast("double") / 2.0)).as("r1"),
        sum({
          val t = (col("ca") + col("cb")).cast("double")
          t * t * t - t
        }).as("tcorr"))
      .select({
        val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
        val u1 = col("r1") - n1 * (n1 + 1) / 2.0
        val variance = n1 * n2 / 12.0 *
          ((n1 + n2 + 1) - col("tcorr") / ((n1 + n2) * (n1 + n2 - 1)))
        val z = (u1 - n1 * n2 / 2.0) / sqrt(variance)
        // all-tied / near-empty guard (class 6): one tie group covering
        // every row makes variance exactly 0 on both engines (the
        // integer chain is exact below 2^53); n1+n2 < 2 divides by zero
        // inside the tie correction (Spark NULL vs DuckDB inf/nan)
        Seq(col("n1"), col("n2"), u1.as("u1"),
          when(n1 + n2 < 2 || variance === 0, lit(null).cast("double"))
            .otherwise(round(z, 6)).as("z"))
      }: _*)
  }

  /** ClickHouse `kolmogorovSmirnovTest` — completes the hypothesis-test
    * family (Welch t, ANOVA, Mann-Whitney U, Cramér's V): the KS
    * statistic D = sup_x |F₁(x) − F₂(x)| over the two samples' ECDFs,
    * computed on the compressed distinct-value domain exactly like
    * agg_mannwhitney (per-value counts, one ordered prefix-sum window —
    * never a sort of raw rows). D and the scaled λ = (√eₙ + 0.12 +
    * 0.11/√eₙ)·D (eₙ = n₁n₂/(n₁+n₂)) are emitted as the sufficient
    * statistics; the asymptotic p-value is LEFT TO THE CALLER because
    * its exponential series runs through exp(), which is not correctly
    * rounded and differs across engines' libm in the last ulp — D and λ
    * use only division and IEEE-exact sqrt, so they hash bit-identically.
    */
  private def aggKsTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = purchaseViewByValue(s, dir)
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byVal
      .withColumn("cumA", sum(col("ca")).over(w))
      .withColumn("cumB", sum(col("cb")).over(w))
      .withColumn("totA", sum(col("ca")).over(total))
      .withColumn("totB", sum(col("cb")).over(total))
      .agg(
        max(col("totA")).as("n1"), max(col("totB")).as("n2"),
        // empty-side guard (class 6): with totA or totB = 0 every ECDF
        // term is x/0 — NULL per row on both engines (max over all-NULL
        // stays NULL; Spark's unguarded ANSI divide would THROW and
        // DuckDB's NaN would poison MAX)
        max(when(col("totA") === 0 || col("totB") === 0,
            lit(null).cast("double"))
          .otherwise(abs(col("cumA").cast("double") / col("totA")
            - col("cumB").cast("double") / col("totB")))).as("d_stat"))
      .select({
        val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
        val en = sqrt(n1 * n2 / (n1 + n2))
        Seq(col("n1"), col("n2"), round(col("d_stat"), 6).as("d_stat"),
          // same guard for λ: its 0.11/√eₙ term divides by zero whenever
          // one side is empty (eₙ = 0)
          round(when(col("n1") === 0 || col("n2") === 0,
              lit(null).cast("double"))
            .otherwise((en + 0.12 + lit(0.11) / en) * col("d_stat")), 6)
            .as("lambda"))
      }: _*)
  }

  /** ClickHouse `rankCorr` — Spearman's ρ between l_quantity and
    * l_discount, formulated over the COMPRESSED distinct-pair domain
    * (≤ 50·11 cells): marginal counts give each distinct value its
    * tie-averaged rank — carried in HALF-units as the INTEGER
    * 2·below + t + 1, so nothing fractional ever enters a sum — then ρ
    * is Pearson over the cell table weighted by cell count. The sums
    * (Σw·rqh, Σw·rqh², Σw·rqh·rdh) accumulate as DECIMAL(38,0)
    * (exact at any magnitude, order-independent; a double sum would
    * pass 2⁵³ near n≈6e5 and become order-dependent), the half-unit
    * scale cancels in ρ, and only the final divide/sqrt on three
    * exactly-determined integers is IEEE-rounded, then rounded to 6dp.
    *
    * Scale notes: raw lineitem contributes only map-side partial counts
    * into the (q, d) cell table; ranks are prefix sums over the two
    * MARGINAL domains (O(distinct) rows each), never a sort of raw
    * rows. A high-cardinality column would bin first (the quantile-
    * sketch domain) and rank the bins — the window never sees O(rows).
    */
  private def aggRankCorr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.lineitem(s, dir)
      .groupBy(col("l_quantity").as("q"), col("l_discount").as("d"))
      .agg(count(lit(1)).as("w"))
    def ranks(src: DataFrame, key: String, rk: String): DataFrame = {
      val w = Window.orderBy(col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
      src.groupBy(col(key)).agg(sum(col("w")).as("t"))
        .withColumn("below", coalesce(sum(col("t")).over(w), lit(0L)))
        // half-unit integer rank: 2·(below + (t+1)/2)
        .select(col(key), (lit(2L) * col("below") + col("t") + 1).as(rk))
    }
    val joined = cells
      .join(ranks(cells, "q", "rq"), "q")
      .join(ranks(cells, "d", "rd"), "d")
    val wD = col("w").cast("decimal(38,0)")
    joined.agg(
        sum(col("w")).as("n"),
        sum(wD * col("rq")).as("sq"),
        sum(wD * col("rd")).as("sd"),
        sum(wD * col("rq") * col("rq")).as("sqq"),
        sum(wD * col("rd") * col("rd")).as("sdd"),
        sum(wD * col("rq") * col("rd")).as("sqd"))
      .select({
        val nD = col("n").cast("decimal(38,0)")
        val num = (nD * col("sqd") - col("sq") * col("sd")).cast("double")
        val vx = (nD * col("sqq") - col("sq") * col("sq")).cast("double")
        val vy = (nD * col("sdd") - col("sd") * col("sd")).cast("double")
        Seq(col("n"), round(num / sqrt(vx * vy), 6).as("rho"))
      }: _*)
  }

  /** ClickHouse `arrayAUC` — ROC AUC of `value` as a score predicting
    * purchase-vs-view, via the tie-aware rank identity AUC =
    * (R₁ − n₁(n₁+1)/2) / (n₁n₂): the probability a random positive
    * outscores a random negative, ties counted half. Shares
    * agg_mannwhitney's exact distinct-domain formulation (R₁ terms are
    * dyadic rationals, one prefix-sum window over O(distinct) cells);
    * only the final division is inexact, rounded to 6dp.
    *
    * Scale notes: identical to agg_mannwhitney — per-value counts are
    * map-side partials, the window rides the compressed score domain
    * (bins for a continuous 100 TB score column), never raw rows.
    */
  private def aggAuc(s: SparkSession, dir: String): DataFrame = {
    purchaseViewWithBelow(s, dir)
      .agg(
        sum(col("ca")).as("n_pos"), sum(col("cb")).as("n_neg"),
        sum(col("ca").cast("double") *
          (col("below").cast("double")
            + (col("ca") + col("cb") + 1).cast("double") / 2.0)).as("r1"))
      .select({
        val n1 = col("n_pos").cast("double")
        val n2 = col("n_neg").cast("double")
        Seq(col("n_pos"), col("n_neg"),
          // one-class guard (class 6), the Mann-Whitney sibling's rule:
          // with zero positives or zero negatives AUC is undefined
          // (0/0) — NULL on both engines (Spark's unguarded ANSI divide
          // would THROW, DuckDB gives NaN)
          when(n1 === 0 || n2 === 0, lit(null).cast("double"))
            .otherwise((col("r1") - n1 * (n1 + 1) / 2.0) / (n1 * n2))
            .as("auc"))
      }: _*)
  }

  /** Theil's U (uncertainty coefficient) — with Cramér's V this
    * completes the categorical-dependency family: U(X|Y) =
    * (H(X) − H(X|Y)) / H(X) for X = event_type, Y = weekday. Both
    * entropies use the agg_entropy determinism scheme: the O(cells)
    * contingency table leaves aggregation as SORTED arrays and the
    * −Σ p·log2 p folds run sequentially over them, fixing summation
    * order on both engines (cells ≤ |types|·7 — control-plane sized).
    * Unlike the symmetric Cramér's V, U is DIRECTIONAL: how much
    * knowing the weekday reduces event-type uncertainty.
    *
    * Scale notes: one groupBy over the compressed (x, y) domain plus a
    * y-marginal window on O(cells) rows; raw events contribute only
    * map-side partial counts.
    */
  private def aggTheilsU(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.events(s, dir)
      .select(col("event_type").as("x"), weekday(col("ts")).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .withColumn("ny", sum(col("c")).over(Window.partitionBy(col("y"))))
    // NO checkpoint here, measured deliberately: the two consumers
    // (joint + margs) share the events-agg exchange via ReuseExchange,
    // and an eager localCheckpoint on this O(|types|·7) frame COST more
    // than it saved (0.28 s → 0.44 s isolated at sf0.1) — the
    // materialization barrier dominates when the shared subtree is one
    // cheap aggregate. Contrast chiSquared's cells (4 consumers).
    val joint = cells.agg(
      sum(col("c")).as("n"),
      expr("array_sort(collect_list(struct(x, y, c, ny)))").as("cs"))
    val margs = cells.groupBy(col("x")).agg(sum(col("c")).as("nx"))
      .agg(expr("array_sort(collect_list(nx))").as("xs"))
    joint.crossJoin(margs)
      .select(col("n").as("n_events"), {
        val hx = expr(
          """aggregate(xs, cast(0.0 as double), (acc, c) ->
             acc - (c / cast(n as double)) * log2(c / cast(n as double)))""")
        val hxy = expr(
          """aggregate(cs, cast(0.0 as double), (acc, s) ->
             acc - (s.c / cast(n as double)) * log2(s.c / cast(s.ny as double)))""")
        struct(round(hx, 6).as("h_x"), round(hxy, 6).as("h_x_given_y"),
          // single-event-type guard (class 6): H(X) is exactly 0 when
          // one type covers every row (−1·log2(1) on both engines) and
          // U is undefined — NULL both sides (Spark's unguarded ANSI
          // divide would THROW, DuckDB gives NaN)
          round(when(hx === 0, lit(null).cast("double"))
            .otherwise((hx - hxy) / hx), 6).as("theils_u"))
      }.as("u"))
      .select(col("n_events"), col("u.h_x").as("h_x"),
        col("u.h_x_given_y").as("h_x_given_y"),
        col("u.theils_u").as("theils_u"))
  }

  /** ClickHouse `skewPop` / `kurtPop` via the same exact-moment scheme
    * as agg_regression: Σx..Σx⁴ summed in decimal (l_quantity is
    * integer-valued ≤ 50, so q⁴ ≤ 6.25e6 is dyadic-exact), central
    * moments and the closed forms evaluated in double with identical
    * operation order on both engines — deterministic where the built-in
    * skewness()/kurtosis() would drift in the last ulp with partition
    * order.
    */
  private def aggSkewKurt(s: SparkSession, dir: String): DataFrame = {
    def m(c: Column) = sum(c.cast(DecimalType(30, 6))).cast("double")
    val x = col("l_quantity")
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n"), m(x).as("s1"),
        m(x * x).as("s2"), m(x * x * x).as("s3"),
        m(x * x * x * x).as("s4"))
      .select(col("l_returnflag"),
        col("n").cast("long").as("n"), {
          val mean = col("s1") / col("n")
          val m2 = col("s2") / col("n") - mean * mean
          val m3 = col("s3") / col("n") -
            lit(3.0) * mean * (col("s2") / col("n")) +
            lit(2.0) * mean * mean * mean
          val m4 = col("s4") / col("n") -
            lit(4.0) * mean * (col("s3") / col("n")) +
            lit(6.0) * mean * mean * (col("s2") / col("n")) -
            lit(3.0) * mean * mean * mean * mean
          // zero-variance guard (class 6): constant-x groups make m2
          // exactly 0 on both engines (integer-valued quantity, exact
          // moment chain) — force NULL on both instead of Spark-NULL
          // vs DuckDB-±inf/NaN
          struct(
            when(m2 === 0, lit(null).cast("double"))
              .otherwise(round(m3 / sqrt(m2 * m2 * m2), 6)).as("skew"),
            when(m2 === 0, lit(null).cast("double"))
              .otherwise(round(m4 / (m2 * m2), 6)).as("kurt"))
        }.as("sk"))
      .select(col("l_returnflag"), col("n"), col("sk.skew").as("skew_pop"),
        col("sk.kurt").as("kurt_pop"))
      .orderBy(col("l_returnflag"))
  }

  /** Shannon entropy of each user's event-type distribution (ClickHouse
    * `entropy`) — deterministic formulation: the per-type counts leave
    * the aggregation as a SORTED array and the -Σ p·log2 p fold runs
    * sequentially over it, so summation order is fixed on both engines
    * (a plain SUM over double terms would be partition-order-dependent).
    */
  private def aggEntropy(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"),
        expr("array_sort(collect_list(c))").as("cs"))
      .select(col("user_id"), col("n").as("n_events"),
        round(expr(
          "aggregate(cs, cast(0.0 as double), (acc, c) -> acc - (c / cast(n as double)) * log2(c / cast(n as double)))"),
          6).as("entropy"))
      .orderBy(col("user_id"))

  /** Weight-of-evidence / information value (ClickHouse
    * `categoricalInformationValue`) — the feature-screening score a
    * curation pipeline runs before admitting a categorical column into
    * a quality model: per category WOE = ln((pos_i/POS)/(neg_i/NEG)),
    * IV = Σ (pos_i/POS − neg_i/NEG)·WOE_i. Counts leave one partial-agg
    * shuffle exactly; each WOE's ratio is ONE division of exact integer
    * cross-products (pos_i·NEG vs neg_i·POS) so only the final ln needs
    * the 6dp edge round (libm ln differs by ulps across engines — the
    * agg_entropy rule). The IV total folds the SORTED rounded terms
    * sequentially on both engines, so summation order is pinned.
    *
    * Scale notes: one shuffle to O(categories) rows; the total is a
    * bounded fold over that frame joined back by broadcast — never an
    * OVER () funnel on the fact table.
    */
  private def aggCategoricalIv(s: SparkSession, dir: String): DataFrame = {
    val binned = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(when(col("o_orderstatus") === "F", 1)).as("pos"),
        count(when(col("o_orderstatus") =!= "F", 1)).as("neg"))
      // O(categories) rows, two consumers (totals + per-category terms)
      // — checkpoint so the fact aggregation runs once
      .localCheckpoint()
    // the ALL-categories totals derive from the binned counts (pre-
    // filter) — no second scan of the fact table
    val totals = binned.agg(sum(col("pos")).as("tpos"),
      sum(col("neg")).as("tneg"))
    val perCat = binned
      // WOE is undefined for pure categories, and the engines diverge
      // STRUCTURALLY on them (Spark log(0) → NULL, DuckDB ln(0) → -inf),
      // so both sides exclude them identically
      .filter(col("pos") > 0 && col("neg") > 0)
      .crossJoin(broadcast(totals))
      .select({
        val woe = round(log(
          (col("pos") * col("tneg")).cast("double") /
            (col("neg") * col("tpos")).cast("double")), 6)
        val term = round(
          (col("pos").cast("double") / col("tpos").cast("double") -
            col("neg").cast("double") / col("tneg").cast("double")) * woe,
          6)
        Seq(col("o_orderpriority"), col("pos"), col("neg"),
          woe.as("woe"), term.as("iv_term"))
      }: _*)
      // O(categories) rows, two consumers (the IV fold + the final
      // join) — checkpoint so the fact aggregation runs once, the
      // agg_segment_overlap multi-consumer rule
      .localCheckpoint()
    val tot = perCat.agg(round(expr(
      "aggregate(array_sort(collect_list(iv_term)), cast(0.0 as double), (a, x) -> a + x)"),
      6).as("iv_total"))
    perCat.crossJoin(broadcast(tot)).orderBy(col("o_orderpriority"))
  }

  /** Deterministic mode (most frequent value per group): count-then-pick
    * with an explicit (count desc, value asc) tiebreak — Spark's built-in
    * mode() leaves ties unspecified, which a hash-compared pipeline can
    * never use. Two-level aggregate: the heavy first groupBy reduces to
    * |group × distinct value| rows, the pick is a window over that small
    * set.
    */
  private def aggMode(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("l_quantity"))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_quantity"),
        col("cnt").as("mode_count"))
      .orderBy(col("l_returnflag"))
  }

  /** ClickHouse `histogram`-style fixed-bound equi-width histogram:
    * bucket = min(floor(price / 10k), 9) over [0, 100k). Fixed literal
    * bounds keep it ONE pass (a data-driven min/max needs a second scan
    * or an approx sketch — the streaming-friendly trade ClickHouse's
    * adaptive histogram also makes per block).
    */
  private def aggHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("bucket",
        least(floor(col("o_totalprice") / 10000.0), lit(9.0)).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("bucket"))

  def defs: Seq[QueryDef] = Seq(
    QueryDef("agg_regression", aggRegression,
      Some("""WITH m AS (SELECT l_returnflag,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
                CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
                CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
                CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS syy
                FROM lineitem GROUP BY l_returnflag),
              d AS (SELECT l_returnflag, n, sx, sy, sxy,
                (n * sxx - sx * sx) AS dx, (n * syy - sy * sy) AS dy
                FROM m)
              SELECT l_returnflag,
                CASE WHEN dx = 0 THEN NULL
                  ELSE round((n * sxy - sx * sy) / dx, 6) END AS slope,
                CASE WHEN dx = 0 THEN NULL
                  ELSE round((sy - (n * sxy - sx * sy) / dx * sx) / n, 6)
                  END AS intercept,
                CASE WHEN dx = 0 OR dy = 0 THEN NULL
                  ELSE round((n * sxy - sx * sy) / sqrt(dx * dy), 6)
                  END AS corr,
                CAST(n AS BIGINT) AS n
              FROM d ORDER BY l_returnflag""")),
    QueryDef("agg_histogram", aggHistogram,
      Some(s"""SELECT CAST(LEAST(FLOOR(o_totalprice / 10000.0), 9.0)
                 AS INTEGER) AS bucket,
               COUNT(*) AS n, ${Det.oSum("o_totalprice")} AS sum_price
              FROM orders GROUP BY bucket ORDER BY bucket""")),
    QueryDef("agg_mode", aggMode,
      Some("""SELECT l_returnflag, l_quantity AS mode_quantity,
               cnt AS mode_count
              FROM (SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
                      row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY COUNT(*) DESC, l_quantity) AS rn
                    FROM lineitem GROUP BY l_returnflag, l_quantity) t
              WHERE rn = 1 ORDER BY l_returnflag""")),
    QueryDef("agg_skew_kurt", aggSkewKurt,
      Some("""WITH m AS (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s1,
                CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(30,6)))
                  AS DOUBLE) AS s2,
                CAST(SUM(CAST(l_quantity*l_quantity*l_quantity
                  AS DECIMAL(30,6))) AS DOUBLE) AS s3,
                CAST(SUM(CAST(l_quantity*l_quantity*l_quantity*l_quantity
                  AS DECIMAL(30,6))) AS DOUBLE) AS s4
                FROM lineitem GROUP BY l_returnflag),
              c AS (SELECT l_returnflag, n, s1/n AS mean, s2, s3, s4 FROM m),
              d AS (SELECT l_returnflag, n,
                s2/n - mean*mean AS m2,
                s3/n - 3.0*mean*(s2/n) + 2.0*mean*mean*mean AS m3,
                s4/n - 4.0*mean*(s3/n) + 6.0*mean*mean*(s2/n)
                  - 3.0*mean*mean*mean*mean AS m4
                FROM c)
              SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                CASE WHEN m2 = 0 THEN NULL
                  ELSE round(m3 / sqrt(m2*m2*m2), 6) END AS skew_pop,
                CASE WHEN m2 = 0 THEN NULL
                  ELSE round(m4 / (m2*m2), 6) END AS kurt_pop
              FROM d ORDER BY l_returnflag""")),
    QueryDef("agg_entropy", aggEntropy,
      Some("""WITH t AS (SELECT user_id, event_type, COUNT(*) AS c
                FROM events GROUP BY 1, 2),
              g AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
                list_sort(list(c)) AS cs FROM t GROUP BY 1)
              SELECT user_id, n AS n_events,
                round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(cs, c ->
                    -(c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE)))),
                  (a, b) -> a + b), 6) AS entropy
              FROM g ORDER BY user_id""")),
    QueryDef("agg_quantile_weighted", aggQuantileWeighted,
      Some("""SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS wq50,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS wq90,
               COUNT(*) AS total_weight
              FROM (SELECT l_returnflag, l_extendedprice,
                      unnest(range(CAST(l_linenumber AS BIGINT)))
                    FROM lineitem)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),
    QueryDef("agg_unpivot", aggUnpivot,
      Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
              FROM orders GROUP BY o_orderpriority, o_orderstatus
              ORDER BY o_orderpriority, o_orderstatus""")),
    QueryDef("agg_hash", flagship, Some(flagshipOracle)),
    QueryDef("agg_kstest", aggKsTest,
      Some("""WITH e AS (SELECT CASE WHEN event_type = 'purchase'
                  THEN 1 ELSE 0 END AS a, value
                FROM events WHERE event_type IN ('purchase', 'view')),
              v AS (SELECT value, CAST(SUM(a) AS BIGINT) AS ca,
                COUNT(*) - CAST(SUM(a) AS BIGINT) AS cb
                FROM e GROUP BY value),
              c AS (SELECT value, ca, cb,
                SUM(ca) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS cumA,
                SUM(cb) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS cumB,
                SUM(ca) OVER () AS totA, SUM(cb) OVER () AS totB
                FROM v),
              m AS (SELECT CAST(MAX(totA) AS BIGINT) AS n1,
                CAST(MAX(totB) AS BIGINT) AS n2,
                MAX(CASE WHEN totA = 0 OR totB = 0 THEN NULL
                  ELSE ABS(CAST(cumA AS DOUBLE) / totA
                    - CAST(cumB AS DOUBLE) / totB) END) AS d
                FROM c)
              SELECT n1, n2, round(d, 6) AS d_stat,
                round(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                  ELSE (sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                    + 0.12 + 0.11 / sqrt(CAST(n1 AS DOUBLE)
                      * CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE)
                      + CAST(n2 AS DOUBLE)))) * d END, 6) AS lambda
              FROM m""")),
    QueryDef("agg_theils_u", aggTheilsU,
      Some("""WITH e AS (SELECT event_type AS x,
                 isodow(CAST(ts AS TIMESTAMP)) - 1 AS y FROM events),
              cells AS (SELECT x, y, COUNT(*) AS c FROM e GROUP BY x, y),
              wy AS (SELECT x, y, c,
                CAST(SUM(c) OVER (PARTITION BY y) AS BIGINT) AS ny
                FROM cells),
              joint AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                list_sort(list(struct_pack(x := x, y := y, c := c,
                  ny := ny))) AS cs FROM wy),
              margs AS (SELECT list_sort(list(nx)) AS xs FROM
                (SELECT x, CAST(SUM(c) AS BIGINT) AS nx
                 FROM cells GROUP BY x)),
              h AS (SELECT n,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(xs, c ->
                    -(c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE)))),
                  (a, b) -> a + b) AS hx,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(cs, s ->
                    -(s.c / CAST(n AS DOUBLE))
                      * log2(s.c / CAST(s.ny AS DOUBLE)))),
                  (a, b) -> a + b) AS hxy
                FROM joint, margs)
              SELECT n AS n_events, round(hx, 6) AS h_x,
                round(hxy, 6) AS h_x_given_y,
                round(CASE WHEN hx = 0 THEN NULL
                  ELSE (hx - hxy) / hx END, 6) AS theils_u
              FROM h""")),
    QueryDef("agg_categorical_iv", aggCategoricalIv,
      Some("""WITH t AS (SELECT
                 COUNT(CASE WHEN o_orderstatus='F' THEN 1 END) AS tpos,
                 COUNT(CASE WHEN o_orderstatus<>'F' THEN 1 END) AS tneg
                FROM orders),
              c AS (SELECT o_orderpriority,
                 COUNT(CASE WHEN o_orderstatus='F' THEN 1 END) AS pos,
                 COUNT(CASE WHEN o_orderstatus<>'F' THEN 1 END) AS neg
                FROM orders GROUP BY o_orderpriority
                HAVING pos > 0 AND neg > 0),
              p AS (SELECT o_orderpriority, pos, neg,
                 round(ln(CAST(pos*tneg AS DOUBLE)
                   / CAST(neg*tpos AS DOUBLE)), 6) AS woe,
                 round((CAST(pos AS DOUBLE)/tpos
                     - CAST(neg AS DOUBLE)/tneg)
                   * round(ln(CAST(pos*tneg AS DOUBLE)
                     / CAST(neg*tpos AS DOUBLE)), 6), 6) AS iv_term
                FROM c CROSS JOIN t),
              tot AS (SELECT round(list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list(iv_term ORDER BY iv_term)),
                 (a, x) -> a + x), 6) AS iv_total FROM p)
              SELECT p.o_orderpriority, p.pos, p.neg, p.woe, p.iv_term,
                tot.iv_total
              FROM p CROSS JOIN tot ORDER BY o_orderpriority""")),
    QueryDef("agg_mannwhitney", aggMannWhitney,
      Some("""WITH e AS (SELECT CASE WHEN event_type = 'purchase'
                  THEN 1 ELSE 0 END AS a, value
                FROM events WHERE event_type IN ('purchase', 'view')),
              v AS (SELECT value, CAST(SUM(a) AS BIGINT) AS ca,
                COUNT(*) - CAST(SUM(a) AS BIGINT) AS cb
                FROM e GROUP BY value),
              r AS (SELECT ca, cb, COALESCE(SUM(ca + cb) OVER
                  (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS below FROM v),
              m AS (SELECT CAST(SUM(ca) AS BIGINT) AS n1,
                CAST(SUM(cb) AS BIGINT) AS n2,
                SUM(CAST(ca AS DOUBLE) * (CAST(below AS DOUBLE)
                  + CAST(ca + cb + 1 AS DOUBLE) / 2.0)) AS r1,
                SUM(CAST(ca + cb AS DOUBLE) * CAST(ca + cb AS DOUBLE)
                  * CAST(ca + cb AS DOUBLE) - CAST(ca + cb AS DOUBLE))
                  AS tcorr
                FROM r),
              f AS (SELECT n1, n2,
                r1 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1) / 2.0
                  AS u1,
                CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                  * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1)
                    - tcorr / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                      * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1)))
                  AS variance
                FROM m)
              SELECT n1, n2, u1,
                CASE WHEN n1 + n2 < 2 OR variance = 0 THEN NULL
                  ELSE round((u1
                      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                    / sqrt(variance), 6) END AS z
              FROM f""")),
    QueryDef("agg_rank_corr", aggRankCorr,
      Some("""WITH cells AS (SELECT l_quantity AS q, l_discount AS d,
                COUNT(*) AS w FROM lineitem GROUP BY q, d),
              rq AS (SELECT q, 2 * below + t + 1 AS rq
                FROM (SELECT q, CAST(SUM(w) AS BIGINT) AS t,
                  CAST(COALESCE(SUM(SUM(w)) OVER (ORDER BY q
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS below
                  FROM cells GROUP BY q) mq),
              rd AS (SELECT d, 2 * below + t + 1 AS rd
                FROM (SELECT d, CAST(SUM(w) AS BIGINT) AS t,
                  CAST(COALESCE(SUM(SUM(w)) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS below
                  FROM cells GROUP BY d) md),
              m AS (SELECT CAST(SUM(w) AS BIGINT) AS n,
                SUM(CAST(w AS HUGEINT) * rq) AS sq,
                SUM(CAST(w AS HUGEINT) * rd) AS sd,
                SUM(CAST(w AS HUGEINT) * rq * rq) AS sqq,
                SUM(CAST(w AS HUGEINT) * rd * rd) AS sdd,
                SUM(CAST(w AS HUGEINT) * rq * rd) AS sqd
                FROM cells JOIN rq USING (q) JOIN rd USING (d))
              SELECT n, round(
                CAST(CAST(n AS HUGEINT) * sqd - sq * sd AS DOUBLE)
                / sqrt(CAST(CAST(n AS HUGEINT) * sqq - sq * sq AS DOUBLE)
                  * CAST(CAST(n AS HUGEINT) * sdd - sd * sd AS DOUBLE)),
                6) AS rho
              FROM m""")),
    QueryDef("agg_auc", aggAuc,
      Some("""WITH e AS (SELECT CASE WHEN event_type = 'purchase'
                  THEN 1 ELSE 0 END AS a, value
                FROM events WHERE event_type IN ('purchase', 'view')),
              v AS (SELECT value, CAST(SUM(a) AS BIGINT) AS ca,
                COUNT(*) - CAST(SUM(a) AS BIGINT) AS cb
                FROM e GROUP BY value),
              r AS (SELECT ca, cb, COALESCE(SUM(ca + cb) OVER
                  (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS below FROM v),
              m AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_pos,
                CAST(SUM(cb) AS BIGINT) AS n_neg,
                SUM(CAST(ca AS DOUBLE) * (CAST(below AS DOUBLE)
                  + CAST(ca + cb + 1 AS DOUBLE) / 2.0)) AS r1
                FROM r)
              SELECT n_pos, n_neg,
                CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                  ELSE (r1 - CAST(n_pos AS DOUBLE)
                      * (CAST(n_pos AS DOUBLE) + 1) / 2.0)
                    / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
                  END AS auc
              FROM m""")),
    QueryDef("agg_ttest", aggTtest,
      Some("""WITH m AS (SELECT
                CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS DOUBLE) AS na,
                CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                  AS DOUBLE) AS nb,
                CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE) AS sa,
                CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value * value AS DECIMAL(30,6)) END) AS DOUBLE) AS qa,
                CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE) AS sb,
                CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(value * value AS DECIMAL(30,6)) END) AS DOUBLE) AS qb
                FROM events WHERE event_type IN ('purchase', 'view')),
              f AS (SELECT na, nb, sa / na AS ma, sb / nb AS mb,
                (qa - sa * sa / na) / (na - 1) / na AS sea,
                (qb - sb * sb / nb) / (nb - 1) / nb AS seb
                FROM m)
              SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                ma AS mean_a, mb AS mean_b,
                CASE WHEN na < 2 OR nb < 2 OR sea + seb = 0 THEN NULL
                  ELSE (ma - mb) / sqrt(sea + seb) END AS t_stat,
                CASE WHEN na < 2 OR nb < 2 OR sea + seb = 0 THEN NULL
                  ELSE (sea + seb) * (sea + seb)
                    / (sea * sea / (na - 1) + seb * seb / (nb - 1))
                  END AS df
              FROM f""")),
    QueryDef("agg_ttest_student", aggTtestStudent,
      Some("""WITH m AS (SELECT
                CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS DOUBLE) AS na,
                CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                  AS DOUBLE) AS nb,
                CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE) AS sa,
                CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value * value AS DECIMAL(30,6)) END) AS DOUBLE) AS qa,
                CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE) AS sb,
                CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(value * value AS DECIMAL(30,6)) END) AS DOUBLE) AS qb
                FROM events WHERE event_type IN ('purchase', 'view')),
              f AS (SELECT na, nb, sa / na AS ma, sb / nb AS mb,
                (qa - sa * sa / na) AS ssa, (qb - sb * sb / nb) AS ssb
                FROM m)
              SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                ma AS mean_a, mb AS mean_b,
                CASE WHEN na < 2 OR nb < 2 OR ssa + ssb = 0 THEN NULL
                  ELSE (ma - mb) / sqrt(((ssa + ssb) / (na + nb - 2))
                    * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))
                  END AS t_stat,
                CAST(na + nb - 2 AS BIGINT) AS df
              FROM f""")),
    QueryDef("agg_binomial_ci", aggBinomialCi,
      Some("""WITH g AS (SELECT o_orderpriority,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(COUNT(CASE WHEN o_orderkey % 3 = 0 THEN 1 END)
                   AS DOUBLE) AS k,
                 -- the constant must enter as DOUBLE: a bare 1.959964
                 -- literal is DECIMAL(7,6) here, making z*z an EXACT
                 -- decimal product where Spark computes fl(z*z) — a
                 -- 1-ulp split for most z values (1.644854, 2.575829)
                 CAST(1.959964 AS DOUBLE) AS z
                FROM orders GROUP BY o_orderpriority),
              w AS (SELECT o_orderpriority, n, k,
                 k / n AS p,
                 (k / n + z * z / n / 2)
                   / (1.0 + z * z / n) AS center,
                 z * sqrt(k / n * (1.0 - k / n) / n
                     + z * z / (n * n * 4))
                   / (1.0 + z * z / n) AS half
                FROM g)
              SELECT o_orderpriority, CAST(n AS BIGINT) AS trials,
                CAST(k AS BIGINT) AS successes, p AS rate,
                center - half AS ci_low, center + half AS ci_high
              FROM w ORDER BY o_orderpriority""")),
    QueryDef("agg_ztest", aggZtest,
      Some("""WITH m AS (SELECT
                CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS DOUBLE) AS na,
                CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                  AS DOUBLE) AS nb,
                CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE) AS sa,
                CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE) AS sb
                FROM events WHERE event_type IN ('purchase', 'view'))
              SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                sa / na AS mean_a, sb / nb AS mean_b,
                (sa / na - sb / nb)
                  / sqrt(1000.0 / na + 800.0 / nb) AS z_stat
              FROM m""")),
    QueryDef("agg_with_totals", aggWithTotals,
      Some(s"""SELECT CAST(GROUPING(o_orderstatus) AS INTEGER) AS is_total,
                COALESCE(o_orderstatus, 'TOTALS') AS status,
                COUNT(*) AS n,
                round(${Det.oSum("o_totalprice")}, 2) AS revenue
              FROM orders GROUP BY ROLLUP(o_orderstatus)
              ORDER BY is_total, status""")),
    QueryDef("agg_foreach", aggForeach,
      Some(s"""WITH e AS (SELECT label,
                 unnest(CAST(embedding[1:8] AS DOUBLE[])) AS x,
                 generate_subscripts(embedding[1:8], 1) AS pos
                FROM embeddings),
              g AS (SELECT label, pos, ${Det.oSum("x")} AS sv,
                 COUNT(*) AS cnt
                FROM e GROUP BY label, pos)
              SELECT label,
                array_to_string(list(CAST(round(sv, 6) AS DECIMAL(20,6))
                  ORDER BY pos), ',') AS sum_foreach,
                array_to_string(list(cnt ORDER BY pos), ',')
                  AS count_foreach
              FROM g GROUP BY label ORDER BY label""")),
    QueryDef("agg_resample", aggResample,
      Some(s"""WITH buckets AS (
                SELECT CAST(unnest(generate_series(0, 9)) AS INTEGER) AS b),
              st AS (SELECT DISTINCT o_orderstatus FROM orders),
              g AS (SELECT o_orderstatus,
                 CAST(floor((o_custkey % 1000) / 100) AS INTEGER) AS b,
                 COUNT(*) AS cnt, ${Det.oSum("o_totalprice")} AS sv
                FROM orders GROUP BY 1, 2),
              f AS (SELECT st.o_orderstatus, buckets.b,
                 COALESCE(g.cnt, 0) AS cnt,
                 COALESCE(g.sv, CAST(0 AS DOUBLE)) AS sv
                FROM st CROSS JOIN buckets
                LEFT JOIN g ON g.o_orderstatus = st.o_orderstatus
                  AND g.b = buckets.b)
              SELECT o_orderstatus,
                array_to_string(list(cnt ORDER BY b), ',')
                  AS count_resample,
                array_to_string(list(CAST(round(sv, 2) AS DECIMAL(20,2))
                  ORDER BY b), ',') AS sum_resample
              FROM f GROUP BY o_orderstatus ORDER BY o_orderstatus""")),
    QueryDef("agg_moving_sum_array", aggMovingSumArray,
      Some("""WITH b AS (SELECT l_orderkey, l_linenumber, l_partkey,
                 l_suppkey, CAST(floor(l_quantity) AS BIGINT) AS q
                FROM lineitem WHERE l_orderkey % 10 = 0),
              m AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                 CAST(SUM(q) OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS mv
                FROM b)
              SELECT l_orderkey,
                array_to_string(list(mv
                  ORDER BY l_linenumber, l_partkey, l_suppkey), ',')
                  AS moving_sum,
                array_to_string(list(CAST(round(mv / 3.0, 6)
                  AS DECIMAL(20,6))
                  ORDER BY l_linenumber, l_partkey, l_suppkey), ',')
                  AS moving_avg,
                COUNT(*) AS n_lines
              FROM m GROUP BY l_orderkey ORDER BY l_orderkey""")),
    QueryDef("agg_min_sample_size", aggMinSampleSize,
      Some("""WITH m AS (SELECT
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS DOUBLE) AS np,
                CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sv,
                CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE)
                  AS qv
                FROM events),
              f AS (SELECT np / n AS p1, np / n + 0.02 AS p2,
                (qv - sv * sv / n) / (n - 1) AS varv,
                (CAST(1.9599639845400545 AS DOUBLE)
                    + CAST(0.8416212335729143 AS DOUBLE))
                  * (CAST(1.9599639845400545 AS DOUBLE)
                    + CAST(0.8416212335729143 AS DOUBLE)) AS zz
                FROM m)
              SELECT p1 AS p_baseline,
                CAST(ceil(zz * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
                  / (CAST(0.02 AS DOUBLE) * CAST(0.02 AS DOUBLE)))
                  AS BIGINT) AS n_conversion,
                round(varv, 6) AS sigma2,
                CAST(ceil(zz * 2.0 * varv / (2.0 * 2.0)) AS BIGINT)
                  AS n_continuous
              FROM f""")),
    QueryDef("agg_gini", aggGini,
      Some(s"""WITH spend AS (SELECT c_nationkey, c_custkey,
                 ${Det.oSum("o_totalprice")} AS x
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 GROUP BY c_nationkey, c_custkey),
               r AS (SELECT c_nationkey, c_custkey, x, ROW_NUMBER() OVER
                 (PARTITION BY c_nationkey ORDER BY x, c_custkey) AS i
                 FROM spend),
               g AS (SELECT c_nationkey, COUNT(*) AS n,
                 ${Det.oSum("x")} AS sx,
                 ${Det.oSum("CAST(i AS DOUBLE) * x")} AS six
                 FROM r GROUP BY c_nationkey)
              SELECT c_nationkey, n,
                round(2.0 * six / (CAST(n AS DOUBLE) * sx)
                  - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
              FROM g ORDER BY c_nationkey""")),
    QueryDef("agg_psi", aggPsi,
      Some("""WITH b AS (SELECT
                 CAST(LEAST(floor(o_totalprice / 50000.0), 5.0) AS INTEGER)
                   AS bin,
                 COUNT(CASE WHEN EXTRACT(year FROM o_orderdate) < 1998
                   THEN 1 END) AS na,
                 COUNT(CASE WHEN EXTRACT(year FROM o_orderdate) >= 1998
                   THEN 1 END) AS nb
                 FROM orders GROUP BY bin),
               t AS (SELECT CAST(SUM(na) AS BIGINT) AS ta,
                 CAST(SUM(nb) AS BIGINT) AS tb FROM b)
              SELECT bin, na, nb,
                round((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)
                    - CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))
                  * ln((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE))
                    / (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))), 6)
                  AS psi_term
              FROM b, t WHERE na > 0 AND nb > 0 ORDER BY bin""")),
    QueryDef("agg_mad", aggMad,
      Some("""WITH m AS (SELECT l_returnflag,
                 quantile_cont(l_extendedprice, 0.5) AS med
                 FROM lineitem GROUP BY l_returnflag)
              SELECT l_returnflag, COUNT(*) AS n,
                round(MAX(med), 6) AS median_price,
                round(quantile_cont(abs(l_extendedprice - med), 0.5), 6)
                  AS mad
              FROM lineitem JOIN m USING (l_returnflag)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),
    QueryDef("q3_shipping", q3Shipping,
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
               ${Det.oSum("l_extendedprice * (1 - l_discount)")} AS revenue
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1998-03-15'
                AND CAST(l_shipdate AS TIMESTAMP) > TIMESTAMP '1998-03-15'
              GROUP BY l_orderkey, o_orderdate, o_orderpriority
              ORDER BY revenue DESC, o_orderdate, l_orderkey
              LIMIT 10""")),
    QueryDef("agg_combinators", aggCombinators,
      Some(s"""SELECT l_linestatus,
               COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS count_if,
               ${Det.oSum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END")}
                 AS sum_if,
               CASE WHEN COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) > 0
                 THEN ${Det.oSum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END")}
                   / CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END)
                     AS DOUBLE) END AS avg_if,
               MIN(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END)
                 AS min_if,
               MAX(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END)
                 AS max_if
              FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),
    QueryDef("agg_quantiles_array", aggQuantilesArray,
      Some("""SELECT l_returnflag,
                array_to_string(list_transform(
                  quantile_cont(l_quantity, [0.25, 0.5, 0.75, 0.9]),
                  x -> CAST(round(x, 6) AS DECIMAL(20,6))), ',')
                  AS quantiles,
                COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag
              ORDER BY l_returnflag""")),
    QueryDef("agg_quantile_exact_bounds", aggQuantileExactBounds,
      Some("""WITH dom AS (SELECT l_returnflag AS rf, l_quantity AS v,
                 COUNT(*) AS cnt FROM lineitem GROUP BY rf, v),
               w AS (SELECT rf, v, cnt,
                 CAST(SUM(cnt) OVER (PARTITION BY rf ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum,
                 CAST(SUM(cnt) OVER (PARTITION BY rf) AS BIGINT) AS n
                 FROM dom)
              SELECT rf, MAX(n) AS n,
                MIN(CASE WHEN cum >= (n - 1) // 2 + 1 THEN v END)
                  AS q50_low,
                MIN(CASE WHEN cum >= n // 2 + 1 THEN v END) AS q50_high,
                MIN(CASE WHEN cum >= (9 * (n - 1)) // 10 + 1 THEN v END)
                  AS q90_low,
                MIN(CASE WHEN cum >= (9 * (n - 1) + 9) // 10 + 1 THEN v END)
                  AS q90_high
              FROM w GROUP BY rf ORDER BY rf""")),
    QueryDef("agg_bit", aggBit,
      Some("""SELECT l_returnflag,
                CAST(BIT_AND(l_orderkey) AS BIGINT) AS keys_and,
                CAST(BIT_OR(l_orderkey) AS BIGINT) AS keys_or,
                CAST(BIT_XOR(l_orderkey) AS BIGINT) AS keys_xor,
                COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    QueryDef("agg_avg_weighted", aggAvgWeighted,
      Some(s"""SELECT l_returnflag,
                ${Det.oSum("l_extendedprice * l_quantity")}
                  / ${Det.oSum("l_quantity")} AS avg_weighted,
                CAST(floor(${Det.oSum("l_quantity")}) AS BIGINT)
                  AS total_weight
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    ),
    QueryDef("agg_single_value", aggSingleValue,
      Some("""SELECT o_custkey,
                CASE WHEN COUNT(DISTINCT o_orderstatus) = 1
                  THEN MIN(o_orderstatus) END AS single_status,
                COUNT(DISTINCT o_orderstatus) AS n_distinct,
                COUNT(*) AS n_orders
              FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),
    QueryDef("agg_any_heavy", aggAnyHeavy,
      Some("""WITH c AS (SELECT l_returnflag AS rf, l_linestatus AS v,
                 COUNT(*) AS cnt FROM lineitem GROUP BY rf, v),
               r AS (SELECT rf, v, cnt,
                 CAST(SUM(cnt) OVER (PARTITION BY rf) AS BIGINT) AS tot,
                 ROW_NUMBER() OVER (PARTITION BY rf
                   ORDER BY cnt DESC, v) AS rk FROM c)
              SELECT rf, CASE WHEN cnt * 2 > tot THEN v END AS heavy,
                cnt AS top_count, tot AS n
              FROM r WHERE rk = 1 ORDER BY rf""")),
    QueryDef("agg_cramers_v", aggCramersV,
      Some(s"""WITH $chiCte
              SELECT n, round(chi2, 6) AS chi2,
                round(CASE WHEN LEAST(r - 1, c - 1) = 0 THEN NULL
                  ELSE sqrt(chi2 / (CAST(n AS DOUBLE)
                    * CAST(LEAST(r - 1, c - 1) AS DOUBLE))) END, 6)
                  AS cramers_v,
                round(sqrt(chi2 / (chi2 + CAST(n AS DOUBLE))), 6)
                  AS contingency_c
              FROM chi""")),
    QueryDef("agg_cramers_v_corrected", aggCramersVCorrected,
      Some(s"""WITH $chiCte,
               f AS (SELECT n, chi2,
                 GREATEST(0.0, chi2 / CAST(n AS DOUBLE)
                   - CAST(r - 1 AS DOUBLE) * CAST(c - 1 AS DOUBLE)
                     / CAST(n - 1 AS DOUBLE)) AS phi2c,
                 CAST(r AS DOUBLE) - CAST(r - 1 AS DOUBLE)
                   * CAST(r - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS rc,
                 CAST(c AS DOUBLE) - CAST(c - 1 AS DOUBLE)
                   * CAST(c - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS cc
                 FROM chi)
              SELECT n, round(chi2, 6) AS chi2,
                CASE WHEN n = 1 THEN NULL
                  WHEN LEAST(rc - 1, cc - 1) = 0 THEN NULL
                  ELSE round(sqrt(phi2c / LEAST(rc - 1, cc - 1)), 6) END
                  AS cramers_v_corrected
              FROM f""")),
    QueryDef("agg_histogram_eq", aggHistogramEq,
      Some("""WITH d AS (SELECT o_totalprice AS v, COUNT(*) AS cnt
                 FROM orders GROUP BY v),
               c AS (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
                 AS BIGINT) AS cum_before FROM d),
               t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM d)
              SELECT CAST(cum_before * 10 // n_total AS BIGINT) AS bucket,
                CAST(SUM(cnt) AS BIGINT) AS n, MIN(v) AS lo, MAX(v) AS hi
              FROM c, t GROUP BY bucket ORDER BY bucket""")),
    QueryDef("ml_logreg_step", mlLogregStep,
      Some(s"""WITH li AS (SELECT l_quantity / 50.0 AS x1,
                 l_discount * 10.0 AS x2,
                 CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
                 FROM lineitem),
               g AS (SELECT COUNT(*) AS n,
                 ${Det.oSum("x1 * (0.5 - y)")} AS g1,
                 ${Det.oSum("x2 * (0.5 - y)")} AS g2,
                 ${Det.oSum("0.5 - y")} AS g0 FROM li),
               w AS (SELECT n,
                 round(-0.1 * g1 / CAST(n AS DOUBLE), 6) AS w1,
                 round(-0.1 * g2 / CAST(n AS DOUBLE), 6) AS w2,
                 round(-0.1 * g0 / CAST(n AS DOUBLE), 6) AS w0 FROM g)
              SELECT n, w0, w1, w2,
                CAST(SUM(CASE WHEN (w0 + x1 * w1 + x2 * w2 > 0) = (y = 1.0)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
              FROM li, w GROUP BY n, w0, w1, w2""")),
    QueryDef("agg_minmax_map", aggMinMaxMap,
      Some("""WITH c AS (SELECT user_id, event_type,
                 MIN(CAST(floor(value * 100) AS BIGINT)) AS mn,
                 MAX(CAST(floor(value * 100) AS BIGINT)) AS mx
                 FROM events GROUP BY user_id, event_type)
              SELECT user_id,
                string_agg(event_type || ':' || mn, ',' ORDER BY event_type)
                  AS min_map,
                string_agg(event_type || ':' || mx, ',' ORDER BY event_type)
                  AS max_map
              FROM c GROUP BY user_id ORDER BY user_id""")),
    QueryDef("agg_info_value", aggInfoValue,
      Some("""WITH b AS (SELECT l_discount AS bin,
                 COUNT(CASE WHEN l_returnflag <> 'R' THEN 1 END) AS n_good,
                 COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_bad
                 FROM lineitem GROUP BY l_discount),
               t AS (SELECT CAST(SUM(n_good) AS BIGINT) AS tg,
                 CAST(SUM(n_bad) AS BIGINT) AS tb FROM b)
              SELECT bin, n_good, n_bad,
                round(ln((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE))
                  / (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))), 6) AS woe,
                round(((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE))
                  - (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE)))
                  * ln((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE))
                  / (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))), 6)
                  AS iv_term
              FROM b, t WHERE n_good > 0 AND n_bad > 0 ORDER BY bin""")),
    QueryDef("agg_sum_map", aggSumMap,
      Some("""WITH c AS (SELECT user_id, event_type,
                 CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
                 FROM events GROUP BY user_id, event_type)
              SELECT user_id,
                string_agg(event_type || ':' || v, ',' ORDER BY event_type)
                  AS spend_map,
                CAST(SUM(v) AS BIGINT) AS total_cents
              FROM c GROUP BY user_id ORDER BY user_id""")),
    QueryDef("agg_distinct_exact", aggDistinctExact,
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(*) AS n_rows
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    QueryDef("agg_distinct_approx", aggDistinctApprox, None),
    QueryDef("agg_quantile", aggQuantile,
      Some("""SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 6) AS q25,
               round(quantile_cont(l_quantity, 0.5), 6) AS q50,
               round(quantile_cont(l_quantity, 0.75), 6) AS q75,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    QueryDef("agg_argmax", aggArgmax,
      Some("""WITH ranked AS (
                SELECT n_name, c_name, c_acctbal,
                  row_number() OVER (PARTITION BY n_name
                    ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
                  row_number() OVER (PARTITION BY n_name
                    ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
                FROM customer JOIN nation ON c_nationkey = n_nationkey)
              SELECT n_name,
                MAX(CASE WHEN rmax = 1 THEN c_name END) AS richest,
                MAX(CASE WHEN rmin = 1 THEN c_name END) AS poorest,
                MAX(c_acctbal) AS max_bal
              FROM ranked GROUP BY n_name ORDER BY n_name""")),
    QueryDef("agg_cond", aggCond,
      Some(s"""SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
               CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
               ${Det.oSum("CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0.0 END")} AS sum_f_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    QueryDef("agg_rollup", aggRollup,
      Some(s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
               ${Det.oSum("c_acctbal")} AS sum_bal,
               CAST(GROUPING(r_name) AS INTEGER) AS g_r,
               CAST(GROUPING(n_name) AS INTEGER) AS g_n
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY ROLLUP (r_name, n_name)
              ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),
    QueryDef("agg_cube", aggCube,
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ${Det.oSum("l_quantity")} AS sum_qty,
               CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
              FROM lineitem
              GROUP BY CUBE (l_returnflag, l_linestatus)
              ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),
    QueryDef("agg_grouping_sets", aggGroupingSets,
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ${Det.oSum("o_totalprice")} AS sum_price
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),
    QueryDef("agg_group_array_sorted", aggGroupArraySorted,
      Some("""WITH r AS (SELECT o_orderstatus, o_totalprice, o_orderkey,
                 row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn
                 FROM orders)
              SELECT o_orderstatus,
                array_to_string(
                  list(CAST(round(o_totalprice, 2) AS DECIMAL(20,2))
                    ORDER BY o_totalprice, o_orderkey), ',') AS smallest5,
                COUNT(*) AS n_kept
              FROM r WHERE rn <= 5
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),
    QueryDef("agg_array_intersect", aggArrayIntersect,
      Some("""WITH d AS (SELECT lang, doc_id,
                 list_distinct(string_split(text, ' ')) AS toks
                 FROM documents WHERE doc_id % 50 = 0),
              sz AS (SELECT lang, COUNT(DISTINCT doc_id) AS n_docs
                 FROM d GROUP BY lang),
              e AS (SELECT lang, doc_id, unnest(toks) AS tok FROM d),
              c AS (SELECT lang, tok, COUNT(DISTINCT doc_id) AS in_docs
                 FROM e GROUP BY lang, tok),
              k AS (SELECT c.lang, c.tok FROM c JOIN sz USING (lang)
                 WHERE c.in_docs = sz.n_docs)
              SELECT k.lang, sz.n_docs, COUNT(*) AS n_common,
                array_to_string(list(k.tok ORDER BY k.tok), ',')
                  AS common_tokens
              FROM k JOIN sz USING (lang)
              GROUP BY k.lang, sz.n_docs ORDER BY k.lang""")),
    QueryDef("agg_segment_overlap", aggSegmentOverlap,
      Some("""WITH segs AS (SELECT DISTINCT event_type, user_id
                FROM events),
              sizes AS (SELECT event_type, COUNT(*) AS n FROM segs
                GROUP BY event_type),
              inter AS (SELECT a.event_type AS seg_a,
                 b.event_type AS seg_b, COUNT(*) AS n_and
                FROM segs a JOIN segs b ON a.user_id = b.user_id
                  AND a.event_type < b.event_type
                GROUP BY seg_a, seg_b)
              SELECT i.seg_a, i.seg_b, sa.n AS na, sb.n AS nb, i.n_and,
                sa.n + sb.n - i.n_and AS n_or,
                sa.n - i.n_and AS n_andnot,
                CAST(i.n_and AS DOUBLE)
                  / CAST(sa.n + sb.n - i.n_and AS DOUBLE) AS jaccard
              FROM inter i
              JOIN sizes sa ON sa.event_type = i.seg_a
              JOIN sizes sb ON sb.event_type = i.seg_b
              ORDER BY i.seg_a, i.seg_b""")),
    QueryDef("agg_collect", aggCollect,
      Some("""SELECT user_id,
               array_to_string(list(DISTINCT event_type ORDER BY event_type),
                 ',') AS types,
               COUNT(*) AS n_events
              FROM events GROUP BY user_id ORDER BY user_id""")),
    QueryDef("agg_pivot", aggPivot,
      Some("""SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),
    QueryDef("agg_hll_merge", aggHllMerge, None),
    QueryDef("agg_anova", aggAnova,
      Some("""WITH g AS (SELECT event_type,
                CAST(COUNT(*) AS DOUBLE) AS n,
                CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s,
                CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS q
                FROM events GROUP BY event_type),
              tot AS (SELECT CAST(SUM(CAST(s AS DECIMAL(30,6))) AS DOUBLE)
                  / SUM(n) AS gm FROM g),
              t AS (SELECT event_type, n,
                n * (s / n - gm) * (s / n - gm) AS tb,
                q - s * s / n AS tw
                FROM g CROSS JOIN tot),
              parts AS (SELECT COUNT(*) AS k, SUM(n) AS nt,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(list_sort(list(struct_pack(
                    et := event_type, tb := tb))), x -> x.tb)),
                  (a, b) -> a + b) AS ssb,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(list_sort(list(struct_pack(
                    et := event_type, tw := tw))), x -> x.tw)),
                  (a, b) -> a + b) AS ssw
                FROM t)
              SELECT CAST(k AS INTEGER) AS k, CAST(nt AS BIGINT) AS n_total,
                ssb AS ss_between, ssw AS ss_within,
                CASE WHEN k < 2 OR nt <= k OR ssw = 0 THEN NULL
                  ELSE (ssb / (k - 1)) / (ssw / (nt - k)) END AS f_stat
              FROM parts""")),
    QueryDef("agg_corr_matrix", aggCorrMatrix,
      Some { // deterministic corr from exact decimal moments, one pass
        val cols = Seq("l_quantity" -> "q", "l_extendedprice" -> "p",
          "l_discount" -> "d", "l_tax" -> "t")
        def m(e: String) = s"CAST(SUM(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"
        val singles = cols.map { case (c, a) =>
          s"${m(c)} AS s_$a, ${m(s"$c * $c")} AS q_$a" }.mkString(",\n                ")
        val crosses = cols.combinations(2).map { case Seq((ca, a), (cb, b)) =>
          s"${m(s"$ca * $cb")} AS x_${a}_$b" }.mkString(",\n                ")
        val rows = cols.combinations(2).map { case Seq((ca, a), (cb, b)) =>
          s"""SELECT '${ca}~${cb}' AS pair,
              round((n * x_${a}_$b - s_$a * s_$b)
                / sqrt((n * q_$a - s_$a * s_$a) * (n * q_$b - s_$b * s_$b)),
                6) AS corr FROM mom""" }.mkString("\n UNION ALL \n")
        s"""WITH mom AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                $singles,
                $crosses
                FROM lineitem)
            SELECT pair, corr FROM ($rows) ORDER BY pair"""
      }),
    QueryDef("agg_group_concat", aggGroupConcat,
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
                array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
                  AS priorities,
                array_to_string(list_sort(list(DISTINCT
                  'c' || lpad(CAST(o_custkey % 100 AS VARCHAR), 2, '0')))[1:5],
                  ',') AS first_buckets
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),
  )

  /** One-way ANOVA F over the five event-type groups on `value`
    * (ClickHouse `analysisOfVariance`/`anova`). Per-group count/Σx/Σx²
    * accumulate in decimal in ONE grouped pass (exact); the per-group
    * SSB/SSW terms are OFF-GRID doubles (n·(s/n−gm)², q−s²/n), so they
    * are NOT re-cast to decimal (double→6dp-decimal of an off-grid
    * ~1e8-magnitude value is the confirmed Spark-shortest-repr vs
    * DuckDB-exact-binary split, ~ulp/1e-6 odds per term) — instead the
    * k terms fold SEQUENTIALLY over a SORTED array (the agg_entropy
    * scheme): fixed order ⇒ identical IEEE sums on both engines, and
    * ssb/ssw/f ship UNROUNDED (identical inputs ⇒ identical bits).
    * Degenerate inputs (single group, one row per group, zero
    * within-variance) force NULL f on both sides. Shuffle volume is
    * O(groups).
    */
  private def aggAnova(s: SparkSession, dir: String): DataFrame = {
    def m(c: Column) = sum(c.cast(DecimalType(30, 6))).cast("double")
    val v = col("value")
    val g = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        m(v).as("s"), m(v * v).as("q"))
      .localCheckpoint() // O(types) rows; two consumers — one fact agg
    val tot = g.agg((m(col("s")) / sum(col("n"))).as("gm"))
    g.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n"),
        (col("n") * (col("s") / col("n") - col("gm"))
          * (col("s") / col("n") - col("gm"))).as("tb"),
        (col("q") - col("s") * col("s") / col("n")).as("tw"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
        expr("array_sort(collect_list(struct(event_type, tb, tw)))")
          .as("ts"))
      .withColumn("ssb", expr(
        "aggregate(ts, cast(0.0 as double), (acc, t) -> acc + t.tb)"))
      .withColumn("ssw", expr(
        "aggregate(ts, cast(0.0 as double), (acc, t) -> acc + t.tw)"))
      .select(col("k").cast("int").as("k"),
        col("nt").cast("long").as("n_total"),
        col("ssb").as("ss_between"),
        col("ssw").as("ss_within"),
        when(col("k") < 2 || col("nt") <= col("k") || col("ssw") === 0,
          lit(null).cast("double"))
          .otherwise((col("ssb") / (col("k") - 1))
            / (col("ssw") / (col("nt") - col("k")))).as("f_stat"))
  }

  /** Pairwise Pearson correlation matrix over lineitem's four numeric
    * measures (ClickHouse `corrMatrix`) — all 15 moments (4 sums, 4
    * squares, 6 cross products, count) accumulate exactly in decimal in
    * ONE pass over the table, then the 6 closed-form corr values unpivot
    * to rows. The built-in `corr()` would drift in the last ulp with
    * partition order; this stays hash-stable. One scan, one reduce to a
    * single row — no shuffle of data rows.
    */
  private def aggCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    def m(c: Column) = sum(c.cast(DecimalType(30, 6))).cast("double")
    val cols = Seq("l_quantity" -> "q", "l_extendedprice" -> "p",
      "l_discount" -> "d", "l_tax" -> "t")
    val singles = cols.flatMap { case (c, a) =>
      Seq(m(col(c)).as(s"s_$a"), m(col(c) * col(c)).as(s"q_$a")) }
    val crosses = cols.combinations(2).toSeq.map { case Seq((ca, a), (cb, b)) =>
      m(col(ca) * col(cb)).as(s"x_${a}_$b") }
    val mom = Tables.lineitem(s, dir)
      .agg(count(lit(1)).cast("double").as("n"),
        (singles ++ crosses): _*)
    val pairs = cols.combinations(2).toSeq.map { case Seq((ca, a), (cb, b)) =>
      struct(lit(s"${ca}~${cb}").as("pair"),
        round((col("n") * col(s"x_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
          / sqrt((col("n") * col(s"q_$a") - col(s"s_$a") * col(s"s_$a"))
            * (col("n") * col(s"q_$b") - col(s"s_$b") * col(s"s_$b"))),
          6).as("corr"))
    }
    mom.select(explode(array(pairs: _*)).as("r"))
      .select(col("r.pair").as("pair"), col("r.corr").as("corr"))
      .orderBy(col("pair"))
  }

  /** The wide (priority × status) count frame shared by agg_pivot and
    * agg_unpivot — one definition so the claimed round-trip identity
    * (pivot ∘ unpivot = groupBy count) cannot desynchronize.
    */
  private def pivotedCounts(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0, Seq("F", "O", "P")) // empty cells: null in pivot, 0 in SQL

  /** Wide pivot (rows → columns): status counts per priority. Catalyst
    * rewrites pivot to a single conditional aggregation — one shuffle,
    * same plan as the FILTER-clause oracle, no per-value passes.
    */
  private def aggPivot(s: SparkSession, dir: String): DataFrame =
    pivotedCounts(s, dir).orderBy(col("o_orderpriority"))

  /** ClickHouse `quantileExactWeighted`: each value carries an integer
    * weight (here l_linenumber — e.g. units, repetitions, importance);
    * the quantile is taken over the weight-expanded multiset WITHOUT
    * materializing it — Spark's percentile(col, p, freq) aggregates
    * (value, weight) pairs directly. The oracle proves the semantics by
    * actually expanding: each row replicated weight times via a lateral
    * series, then plain quantile_cont.
    */
  private def aggQuantileWeighted(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5, l_linenumber)"), 6)
          .as("wq50"),
        round(expr("percentile(l_extendedprice, 0.9, l_linenumber)"), 6)
          .as("wq90"),
        sum(col("l_linenumber")).as("total_weight"))
      .orderBy(col("l_returnflag"))

  /** Unpivot (melt) — the inverse of pivot: wide per-status columns back
    * to (priority, status, n) rows via the native `unpivot` operator
    * (an Expand node: one pass, rows × |value columns| output, no
    * per-column scans). Round-trips the pivot above, which is the test:
    * pivot ∘ unpivot = groupBy count.
    */
  private def aggUnpivot(s: SparkSession, dir: String): DataFrame =
    pivotedCounts(s, dir)
      .unpivot(Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")), "o_orderstatus", "n")
      .filter(col("n") > 0)
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  /** Sketch re-aggregation — the 100 TB pattern behind ClickHouse's
    * `uniqState`/`uniqMerge` materialized views: build small per-(day,type)
    * HLL sketches once, then answer "distinct users per type" by merging
    * sketches instead of re-scanning raw events. Spark 4's DataSketches
    * HLL functions make the partial state a first-class column. Estimates
    * have no DuckDB twin → ScalaTest bounds check (SketchSpec).
    */
  private def aggHllMerge(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("est_users"), count(lit(1)).as("n_days"))
      .orderBy(col("event_type"))

  /** ClickHouse `groupConcat` (24.x; MySQL GROUP_CONCAT in the Canal
    * source dialect): per order status, the DISTINCT priorities joined
    * sorted with a separator, plus the bounded form groupConcat(',', 5)
    * — ClickHouse caps the concatenation at a row limit so one hot group
    * cannot balloon a result cell. Bounded form here: first 5 distinct
    * customer buckets in sort order.
    *
    * Determinism: concatenation order is explicit (array_sort before
    * array_join) — never rely on an engine's incidental agg order.
    *
    * Scale notes: collect_set over a LOW-CARDINALITY value domain
    * (priorities, bucketed custkeys) — state is O(distinct values) per
    * group with map-side partial merge, not O(rows); the unbounded
    * string-concat-of-raw-rows form is exactly what the row limit
    * exists to forbid at 100 TB.
    */
  private def aggGroupConcat(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("cust_bucket",
        concat(lit("c"), lpad((col("o_custkey") % 100).cast("string"), 2, "0")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
          .as("priorities"),
        array_join(slice(array_sort(collect_set(col("cust_bucket"))), 1, 5),
          ",").as("first_buckets"))
      .orderBy(col("o_orderstatus"))
}
