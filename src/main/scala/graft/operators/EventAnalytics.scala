package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickHouse-signature event analytics (windowFunnel / retention) — the
  * workloads a Canal→ClickHouse deployment actually serves — expressed as
  * cascaded conditional aggregations over the events stream table.
  *
  * Both use the standard greedy-earliest formulation (each step matches
  * the earliest qualifying event after the previous step), which is
  * deterministic and SQL-expressible, so both carry exact oracles.
  *
  * Scale notes: every phase is a groupBy(user_id) with map-side partial
  * aggregation — no self-joins over the event log; the funnel is three
  * conditional-min aggregations over one shuffle each, reusing the same
  * user_id clustering.
  */
object EventAnalytics {

  /** The chained min-per-step funnel times (t1=signup, t2=view within
    * 24 h, t3=purchase within the same window) — shared by fn_funnel and
    * fn_funnel_latency.
    */
  private def funnelTimes(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"), col("event_type"),
      col("ts"))
    val win = expr("INTERVAL 24 HOURS")
    val t1 = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("t1"))
    val t2 = e.join(t1, "user_id")
      .groupBy(col("user_id"), col("t1"))
      .agg(min(when(col("event_type") === "view" &&
        col("ts") > col("t1") && col("ts") <= col("t1") + win, col("ts")))
        .as("t2"))
    e.join(t2, "user_id")
      .groupBy(col("user_id"), col("t1"), col("t2"))
      .agg(min(when(col("event_type") === "purchase" &&
        col("ts") > col("t2") && col("ts") <= col("t1") + win, col("ts")))
        .as("t3"))
  }

  /** windowFunnel(24h): signup → view → purchase, greedy-earliest chain
    * per user; depth = longest prefix completed within the window.
    */
  private def fnFunnel(s: SparkSession, dir: String): DataFrame = {
    funnelTimes(s, dir).select(col("user_id"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).as("funnel_depth"),
        col("t1"), col("t2"), col("t3"))
      .orderBy(col("user_id"))
  }

  /** Cohort retention: per user, cohort day = first event day; retained
    * on day+1 / within days 1..7. Aggregated per cohort day.
    */
  private def fnRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    val flags = e.join(cohort, "user_id")
      .groupBy(col("user_id"), col("cohort_day"))
      .agg(
        max(when(col("d") === col("cohort_day") + expr("INTERVAL 1 DAY"), 1)
          .otherwise(0)).as("r1"),
        max(when(col("d") > col("cohort_day") &&
          col("d") <= col("cohort_day") + expr("INTERVAL 7 DAYS"), 1)
          .otherwise(0)).as("r7"))
    flags.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("r1")).as("n_day1"),
        sum(col("r7")).as("n_week1"))
      .orderBy(col("cohort_day"))
  }

  /** Cohort retention TRIANGLE (the full matrix behind fn_retention's
    * two summary columns): distinct users from cohort day D active on
    * D+k for k = 0..7 — the day-offset grid every growth dashboard
    * draws. Same one-clustering shape as fn_retention: cohort assignment
    * and the (cohort, offset) rollup both shuffle on user-sized keys
    * with map-side combine; the matrix is O(days × 8) rows regardless of
    * event volume.
    */
  private def fnRetentionMatrix(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    val cohort = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    e.join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_day")))
      .filter(col("day_offset") <= 7)
      // count, not countDistinct: e is distinct on (user_id, d) and a
      // user has exactly one d per (cohort_day, day_offset) group, so
      // the distinct pass would only add a redundant expand/dedup stage
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** ClickHouse `deltaSum`: the sum of POSITIVE deltas in an ordered
    * series (odometer-style counters that occasionally reset — only the
    * climbs count). Per-user purchase values in (ts, event_id) order;
    * the diff is a lag window, the positive-part sum is exact decimal.
    * One shuffle on user_id; the recursion-free formulation means no
    * per-key sequential fold is needed.
    */
  private def aggDeltaSum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("prev", lag(col("value"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        round(Det.dsum(when(col("value") > col("prev"),
          col("value") - col("prev")).otherwise(lit(0.0))), 6)
          .as("delta_sum"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse `maxIntersections`: the maximum number of concurrently
    * open intervals — here each event opens a half-open 30-min activity
    * interval [ts, ts+30m). The classic sweep: +1/−1 deltas NETTED PER
    * TIMESTAMP first (which makes tie order irrelevant — ends at t
    * cancel starts at t before the running sum ever sees them, the
    * half-open convention), then a running sum per user, then max.
    * Scale: O(2·events) sweep points, one user_id clustering shared by
    * the window and the final rollup.
    */
  private def aggMaxIntersections(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("ts"))
    val pts = e.select(col("user_id"), col("ts").as("t"), lit(1).as("d"))
      .unionByName(e.select(col("user_id"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("t"), lit(-1).as("d")))
      .groupBy(col("user_id"), col("t"))
      .agg(sum(col("d")).as("net"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("active", sum(col("net")).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("active")).cast("int").as("max_concurrent"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse `intervalLengthSum`: total time covered by the UNION of
    * (overlapping) intervals — the user's true active time, double-count
    * free. Same netted sweep as maxIntersections; a segment between
    * consecutive sweep points counts iff the running active count is
    * positive on its left edge. All arithmetic is exact integer millis.
    */
  private def aggIntervalLengthSum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val pts = e.select(col("user_id"),
        unix_millis(col("ts")).as("t"), lit(1).as("d"))
      .unionByName(e.select(col("user_id"),
        (unix_millis(col("ts")) + lit(1800000L)).as("t"), lit(-1).as("d")))
      .groupBy(col("user_id"), col("t"))
      .agg(sum(col("d")).as("net"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nxt = Window.partitionBy(col("user_id")).orderBy(col("t"))
    pts
      .withColumn("active", sum(col("net")).over(run))
      .withColumn("seg", when(col("active") > 0,
        lead(col("t"), 1).over(nxt) - col("t")).otherwise(lit(0L)))
      .groupBy(col("user_id"))
      .agg(sum(col("seg")).as("covered_ms"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse quantileTDigest analogue: percentile_approx sketch —
    * no oracle (approx); ScalaTest bounds it against the exact quantile.
    */
  private def aggQuantileApprox(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("p50_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(1000))
          .as("p90_approx"))
      .orderBy(col("l_returnflag"))

  /** The LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013) core,
    * shared by the operator and its property tests: keep first and
    * last, split the interior into n−2 equal buckets, and from each
    * bucket keep the point forming the largest triangle with the
    * PREVIOUSLY SELECTED point and the NEXT bucket's centroid. The
    * sequential dependency on the previous selection is inherent to
    * the algorithm — per-series it is a linear fold; parallelism comes
    * from doing many series at once.
    */
  private[graft] def lttb(pts: IndexedSeq[(Long, Double)],
      n: Int): IndexedSeq[(Long, Double)] = {
    if (n >= pts.length || pts.length <= 2 || n <= 2)
      return if (n >= pts.length) pts
      else IndexedSeq(pts.head, pts.last)
    val interior = pts.length - 2
    val buckets = n - 2
    // long arithmetic: i * interior overflows Int past ~126M interior
    // points and the wrapped bound silently selects wrong points —
    // nothing in this function's contract caps pts.length
    def bounds(i: Int): (Int, Int) = // [from, until) into the interior
      (1 + (i.toLong * interior / buckets).toInt,
        1 + ((i + 1).toLong * interior / buckets).toInt)
    val out = scala.collection.mutable.ArrayBuffer(pts.head)
    var i = 0
    while (i < buckets) {
      val (f, u) = bounds(i)
      val (px, py) = out.last
      val (nx, ny) =
        if (i == buckets - 1) (pts.last._1.toDouble, pts.last._2)
        else {
          val (nf, nu) = bounds(i + 1)
          (pts.slice(nf, nu).map(_._1.toDouble).sum / (nu - nf),
            pts.slice(nf, nu).map(_._2).sum / (nu - nf))
        }
      var best = f; var bestArea = -1.0
      var j = f
      while (j < u) {
        val (cx, cy) = pts(j)
        val area = math.abs(
          (px - nx) * (cy - py) - (px - cx) * (ny - py))
        if (area > bestArea) { bestArea = area; best = j }
        j += 1
      }
      out += pts(best)
      i += 1
    }
    out += pts.last
    out.toIndexedSeq
  }

  /** ClickHouse `largestTriangleThreeBuckets`: visually-faithful chart
    * downsampling — each event_type's (ts, value) series reduced to 20
    * points that preserve the series' visual shape (spikes survive,
    * flat runs collapse). Deterministic (first-max tie-break); the
    * previous-selection recurrence is replayed by the oracle as a
    * DuckDB RECURSIVE CTE carrying (px, py) across the 18 interior
    * buckets, with every bucket-mean fold pinned to Scala's
    * left-to-right order via list_reduce — the areas come out
    * bit-identical, so even the RAW double argmax agrees (verified:
    * 100/100 rows equal with no edge rounding). AnalyticsOpsSpec
    * additionally asserts endpoint preservation, size, ordering,
    * subset-of-input, and that per-bucket extreme spikes are kept.
    *
    * Scale notes: LTTB is inherently sequential PER SERIES (a linear
    * fold over the sorted series); the distributed shape is one
    * groupBy(series) with a sorted collect per key — right for chart
    * series, which are bounded by what a chart can show; an unbounded
    * series pre-aggregates (ts_downsample) first.
    */
  private def tsLttb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(col("event_type"),
        col("ts").cast("long").as("t"), col("value"))
      .groupBy(col("event_type"))
      .agg(expr("array_sort(collect_list(struct(t, value)))").as("pts"))
      .as[(String, IndexedSeq[(Long, Double)])]
      .flatMap { case (k, pts) =>
        lttb(pts, 20).zipWithIndex.map { case ((t, v), idx) =>
          (k, idx, t, v)
        }
      }
      .toDF("event_type", "idx", "t", "value")
      .orderBy(col("event_type"), col("idx"))
  }

  /** ClickHouse `ORDER BY ... WITH FILL` + LOCF interpolation: the
    * gap-filling read every time-series dashboard needs — a dense day
    * spine per key, missing points filled two ways (zero-fill for
    * additive measures, last-observation-carried-forward for level
    * measures). The spine generates from the GLOBAL [min, max] day
    * bounds (one O(1) aggregate) × distinct keys — O(keys × days)
    * generated rows, metadata-scale next to the event log; the fill
    * itself is one left join on (key, day) plus one ordered window per
    * key, both riding the same key clustering.
    */
  private def fnWithFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
    val daily = e.groupBy(col("user_id"), col("day"))
      .agg(Det.dsum(col("value")).as("v"))
    val bounds = e.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val spine = e.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val wFwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // linear INTERPOLATE needs the bracketing known points both ways:
    // value and day of the last observation before and first after
    val prevV = last(col("v"), ignoreNulls = true).over(w)
    val prevD = last(when(col("v").isNotNull, col("day")),
      ignoreNulls = true).over(w)
    val nextV = first(col("v"), ignoreNulls = true).over(wFwd)
    val nextD = first(when(col("v").isNotNull, col("day")),
      ignoreNulls = true).over(wFwd)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("v"),
        coalesce(col("v"), lit(0.0)).as("filled"),
        coalesce(prevV, lit(0.0)).as("locf"),
        prevV.as("pv"), prevD.as("pd"), nextV.as("nv"), nextD.as("nd"))
      .select(col("user_id"), col("day"), col("filled"), col("locf"),
        // UNROUNDED: both engines run this identical IEEE chain over
        // identical doubles, so the quotient matches bit-for-bit;
        // rounding at the edge would reintroduce the class-3 midpoint
        // split (a 1-day gap puts the result on a 6dp midpoint whenever
        // nv−pv carries an odd 6th decimal — the text_lm_bigram lesson)
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + (col("nv") - col("pv"))
              * datediff(col("day"), col("pd")).cast("double")
              / datediff(col("nd"), col("pd")).cast("double"))
          .otherwise(coalesce(col("pv"), col("nv"), lit(0.0)))
          .as("interp"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Maximum drawdown over each user's signed event flow — the
    * running-peak metric (max over i of max_{j≤i} p_j − p_i, p = prefix
    * sum of purchases − other events) every monitoring stack computes
    * over balances/quality scores. Two stock windows on one shuffle +
    * one hash agg; no sequential fold (the running-max twin of
    * win_cum_clamp's reflection identity). The final balance is the
    * ORDER-INDEPENDENT total sum, and every intermediate stays exact
    * decimal, so both engines agree bit-for-bit.
    */
  private def tsDrawdown(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"),
        when(col("event_type") === "purchase", col("value"))
          .otherwise(-col("value"))
          .cast(DecimalType(30, 6)).as("delta"))
      .withColumn("p", sum(col("delta")).over(w))
      .withColumn("peak", max(col("p")).over(w))
      .groupBy(col("user_id"))
      // subtract as DOUBLES (identical from the exact decimals): the
      // decimal difference would overflow precision 38, which the
      // engines resolve differently — the win_cum_clamp lesson
      .agg(count(lit(1)).as("n_events"),
        max(col("peak").cast("double") - col("p").cast("double"))
          .as("max_drawdown"),
        sum(col("delta")).cast("double").as("final_balance"))
      .orderBy(col("user_id"))
  }

  /** First-6-active-days purchase-count series per user (users with ≥6
    * active days), t = 1-based day rank — the shared bounded window of
    * ts_theil_sen and ts_mann_kendall: a FIXED n=6 makes the pair count
    * 15 (odd → pick-middle median, no interpolation) and the
    * Mann-Kendall base variance the constant 6·5·17.
    */
  private def firstSixDays(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("t", row_number().over(w.orderBy(col("d"))))
      .filter(col("t") <= 6)
      // eligibility (≥6 active days ⇔ 6 rows survive the t≤6 cut) as a
      // count window over the SAME user_id partitioning — one pass,
      // zero extra shuffle; a groupBy+self-join spelling would
      // recompute the uncached scan+aggregate subtree per branch
      .withColumn("nd", count(lit(1)).over(w))
      .filter(col("nd") === 6)
      .select(col("user_id"), col("t"), col("x"))
  }

  /** The 15 ordered pairs (t < t2) of each user's six-day window — the
    * shared pair-builder of ts_theil_sen and ts_mann_kendall.
    */
  private def sixDayPairs(pts: DataFrame): DataFrame = {
    val b = pts.select(col("user_id"), col("t").as("t2"), col("x").as("x2"))
    pts.join(b, Seq("user_id")).filter(col("t2") > col("t"))
  }

  /** Theil–Sen robust slope per user — the median of all pairwise
    * slopes over the first-6-days series: immune to single-day
    * outliers that wreck OLS (agg_regression's complement). Every
    * slope is ONE IEEE quotient of exact integers and the 15-element
    * median is a pick-middle (odd count — no interpolation step to
    * diverge on), so the result ships unrounded.
    *
    * Scale notes: pairs are generated per-user AFTER the bounded
    * window (15/user regardless of history length); the self-join key
    * is the group key, so it shuffles each user's 6 rows once.
    */
  private def tsTheilSen(s: SparkSession, dir: String): DataFrame = {
    // the pairs self-join consumes pts on BOTH sides — checkpoint so
    // the events scan + two-window eligibility subtree runs once (the
    // same fix its sibling ts_mann_kendall carries)
    sixDayPairs(firstSixDays(s, dir).localCheckpoint())
      .select(col("user_id"),
        ((col("x2") - col("x")).cast("double")
          / (col("t2") - col("t")).cast("double")).as("slope"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5)").as("theil_sen_slope"))
      .orderBy(col("user_id"))
  }

  /** Mann–Kendall trend test per user over the same series: S = Σ
    * sign(x_j − x_i) over ordered pairs (EXACT integer), tie-corrected
    * variance 18·Var = n(n−1)(2n+5) − Σ t_g(t_g−1)(2t_g+5) kept as the
    * exact integer numerator, and the continuity-corrected z =
    * (S∓1)/√(var_num/18) — a +,−,÷,√ chain from exact integers, so z
    * ships unrounded (the agg_binomial_ci rule). All-tied series
    * (var_num = 0) yield NULL z on both engines (class-6 guard).
    *
    * Scale notes: same bounded 15-pairs-per-user join as ts_theil_sen;
    * the tie scan is one extra aggregate over the 6-row groups.
    */
  private def tsMannKendall(s: SparkSession, dir: String): DataFrame = {
    // two consumers below (the pairs self-join reads it twice more):
    // without the checkpoint the events scan + two-window eligibility
    // subtree re-executes per branch — the agg_categorical_iv rule
    val pts = firstSixDays(s, dir).localCheckpoint()
    val sStat = sixDayPairs(pts)
      .groupBy(col("user_id"))
      .agg(sum(when(col("x2") > col("x"), 1)
        .when(col("x2") < col("x"), -1).otherwise(0)).as("s_stat"))
    val ties = pts.groupBy(col("user_id"), col("x"))
      .agg(count(lit(1)).as("tg"))
      .groupBy(col("user_id"))
      .agg(sum(col("tg") * (col("tg") - 1) * (col("tg") * 2 + 5))
        .as("tie_sum"))
    sStat.join(ties, Seq("user_id"))
      .select(col("user_id"), col("s_stat"),
        (lit(510L) - col("tie_sum")).as("var_num"))
      .withColumn("z_stat", {
        val sd = sqrt(col("var_num").cast("double") / 18.0)
        when(col("var_num") === 0, lit(null).cast("double"))
          .when(col("s_stat") > 0, (col("s_stat") - 1).cast("double") / sd)
          .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double") / sd)
          .otherwise(lit(0.0))
      })
      .orderBy(col("user_id"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("ts_drawdown", tsDrawdown,
      Some("""WITH p AS (SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CAST(CASE WHEN event_type = 'purchase' THEN value
                   ELSE -value END AS DECIMAL(30,6)) AS delta
                 FROM events),
               c AS (SELECT user_id, event_id, us, delta,
                 SUM(delta) OVER w AS pre
                 FROM p WINDOW w AS (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
               d AS (SELECT user_id, delta, pre,
                 MAX(pre) OVER w2 AS peak
                 FROM c WINDOW w2 AS (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              SELECT user_id, COUNT(*) AS n_events,
                MAX(CAST(peak AS DOUBLE) - CAST(pre AS DOUBLE))
                  AS max_drawdown,
                CAST(SUM(delta) AS DOUBLE) AS final_balance
              FROM d GROUP BY user_id ORDER BY user_id""")),
    QueryDef("fn_with_fill", fnWithFill,
      Some(s"""WITH e AS (SELECT user_id,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
                 FROM events WHERE event_type = 'purchase'),
               b AS (SELECT min(day) AS mn, max(day) AS mx FROM e),
               u AS (SELECT DISTINCT user_id FROM e),
               spine AS (SELECT user_id,
                 CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
                   AS day FROM u, b),
               d AS (SELECT user_id, day, ${Det.oSum("value")} AS v
                 FROM e GROUP BY user_id, day),
               j AS (SELECT s.user_id, s.day, v,
                 last_value(v IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                 last_value(CASE WHEN v IS NOT NULL THEN s.day END
                   IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                 first_value(v IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 first_value(CASE WHEN v IS NOT NULL THEN s.day END
                   IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
                 FROM spine s LEFT JOIN d ON s.user_id = d.user_id
                   AND s.day = d.day)
              SELECT user_id, day,
                COALESCE(v, 0.0) AS filled,
                COALESCE(pv, 0.0) AS locf,
                CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                    pv + (nv - pv)
                      * CAST(datediff('day', pd, day) AS DOUBLE)
                      / CAST(datediff('day', pd, nd) AS DOUBLE)
                  ELSE COALESCE(pv, nv, 0.0) END AS interp
              FROM j ORDER BY user_id, day""")),
    QueryDef("fn_funnel", fnFunnel,
      Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
              s1 AS (SELECT user_id,
                MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1
                FROM e GROUP BY user_id),
              s2 AS (SELECT e.user_id, t1,
                MIN(CASE WHEN event_type = 'view' AND ts > t1
                     AND ts <= t1 + INTERVAL 24 HOUR THEN ts END) AS t2
                FROM e JOIN s1 ON e.user_id = s1.user_id
                GROUP BY e.user_id, t1),
              s3 AS (SELECT e.user_id, t1, t2,
                MIN(CASE WHEN event_type = 'purchase' AND ts > t2
                     AND ts <= t1 + INTERVAL 24 HOUR THEN ts END) AS t3
                FROM e JOIN s2 ON e.user_id = s2.user_id
                GROUP BY e.user_id, t1, t2)
              SELECT user_id,
                CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth,
                t1, t2, t3
              FROM s3 ORDER BY user_id""")),
    QueryDef("fn_funnel_latency", fnFunnelLatency,
      Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
              s1 AS (SELECT user_id,
                MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1
                FROM e GROUP BY user_id),
              s2 AS (SELECT e.user_id, t1,
                MIN(CASE WHEN event_type = 'view' AND ts > t1
                     AND ts <= t1 + INTERVAL 24 HOUR THEN ts END) AS t2
                FROM e JOIN s1 ON e.user_id = s1.user_id
                GROUP BY e.user_id, t1),
              s3 AS (SELECT e.user_id, t1, t2,
                MIN(CASE WHEN event_type = 'purchase' AND ts > t2
                     AND ts <= t1 + INTERVAL 24 HOUR THEN ts END) AS t3
                FROM e JOIN s2 ON e.user_id = s2.user_id
                GROUP BY e.user_id, t1, t2),
              lat AS (SELECT epoch_us(t3) - epoch_us(t1) AS lat_us
                FROM s3 WHERE t3 IS NOT NULL)
              SELECT COUNT(*) AS n_converted,
                CAST(MIN(lat_us) AS DOUBLE) / 1000000.0 AS min_s,
                quantile_cont(lat_us, 0.5) / 1000000.0 AS median_s,
                CAST(MAX(lat_us) AS DOUBLE) / 1000000.0 AS max_s
              FROM lat""")),
    QueryDef("fn_funnel_strict", fnFunnelStrict,
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                 CAST(ts AS TIMESTAMP) AS ts FROM events
                 WHERE event_type IN ('signup', 'view', 'purchase')),
               o AS (SELECT user_id, event_type AS e1, ts AS t1,
                 lead(event_type, 1) OVER w AS e2, lead(ts, 1) OVER w AS t2,
                 lead(event_type, 2) OVER w AS e3, lead(ts, 2) OVER w AS t3
                 FROM e WINDOW w AS
                   (PARTITION BY user_id ORDER BY ts, event_id))
              SELECT user_id, MAX(CASE
                WHEN e1 = 'signup' AND e2 = 'view' AND e3 = 'purchase'
                  AND t3 <= t1 + INTERVAL 24 HOUR THEN 3
                WHEN e1 = 'signup' AND e2 = 'view'
                  AND t2 <= t1 + INTERVAL 24 HOUR THEN 2
                WHEN e1 = 'signup' THEN 1 ELSE 0 END) AS strict_depth
              FROM o GROUP BY user_id ORDER BY user_id""")),
    QueryDef("fn_journey_regex", fnJourneyRegex,
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                 CAST(ts AS TIMESTAMP) AS ts FROM events),
               j AS (SELECT user_id,
                 string_agg(substring(event_type, 1, 1), ''
                   ORDER BY ts, event_id) AS journey
                 FROM e GROUP BY user_id)
              SELECT user_id,
                CAST(length(journey) AS INTEGER) AS n_events,
                regexp_matches(journey, 's.*v.*p') AS has_funnel_path,
                CAST((length(journey)
                  - length(regexp_replace(journey, 'vp', '', 'g'))) // 2
                  AS BIGINT) AS n_direct_vp
              FROM j ORDER BY user_id""")),
    QueryDef("seq_transition_matrix", seqTransitionMatrix,
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                 CAST(ts AS TIMESTAMP) AS ts FROM events),
               pr AS (SELECT user_id, event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS to_type FROM e),
               pairs AS (SELECT from_type, to_type, COUNT(*) AS n
                 FROM pr WHERE to_type IS NOT NULL
                 GROUP BY from_type, to_type),
               m AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
                 FROM pairs GROUP BY from_type)
              SELECT from_type, to_type, n,
                CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p
              FROM pairs JOIN m USING (from_type)
              ORDER BY from_type, to_type""")),
    QueryDef("seq_next_node", seqNextNode,
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                 CAST(ts AS TIMESTAMP) AS ts FROM events),
               o AS (SELECT user_id, event_type, ts, event_id,
                 lead(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS next_et
                 FROM e),
               f AS (SELECT user_id, next_et, ROW_NUMBER() OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                 FROM o WHERE event_type = 'signup')
              SELECT user_id, next_et AS next_after_signup
              FROM f WHERE rn = 1 ORDER BY user_id""")),
    QueryDef("agg_bounding_ratio", aggBoundingRatio,
      Some("""WITH e AS (SELECT user_id, event_id, value,
                 CAST(ts AS TIMESTAMP) AS ts FROM events
                 WHERE event_type = 'purchase'),
               o AS (SELECT user_id, value, ts, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS ra,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rd FROM e),
               g AS (SELECT user_id, COUNT(*) AS n,
                 MIN(CASE WHEN ra = 1 THEN value END) AS v_first,
                 MIN(CASE WHEN rd = 1 THEN value END) AS v_last,
                 MIN(epoch_us(ts)) AS t_first, MAX(epoch_us(ts)) AS t_last
                 FROM o GROUP BY user_id)
              SELECT user_id, n,
                (v_last - v_first)
                  / (CAST(t_last - t_first AS DOUBLE) / 1000000.0)
                  AS slope
              FROM g WHERE t_last > t_first ORDER BY user_id""")),
    QueryDef("fn_retention", fnRetention,
      Some("""WITH e AS (SELECT user_id,
                CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d
                FROM events),
              c AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id),
              f AS (SELECT e.user_id, cohort_day,
                MAX(CASE WHEN d = cohort_day + INTERVAL 1 DAY THEN 1 ELSE 0 END) AS r1,
                MAX(CASE WHEN d > cohort_day
                     AND d <= cohort_day + INTERVAL 7 DAY THEN 1 ELSE 0 END) AS r7
                FROM e JOIN c ON e.user_id = c.user_id
                GROUP BY e.user_id, cohort_day)
              SELECT cohort_day, COUNT(*) AS n_users,
                CAST(SUM(r1) AS BIGINT) AS n_day1,
                CAST(SUM(r7) AS BIGINT) AS n_week1
              FROM f GROUP BY cohort_day ORDER BY cohort_day""")),
    QueryDef("agg_delta_sum", aggDeltaSum,
      Some(s"""WITH e AS (SELECT user_id, event_id, value,
                CAST(ts AS TIMESTAMP) AS ts FROM events
                WHERE event_type = 'purchase'),
              d AS (SELECT user_id, value,
                lag(value) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS prev
                FROM e)
              SELECT user_id, COUNT(*) AS n,
                round(${Det.oSum(
                  "CASE WHEN value > prev THEN value - prev ELSE 0.0 END")}, 6)
                  AS delta_sum
              FROM d GROUP BY user_id ORDER BY user_id""")),
    QueryDef("agg_max_intersections", aggMaxIntersections,
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
              pts AS (SELECT user_id, t, SUM(d) AS net FROM (
                  SELECT user_id, ts AS t, 1 AS d FROM e
                  UNION ALL
                  SELECT user_id, ts + INTERVAL 30 MINUTE, -1 FROM e)
                GROUP BY user_id, t),
              sw AS (SELECT user_id,
                SUM(net) OVER (PARTITION BY user_id ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
                FROM pts)
              SELECT user_id, CAST(MAX(active) AS INTEGER) AS max_concurrent
              FROM sw GROUP BY user_id ORDER BY user_id""")),
    QueryDef("agg_interval_length_sum", aggIntervalLengthSum,
      Some("""WITH e AS (SELECT user_id,
                epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
              pts AS (SELECT user_id, t, SUM(d) AS net FROM (
                  SELECT user_id, ms AS t, 1 AS d FROM e
                  UNION ALL
                  SELECT user_id, ms + 1800000, -1 FROM e)
                GROUP BY user_id, t),
              sw AS (SELECT user_id, t,
                SUM(net) OVER w AS active,
                lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nt
                FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              SELECT user_id,
                CAST(SUM(CASE WHEN active > 0 THEN nt - t ELSE 0 END)
                  AS BIGINT) AS covered_ms
              FROM sw GROUP BY user_id ORDER BY user_id""")),
    QueryDef("fn_retention_matrix", fnRetentionMatrix,
      Some("""WITH e AS (SELECT DISTINCT user_id,
                CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                  AS d FROM events),
              c AS (SELECT user_id, MIN(d) AS cohort_day FROM e
                GROUP BY user_id)
              SELECT cohort_day,
                CAST(date_diff('day', cohort_day, d) AS INTEGER) AS day_offset,
                COUNT(e.user_id) AS n_active
              FROM e JOIN c ON e.user_id = c.user_id
              WHERE date_diff('day', cohort_day, d) <= 7
              GROUP BY cohort_day, day_offset
              ORDER BY cohort_day, day_offset""")),
    QueryDef("agg_quantile_approx", aggQuantileApprox, None),
    QueryDef("fn_seq_match", fnSeqMatch,
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                substr(event_type, 1, 1) AS c FROM events),
              s AS (SELECT user_id,
                string_agg(c, '' ORDER BY ts, event_id) AS seq
                FROM e GROUP BY user_id)
              SELECT user_id,
                CAST(regexp_matches(seq, 's.*v.*p') AS INTEGER) AS m_signup_view_buy,
                CAST(regexp_matches(seq, 'e.*e.*e') AS INTEGER) AS m_triple_error,
                CAST(LENGTH(seq) AS INTEGER) AS n_events
              FROM s ORDER BY user_id""")),
    QueryDef("fn_seq_match_time", fnSeqMatchTime,
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                CAST(ts AS TIMESTAMP) AS ts FROM events),
              o AS (SELECT user_id, event_type, ts,
                MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id)
                  AS last_signup
                FROM e),
              l AS (SELECT user_id,
                epoch_us(ts) - epoch_us(last_signup) AS lat
                FROM o WHERE event_type = 'purchase'
                  AND last_signup IS NOT NULL)
              SELECT user_id,
                CAST(MAX(CASE WHEN lat <= 3600000000 THEN 1 ELSE 0 END)
                  AS INTEGER) AS matched,
                MIN(CASE WHEN lat <= 3600000000 THEN lat END) AS min_lat_us
              FROM l GROUP BY user_id ORDER BY user_id""")),
    QueryDef("ts_decayed_sum", tsDecayedSum, Some("""
      WITH RECURSIVE
      g AS (SELECT user_id,
              list({'d': CAST(CAST(ts AS TIMESTAMP) AS DATE),
                    'e': event_id, 'v': value}
                ORDER BY CAST(CAST(ts AS TIMESTAMP) AS DATE), event_id,
                  value) AS xs
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id),
      p AS (SELECT user_id, xs, len(xs) AS n FROM g),
      rec AS (
        SELECT user_id, 1 AS k, xs[1].v AS l, CAST(1.0 AS DOUBLE) AS c,
          xs[1].d AS pd
        FROM p
        UNION ALL
        SELECT b0.user_id, b0.k + 1,
          b0.l / CAST(CAST(1 AS BIGINT) << least(b0.d - b0.pd, 62)
            AS DOUBLE) + b0.v,
          b0.c / CAST(CAST(1 AS BIGINT) << least(b0.d - b0.pd, 62)
            AS DOUBLE) + 1.0,
          b0.d
        FROM (
          SELECT r.user_id, r.k, r.l, r.c, r.pd,
            q.xs[r.k + 1].v AS v, q.xs[r.k + 1].d AS d
          FROM rec r JOIN p q USING (user_id)
          WHERE r.k < q.n) b0
      )
      SELECT r.user_id, CAST(p.n AS INTEGER) AS n_purchases,
        r.l AS decayed_sum, r.c AS decayed_count,
        r.l / r.c AS decayed_avg
      FROM rec r JOIN p USING (user_id)
      WHERE r.k = p.n
      ORDER BY r.user_id""")),
    QueryDef("ts_holt", tsHolt, Some("""
      WITH RECURSIVE
      g AS (SELECT user_id,
              list({'t': epoch_us(CAST(ts AS TIMESTAMP)), 'e': event_id,
                    'v': value}
                ORDER BY ts, event_id, value) AS xs
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id),
      p AS (SELECT user_id, xs, len(xs) AS n FROM g),
      rec AS (
        SELECT user_id, 1 AS k, xs[1].v AS l, CAST(0.0 AS DOUBLE) AS b
        FROM p
        UNION ALL
        SELECT b0.user_id, b0.k + 1,
          0.3 * b0.v + 0.7 * (b0.l + b0.b) AS l,
          0.2 * ((0.3 * b0.v + 0.7 * (b0.l + b0.b)) - b0.l)
            + 0.8 * b0.b AS b
        FROM (
          SELECT r.user_id, r.k, r.l, r.b, q.xs[r.k + 1].v AS v
          FROM rec r JOIN p q USING (user_id)
          WHERE r.k < q.n) b0
      )
      SELECT r.user_id, CAST(p.n AS INTEGER) AS n_purchases,
        r.l AS level, r.b AS trend, r.l + r.b AS forecast_1
      FROM rec r JOIN p USING (user_id)
      WHERE r.k = p.n
      ORDER BY r.user_id""")),
    QueryDef("ts_lttb", tsLttb, Some("""
      WITH RECURSIVE
      g AS (SELECT event_type,
              list({'t': t, 'v': v} ORDER BY t, v) AS pts
            FROM (SELECT event_type,
                    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t,
                    value AS v FROM events)
            GROUP BY event_type),
      p AS (SELECT event_type, pts, len(pts) AS n,
              len(pts) - 2 AS interior FROM g),
      rec AS (
        -- series of <=20 points are returned WHOLE by the Spark lttb
        -- (n >= pts.length branch); only longer series enter the
        -- bucket recursion, else an empty bucket's LATERAL would kill
        -- the recursive row and truncate the output
        SELECT event_type, 0 AS i, pts[1].t AS px, pts[1].v AS py
        FROM p WHERE n > 20
        UNION ALL
        SELECT b.event_type, b.i + 1, sel.t, sel.v
        FROM (
          SELECT r.event_type, r.i, r.px, r.py, q.pts, q.n, q.interior,
            1 + (r.i * q.interior) // 18 AS f,
            1 + ((r.i + 1) * q.interior) // 18 AS u,
            CASE WHEN r.i = 17 THEN CAST(q.pts[q.n].t AS DOUBLE)
              ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(
                  q.pts[2 + ((r.i + 1) * q.interior) // 18 :
                        1 + ((r.i + 2) * q.interior) // 18],
                  e -> CAST(e.t AS DOUBLE))), (a, b) -> a + b)
                / (((r.i + 2) * q.interior) // 18
                   - ((r.i + 1) * q.interior) // 18) END AS nx,
            CASE WHEN r.i = 17 THEN q.pts[q.n].v
              ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(
                  q.pts[2 + ((r.i + 1) * q.interior) // 18 :
                        1 + ((r.i + 2) * q.interior) // 18],
                  e -> e.v)), (a, b) -> a + b)
                / (((r.i + 2) * q.interior) // 18
                   - ((r.i + 1) * q.interior) // 18) END AS ny
          FROM rec r JOIN p q USING (event_type)
          WHERE r.i < 18) b,
        LATERAL (
          SELECT b.pts[s0.j].t AS t, b.pts[s0.j].v AS v
          FROM (SELECT unnest(generate_series(b.f + 1, b.u)) AS j) s0
          ORDER BY abs(
              (CAST(b.px AS DOUBLE) - b.nx) * (b.pts[s0.j].v - b.py)
              - CAST(b.px - b.pts[s0.j].t AS DOUBLE) * (b.ny - b.py))
              DESC,
            s0.j ASC LIMIT 1) sel
      )
      SELECT event_type, i AS idx, px AS t, py AS value FROM rec
      UNION ALL
      SELECT event_type, 19 AS idx, pts[n].t, pts[n].v AS value
      FROM p WHERE n > 20
      UNION ALL
      SELECT p.event_type, s.j - 1 AS idx, p.pts[s.j].t,
        p.pts[s.j].v AS value
      FROM p, LATERAL (SELECT unnest(generate_series(1, p.n)) AS j) s
      WHERE p.n <= 20
      ORDER BY event_type, idx""")),
    QueryDef("ts_dtw", tsDtw, Some("""
      WITH RECURSIVE
      daily AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
          COUNT(*) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, d),
      ser AS (SELECT user_id, SUM(n) AS total,
          list(CAST(n AS DOUBLE) ORDER BY d) AS xs
        FROM daily GROUP BY user_id
        ORDER BY total DESC, user_id LIMIT 8),
      pairs AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
          a.xs AS xa, b.xs AS xb, len(a.xs) AS n, len(b.xs) AS m
        FROM ser a JOIN ser b ON a.user_id < b.user_id),
      rec AS (
        SELECT user_a, user_b, 0 AS i,
          list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(generate_series(1, m),
              j -> CAST('infinity' AS DOUBLE))) AS prev
        FROM pairs
        UNION ALL
        SELECT b0.user_a, b0.user_b, b0.i + 1,
          list_reduce(
            list_prepend([CAST('infinity' AS DOUBLE)],
              list_transform(generate_series(1, b0.m),
                j -> [CAST(j AS DOUBLE)])),
            (acc, x) -> list_append(acc,
              abs(b0.ai - b0.xb[CAST(x[1] AS INTEGER)])
              + least(b0.prev[CAST(x[1] AS INTEGER) + 1],
                      b0.prev[CAST(x[1] AS INTEGER)],
                      acc[len(acc)]))) AS prev
        FROM (
          SELECT r.user_a, r.user_b, r.i, r.prev, p.m,
            p.xa[r.i + 1] AS ai, p.xb AS xb
          FROM rec r JOIN pairs p USING (user_a, user_b)
          WHERE r.i < p.n) b0
      )
      SELECT r.user_a, r.user_b,
        CAST(p.n AS INTEGER) AS len_a, CAST(p.m AS INTEGER) AS len_b,
        round(r.prev[p.m + 1], 6) AS dtw
      FROM rec r JOIN pairs p USING (user_a, user_b)
      WHERE r.i = p.n
      ORDER BY r.user_a, r.user_b""")),
    QueryDef("agg_timing_quantiles", aggTimingQuantiles,
      Some(s"""WITH d AS (SELECT event_type,
                 GREATEST(CAST(FLOOR(value * 1000) AS BIGINT), 0) AS t
                 FROM events),
               bkt AS (SELECT event_type,
                 ${timingBucketSql("t")} AS b FROM d),
               dom AS (SELECT event_type, b, COUNT(*) AS cnt
                 FROM bkt GROUP BY event_type, b),
               w AS (SELECT event_type, b, cnt,
                 CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum,
                 CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n
                 FROM dom)
              SELECT event_type, MAX(n) AS n,
                COUNT(DISTINCT b) AS n_buckets,
                MIN(CASE WHEN cum >= (n + 1) // 2
                  THEN CAST(POWER(2, b) AS BIGINT) - 1 END)
                  AS p50_bucket_lo,
                MIN(CASE WHEN cum >= (19 * n + 19) // 20
                  THEN CAST(POWER(2, b) AS BIGINT) - 1 END)
                  AS p95_bucket_lo
              FROM w GROUP BY event_type ORDER BY event_type""")),
    QueryDef("ts_forecast_naive", tsForecastNaive,
      Some("""WITH hourly AS (SELECT
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                  AS h, COUNT(*) AS n FROM events GROUP BY 1),
              spine AS (SELECT unnest(generate_series(
                (SELECT MIN(h) FROM hourly), (SELECT MAX(h) FROM hourly),
                INTERVAL 1 HOUR)) AS h),
              s AS (SELECT spine.h AS h,
                CAST(date_diff('hour', (SELECT MIN(h) FROM hourly),
                  spine.h) AS BIGINT) AS idx,
                CAST(date_diff('hour', (SELECT MIN(h) FROM hourly),
                  (SELECT MAX(h) FROM hourly)) AS BIGINT) AS max_idx,
                COALESCE(n, 0) AS actual
                FROM spine LEFT JOIN hourly ON spine.h = hourly.h),
              f AS (SELECT h, idx, max_idx, actual,
                LAG(actual, 24) OVER (ORDER BY idx) AS forecast
                FROM s),
              e AS (SELECT h, actual, forecast,
                abs(actual - forecast) AS abs_err
                FROM f WHERE idx > max_idx - 24)
              SELECT h, actual, forecast, abs_err,
                (SELECT CAST(SUM(abs_err) AS BIGINT) * 1000
                   // COUNT(*) FROM e) AS mae_milli
              FROM e ORDER BY h""")),
    QueryDef("ts_period_detect", tsPeriodDetect,
      Some("""WITH hourly AS (SELECT
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                  AS h, COUNT(*) AS n FROM events GROUP BY 1),
              spine AS (SELECT unnest(generate_series(
                (SELECT MIN(h) FROM hourly), (SELECT MAX(h) FROM hourly),
                INTERVAL 1 HOUR)) AS h),
              s AS (SELECT CAST(date_diff('hour',
                  (SELECT MIN(h) FROM hourly), spine.h) AS BIGINT) AS idx,
                COALESCE(n, 0) AS x
                FROM spine LEFT JOIN hourly ON spine.h = hourly.h),
              lags AS (SELECT unnest(range(2, 49)) AS p),
              j AS (SELECT p, a.x AS xa, b.x AS xb
                FROM lags, s a, s b WHERE b.idx = a.idx + p),
              m AS (SELECT p, COUNT(*) AS n,
                CAST(SUM(xa) AS BIGINT) AS sx, CAST(SUM(xb) AS BIGINT) AS sy,
                CAST(SUM(xa * xb) AS BIGINT) AS sxy,
                CAST(SUM(xa * xa) AS BIGINT) AS sxx,
                CAST(SUM(xb * xb) AS BIGINT) AS syy
                FROM j GROUP BY p),
              r AS (SELECT p AS lag_hours, n AS n_pairs,
                CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE) > 0
                  THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS acf
                FROM m)
              SELECT lag_hours, n_pairs, acf,
                CAST(ROW_NUMBER() OVER (ORDER BY acf DESC, lag_hours) = 1
                  AS INTEGER) AS is_best
              FROM r ORDER BY lag_hours""")),
    QueryDef("ts_outlier_tukey", tsOutlierTukey,
      Some("""WITH daily AS (SELECT
                CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                  AS d, COUNT(*) AS n FROM events GROUP BY 1),
              q AS (SELECT quantile_cont(n, 0.25) AS q1,
                quantile_cont(n, 0.75) AS q3 FROM daily)
              SELECT d, n,
                round(q1 - (q3 - q1) * 1.5, 6) AS fence_lo,
                round(q3 + (q3 - q1) * 1.5, 6) AS fence_hi,
                CAST(n < q1 - (q3 - q1) * 1.5
                  OR n > q3 + (q3 - q1) * 1.5 AS INTEGER) AS is_outlier
              FROM daily, q ORDER BY d""")),
    QueryDef("ts_stl_decompose", tsStlDecompose,
      Some("""WITH hourly AS (SELECT
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                  AS h, COUNT(*) AS n FROM events GROUP BY 1),
              spine AS (SELECT unnest(generate_series(
                (SELECT MIN(h) FROM hourly), (SELECT MAX(h) FROM hourly),
                INTERVAL 1 HOUR)) AS h),
              s AS (SELECT spine.h AS h, COALESCE(n, 0) AS x
                FROM spine LEFT JOIN hourly ON spine.h = hourly.h),
              w AS (SELECT h, x,
                CASE WHEN COUNT(*) OVER win = 25
                  THEN CAST(SUM(x) OVER win AS BIGINT) END AS t_num,
                CAST(hour(h) AS INTEGER) AS hod
                FROM s WINDOW win AS (ORDER BY h
                  ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
              se AS (SELECT hod,
                CAST(SUM(25 * x - t_num) AS BIGINT) AS s_num,
                COUNT(*) AS k
                FROM w WHERE t_num IS NOT NULL GROUP BY hod)
              SELECT h, x,
                round(CAST(t_num AS DOUBLE) / 25.0, 6) AS trend,
                round(CAST(s_num AS DOUBLE)
                  / (25.0 * CAST(k AS DOUBLE)), 6) AS seasonal,
                round(CAST(25 * k * x - k * t_num - s_num AS DOUBLE)
                  / (25.0 * CAST(k AS DOUBLE)), 6) AS resid
              FROM w LEFT JOIN se USING (hod) ORDER BY h""")),
    QueryDef("ts_anomaly_zscore", tsAnomalyZscore,
      Some("""WITH hourly AS (SELECT
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                  AS h, COUNT(*) AS n FROM events GROUP BY 1),
              spine AS (SELECT unnest(generate_series(
                (SELECT MIN(h) FROM hourly), (SELECT MAX(h) FROM hourly),
                INTERVAL 1 HOUR)) AS h),
              s AS (SELECT spine.h AS h, COALESCE(n, 0) AS x
                FROM spine LEFT JOIN hourly ON spine.h = hourly.h),
              w AS (SELECT h, x, COUNT(*) OVER win AS cnt,
                CAST(SUM(x) OVER win AS BIGINT) AS ss,
                CAST(SUM(x * x) OVER win AS BIGINT) AS q
                FROM s WINDOW win AS (ORDER BY h
                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
              c AS (SELECT h, x, 24 * x - ss AS num,
                24 * q - ss * ss AS v24 FROM w WHERE cnt = 24)
              SELECT h, x,
                CASE WHEN v24 > 0 THEN round(CAST(num AS DOUBLE)
                  / sqrt(CAST(v24 AS DOUBLE)), 6) END AS z,
                CAST(num * num > 9 * v24 AS INTEGER) AS is_anomaly
              FROM c ORDER BY h""")),
    QueryDef("ts_theil_sen", tsTheilSen,
      Some("""WITH daily AS (SELECT user_id,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, COUNT(*) AS x
                FROM events WHERE event_type = 'purchase'
                GROUP BY 1, 2),
              r AS (SELECT user_id, x, ROW_NUMBER()
                  OVER (PARTITION BY user_id ORDER BY d) AS t
                FROM daily),
              f AS (SELECT * FROM r WHERE t <= 6),
              e AS (SELECT user_id FROM f
                GROUP BY user_id HAVING COUNT(*) = 6),
              p AS (SELECT a.user_id,
                  CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
                    AS slope
                FROM f a
                JOIN f b ON a.user_id = b.user_id AND b.t > a.t
                JOIN e ON e.user_id = a.user_id)
              SELECT user_id, COUNT(*) AS n_pairs,
                median(slope) AS theil_sen_slope
              FROM p GROUP BY user_id ORDER BY user_id""")),
    QueryDef("ts_mann_kendall", tsMannKendall,
      Some("""WITH daily AS (SELECT user_id,
                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, COUNT(*) AS x
                FROM events WHERE event_type = 'purchase'
                GROUP BY 1, 2),
              r AS (SELECT user_id, x, ROW_NUMBER()
                  OVER (PARTITION BY user_id ORDER BY d) AS t
                FROM daily),
              f AS (SELECT * FROM r WHERE t <= 6),
              e AS (SELECT user_id FROM f
                GROUP BY user_id HAVING COUNT(*) = 6),
              s AS (SELECT a.user_id,
                  SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS s_stat
                FROM f a
                JOIN f b ON a.user_id = b.user_id AND b.t > a.t
                JOIN e ON e.user_id = a.user_id
                GROUP BY a.user_id),
              ti AS (SELECT user_id,
                  SUM(tg * (tg - 1) * (tg * 2 + 5)) AS tie_sum
                FROM (SELECT f.user_id, f.x, COUNT(*) AS tg
                      FROM f JOIN e ON e.user_id = f.user_id
                      GROUP BY f.user_id, f.x)
                GROUP BY user_id)
              SELECT s.user_id, CAST(s.s_stat AS BIGINT) AS s_stat,
                CAST(510 - ti.tie_sum AS BIGINT) AS var_num,
                CASE WHEN 510 - ti.tie_sum = 0 THEN NULL
                     WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                       / sqrt(CAST(510 - ti.tie_sum AS DOUBLE) / 18.0)
                     WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                       / sqrt(CAST(510 - ti.tie_sum AS DOUBLE) / 18.0)
                     ELSE 0.0 END AS z_stat
              FROM s JOIN ti ON ti.user_id = s.user_id
              ORDER BY s.user_id""")),
    QueryDef("ts_acf", tsAcf,
      Some("""WITH hourly AS (SELECT
                 date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                 COUNT(*) AS n FROM events GROUP BY 1),
              bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
              spine AS (SELECT unnest(generate_series(lo, hi,
                 INTERVAL 1 HOUR)) AS h FROM bounds),
              series AS (SELECT
                 row_number() OVER (ORDER BY sp.h) AS t,
                 COALESCE(n, 0) AS x
                 FROM spine sp LEFT JOIN hourly USING (h)),
              g AS (SELECT CAST(SUM(x) AS BIGINT) AS s,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 COUNT(*) AS nn FROM series),
              l AS (SELECT unnest(generate_series(1, 6)) AS lag),
              p AS (SELECT l.lag,
                 CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
                 CAST(SUM(a.x + b.x) AS BIGINT) AS sxpy,
                 COUNT(*) AS nk
                 FROM l JOIN series a ON true
                 JOIN series b ON b.t = a.t + l.lag
                 GROUP BY l.lag)
              SELECT CAST(lag AS BIGINT) AS lag, nk,
                CASE WHEN nn * sxx = s * s THEN NULL ELSE
                (CAST(sxy AS DOUBLE)
                   - (CAST(s AS DOUBLE) / CAST(nn AS DOUBLE))
                     * CAST(sxpy AS DOUBLE)
                   + CAST(nk AS DOUBLE)
                     * (CAST(s AS DOUBLE) / CAST(nn AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(nn AS DOUBLE)))
                / (CAST(sxx AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(nn AS DOUBLE)) END AS acf
              FROM p, g ORDER BY lag""")),
    QueryDef("ts_changepoint", tsChangepoint,
      Some("""WITH hourly AS (SELECT
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                  AS h, COUNT(*) AS n FROM events GROUP BY 1),
              spine AS (SELECT unnest(generate_series(
                (SELECT MIN(h) FROM hourly), (SELECT MAX(h) FROM hourly),
                INTERVAL 1 HOUR)) AS h),
              s AS (SELECT spine.h AS h, COALESCE(n, 0) AS x
                FROM spine LEFT JOIN hourly ON spine.h = hourly.h),
              w AS (SELECT h, x,
                CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS t,
                CAST(SUM(x) OVER (ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS prefix,
                CAST(SUM(x) OVER () AS BIGINT) AS s_tot,
                CAST(COUNT(*) OVER () AS BIGINT) AS n_tot
                FROM s),
              c AS (SELECT h, t, prefix, s_tot, n_tot,
                CAST(prefix AS DOUBLE) - CAST(t AS DOUBLE)
                  * (CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)) AS cusum
                FROM w),
              best AS (SELECT *, ROW_NUMBER() OVER
                  (ORDER BY abs(cusum) DESC, h) AS rn FROM c)
              SELECT h AS t_star, round(cusum, 6) AS cusum,
                round(CAST(prefix AS DOUBLE) / CAST(t AS DOUBLE), 6)
                  AS mean_before,
                round(CASE WHEN n_tot = t THEN NULL
                  ELSE CAST(s_tot - prefix AS DOUBLE)
                    / CAST(n_tot - t AS DOUBLE) END, 6) AS mean_after
              FROM best WHERE rn = 1""")),
    QueryDef("ts_ema", tsEma,
      Some("""WITH l AS (SELECT user_id,
                 list(value ORDER BY ts, event_id) AS xs
                 FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                       event_id, value FROM events
                       WHERE event_type = 'purchase') s
                 GROUP BY user_id)
              SELECT user_id, CAST(len(xs) AS INTEGER) AS n_purchases,
                list_reduce(xs, (acc, x) -> x * 0.1 + acc * 0.9) AS ema
              FROM l ORDER BY user_id""")),
    QueryDef("ts_gap_fill", tsGapFill,
      Some(s"""WITH hourly AS (SELECT
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h,
                COUNT(*) AS n, ${Det.oSum("value")} AS rev
                FROM events WHERE event_type = 'purchase' GROUP BY 1),
              spine AS (SELECT unnest(generate_series(
                (SELECT MIN(h) FROM hourly), (SELECT MAX(h) FROM hourly),
                INTERVAL 1 HOUR)) AS h)
              SELECT spine.h AS h, COALESCE(n, 0) AS n_purchases,
                last_value(rev IGNORE NULLS) OVER (ORDER BY spine.h
                  ROWS UNBOUNDED PRECEDING) AS rev_locf
              FROM spine LEFT JOIN hourly ON spine.h = hourly.h
              ORDER BY h""")),
    QueryDef("fn_seq_count", fnSeqCount,
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS d
                FROM events WHERE event_type IN ('signup', 'purchase')),
              r AS (SELECT user_id, d,
                SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS excess
                FROM e)
              SELECT user_id,
                COUNT(CASE WHEN d = 1 THEN 1 END) AS n_purchases,
                CAST(COUNT(CASE WHEN d = 1 THEN 1 END)
                  - GREATEST(MAX(excess), 0) AS BIGINT) AS n_seq_matches
              FROM r GROUP BY user_id ORDER BY user_id""")),
    QueryDef("ts_interpolate", tsInterpolate,
      Some(s"""WITH hourly AS (SELECT
                CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h,
                ${Det.oSum("value")} AS rev
                FROM events WHERE event_type = 'purchase' GROUP BY 1),
              spine AS (SELECT unnest(generate_series(
                (SELECT MIN(h) FROM hourly), (SELECT MAX(h) FROM hourly),
                INTERVAL 1 HOUR)) AS h),
              j AS (SELECT spine.h AS h, rev
                FROM spine LEFT JOIN hourly ON spine.h = hourly.h),
              w AS (SELECT h, rev,
                last_value(rev IGNORE NULLS) OVER (ORDER BY h
                  ROWS UNBOUNDED PRECEDING) AS pv,
                last_value(CASE WHEN rev IS NOT NULL THEN h END IGNORE NULLS)
                  OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS ph,
                first_value(rev IGNORE NULLS) OVER (ORDER BY h
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN rev IS NOT NULL THEN h END IGNORE NULLS)
                  OVER (ORDER BY h
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
                FROM j)
              SELECT h, CASE
                WHEN rev IS NOT NULL THEN rev
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv)
                  * CAST(epoch(h) - epoch(ph) AS DOUBLE)
                  / CAST(epoch(nh) - epoch(ph) AS DOUBLE) END
                AS rev_interp
              FROM w ORDER BY h""")),
    QueryDef("ts_downsample", tsDownsample,
      Some(s"""WITH e AS (SELECT user_id, event_id, value,
                CAST(ts AS TIMESTAMP) AS ts FROM events
                WHERE event_type = 'purchase'),
              b AS (SELECT user_id, event_id, value, ts,
                TIMESTAMP '1970-01-01 00:00:00'
                  + CAST(floor(epoch(ts) / 300) AS BIGINT) * 300
                    * INTERVAL 1 SECOND AS bucket
                FROM e),
              w AS (SELECT user_id, bucket, value,
                first_value(value) OVER pw AS open,
                last_value(value) OVER pw AS close
                FROM b WINDOW pw AS (PARTITION BY user_id, bucket
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
              SELECT user_id, bucket, COUNT(*) AS n_events,
                MAX(open) AS open, MAX(value) AS high, MIN(value) AS low,
                MAX(close) AS close,
                ${Det.oAvg("value")} AS avg_value
              FROM w GROUP BY user_id, bucket ORDER BY user_id, bucket""")),
    QueryDef("sessionize_batch", sessionizeBatch,
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
              f AS (SELECT user_id, event_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              g AS (SELECT user_id, ts,
                CAST(SUM(new_sess) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_idx
                FROM f)
              SELECT user_id, session_idx, COUNT(*) AS n_events,
                MIN(ts) AS session_start, MAX(ts) AS session_end
              FROM g GROUP BY user_id, session_idx
              ORDER BY user_id, session_idx""")),
    QueryDef("win_nonneg_derivative", winNonnegDerivative,
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                 value FROM events WHERE event_type = 'purchase'),
              w AS (SELECT user_id, event_id, ts, value,
                 LAG(value) OVER win AS pv, LAG(ts) OVER win AS pt
                 FROM e WINDOW win AS
                   (PARTITION BY user_id ORDER BY ts, event_id))
              SELECT user_id, event_id,
                round(CASE WHEN pt IS NOT NULL AND epoch_us(ts) > epoch_us(pt)
                  THEN GREATEST(CAST(0 AS DOUBLE), (value - pv)
                    / (CAST(epoch_us(ts) - epoch_us(pt) AS DOUBLE)
                       / 1000000.0)) END, 6) AS rate
              FROM w ORDER BY user_id, event_id""")),
    QueryDef("ts_decayed_avg", tsDecayedAvg,
      Some(s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                 FROM events WHERE event_type = 'purchase'),
              w AS (SELECT user_id, value,
                 exp(CAST(epoch_us(ts)
                     - epoch_us(MAX(ts) OVER (PARTITION BY user_id))
                   AS DOUBLE) / 1000000.0 / 3600.0) AS wgt
                 FROM e)
              SELECT user_id, COUNT(*) AS n_purchases,
                ${Det.oSum("value * wgt")} AS decayed_sum,
                ${Det.oSum("wgt")} AS decayed_weight,
                ${Det.oSum("value * wgt")} / ${Det.oSum("wgt")} AS decayed_avg
              FROM w GROUP BY user_id ORDER BY user_id""")),
  )

  /** `sequenceMatch` with a TIME constraint — ClickHouse's
    * `(?1)(?t<=3600)(?2)` operator, which the plain regex formulation
    * (fn_seq_match) cannot express: signup followed by a purchase
    * WITHIN ONE HOUR. Relational shape: a running last-signup timestamp
    * over the user's ordered timeline turns the pair search into a
    * map-side latency check — one window pass clustered on user_id, no
    * self-join over the event log, exactly the funnel-family plan.
    */
  private def fnSeqMatchTime(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("last_signup",
        max(when(col("event_type") === "signup", col("ts"))).over(w))
      .filter(col("event_type") === "purchase" && col("last_signup").isNotNull)
      .withColumn("lat",
        unix_micros(col("ts")) - unix_micros(col("last_signup")))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("lat") <= 3600000000L, 1).otherwise(0))
          .cast("int").as("matched"),
        min(when(col("lat") <= 3600000000L, col("lat"))).as("min_lat_us"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse `sequenceMatch('(?1).*(?2).*(?3)')`: per user, collapse the
    * time-ordered event stream to a string of type initials (all five types
    * start with distinct letters) and run the pattern as a real regex —
    * the same trick ClickHouse uses internally (bitmask chain), expressed
    * with codegen'd collect/sort/transform. One shuffle on user_id; the
    * per-user string is bounded by that user's event count, not the corpus.
    */
  /** Per-user journey string — the time-ordered event stream collapsed
    * to type initials (all five types start with distinct first
    * letters), ordered by the unique (ts, event_id) key. ONE encoder
    * shared by fn_seq_match and fn_journey_regex: the two keys
    * previously carried divergent spellings of the same collapse
    * (struct-of-initial vs transform-at-the-end) that had to stay
    * semantically identical by review alone.
    */
  private def journeyStrings(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(expr("""array_join(transform(
             array_sort(collect_list(struct(ts, event_id, event_type))),
             x -> substring(x.event_type, 1, 1)), '')""").as("journey"))

  private def fnSeqMatch(s: SparkSession, dir: String): DataFrame =
    journeyStrings(s, dir)
      .select(col("user_id"),
        col("journey").rlike("s.*v.*p").cast("int").as("m_signup_view_buy"),
        col("journey").rlike("e.*e.*e").cast("int").as("m_triple_error"),
        length(col("journey")).as("n_events"))
      .orderBy(col("user_id"))

  /** Time-series gap fill: hourly purchase rollup joined onto a generated
    * hour spine — missing hours get count 0 and carry the last observed
    * revenue forward (LOCF via `last(_, ignoreNulls)`). The spine is
    * calendar-bounded (a few k rows regardless of data size), so the
    * single-partition ordered window over it is safe at any scale; the
    * heavy groupBy stays distributed.
    */
  /** The hourly SPINE every gap-sensitive ts_* operator joins against:
    * an hour-stepped sequence over [min(h), max(h)] of the (already
    * aggregated, O(hours)-sized) `hourly` frame, exploded from its
    * 1-row bounds aggregate. `carry` keeps the `lo`/`hi` bound columns
    * alongside when the caller's index math needs them. One
    * implementation — previously copy-pasted at eight sites, where a
    * bounds-semantics fix could silently drift per query.
    */
  private def hourlySpine(hourly: DataFrame, carry: String*): DataFrame =
    hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(carry.map(col) :+ explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("h"): _*)

  /** The plain hourly COUNT rollup six spine-joined ts_* keys share
    * (forecast/period/stl/zscore/changepoint/acf) — previously
    * copy-pasted per key, where a rollup-semantics fix could silently
    * drift per query. Deliberately NOT checkpointed: every caller
    * consumes it twice (the spine's bounds aggregate plus the spine
    * join), but the two consumers share the rollup's exchange via
    * ReuseExchange and an eager localCheckpoint NET-LOST in an isolated
    * A/B at sf0.1 (5 of 6 keys faster without, e.g. ts_anomaly_zscore
    * 0.36 -> 0.29 s, ts_acf 0.49 -> 0.38 s) — the agg_theils_u
    * measurement, reproduced on this exact shape.
    */
  private def hourlyCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))

  private def tsGapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("rev"))
    val spine = hourlySpine(hourly)
    val locf = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("h"), "left")
      .select(col("h"),
        coalesce(col("n"), lit(0L)).as("n_purchases"),
        last(col("rev"), ignoreNulls = true).over(locf).as("rev_locf"))
      .orderBy(col("h"))
  }

  /** ClickHouse `quantileTiming` philosophy — latency quantiles over a
    * LOG-BUCKETED histogram instead of a value sketch: latencies
    * (value·1000 as µs) land in power-of-two buckets b = ⌊log2(t+1)⌋
    * decided by a generated integer CASE ladder (the crossTerms
    * pattern: the SAME string runs on both engines — no libm log2
    * anywhere), and p50/p95 are the lower bounds of the first bucket
    * whose cumulative count reaches ⌈p·n⌉ (pure integer index
    * arithmetic). Exactly the trade ClickHouse makes: bounded state,
    * bucket-resolution quantiles, zero floating point.
    *
    * Scale notes: the heavy pass is map-side bucket assignment + a
    * partial-count shuffle onto the O(types × 31 buckets) domain; the
    * quantile window rides that domain.
    */
  private def aggTimingQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dom = Tables.events(s, dir)
      .select(col("event_type"),
        expr("greatest(CAST(floor(value * 1000) AS BIGINT), 0)").as("t"))
      .withColumn("b", expr(timingBucketSql("t")))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val part = Window.partitionBy(col("event_type"))
    val cumW = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dom
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(part))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        countDistinct(col("b")).as("n_buckets"),
        min(when(col("cum") >= expr("(n + 1) div 2"),
          expr("shiftleft(1L, CAST(b AS INT)) - 1"))).as("p50_bucket_lo"),
        min(when(col("cum") >= expr("(19 * n + 19) div 20"),
          expr("shiftleft(1L, CAST(b AS INT)) - 1"))).as("p95_bucket_lo"))
      .orderBy(col("event_type"))
  }

  /** ⌊log2(t+1)⌋ as a portable integer CASE ladder (valid in Spark SQL
    * and DuckDB — no shift operators, no libm).
    */
  private[operators] def timingBucketSql(t: String): String =
    (0 to 29).map { k =>
      s"WHEN ($t) + 1 < ${1L << (k + 1)} THEN $k"
    }.mkString("(CASE ", " ", " ELSE 30 END)")

  /** Seasonal-naive forecasting with holdout evaluation (the baseline
    * every forecasting pipeline must beat, and the natural consumer of
    * ts_period_detect's output): forecast(h) = actual(h − 24h) on the
    * zero-filled hourly series, evaluated over the LAST 24 hours.
    * Everything is integer — actual, forecast, |error|, and the overall
    * MAE in milli-units via integer division — so both engines agree
    * bit-for-bit with no rounding rule in sight.
    *
    * Scale notes: the series is the O(hours) rollup (raw events are
    * map-side count partials); lag-24 and the eval tail ride ONE window
    * over that domain. At 100 TB the rollup is the only row-scale pass.
    */
  private def tsForecastNaive(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = hourlyCounts(s, dir)
    val spine = hourlySpine(hourly, "lo", "hi")
    val series = spine.join(hourly, Seq("h"), "left")
      .select(col("h"),
        expr("(unix_seconds(h) - unix_seconds(lo)) div 3600").as("idx"),
        expr("(unix_seconds(hi) - unix_seconds(lo)) div 3600").as("max_idx"),
        coalesce(col("n"), lit(0L)).as("actual"))
    val byIdx = Window.orderBy(col("idx"))
    val withF = series
      .withColumn("forecast", lag(col("actual"), 24).over(byIdx))
      .filter(col("idx") > col("max_idx") - 24)
      .withColumn("abs_err", abs(col("actual") - col("forecast")))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    withF
      .withColumn("sum_err", sum(col("abs_err")).over(tot))
      .withColumn("n_eval", count(lit(1)).over(tot))
      .select(col("h"), col("actual"), col("forecast"), col("abs_err"),
        expr("sum_err * 1000 div n_eval").as("mae_milli"))
      .orderBy(col("h"))
  }

  /** Seasonality detection (the job of ClickHouse
    * `seriesPeriodDetectFFT`), via lagged AUTOCORRELATION instead of an
    * FFT: for each candidate lag p ∈ [2, 48] hours, Pearson r between
    * the zero-filled hourly count series and itself shifted by p; the
    * top-ranked lag is the detected period. Autocorrelation is chosen
    * over FFT deliberately — every sufficient statistic (n, Σx, Σy,
    * Σxy, Σx², Σy²) is an INTEGER, so both engines agree exactly until
    * one final divide/sqrt chain of IEEE-deterministic ops; an FFT
    * would thread libm sin/cos through every term. The variance product
    * is computed via long partials cast to double at ~2e10 magnitude
    * (each exactly representable), so the double multiply is the same
    * on both engines even where it exceeds 2⁵³.
    *
    * Scale notes: the series is the O(hours) downsampled rollup (raw
    * events contribute map-side count partials only); the lag join is
    * O(hours × lags) on that rollup — control-plane sized even for a
    * decade of hours — and broadcastable by construction.
    */
  private def tsPeriodDetect(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = hourlyCounts(s, dir)
    val spine = hourlySpine(hourly, "lo")
    val series = spine.join(hourly, Seq("h"), "left")
      .select(expr("(unix_seconds(h) - unix_seconds(lo)) div 3600").as("idx"),
        coalesce(col("n"), lit(0L)).as("x"))
    val lags = s.range(2, 49).select(col("id").as("p"))
    val heads = series.crossJoin(lags)
      .select(col("p"), (col("idx") + col("p")).as("tidx"), col("x").as("xa"))
    val m = heads
      .join(series.select(col("idx").as("tidx"), col("x").as("xb")), "tidx")
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"), sum(col("xa")).as("sx"),
        sum(col("xb")).as("sy"), sum(col("xa") * col("xb")).as("sxy"),
        sum(col("xa") * col("xa")).as("sxx"),
        sum(col("xb") * col("xb")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    // zero-variance lag series: Spark's null-on-divide-by-zero vs
    // DuckDB's IEEE inf/NaN would diverge — guard to null on both sides
    val scored = m.select(col("p").as("lag_hours"), col("n").as("n_pairs"),
      when(vx * vy > 0, round(num / sqrt(vx * vy), 6)).as("acf"))
    scored
      .withColumn("is_best",
        (row_number().over(Window.orderBy(col("acf").desc,
          col("lag_hours"))) === 1).cast("int"))
      .orderBy(col("lag_hours"))
  }

  /** STL-style decomposition of the hourly count series (the job of
    * ClickHouse `seriesDecomposeSTL`): trend = centered 25-hour moving
    * average (NULL where the window is partial), seasonal = per
    * hour-of-day mean of the detrended series, residual = the rest.
    * Arithmetic discipline: the trend keeps its INTEGER numerator
    * `t_num = Σ±12 x` (trend = t_num/25), the detrended value is the
    * integer `25·x − t_num`, and the seasonal mean keeps integer
    * numerator `s_num` over `k` days — so every emitted component is a
    * single integer-ratio divide rounded at 6dp, with no accumulated
    * double sums to disagree on order.
    *
    * Scale notes: raw events fold to the O(hours) rollup map-side; the
    * moving average is one window and the seasonal profile a 24-row
    * broadcast join back. Nothing here ever touches raw rows twice.
    */
  private def tsStlDecompose(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = hourlyCounts(s, dir)
    val spine = hourlySpine(hourly)
    val byH = Window.orderBy(col("h"))
    val w25 = byH.rowsBetween(-12, 12)
    val trended = spine.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("x"))
      .withColumn("t_num",
        when(count(lit(1)).over(w25) === 25, sum(col("x")).over(w25)))
      .withColumn("hod", hour(col("h")))
      .withColumn("d_num", lit(25L) * col("x") - col("t_num"))
    val seasonal = trended.filter(col("d_num").isNotNull)
      .groupBy(col("hod"))
      .agg(sum(col("d_num")).as("s_num"), count(lit(1)).as("k"))
    trended.join(broadcast(seasonal), Seq("hod"), "left")
      .select(col("h"), col("x"),
        round(col("t_num").cast("double") / 25.0, 6).as("trend"),
        round(col("s_num").cast("double")
          / (lit(25.0) * col("k").cast("double")), 6).as("seasonal"),
        round((lit(25L) * col("k") * col("x") - col("k") * col("t_num")
          - col("s_num")).cast("double")
          / (lit(25.0) * col("k").cast("double")), 6).as("resid"))
      .orderBy(col("h"))
  }

  /** Tukey-fence outliers over the daily count series (ClickHouse
    * `seriesOutliersDetectTukey`): Q1/Q3 by exact interpolated
    * percentile (the agg_quantile-proven percentile↔quantile_cont
    * pairing), fences at ±1.5·IQR. Both engines evaluate the identical
    * IEEE chain (interp quartile → one multiply → one add), so the
    * fence doubles are bit-equal and the flag comparison cannot
    * diverge. Fences rounded 6dp only at the edge; the flag compares
    * the UNROUNDED values.
    *
    * Scale notes: raw events fold map-side to the O(days) rollup; the
    * quartiles are one scalar agg broadcast back. Nothing global-sorts.
    */
  private def tsOutlierTukey(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val q = daily.agg(expr("percentile(n, 0.25)").as("q1"),
      expr("percentile(n, 0.75)").as("q3"))
    daily.crossJoin(broadcast(q))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      .select(col("d"), col("n"),
        round(col("lo"), 6).as("fence_lo"), round(col("hi"), 6).as("fence_hi"),
        (col("n") < col("lo") || col("n") > col("hi")).cast("int")
          .as("is_outlier"))
      .orderBy(col("d"))
  }

  /** Rolling z-score anomaly detection over the hourly count series:
    * each hour scored against the PRECEDING 24 full hours (the current
    * hour is excluded from its own baseline, the standard online
    * formulation). With integer sums S = Σx and Q = Σx² over the
    * trailing frame, z = (24·x − S)/√(24·Q − S²) — integers until one
    * final sqrt+divide — and the flag is decided ENTIRELY in integers:
    * |z| > 3  ⟺  (24·x − S)² > 9·(24·Q − S²), so the anomaly bit can
    * never straddle a floating-point rounding boundary across engines.
    *
    * Scale notes: O(hours) rollup + one window pass. The squared terms
    * stay in int64 while hourly counts < ~3·10⁸; beyond that promote S/Q
    * to DECIMAL(38,0) — noted rather than paid, since the rollup grain
    * (not the raw volume) bounds x.
    */
  private def tsAnomalyZscore(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = hourlyCounts(s, dir)
    val spine = hourlySpine(hourly)
    val byH = Window.orderBy(col("h"))
    val w24 = byH.rowsBetween(-24, -1)
    spine.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("x"))
      .withColumn("cnt", count(lit(1)).over(w24))
      .withColumn("s", sum(col("x")).over(w24))
      .withColumn("q", sum(col("x") * col("x")).over(w24))
      .filter(col("cnt") === 24)
      .withColumn("num", lit(24L) * col("x") - col("s"))
      .withColumn("v24", lit(24L) * col("q") - col("s") * col("s"))
      .select(col("h"), col("x"),
        when(col("v24") > 0, round(col("num").cast("double")
          / sqrt(col("v24").cast("double")), 6)).as("z"),
        (col("num") * col("num") > lit(9L) * col("v24")).cast("int")
          .as("is_anomaly"))
      .orderBy(col("h"))
  }

  /** Changepoint detection over the hourly count series: the CUSUM
    * statistic S_t = prefix(t) − t·μ (deviation of the running sum from
    * its global-mean expectation); the changepoint is argmax |S_t|, and
    * the two segment means around it quantify the level shift. prefix
    * and t are integers, μ = S/N one double division — both engines run
    * the identical IEEE chain, rounded at 6dp. Earliest hour wins ties
    * (row_number, not rank — a deterministic single row).
    *
    * Scale notes: raw events fold to the O(hours) rollup map-side; the
    * prefix sum is one window over that rollup. At 100 TB the rollup is
    * still control-plane sized — CUSUM never touches raw rows.
    */
  private def tsChangepoint(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = hourlyCounts(s, dir)
    val spine = hourlySpine(hourly)
    val byH = Window.orderBy(col("h"))
    val series = spine.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("x"))
      .withColumn("t", row_number().over(byH).cast("long"))
      .withColumn("prefix", sum(col("x")).over(
        byH.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    series
      .withColumn("s_tot", sum(col("x")).over(tot))
      .withColumn("n_tot", max(col("t")).over(tot))
      .withColumn("cusum", col("prefix").cast("double")
        - col("t").cast("double")
          * (col("s_tot").cast("double") / col("n_tot").cast("double")))
      .withColumn("rn", row_number().over(
        Window.orderBy(abs(col("cusum")).desc, col("h"))))
      .filter(col("rn") === 1)
      .select(col("h").as("t_star"), round(col("cusum"), 6).as("cusum"),
        round(col("prefix").cast("double") / col("t").cast("double"), 6)
          .as("mean_before"),
        // last-row-argmax guard (class 6): t = n_tot leaves no "after"
        // segment — 0/0 THROWS under ANSI on Spark and is NaN on DuckDB;
        // NULL on both engines (oracle carries the same CASE)
        round(when(col("n_tot") === col("t"), lit(null).cast("double"))
          .otherwise((col("s_tot") - col("prefix")).cast("double")
            / (col("n_tot") - col("t")).cast("double")), 6).as("mean_after"))
  }

  /** Autocorrelation function r₁..r₆ over the zero-filled hourly event-
    * count series — the seasonality fingerprint read before choosing a
    * forecast model (a daily cycle shows as a ridge at lag 24; white
    * noise decays immediately). Determinism by EXACT-INTEGER moments:
    * rather than summing centered double products (whose order differs
    * across partitionings/engines), the numerator expands to
    * Σxy − m·Σ(x+y) + n_k·m² over exact long sums (Σ x_t·x_{t+k},
    * Σ(x_t + x_{t+k}), counts), and the closed form runs ONCE per lag
    * in one fixed double op order on identical integers — shipped
    * UNROUNDED (bit-identical on both engines; the edge round is the
    * class-3 midpoint hazard).
    *
    * Scale notes: raw events fold to the O(hours) rollup map-side; the
    * lag pairing is an equi-join of the control-plane-sized series with
    * itself on t+k (lags broadcast); the global moments broadcast back
    * as one row. ACF never touches raw rows.
    */
  private def tsAcf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = hourlyCounts(s, dir)
    val spine = hourlySpine(hourly)
    val series = spine.join(hourly, Seq("h"), "left")
      .select(coalesce(col("n"), lit(0L)).as("x"),
        row_number().over(Window.orderBy(col("h"))).cast("long").as("t"))
    val glob = series.agg(sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("sxx"), count(lit(1)).as("nn"))
    val lags = s.range(1, 7).select(col("id").as("k"))
    val b = series.select(col("t").as("tb"), col("x").as("y"))
    series.crossJoin(broadcast(lags))
      .join(b, col("tb") === col("t") + col("k"))
      .groupBy(col("k"))
      .agg(sum(col("x") * col("y")).as("sxy"),
        sum(col("x") + col("y")).as("sxpy"),
        count(lit(1)).as("nk"))
      .crossJoin(broadcast(glob))
      .select(col("k").as("lag"), col("nk"), {
        val m = col("s").cast("double") / col("nn").cast("double")
        val num = col("sxy").cast("double") - m * col("sxpy").cast("double") +
          col("nk").cast("double") * m * m
        val den = col("sxx").cast("double") -
          col("s").cast("double") * col("s").cast("double") /
            col("nn").cast("double")
        // zero-variance guard on EXACT INTEGERS (den = 0 ⇔ nn·sxx = s²):
        // a constant series has no ACF — NULL on both engines, instead
        // of Spark Divide NULL vs DuckDB NaN (class 6)
        when(col("nn") * col("sxx") === col("s") * col("s"),
          lit(null).cast("double"))
          .otherwise(num / den).as("acf")
      })
      .orderBy(col("lag"))
  }

  /** Dynamic time warping distance — O(n·m) DP with the standard
    * two-row rolling buffer. Sequential by nature (each cell depends on
    * three neighbors), hence a local function applied per PAIR, not a
    * SQL expression; exposed for the spec's metric-property tests.
    */
  private[graft] def dtw(a: Seq[Double], b: Seq[Double]): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return if (n == m) 0.0 else Double.PositiveInfinity
    val prev = Array.fill(m + 1)(Double.PositiveInfinity)
    val cur = new Array[Double](m + 1)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      cur(0) = Double.PositiveInfinity
      var j = 1
      while (j <= m) {
        val c = math.abs(a(i - 1) - b(j - 1))
        cur(j) = c + math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        j += 1
      }
      Array.copy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  /** Trajectory similarity via DTW between the 8 most active users'
    * daily purchase-count series: elastic alignment scores time-shifted
    * but same-shaped behavior as close — the series-clustering primitive
    * rigid pointwise L1/L2 can't provide (a one-day phase shift ruins a
    * pointwise metric, DTW absorbs it). Pairs come from a self-join of
    * the top-k series (a<b), the DP runs inside a UDF over the two
    * array columns — sequential per pair, parallel across pairs.
    *
    * Scale notes: per-series state is the O(days) daily rollup (raw
    * events fold map-side); the pair stage is top-k × top-k — the
    * production shape caps k (or routes through cluster centroids,
    * label_centroid) so the quadratic stays control-plane sized. The DP
    * itself is O(days²) per pair on bounded series — never row-scaled.
    *
    * Fully oracled: the series are integer daily counts, so every DP
    * cell is EXACT in double arithmetic; the DuckDB twin replays the
    * rolling-row recurrence as a RECURSIVE CTE over i carrying the
    * previous DP row, with the within-row left-to-right dependency as a
    * list_reduce building the new row (list accumulator — the struct
    * in-place quirk does not apply). 28/28 pairs bit-identical.
    */
  private def tsDtw(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val series = daily
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("total"),
        sort_array(collect_list(struct(col("d"), col("n")))).as("sd"))
      .orderBy(col("total").desc, col("user_id"))
      .limit(8)
      .select(col("user_id"),
        expr("transform(sd, x -> cast(x.n as double))").as("xs"))
    val dtwU = udf((a: Seq[Double], b: Seq[Double]) => dtw(a, b))
    val a = series.select(col("user_id").as("user_a"), col("xs").as("xa"))
    val b = series.select(col("user_id").as("user_b"), col("xs").as("xb"))
    a.crossJoin(b).filter(col("user_a") < col("user_b"))
      .select(col("user_a"), col("user_b"),
        size(col("xa")).as("len_a"), size(col("xb")).as("len_b"),
        round(dtwU(col("xa"), col("xb")), 6).as("dtw"))
      .orderBy(col("user_a"), col("user_b"))
  }

  /** ClickHouse `sequenceCount('(?1)(?2)')` — NON-OVERLAPPING greedy
    * signup→purchase matches per user — via the bracket-matching closed
    * form instead of a sequential scan: greedy pair count = #purchases −
    * max-prefix(#purchases − #signups)⁺ (signups are opens, purchases
    * closes; the running max counts the unmatchable closes). Two window
    * passes clustered on user_id — no imperative state, no UDF.
    */
  private def fnSeqCount(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", 1).otherwise(-1).as("d"))
      .withColumn("excess", sum(col("d")).over(byTime))
      .groupBy(col("user_id"))
      .agg(count(when(col("d") === 1, 1)).as("n_purchases"),
        greatest(max(col("excess")), lit(0L)).as("unmatched"))
      .select(col("user_id"), col("n_purchases"),
        (col("n_purchases") - col("unmatched")).as("n_seq_matches"))
      .orderBy(col("user_id"))
  }

  /** Linear interpolation over the filled spine (ClickHouse `WITH FILL
    * INTERPOLATE`): missing hours get the straight line between the
    * previous and next KNOWN revenue points, weighted by time distance;
    * edges extend the nearest known value. Deterministic because the
    * known points are exact decimal sums and the interpolation runs the
    * identical double expression on both engines. Same calendar-bounded
    * spine caveat as ts_gap_fill — the ordered window runs over a few
    * thousand spine rows, never over the event log.
    */
  private def tsInterpolate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(Det.dsum(col("value")).as("rev"))
    val spine = hourlySpine(hourly)
    val back = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val knownH = when(col("rev").isNotNull, col("h"))
    spine.join(hourly, Seq("h"), "left")
      .select(col("h"), col("rev"),
        last(col("rev"), ignoreNulls = true).over(back).as("pv"),
        last(knownH, ignoreNulls = true).over(back).as("ph"),
        first(col("rev"), ignoreNulls = true).over(fwd).as("nv"),
        first(knownH, ignoreNulls = true).over(fwd).as("nh"))
      // UNROUNDED (class-3 rule): both engines run this identical IEEE
      // chain over identical doubles/epoch ints — rounding at the edge
      // would put dyadic gap ratios on 6dp midpoints and split engines
      .select(col("h"),
        when(col("rev").isNotNull, col("rev"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * (unix_timestamp(col("h")) - unix_timestamp(col("ph"))).cast("double")
            / (unix_timestamp(col("nh")) - unix_timestamp(col("ph"))).cast("double"))
          .as("rev_interp"))
      .orderBy(col("h"))
  }

  /** Exponential moving average (ClickHouse `exponentialMovingAverage`):
    * per-user EMA over purchase values, α = 0.1, seeded with the first
    * value in (ts, event_id) order. EMA is an inherently sequential
    * recursion — here it runs as a HOF left fold over the user's ordered
    * value array, which makes the result bit-identical across engines:
    * both execute the SAME chain of IEEE ops in the SAME order, so no
    * rounding is needed at the edge (the one place raw doubles are safe
    * to hash-compare).
    *
    * Scale notes: one shuffle on user_id with map-side combine into the
    * collect_list; the fold is O(events-per-user) inside each group. The
    * per-key array materializes a user's history — fine when per-key
    * cardinality is bounded (it is: a user's events, not the corpus); for
    * unbounded keys the streaming twin (stream_stateful) carries the
    * running state instead.
    */
  /** Holt double-exponential smoothing (level + trend, α=0.3 β=0.2) —
    * the forecasting recursion one step above ts_ema, as a per-user
    * STRUCT fold. Fully oracled via a DuckDB RECURSIVE CTE that carries
    * (l, b) across each user's ordered purchases — chosen over a
    * list_reduce struct fold because DuckDB 1.0.0's list_reduce reuses
    * its accumulator buffer in place from the second iteration on, so a
    * struct-state lambda sees PARTIALLY-UPDATED accumulator fields
    * (verified; the scalar fold ts_ema is unaffected). The recursion
    * executes the SAME chain of IEEE ops in the SAME order as the Spark
    * HOF, so RAW doubles hash-match (150/150 bit-identical) with no
    * edge rounding. AnalyticsOpsSpec keeps the independent sequential
    * Scala recompute as a second check.
    *
    * Scale notes: same shape as ts_ema — one shuffle to assemble each
    * user's bounded ordered history, fold is O(events-per-user)
    * map-side; the streaming twin carries (l, b) in ValueState.
    */
  private def tsHolt(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(expr("array_sort(collect_list(struct(ts, event_id, value)))")
        .as("xs"))
      .select(col("user_id"), size(col("xs")).as("n_purchases"),
        // fold directly over the sorted history — the old per-element
        // struct(l, b) re-wrap via transform() allocated a full extra
        // pass per user for a field the lambda can read as e.value
        // (the tsDecayedSum spelling); arithmetic unchanged
        expr("""aggregate(
                  slice(xs, 2, size(xs) - 1),
                  struct(element_at(xs, 1).value AS l,
                    cast(0 as double) AS b),
                  (acc, e) -> struct(
                    0.3D * e.value + 0.7D * (acc.l + acc.b) AS l,
                    0.2D * ((0.3D * e.value + 0.7D * (acc.l + acc.b)) - acc.l)
                      + 0.8D * acc.b AS b))""").as("st"))
      .select(col("user_id"), col("n_purchases"),
        col("st.l").as("level"), col("st.b").as("trend"),
        (col("st.l") + col("st.b")).as("forecast_1"))
      .orderBy(col("user_id"))

  /** ClickHouse `exponentialTimeDecayedSum` / `exponentialTimeDecayedAvg`
    * — the TIME-decayed recency score (vs ts_ema's per-row decay): each
    * purchase's weight halves per day of gap, so a burst last week
    * outranks the same burst last year. The decay factor is an EXACT
    * BINARY power — 1 / (1L << Δdays), gap clamped at 62 — because
    * exp/pow are libm calls that differ across engines in the last ulp
    * while a bit shift is exact everywhere; the sequential fold is then
    * the same IEEE op chain on both engines and the RAW doubles
    * hash-compare (the ts_ema discipline). Avg = decayedSum /
    * decayedCount, the ClickHouse pairing, one raw-quotient division.
    *
    * Scale notes: same shape as ts_ema — one shuffle assembles each
    * user's bounded ordered history, the fold is O(events-per-user)
    * map-side; the streaming twin carries (sum, count, last_day) in
    * ValueState.
    */
  private def tsDecayedSum(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(expr(
        """array_sort(collect_list(struct(to_date(ts) AS d, event_id,
             value)))""").as("xs"))
      .select(col("user_id"), size(col("xs")).as("n_purchases"),
        expr("""aggregate(
                  slice(xs, 2, size(xs) - 1),
                  struct(element_at(xs, 1).value AS l,
                    cast(1.0 as double) AS c,
                    element_at(xs, 1).d AS pd),
                  (acc, e) -> struct(
                    acc.l / cast(shiftleft(1L,
                      cast(least(datediff(e.d, acc.pd), 62) as int))
                      as double) + e.value AS l,
                    acc.c / cast(shiftleft(1L,
                      cast(least(datediff(e.d, acc.pd), 62) as int))
                      as double) + 1.0D AS c,
                    e.d AS pd))""").as("st"))
      .select(col("user_id"), col("n_purchases"),
        col("st.l").as("decayed_sum"), col("st.c").as("decayed_count"),
        (col("st.l") / col("st.c")).as("decayed_avg"))
      .orderBy(col("user_id"))

  private def tsEma(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(expr("""array_sort(collect_list(struct(ts, event_id, value)))""")
        .as("xs"))
      .select(col("user_id"), size(col("xs")).as("n_purchases"),
        expr("""aggregate(
                  slice(xs, 2, size(xs) - 1),
                  cast(element_at(xs, 1).value as double),
                  (acc, x) -> x.value * 0.1D + acc * 0.9D)""").as("ema"))
      .orderBy(col("user_id"))

  /** Time-bucket downsample (ClickHouse `toStartOfInterval` + argMin/
    * argMax rollup, the OHLC shape): purchase values per user per 5-min
    * bucket — open/close via min_by/max_by on the unique (ts, event_id)
    * order, high/low plain extrema (exact doubles), mean via exact
    * decimal sum. Bucketing is integer epoch arithmetic, not
    * `time_bucket`, so both engines floor to identical boundaries.
    * Scale: one groupBy with map-side combine; shuffle volume is
    * O(user × bucket), the downsampled size — this is the rollup that
    * turns a raw 100 TB event log into a servable time series.
    */
  private def tsDownsample(s: SparkSession, dir: String): DataFrame = {
    val key = struct(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("bucket", timestamp_seconds(
        (unix_timestamp(col("ts")) / lit(300)).cast("long") * 300))
      .groupBy(col("user_id"), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min_by(col("value"), key).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), key).as("close"),
        // UNROUNDED exact-decimal-sum / count (the win_share rule): the
        // quotient of identical doubles is identical; rounding it put
        // 2^k-sized buckets on exact 7-digit midpoints (class 3)
        Det.davg(col("value")).as("avg_value"))
      .orderBy(col("user_id"), col("bucket"))
  }

  /** Time-to-convert distribution: among fully-converted funnel users,
    * the signup→purchase latency's count / min / exact median / max.
    * All percentile arithmetic happens over INTEGER µs — an even-count
    * median interpolates two integers at frac 0.5, which every engine's
    * interpolation formula computes EXACTLY (all intermediates are
    * representable), whereas interpolating over double seconds splits
    * engines in the last ulp (Spark's a+(b−a)·f vs DuckDB's variant —
    * measured divergent on wide-spread pairs) and rounding the quotient
    * at the edge is the class-3 midpoint trap. The single /1e6 at the
    * end is one IEEE op on identical doubles. Costs one extra
    * aggregation over the O(users) funnel-times table.
    */
  private def fnFunnelLatency(s: SparkSession, dir: String): DataFrame =
    funnelTimes(s, dir)
      .filter(col("t3").isNotNull)
      .select((unix_micros(col("t3")) - unix_micros(col("t1")))
        .as("lat_us"))
      .agg(count(lit(1)).as("n_converted"),
        (min(col("lat_us")).cast("double") / 1000000.0).as("min_s"),
        (expr("percentile(lat_us, 0.5)") / 1000000.0).as("median_s"),
        (max(col("lat_us")).cast("double") / 1000000.0).as("max_s"))

  /** ClickHouse `windowFunnel(24h)(strict_order)` — the strict variant of
    * fn_funnel: steps must be CONSECUTIVE among the funnel's own event
    * types (another signup/view/purchase between two steps breaks the
    * chain, where the loose funnel would skip over it). Each row's
    * two successors come from one lead() pass over the funnel-filtered
    * timeline; per-user depth is the max chain anchored anywhere. One
    * shuffle on user_id, O(funnel events) state — same cost as the loose
    * funnel, stricter semantics.
    */
  private def fnFunnelStrict(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t1"), col("event_id"))
    val win = expr("INTERVAL 24 HOURS")
    Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .select(col("user_id"), col("event_type").as("e1"), col("ts").as("t1"),
        col("event_id"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .groupBy(col("user_id"))
      .agg(max(
        when(col("e1") === "signup" && col("e2") === "view" &&
          col("e3") === "purchase" && col("t3") <= col("t1") + win, 3)
          .when(col("e1") === "signup" && col("e2") === "view" &&
            col("t2") <= col("t1") + win, 2)
          .when(col("e1") === "signup", 1)
          .otherwise(0)).as("strict_depth"))
      .orderBy(col("user_id"))
  }

  /** Behavior-journey regex (how `sequenceMatch` patterns get implemented
    * when the chain grammar outgrows fixed slots): each user's timeline
    * string-encodes to its event-type initials in time order, and the
    * journey string is probed with regexes — full funnel match
    * 's.*v.*p', direct view→purchase transitions counted via
    * regexp_replace. One ordered aggregation per user; the regex scan is
    * map-side over O(users) strings, never over the event log.
    */
  private def fnJourneyRegex(s: SparkSession, dir: String): DataFrame =
    journeyStrings(s, dir)
      .select(col("user_id"), length(col("journey")).as("n_events"),
        col("journey").rlike("s.*v.*p").as("has_funnel_path"),
        ((length(col("journey")) -
          length(regexp_replace(col("journey"), "vp", ""))) / 2)
          .cast("long").as("n_direct_vp"))
      .orderBy(col("user_id"))

  /** Markov transition matrix over the event stream: P(next | current)
    * from consecutive-event counts per user timeline — the chain view
    * that seq_next_node (single-step, signup-anchored) generalizes to.
    * One lead() pass clustered on user_id, one partial-count shuffle on
    * the 5×5 transition key; probabilities are exact-count ratios in one
    * double op order, rounded at the edge.
    */
  private def seqTransitionMatrix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(byTime))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val margin = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(broadcast(margin), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        // UNROUNDED quotient of exact integer counts: both engines
        // divide identical operands (bit-identical IEEE); the 6dp edge
        // round was the class-3 midpoint hazard
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** ClickHouse `sequenceNextNode` (forward, head-anchored): what does a
    * user do RIGHT AFTER their first signup? One ordered-window pass
    * computes each event's successor; the first signup per user is
    * selected by row_number over the same clustering — no self-join on
    * the event log. Null successor = signup was the user's last event.
    *
    * Scale notes: both window passes share one shuffle on user_id; the
    * output is O(users). This is the navigation primitive behind
    * next-action product analytics at event-log scale.
    */
  private def seqNextNode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("next_et", lead(col("event_type"), 1).over(byTime))
      .filter(col("event_type") === "signup")
      .withColumn("rn", row_number().over(byTime))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("next_et").as("next_after_signup"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse `boundingRatio` — the slope between a series' first and
    * last points: (v_last − v_first) / (t_last − t_first) per user over
    * purchase values. Endpoints are exact (window row_number on the
    * unique (ts, event_id) order, integer epoch seconds); only the final
    * division is double, identical on both engines, rounded at the edge.
    *
    * Scale notes: endpoints via one window pass clustered on user_id —
    * at scale this is a min_by/max_by partial agg (no full sort), the
    * same two-sided argMin/argMax shape as ts_downsample.
    */
  private def aggBoundingRatio(s: SparkSession, dir: String): DataFrame = {
    val key = struct(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        min_by(col("value"), key).as("v_first"),
        max_by(col("value"), key).as("v_last"),
        min(unix_micros(col("ts"))).as("t_first"),
        max(unix_micros(col("ts"))).as("t_last"))
      .filter(col("t_last") > col("t_first"))
      .select(col("user_id"), col("n"),
        // UNROUNDED quotient: both engines run the identical IEEE chain
        // on identical operands — bit-identical including the sign of
        // zero, so the old 6dp edge round (class-3 midpoint hazard) and
        // its +0.0 signed-zero patch are both unnecessary
        ((col("v_last") - col("v_first"))
          / ((col("t_last") - col("t_first")).cast("double") / 1000000.0))
          .as("slope"))
      .orderBy(col("user_id"))
  }

  /** Batch sessionization (the offline twin of `stream_session`): a new
    * session starts after a >30 min silence. Timestamp comparison stays in
    * the timestamp domain (no epoch doubles) for cross-engine exactness.
    * Scale: two window passes + one agg, all clustered on user_id — one
    * shuffle total, no self-join on the event log.
    */
  private def sessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTime))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
    flagged
      .withColumn("session_idx",
        sum(col("new_sess")).over(byTime.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** ClickHouse `nonNegativeDerivative(value, ts)` window function: the
    * per-second rate of change of a gauge between consecutive samples,
    * clamped at zero (counter resets read as 0 rate, not a negative
    * spike) — the metric shape Prometheus `rate()` serves. First sample
    * per series and zero-time deltas yield NULL.
    *
    * Scale notes: one lag window per user partition — identical shuffle
    * profile to sessionize_batch (single hash-partition on the series
    * key, no self-join); the division and clamp are whole-stage-codegen
    * projections. At 100 TB the window rides whatever clustering the
    * event log already has on (user_id, ts).
    */
  private def winNonnegDerivative(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("pv", lag(col("value"), 1).over(w))
      .withColumn("pt", lag(col("ts"), 1).over(w))
      .withColumn("dt",
        (unix_micros(col("ts")) - unix_micros(col("pt"))).cast("double") / 1e6)
      .select(col("user_id"), col("event_id"),
        round(when(col("dt") > 0,
          greatest(lit(0.0), (col("value") - col("pv")) / col("dt"))), 6)
          .as("rate"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** ClickHouse `exponentialTimeDecayedAvg(τ=3600s)` evaluated at each
    * series' last sample: weight every purchase by exp(-(T-tᵢ)/τ) where
    * T = the user's latest purchase time, and report the decayed sum,
    * decayed weight mass, and their quotient (the decayed average) —
    * the recency-weighted engagement score a freshness-aware ranking
    * pipeline keeps per entity.
    *
    * Determinism: each weighted term is a double rounded once through
    * DECIMAL(30,6) (Det.dsum — order-independent, cross-engine-stable
    * per Core.scala's no-tie argument); the average is the UNROUNDED
    * IEEE quotient of two such exact values, identical bit-for-bit on
    * both engines, so no rounded-division midpoint risk (the
    * text_lm_bigram lesson).
    *
    * Scale notes: T comes from a max-window over the same user_id
    * partitioning the final groupBy uses — Catalyst runs both on ONE
    * shuffle; per-row work is an exp() in codegen. No join, no collect.
    */
  private def tsDecayedAvg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
    val weighted = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("t_last", max(col("ts")).over(byUser))
      .withColumn("wgt",
        exp((unix_micros(col("ts")) - unix_micros(col("t_last")))
          .cast("double") / 1e6 / 3600d))
    weighted
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        Det.dsum(col("value") * col("wgt")).as("decayed_sum"),
        Det.dsum(col("wgt")).as("decayed_weight"))
      .select(col("user_id"), col("n_purchases"), col("decayed_sum"),
        col("decayed_weight"),
        (col("decayed_sum") / col("decayed_weight")).as("decayed_avg"))
      .orderBy(col("user_id"))
  }
}
