package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2.6 Window functions — rank/ntile/lag/lead/running/moving/first-last.
  *
  * Every window ORDER BY ends in a unique key: rank ties are fine (same
  * rank both engines) but row_number/ntile/frames are positional, so the
  * order must be total or results are nondeterministic across engines —
  * and across Spark task retries, which matters more at 100 TB than here.
  * Running/moving sums go through decimal inside the frame (exact,
  * order-independent) and cast to double at the edge.
  */
object Windows {

  private def winRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** Global ntile WITHOUT the unpartitioned-Window scale killer (a bare
    * `ntile(k) OVER (ORDER BY ...)` funnels every row through ONE task).
    * Scale-safe formulation, identical output to SQL ntile at any size:
    *   1. range-repartition on the sort key (partition i holds keys < j>i)
    *      and sort WITHIN partitions — local row numbers then read
    *      straight off monotonically_increasing_id (pid in the high 31
    *      bits, the in-partition index in the low 33), so NO second
    *      exchange: the old pid-window formulation re-shuffled the whole
    *      table by hash(pid) right after the range exchange;
    *   2. localCheckpoint PINS the one sampled range partitioning —
    *      three consumers (rows, counts, total) otherwise each re-run
    *      RangePartitioner sampling, and only ReuseExchange unifying
    *      them kept offsets consistent with local row numbers
    *      (correctness by optimizer coincidence);
    *   3. per-partition counts (O(numPartitions) metadata) → broadcast
    *      cumulative offsets via a 32×32 broadcast NLJ;
    *   4. global rn = offset + local rn; tile assignment is pure
    *      arithmetic on (rn, n): SQL ntile gives the first n%k tiles
    *      ⌈n/k⌉ rows and the rest ⌊n/k⌋.
    * PlanShapeSpec asserts no WindowExec anywhere in the plan.
    */
  private def winNtile(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    // partition count from the SESSION's shuffle parallelism, not a
    // hardcoded 32: the offsets algebra is partition-count agnostic
    // (range partitioning is globally ordered, so global rn is
    // identical at any P), and a fixed 32 would funnel a 100 TB sort
    // through 32 tasks — the very bottleneck this formulation removes.
    // The O(P²) broadcast NLJ below stays trivial to P ~ 10⁴.
    val nParts = math.max(1, s.conf.get("spark.sql.shuffle.partitions",
      "32").toInt)
    val local = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"))
      .repartitionByRange(nParts, col("c_acctbal").desc, col("c_custkey"))
      .sortWithinPartitions(col("c_acctbal").desc, col("c_custkey"))
      .withColumn("mid", monotonically_increasing_id())
      .withColumn("pid", shiftright(col("mid"), 33).cast("int"))
      .withColumn("lrn",
        col("mid").bitwiseAND(lit((1L << 33) - 1)) + 1)
      .drop("mid")
      .localCheckpoint()
    // O(P) rows, localCheckpointed: THREE consumers below (both NLJ
    // sides + total) would otherwise each re-embed the counts aggregate
    // subtree — a full scan+shuffle of the checkpointed table per copy
    // if ReuseExchange ever fails to unify them (AQE stage boundaries)
    val counts = local.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val offs = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    local.join(broadcast(offs), "pid")
      .crossJoin(broadcast(total))
      .withColumn("rn", col("off") + col("lrn"))
      .withColumn("q", expr(s"n_total div $k"))
      .withColumn("r", col("n_total") % k)
      .withColumn("decile",
        when(col("rn") <= col("r") * (col("q") + 1),
          expr("(rn - 1) div (q + 1) + 1"))
          .otherwise(expr("r + (rn - r * (q + 1) - 1) div q + 1"))
          .cast("int"))
      .select(col("c_custkey"), col("c_acctbal"), col("decile"))
      .orderBy(col("c_custkey"))
  }

  private def winLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .as("gap_days"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  private def winRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(30, 6))).over(w)
          .cast("double").as("running_spend"),
        count(lit(1)).over(w).as("running_orders"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Running DISTINCT count (ClickHouse `uniqState` merged over an
    * ORDER BY window — e.g. "how many distinct event types has this user
    * touched so far"). COUNT(DISTINCT) isn't a window function in either
    * engine, so it runs as the first-seen-flag decomposition: row_number
    * over (user, event_type) marks each type's first occurrence, and a
    * running SUM of the flag over the user's timeline gives the
    * cumulative distinct count. The explicit repartition on user_id
    * makes BOTH window passes ride ONE exchange: hashpartitioning
    * (user_id) satisfies the (user_id, event_type) window's clustered
    * distribution, whereas letting the first window shuffle on
    * (user_id, event_type) would force a second full exchange for the
    * (user_id)-only timeline window.
    */
  private def winRunningDistinct(s: SparkSession, dir: String): DataFrame = {
    val firstSeen = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val timeline = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .repartition(col("user_id"))
      .withColumn("first_seen",
        when(row_number().over(firstSeen) === 1, 1).otherwise(0))
      .withColumn("n_distinct_types", sum(col("first_seen")).over(timeline))
      .select(col("user_id"), col("event_id"), col("n_distinct_types"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** 7-row moving average over the daily revenue series (one row per day,
    * so rows-frame == 7-day window).
    */
  private def winMoving(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(sum(col("value").cast(DecimalType(30, 6))).as("rev"))
    val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
    daily
      .select(col("d"), col("rev").cast("double").as("rev"),
        (sum(col("rev")).over(w).cast("double") / count(lit(1)).over(w))
          .as("ma7"))
      .orderBy(col("d"))
  }

  private def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"),
        first(col("c_name")).over(w).as("richest"),
        last(col("c_name")).over(w).as("poorest"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  /** IGNORE NULLS window semantics (ClickHouse `lagInFrame(x, 1) IGNORE
    * NULLS` / `last_value IGNORE NULLS` — the forward-/backward-fill
    * primitive every sparse-observation timeline needs): per customer
    * order timeline, the finalized price (status 'F', else null) is
    * forward-filled, backward-filled, and lagged to the previous
    * non-null observation. Pure pass-through of stored doubles — no
    * arithmetic, so no rounding is needed for the cross-engine hash.
    *
    * Scale notes: one window shuffle on the partition key; ignore-nulls
    * frames evaluate streaming within the frame (no per-row rescan of
    * the partition) on both engines.
    */
  private def winIgnoreNulls(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("xp",
        when(col("o_orderstatus") === "F", col("o_totalprice")))
      .select(col("o_orderkey"), col("xp"),
        last(col("xp"), ignoreNulls = true)
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("ffill"),
        first(col("xp"), ignoreNulls = true)
          .over(ord.rowsBetween(Window.currentRow, Window.unboundedFollowing))
          .as("bfill"),
        lag(col("xp"), 1, null, ignoreNulls = true).over(ord)
          .as("prev_final"))
      .orderBy(col("o_orderkey"))
  }

  /** nth_value over the full-partition frame: the 2nd- and 3rd-richest
    * customer name per nation alongside each row (null when the nation
    * has fewer members) — completes the positional window family.
    */
  private def winNth(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"),
        nth_value(col("c_name"), 2).over(w).as("second_richest"),
        nth_value(col("c_name"), 3).over(w).as("third_richest"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  /** RANGE frame (vs the ROWS frames above): per customer, spend over
    * orders whose orderdate lies within the 30 VALUE-days preceding the
    * current row — peers by value, not position.
    */
  private def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val dayNo = datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(dayNo)
      .rangeBetween(-30, 0)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), dayNo.as("day_no"),
        sum(col("o_totalprice").cast(DecimalType(30, 6))).over(w)
          .cast("double").as("spend_30d"),
        count(lit(1)).over(w).as("orders_30d"))
      .orderBy(col("o_custkey"), col("day_no"), col("o_orderkey"))
  }

  /** Distribution ranks: percent_rank = (rank-1)/(n-1) and cume_dist =
    * peers≤current/n. Pure integer ratios evaluated in double — bitwise
    * identical across engines, so no rounding needed.
    */
  private def winDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
      .orderBy(col("c_custkey"))
  }

  /** Rolling z-score anomaly signal: each order scored against the
    * customer's OWN trailing history (10 preceding orders, current row
    * excluded — the standard self-exclusion that keeps an outlier from
    * masking itself). Mean/variance come from exact integer-cents window sums;
    * degenerate history (n < 5 or zero variance) yields null instead of
    * NaN. One window clustering on the customer key carries all three
    * running moments.
    */
  private def winZscore(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-10, -1)
    // class-8 discipline: moments in EXACT INTEGER CENTS (2dp-price
    // fixture invariant — the named PlanShapeSpec "o_totalprice is
    // exact cents" test asserts it at every staged SF) and ONE
    // closed-form double
    // chain per row. The previous formulation cast the COMPUTED double
    // p² to decimal(30,6) — the class-16 split (Spark shortest-repr vs
    // DuckDB exact-binary; measured: 8300/15000 fixture rows differed,
    // absorbed only by rounding) — and then rounded a division at the
    // comparison edge (class 3). Identical integers through identical
    // IEEE ops are bit-equal UNROUNDED; z is scale-invariant, so cents
    // need no /100 anywhere. Bounds: pc ≤ ~6e7, pc² ≤ 3.6e15, 10-row
    // frame sums ≤ 3.6e16 — long-safe.
    val n = col("n_hist").cast("double")
    val m = col("sx").cast("double") / n
    val v = col("sxx").cast("double") / n - m * m
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        (col("o_totalprice").cast(DecimalType(30, 2)) * 100)
          .cast("long").as("pc"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("pc"),
        count(lit(1)).over(w).as("n_hist"),
        sum(col("pc")).over(w).as("sx"),
        sum(col("pc") * col("pc")).over(w).as("sxx"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("n_hist"),
        when(col("n_hist") >= 5 && v > 0,
          (col("pc").cast("double") - m) / sqrt(v)).as("z"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** True time-interval frame over IRREGULAR event times: each purchase
    * sees the trailing one hour of the same user's purchases (RANGE on
    * the epoch-microsecond ordering key, inclusive at both ends — peers
    * at the exact same µs are frame-mates in both engines). This is the
    * shape `win_running`'s daily integer frame can't express: the frame
    * boundary falls mid-hour wherever the events do. Spark truncates
    * parquet ns→µs, so the frame key is `unix_micros` on both sides.
    * Sums go decimal-exact inside the frame (Det pattern), double at
    * the edge.
    *
    * Scale notes: one shuffle on user_id, then a per-partition ordered
    * scan — the frame is a sliding two-pointer over each user's events,
    * O(events) total. No spine, no self-join: the 100 TB formulation.
    */
  private def winRangeInterval(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"),
        col("value").cast(DecimalType(30, 6)).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0)
    e.select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("v")).over(w).cast("double").as("rev_1h"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Ratio-to-report ("percent of total") — each order's share of its
    * status-group revenue and of the grand total. The GROUP share rides
    * an unbounded window over the partition key (one shuffle, exact
    * decimal sum); the GLOBAL share deliberately does NOT use an
    * empty-partition window — `OVER ()` funnels 100 TB through one
    * reducer — but a broadcast of the 1-row total aggregate instead.
    */
  private def winShare(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
    val tot = Tables.orders(s, dir)
      .agg(Det.dsum(col("o_totalprice")).as("gt"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        sum(col("o_totalprice").cast(DecimalType(30, 6))).over(w)
          .cast("double").as("st"))
      .crossJoin(broadcast(tot))
      // shares ship as the UNROUNDED IEEE quotient: both engines divide
      // identical doubles (exact decimal sums cast once), so the raw
      // quotient is bit-equal — rounding a division at the edge is the
      // cross-engine midpoint-split class Core.scala documents
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        (col("o_totalprice") / col("st")).as("share_of_status"),
        (col("o_totalprice") / col("gt")).as("share_global"))
      .orderBy(col("o_orderkey"))
  }

  /** Clamped-at-zero running sum — ClickHouse `arrayCumSumNonNegative`
    * semantics as a WINDOW over the stream (the inventory/stock-level
    * recurrence s_i = max(0, s_{i−1} + δ_i)) — WITHOUT a sequential
    * fold: by the one-sided reflection identity
    *   s_i = p_i − min(0, min_{j≤i} p_j)      (p = plain prefix sum)
    * the recurrence becomes two stock windows over ONE shuffle, scaling
    * exactly like win_running instead of a per-group O(n) driver fold.
    * (Proof sketch: both sides satisfy the recurrence — if the running
    * min is hit at i, s_i = 0 = max(0, ·); otherwise the clamp was not
    * active and the difference advances by δ_i.)
    * Prefix and running-min stay in exact decimal; only the final
    * difference casts to double, so the engines agree bit-for-bit.
    *
    * δ: purchases add `value`, every other event drains it — a stock
    * that genuinely dips below zero and exercises the clamp.
    */
  private def winCumClamp(s: SparkSession, dir: String): DataFrame = {
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
      // cast BOTH exact decimals to double BEFORE subtracting: the
      // decimal difference would exceed precision 38 and the engines
      // promote overflow differently (observed: 1-ulp split at sf0.01);
      // identical doubles subtracted in IEEE agree everywhere
      .select(col("user_id"), col("event_id"),
        (col("p").cast("double") -
          least(lit(0).cast(DecimalType(30, 6)), min(col("p")).over(w))
            .cast("double")).as("stock"))
      .orderBy(col("user_id"), col("event_id"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("win_cum_clamp", winCumClamp,
      Some("""WITH p AS (SELECT user_id, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CAST(CASE WHEN event_type = 'purchase' THEN value
                   ELSE -value END AS DECIMAL(30,6)) AS delta
                 FROM events),
               c AS (SELECT user_id, event_id, us,
                 SUM(delta) OVER w AS pre
                 FROM p WINDOW w AS (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              SELECT user_id, event_id,
                CAST(pre AS DOUBLE) - CAST(LEAST(CAST(0 AS DECIMAL(30,6)),
                  MIN(pre) OVER w2) AS DOUBLE) AS stock
              FROM c WINDOW w2 AS (PARTITION BY user_id
                ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              ORDER BY user_id, event_id""")),
    // the grand-total subquery rides Det.oSum (ONE definition point of
    // the decimal-sum spelling); the window-sum spelling stays inline
    // because oSum emits an aggregate, not an OVER clause
    QueryDef("win_share", winShare,
      Some(s"""WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                  OVER (PARTITION BY o_orderstatus) AS DOUBLE) AS st,
                (SELECT ${Det.oSum("o_totalprice")} FROM orders) AS gt
                FROM orders)
              SELECT o_orderkey, o_orderstatus, o_totalprice,
                o_totalprice / st AS share_of_status,
                o_totalprice / gt AS share_global
              FROM t ORDER BY o_orderkey""")),
    QueryDef("win_range_interval", winRangeInterval,
      Some("""WITH p AS (SELECT user_id, event_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
                FROM events WHERE event_type = 'purchase')
              SELECT user_id, event_id,
                COUNT(*) OVER w AS n_1h,
                CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE)
                  AS rev_1h
              FROM p
              WINDOW w AS (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
              ORDER BY user_id, event_id""")),
    QueryDef("win_zscore", winZscore,
      // the oracle mirrors the Spark double chain OP FOR OP from the
      // same exact integer cents — unrounded IEEE quotients of
      // identical inputs are bit-identical (the win_share rule)
      Some("""WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
                 o_totalprice,
                 CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
                   AS pc FROM orders),
               h AS (SELECT o_custkey, o_orderkey, o_totalprice, pc,
                 COUNT(*) OVER w AS n_hist,
                 SUM(pc) OVER w AS sx,
                 SUM(pc * pc) OVER w AS sxx
                 FROM o
                 WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
              SELECT o_custkey, o_orderkey, o_totalprice, n_hist,
                CASE WHEN n_hist >= 5
                      AND CAST(sxx AS DOUBLE) / CAST(n_hist AS DOUBLE)
                        - (CAST(sx AS DOUBLE) / CAST(n_hist AS DOUBLE))
                        * (CAST(sx AS DOUBLE) / CAST(n_hist AS DOUBLE)) > 0
                     THEN (CAST(pc AS DOUBLE)
                         - CAST(sx AS DOUBLE) / CAST(n_hist AS DOUBLE))
                       / sqrt(CAST(sxx AS DOUBLE) / CAST(n_hist AS DOUBLE)
                         - (CAST(sx AS DOUBLE) / CAST(n_hist AS DOUBLE))
                         * (CAST(sx AS DOUBLE) / CAST(n_hist AS DOUBLE)))
                END AS z
              FROM h ORDER BY o_custkey, o_orderkey""")),
    QueryDef("win_dist", winDist,
      Some("""SELECT c_nationkey, c_custkey, c_acctbal,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cdist
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey
                ORDER BY c_acctbal, c_custkey)
              ORDER BY c_custkey""")),
    QueryDef("win_range_frame", winRangeFrame,
      Some("""SELECT o_custkey, o_orderkey,
                date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                  AS day_no,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE)
                  AS spend_30d,
                COUNT(*) OVER w AS orders_30d
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY date_diff('day', DATE '1990-01-01',
                                   CAST(o_orderdate AS DATE))
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
              ORDER BY o_custkey, day_no, o_orderkey""")),
    QueryDef("win_rank", winRank,
      Some("""SELECT * FROM (
                SELECT c_nationkey, c_custkey, c_acctbal,
                  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
                  row_number() OVER w AS rn
                FROM customer
                WINDOW w AS (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey)) t
              WHERE rn <= 5 ORDER BY c_nationkey, rn""")),
    QueryDef("win_ntile", winNtile,
      Some("""SELECT c_custkey, c_acctbal,
                ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
              FROM customer ORDER BY c_custkey""")),
    QueryDef("win_lag_lead", winLagLead,
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
                lag(o_orderkey, 1) OVER w AS prev_order,
                lead(o_orderkey, 1) OVER w AS next_order,
                date_diff('day',
                  CAST(lag(o_orderdate, 1) OVER w AS DATE),
                  CAST(o_orderdate AS DATE)) AS gap_days
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_custkey, o_orderdate, o_orderkey""")),
    QueryDef("win_running", winRunning,
      Some("""SELECT o_custkey, o_orderkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE)
                  AS running_spend,
                COUNT(*) OVER w AS running_orders
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              ORDER BY o_custkey, o_orderkey""")),
    QueryDef("win_running_distinct", winRunningDistinct,
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                CAST(ts AS TIMESTAMP) AS ts FROM events),
              f AS (SELECT user_id, event_id, ts,
                CASE WHEN row_number() OVER (
                  PARTITION BY user_id, event_type
                  ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
                FROM e)
              SELECT user_id, event_id,
                CAST(SUM(first_seen) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_distinct_types
              FROM f ORDER BY user_id, event_id""")),
    QueryDef("win_moving", winMoving,
      Some("""WITH daily AS (
                SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
                  SUM(CAST(value AS DECIMAL(30,6))) AS rev
                FROM events GROUP BY 1)
              SELECT d, CAST(rev AS DOUBLE) AS rev,
                (CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w) AS ma7
              FROM daily
              WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
              ORDER BY d""")),
    QueryDef("win_nth", winNth,
      Some("""SELECT c_nationkey, c_custkey,
                nth_value(c_name, 2) OVER w AS second_richest,
                nth_value(c_name, 3) OVER w AS third_richest
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC, c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY c_nationkey, c_custkey""")),
    QueryDef("win_ignore_nulls", winIgnoreNulls,
      Some("""WITH t AS (SELECT o_custkey, o_orderkey, o_orderdate,
                 CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS xp
                 FROM orders)
              SELECT o_orderkey, xp,
                last_value(xp IGNORE NULLS) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS ffill,
                first_value(xp IGNORE NULLS) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS bfill,
                lag(xp, 1 IGNORE NULLS) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS prev_final
              FROM t ORDER BY o_orderkey""")),
    QueryDef("win_first_last", winFirstLast,
      Some("""SELECT c_nationkey, c_custkey,
                first_value(c_name) OVER w AS richest,
                last_value(c_name) OVER w AS poorest
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC, c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY c_nationkey, c_custkey""")),
  )
}
