package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistics / CBO posture (SURVEY §4): ClickHouse sizes its hash tables
  * and join order from table statistics; Spark's equivalent is ANALYZE
  * TABLE + the cost-based optimizer. At 100 TB, syntax-order joins are a
  * liability — stats-driven join reorder picks the small build side and
  * the cheapest tree, and per-column NDV/min/max feed selectivity
  * estimates for filter pushup/pushdown decisions.
  */
object Stats {

  private val statStageLock = new Object

  /** External catalog tables over the fixture parquet, ANALYZEd with
    * table + all-column stats — once per (session, sfDir). O(1 scan) per
    * table, the amortized "background statistics" cost of the posture.
    */
  def ensureAnalyzed(s: SparkSession, dir: String): Map[String, String] = {
    val sf = new java.io.File(dir).getName.replace(".", "_")
    // the fixture fingerprint in the table name: the LOCATION is baked
    // at CREATE, so two sfDirs sharing a basename (or a testdata swap at
    // the same path) must resolve to different catalog tables
    val fp = graft.Scratch.fixtureFingerprint(dir)
    // path tag (the versionedRoot rule): without it the supersession
    // sweep below would key on basename alone and DROP the live stat
    // tables of a different sfDir sharing this one's sanitized basename
    val tag = graft.Scratch.pathTag(dir)
    val names = Seq("customer", "orders", "nation", "region")
      .map(t => t -> s"graft_stat_${t}_${sf}_${tag}_$fp").toMap
    // fp == "0" is fixtureFingerprint's listing-failure sentinel (the
    // driver may be mid-swap): proceeding would both register tables
    // under the sentinel name AND sweep every LIVE-fingerprint stat
    // table as "superseded" out from under concurrent readers — the
    // exact hazard ensureBucketed's guard documents. Fail loudly.
    require(fp != "0",
      s"fixture dir $dir is unlistable/mid-swap — refusing to (re)build stat tables")
    // ONE catalog enumeration for all four tables (computed lazily so
    // the steady-state path never pays it), and one JVM-wide lock (the
    // ensureBucketed discipline): two sessions racing the staging
    // branch would otherwise both sweep and both pay the full ANALYZE
    lazy val catalogNames = s.catalog.listTables().collect().map(_.name)
    Stats.statStageLock.synchronized {
    names.foreach { case (t, tn) =>
      if (!s.catalog.tableExists(tn)) {
        // drop SUPERSEDED-fingerprint twins, only on the staging branch
        // (the ensureBucketed discipline — twins can only exist when the
        // fingerprint changed, i.e. exactly when tableExists is false;
        // sweeping on every call would put a full catalog enumeration
        // inside the measured stats-key paths): a testdata swap
        // otherwise accumulates stale tables dangling at overwritten
        // locations for the JVM's lifetime
        // both prefixes: the tagged format's sweep, plus the pre-tag
        // legacy names (whose remainder is pure hex — a tagged name's
        // "tag_fp" tail never matches, so the legacy clause is safe)
        catalogNames
          .filter(n => graft.Scratch
            .isSupersededName(n, s"graft_stat_${t}_${sf}_${tag}_", tn) ||
            graft.Scratch
              .isSupersededName(n, s"graft_stat_${t}_${sf}_", tn))
          .foreach(n => s.sql(s"DROP TABLE IF EXISTS `$n`"))
        s.sql(s"CREATE TABLE IF NOT EXISTS $tn USING parquet " +
          s"LOCATION '$dir/$t.parquet'")
      }
      // guard on STATS PRESENCE read from the CATALOG METADATA, not
      // from optimizedPlan.stats: plan rowCount is only populated from
      // catalog stats when CBO is enabled, and callers enable CBO
      // AFTER this returns — the plan-based guard was always false in
      // a fresh session, re-running the full ANALYZE scan every call.
      // (Still a stats-presence guard, not table existence: a
      // once-failed ANALYZE self-heals on the next call.)
      val hasStats = s.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tn))
        .stats.exists(_.rowCount.isDefined)
      if (!hasStats)
        s.sql(s"ANALYZE TABLE $tn COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    }
    names
  }

  /** Multi-join written in a deliberately bad syntactic order; with stats
    * + CBO join reorder enabled, Catalyst rebuilds the tree by cost
    * (PlanShapeSpec asserts catalog row counts and column stats are
    * present and feeding the optimizer). CBO stays enabled for the
    * session — that IS the posture, and it is only active where stats
    * exist (plain parquet reads are unaffected).
    */
  private def statsCbo(s: SparkSession, dir: String): DataFrame = {
    val names = ensureAnalyzed(s, dir)
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.sql(s"""
      SELECT n_name, COUNT(*) AS n_orders,
             ${graft.Det.oSum("o_totalprice")}
               AS sum_price
      FROM ${names("orders")} o
      JOIN ${names("customer")} c ON o.o_custkey = c.c_custkey
      JOIN ${names("nation")} n ON c.c_nationkey = n.n_nationkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY n_name ORDER BY n_name""")
  }

  /** CBO JOIN REORDER made visible (VERDICT r7 "What's missing #2"): a
    * 4-table star chain written in the WORST syntactic order — the two
    * largest relations joined first, the 1-row filtered region last.
    * With column stats on every table and `cbo.joinReorder` on,
    * Catalyst's DP reorder rebuilds the tree bottom-up from the
    * CHEAPEST pair (region⋈nation after the r_name filter) — exactly
    * the decision that separates a viable 100 TB multi-dim star query
    * from a syntax-order disaster. PlanShapeSpec asserts the deepest
    * join of the optimized plan combines the two DIM tables, not the
    * syntactic fact⋈customer pair.
    */
  private def statsCboReorder(s: SparkSession, dir: String): DataFrame = {
    val names = ensureAnalyzed(s, dir)
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.sql(s"""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             ${graft.Det.oSum("o_totalprice")}
               AS sum_price
      FROM ${names("orders")} o
      JOIN ${names("customer")} c ON o.o_custkey = c.c_custkey
      JOIN ${names("nation")} n ON c.c_nationkey = n.n_nationkey
      JOIN ${names("region")} r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  /** ClickHouse `EXPLAIN ESTIMATE` — the optimizer's row estimates AS A
    * QUERY RESULT, checked against reality: for each ANALYZEd star
    * table, the catalog statistic the CBO plans with (rowCount from
    * `ANALYZE TABLE`) next to the actual scan count. ANALYZE row counts
    * are exact, so estimate == actual is oracled (est_matches = 1) —
    * the observability loop an operator uses to detect stale statistics
    * before they mis-order a 100 TB join (companion to
    * stats_cbo_reorder, which shows what the estimates DECIDE).
    *
    * Scale notes: estimates are O(1) catalog metadata; the actuals are
    * count-star scans (parquet footer counts — no row materialization).
    */
  private def metaExplainEstimate(s: SparkSession, dir: String): DataFrame = {
    val names = ensureAnalyzed(s, dir)
    // rowCount surfaces in plan Statistics only under CBO; without it
    // Spark propagates sizeInBytes alone and the estimate reads as None
    s.conf.set("spark.sql.cbo.enabled", "true")
    import s.implicits._
    names.toSeq.sortBy(_._1).map { case (t, tn) =>
      val est = s.table(tn).queryExecution.optimizedPlan.stats
        .rowCount.map(_.toLong).getOrElse(-1L)
      val actual = s.table(tn).count()
      (t, est, actual, if (est == actual) 1 else 0)
    }.toDF("table_name", "est_rows", "actual_rows", "est_matches")
      .orderBy(col("table_name"))
  }

  /** Pipeline health counters via the Observation API: metrics are
    * accumulated AS A SIDE EFFECT of the main pass (accumulator-backed,
    * no second scan) — how a production job reports rows-in/nulls/sums
    * without paying another aggregate over 100 TB. The observed values
    * are returned as the result row, so the DuckDB oracle verifies the
    * counters themselves.
    */
  private def observeMetrics(s: SparkSession, dir: String): DataFrame = {
    val obs = new org.apache.spark.sql.Observation("pipeline_health")
    val e = graft.Tables.events(s, dir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(when(col("props").isNull, 1)).as("n_null_props"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .cast("double").as("sum_value"))
    // main pass: count() drains the observed scan in one action —
    // CollectMetricsExec accumulates on rows flowing through regardless
    // of the action, so there is no reason to pay a parquet encode +
    // tmp-dir write per invocation (the previous drain)
    e.count()
    val m = obs.get
    import s.implicits._
    // explicit null handling: on an empty input the sum metric is SQL
    // NULL, and a primitive unbox would turn it into 0.0 while the
    // oracle's SUM stays NULL (class-6 divergence)
    val sumValue = Option(m("sum_value")).map(_.asInstanceOf[Double])
    Seq((m("n_rows").asInstanceOf[Long],
      m("n_null_props").asInstanceOf[Long],
      sumValue))
      .toDF("n_rows", "n_null_props", "sum_value")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("observe_metrics", observeMetrics,
      Some(s"""SELECT COUNT(*) AS n_rows,
               COUNT(CASE WHEN props IS NULL THEN 1 END) AS n_null_props,
               ${graft.Det.oSum("value")} AS sum_value
              FROM events""")),
    QueryDef("meta_explain_estimate", metaExplainEstimate,
      Some("""WITH t AS (
                SELECT 'customer' AS table_name,
                  (SELECT COUNT(*) FROM customer) AS n
                UNION ALL SELECT 'nation', (SELECT COUNT(*) FROM nation)
                UNION ALL SELECT 'orders', (SELECT COUNT(*) FROM orders)
                UNION ALL SELECT 'region', (SELECT COUNT(*) FROM region))
              SELECT table_name, n AS est_rows, n AS actual_rows,
                1 AS est_matches
              FROM t ORDER BY table_name""")),
    QueryDef("stats_cbo_reorder", statsCboReorder,
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
               ${graft.Det.oSum("o_totalprice")}
                 AS sum_price
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),
    QueryDef("stats_cbo", statsCbo,
      Some(s"""SELECT n_name, COUNT(*) AS n_orders,
               ${graft.Det.oSum("o_totalprice")}
                 AS sum_price
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              WHERE c_mktsegment = 'BUILDING'
              GROUP BY n_name ORDER BY n_name""")),
  )
}
