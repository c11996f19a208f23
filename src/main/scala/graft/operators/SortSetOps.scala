package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.7 Sorts / limits / top-k + §2.8 Set operations.
  *
  * Scale notes: `limit_topk` compiles to TakeOrderedAndProjectExec —
  * per-partition top-k then a k-row merge on the driver, never a global
  * sort. `topk_per_group` is the ClickHouse `LIMIT k BY g` shape: one
  * shuffle on the group key, per-group sort, early row_number cutoff.
  */
object SortSetOps {

  private def sortGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  private def limitTopk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** The ranked-orders scaffold shared by topk_per_group's window twin
    * and the OFFSET variant — one Window spec, select list, and
    * presentation order, parameterized only by the rank predicate (the
    * topKPerGroupOf rule applied to the window pair).
    */
  private def rankedOrders(s: SparkSession, dir: String,
      keep: Column): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(keep)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** ClickHouse `LIMIT n BY k OFFSET m` — the offset variant of
    * LIMIT-k-BY-group: skip the first m ranked rows per group, keep the
    * next n (here m=2, n=3 → ranks 3..5). Same single-shuffle window
    * shape as topk_per_group; the rank predicate is a closed interval so
    * the window cutoff still short-circuits per group.
    *
    * Scale notes: identical plan to topk_per_group — one shuffle on the
    * group key, per-group sort, row_number filter m+1..m+n; the offset
    * adds nothing to shuffle volume.
    */
  private def topkPerGroupOffset(s: SparkSession, dir: String): DataFrame =
    rankedOrders(s, dir, col("rn") >= 3 && col("rn") <= 5)

  /** The same LIMIT-k-BY-group semantics on the custom physical operator
    * ([[graft.plans.TopKPerGroupExec]]): partial bounded-heap top-k
    * before the shuffle, final merge after — the shuffle carries ≤ k
    * rows per (group, map task) instead of every row. Same oracle
    * associates it with the window formulation above; PlanShapeSpec
    * asserts the partial node sits below the exchange.
    */
  private def topkPerGroupNative(s: SparkSession, dir: String): DataFrame =
    topKPerGroupOf(s,
      Tables.orders(s, dir).select(col("o_orderpriority"),
        col("o_orderkey"), col("o_totalprice")),
      k = 3, groups = Seq("o_orderpriority"),
      order = Seq("o_totalprice" -> true, "o_orderkey" -> false))
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey"))

  /** Shared scaffolding for keys built on the native bounded-heap
    * [[graft.plans.TopKPerGroup]] operator: install the strategy,
    * capture the analyzed child, resolve names to attributes (with a
    * NAMED error — a renamed column must not surface as a bare
    * NoSuchElementException), bridge the node back to a DataFrame.
    * `order` is (column, descending?) pairs.
    */
  private def topKPerGroupOf(s: SparkSession, base: DataFrame, k: Int,
      groups: Seq[String], order: Seq[(String, Boolean)]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    graft.plans.TopKPerGroupStrategy.install(s)
    val analyzed = base.queryExecution.analyzed
    def a(n: String) = analyzed.output.find(_.name == n).getOrElse(
      sys.error(s"topKPerGroupOf: no column '$n' in " +
        analyzed.output.map(_.name).mkString("[", ",", "]")))
    val node = graft.plans.TopKPerGroup(k, groups.map(a),
      order.map { case (n, desc) =>
        SortOrder(a(n), if (desc) Descending else Ascending) }, analyzed)
    org.apache.spark.sql.graft.Bridge.ofRows(s, node)
  }

  /** ClickHouse `groupArrayLast(N)` — the last N values per group. CH
    * tracks insertion order; a distributed engine has none, so the
    * "last" axis is the explicit (o_orderdate, o_orderkey) event order
    * (the join_any_left determinism discipline). Built ON the native
    * bounded-heap TopKPerGroup operator: per-partition heaps keep ≤N
    * rows each BEFORE the shuffle, so the three hot status groups
    * never receive the full table (the window-rank formulation would
    * funnel every row through 3 reducers). The kept rows re-assemble
    * ascending into the canonical comma-joined string (array-edge
    * rule), 2dp-decimal-formatted on both engines.
    */
  private def aggGroupArrayLast(s: SparkSession, dir: String): DataFrame = {
    topKPerGroupOf(s,
      Tables.orders(s, dir).select(col("o_orderstatus"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice")),
      k = 5, groups = Seq("o_orderstatus"),
      order = Seq("o_orderdate" -> true, "o_orderkey" -> true))
      .groupBy(col("o_orderstatus"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("o_orderdate"),
            col("o_orderkey"), col("o_totalprice")))),
          x => x.getField("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(20, 2))
            .cast("string")), ",").as("last5"),
        count(lit(1)).as("n_kept"))
      .orderBy(col("o_orderstatus"))
  }

  private def setUnion(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.filter(col("value") > 150).select(col("event_type"))
      .unionByName(e.filter(col("user_id") % 2 === 0).select(col("event_type")))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  private def setIntersect(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.filter(col("event_type") === "click").select(col("user_id"))
      .intersect(e.filter(col("event_type") === "purchase").select(col("user_id")))
      .orderBy(col("user_id"))
  }

  /** Day-granular so the difference is non-trivial at fixture user
    * cardinality (plain user_id EXCEPT is empty).
    */
  private def setExcept(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def slice(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d")).distinct()
    slice("view").except(slice("error")).orderBy(col("user_id"), col("d"))
  }

  private def dedupDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"))
      .distinct()
      .orderBy(col("user_id"), col("event_type"))

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sort_global", sortGlobal,
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey""")),
    QueryDef("limit_topk", limitTopk,
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),
    QueryDef("topk_per_group", topkPerGroup,
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) t
              WHERE rn <= 3 ORDER BY o_orderpriority, rn""")),
    QueryDef("topk_per_group_offset", topkPerGroupOffset,
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) t
              WHERE rn BETWEEN 3 AND 5 ORDER BY o_orderpriority, rn""")),
    QueryDef("agg_group_array_last", aggGroupArrayLast,
      Some("""WITH r AS (SELECT o_orderstatus, o_orderdate, o_orderkey,
                 o_totalprice,
                 row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                 FROM orders)
              SELECT o_orderstatus,
                array_to_string(list(
                  CAST(CAST(o_totalprice AS DECIMAL(20,2)) AS VARCHAR)
                  ORDER BY o_orderdate, o_orderkey), ',') AS last5,
                COUNT(*) AS n_kept
              FROM r WHERE rn <= 5
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),
    QueryDef("topk_per_group_native", topkPerGroupNative,
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) t
              WHERE rn <= 3
              ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""")),
    QueryDef("set_union", setUnion,
      Some("""SELECT event_type, COUNT(*) AS n FROM (
                SELECT event_type FROM events WHERE value > 150
                UNION ALL
                SELECT event_type FROM events WHERE user_id % 2 = 0) u
              GROUP BY event_type ORDER BY event_type""")),
    QueryDef("set_intersect", setIntersect,
      Some("""SELECT user_id FROM events WHERE event_type = 'click'
              INTERSECT
              SELECT user_id FROM events WHERE event_type = 'purchase'
              ORDER BY user_id""")),
    QueryDef("set_except", setExcept,
      Some("""SELECT DISTINCT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d
              FROM events WHERE event_type = 'view'
              EXCEPT
              SELECT DISTINCT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
              FROM events WHERE event_type = 'error'
              ORDER BY user_id, d""")),
    QueryDef("dedup_distinct", dedupDistinct,
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY user_id, event_type""")),
  )
}
