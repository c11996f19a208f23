package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.3 Projections / filters / predicates.
  *
  * All predicates here are Catalyst-pushable: the specs assert they reach
  * the parquet scan as PushedFilters, so at 100 TB the row groups whose
  * min/max exclude the predicate are never read.
  */
object Projections {

  private def projectBasic(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
        (col("l_quantity") * col("l_extendedprice")).as("gross"),
      )
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
      // order by every output column for a total, cross-engine-stable order.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price"),
        col("gross"))
      .limit(2000)

  private def filterPred(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_returnflag") === "R" &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_linestatus").isin("F", "O") &&
          (col("l_quantity") < 10 || col("l_quantity") > 40))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_discount"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_discount"),
        col("l_quantity"))

  /** Null-safe predicate semantics over a synthesized nullable column
    * (fixtures are null-free, so nulls are injected via NULLIF).
    */
  private def filterNull(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.orders(s, dir)
      .select(nullif(col("o_orderstatus"), lit("P")).as("st"))
    t.agg(
      count(lit(1)).as("n"),
      count(col("st")).as("n_nonnull"),
      sum(when(col("st").isNull, 1).otherwise(0)).as("n_null"),
      sum(when(col("st") <=> lit(null), 1).otherwise(0)).as("n_nullsafe"),
      sum(when(col("st") <=> lit("F"), 1).otherwise(0)).as("n_f"),
    )
  }

  /** SQL-TEXT API parity (TPC-H Q6 shape): the exact same engine surface
    * through `spark.sql(...)` instead of the DataFrame DSL — users who
    * live in SQL get the same Catalyst plan, the same parquet pushdown,
    * and the same decimal-exact Det summation. Views are registered
    * per-table over the same scans the DSL keys use, so SQL text and
    * DataFrame code are interchangeable entry points, not parallel
    * stacks.
    *
    * Scale notes: identical plan to the DSL spelling — filters reach
    * the scan as PushedFilters (same assertion family as filter_pred);
    * one partial-agg to a scalar.
    */
  private def sqlQ6Revenue(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    // Det.oSum IS the one definition point of the cross-engine decimal
    // summation spelling — hand-inlining it here risked silent drift
    s.sql(s"""SELECT ${graft.Det.oSum("l_extendedprice * l_discount")}
                      AS revenue,
                    COUNT(*) AS n_rows
             FROM v_lineitem
             WHERE l_shipdate >= TIMESTAMP '1995-01-01'
               AND l_shipdate <  TIMESTAMP '1996-01-01'
               AND l_discount BETWEEN 0.02 AND 0.04
               AND l_quantity < 24""")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sql_q6_revenue", sqlQ6Revenue,
      Some(s"""SELECT ${graft.Det.oSum("l_extendedprice * l_discount")}
                  AS revenue,
                COUNT(*) AS n_rows
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                AND l_shipdate <  TIMESTAMP '1996-01-01'
                AND l_discount BETWEEN 0.02 AND 0.04
                AND l_quantity < 24""")),
    QueryDef("project_basic", projectBasic,
      Some("""SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price,
               l_quantity * l_extendedprice AS gross
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, net_price, gross
              LIMIT 2000""")),
    QueryDef("filter_pred", filterPred,
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_discount, l_quantity
              FROM lineitem
              WHERE l_returnflag = 'R' AND l_discount BETWEEN 0.05 AND 0.07
                AND l_linestatus IN ('F','O')
                AND (l_quantity < 10 OR l_quantity > 40)
              ORDER BY l_orderkey, l_linenumber, l_discount, l_quantity""")),
    QueryDef("filter_null", filterNull,
      Some("""WITH t AS (SELECT NULLIF(o_orderstatus,'P') AS st FROM orders)
              SELECT COUNT(*) AS n, COUNT(st) AS n_nonnull,
               CAST(SUM(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe,
               CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
              FROM t""")),
  )
}
