package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.5 Aggregations — ClickHouse's signature aggregate surface (argMax,
  * uniq, quantile, countIf, groupArray) + standard SQL grouped aggregation,
  * expressed as codegen'd Spark built-ins (HashAggregateExec partial→final;
  * no UDFs on the hot path).
  *
  * Scale notes (100 TB posture): every groupBy here aggregates map-side
  * (partial) before the shuffle, so shuffle volume is O(groups), not
  * O(rows). Group-key cardinality is bounded (flags, priorities, nations),
  * so the final agg is never skewed.
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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("agg_hash", flagship, Some(flagshipOracle)),
  )
}
