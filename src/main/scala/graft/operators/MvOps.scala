package graft.operators

import graft.{Det, QueryDef, Tables}
import graft.plans.MvRouting
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Materialized-view routing demo (ClickHouse projections / aggregate MVs):
  * a per-(l_returnflag, l_linestatus) pre-aggregate over lineitem is
  * registered with [[MvRouting]], and `mv_route` then issues a plain
  * aggregate over the BASE table — the optimizer rule transparently
  * re-targets it at the MV (PlanShapeSpec asserts the scan reads the MV
  * path, the oracle asserts values are bit-exact vs. the base table).
  *
  * Scale notes: the MV holds |distinct (returnflag, linestatus)| rows
  * regardless of fact-table size — the routed query scans O(groups)
  * instead of O(rows). Partial sums are decimal (order-independent,
  * exactly mergeable), so subset-grouping re-aggregation is exact; this
  * is the AggregatingMergeTree contract.
  */
object MvOps {

  private def mvPath(dir: String): String = {
    val sf = new java.io.File(dir).getName
    s"${sys.props("java.io.tmpdir")}/graft_mv/lineitem_rfls_$sf"
  }

  /** Stage + register the MV (idempotent per sfDir; deterministic content). */
  private[graft] def ensureMv(s: SparkSession, dir: String): Unit = {
    val path = mvPath(dir)
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(30, 6))).as("sum_qty_state"),
          sum(col("l_extendedprice").cast(DecimalType(30, 6)))
            .as("sum_price_state"),
          count(lit(1)).as("n_rows"))
        .write.mode("overwrite").parquet(path)
    MvRouting.register(MvRouting.MvDef(
      basePath = s"$dir/lineitem.parquet", mvPath = path,
      groupCols = Set("l_returnflag", "l_linestatus"),
      sumMap = Map("l_quantity" -> "sum_qty_state",
        "l_extendedprice" -> "sum_price_state"),
      countCol = "n_rows"))
    MvRouting.enable(s)
  }

  /** A plain base-table aggregate on a grouping SUBSET of the MV — the
    * rule must route it to the MV and re-aggregate the decimal partials.
    */
  private def mvRoute(s: SparkSession, dir: String): DataFrame = {
    ensureMv(s, dir)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("mv_route", mvRoute,
      Some(s"""SELECT l_returnflag, ${Det.oSum("l_quantity")} AS sum_qty,
               ${Det.oSum("l_extendedprice")} AS sum_price, COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
  )
}
