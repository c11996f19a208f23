package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.streaming.StreamOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operators register here as [[QueryDef]]s; `queries` and `oracleSql`
  * are derived views so a key can never exist in one map with a
  * mismatched twin in the other.
  */
object SparkEntry {

  /** Every implemented operator from SURVEY.md §2, one QueryDef each. */
  def defs: Seq[QueryDef] =
    Scans.defs ++ Projections.defs ++ Joins.defs ++ SortSetOps.defs ++
      Aggregates.defs ++ Windows.defs ++ Fns.defs ++ Cdc.defs ++
      StreamOps.defs ++ LlmText.defs ++ LlmVector.defs ++ DedupGraph.defs ++
      Multimodal.defs ++ UdfOps.defs ++ EventAnalytics.defs ++ Stats.defs ++
      MvOps.defs ++ SqlApi.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.key -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.key -> _)).toMap
}
