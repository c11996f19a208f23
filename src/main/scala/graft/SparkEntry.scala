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

  /** Module enumeration — THE one list `defs` and Inventory's §2.14
    * generator both consume (previously twinned; a new module added to
    * one but not the other shipped a silently incomplete inventory).
    * Lazy: the registry is static, so build each module's QueryDef seq
    * once per JVM instead of on every `queries`/`oracleSql` call.
    */
  lazy val modules: Seq[(String, Seq[QueryDef])] = Seq(
    "operators/Scans" -> Scans.defs,
    "operators/Projections" -> Projections.defs,
    "operators/Joins" -> Joins.defs,
    "operators/SortSetOps" -> SortSetOps.defs,
    "operators/Aggregates" -> Aggregates.defs,
    "operators/Windows" -> Windows.defs,
    "operators/Fns" -> Fns.defs,
    "operators/Cdc" -> Cdc.defs,
    "streaming/StreamOps" -> StreamOps.defs,
    "operators/LlmText" -> LlmText.defs,
    "operators/LlmVector" -> LlmVector.defs,
    "operators/DedupGraph" -> DedupGraph.defs,
    "operators/Multimodal" -> Multimodal.defs,
    "operators/UdfOps" -> UdfOps.defs,
    "operators/EventAnalytics" -> EventAnalytics.defs,
    "operators/Stats" -> Stats.defs,
    "operators/MvOps" -> MvOps.defs,
    "operators/SqlApi" -> SqlApi.defs,
  )

  /** Every implemented operator from SURVEY.md §2, one QueryDef each. */
  lazy val defs: Seq[QueryDef] = {
    val ds = modules.flatMap(_._2)
    // duplicate keys would COLLAPSE silently in the toMap below — and
    // could pair one module's fn with ANOTHER module's oracle (queries
    // keeps the last def, oracleSql the last def WITH an oracle): the
    // gate would then compare module B's output against module A's SQL
    val dup = ds.groupBy(_.key).collect { case (k, vs) if vs.size > 1 => k }
    require(dup.isEmpty, s"duplicate QueryDef keys: ${dup.toSeq.sorted}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.key -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.key -> _)).toMap
}
