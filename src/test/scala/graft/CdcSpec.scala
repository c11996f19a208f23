package graft

import graft.operators.Cdc
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC fold laws: the MergeTree emulations must be insensitive to event
  * arrival order and idempotent under replay — the properties that make
  * the at-least-once Canal feed safe to load.
  */
class CdcSpec extends GraftSpec {

  test("cdc_type_map roundtrip is lossless vs the source table") {
    val roundtrip = SparkEntry.queries("cdc_type_map")(spark, sf)
    val source = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    assert(roundtrip.except(source).count() == 0)
    assert(source.except(roundtrip).count() == 0)
  }

  test("cdc_upsert_latest emits exactly one row per key (idempotent merge)") {
    import spark.implicits._
    val up = SparkEntry.queries("cdc_upsert_latest")(spark, sf).cache()
    assert(up.count() == up.select("o_orderkey").distinct().count())
    // replay the DOUBLED feed through the REAL fold (not a test-local
    // dedup): an at-least-once delivery must be absorbed by the
    // operator itself, row-for-row
    val feed = Cdc.ordersTyped(spark, sf)
    val replayed = Cdc.upsertLatestOf(feed.unionByName(feed))
      .as[(Long, Double, Long)].collect().toSet
    val once = up.as[(Long, Double, Long)].collect().toSet
    assert(replayed == once,
      s"replayed fold diverged: ${(replayed diff once).take(3)} / ${(once diff replayed).take(3)}")
    up.unpersist()
  }

  test("cdc_delete_fold drops exactly the deleted keys") {
    val folded = SparkEntry.queries("cdc_delete_fold")(spark, sf)
    val deleted = folded.filter(col("o_orderkey") % 7 === 0).count()
    assert(deleted == 0)
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 7 =!= 0).count()
    assert(folded.count() == expected)
  }

  test("delete fold is invariant under event reordering (real fold)") {
    import spark.implicits._
    // a synthetic typed envelope feed exercising insert→delete→reinsert,
    // insert→delete (dead), and insert→update, fed to the PRODUCT fold
    // (Cdc.deleteFoldOf) in three different arrival orders — the old
    // version of this test summed signs with its own groupBy, proving
    // only that Spark's sum is commutative
    val events = Seq(
      (1L, 10L, 10L, "INSERT", 100.0), (1L, 20L, 20L, "DELETE", 100.0),
      (1L, 30L, 30L, "INSERT", 120.0),
      (2L, 10L, 10L, "INSERT", 200.0), (2L, 20L, 20L, "DELETE", 200.0),
      (3L, 5L, 5L, "INSERT", 300.0), (3L, 8L, 8L, "UPDATE", 350.0))
    def typed(evs: Seq[(Long, Long, Long, String, Double)]) =
      evs.toDF("o_orderkey", "es", "ts", "type", "o_totalprice")
        .withColumn("old_img", when(col("type") === "UPDATE",
          map(lit("o_totalprice"), lit("300.0")))
          .otherwise(lit(null)).cast("map<string,string>"))
    def fold(evs: Seq[(Long, Long, Long, String, Double)]): Set[(Long, Double)] =
      Cdc.deleteFoldOf(typed(evs)).as[(Long, Double)].collect().toSet
    val results = Seq(events, events.reverse, events.sortBy(_._5))
      .map(fold)
    assert(results.distinct.size == 1, s"order-dependent fold: $results")
    // k1 reinserted at es=30 (120.0); k2 dead; k3 updated to 350.0
    assert(results.head == Set((1L, 120.0), (3L, 350.0)), results.head)
  }

  test("cdc_scd2 intervals chain correctly per key") {
    val scd = SparkEntry.queries("cdc_scd2")(spark, sf).cache()
    // exactly one current version per key — PER KEY, not in aggregate
    // (a count equality passes when one key has two currents and
    // another none)
    val current = scd.filter(col("is_current"))
    val multi = current.groupBy("o_orderkey").count()
      .filter(col("count") =!= 1).count()
    assert(multi == 0, s"$multi keys with !=1 current version")
    assert(current.select("o_orderkey").distinct().count() ==
      scd.select("o_orderkey").distinct().count(),
      "some key has no current version")
    // valid_from < valid_to for all closed intervals
    assert(scd.filter(col("valid_to").isNotNull &&
      col("valid_from") >= col("valid_to")).count() == 0)
    scd.unpersist()
  }

  test("ddl events carry the sql and never reach the DML path") {
    val ddl = SparkEntry.queries("cdc_ddl_filter")(spark, sf).collect()
    assert(ddl.length == 1 && ddl(0).getAs[String]("sql_text") == Cdc.ddlSql)
    val parsedDml = SparkEntry.queries("cdc_parse")(spark, sf)
    assert(parsedDml.filter(col("typ") === "ALTER").count() == 0)
  }
}
