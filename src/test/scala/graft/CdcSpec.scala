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
    val up = SparkEntry.queries("cdc_upsert_latest")(spark, sf).cache()
    assert(up.count() == up.select("o_orderkey").distinct().count())
    // replaying the merged state through the same merge changes nothing
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("version_es").desc)
    val again = up.unionByName(up)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1).drop("rn")
    assert(again.count() == up.count())
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

  test("delete fold balance is invariant under event reordering") {
    import spark.implicits._
    // (key, es, sign) events applied in three different arrival orders
    val events = Seq((1L, 10L, 1), (1L, 20L, -1), (1L, 30L, 1),
      (2L, 10L, 1), (2L, 20L, -1), (3L, 5L, 1))
    def liveKeys(evs: Seq[(Long, Long, Int)]): Set[Long] = {
      val df = evs.toDF("k", "es", "sign")
      df.groupBy("k").agg(sum("sign").as("bal"))
        .filter(col("bal") > 0).select("k").as[Long].collect().toSet
    }
    val orders = Seq(events, events.reverse, events.sortBy(_._2))
    val results = orders.map(liveKeys)
    assert(results.distinct.size == 1)
    assert(results.head == Set(1L, 3L))
  }

  test("cdc_scd2 intervals chain correctly per key") {
    val scd = SparkEntry.queries("cdc_scd2")(spark, sf).cache()
    // exactly one current version per key
    val current = scd.filter(col("is_current"))
    assert(current.count() == scd.select("o_orderkey").distinct().count())
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
