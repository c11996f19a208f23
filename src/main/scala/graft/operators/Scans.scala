package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 Scans / sources — columnar parquet scan plus delimited/JSON ingest
  * (the Canal-adapter bulk-load surface).
  *
  * CSV/JSON queries do a real write→read roundtrip through the format under
  * java.io.tmpdir (deterministic content; results aggregate afterwards so
  * file/row order is irrelevant). The oracle reads the original parquet —
  * parity proves the roundtrip is lossless.
  *
  * Scale: parquet scans prune columns + push filters (verified via
  * .explain in the specs); CSV/JSON ingest is splittable line format, so
  * a 100 TB load parallelizes per-file/per-split.
  */
object Scans {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType),
  ))

  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def tmp(sfDir: String, kind: String): String = {
    val sf = new java.io.File(sfDir).getName
    s"${sys.props("java.io.tmpdir")}/graft_scan/${kind}_$sf"
  }

  private def scanParquet(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_partkey"))

  private def scanCsv(s: SparkSession, dir: String): DataFrame = {
    val path = tmp(dir, "orders_csv")
    if (!new java.io.File(s"$path/_SUCCESS").exists()) // deterministic content
      Tables.orders(s, dir).write.mode("overwrite")
        .option("header", "true").option("timestampFormat", tsFmt)
        .csv(path)
    s.read.schema(ordersSchema)
      .option("header", "true").option("timestampFormat", tsFmt)
      .csv(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  private def scanJson(s: SparkSession, dir: String): DataFrame = {
    val path = tmp(dir, "orders_json")
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      Tables.orders(s, dir).write.mode("overwrite")
        .option("timestampFormat", tsFmt).json(path)
    s.read.schema(ordersSchema).option("timestampFormat", tsFmt).json(path)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("scan_parquet", scanParquet,
      Some("""SELECT p_partkey, p_retailprice FROM part ORDER BY p_partkey""")),
    QueryDef("scan_csv", scanCsv,
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
              ${Det.oSum("o_totalprice")} AS sum_price
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),
    QueryDef("scan_json", scanJson,
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
              ${Det.oSum("o_totalprice")} AS sum_price
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),
  )
}
