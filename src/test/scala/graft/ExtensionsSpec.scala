package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions installer: function injection and the
  * redundant-round optimizer rule. `spark.sql.extensions` is a STATIC
  * conf (bound at the first session created in the JVM), so the shared
  * GraftSpec session is built with the extensions installed and this
  * suite exercises them through it — exactly how a library user enables
  * the module.
  */
class ExtensionsSpec extends AnyFunSuite with GraftSpec {

  test("cosine_sim_native is available as a SQL function via extensions") {
    val r = spark.sql(
      """SELECT cosine_sim_native(
           CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
           CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS s""")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  // literals constant-fold before the optimizer rule is observable, so
  // exercise the rule over a real (non-foldable) parquet column
  private def rounds(sql: String): Int = {
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("li_ext")
    val df = spark.sql(sql)
    "round\\(".r.findAllIn(df.queryExecution.optimizedPlan.toString.toLowerCase)
      .size
  }

  test("CollapseRedundantRound removes the outer coarser round") {
    assert(rounds(
      "SELECT round(round(l_extendedprice, 2), 4) AS r FROM li_ext") == 1)
  }

  test("the rule does NOT fire when the outer round is finer") {
    assert(rounds(
      "SELECT round(round(l_extendedprice, 4), 2) AS r FROM li_ext") == 2)
  }
}
