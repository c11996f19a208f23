package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Canary for the mechanism DedupGraph.clusterLabels depends on: an
  * Observation attached to a localCheckpoint'd plan IS delivered (the
  * checkpoint is an action and fires QueryExecutionListener). If a Spark
  * upgrade ever breaks this, clusterLabels falls back to its explicit
  * probe — this test makes the silent perf regression loud instead.
  */
class ObservedLoopSpec extends GraftSpec {
  test("observation metrics fire on localCheckpoint") {
    import spark.implicits._
    val obs = Observation()
    val df = Seq(1, 2, 3, 4).toDF("x")
      .observe(obs, sum(when(col("x") > 2, 1L).otherwise(0L)).as("n"))
      .localCheckpoint()
    // get blocks until the listener delivers; bound it so a non-firing
    // listener fails the test instead of hanging the suite
    val fut = scala.concurrent.Future(obs.get)(
      scala.concurrent.ExecutionContext.global)
    val got = scala.concurrent.Await.result(
      fut, scala.concurrent.duration.Duration(20, "s"))
    assert(got("n") == 2L, got.toString)
    assert(df.count() == 4)
  }
}
