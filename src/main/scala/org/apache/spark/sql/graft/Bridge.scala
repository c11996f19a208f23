package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door a plan-level extension needs: wrap a
  * hand-built LogicalPlan as a DataFrame. Lives under
  * `org.apache.spark.sql` for access, same as every published Spark
  * extension library does it; nothing else of Spark's internals is
  * touched.
  */
object Bridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Non-blocking peek at an Observation's metrics (`getOrEmpty` is
    * `private[sql]`): empty until the observed action's listener
    * delivers. Lets a convergence loop POLL with a deadline instead of
    * parking a thread in the indefinitely-blocking `get`.
    */
  def observationPeek(o: org.apache.spark.sql.Observation)
      : Map[String, Any] = o.getOrEmpty
}
