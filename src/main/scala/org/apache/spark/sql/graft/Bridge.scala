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

  /** Spark's OWN float-key normalization (`NormalizeFloatingNumbers.
    * normalize` is `private[sql]`), recursion into structs/arrays
    * included — a hand-rolled scalar-only wrapper misses floats NESTED
    * in a struct group key, splitting -0.0/0.0 (or NaN bit patterns)
    * into two groups.
    */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.types._
    def hasFloat(dt: DataType): Boolean = dt match {
      case FloatType | DoubleType => true
      case s: StructType => s.exists(f => hasFloat(f.dataType))
      case a: ArrayType => hasFloat(a.elementType)
      case m: MapType => hasFloat(m.keyType) || hasFloat(m.valueType)
      case _ => false
    }
    if (hasFloat(e.dataType))
      org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
        .normalize(e)
    else e
  }
}
