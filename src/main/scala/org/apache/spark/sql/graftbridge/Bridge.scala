package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** The one `private[sql]` hop graft needs: wrap a custom LogicalPlan
  * ([[graft.plans.AsOfJoinPlan]]) back into a public DataFrame. Spark
  * offers no public constructor for this — every library that injects
  * custom logical operators (rather than just expressions) ships exactly
  * this shim in an `org.apache.spark.sql` subpackage. Nothing else may go
  * through here; all other graft/Spark interop uses public APIs.
  */
object Bridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Column ⇄ catalyst Expression, for wrapping graft's native expressions
    * without a function-registry round-trip (registry entries need a
    * session in hand; pure column builders like SimHash.simhash don't
    * have one).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
