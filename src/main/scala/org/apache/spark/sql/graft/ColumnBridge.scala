package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-runtime Column ↔ Catalyst Expression bridge.
  *
  * Spark 4 hides the conversion behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so a library that
  * wants ONE definition of a Column-composed function to serve both the
  * Scala surface and a `SparkSessionExtensions` SQL registration needs
  * this package-placed shim — the standard escape hatch Spark-native
  * libraries use. Kept to the two one-line delegations; everything
  * engine-specific stays in the graft packages.
  */
object ColumnBridge {
  /** EAGER conversion via the session-independent converter singleton:
    * [[ExpressionUtils.expression]] would wrap the node in a lazy
    * `ColumnNodeExpression` that only a Dataset API call unwraps — inside
    * a function-registry builder nothing ever converts it and codegen
    * dies on the wrapper. The eager form yields a plain (possibly
    * unresolved) Catalyst tree the analyzer then resolves normally. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Session plumbing for [[graft.operators.TinyLoop]]: a DataFrame is
    * bound to the session that created it, and Spark 4 keeps both the
    * rebinding entry point (`classic.Dataset.ofRows`) and session
    * cloning (`cloneSession`) behind `private[sql]`. The compact-loop
    * executor needs exactly these two: clone a session once (to give
    * tiny-loop materializations their own execution conf without
    * mutating the caller's — session conf is process-visible, and a
    * concurrent query on another thread must never see it), and rebind
    * a logical plan into / out of that clone. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()

  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan
}
