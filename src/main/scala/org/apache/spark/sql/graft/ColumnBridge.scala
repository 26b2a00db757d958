package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
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
}
