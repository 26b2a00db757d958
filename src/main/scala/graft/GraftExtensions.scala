package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** Config-driven library entry point:
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * registers every engine SQL function at session-build time, so pure-SQL
  * clients (JDBC/Thrift, SQL notebooks, `spark-sql`) get the full custom
  * expression surface — exactly the names in
  * [[graft.functions.GraftFunctions.descriptors]] (the single source of
  * truth; enumerating them here is how doc drift happens) — with no Scala
  * call anywhere. This is the standard deployment shape for a
  * Spark-native library on a shared cluster: the conf line lives in the
  * cluster config once; sessions pick the surface up automatically.
  *
  * The Scala path ([[graft.functions.GraftFunctions.register]]) registers
  * the same builders as session temp functions; both read one descriptor
  * table so the two surfaces cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // declarative aggregate(zip_with(·,·,*),0d,+) → codegen'd DoubleDot
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}
