package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-wide injection of the graft function library (SURVEY §4.2
  * path (c)): add
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * to any session/cluster config and strip()/parse_timestamp()/... are
  * SQL-callable in every session without code changes — the deployment
  * shape of the reference installing hooks/functions.sql into the shared
  * database (main.py:203-208), expressed as Spark's extension point.
  * Per-session registration (Functions.registerAll) remains for embedded
  * use; both draw from the same Functions.registrations list.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Functions.registrations.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}
