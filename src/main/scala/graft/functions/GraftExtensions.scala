package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer: makes the graft function library
  * available in every session built with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`) — the
  * deployment path for clusters where sessions are created by a platform,
  * not by graft code. Functions injected here are resolved by the analyzer
  * exactly like built-ins (native expressions for the hot parsers, no UDF
  * lane). `Functions.registerAll` remains the per-session equivalent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))

    inject("parse_timestamp", es => ParseTimestampExpr(es.head))
    inject("parse_date", es => ParseDateExpr(es.head))
    inject("strip", es =>
      org.apache.spark.sql.GraftSqlBridge.expression(
        Functions.strip(org.apache.spark.sql.GraftSqlBridge.column(es.head))))
    inject("parse_timezone", es =>
      org.apache.spark.sql.GraftSqlBridge.expression(
        Functions.parseTimezone(org.apache.spark.sql.GraftSqlBridge.column(es.head))))
  }
}
