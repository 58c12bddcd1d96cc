package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer — enables
  * `spark.sql.extensions=graft.functions.GraftExtensions` on any cluster,
  * injecting the extraction scalar functions into every session
  * (SURVEY §4: injectFunction path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dehyphenate"),
      new ExpressionInfo(classOf[SpanExpressions.Dehyphenate].getName, "dehyphenate"),
      (exprs: Seq[Expression]) => SpanExpressions.Dehyphenate(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("strip_boilerplate"),
      new ExpressionInfo(classOf[SpanExpressions.StripBoilerplate].getName, "strip_boilerplate"),
      (exprs: Seq[Expression]) => SpanExpressions.StripBoilerplate(exprs.head)))
  }
}
