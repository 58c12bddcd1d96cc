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
    ext.injectFunction((
      FunctionIdentifier("span_byte_cost"),
      new ExpressionInfo(classOf[SpanExpressions.SpanByteCost].getName, "span_byte_cost"),
      (exprs: Seq[Expression]) => SpanExpressions.SpanByteCost(exprs.head)))
    // dedup/similarity vector kernels (VectorExpressions)
    ext.injectFunction((
      FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[VectorExpressions.DotI64].getName, "dot_i64"),
      (exprs: Seq[Expression]) => VectorExpressions.DotI64(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("quantize_i64"),
      new ExpressionInfo(classOf[VectorExpressions.QuantizeI64].getName, "quantize_i64"),
      (exprs: Seq[Expression]) => VectorExpressions.QuantizeI64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("shingles3"),
      new ExpressionInfo(classOf[VectorExpressions.Shingles3].getName, "shingles3"),
      (exprs: Seq[Expression]) => VectorExpressions.Shingles3(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("h31"),
      new ExpressionInfo(classOf[VectorExpressions.H31].getName, "h31"),
      (exprs: Seq[Expression]) => VectorExpressions.H31(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[VectorExpressions.MinhashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => VectorExpressions.MinhashSigs(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[VectorExpressions.Simhash32].getName, "simhash32"),
      (exprs: Seq[Expression]) => VectorExpressions.Simhash32(exprs.head)))
  }
}
