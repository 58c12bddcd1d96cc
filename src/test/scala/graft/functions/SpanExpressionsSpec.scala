package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

class SpanExpressionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dehyphenate expression matches the kernel, in codegen and SQL") {
    import spark.implicits._
    SpanExpressions.register(spark)
    val df = Seq("Stra-\nße\n", "EU-\nInstitution\n", "E-\nMail\n", "plain\n")
      .toDF("t")
    val viaColumn = df.select(SpanExpressions.dehyphenate(col("t"), lit(false)).as("d"))
      .as[String].collect().toSeq
    assert(viaColumn == Seq("Straße\n", "EU-Institution\n", "E-Mail\n", "plain\n"))
    df.createOrReplaceTempView("tt")
    val viaSql = spark.sql("select dehyphenate(t, false) from tt").as[String].collect().toSeq
    assert(viaSql == viaColumn)
    // whole-stage codegen must wrap the expression on a real scan
    // (LocalTableScan over literals bypasses codegen, so use range)
    val plan = spark.range(3)
      .select(SpanExpressions.dehyphenate(col("id").cast("string"), lit(true)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dehyphenate("), plan) // '*' = codegen'd stage
  }

  test("strip_boilerplate expression") {
    import spark.implicits._
    SpanExpressions.register(spark)
    val html = """<body><nav><a href="/">Home</a> <a href="/b">B</a> <a href="/c">C</a></nav><p>Der lange Inhalt dieses Absatzes bleibt erhalten weil er genug Wörter enthält.</p></body>"""
    val out = Seq(html).toDF("h")
      .select(SpanExpressions.strip_boilerplate(col("h"))).as[String].head()
    assert(out.contains("lange Inhalt"))
    assert(!out.contains("Home"))
  }
}
