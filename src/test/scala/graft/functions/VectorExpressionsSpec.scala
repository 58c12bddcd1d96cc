package graft.functions

import graft.functions.VectorExpressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native kernels must compute EXACTLY the values the DuckDB oracle SQL
  * defines. Rather than re-deriving those values by hand, each test compares
  * the native expression against the interpreted Spark-SQL HOF formula that
  * round 1 shipped (which was oracle-green) on adversarial inputs.
  */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    import spark.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "", " ", "  leading and  double  spaces ",
      "one", "one two", "one two three", "one two three four",
      "Ünïcödé wörds ärê fîne tøø ünïcödé wörds",
      "a b a b a b a b a b a b a b a b",
      "x\ty embedded\ttabs stay inside words",
      "newline\nstays inside a word token too"
    ).toDF("text")
  }

  test("shingles3 matches transform/slice/array_join HOF formula") {
    import spark.implicits._
    // the round-1 HOF formula, with words hoisted (valid for W >= 3; for
    // W < 3 the HOF sequence(1,0) misbehaves, so filter those rows there —
    // the native kernel defines max(W-2,0) shingles, DuckDB semantics)
    val words = expr("filter(split(text, ' '), w -> w <> '')")
    val hof = docs.withColumn("w", words).where(size(col("w")) >= 3)
      .select(col("text"),
        expr("transform(sequence(1, size(w) - 2), i -> array_join(slice(w, i, 3), ' '))").as("expect"))
      .withColumn("got", shingles3(col("text")))
    val bad = hof.where(not(col("expect") === col("got"))).count()
    assert(bad == 0)
    // W < 3 → empty
    val small = docs.withColumn("w", words).where(size(col("w")) < 3)
      .select(size(shingles3(col("text"))).as("n")).as[Int].collect()
    assert(small.forall(_ == 0) && small.nonEmpty)
  }

  test("h31 matches conv(substring(md5)) formula") {
    val hof = docs
      .withColumn("sh", shingles3(col("text")))
      .withColumn("expect",
        expr("transform(sh, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % 2147483647L)"))
      .withColumn("got", h31(col("sh")))
    assert(hof.where(not(col("expect") === col("got"))).count() == 0)
  }

  test("minhash_sigs matches the 8 aggregate folds") {
    val base = docs.withColumn("sh", h31(shingles3(col("text"))))
    val withExpect = (0 until 8).foldLeft(base) { (df, i) =>
      val a = 387421L * (i + 1)
      val b = 98765L * (i + 1) + 12345L
      df.withColumn(s"e$i",
        expr(s"aggregate(sh, 2147483647L, (m, x) -> least(m, ($a * x + $b) % 2147483647L))"))
    }
    val got = withExpect.withColumn("got", minhash_sigs(col("sh")))
    val bad = (0 until 8).map(i =>
      got.where(element_at(col("got"), i + 1) =!= col(s"e$i")).count()).sum
    assert(bad == 0)
    // empty input → fold init value
    import spark.implicits._
    val empty = Seq("x y").toDF("text") // 2 words → 0 shingles
      .select(minhash_sigs(h31(shingles3(col("text")))).as("s"))
      .as[Seq[Long]].head()
    assert(empty == Seq.fill(8)(2147483647L))
  }

  test("simhash32 matches the 32 per-bit HOF folds") {
    val hof = docs
      .withColumn("hs",
        expr("transform(filter(split(text, ' '), w -> w <> ''), w -> cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint))"))
      .withColumn("expect",
        expr("""aggregate(
                  sequence(0, 31),
                  0L,
                  (acc, b) -> acc + if(
                    aggregate(hs, 0L, (s, h) -> s + (cast(shiftright(h, b) as bigint) % 2L) * 2L - 1L) > 0,
                    shiftleft(1L, b), 0L))"""))
      .withColumn("got", simhash32(col("text")))
    assert(hof.where(col("expect") =!= col("got")).count() == 0)
  }

  test("dot_i64 matches zip_with/aggregate and participates in codegen") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-500L, 500L, 0L), Seq(500L, 500L, 123L)),
      (Seq.empty[Long], Seq.empty[Long])
    ).toDF("a", "b")
    val out = df
      .withColumn("expect", expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)"))
      .withColumn("got", dot_i64(col("a"), col("b")))
    // empty arrays: HOF gives 0, native gives 0
    assert(out.where(coalesce(col("expect"), lit(0L)) =!= col("got")).count() == 0)
    val plan = spark.range(3)
      .select(dot_i64(array(col("id")), array(col("id"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // codegen'd stage
  }

  test("quantize_i64 matches transform/round HOF on the real embeddings and edge floats") {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val hofQ = "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"
    val bad = real
      .withColumn("expect", expr(hofQ))
      .withColumn("got", quantize_i64(col("embedding")))
      .where(not(col("expect") === col("got"))).count()
    assert(bad == 0)
    // tie and sign edges
    val edges = Seq(Seq(0.0125f, -0.0125f, 0.0005f, -0.0005f, 0.4999999f, -0.53f, 0f))
      .toDF("embedding")
    val e = edges.withColumn("expect", expr(hofQ))
      .withColumn("got", quantize_i64(col("embedding")))
    assert(e.where(not(col("expect") === col("got"))).count() == 0)
    // random floats
    val rnd = new scala.util.Random(5)
    val rand = Seq.fill(200)(Seq.fill(16)(rnd.nextFloat() * 1.2f - 0.6f)).toDF("embedding")
    assert(rand.withColumn("expect", expr(hofQ))
      .withColumn("got", quantize_i64(col("embedding")))
      .where(not(col("expect") === col("got"))).count() == 0)
  }

  test("text_stats matches the six HOF quality/langid formulas it replaced") {
    import spark.implicits._
    val stops = "'the','and','of','to','a','in','is','der','die','das','und','el','la','de'"
    val en = "'the','and','of','to','a','in','is','for','on','with'"
    val de = "'der','die','das','und','ist','von','mit','für','auf','ein'"
    val es = "'el','la','de','que','y','en','los','se','del','un'"
    val fr = "'le','la','les','et','des','un','une','du','dans','est'"
    val rnd = new scala.util.Random(7)
    val alphabet = "ab c!.é für😀 de la un est l0 9"
    val fuzz = Seq.fill(200)(
      Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val texts = (Seq(
      "the quick brown fox and the lazy dog in a log",
      "der die das und ist von mit für auf ein",
      "el la de que y en los se del un",
      "le la les et des un une du dans est",
      "", " ", "   ",
      "punct!!! marks??? and, some. more; here: ok",
      "Ünïcödé wörds ärê fîne tøø ünïcödé wörds",
      "emoji 😀 inside 😀😁 words",
      "a b a b a b a b",
      "für FÜR für Für",
      "x\ty embedded\ttabs stay inside words"
    ) ++ fuzz).toDF("text")
    val cmp = texts
      .withColumn("words", expr("filter(split(text, ' '), w -> w <> '')"))
      .withColumn("ts", text_stats(col("text")))
      .withColumn("e_nw", expr("size(words)"))
      .withColumn("e_sum", expr("aggregate(words, 0L, (a, w) -> a + length(w))"))
      .withColumn("e_ncp", expr("cast(length(text) as bigint)"))
      .withColumn("e_punct", expr("cast(length(regexp_replace(text, '[A-Za-z0-9 ]', '')) as bigint)"))
      .withColumn("e_stop", expr(s"size(filter(words, w -> w in ($stops)))"))
      .withColumn("e_uniq", expr("size(array_distinct(words))"))
      .withColumn("e_en", expr(s"size(filter(words, w -> w in ($en)))"))
      .withColumn("e_de", expr(s"size(filter(words, w -> w in ($de)))"))
      .withColumn("e_es", expr(s"size(filter(words, w -> w in ($es)))"))
      .withColumn("e_fr", expr(s"size(filter(words, w -> w in ($fr)))"))
    val bad = cmp.where(
      col("ts.n_words") =!= col("e_nw") or
      col("ts.sum_wlen") =!= col("e_sum") or
      col("ts.n_cp") =!= col("e_ncp") or
      col("ts.n_punct") =!= col("e_punct") or
      col("ts.n_stop") =!= col("e_stop") or
      col("ts.n_uniq") =!= col("e_uniq") or
      col("ts.s_en") =!= col("e_en") or
      col("ts.s_de") =!= col("e_de") or
      col("ts.s_es") =!= col("e_es") or
      col("ts.s_fr") =!= col("e_fr"))
    assert(bad.count() == 0, bad.select("text").collect().take(3).mkString("; "))
    // codegen participation
    val plan = spark.range(3)
      .select(text_stats(col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("hyperplane literals match the per-row md5 SQL derivation") {
    import graft.queries.Similarity
    val h0 = Similarity.hyperplane(0, 4)
    val viaSql = spark.sql(
      """select transform(sequence(0, 3),
           d -> cast(conv(substring(md5(concat('hp0-', d)), 1, 15), 16, 10) as bigint) % 1001 - 500) as h""")
      .head().getSeq[Long](0)
    assert(h0.toSeq == viaSql)
  }
}
