package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Engine-exactness: vectors are quantized to integers (round(x·1000)) so
  * dot products and squared norms are exact 64-bit arithmetic in both Spark
  * and DuckDB; rankings order by integer distance (or a double derived from
  * the same integers via one sqrt+div, bit-identical across engines), and
  * reported cosine values are floor(cos·10^6) — no rounding-mode hazards.
  *
  * Scale shapes:
  *   - brute-force top-k: the query set broadcasts against the corpus scan
  *     (the correct baseline at any corpus size when |queries| is small);
  *   - IVF: vectors are pre-assigned to their nearest centroid (one narrow
  *     pass vs a broadcast centroid table); queries probe the 2 nearest
  *     centroid partitions only — the candidate scan prunes to ~2/8 of the
  *     corpus, which is the 100 TB path.
  */
object Similarity {

  /** Quantized vector + squared norm. */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("q"))
      .withColumn("nrm", expr("aggregate(transform(q, x -> x * x), 0L, (a, x) -> a + x)"))

  /** Integer dot product. zip_with + fold measured ~2x faster than an
    * element_at index fold (element_at pays per-call bounds checks that
    * outweigh the zip array allocation).
    */
  private val DotExpr = "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (a, x) -> a + x)"

  /** Brute-force cosine top-5 for query vectors vec_id < 10. */
  def knnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = quantized(spark, dir)
    val queries = v.select(col("vec_id").as("query_id"), col("q").as("qa"), col("nrm").as("na"))
      .where(col("query_id") < 10)
    val corpus = v.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("nrm").as("nb"))
    val scored = queries.crossJoin(corpus)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", expr(DotExpr))
      .withColumn("cos", expr("cast(dot as double) / sqrt(cast(na as double) * cast(nb as double))"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        expr("cast(floor(cos * 1000000) as bigint)").as("cos_x1e6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF top-3: centroids = vec_id 0..7; assignment by integer squared
    * distance (na + nc − 2·dot), queries probe 2 nearest centroids.
    */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = quantized(spark, dir)
    val centroids = v.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("q").as("qb"), col("nrm").as("nb"))

    // assignment: every vector → nearest centroid (broadcast centroids)
    val byC = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)
    val assigned = v.select(col("vec_id"), col("q").as("qa"), col("nrm").as("na"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", expr(s"na + nb - 2 * $DotExpr"))
      .withColumn("rn", row_number().over(byC))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("qa"), col("na"), col("cid").as("assigned_cid"))

    // queries probe their 2 nearest centroids
    val byQ = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("cid").asc)
    val probes = v.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nrm").as("na"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", expr(s"na + nb - 2 * $DotExpr"))
      .withColumn("rn", row_number().over(byQ))
      .where(col("rn") <= 2)
      .select(col("query_id"), col("qa").as("qq"), col("na").as("nq"), col("cid").as("probe_cid"))

    // candidate search restricted to probed partitions; the probe set is
    // tiny (|queries|×2) → broadcast it so the corpus side never shuffles
    val byRank = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("vec_id").asc)
    broadcast(probes).join(assigned, col("probe_cid") === col("assigned_cid"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("d2", expr("nq + na - 2 * aggregate(zip_with(qq, qa, (x, y) -> x * y), 0L, (a, x) -> a + x)"))
      .withColumn("rank", row_number().over(byRank))
      .where(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("d2"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding near-dup pairs: cosine ≥ 0.45 (exact integer compare:
    * dot ≥ 0 and dot² · 10^4 ≥ na·nb · 0.45²·10^4 = na·nb·2025).
    * NB dot ≤ 64·530² ⇒ dot² ≤ ~3.2e14, na·nb·2025 ≤ ~6.5e17 — no overflow.
    */
  def dedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    val a = v.select(col("vec_id").as("id_a"), col("q").as("qa"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("id_b"), col("q").as("qb"), col("nrm").as("nb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("dot", expr(DotExpr))
      .where(col("dot") > 0 && col("dot") * col("dot") * 10000 >= col("na") * col("nb") * lit(2025))
      .select(col("id_a"), col("id_b"),
        expr("cast(floor(cast(dot as double) / sqrt(cast(na as double) * cast(nb as double)) * 1000000) as bigint)").as("cos_x1e6"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Sign-random-hyperplane LSH buckets: 12 deterministic hyperplanes whose
    * components derive from md5(plane, dim) — sign of ⟨q, h⟩ per plane packs
    * into a 12-bit bucket id. Candidates = bucket collisions (equi-join, the
    * scale path); exact integer cosine verifies. All integer arithmetic, so
    * the DuckDB oracle matches exactly.
    */
  def annLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val v = quantized(spark, dir)
    // hyperplane component h[p][d] in [-500,500]: md5-derived, same in SQL
    val hExpr = (p: Int) =>
      s"""aggregate(
            zip_with(q, sequence(0, size(q) - 1),
              (x, d) -> x * (cast(conv(substring(md5(concat('hp$p-', d)), 1, 15), 16, 10) as bigint) % 1001 - 500)),
            0L, (a, x) -> a + x)"""
    val withBits = (0 until 12).foldLeft(v) { (df, p) =>
      df.withColumn(s"b$p", expr(s"if(${hExpr(p)} >= 0, shiftleft(1, $p), 0)"))
    }
    withBits
      .withColumn("bucket", (0 until 12).map(p => col(s"b$p")).reduce(_ + _))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_bruteforce" -> (knnBruteforce _),
    "knn_ivf" -> (knnIvf _),
    "dedup_embedding_cosine" -> (dedupEmbeddingCosine _),
    "ann_lsh_buckets" -> (annLshBuckets _)
  )

  private val QSql =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
  private val VSql =
    s"""SELECT vec_id, $QSql AS q,
        list_sum(list_transform($QSql, x -> x * x)) AS nrm
        FROM embeddings"""
  private val DotSql =
    "list_sum([qa[i] * qb[i] for i in generate_series(1, len(qa))])"

  val oracle: Map[String, String] = Map(
    "knn_bruteforce" ->
      s"""WITH v AS ($VSql),
          s AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              CAST($DotSql AS BIGINT) AS dot,
              CAST(a.nrm AS BIGINT) AS na, CAST(b.nrm AS BIGINT) AS nb
            FROM (SELECT vec_id, q AS qa, nrm FROM v WHERE vec_id < 10) a,
                 (SELECT vec_id, q AS qb, nrm FROM v) b
            WHERE a.vec_id <> b.vec_id),
          r AS (
            SELECT query_id, neighbor_id,
              CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) DESC,
                         neighbor_id ASC) AS rank
            FROM s)
          SELECT query_id, rank, neighbor_id,
            CAST(floor(cos * 1000000) AS BIGINT) AS cos_x1e6
          FROM r WHERE rank <= 5 ORDER BY query_id, rank""",
    "knn_ivf" ->
      s"""WITH v AS ($VSql),
          c AS (SELECT vec_id AS cid, q AS qb, nrm AS nb FROM v WHERE vec_id < 8),
          asg0 AS (
            SELECT a.vec_id, a.q AS qa, a.nrm AS na, c.cid,
              CAST(a.nrm + c.nb - 2 * list_sum([a.q[i] * c.qb[i] for i in generate_series(1, len(a.q))]) AS BIGINT) AS d2,
              ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY CAST(a.nrm + c.nb - 2 * list_sum([a.q[i] * c.qb[i] for i in generate_series(1, len(a.q))]) AS BIGINT) ASC, c.cid ASC) AS rn
            FROM v a, c),
          assigned AS (SELECT vec_id, qa, na, cid AS assigned_cid FROM asg0 WHERE rn = 1),
          probes AS (
            SELECT vec_id AS query_id, qa AS qq, na AS nq, cid AS probe_cid
            FROM asg0 WHERE vec_id < 10 AND rn <= 2),
          cand AS (
            SELECT p.query_id, a.vec_id,
              CAST(p.nq + a.na - 2 * list_sum([p.qq[i] * a.qa[i] for i in generate_series(1, len(p.qq))]) AS BIGINT) AS d2
            FROM probes p JOIN assigned a ON p.probe_cid = a.assigned_cid
            WHERE p.query_id <> a.vec_id),
          r AS (
            SELECT query_id, vec_id AS neighbor_id, d2,
              ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2 ASC, vec_id ASC) AS rank
            FROM cand)
          SELECT query_id, rank, neighbor_id, d2
          FROM r WHERE rank <= 3 ORDER BY query_id, rank""",
    "ann_lsh_buckets" -> {
      val hSql = (p: Int) =>
        s"""list_sum([q[d + 1] * (CAST(concat('0x', substr(md5(concat('hp$p-', d)), 1, 15)) AS BIGINT) % 1001 - 500)
             for d in generate_series(0, len(q) - 1)])"""
      val bits = (0 until 12).map(p =>
        s"(CASE WHEN ${hSql(p)} >= 0 THEN (1 << $p) ELSE 0 END)").mkString(" + ")
      s"""WITH v AS ($VSql),
          b AS (SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM v)
          SELECT bucket, COUNT(*) AS n_vectors, min(vec_id) AS min_vec
          FROM b GROUP BY bucket ORDER BY bucket"""
    },
    "dedup_embedding_cosine" ->
      s"""WITH v AS ($VSql),
          p AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              CAST($DotSql AS BIGINT) AS dot,
              CAST(a.nrm AS BIGINT) AS na, CAST(b.nrm AS BIGINT) AS nb
            FROM (SELECT vec_id, q AS qa, nrm FROM v) a,
                 (SELECT vec_id, q AS qb, nrm FROM v) b
            WHERE a.vec_id < b.vec_id)
          SELECT id_a, id_b,
            CAST(floor(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 1000000) AS BIGINT) AS cos_x1e6
          FROM p
          WHERE dot > 0 AND dot * dot * 10000 >= na * nb * 2025
          ORDER BY id_a, id_b"""
  )
}
