package graft.queries

import graft.functions.VectorExpressions.{h31, minhash_sigs, shingles3}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents`: exact, MinHash+LSH bands, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup (in [[Similarity]]'s quantized
  * integer arithmetic).
  *
  * Scale shapes:
  *   - signatures/fingerprints are per-row single-pass codegen'd kernels
  *     ([[graft.functions.VectorExpressions]]) — round 1's interpreted HOF
  *     folds re-evaluated the word split per shingle index (O(W²)/doc) and
  *     cost ~µs per lambda application; the native kernels are one pass;
  *   - candidate generation is an equi-join on band/shingle (shuffle on the
  *     bucket key — the LSH scale path), never an O(n²) cross join;
  *   - Jaccard verification uses exact integer counts (4·|∩| ≥ |∪| for
  *     threshold 0.25), so results are engine-independent.
  */
object Dedup {

  /** Exact dedup: group by content hash (the canonical 100 TB shape — one
    * shuffle on md5(text), partial agg upstream).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("representative"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("content_hash"))

  /** MinHash signatures + 2 LSH band keys, no presentation sort — the
    * reusable building block ([[dedupMinhashPairs]] must not inherit an
    * `orderBy`). One narrow pass: shingle → md5 → 8 affine permutations.
    */
  private def minhashSigBase(spark: SparkSession, dir: String): DataFrame = {
    val sigCols = (0 until 8).map(i => element_at(col("sigs"), i + 1).as(s"sig$i"))
    Tables.spread(spark, dir, "documents", "doc_id")
      .select(col("doc_id"), minhash_sigs(h31(shingles3(col("text")))).as("sigs"))
      .select(col("doc_id") +: sigCols: _*)
      .withColumn("band0", md5(concat_ws("-", col("sig0"), col("sig1"), col("sig2"), col("sig3"))))
      .withColumn("band1", md5(concat_ws("-", col("sig4"), col("sig5"), col("sig6"), col("sig7"))))
  }

  /** MinHash signatures: 8 permutations (a·h + b mod 2^31-1) + band keys. */
  def dedupMinhashSig(spark: SparkSession, dir: String): DataFrame =
    minhashSigBase(spark, dir).orderBy(col("doc_id"))

  /** MinHash-LSH candidate pairs: docs sharing any band bucket. The join is
    * on the band value — the scalable inverted-index shape. The two band
    * columns flow through ONE explode (round 1 built a 2-branch union that,
    * combined with the self-join, recomputed the signature subtree 4×).
    * The band frame is lazily localCheckpoint'd so the scan→shingles→minhash
    * subtree is computed ONCE and shared by both join sides (it appeared
    * once per side before — a 2× scan multiplier that is real money at
    * 100 TB); blocks are task-local and cleaned when the RDD is GC'd. At
    * cluster scale swap in `.persist()` + explicit unpersist (or reliable
    * checkpoint) for executor-loss tolerance.
    */
  def dedupMinhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val bands = minhashSigBase(spark, dir)
      .select(col("doc_id"), explode(array(col("band0"), col("band1"))).as("band"))
      .localCheckpoint(eager = false)
    val a = bands.toDF("doc_a", "band")
    val b = bands.toDF("doc_b", "band")
    a.join(b, "band")
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash (32-bit): per-bit majority vote over word hashes, one
    * codegen'd pass per row (round 1 ran 32 interpreted HOF folds over the
    * word-hash array).
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, dir, "documents", "doc_id")
      .select(col("doc_id"),
        graft.functions.VectorExpressions.simhash32(col("text")).as("simhash"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").as("n_words"))
      .orderBy(col("doc_id"))

  /** SimHash near-dup pairs: Hamming distance ≤ 3 on the 32-bit signature.
    * Candidates via the pigeonhole band trick — split 32 bits into 4 bands
    * of 8; any pair within Hamming 3 differs in at most 3 bands, so it
    * MUST agree exactly on ≥1 band. Recall is therefore 100% BY
    * CONSTRUCTION (unlike probabilistic LSH), and candidate generation is
    * an equi-join on (band index, band value) — the scale shape. Verify =
    * bit_count(xor) ≤ 3, exact in both engines.
    */
  def dedupSimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.VectorExpressions.simhash32(col("text")).as("simhash"))
    val bands = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*))
        .as(Seq("band_idx", "band_val")))
      .localCheckpoint(eager = false) // one simhash pass shared by both join sides
    val a = bands.toDF("doc_a", "sim_a", "band_idx", "band_val")
    val b = bands.toDF("doc_b", "sim_b", "band_idx", "band_val")
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= 3)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Distinct shingle sets (strings — the Jaccard contract hashes nothing,
    * so two distinct shingles never collide).
    */
  private def shingleSets(spark: SparkSession, dir: String,
      spreadInput: Boolean = true): DataFrame = {
    val t = if (spreadInput) Tables.spread(spark, dir, "documents", "doc_id")
      else Tables(spark, dir, "documents")
    t.select(col("doc_id"), array_distinct(shingles3(col("text"))).as("sset"))
      .select(col("doc_id"), col("sset"), size(col("sset")).as("nsh"))
  }

  /** N-gram Jaccard near-dup pairs (threshold 0.25, exact): inverted index
    * on distinct shingles → pair intersection counts → integer-compare
    * 4·|∩| ≥ |∪|. No floats anywhere; the shingle join prunes to pairs with
    * ≥1 common shingle, which is exactly the support of the predicate.
    * Scale note: a document-frequency cap on hot shingles (drop shingles in
    * > K docs — they only ever contribute to pairs that share rarer
    * shingles too, for any K ≥ 1/threshold) bounds the skew of the
    * inverted-index join at 10^12 docs.
    */
  /** Unordered jaccard pair query — shared by [[dedupNgramJaccard]] (which
    * adds the presentation sort) and [[dedupComponents]] (whose component
    * aggregation doesn't need the pair order; inheriting the global sort
    * cost an extra range-partition sampling pass + exchange inside the
    * components plan).
    */
  private def ngramJaccardBase(spark: SparkSession, dir: String): DataFrame = {
    val inv = shingleSets(spark, dir)
      .select(col("doc_id"), col("nsh"), explode(col("sset")).as("sh"))
      .localCheckpoint(eager = false) // one shingle pass shared by both join sides
    val a = inv.toDF("doc_a", "na", "sh")
    val b = inv.toDF("doc_b", "nb", "sh")
    // shuffle-hash, not broadcast: Catalyst's size estimate broadcast the
    // WHOLE inverted index (~1M rows at bench sf), whose hash-relation
    // build is driver-serial; the self-join shuffles both sides on sh and
    // builds per-partition tables in parallel instead (and both sides are
    // the same checkpointed frame, so the two exchanges dedupe via
    // ReuseExchange)
    a.join(b.hint("shuffle_hash"), "sh")
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("unions", col("na") + col("nb") - col("inter"))
      .where(col("inter") * 4 >= col("unions"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("unions"))
  }

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardBase(spark, dir).orderBy(col("doc_a"), col("doc_b"))

  /** Jaccard with a document-frequency cap — the web-scale skew dial: a
    * boilerplate shingle appearing in df documents contributes O(df²)
    * candidate pairs to the inverted-index join, so at 10^12 docs the hot
    * tail must be dropped. Shingles in > maxDf docs are removed from the
    * index (one count + one broadcast anti-join); |∩| then undercounts, so
    * with the unchanged threshold predicate the result is a SUBSET of the
    * exact query — a pure recall/cost dial, never false positives. The
    * union sizes (na/nb) stay the FULL distinct-shingle counts.
    */
  def dedupNgramJaccardCapped(spark: SparkSession, dir: String,
      maxDf: Long = 8L): DataFrame = {
    val inv = shingleSets(spark, dir, spreadInput = false)
      .select(col("doc_id"), col("nsh"), explode(col("sset")).as("sh"))
      .localCheckpoint(eager = false) // shared by DF count + both join sides
    val hot = inv.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf)
      .select(col("sh"))
    val cold = inv.join(broadcast(hot), Seq("sh"), "left_anti")
    val a = cold.toDF("sh", "doc_a", "na")
    val b = cold.toDF("sh", "doc_b", "nb")
    a.join(b.hint("shuffle_hash"), "sh") // see ngramJaccardBase
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("unions", col("na") + col("nb") - col("inter"))
      .where(col("inter") * 4 >= col("unions"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("unions"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Duplicate-cluster assembly: connected components over the near-dup
    * pair graph (Jaccard ≥ 0.25 edges) via alternating large-star /
    * small-star ([[ConnectedComponents.largeSmallStar]]) — O(log² n) rounds
    * on any graph shape, so the driver-side convergence probe count is
    * bounded even on 10^12-node chain graphs where round-1's naive
    * min-label propagation paid one action per hop of the graph diameter.
    */
  def dedupComponents(spark: SparkSession, dir: String): DataFrame = {
    // no persist here: ConnectedComponents.components localCheckpoints the
    // pair list once and every downstream consumer reads that; the UNORDERED
    // pair base skips dedupNgramJaccard's presentation sort (the component
    // labels are order-independent and this query re-sorts by component)
    val pairs = ngramJaccardBase(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val labels = ConnectedComponents.components(pairs)
    labels
      .groupBy(col("comp").as("component"))
      .agg(count(lit(1)).as("size_"),
        collect_list(col("id")).as("ids"))
      .select(col("component"), col("size_").as("size"),
        array_join(array_sort(col("ids")), ",").as("members"))
      .orderBy(col("component"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_components" -> (dedupComponents _),
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash_sig" -> (dedupMinhashSig _),
    "dedup_minhash_pairs" -> (dedupMinhashPairs _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_simhash_pairs" -> (dedupSimhashPairs _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_ngram_jaccard_capped" -> ((s: SparkSession, d: String) => dedupNgramJaccardCapped(s, d, 8L))
  )

  private val WordsSql = "list_filter(string_split(text, ' '), w -> w <> '')"
  private val ShinglesSql =
    s"[array_to_string(w[i:i+2], ' ') for i in generate_series(1, greatest(len(w) - 2, 0))]"
  private val Sh31Sql =
    s"list_transform($ShinglesSql, s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647)"

  private def sigSql: String = {
    val sigCols = (0 until 8).map { i =>
      val a = 387421L * (i + 1)
      val b = 98765L * (i + 1) + 12345L
      s"CAST(list_reduce(list_prepend(2147483647, sh), (m, x) -> least(m, ($a * x + $b) % 2147483647)) AS BIGINT) AS sig$i"
    }.mkString(", ")
    s"""WITH w0 AS (SELECT doc_id, $WordsSql AS w FROM documents),
        s0 AS (SELECT doc_id, $Sh31Sql AS sh FROM w0),
        sigs AS (SELECT doc_id, $sigCols FROM s0)
        SELECT doc_id, sig0, sig1, sig2, sig3, sig4, sig5, sig6, sig7,
          md5(concat_ws('-', sig0, sig1, sig2, sig3)) AS band0,
          md5(concat_ws('-', sig4, sig5, sig6, sig7)) AS band1
        FROM sigs"""
  }

  val oracle: Map[String, String] = Map(
    "dedup_components" ->
      s"""WITH RECURSIVE
          w0 AS (SELECT doc_id, $WordsSql AS w FROM documents),
          s0 AS (SELECT doc_id, list_distinct($ShinglesSql) AS sset FROM w0),
          inv AS (SELECT doc_id, len(sset) AS nsh, unnest(sset) AS sh FROM s0),
          p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.nsh AS na, b.nsh AS nb,
              COUNT(*) AS inter
            FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4),
          pairs AS (
            SELECT doc_a, doc_b FROM p WHERE inter * 4 >= (na + nb - inter)),
          edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs),
          reach(node, root) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node),
          comp AS (SELECT node, min(root) AS component FROM reach GROUP BY node)
          SELECT component, COUNT(*) AS "size",
            string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
          FROM comp GROUP BY component ORDER BY component""",
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS representative,
         COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY content_hash""",
    "dedup_minhash_sig" -> (sigSql + " ORDER BY doc_id"),
    "dedup_minhash_pairs" ->
      s"""WITH sigs AS ($sigSql),
          bands AS (
            SELECT doc_id, band0 AS band FROM sigs
            UNION ALL SELECT doc_id, band1 FROM sigs)
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
          ORDER BY doc_a, doc_b""",
    "dedup_simhash" ->
      s"""WITH t AS (
            SELECT doc_id,
              list_transform($WordsSql, w -> CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT)) AS hs
            FROM documents),
          bits AS (
            SELECT doc_id, b.b AS bit,
              CASE WHEN list_sum(list_transform(hs, h -> ((h >> b.b) & 1) * 2 - 1)) > 0
                   THEN (CAST(1 AS BIGINT) << b.b) ELSE 0 END AS bitval
            FROM t, (SELECT unnest(generate_series(0, 31)) AS b) b)
          SELECT t.doc_id, CAST(s.simhash AS BIGINT) AS simhash, len(t.hs) AS n_words
          FROM t JOIN (SELECT doc_id, sum(bitval) AS simhash FROM bits GROUP BY doc_id) s
            ON t.doc_id = s.doc_id
          ORDER BY t.doc_id""",
    "dedup_simhash_pairs" ->
      s"""WITH t AS (
            SELECT doc_id,
              list_transform($WordsSql, w -> CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT)) AS hs
            FROM documents),
          bits AS (
            SELECT doc_id, b.b AS bit,
              CASE WHEN list_sum(list_transform(hs, h -> ((h >> b.b) & 1) * 2 - 1)) > 0
                   THEN (CAST(1 AS BIGINT) << b.b) ELSE 0 END AS bitval
            FROM t, (SELECT unnest(generate_series(0, 31)) AS b) b),
          sigs AS (SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash FROM bits GROUP BY doc_id),
          bands AS (
            SELECT doc_id, simhash, bi AS band_idx, (simhash >> (bi * 8)) & 255 AS band_val
            FROM sigs, (SELECT unnest(generate_series(0, 3)) AS bi) q)
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          ORDER BY doc_a, doc_b""",
    "dedup_ngram_jaccard" ->
      s"""WITH w0 AS (SELECT doc_id, $WordsSql AS w FROM documents),
          s0 AS (SELECT doc_id, list_distinct($ShinglesSql) AS sset FROM w0),
          inv AS (SELECT doc_id, len(sset) AS nsh, unnest(sset) AS sh FROM s0),
          p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.nsh AS na, b.nsh AS nb,
              COUNT(*) AS inter
            FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
          SELECT doc_a, doc_b, inter, (na + nb - inter) AS unions
          FROM p WHERE inter * 4 >= (na + nb - inter)
          ORDER BY doc_a, doc_b""",
    "dedup_ngram_jaccard_capped" ->
      s"""WITH w0 AS (SELECT doc_id, $WordsSql AS w FROM documents),
          s0 AS (SELECT doc_id, list_distinct($ShinglesSql) AS sset FROM w0),
          inv AS (SELECT doc_id, len(sset) AS nsh, unnest(sset) AS sh FROM s0),
          hot AS (SELECT sh FROM inv GROUP BY sh HAVING COUNT(*) > 8),
          cold AS (SELECT * FROM inv WHERE sh NOT IN (SELECT sh FROM hot)),
          p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.nsh AS na, b.nsh AS nb,
              COUNT(*) AS inter
            FROM cold a JOIN cold b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
          SELECT doc_a, doc_b, inter, (na + nb - inter) AS unions
          FROM p WHERE inter * 4 >= (na + nb - inter)
          ORDER BY doc_a, doc_b"""
  )
}
