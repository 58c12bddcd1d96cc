package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via alternating large-star / small-star rounds
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
  * Components in MapReduce and Beyond", SoCC'14): converges in O(log² n)
  * rounds on ANY graph — including the 10^12-node regime the naive
  * min-label propagation (O(diameter) rounds) cannot bound. Each round is
  * two shuffles (groupBy min + join), all standard hash exchanges.
  *
  * Node ids are BIGINT; the component label is the minimum id.
  *
  *   large-star(u): m = min(N(u) ∪ {u}); re-point every STRICTLY LARGER
  *     neighbor v > u at m (keeps the invariant that edges always connect a
  *     node to something ≤ it eventually).
  *   small-star(u): over edges oriented large→small (u > v): m = min(N(u) ∪
  *     {u}); re-point u and all its smaller neighbors at m.
  *
  * Fixpoint: every edge is (v, root) with root = component minimum. The
  * convergence probe is one count per round — bounded by the O(log² n)
  * round guarantee, unlike the naive propagation where a long path costs a
  * driver action per hop.
  */
object ConnectedComponents {

  /** Size-adaptive entry point (the AQE philosophy applied to the
    * algorithm choice): near-dup edge sets are usually tiny relative to
    * the corpus — below `smallGraphEdges` the whole graph fits in one
    * task, where a plain union-find finishes in ONE job instead of
    * O(log² n) shuffle rounds with driver probes. Above it, the
    * distributed large-star/small-star path runs. Both return identical
    * labels (min id per component).
    */
  def components(pairs: DataFrame, smallGraphEdges: Long = 1L << 20): DataFrame = {
    val cols = pairs.columns
    // Materialize the (possibly expensive — e.g. the Jaccard inverted-index
    // join) pair query ONCE: every consumer — the edge normalization, the
    // size probe, the node set, and the star rounds — derives from this
    // checkpointed frame. Deriving the node set from the raw `pairs` plan
    // re-ran the whole upstream query a second time at evaluation
    // (dedup_components paid the Jaccard build twice, measured round 3).
    val norm = pairs
      .select(col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
      .localCheckpoint()
    val edges = norm
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
    if (edges.count() <= smallGraphEdges) {
      // label every node of the ORIGINAL pair list (a node appearing only
      // in self-pairs has no surviving edge — it is its own component)
      val nodes = norm.select(col("u").as("id"))
        .union(norm.select(col("v").as("id"))).distinct()
      // broadcast the union-find labels: they are bounded by
      // smallGraphEdges (this branch's gate), while the plain join planned
      // sort-merge with an extra exchange+sort of the node set (round-6
      // plan audit: the only SMJ left in the dedup suite)
      nodes.join(broadcast(unionFindSingleTask(edges)), Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    } else largeSmallStar(norm) // NOT `edges`: largeSmallStar builds its
    // node set from its input, and `edges` has self-loops filtered out — a
    // node appearing only in self-pairs must still be labeled comp = id,
    // exactly as the small branch labels it
  }

  /** Single-task exact union-find over a small edge set (one narrow job —
    * the coalesce(1) is the point, not a smell: the input is bounded by
    * `smallGraphEdges`).
    */
  private def unionFindSingleTask(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("u"), col("v")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val ks = parent.keys.toArray // snapshot: find() only rewrites values
        ks.iterator.map(k => (k, find(k)))
      }
      .toDF("id", "comp")
  }

  /** @param pairs DataFrame with two BIGINT columns (src, dst), undirected
    *              edge list (self-loops/duplicates tolerated).
    * @return (id, comp) — one row per distinct node, comp = min id of its
    *         component.
    */
  def largeSmallStar(pairs: DataFrame, maxRounds: Int = 30): DataFrame = {
    val cols = pairs.columns
    // Each round is derived from the previous round's result — without
    // lineage truncation the logical plan doubles per round (two self-joins)
    // and the driver OOMs just PRINTING it. localCheckpoint materializes the
    // round and cuts the plan; at cluster scale swap in a reliable
    // `sparkContext.setCheckpointDir` + `.checkpoint()` for fault tolerance.
    var edges = pairs
      .select(col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    var nEdges = edges.count()

    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // ---- large-star: neighborhoods over BOTH orientations
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLarge = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m ⇒ stays large→small
        .distinct()

      // ---- small-star: edges already oriented large→small (u > v)
      val minsS = afterLarge.groupBy(col("u")).agg(min(col("v")).as("m"))
      val afterSmall = afterLarge.join(minsS, "u")
        .select(col("u"), col("v"), col("m"))
        .select(explode(array(
          struct(col("u"), col("m").as("v")),
          struct(col("v").as("u"), col("m").as("v")))).as("e"))
        .select(col("e.u"), col("e.v"))
        .where(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
        .localCheckpoint()

      // converged when the edge set is a fixpoint (star edges only). The
      // cheap count gate skips the set-equality job while the edge count is
      // still moving; probes are bounded by the O(log² n) round guarantee.
      val nOld = nEdges
      val nNew = afterSmall.count()
      converged = nNew == nOld &&
        afterSmall.union(edges).distinct().count() == nNew
      edges = afterSmall
      nEdges = nNew
      rounds += 1
    }

    // a non-converged exit would return non-star edges as labels — fail
    // loudly instead of silently mislabeling components
    require(converged,
      s"connected components did not converge in $maxRounds large/small-star rounds")

    val nodes = pairs.select(col(cols(0)).cast("long").as("id"))
      .union(pairs.select(col(cols(1)).cast("long").as("id"))).distinct()
    val labeled = edges.select(col("u").as("id"), col("v").as("comp"))
    nodes.join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
