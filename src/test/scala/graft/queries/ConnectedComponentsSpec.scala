package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference: driver-side union-find. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val expect = unionFind(edges)
    // distributed path (threshold 0 forces large/small-star)
    val star = ConnectedComponents.components(edges.toDF("src", "dst"), smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(star == expect)
    // small-graph path (single-task union-find)
    val small = ConnectedComponents.components(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(small == expect)
  }

  test("long chain converges (the case naive propagation pays diameter rounds for)") {
    // path 0-1-2-...-199: one component rooted at 0
    check((0L until 199L).map(i => (i, i + 1)))
  }

  test("chain given in adversarial decreasing order") {
    check((0L until 199L).map(i => (i + 1, i)).reverse)
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 120
      val edges = Seq.fill(130)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      check(edges)
    }
  }

  test("star, cliques, isolated self-pair mix") {
    val star = (1L to 30L).map(i => (0L, i))
    val clique = for (a <- 40L to 45L; b <- 40L to 45L if a < b) yield (a, b)
    val bridge = Seq((30L, 40L))
    check(star ++ clique ++ bridge)
  }

  test("bounded rounds: chain of 512 stays under the maxRounds guard") {
    import spark.implicits._
    val edges = (0L until 511L).map(i => (i, i + 1)).toDF("src", "dst")
    // would blow the 30-round guard under naive propagation (diameter 511);
    // large/small-star needs O(log^2 n) ~ well under 30
    val labels = ConnectedComponents.largeSmallStar(edges, maxRounds = 30)
    assert(labels.where("comp <> 0").count() == 0)
    assert(labels.count() == 512)
  }
}
