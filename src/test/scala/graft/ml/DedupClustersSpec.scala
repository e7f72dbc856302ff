package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[DedupClusters]] — transitive-correct near-dup clustering.
  *
  * The semantics oracle throughout is a literal driver-side union-find over
  * the same edge list, so the iterative DataFrame loop (min propagation +
  * pointer jumping) is checked against an independent sequential
  * implementation, not against itself.
  */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side union-find: component = min vertex id. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  private def runComponents(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupClusters.components(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("components == union-find on a multi-component graph with a transitive star") {
    // {1,2,3} via hub 3 (the greedy-rule counterexample: 1~3, 2~3 but no
    // direct 1~2 edge), {10,11}, {20} isolated-by-self-loop-free absence
    val edges = Seq((1L, 3L), (2L, 3L), (10L, 11L), (11L, 10L), (5L, 5L))
    val got = runComponents(edges)
    val want = ufComponents(edges.filter(e => e._1 != e._2))
    assert(got == want)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L, "transitive cluster keeps one min")
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(!got.contains(5L), "self-loops contribute no vertex")
  }

  test("long chain (diameter 63) converges well under maxIter via pointer jumping") {
    val chain = (0L until 63L).map(v => (v, v + 1))
    val got = runComponents(chain)
    assert(got.size == 64 && got.values.forall(_ == 0L))
    // explicit low iteration cap: pointer jumping must converge a
    // diameter-63 chain in O(log n) rounds, not O(n)
    val capped = DedupClusters.components(chain.toDF("id_a", "id_b"), maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(capped == got)
  }

  test("components matches union-find on a random graph, any partitioning") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    val want = ufComponents(edges)
    assert(runComponents(edges) == want)
    val repart = DedupClusters.components(
      edges.toDF("id_a", "id_b").repartition(7)).as[(Long, Long)].collect().toMap
    assert(repart == want, "result must not depend on partitioning")
  }

  test("assignComponents: isolated docs keep their own id as comp") {
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val edges = Seq((1L, 3L)).toDF("id_a", "id_b")
    val got = DedupClusters.assignComponents(docs, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 9L -> 9L))
  }

  test("minhashComponentDedup keeps exactly one representative per transitive cluster") {
    // A/B/C identical => pairwise pairs => one cluster; D unique survives;
    // E/F identical => second cluster
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t2 = "completely different content about spark shuffles and parquet files"
    val t3 = "a third unrelated document mentioning robots politeness and frontiers"
    val docs = Seq(
      (1L, t1), (2L, t1), (3L, t1),
      (4L, t2),
      (5L, t3), (6L, t3)).toDF("doc_id", "text")
    val kept = DedupClusters.minhashComponentDedup(docs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L))
  }

  test("greedy pair-dedup counterexample: components keep ONE of a hub cluster") {
    // hub graph {(1,3),(2,3)}: greedy (drop every greater pair side) keeps
    // {1,2} — two docs from one duplicate cluster; components keep {1}
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val greedyKept = docs
      .join(pairs.select(col("id_b").as("doc_id")), Seq("doc_id"), "left_anti")
      .as[Long].collect().sorted
    assert(greedyKept.toSeq == Seq(1L, 2L), "greedy over-keeps (the documented flaw)")
    val comps = DedupClusters.assignComponents(docs, pairs)
    val compKept = comps.where(col("doc_id") === col("comp"))
      .select("doc_id").as[Long].collect().sorted
    assert(compKept.toSeq == Seq(1L), "components keep exactly the min id")
  }
}
