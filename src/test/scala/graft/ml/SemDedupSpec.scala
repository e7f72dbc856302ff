package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[SemDedup]] — cluster-scoped embedding near-dup removal vs a naive
  * driver-side reference (seed centroids, argmax assignment, all
  * within-cluster pairs, keep-lowest-id). */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(rnd: scala.util.Random, dim: Int): Array[Float] =
    Array.fill(dim)(rnd.nextGaussian().toFloat)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** naive SemDeDup with seed centroids (lloydIters = 0). */
  private def naive(corpus: Seq[(Long, Array[Float])], nCentroids: Int, tau: Double): Set[Long] = {
    val cents = corpus.sortBy(_._1).take(nCentroids)
    def assign(v: Array[Float]): Long =
      cents.map { case (cid, cv) =>
        val norm = math.max(math.sqrt(cv.map(x => x.toDouble * x).sum), 1e-12)
        val dot = v.zip(cv).map { case (x, y) => x.toDouble * y.toDouble }.sum
        (dot / norm, cid)
      }.maxBy { case (s, cid) => (s, -cid) }._2
    val byCluster = corpus.groupBy { case (_, v) => assign(v) }
    val dropped = byCluster.values.flatMap { members =>
      for {
        (ia, va) <- members
        (ib, vb) <- members
        if ia < ib && cosine(va, vb) >= tau
      } yield ib
    }.toSet
    corpus.map(_._1).toSet -- dropped
  }

  test("planted twins drop, distinct vectors survive; matches the naive reference") {
    val rnd = new scala.util.Random(7L)
    val dim = 16
    val base = (0L until 40L).map(i => (i, vec(rnd, dim)))
    // twins: identical direction (scaled), so cosine == 1 within fp noise
    val twins = base.map { case (i, v) => (i + 1000L, v.map(x => x * 1.0009765625f)) }
    val corpus = base ++ twins
    val df = corpus.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val kept = SemDedup.semanticDedup(df, threshold = 0.95, nCentroids = 8, lloydIters = 0)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === naive(corpus, 8, 0.95))
    // every twin (greater id, same cluster as its base by scale invariance)
    // is gone; every base survives (random 16-dim gaussians never hit 0.95)
    assert(kept === base.map(_._1).toSet)
  }

  test("cluster scoping: near-dups in DIFFERENT clusters are not compared (published semantics)") {
    // two tight clusters around opposite axes + one cross-cluster near-dup
    // pair that argmax separates: the pair must NOT be dropped
    val e1 = Array.fill(8)(0f); e1(0) = 1f
    val e2 = Array.fill(8)(0f); e2(1) = 1f
    val mk = (base: Array[Float], eps: Float, j: Int) => {
      val v = base.clone(); v(j) = v(j) + eps; v
    }
    val corpus = Seq(
      (0L, e1), (1L, e2),                       // the two seed centroids
      (2L, mk(e1, 0.01f, 2)), (3L, mk(e1, 0.02f, 3)),  // cluster-0 members (near e1)
      (4L, mk(e2, 0.01f, 2))                           // cluster-1 member
    )
    val df = corpus.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val pairs = SemDedup.semanticNearDupPairs(df, threshold = 0.95, nCentroids = 2, lloydIters = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // within cluster 0: (0,2),(0,3),(2,3) all ~cos 1; within cluster 1: (1,4);
    // nothing across clusters
    assert(pairs === Set((0L, 2L), (0L, 3L), (2L, 3L), (1L, 4L)))
    val kept = SemDedup.semanticDedup(df, threshold = 0.95, nCentroids = 2, lloydIters = 0)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(0L, 1L))
  }

  test("lloyd-refined centroids still drop twins; survivors = lowest ids") {
    val rnd = new scala.util.Random(11L)
    val base = (0L until 30L).map(i => (i, vec(rnd, 12)))
    val twins = base.map { case (i, v) => (i + 500L, v.clone()) }
    val df = (base ++ twins).map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val kept = SemDedup.semanticDedup(df, threshold = 0.95, nCentroids = 4, lloydIters = 2)
      .select("vec_id").as[Long].collect().toSet
    // identical twins always share a cluster whatever the centroids are
    assert(kept === base.map(_._1).toSet)
  }
}
