package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[HostRank]] — integer OPIC host importance. Oracle = a literal
  * sequential simulator of the documented recurrence (same integer floor
  * divisions), so the distributed loop is checked against an independent
  * driver-side implementation.
  */
class HostRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Literal sequential rendering of the scaladoc recurrence. */
  private def simRank(
      rawEdges: Seq[(Long, Long)],
      iters: Int,
      scale: Long = 1000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): Map[Long, Long] = {
    val e = rawEdges.filter(p => p._1 != p._2).distinct
    val hosts = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = scale * (dampDen - dampNum) / dampDen
    var rank = hosts.map(_ -> scale).toMap
    for (_ <- 0 until iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      e.foreach { case (s, d) => inflow(d) += rank(s) / outdeg(s) }
      rank = hosts.map(h => h -> (base + dampNum * inflow(h) / dampDen)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    HostRank.hostRank(edges.toDF("src", "dst"), iters = iters)
      .as[(Long, Long)].collect().toMap

  test("3 iterations == literal simulator on a graph with dups, self-loops, dangling") {
    val edges = Seq(
      (1L, 2L), (1L, 2L), (1L, 3L),   // dup edge collapses
      (2L, 3L), (3L, 1L),
      (4L, 4L),                        // self-loop dropped entirely
      (5L, 1L))                        // 5 is dangling-in only after: 5->1, nothing -> 5? no: 5 has out-edge; 3->1 cycle
    val got = run(edges, 3)
    val want = simRank(edges, 3)
    assert(got == want)
    assert(!got.contains(4L), "pure-self-loop host has no edges left")
  }

  test("iters=0 is the uniform seed; dangling-in host gets only the base share") {
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(run(edges, 0) == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    val r1 = run(edges, 1)
    // host 1 receives nothing: base share only = 1e6 * 15/100
    assert(r1(1L) == 150000L)
    assert(r1 == simRank(edges, 1))
  }

  test("result is bit-identical across partitionings (integer arithmetic)") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val want = simRank(edges, 4)
    assert(run(edges, 4) == want)
    val repart = HostRank.hostRank(edges.toDF("src", "dst").repartition(11), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(repart == want)
  }

  test("prioritize broadcasts ranks onto the frontier, 0 for unranked hosts") {
    val frontier = Seq((10L, "a"), (20L, "b"), (99L, "c")).toDF("host_hash", "url")
    val ranks = Seq((10L, 5000L), (20L, 150L)).toDF("host", "rank")
    val got = HostRank.prioritize(frontier, ranks)
      .select(col("url"), col("host_rank")).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 5000L, "b" -> 150L, "c" -> 0L))
  }
}
