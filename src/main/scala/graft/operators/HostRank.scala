package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** OPIC-style host importance for frontier prioritization.
  *
  * A crawl scheduler needs a link-importance signal to decide WHICH
  * pending URLs to spend the politeness budget on — the reference's
  * fixed "first 5 in DOM order" (scrape-pdfs-from-website/lambda.ts:76-78)
  * generalizes at web scale to priority ordering (SURVEY §2 op-5;
  * `frontier.priority` is already in the schema). The standard crawl-time
  * choice is OPIC (Abiteboul, Preda, Cobena, "Adaptive On-Line Page
  * Importance Computation", WWW 2003): iterate cash/importance over the
  * host graph — PageRank-shaped, but computable incrementally while
  * crawling.
  *
  * This implementation runs the propagation in EXACT INTEGER arithmetic
  * (fixed-point, `scale` units = importance 1.0, damping = dampNum/dampDen,
  * floor division): integer sums are associative/commutative, so the
  * result is bit-identical regardless of partitioning, shuffle order, or
  * engine — the property that makes it DuckDB-oracle-able (q43) AND makes
  * reruns/resumes reproducible on a cluster, where float reduction order
  * is nondeterministic. At scale=1e6 the quantization error per edge is
  * < 1e-6 of an importance unit — far below anything a scheduler acts on.
  *
  * 100 TB shape: the HOST graph, not the URL graph — hosts are ~1e7-1e8
  * at web scale (vs 1e10+ URLs), so edges (8+8 bytes) and ranks (8+8)
  * are small tables; each iteration is one shuffle join on the 8-byte
  * src key + one sum-aggregate on dst + one outer join back onto hosts.
  * Out-degrees are computed once and persisted with the edge list. The
  * rank table re-joins `frontier` on `host` as a broadcast in the
  * scheduler (ranks ≪ frontier).
  *
  * Dangling hosts (no out-edges) keep receiving the base share and leak
  * their damped mass — the "sink drop" OPIC variant; fine for a relative
  * priority signal (documented, matching the oracle exactly).
  */
object HostRank {

  /** Iterative integer OPIC over an edge list (`srcCol`, `dstCol`).
    * Duplicate edges are collapsed (a host linking another host many times
    * counts once — standard host-graph practice). Self-loops dropped.
    * Returns (`host` LONG, `rank` LONG) for every host appearing as src
    * or dst, where rank after `iters` rounds of
    *
    *   rank_0(h)   = scale
    *   rank_i+1(h) = (scale * (dampDen - dampNum)) div dampDen
    *               + (dampNum * Σ_{(s,h) ∈ E} (rank_i(s) div outdeg(s)))
    *                 div dampDen
    */
  def hostRank(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iters: Int = 3,
      scale: Long = 1000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen)
    val spark = edges.sparkSession
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize + count the edge list once (cache-side, cheap), then size
    // every shuffle of the iteration chain to that count
    // (AdaptiveShuffle): the chain is (long, long) joins/aggregates whose
    // per-stage data is tiny relative to the session's corpus-sized shuffle
    // partitioning — measured >50% of q43's wall time was near-empty-task
    // scheduling at sf0.1 (guide §2: derive partitioning from input size)
    val nEdges = e.count()
    graft.util.AdaptiveShuffle.withPartitionsForRows(spark, nEdges) {
      val hosts = e.select(col("src").as("host"))
        .unionByName(e.select(col("dst").as("host")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val base = (scale * (dampDen - dampNum)) / dampDen

      var ranks = hosts.select(col("host"), lit(scale).as("rank"))
      var i = 0
      while (i < iters) {
        val contrib = e
          .join(outdeg, Seq("src"))
          .join(ranks.select(col("host").as("src"), col("rank")), Seq("src"))
          .select(col("dst").as("host"), expr("rank div outdeg").as("c"))
          .groupBy("host")
          .agg(sum(col("c")).as("inflow"))
        ranks = hosts
          .join(contrib, Seq("host"), "left")
          .select(col("host"),
            (lit(base) + expr(s"(${dampNum}L * coalesce(inflow, 0L)) div ${dampDen}L"))
              .as("rank"))
        i += 1
        // no per-round action here (unlike DedupClusters' convergence probe),
        // so intermediate materialization is pure overhead for small iters;
        // checkpoint only every few rounds to bound plan depth/codegen size
        // on long runs while letting short runs execute as ONE fused job
        if (i % math.max(1, checkpointEvery) == 0 && i < iters)
          ranks = ranks.localCheckpoint(true)
      }
      // materialize ONCE (the whole remaining chain fuses into this job)
      // before releasing the cached edge/degree tables it references
      val out = ranks.localCheckpoint(true)
      e.unpersist(); hosts.unpersist(); outdeg.unpersist()
      out
    }
  }

  /** Attach a rank-derived priority to a frontier frame on its host hash:
    * priority = rank / scale (double, for ordering only — the exact signal
    * stays in `rank`). The rank table is tiny → broadcast join. */
  def prioritize(
      frontier: DataFrame,
      ranks: DataFrame,
      hostHashCol: String = "host_hash"): DataFrame =
    frontier.join(
      broadcast(ranks.select(col("host").as(hostHashCol), col("rank").as("host_rank"))),
      Seq(hostHashCol), "left")
      .withColumn("host_rank", coalesce(col("host_rank"), lit(0L)))
}
