package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", 2023): embedding-space
  * near-duplicate removal scoped to k-means clusters — cluster the
  * corpus, compare pairs only WITHIN a cluster, drop all but one of every
  * over-threshold group. Complements the text-space family
  * ([[TextDedup]]): paraphrases and translations share no shingles but do
  * share an embedding neighborhood; and unlike the global LSH bucketing
  * of [[Similarity.cosineNearDups]], the cluster scope is the published
  * method's semantics (and its blessing: candidate volume is
  * sum-of-squared-cluster-sizes, tunable via nCentroids).
  *
  * Dedup rule: within a cluster, every pair with cosine ≥ threshold marks
  * the GREATER id dropped (keep-lowest-id greedy — same rule as the
  * text near-dup stage; see [[WebTextPipeline]] for why that's sound for
  * chains and where [[DedupClusters]] upgrades it).
  *
  * 100 TB shape: centroids are driver-side KBs ([[Similarity
  * .trainCentroids]] — deterministic seeds + Lloyd passes, sampled via
  * trainModulo); assignment is the scan-side codegen'd argmax (zero
  * shuffle); the self-join shuffles (cid, id, vec) and compares within
  * clusters only, so cost concentrates where near-dups actually live.
  * Skewed megaclusters are the operator's known hazard — raise
  * nCentroids (the published recipe uses ~√n clusters) or pre-split on
  * an LSH bit, both config-level knobs.
  */
object SemDedup {

  /** Over-threshold within-cluster pairs (id_a < id_b) with their cosine
    * and shared cluster id. */
  def semanticNearDupPairs(
      corpus: DataFrame,
      threshold: Double = 0.95,
      nCentroids: Int = 16,
      lloydIters: Int = 1,
      trainModulo: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
    val train =
      if (trainModulo <= 1) c else c.where(pmod(col("nbr_id"), lit(trainModulo)) === 0)
    val centroids = Similarity.trainCentroids(train, c, nCentroids, lloydIters)
    val assigned = c.select(
      Similarity.nearestCid(col("nbr_vec"), centroids).as("cid"),
      col("nbr_id").as("id"), col("nbr_vec").as("vec"))
    val a = assigned.select(col("cid"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = assigned.select(col("cid"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("cid"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= threshold)
      .select("cid", "id_a", "id_b", "cosine")
  }

  /** The kept corpus: rows whose id is never the greater side of an
    * over-threshold within-cluster pair. */
  def semanticDedup(
      corpus: DataFrame,
      threshold: Double = 0.95,
      nCentroids: Int = 16,
      lloydIters: Int = 1,
      trainModulo: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dropped = semanticNearDupPairs(
      corpus, threshold, nCentroids, lloydIters, trainModulo, idCol, vecCol)
      .select(col("id_b").as(idCol))
      .distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }
}
