package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call webtext curation: the standard training-data cleaning recipe
  * (exact dedup → near-dup removal → quality gate → language filter)
  * composed from this package's operators into a single pipeline with a
  * per-stage audit trail — the operation a corpus consumer actually runs
  * over `extracted`/`documents`.
  *
  * Scale shape: each stage is one of the already-scale-shaped operators
  * (hash-key shuffles, banded candidate generation, scalar codegen'd
  * expressions); the near-dup removal keeps the LOWEST doc id of every
  * duplicate pair (the standard greedy rule — pair lists, not connected
  * components, so no iterative join; a transitive chain a~b~c with a<b<c
  * drops b and c either way).
  */
object WebTextPipeline {

  final case class Config(
      /** drop exact duplicates (whitespace/case-normalized text). */
      exactDedup: Boolean = true,
      /** MinHash-LSH near-dup removal; 0 disables. */
      minhashThreshold: Double = 0.8,
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      /** quality gate: minimum token count (0 disables). */
      minTokens: Int = 10,
      /** quality gate: minimum stopword ratio (0 disables) — prose, not
        * boilerplate/code, per the usual webtext heuristics. */
      minStopwordRatio: Double = 0.0,
      /** keep only these langid codes (empty = keep all). */
      keepLangs: Seq[String] = Seq.empty)

  final case class StageCount(stage: String, kept: Long, dropped: Long)

  /** Curate `docs` (idCol, textCol). Returns (kept corpus, audit rows in
    * stage order). The audit materializes one count per stage — driver-side
    * metadata, not a per-row collect.
    *
    * Each stage's output is persisted before it is counted and the previous
    * stage's cache released (round-4 advisor: an uncached chain recomputed
    * every stage's full upstream — including the MinHash LSH self-join —
    * once per later stage count and once more when the caller acted on the
    * returned corpus, up to ~4× of the costliest stage, silently). The
    * RETURNED corpus is the final stage's persisted frame: the caller's
    * first action reads the cache; call `unpersist()` on it when done. */
  def curate(
      docs: DataFrame,
      cfg: Config = Config(),
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, Seq[StageCount]) = {
    val audit = scala.collection.mutable.ArrayBuffer.empty[StageCount]
    var current = docs
    var persisted: Option[DataFrame] = None
    var n = current.count()

    def record(stage: String, next0: DataFrame): Unit = {
      val next = next0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val kept = next.count() // materializes the cache
      persisted.foreach(_.unpersist())
      persisted = Some(next)
      audit += StageCount(stage, kept, n - kept)
      current = next
      n = kept
    }

    if (cfg.exactDedup)
      record("exact_dedup", TextDedup.exactDedup(current, idCol, textCol))

    if (cfg.minhashThreshold > 0) {
      val pairs = TextDedup.minhashNearDups(
        current, idCol, textCol,
        cfg.shingleWidth, cfg.numHashes, cfg.bands, cfg.minhashThreshold)
      // keep-lowest-id: every id that appears as the GREATER side of a
      // near-dup pair is dropped (id_a < id_b by construction)
      record("minhash_neardup",
        current.join(
          pairs.select(col("id_b").as(idCol)).distinct(),
          Seq(idCol), "left_anti"))
    }

    if (cfg.minTokens > 0 || cfg.minStopwordRatio > 0) {
      val f = TextAnalysis.qualityFeatures(col(textCol))
      record("quality_gate",
        current
          .withColumn("_q", f)
          .where(
            (col("_q.n_tokens") >= cfg.minTokens) &&
              (col("_q.stopword_ratio") >= cfg.minStopwordRatio))
          .drop("_q"))
    }

    if (cfg.keepLangs.nonEmpty)
      record("lang_filter",
        current.where(TextAnalysis.langId(col(textCol)).isin(cfg.keepLangs: _*)))

    (current, audit.toSeq)
  }
}
