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
  * expressions); the default near-dup removal keeps the LOWEST doc id of
  * every duplicate pair (the greedy rule — one anti-join, no iterative
  * join; a transitive chain a~b~c with a<b<c drops b and c either way).
  * `Config.componentDedup` upgrades it to transitive-correct
  * connected-components clustering ([[DedupClusters]]): for hub-shaped
  * pair sets {(a,c),(b,c)} greedy keeps BOTH a and b from one duplicate
  * cluster; components keep exactly the min-id representative, at the
  * cost of O(log diameter) extra (long, long) shuffles.
  */
object WebTextPipeline {

  final case class Config(
      /** corpus-level duplicated-line removal ([[LineDedup]], CCNet-style
        * paragraph dedup) BEFORE whole-document dedup — so documents that
        * differ only by shared boilerplate collapse to exact duplicates;
        * 0 disables. */
      maxLineOcc: Long = 0L,
      /** drop exact duplicates (whitespace/case-normalized text). */
      exactDedup: Boolean = true,
      /** MinHash-LSH near-dup removal; 0 disables. */
      minhashThreshold: Double = 0.8,
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      /** transitive-correct near-dup clustering (connected components over
        * the pair graph, keep min-id per cluster) instead of the greedy
        * drop-greater-pair-side rule. */
      componentDedup: Boolean = false,
      /** quality gate: minimum token count (0 disables). */
      minTokens: Int = 10,
      /** quality gate: minimum stopword ratio (0 disables) — prose, not
        * boilerplate/code, per the usual webtext heuristics. */
      minStopwordRatio: Double = 0.0,
      /** repetition gate (Gopher §A1.1 family, [[TextRepetition]]):
        * max fraction of duplicate tokens `1 - distinct/n`; >=1 disables. */
      maxDupTokenFrac: Double = 1.0,
      /** repetition gate: max fraction of bigrams that are the single most
        * common bigram `top_bigram_count / n_bigrams`; >=1 disables. */
      maxTopBigramFrac: Double = 1.0,
      /** keep only these langid codes (empty = keep all). */
      keepLangs: Seq[String] = Seq.empty,
      /** model-based quality gate ([[QualityModel]], the CCNet/GPT-3
        * classifier-filter stage): keep docs whose hashed-linear score
        * exceeds the threshold. Thresholds are corpus-calibrated offline
        * (the score is an exact int64, so a calibrated cut is
        * reproducible). None disables. */
      modelMinScore: Option[Long] = None,
      /** weight-table name for the model gate (seed of the hash-derived
        * weights; a learned table swaps in without a plan change). */
      modelSeed: String = "quality",
      /** redact emails/ipv4s/phones from the surviving corpus as the final
        * stage ([[PiiScrub]]) — a pure projection, drops nothing. */
      piiRedact: Boolean = false)

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

    if (cfg.maxLineOcc > 0) {
      // the reassembly rewrites textCol and keeps only (id, text); other
      // payload columns rejoin by id (inner: fully-boilerplate docs drop)
      val rebuilt = LineDedup.dropFrequentLines(
        current.select(col(idCol), col(textCol)), cfg.maxLineOcc, idCol, textCol)
      record("line_dedup",
        if (current.columns.length == 2) rebuilt
        else current.drop(textCol).join(rebuilt, Seq(idCol)))
    }

    if (cfg.exactDedup)
      record("exact_dedup", TextDedup.exactDedup(current, idCol, textCol))

    if (cfg.minhashThreshold > 0) {
      val pairs = TextDedup.minhashNearDups(
        current, idCol, textCol,
        cfg.shingleWidth, cfg.numHashes, cfg.bands, cfg.minhashThreshold)
      if (cfg.componentDedup) {
        // transitive closure: survivors = untouched docs + each duplicate
        // cluster's min-id representative
        val labels = DedupClusters.components(pairs)
        record("minhash_neardup",
          current
            .join(labels.select(col("id").as(idCol)), Seq(idCol), "left_anti")
            .unionByName(current.join(
              labels.where(col("id") === col("comp")).select(col("id").as(idCol)),
              Seq(idCol), "left_semi")))
      } else
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

    if (cfg.maxDupTokenFrac < 1.0 || cfg.maxTopBigramFrac < 1.0) {
      val r = TextRepetitionFunctions.repetition_stats(col(textCol))
      record("repetition_gate",
        current
          .withColumn("_r", r)
          .where(
            (lit(1.0) - col("_r.n_distinct_tokens") /
              greatest(col("_r.n_tokens"), lit(1)) <= cfg.maxDupTokenFrac) &&
              (col("_r.top_bigram_count") /
                greatest(col("_r.n_bigrams"), lit(1)) <= cfg.maxTopBigramFrac))
          .drop("_r"))
    }

    if (cfg.keepLangs.nonEmpty)
      record("lang_filter",
        current.where(TextAnalysis.langId(col(textCol)).isin(cfg.keepLangs: _*)))

    cfg.modelMinScore.foreach { minScore =>
      record("model_gate",
        current.where(
          QualityModelFunctions.quality_score(col(textCol), cfg.modelSeed)
            .getField("score") > minScore))
    }

    if (cfg.piiRedact)
      record("pii_redact",
        current.withColumn(
          textCol,
          PiiScrubFunctions.pii_scrub(col(textCol)).getField("redacted")))

    (current, audit.toSeq)
  }
}
