package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native curation: the webtext stages as continuous operators
  * over a document stream (the shape a live crawl feeds — extracted pages
  * arriving per tick, curated incrementally instead of in one offline
  * batch job).
  *
  * Stateless stages (enrichment, quality/model/lang gates, PII redaction)
  * are the SAME codegen'd expressions the batch pipeline uses — a
  * streaming DataFrame accepts them unchanged, so batch ≡ streaming is by
  * construction and the spec asserts it. Deduplication is the one stage
  * that needs cross-batch STATE: [[streamingExactDedup]] carries the
  * corpus's seen-fingerprint set in `flatMapGroupsWithState`, the
  * documents-table analog of the crawl's URL seen-set.
  *
  * 100 TB shape: state is one tiny marker row per DISTINCT normalized
  * text, hash-partitioned by the state key — the same scaling argument as
  * the crawl seen-set (state volume ∝ distinct corpus, not stream
  * length); the stateless stages are scan-side expressions with no state
  * at all.
  */
object StreamingCurate {

  final case class DocIn(doc_id: Long, text: String)
  final case class Seen(first_id: Long)

  /** Stateless enrichment over a (possibly streaming) documents frame —
    * the batch pipeline's per-doc columns, streaming-safe by construction:
    * quality features + language id (fused [[graft.ml.AnalyzeText]]
    * kernel), model score ([[graft.ml.QualityModel]]), fingerprint. */
  def enrichStream(docs: DataFrame, textCol: String = "text", modelSeed: String = "quality"): DataFrame =
    docs
      .withColumn("features", graft.ml.TextAnalysis.qualityFeatures(col(textCol)))
      .withColumn("quality_ok", graft.ml.TextAnalysis.qualityOk(col(textCol)))
      .withColumn("lang_id", graft.ml.TextAnalysis.langId(col(textCol)))
      .withColumn("model_score",
        graft.ml.QualityModelFunctions.quality_score(col(textCol), modelSeed).getField("score"))
      .withColumn("fingerprint", graft.ml.TextHashFunctions.doc_fingerprint(col(textCol)))

  /** Cross-batch exact dedup over a document stream: FIRST-ARRIVAL-WINS —
    * within a micro-batch the min doc_id of each normalized-text group
    * survives (the batch [[graft.ml.TextDedup.exactDedup]] rule); across
    * micro-batches the group's first batch wins and every later duplicate
    * is dropped by the carried state. Exactly one survivor per distinct
    * normalized text over the whole stream. (Batch-min-id and
    * streaming-first-arrival coincide whenever a group's min id arrives in
    * its earliest batch — in particular for any single-batch replay.) */
  def streamingExactDedup(docs: Dataset[DocIn]): Dataset[DocIn] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey { d =>
        // md5 of the normalized text — the same 128-bit key (and therefore
        // the same collision posture) as the batch exactDedup group key
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(graft.ml.TextEnrich.normText(d.text)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.util.HexFormat.of().formatHex(h)
      }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[DocIn], state: GroupState[Seen]) => {
          if (state.exists) Iterator.empty
          else {
            val keep = rows.minBy(_.doc_id)
            state.update(Seen(keep.doc_id))
            Iterator.single(keep)
          }
        })
  }
}
