package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the "remove training documents that
  * overlap the eval sets" step every serious LLM data pipeline runs
  * (n-gram-overlap decontamination as described in the GPT-3 appendix and
  * successors): a training document is contaminated iff it shares at
  * least one width-n token gram with any benchmark document.
  *
  * Exact semantics (Spark ≡ the q49 DuckDB oracle): grams use the
  * [[TextRepetition]] norm/split/join pipeline (normText → split on
  * single spaces preserving empties → n consecutive tokens joined by
  * ' '); `n_hits` counts the document's gram POSITIONS (not distinct
  * grams) that appear in the benchmark's distinct gram set.
  *
  * 100 TB shape: the benchmark side is eval sets — thousands of docs, not
  * billions — so its distinct gram set is a broadcast dimension (hint on
  * by default); the corpus side is then scan → scan-side codegen'd gram
  * array → explode → broadcast semi-join → per-doc count: ZERO wide
  * shuffles of corpus data (the count groupBy keys on doc id, which
  * partial-aggregates to one row per doc per task). With `broadcastBench
  * = false` the joins fall back to AQE-planned shuffles for
  * pathologically large benchmark sets.
  */
object Decontaminate {

  /** Per-document contaminated-gram counts: (idCol, n_hits, contaminated)
    * for EVERY input doc (n_hits = 0 for clean ones). */
  def contaminationCounts(
      docs: DataFrame,
      bench: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
      benchTextCol: String = "text",
      broadcastBench: Boolean = true): DataFrame = {
    import TextRepetitionFunctions.token_ngrams
    val benchGrams0 = bench
      .select(explode(token_ngrams(col(benchTextCol), n)).as("gram"))
      .distinct()
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    val hits = docs
      .select(col(idCol), explode(token_ngrams(col(textCol), n)).as("gram"))
      .join(benchGrams, Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", (col("n_hits") > 0).cast("int"))
  }

  /** The decontaminated corpus: input docs minus contaminated ones. */
  def clean(
      docs: DataFrame,
      bench: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text",
      benchTextCol: String = "text",
      broadcastBench: Boolean = true): DataFrame = {
    val dropped = contaminationCounts(
      docs, bench, n, idCol, textCol, benchTextCol, broadcastBench)
      .where(col("contaminated") === 1)
      .select(col(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }
}
