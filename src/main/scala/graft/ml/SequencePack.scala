package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-window sequence packing — the final step between a curated
  * corpus and a training run: documents are concatenated in a
  * deterministic order and cut into fixed `budget`-token windows,
  * documents SPLITTING across window boundaries (the GPT-style "pack then
  * chunk" recipe — no padding waste, every window exactly full). The
  * output is the (window, doc, token-span) MAP: which token range of
  * which document lands in which window — the artifact a loader needs to
  * assemble windows, and the lineage a contamination audit needs to
  * answer "which windows did document X reach".
  *
  * Exact shared semantics (Spark ≡ DuckDB oracle, q57):
  *   tokens    = the engine-wide norm/split count (empties preserved,
  *               always ≥ 1)
  *   order     = (packCol, idCol) ascending — packing is scoped PER PACK
  *               KEY (e.g. source): packs are independent, so no global
  *               total order exists anywhere
  *   start(d)  = Σ tokens of earlier docs in the pack (exclusive prefix)
  *   windows   = doc d overlaps windows floor(start/B) .. floor((end-1)/B)
  *   span      = within window w, d contributes doc-token range
  *               [max(wB - start, 0), min((w+1)B - start, n))
  * Every window of a pack except its last holds exactly B tokens; doc
  * spans tile each document exactly once.
  *
  * 100 TB shape: one prefix-sum window per pack key (the only shuffle —
  * hash-partitioned by pack key, sorted within; packs are independent so
  * there is NO global sort bottleneck), then a scan-side explode of each
  * doc into its (usually 1–2) overlapping windows. Skewed pack keys are
  * the operator's one hazard — pick a pack key with bounded cardinality
  * per partition (source, shard, date), or pre-salt a megapack upstream.
  */
object SequencePack {

  /** Map each doc to its training windows. Output: all of `docs`' columns
    * except `textCol`, plus `n_tokens`, `window_idx` (0-based within the
    * pack), `tok_from` (inclusive, 0-based within the doc), `tok_to`
    * (exclusive). */
  def packWindows(
      docs: DataFrame,
      budget: Int,
      packCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val n: Column = size(split(TextDedup.normText(col(textCol)), " ", -1)).cast("long")
    val w = Window.partitionBy(col(packCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val passthrough = docs.columns.filter(_ != textCol).map(col).toSeq
    val B = lit(budget.toLong)
    docs
      .select((passthrough :+ n.as("n_tokens")): _*)
      .withColumn("_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("_firstWin", expr("CAST(_start DIV " + budget + " AS BIGINT)"))
      .withColumn("_lastWin", expr(s"CAST((_start + n_tokens - 1) DIV $budget AS BIGINT)"))
      .withColumn("window_idx", explode(sequence(col("_firstWin"), col("_lastWin"))))
      .withColumn("tok_from", greatest(col("window_idx") * B - col("_start"), lit(0L)))
      .withColumn("tok_to", least((col("window_idx") + 1) * B - col("_start"), col("n_tokens")))
      .drop("_start", "_firstWin", "_lastWin")
  }

  /** Materialize the actual window text from the [[packWindows]] map: each
    * window's token sequence is its docs' spans concatenated in pack
    * order. Output: (packCol, window_idx, window_text, window_tokens).
    *
    * Shape: the map's explode output re-slices each doc's token array
    * scan-side (`slice` on the split — tokens are computed once per doc
    * row), then ONE shuffle groups the 1-2 pieces per (pack, window);
    * ordering inside a window is by doc id (total: a doc contributes at
    * most one piece per window). */
  def assembleWindows(
      docs: DataFrame,
      budget: Int,
      packCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val mapped = packWindows(docs.withColumn("_toks",
        split(TextDedup.normText(col(textCol)), " ", -1)), budget, packCol, idCol, textCol)
    mapped
      .withColumn("_piece",
        array_join(slice(col("_toks"), col("tok_from") + 1, col("tok_to") - col("tok_from")), " "))
      .groupBy(col(packCol), col("window_idx"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol).as("id"), col("_piece").as("p")))),
            x => x.getField("p")),
          " ").as("window_text"),
        sum(col("tok_to") - col("tok_from")).as("window_tokens"))
  }
}
