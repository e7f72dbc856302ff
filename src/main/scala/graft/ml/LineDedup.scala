package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level duplicated-LINE removal — the CCNet-style paragraph dedup
  * step (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data": dedup on paragraph hashes across
  * shards): boilerplate lines that recur across many documents (nav bars,
  * cookie banners, copyright footers) are dropped from EVERY document,
  * while each document's unique content survives. This is different in
  * kind from the whole-document dedup family ([[TextDedup]]): no document
  * pair need be similar for the footer they share to be noise.
  *
  * Exact semantics (Spark ≡ the q46 DuckDB oracle):
  *   - lines = text split on '\n', trailing empties preserved
  *     (≡ `string_split(t, chr(10))`)
  *   - a line is dropped iff its exact occurrence count across the whole
  *     corpus exceeds `maxOcc`
  *   - each document is reassembled from its surviving lines in original
  *     order, joined by '\n'; documents with NO surviving line are dropped
  *
  * 100 TB shape: one partial-aggregated shuffle keyed by the line to count
  * occurrences; the over-threshold set is by construction the boilerplate
  * tail (tiny relative to the corpus — every member appears > maxOcc
  * times, so there are at most n_lines/maxOcc of them), so the removal
  * join is an AQE-broadcastable LEFT ANTI against that small set, and the
  * reassembly groupBy doc id is the only full-width shuffle. No sort, no
  * window, no all-pairs anything.
  */
object LineDedup {

  def dropFrequentLines(
      docs: DataFrame,
      maxOcc: Long,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxOcc >= 1, s"maxOcc must be >= 1, got $maxOcc")
    val lines = docs.select(
      col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    // the frequent (dropped) set: > maxOcc occurrences corpus-wide.
    // count(*) partial-aggregates map-side; the filtered result is the
    // small side of the anti-join below.
    val frequent = lines
      .groupBy(col("line"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > maxOcc)
      .select(col("line"))
    lines
      .join(frequent, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n").as(textCol))
  }
}
