package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword relevance search over the corpus — the inverted-index path a
  * data pipeline uses to QUERY what it built (targeted subset pulls,
  * contamination spot checks, eval-set mining). BM25-shaped scoring with
  * the float hazard removed: the inverse-document-frequency weight is the
  * exact integer `floor(SCALE · N / df)` instead of a log — engines
  * disagree in the last ulp of `log()`/`pow()`, and a rank oracle that
  * flips on 1-ulp ties is no oracle. Monotone in 1/df like the log form,
  * bit-identical everywhere (q55's DuckDB oracle recomputes every score).
  *
  * Exact shared semantics: tokens = the engine-wide norm/split
  * (lower/trim/collapse, empties preserved); tf = within-doc term
  * multiplicity; df = number of docs containing the term; score(q, d) =
  * Σ over DISTINCT query terms t present in d of `tf(t,d) · w(t)`.
  *
  * 100 TB shape:
  *  - [[postings]]: one explode (scan-side) + one partial-aggregated
  *    shuffle on (term, doc) — carrying only (term, doc_id, tf).
  *  - document frequency folds from postings by term (map-side combine).
  *  - the query set is config-sized → broadcast semi-join prunes the
  *    postings scan to matching terms before anything wide.
  *  - top-k per query is a rank window on (query, score) — pre-shuffle
  *    WindowGroupLimit forwards ≤ k rows per query per map task, the
  *    politeness-budget skew defense.
  */
object KeywordSearch {

  val Scale = 1000000L

  private def tokens(textCol: Column): Column =
    split(TextDedup.normText(textCol), " ", -1)

  /** Inverted index: (term, doc_id, tf). */
  def postings(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Top-k docs per query by exact integer relevance.
    * `queries` = (query_id, query text) pairs, config-sized.
    * Output: (query_id, doc_id, score, rank). */
  def searchTopK(
      docs: DataFrame,
      queries: Seq[(String, String)],
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(queries.nonEmpty, "at least one query")
    val spark = docs.sparkSession

    // distinct query terms, tokenized with the engine-wide semantics
    // (driver-side: the query set is config, not data)
    val qTerms = queries.flatMap { case (qid, text) =>
      val norm = TextEnrich.normText(text)
      norm.split(" ", -1).toSeq.distinct.map(t => (qid, t))
    }
    val qDf = spark.createDataFrame(qTerms).toDF("query_id", "term")

    // prune BEFORE aggregating: the query-term set is config-sized, so the
    // term filter is a scan-side isin predicate on the exploded tokens —
    // the (term, doc) shuffle then carries only query-relevant postings
    // instead of the corpus's full vocabulary (an ad-hoc search must not
    // pay the full-index build; `postings` remains for consumers that DO
    // want the index materialized)
    val qTermSet = qTerms.map(_._2).distinct
    val posts = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .where(col("term").isin(qTermSet: _*))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))
    val matched = posts.join(broadcast(qDf), Seq("term"))
    val df = matched.groupBy(col("term")).agg(countDistinct(col(idCol)).as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val scored = matched
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      // exact int64 division (DIV) — floor(double /) can land one off when
      // the true quotient sits on an integer boundary
      .withColumn("w", expr(s"CAST(($Scale * n_docs) DIV df AS BIGINT)"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("tf") * col("w")).as("score"))

    val rankW = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(rankW))
      .where(col("rank") <= k)
  }
}
