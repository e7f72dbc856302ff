package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window chunking — the sequence-preparation step between curation
  * and training: long documents are cut into overlapping fixed-width token
  * windows (width = the model's context budget, stride < width keeps
  * cross-boundary context), short documents pass through as one chunk.
  * Every published LM data pipeline ends with a version of this; it is
  * also the unit ANN/embedding jobs index ("passages").
  *
  * Exact shared semantics (Spark plan ≡ DuckDB oracle, q51):
  *   norm      = regexp_replace(lower(trim(text)), '\s+', ' ')
  *   tokens    = norm split on single spaces, empties preserved
  *   n_chunks  = 1                       if n_tokens <= width
  *               1 + ceil((n_tokens - width) / stride)   otherwise
  *   chunk i   = tokens[i·stride , min(i·stride + width, n)) joined by ' '
  * The last chunk may be shorter than `width` but is never empty, and
  * every token appears in at least one chunk.
  *
  * 100 TB shape: a scan-side row generator — split once per document
  * (Spark collapses the shared `split` subexpression across the transform
  * and the explode), then `posexplode` multiplies rows by ~n/stride with
  * NO shuffle; output chunk text is built per-window with `slice` +
  * `array_join` inside whole-stage codegen. Chunking composes with
  * downstream repartitioning exactly like any scan: the generator's output
  * keeps the scan's partitioning, so a following `.repartition(...)`
  * or write is the first exchange.
  */
object TextChunk {

  /** Explode `docs` into token windows. Output columns: every column of
    * `docs` except `textCol`, plus `chunk_idx` (0-based), `chunk_text`,
    * `chunk_tokens`. */
  def chunkWindows(
      docs: DataFrame,
      textCol: String = "text",
      width: Int = 512,
      stride: Int = 256): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1 && stride <= width, s"stride must be in [1, width], got $stride")
    val toks = split(TextDedup.normText(col(textCol)), " ", -1)
    val n = size(toks)
    // integer ceil((n - width) / stride) + 1; exact for any realistic n
    val nChunks = when(n <= width, lit(1))
      .otherwise(floor((n - lit(width) + lit(stride - 1)).cast("double") / lit(stride)) + lit(1))
      .cast("int")
    val passthrough = docs.columns.filter(_ != textCol).map(col).toSeq
    docs
      .select((passthrough :+ toks.as("_toks") :+ nChunks.as("_nc")): _*)
      .select((passthrough :+ posexplode(sequence(lit(0), col("_nc") - 1)).as(Seq("chunk_idx", "_i")) :+ col("_toks")): _*)
      .select((passthrough :+ col("chunk_idx") :+
        array_join(slice(col("_toks"), col("chunk_idx") * stride + 1, lit(width)), " ").as("chunk_text") :+
        (least(col("chunk_idx") * stride + lit(width), size(col("_toks"))) - col("chunk_idx") * stride)
          .as("chunk_tokens")): _*)
  }
}
