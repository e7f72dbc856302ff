package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextChunk]] — token-window chunking. Oracle = a naive driver-side
  * chunker implementing the documented semantics directly with Scala
  * collections.
  */
class TextChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(text: String, width: Int, stride: Int): Seq[(Int, String, Int)] = {
    val norm = text.trim.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    val tokens = norm.split(" ", -1).toSeq
    val n = tokens.length
    val nChunks =
      if (n <= width) 1
      else 1 + math.ceil((n - width).toDouble / stride).toInt
    (0 until nChunks).map { i =>
      val from = i * stride
      val until = math.min(from + width, n)
      (i, tokens.slice(from, until).mkString(" "), until - from)
    }
  }

  private val texts = Seq(
    "",                                       // 1 empty token -> 1 chunk
    "one",
    "a b c d e",                              // n == width at width=5
    "a b c d e f",                            // n == width+1
    "  spaced   out   tokens  here  ",
    ("w" + (0 to 99).mkString(" w")),         // 100+ tokens
    graft.synth.PageSynth.pages(31L).head.page.text)

  private val geometries = Seq((5, 5), (5, 3), (8, 4), (512, 256), (1, 1), (3, 1))

  test("operator == naive reference across geometries") {
    for ((w, s) <- geometries) {
      val got = TextChunk
        .chunkWindows(texts.zipWithIndex.map(_.swap).toDF("doc_id", "text"), "text", w, s)
        .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")
        .collect()
        .map(r => (r.getInt(0), (r.getInt(1), r.getString(2), r.getInt(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
      texts.zipWithIndex.foreach { case (t, id) =>
        assert(got(id) == naive(t, w, s), s"geometry ($w,$s) doc $id")
      }
    }
  }

  test("stride == width reconstructs the normalized text exactly") {
    val df = texts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val rebuilt = TextChunk.chunkWindows(df, "text", 7, 7)
      .groupBy("doc_id")
      .agg(array_join(array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
        .getField("chunk_text"), " ").as("rebuilt"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    texts.zipWithIndex.foreach { case (t, id) =>
      val norm = t.trim.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
      assert(rebuilt(id) == norm, s"doc $id")
    }
  }

  test("chunk_tokens equals the token count of chunk_text") {
    val df = texts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val bad = TextChunk.chunkWindows(df, "text", 6, 4)
      .where(size(split(col("chunk_text"), " ", -1)) =!= col("chunk_tokens"))
      .count()
    assert(bad == 0L)
  }

  test("passthrough columns survive; plan has no shuffle") {
    val df = Seq((1L, "src-a", "a b c d e f g h")).toDF("doc_id", "source", "text")
    val out = TextChunk.chunkWindows(df, "text", 4, 2)
    assert(out.columns.toSeq == Seq("doc_id", "source", "chunk_idx", "chunk_text", "chunk_tokens"))
    assert(out.collect().forall(_.getString(1) == "src-a"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("geometry guards") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextChunk.chunkWindows(df, "text", 0, 1))
    intercept[IllegalArgumentException](TextChunk.chunkWindows(df, "text", 4, 5))
    intercept[IllegalArgumentException](TextChunk.chunkWindows(df, "text", 4, 0))
  }
}
