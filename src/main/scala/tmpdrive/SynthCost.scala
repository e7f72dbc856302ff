package tmpdrive
import org.apache.spark.sql.SparkSession
object SynthCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cfg = graft.synth.PageSynth.Config(nHosts = 200, megaPct = 10, minLines = 10, extraLines = 5)
    val pages = spark.range(0L, 30000L, 1L, 32)
      .mapPartitions(_.map(i => graft.synth.PageSynth.synthPage(i, 30000L, cfg).page)).toDF()
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = pages.select(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.length($"html"))).collect()(0)
      println(f"synth scan $r: ${(System.nanoTime()-t0)/1e9}%.2fs ($n bytes)")
    }
    spark.stop()
  }
}
