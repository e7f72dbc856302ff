package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for registry queries to files — the
  * round-7 plan evidence (`plans/r07/<query>_{before,after}.txt`).
  *
  * Env:
  *  - SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS: as Bench.
  *  - GRAFT_PLAN_QUERIES: comma-separated names (default: all).
  *  - GRAFT_PLAN_OUT: output directory (default `plans/r07`).
  *  - GRAFT_PLAN_SUFFIX: filename suffix, e.g. `_before` (default empty).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val outDir = Paths.get(sys.env.getOrElse("GRAFT_PLAN_OUT", "plans/r07"))
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "")
    Files.createDirectories(outDir)
    val spark: SparkSession = GraftSession.local(cpus, shufflePartitions = Some(cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wanted = sys.env.get("GRAFT_PLAN_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(outDir.resolve(s"$name$suffix.txt"), plan)
          println(s"wrote $name$suffix")
        } catch {
          case e: Throwable =>
            Files.writeString(outDir.resolve(s"$name$suffix.txt"), s"ERROR: $e")
            println(s"ERROR $name: $e")
        }
      }
    spark.stop()
  }
}
