package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Round-7 optimization-side measurement harness (guide §1.4): times a
  * SUBSET of the registry queries in isolation, with the `noop` sink
  * (computes every column of every row, discards the result — so the
  * number is the computation, not `.count()`'s column-pruned shortcut),
  * under optional session-conf overrides. This main exists so the frozen
  * `graft.Bench` contract stays untouched while the optimization loop can
  * A/B individual operators and confs.
  *
  * Env:
  *  - SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS: as Bench.
  *  - GRAFT_EXTRA_QUERIES: comma-separated query names (default: all).
  *  - GRAFT_EXTRA_RUNS: timed passes per query (default 3; median printed).
  *  - GRAFT_EXTRA_CONF: semicolon-separated `key=value` session confs
  *    applied on top of the GraftSession defaults.
  *  - GRAFT_EXTRA_ACTION: `noop` (default) or `count` (Bench's action, for
  *    apples-to-apples with BENCH_r*.json numbers).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val runs = math.max(1, sys.env.getOrElse("GRAFT_EXTRA_RUNS", "3").toInt)
    val action = sys.env.getOrElse("GRAFT_EXTRA_ACTION", "noop")
    val builder = GraftSession.local(cpus, shufflePartitions = Some(cpus))
      .config("spark.ui.enabled", "false")
    val withConf = sys.env.get("GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";").toSeq).map(_.trim).filter(_.nonEmpty)
      .foldLeft(builder) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k, v)
      }
    val spark: SparkSession = withConf.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wanted = sys.env.get("GRAFT_EXTRA_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted.forall(_.contains(name)) }

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val df = fn(spark, sfDir)
      if (action == "count") { df.count(); () }
      else df.write.format("noop").mode("overwrite").save()
    }

    // warmup pass (JIT + codegen + parquet footers)
    ordered.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"warmup $name")
      try run(fn) catch { case e: Throwable => System.err.println(s"$name WARMUP ERR $e") }
    }

    val out = ordered.map { case (name, fn) =>
      val ts = (0 until runs).map { i =>
        spark.sparkContext.setJobDescription(s"$name pass $i")
        val t0 = System.nanoTime()
        try run(fn) catch { case e: Throwable => System.err.println(s"$name ERR $e") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> ts(ts.length / 2)
    }
    spark.stop()
    val qs = out.map { case (k, v) => f""""$k":$v%.4f""" }.mkString("{", ",", "}")
    val total = out.map(_._2).sum
    println(f"""{"metric":"extra","action":"$action","value":$total%.4f,"queries":$qs}""")
  }
}
