package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures this sandbox's PURE-CPU parallel-scaling ceiling: a
  * register-level xxhash loop over `spark.range` — zero I/O, zero
  * allocation, zero shuffle — run at a given core count, one JVM per
  * config (same methodology as ScaleBench). No Spark job can scale better
  * than this on the same machine at the same moment, so the engine's N→4N
  * efficiency is meaningful only relative to the SAME-DAY ceiling: this VM
  * is multi-tenant and its deliverable parallel throughput drifts hour to
  * hour (round-2 measured 0.92 at 2→8; re-measure alongside every
  * ScaleBench session).
  *
  * Usage: runMain graft.tools.CpuCeiling <cpus> [rowsPerCore]
  */
object CpuCeiling {

  /** 16 chained xxhash rounds per row — enough work per row that the
    * range-iterator overhead is negligible. */
  def burn(lo: Long, hi: Long): Long = {
    var acc = 0L
    var i = lo
    while (i < hi) {
      var h = i
      var j = 0L
      while (j < 16) { h = graft.util.XxHash64.hashLong(h, j); j += 1 }
      acc ^= h
      i += 1
    }
    acc
  }

  def run(spark: SparkSession, n: Long, slices: Int): Long = {
    import spark.implicits._
    spark.range(0L, n, 1L, slices)
      .mapPartitions { it =>
        var lo = Long.MaxValue
        var hi = Long.MinValue
        it.foreach { v => if (v < lo) lo = v; if (v >= hi) hi = v + 1 }
        Iterator.single(if (lo < hi) burn(lo, hi) else 0L)
      }
      .reduce(_ ^ _)
  }

  /** Memory-BANDWIDTH variant: xxhash over a 256 MB per-task byte array
    * (way past L3, so every pass streams DRAM). The text kernels
    * (extraction, shingling, minhash) are byte-streaming, so their true
    * same-day scaling ceiling is this one, not the register-CPU one —
    * DRAM bandwidth is shared across cores and does not scale 4x. */
  def runMem(spark: SparkSession, passesPerTask: Int, tasks: Int): Long = {
    import spark.implicits._
    val mb = 256
    spark.range(0L, tasks.toLong, 1L, tasks)
      .mapPartitions { it =>
        val buf = new Array[Byte](mb * 1024 * 1024)
        java.util.Arrays.fill(buf, 7.toByte)
        var acc = 0L
        it.foreach { t =>
          var p = 0
          while (p < passesPerTask) { acc ^= graft.util.XxHash64.hash(buf, t + p); p += 1 }
        }
        Iterator.single(acc)
      }
      .reduce(_ ^ _)
  }

  /** ENRICH-KERNEL variant: the actual per-page enrichment work (minhash
    * signature + simhash + rolling fingerprint) over deterministic ~2 KB
    * synthetic texts, pure JVM with no Spark machinery in the loop. This is
    * the honest same-day ceiling for the crawl tick's dominant cost —
    * string-heavy, allocation-heavy work whose per-core throughput degrades
    * under parallelism on shared cache/DRAM in ways the sequential-stream
    * `mem` variant does not capture (measured: task CPU-sum grows ~20–30%
    * from local[2] to local[8] on identical work). */
  def runEnrich(spark: SparkSession, pagesPerTask: Int, tasks: Int): Long = {
    import spark.implicits._
    spark.range(0L, tasks.toLong, 1L, tasks)
      .mapPartitions { it =>
        var acc = 0L
        it.foreach { t =>
          var p = 0
          while (p < pagesPerTask) {
            val text = {
              val sb = new java.lang.StringBuilder(2200)
              var w = 0
              while (w < 300) { sb.append("token"); sb.append((t * 131 + p * 31 + w * 7) % 997); sb.append(' '); w += 1 }
              sb.toString
            }
            val mh = graft.ml.TextHashKernels.minhash(text, 5, 64)
            acc ^= mh(0) ^ graft.ml.TextHashKernels.simhash(text) ^
              graft.ml.TextHashKernels.rollingFingerprint(text)
            p += 1
          }
        }
        Iterator.single(acc)
      }
      .reduce(_ ^ _)
  }

  def main(args: Array[String]): Unit = {
    val cpus = args.lift(0).map(_.toInt).getOrElse(8)
    val mode = args.lift(1).getOrElse("cpu")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (label, unitsPerSec, wall) = mode match {
      case "enrich" =>
        val perTask = 60000
        runEnrich(spark, 5000, cpus) // warmup + JIT
        val t0 = System.nanoTime()
        runEnrich(spark, perTask, cpus)
        val w = (System.nanoTime() - t0) / 1e9
        ("enrich_ceiling", (cpus.toLong * perTask / w).toLong, w)
      case "mem" =>
        val passes = 24
        runMem(spark, 2, cpus) // warmup + JIT
        val t0 = System.nanoTime()
        runMem(spark, passes, cpus)
        val w = (System.nanoTime() - t0) / 1e9
        ("mem_ceiling", (cpus.toLong * passes * 256L * 1024 * 1024 / w).toLong, w)
      case _ =>
        val n = 40_000_000L * cpus
        run(spark, math.min(n / 8, 10_000_000L), cpus * 4) // JIT warmup
        val t0 = System.nanoTime()
        run(spark, n, cpus * 4)
        val w = (System.nanoTime() - t0) / 1e9
        ("cpu_ceiling", (n / w).toLong, w)
    }
    spark.stop()
    println(f"""{"bench":"$label%s","cpus":$cpus,"wall_s":$wall%.2f,"units_per_sec":$unitsPerSec%d}""")
  }
}
