package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the subsetting step a training-data
  * pipeline runs constantly (ablation subsets, eval holdouts, per-source
  * quotas) and that `rand()`-based sampling gets wrong at scale: `rand()`
  * is neither reproducible across retries/partitionings nor consistent
  * between the job that built the subset and the job that audits it.
  *
  * Both samplers key on `md5(salt || key)` — a content-deterministic,
  * uniformly-distributed, engine-portable order (lowercase hex compares
  * identically everywhere), so the SAME rows are selected no matter the
  * cluster size, task retries, or engine (the q47 DuckDB oracle recomputes
  * the selection bit-for-bit).
  *
  * 100 TB shape:
  *  - [[bernoulliKeep]] is a scan-side predicate — zero shuffle, pushes
  *    into the scan like any filter; changing the salt draws an
  *    independent sample.
  *  - [[stratifiedTopK]] is a rank window per stratum; Spark plans a
  *    pre-shuffle WindowGroupLimit (each map task forwards ≤ k rows per
  *    stratum before the exchange — plan-asserted in HashSampleSpec), so a
  *    megastratum costs k rows per upstream task, not its full width: the
  *    same skew defense as the politeness budget ([[Politeness]]).
  */
object HashSample {

  /** Keep fraction ≈ round(fraction·65536)/65536, decided by the first 4
    * hex chars of `md5(salt || key)` compared against the threshold prefix
    * (hex-lexicographic = numeric for fixed-width lowercase hex). */
  def bernoulliKeep(key: Column, fraction: Double, salt: String = ""): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    val cut = math.round(fraction * 65536.0).toInt
    if (cut <= 0) lit(false)
    else if (cut >= 65536) lit(true)
    else substring(md5(concat(lit(salt), key.cast("string"))), 1, 4) < lit(f"$cut%04x")
  }

  /** The k rows per stratum whose `md5(salt || key)` sorts first (key as
    * the tie-break makes the order total); adds `rk` (1-based rank within
    * the stratum). */
  def stratifiedTopK(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window
      .partitionBy(col(strataCol))
      .orderBy(md5(concat(lit(salt), col(keyCol).cast("string"))), col(keyCol))
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }
}
