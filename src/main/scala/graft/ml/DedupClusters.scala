package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over near-duplicate candidate pairs — the
  * transitive closure step a correct corpus dedup needs on top of the
  * pair generators in [[TextDedup]].
  *
  * Why it exists: `WebTextPipeline.curate`'s default near-dup removal is
  * the greedy pair rule (drop every id that appears as the greater side of
  * any pair). Greedy is one anti-join — the cheap choice — but it is not
  * transitive-correct: for pairs {(a,c), (b,c)} with a < b < c it keeps
  * BOTH a and b even though a ~ c ~ b makes the three one duplicate
  * cluster. Component-based dedup keeps exactly one representative (the
  * min id) per transitive cluster — the semantics MinHash-dedup papers
  * (e.g. Lee et al., "Deduplicating Training Data Makes Language Models
  * Better") actually specify.
  *
  * Algorithm: iterated min-label propagation with pointer jumping
  * (path halving), the DataFrame rendering of the classic
  * hash-to-min / Kiveris-et-al. map-reduce CC family:
  *
  *   label_0(v)  = v
  *   prop(v)     = min(label(v), min over neighbors n of label(n))
  *   label'(v)   = prop(prop(v))          — pointer jump
  *
  * Labels decrease monotonically and are bounded by the component min, so
  * the loop terminates; at the fixed point every edge has equal labels on
  * both ends, hence label = component min id. Pointer jumping halves label
  * chains each round, so convergence is O(log diameter) iterations, not
  * O(diameter).
  *
  * 100 TB shape: per iteration, one shuffle join edges⋈labels on the
  * 8-byte vertex key + one min-aggregate + one self-join on the 8-byte
  * label key — payloads are (long, long) rows throughout, never document
  * text or signatures. The symmetric edge list is persisted once and
  * reused every iteration; each iteration's labels are localCheckpoint'd
  * (eager) to cut lineage, the standard iterative-algorithm hygiene that
  * keeps plan size and recovery cost constant across rounds. The
  * convergence probe is a driver-side Σcomp over the fresh labels (labels
  * strictly decrease, so an unchanged sum IS the fixed point) — O(1)
  * metadata per round, not a data collect. Skew: the min-label key can
  * concentrate on one reducer only AFTER labels agree (final rounds,
  * tiny); candidate-pair graphs from LSH are bounded-degree by
  * construction (band buckets), so the neighbor aggregate does not skew.
  */
object DedupClusters {

  /** Connected components of the undirected graph given as an edge list.
    * Returns one row per vertex that appears in `edges`:
    * (`id` LONG, `comp` LONG) with `comp` = min vertex id in the
    * component. Vertices with no edges are absent — see
    * [[assignComponents]] for the corpus-facing variant. */
  def components(
      edges: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxIter: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    val e = edges
      .select(col(idACol).cast("long").as("a"), col(idBCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
    // symmetric closure PLUS self-loops: min over neighbors∪{v} computes
    // prop(v) in ONE join + aggregate — the previous shape needed a second
    // left join back onto labels to mix the own label in (round 7: two
    // fewer exchanges per round)
    val symSelf = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .unionByName(
        e.select(col("a").as("v")).unionByName(e.select(col("b").as("v"))).distinct()
          .select(col("v").as("src"), col("v").as("dst")))
    // materialize the edge list once, COUNT it (cache-side, one cheap job),
    // and size every loop shuffle to that count (AdaptiveShuffle): the
    // per-round chains are (long, long) shuffles whose data is often KBs —
    // scheduling the session's corpus-sized partition count for them was
    // >50% of the operator's wall time at sf0.1 (guide §2: derive the
    // partitioning from the input, don't re-use a constant)
    val sym = symSelf.persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = sym.count()
    graft.util.AdaptiveShuffle.withPartitionsForRows(spark, nEdges) {
      var labels = sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp"))
        .localCheckpoint(true)
      // labels only ever DECREASE (min-propagation), so Σcomp is strictly
      // monotone until the fixed point: the convergence probe is one
      // decimal sum over the freshly checkpointed table (scan + driver
      // combine — no join, no shuffle; the previous probe joined old and
      // new labels every round)
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("comp").cast("decimal(38,0)")).as("s"))
          .head().getDecimal(0)
      var prevSum = labelSum(labels)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val prop = sym
          .join(labels.select(col("id").as("src"), col("comp")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(min(col("comp")).as("comp"))
        // pointer jump: comp := comp(comp). Every comp value is a vertex id
        // (labels start as ids and only ever take other labels' values), so
        // the left join hits unless comp is already a root — coalesce keeps
        // roots fixed.
        val jumped = prop
          .join(prop.select(col("id").as("comp"), col("comp").as("comp2")), Seq("comp"), "left")
          .select(col("id"), coalesce(col("comp2"), col("comp")).as("comp"))
        val next = jumped.localCheckpoint(true)
        val nextSum = labelSum(next)
        labels = next
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        iter += 1
      }
      sym.unpersist()
      labels
    }
  }

  /** Corpus-facing component assignment: every doc gets a `comp` column —
    * the min doc id of its near-dup cluster, its own id when isolated.
    * One broadcast-or-shuffle join of the (tiny) label table back onto the
    * corpus. */
  def assignComponents(
      docs: DataFrame,
      edges: DataFrame,
      idCol: String = "doc_id",
      idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame = {
    val labels = components(edges, idACol, idBCol)
      .select(col("id").as(idCol), col("comp"))
    docs
      .join(labels, Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol).cast("long")))
  }

  /** Transitive-correct near-dup dedup: MinHash-LSH candidate pairs →
    * connected components → keep the min-id representative of every
    * cluster. The component step adds O(log diameter) (long, long)
    * shuffles on top of the pair generator; duplicate-cluster diameters
    * in web corpora are small (template families), so this converges in a
    * handful of rounds. */
  def minhashComponentDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleWidth: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val pairs = TextDedup.minhashNearDups(
      docs, idCol, textCol, shingleWidth, numHashes, bands, threshold)
    // one run of the iterative loop; the label table is tiny ((long, long)
    // per clustered doc) so persisting it for the two probes below is free
    val labels = components(pairs).persist(StorageLevel.MEMORY_AND_DISK)
    val inEdges = labels.select(col("id").as(idCol))
    val reps = labels.where(col("id") === col("comp")).select(col("id").as(idCol))
    // survivors = docs not in any cluster, plus each cluster's min id
    val out = docs
      .join(inEdges, Seq(idCol), "left_anti")
      .unionByName(docs.join(reps, Seq(idCol), "left_semi"))
    out
  }
}
