package graft.seen

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Catalyst aggregate building one Bloom segment per group from `url_hash`
  * values (north-rule: "partitioned Bloom-filter URL-seen set ... build via
  * TypedImperativeAggregate"). Group by `pmod(url_hash, P)` to build the
  * partitioned seen set; partial aggregation (map-side combine) means each
  * executor ORs its local segment before the shuffle — only P small binary
  * blobs cross the wire, never the raw hashes.
  *
  * Spark has an internal BloomFilterAggregate but it is not public API and
  * its sketch is not under our serialization control (the `seen` table
  * format must be stable across Spark upgrades) — hence from scratch.
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    designCapacity: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftBloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): GraftBloomFilter =
    GraftBloomFilter.create(numBits, numHashes, designCapacity)

  override def update(buf: GraftBloomFilter, input: InternalRow): GraftBloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: GraftBloomFilter, b2: GraftBloomFilter): GraftBloomFilter =
    b1.mergeInPlace(b2)

  override def eval(buf: GraftBloomFilter): Any = buf.serialized
  override def serialize(buf: GraftBloomFilter): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): GraftBloomFilter =
    GraftBloomFilter.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** Cuckoo-filter twin of [[BloomBuildAgg]]. */
case class CuckooBuildAgg(
    child: Expression,
    log2Buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftCuckooFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cuckoo_build"

  override def createAggregationBuffer(): GraftCuckooFilter =
    GraftCuckooFilter.create(log2Buckets)

  override def update(buf: GraftCuckooFilter, input: InternalRow): GraftCuckooFilter = {
    val v = child.eval(input)
    if (v != null) {
      // saturation is surfaced, not swallowed: an unplaceable key would be a
      // silent false-negative (a URL recrawled forever)
      if (!buf.insert(v.asInstanceOf[Long]))
        throw new IllegalStateException(
          s"cuckoo segment saturated at ${buf.itemsInserted} items (log2Buckets=$log2Buckets); resize P or segment capacity")
    }
    buf
  }

  override def merge(b1: GraftCuckooFilter, b2: GraftCuckooFilter): GraftCuckooFilter = {
    val failed = b1.mergeInPlace(b2)
    if (failed > 0)
      throw new IllegalStateException(s"cuckoo merge dropped $failed fingerprints; resize segment capacity")
    b1
  }

  override def eval(buf: GraftCuckooFilter): Any = buf.serialized
  override def serialize(buf: GraftCuckooFilter): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): GraftCuckooFilter =
    GraftCuckooFilter.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CuckooBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CuckooBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** `filter_might_contain(segment, url_hash)` — probe either filter kind
  * (dispatch on the serialized magic). Deserialization is memoized per
  * expression instance keyed on the segment's object identity, so probing N
  * rows against one broadcast segment deserializes once per task, not per
  * row. (The bulk-probe path in [[SeenSet]] avoids even that by cogrouping;
  * this expression is for scalar/test use and stays CodegenFallback.)
  */
case class FilterMightContain(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "filter_might_contain"

  @transient private var cachedRef: AnyRef = _
  @transient private var cachedProbe: Long => Boolean = _

  override protected def nullSafeEval(seg: Any, hash: Any): Any = {
    val bytes = seg.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedRef)) {
      cachedProbe = SeenSegments.probeFn(bytes)
      cachedRef = bytes
    }
    cachedProbe(hash.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `seen_probe(url_hash)` — scan-side probe of the WHOLE partitioned seen
  * set against a broadcast of its segments (pid → segment blobs, probes
  * OR'd). This is the small-seen-set fast path of [[SeenSet.filterNew]]:
  * zero shuffle, evaluated inside whole-stage codegen via a reference call
  * (`addReferenceObj`), with the segment blobs deserialized into probe
  * closures once per task via the transient lazy val. The cogroup path
  * ([[SeenSet.filterNewFiltered]]) remains the big-frontier fallback where
  * the segment set itself outgrows a broadcast.
  */
case class SeenProbeBroadcast(
    child: Expression,
    segments: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Byte]]]],
    p: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "seen_probe"

  @transient private lazy val probes: Array[Array[Long => Boolean]] =
    segments.value.map(_.map(SeenSegments.probeFn))

  /** Called from generated code; must stay public. */
  def probe(h: Long): Boolean = {
    val ps = probes(math.floorMod(h, p.toLong).toInt)
    var i = 0
    while (i < ps.length) {
      if (ps(i)(h)) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(h: Any): Any = probe(h.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("seenProbe", this, classOf[SeenProbeBroadcast].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SeenSegments {
  private def magicOf(bytes: Array[Byte]): Int = {
    require(bytes.length >= 4, "empty segment blob")
    java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
  }

  /** Magic-dispatched probe function over a serialized segment. */
  def probeFn(bytes: Array[Byte]): Long => Boolean = magicOf(bytes) match {
    case GraftBloomFilter.Magic =>
      val f = GraftBloomFilter.deserialize(bytes); f.mightContain _
    case GraftCuckooFilter.Magic =>
      val f = GraftCuckooFilter.deserialize(bytes); f.mightContain _
    case GraftLongList.Magic =>
      GraftLongList.containsFn(bytes)
    case m => throw new IllegalArgumentException(f"unknown segment magic 0x$m%08x")
  }

  /** Magic-dispatched binary merge of two serialized segments — used to fold
    * a batch's delta segments into the previous snapshot's segments with a
    * P-row join, no rehash of history. Kinds compose: filter ⊕ filter is the
    * native merge (Bloom OR / cuckoo fingerprint re-insert, same geometry
    * required); filter ⊕ list re-inserts the list's raw keys (no geometry
    * coupling — this is how exact deltas compact into filters); list ⊕ list
    * concatenates. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ma, mb) = (magicOf(a), magicOf(b))
    // normalize: when exactly one side is a list, fold it into the filter
    if (ma == GraftLongList.Magic && mb != GraftLongList.Magic) return merge(b, a)
    (ma, mb) match {
      case (GraftBloomFilter.Magic, GraftLongList.Magic) =>
        val f = GraftBloomFilter.deserialize(a)
        GraftLongList.deserialize(b).foreach(f.insert)
        f.serialized
      case (GraftCuckooFilter.Magic, GraftLongList.Magic) =>
        val f = GraftCuckooFilter.deserialize(a)
        GraftLongList.deserialize(b).foreach { k =>
          if (!f.insert(k))
            throw new IllegalStateException("cuckoo segment saturated while folding delta keys")
        }
        f.serialized
      case (GraftLongList.Magic, GraftLongList.Magic) =>
        GraftLongList.serialize(GraftLongList.deserialize(a) ++ GraftLongList.deserialize(b))
      case (GraftBloomFilter.Magic, GraftBloomFilter.Magic) =>
        GraftBloomFilter.deserialize(a).mergeInPlace(GraftBloomFilter.deserialize(b)).serialized
      case (GraftCuckooFilter.Magic, GraftCuckooFilter.Magic) =>
        val f = GraftCuckooFilter.deserialize(a)
        val failed = f.mergeInPlace(GraftCuckooFilter.deserialize(b))
        if (failed > 0) throw new IllegalStateException(s"cuckoo merge dropped $failed fingerprints")
        f.serialized
      case (x, y) => throw new IllegalArgumentException(f"unmergeable segment kinds 0x$x%08x / 0x$y%08x")
    }
  }

  /** Fold one partition's whole segment stack (filters ⊕ exact delta lists,
    * any order, any count) into a BOUNDED set of segments — the compaction
    * primitive behind [[SeenSet.mergeSegments]] (round-2 advisor items 1+2):
    *
    *  - delta-list keys fold into the partition's filter when one exists
    *    (raw keys re-insert; no geometry coupling);
    *  - a partition with NO filter converges: while its merged exact list is
    *    smaller than the configured filter it stays an exact list (smaller
    *    AND zero-FPR — strictly better), but once it outgrows the filter
    *    size a fresh Bloom/cuckoo filter is built from the keys (all
    *    recoverable from the list), so no partition grows without bound at
    *    8 B/key with a full rewrite per compaction;
    *  - cuckoo saturation is never a hard-stop: keys that cannot be placed
    *    are emitted as a standalone exact-list segment NEXT TO the filter —
    *    the probe already ORs every segment of a partition — and filter
    *    pairs that cannot merge (saturation, geometry drift after a config
    *    change) stay side by side the same way.
    *
    * Returns (serialized segment, n_items) pairs; order deterministic. */
  def compactStack(
      segs: Seq[(Array[Byte], Long)],
      kind: String,
      expectedPerSegment: Long,
      fpp: Double = 1e-3): Seq[(Array[Byte], Long)] = {
    val (listSegs, filterSegs) = segs.partition(s => magicOf(s._1) == GraftLongList.Magic)
    // distinct delta keys across every list segment (serialize sorts+dedups)
    val keys: Array[Long] =
      if (listSegs.isEmpty) Array.emptyLongArray
      else GraftLongList.deserialize(GraftLongList.serialize(
        listSegs.iterator.flatMap(s => GraftLongList.deserialize(s._1)).toArray))

    // 1. fold filters pairwise where kind+geometry allow; unmergeable pairs
    //    (cuckoo saturation / geometry drift) are kept side by side
    val filters = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long)]
    filterSegs.foreach { case (bytes, n) =>
      var i = 0
      var placed = false
      while (!placed && i < filters.length) {
        tryMergeFilters(filters(i)._1, bytes) match {
          case Some(m) => filters(i) = (m, filters(i)._2 + n); placed = true
          case None => i += 1
        }
      }
      if (!placed) filters += ((bytes, n))
    }

    if (filters.isEmpty) segsFromKeys(keys, kind, expectedPerSegment, fpp)
    else if (keys.isEmpty) filters.toSeq
    else {
      // 2. fold the delta keys into the first (largest-capacity-first is not
      //    needed: all same configured geometry) filter — but NEVER past a
      //    Bloom's design capacity: unlike cuckoo (whose failed inserts
      //    surface as overflow), Bloom inserts silently saturate bits, and
      //    once itemsInserted ≫ expected the segment's FPR walks toward 1 —
      //    every candidate then takes the exact-confirm anti-join against
      //    the 10^10-row frontier and the pre-screen is dead weight
      //    (round-5 review). When the fold would overfill, the keys become
      //    their own segment(s) instead: the probe already ORs a
      //    partition's whole stack, so correctness is unchanged and each
      //    segment keeps its configured fpp; a partition converges to
      //    ~⌈keys/expected⌉ full filters + one partial (the pairwise merge
      //    in step 1 keeps gluing undersized siblings back together).
      if (bloomHeadroom(filters.head._1) >= keys.length) {
        val (folded, overflow) = insertKeysInto(filters.head._1, keys)
        val out = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](
          (folded, filters.head._2 + (keys.length - overflow.length)))
        out ++= filters.drop(1)
        // cuckoo saturation spill: a standalone EXACT list (the next
        // compaction's pure-list rule converts it if it outgrows a filter)
        if (overflow.nonEmpty)
          out += ((GraftLongList.serialize(overflow), overflow.length.toLong))
        out.toSeq
      } else filters.toSeq ++ segsFromKeys(keys, kind, expectedPerSegment, fpp)
    }
  }

  /** Segment(s) for a raw key set with no target filter: an exact list
    * while that is the smaller (and zero-FPR) representation, else filters
    * at the configured geometry. */
  private def segsFromKeys(
      keys: Array[Long],
      kind: String,
      expectedPerSegment: Long,
      fpp: Double): Seq[(Array[Byte], Long)] =
    if (keys.isEmpty) Seq.empty
    else {
      val listBytes = 8L + 8L * keys.length
      if (listBytes <= filterBytesFor(kind, expectedPerSegment, fpp))
        Seq((GraftLongList.serialize(keys), keys.length.toLong))
      else buildFilterFromKeys(keys, kind, expectedPerSegment, fpp)
    }

  /** Design capacity of a serialized BLOOM segment — read directly from
    * the v3 header (round-5 advisor: deriving it as m·ln2/k is exact only
    * at optimal sizing; a filter created with a clamped/rounded k
    * self-reported a capacity above its real design n, so the overfill
    * gate could still push FPR past the configured fpp). Header layout:
    * magic(4) k(4) numBits(8) itemsInserted(8) designCapacity(8). */
  private def bloomCapacity(bytes: Array[Byte]): Long =
    math.max(1L, java.nio.ByteBuffer.wrap(bytes, 24, 8).getLong)

  /** Remaining insert capacity of a serialized BLOOM segment before it
    * exceeds its design load (fixed header offsets — no word-array copy).
    * Non-bloom segments have their own overflow handling and report
    * unlimited headroom here. */
  private def bloomHeadroom(bytes: Array[Byte]): Long =
    if (magicOf(bytes) != GraftBloomFilter.Magic) Long.MaxValue
    else math.max(0L, bloomCapacity(bytes) - java.nio.ByteBuffer.wrap(bytes, 16, 8).getLong)

  /** Merge two serialized FILTER segments when kind+geometry allow; None
    * when they must stay separate (mixed kinds, geometry drift, or a cuckoo
    * merge that would drop fingerprints — mergeInPlace is atomic on
    * failure, so `a` is untouched when this returns None). */
  private def tryMergeFilters(a: Array[Byte], b: Array[Byte]): Option[Array[Byte]] =
    (magicOf(a), magicOf(b)) match {
      case (GraftBloomFilter.Magic, GraftBloomFilter.Magic) =>
        // same-capacity gate as the delta fold: OR-merging two well-loaded
        // Blooms doubles the bit density and degrades FPR quadratically —
        // siblings past the combined design load stay side by side (the
        // probe ORs the stack), exactly like unmergeable cuckoo pairs
        if (bloomHeadroom(a) < java.nio.ByteBuffer.wrap(b, 16, 8).getLong) None
        else {
          val fa = GraftBloomFilter.deserialize(a)
          val fb = GraftBloomFilter.deserialize(b)
          if (fa.numBits == fb.numBits && fa.numHashes == fb.numHashes)
            Some(fa.mergeInPlace(fb).serialized)
          else None
        }
      case (GraftCuckooFilter.Magic, GraftCuckooFilter.Magic) =>
        val fa = GraftCuckooFilter.deserialize(a)
        val fb = GraftCuckooFilter.deserialize(b)
        if (fa.log2Buckets == fb.log2Buckets && fa.mergeInPlace(fb) == 0L) Some(fa.serialized)
        else None
      case _ => None
    }

  /** Re-insert raw keys into a serialized filter; returns the new blob plus
    * the keys that could not be placed (always empty for Bloom). */
  private def insertKeysInto(filterBytes: Array[Byte], keys: Array[Long]): (Array[Byte], Array[Long]) =
    magicOf(filterBytes) match {
      case GraftBloomFilter.Magic =>
        val f = GraftBloomFilter.deserialize(filterBytes)
        keys.foreach(f.insert)
        (f.serialized, Array.emptyLongArray)
      case GraftCuckooFilter.Magic =>
        val f = GraftCuckooFilter.deserialize(filterBytes)
        val overflow = scala.collection.mutable.ArrayBuffer.empty[Long]
        keys.foreach(k => if (!f.insert(k)) overflow += k)
        (f.serialized, overflow.toArray)
      case m => throw new IllegalArgumentException(f"not a filter segment (magic 0x$m%08x)")
    }

  /** Fresh filter from raw keys, sized max(expectedPerSegment, keys) so the
    * conversion itself can never saturate a cuckoo mid-build; any residual
    * cuckoo overflow (pathological kick chains) still spills to a list. */
  private def buildFilterFromKeys(
      keys: Array[Long],
      kind: String,
      expectedPerSegment: Long,
      fpp: Double): Seq[(Array[Byte], Long)] = {
    val n = math.max(expectedPerSegment, keys.length.toLong)
    kind match {
      case "bloom" =>
        val bits = GraftBloomFilter.optimalNumBits(n, fpp)
        val f = GraftBloomFilter.create(bits, GraftBloomFilter.optimalNumHashes(n, bits), n)
        keys.foreach(f.insert)
        Seq((f.serialized, keys.length.toLong))
      case "cuckoo" =>
        val f = GraftCuckooFilter.create(GraftCuckooFilter.log2BucketsForExpected(n))
        val overflow = scala.collection.mutable.ArrayBuffer.empty[Long]
        keys.foreach(k => if (!f.insert(k)) overflow += k)
        val out = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](
          (f.serialized, (keys.length - overflow.length).toLong))
        if (overflow.nonEmpty) out += ((GraftLongList.serialize(overflow.toArray), overflow.length.toLong))
        out.toSeq
      case other => throw new IllegalArgumentException(s"unknown seen-set kind: $other")
    }
  }

  /** Serialized size of a fresh filter of the configured kind/geometry —
    * the list→filter conversion threshold in [[compactStack]]. */
  private[seen] def filterBytesFor(kind: String, expectedPerSegment: Long, fpp: Double): Long =
    kind match {
      case "bloom" =>
        val bits = GraftBloomFilter.optimalNumBits(expectedPerSegment, fpp)
        GraftBloomFilter.HeaderBytes.toLong + ((bits + 63L) >>> 6) * 8L
      case "cuckoo" =>
        val lg = GraftCuckooFilter.log2BucketsForExpected(expectedPerSegment)
        4L + 4L + 8L + (1L << lg) * GraftCuckooFilter.SlotsPerBucket * 2L
      case other => throw new IllegalArgumentException(s"unknown seen-set kind: $other")
    }

  // Column API
  def bloom_build(urlHash: Column, numBits: Long, numHashes: Int, designCapacity: Long): Column =
    ExpressionUtils.column(
      BloomBuildAgg(ExpressionUtils.expression(urlHash), numBits, numHashes, designCapacity)
        .toAggregateExpression())

  def cuckoo_build(urlHash: Column, log2Buckets: Int): Column =
    ExpressionUtils.column(
      CuckooBuildAgg(ExpressionUtils.expression(urlHash), log2Buckets)
        .toAggregateExpression())

  def filter_might_contain(segment: Column, urlHash: Column): Column =
    ExpressionUtils.column(
      FilterMightContain(ExpressionUtils.expression(segment), ExpressionUtils.expression(urlHash)))

  def seen_probe(
      urlHash: Column,
      segments: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Byte]]]],
      p: Int): Column =
    ExpressionUtils.column(SeenProbeBroadcast(ExpressionUtils.expression(urlHash), segments, p))
}
