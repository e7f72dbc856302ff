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
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftBloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): GraftBloomFilter =
    GraftBloomFilter.create(numBits, numHashes)

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

  // Column API
  def bloom_build(urlHash: Column, numBits: Long, numHashes: Int): Column =
    ExpressionUtils.column(
      BloomBuildAgg(ExpressionUtils.expression(urlHash), numBits, numHashes)
        .toAggregateExpression())

  def cuckoo_build(urlHash: Column, log2Buckets: Int): Column =
    ExpressionUtils.column(
      CuckooBuildAgg(ExpressionUtils.expression(urlHash), log2Buckets)
        .toAggregateExpression())

  def filter_might_contain(segment: Column, urlHash: Column): Column =
    ExpressionUtils.column(
      FilterMightContain(ExpressionUtils.expression(segment), ExpressionUtils.expression(urlHash)))
}
