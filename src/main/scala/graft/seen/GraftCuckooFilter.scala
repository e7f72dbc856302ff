package graft.seen

import graft.util.XxHash64

/** From-scratch cuckoo filter segment (Fan et al., "Cuckoo Filter:
  * Practically Better Than Bloom", CoNEXT'14) — the deletable variant of
  * the URL-seen set mandated by the north rule.
  *
  * Layout: 2^log2Buckets buckets × 4 slots × 16-bit fingerprints packed in
  * an Array[Short]; fingerprint 0 means empty (fingerprints are forced
  * nonzero). Partner bucket via the partial-key trick
  * i2 = i1 XOR hash(fp), which is an involution, so buckets is a power of
  * two. ~16 bits/key at 95% load → comparable space to the Bloom segment
  * at FPR ≈ 2·4/2^16 ≈ 1.2e-4, plus O(1) delete (lets the frontier
  * *unsee* a URL for recrawl policies — impossible with Bloom).
  *
  * Eviction kicks are derived from a deterministic hash chain (no RNG, no
  * wall clock) so filter state is a pure function of the insertion
  * multiset order — required for resume-exactness (SURVEY.md §7.3(d)).
  */
final class GraftCuckooFilter private (
    val log2Buckets: Int,
    private[seen] val table: Array[Short]) extends Serializable {

  import GraftCuckooFilter._

  private[seen] var itemsInserted: Long = 0L
  private val bucketMask: Int = (1 << log2Buckets) - 1

  @inline private def fingerprint(key: Long): Short = {
    val f = (XxHash64.hashLong(key, FpSeed) & 0xffff).toInt
    (if (f == 0) 1 else f).toShort
  }
  /** Primary bucket from an INDEPENDENT hash of the key — never the raw low
    * bits. [[SeenSet]] segments keys by `pmod(url_hash, P)` with power-of-two
    * P, so within one segment every key shares its low log2(P) bits; raw low
    * bits would collapse all primary buckets onto 1/P of the table and
    * saturate far below the sized capacity (found by round-1 advisor). */
  @inline private def bucket1(key: Long): Int =
    (XxHash64.hashLong(key, BucketSeed) & bucketMask).toInt
  @inline private def partner(i: Int, fp: Short): Int =
    (i ^ XxHash64.hashLong(fp.toLong & 0xffffL, AltSeed).toInt) & bucketMask

  @inline private def slotBase(bucket: Int): Int = bucket << 2

  private def tryInsertAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = fp; return true }
      s += 1
    }
    false
  }

  /** Insert; returns false when the filter is saturated (caller should
    * grow/split the segment — surfaced as a metric, never silent). */
  def insert(key: Long): Boolean = insertFp(bucket1(key), fingerprint(key))

  /** Fingerprint-level insert with the deterministic eviction chain —
    * shared by [[insert]] and [[mergeInPlace]] (a merged fingerprint's
    * bucket is recoverable because partner() is an involution).
    *
    * Failure is ATOMIC: when the chain exhausts MaxKicks the whole swap
    * chain is unwound (reverse order, exact even when a slot was touched
    * twice), so a `false` return leaves the table bit-identical — no
    * previously-inserted key can turn into a false negative (round-1
    * advisor: the old code dropped the last homeless victim). */
  private def insertFp(i1: Int, fp0: Short): Boolean = {
    if (tryInsertAt(i1, fp0) || tryInsertAt(partner(i1, fp0), fp0)) {
      itemsInserted += 1
      return true
    }
    // deterministic eviction chain (state-derived, no RNG)
    var fp = fp0
    var i = if ((XxHash64.hashLong((fp0.toLong << 32) | i1.toLong, KickSeed) & 1L) == 0L) i1
            else partner(i1, fp0)
    val trailIdx = new Array[Int](MaxKicks)
    val trailOld = new Array[Short](MaxKicks)
    var kicks = 0
    while (kicks < MaxKicks) {
      val base = slotBase(i)
      val victimSlot = (XxHash64.hashLong((i.toLong << 20) ^ (kicks.toLong << 17) ^ fp.toLong, KickSeed)
        & (SlotsPerBucket - 1)).toInt
      val victim = table(base + victimSlot)
      table(base + victimSlot) = fp
      trailIdx(kicks) = base + victimSlot
      trailOld(kicks) = victim
      fp = victim
      i = partner(i, fp)
      if (tryInsertAt(i, fp)) { itemsInserted += 1; return true }
      kicks += 1
    }
    // saturated: unwind every swap so the filter is exactly as before
    var k = MaxKicks - 1
    while (k >= 0) { table(trailIdx(k)) = trailOld(k); k -= 1 }
    false
  }

  def mightContain(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = bucket1(key)
    containsAt(i1, fp) || containsAt(partner(i1, fp), fp)
  }

  private def containsAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    table(base) == fp || table(base + 1) == fp || table(base + 2) == fp || table(base + 3) == fp
  }

  /** Delete one copy of the key's fingerprint; true when something was
    * removed. (Only delete keys that were inserted — cuckoo invariant.) */
  def delete(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = bucket1(key)
    deleteAt(i1, fp) || deleteAt(partner(i1, fp), fp)
  }

  private def deleteAt(bucket: Int, fp: Short): Boolean = {
    val base = slotBase(bucket)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) { table(base + s) = 0; itemsInserted -= 1; return true }
      s += 1
    }
    false
  }

  /** Merge by re-inserting the other filter's fingerprints (bucket index is
    * recoverable because i XOR hash(fp) is an involution). Returns the
    * number of fingerprints that could NOT be placed (0 on success).
    *
    * ATOMIC on failure: when any fingerprint cannot be placed the target is
    * restored from a pre-merge snapshot, so callers that throw on
    * `failed > 0` never observe (or persist) a half-merged segment. The
    * snapshot is one Array[Short] clone — trivial next to the per-merge
    * deserialization cost. */
  def mergeInPlace(other: GraftCuckooFilter): Long = {
    require(other.log2Buckets == log2Buckets, "incompatible cuckoo geometry")
    val savedTable = table.clone()
    val savedItems = itemsInserted
    var failed = 0L
    var b = 0
    val nBuckets = 1 << log2Buckets
    while (b < nBuckets) {
      val base = other.slotBase(b)
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.table(base + s)
        if (fp != 0 && !insertFp(b, fp)) failed += 1
        s += 1
      }
      b += 1
    }
    if (failed > 0) {
      System.arraycopy(savedTable, 0, table, 0, table.length)
      itemsInserted = savedItems
    }
    failed
  }

  def serialized: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + table.length * 2)
    bb.putInt(Magic)
    bb.putInt(log2Buckets)
    bb.putLong(itemsInserted)
    var i = 0
    while (i < table.length) { bb.putShort(table(i)); i += 1 }
    bb.array()
  }
}

object GraftCuckooFilter {
  final val SlotsPerBucket = 4
  final val MaxKicks = 500
  /** "GCK2": v2 — bumped when bucket1 switched from raw low bits to an
    * independent key hash (round-2). A v1 blob ("GCKF") probed with v2
    * derivations would return silent false negatives (duplicate URL
    * admissions); the bump makes old-layout segments fail LOUDLY at
    * deserialize/dispatch time instead (round-2 advisor). */
  private[seen] final val Magic = 0x47434b32 // "GCK2"
  private[seen] final val MagicV1 = 0x47434b46 // "GCKF" (retired layout)
  private[seen] final val FpSeed = 0x9e3779b9L
  private[seen] final val AltSeed = 0x85ebca6bL
  private[seen] final val KickSeed = 0xc2b2ae35L
  private[seen] final val BucketSeed = 0x27d4eb2fL

  def create(log2Buckets: Int): GraftCuckooFilter = {
    require(log2Buckets >= 1 && log2Buckets <= 28)
    new GraftCuckooFilter(log2Buckets, new Array[Short]((1 << log2Buckets) * SlotsPerBucket))
  }

  /** Capacity for n keys at ~95% max load factor — delegates to
    * [[log2BucketsForExpected]], THE single geometry formula (a second
    * slightly-different sizing here could diverge by one bucket step and
    * make same-n filters un-mergeable; round-5 review). */
  def forExpected(n: Long): GraftCuckooFilter = create(log2BucketsForExpected(n))

  /** log2Buckets sizing n keys at ~95% load — the single geometry formula
    * shared by the build aggregate and segment compaction (a cuckoo merge
    * requires identical geometry, so everyone must size the same way). */
  def log2BucketsForExpected(n: Long): Int = {
    val buckets = math.max(2L, (n / (SlotsPerBucket * 0.95)).toLong + 1)
    var lg = 1
    while ((1L << lg) < buckets) lg += 1
    lg
  }

  def deserialize(bytes: Array[Byte]): GraftCuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.getInt
    require(magic != MagicV1,
      "cuckoo segment uses the retired v1 bucket layout (GCKF); it cannot be " +
        "probed correctly by this version — rebuild the seen set from the frontier")
    require(magic == Magic, f"not a graft cuckoo segment (magic 0x$magic%08x)")
    val lg = bb.getInt
    val items = bb.getLong
    val table = new Array[Short]((1 << lg) * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    val f = new GraftCuckooFilter(lg, table)
    f.itemsInserted = items
    f
  }
}
