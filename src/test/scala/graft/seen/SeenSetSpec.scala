package graft.seen

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.FrontierEntry
import graft.util.XxHash64

class GraftBloomFilterSpec extends AnyFunSuite {

  private val keys = (0L until 20000L).map(i => XxHash64.hashLong(i, 7L))

  test("no false negatives, ever") {
    val f = GraftBloomFilter.forExpected(20000, 1e-3)
    keys.foreach(f.insert)
    keys.foreach(k => assert(f.mightContain(k)))
  }

  test("false-positive rate near target at capacity") {
    val f = GraftBloomFilter.forExpected(20000, 1e-3)
    keys.foreach(f.insert)
    val probes = (0L until 20000L).map(i => XxHash64.hashLong(i + 1000000L, 13L))
    val fp = probes.count(f.mightContain)
    assert(fp < 20000 * 5e-3, s"fp=$fp")
  }

  test("serialization roundtrip + OR merge") {
    val a = GraftBloomFilter.forExpected(1000, 1e-3)
    val b = GraftBloomFilter.forExpected(1000, 1e-3)
    keys.take(500).foreach(a.insert)
    keys.slice(500, 1000).foreach(b.insert)
    val merged = GraftBloomFilter.deserialize(
      SeenSegments.merge(a.serialized, b.serialized))
    keys.take(1000).foreach(k => assert(merged.mightContain(k)))
    assert(merged.itemsInserted == 1000)
  }
}

class GraftCuckooFilterSpec extends AnyFunSuite {

  private val keys = (0L until 10000L).map(i => XxHash64.hashLong(i, 7L))

  test("insert/lookup: no false negatives below load limit") {
    val f = GraftCuckooFilter.forExpected(10000)
    keys.foreach(k => assert(f.insert(k), s"insert failed for $k"))
    keys.foreach(k => assert(f.mightContain(k)))
  }

  test("low false-positive rate (~1e-4 for 16-bit fingerprints)") {
    val f = GraftCuckooFilter.forExpected(10000)
    keys.foreach(f.insert)
    val probes = (0L until 50000L).map(i => XxHash64.hashLong(i + 9000000L, 29L))
    val fp = probes.count(f.mightContain)
    assert(fp < 50000 * 2e-3, s"fp=$fp")
  }

  test("delete removes without disturbing others") {
    val f = GraftCuckooFilter.forExpected(1000)
    keys.take(1000).foreach(f.insert)
    keys.take(100).foreach(k => assert(f.delete(k)))
    keys.slice(100, 1000).foreach(k => assert(f.mightContain(k), s"lost $k"))
  }

  test("serialization roundtrip + merge by re-insert") {
    val a = GraftCuckooFilter.forExpected(2000)
    val b = GraftCuckooFilter.forExpected(2000)
    keys.take(500).foreach(a.insert)
    keys.slice(500, 1000).foreach(b.insert)
    val merged = GraftCuckooFilter.deserialize(SeenSegments.merge(a.serialized, b.serialized))
    keys.take(1000).foreach(k => assert(merged.mightContain(k)))
  }

  test("determinism: same insert order, same serialized bytes") {
    val a = GraftCuckooFilter.forExpected(5000)
    val b = GraftCuckooFilter.forExpected(5000)
    keys.take(5000).foreach(a.insert)
    keys.take(5000).foreach(b.insert)
    assert(a.serialized.sameElements(b.serialized))
  }

  test("keys sharing low bits fill to sized capacity (segment-sharded keys)") {
    // SeenSet shards by pmod(url_hash, P): every key in a segment shares its
    // low log2(P) bits. With bucket1 = raw low bits this saturated at ~1/P of
    // capacity; with an independent bucket hash it must reach the sized load.
    val n = 4096
    val f = GraftCuckooFilter.forExpected(n.toLong)
    val shared = (0 until n).map(i => (i.toLong << 12) | 0x5L) // low 12 bits identical
    shared.foreach(k => assert(f.insert(k), s"saturated early at ${f.itemsInserted}/$n"))
    shared.foreach(k => assert(f.mightContain(k)))
  }

  test("failed insert is atomic: no previously-inserted key is lost") {
    val f = GraftCuckooFilter.create(2) // 4 buckets x 4 slots = 16 capacity
    val inserted = scala.collection.mutable.ArrayBuffer.empty[Long]
    var k = 0L
    var full = false
    while (!full && k < 1000) {
      val key = XxHash64.hashLong(k, 99L)
      if (f.insert(key)) inserted += key else full = true
      k += 1
    }
    assert(full, "expected the 16-slot filter to saturate")
    // further failed inserts must leave the table bit-identical (some
    // attempts may still succeed — snapshot before each one)
    (1000L until 1040L).foreach { i =>
      val key = XxHash64.hashLong(i, 99L)
      val snap = f.serialized
      if (!f.insert(key)) assert(f.serialized.sameElements(snap))
    }
    inserted.foreach(key => assert(f.mightContain(key), s"false negative for $key after saturation"))
  }

  test("failed merge is atomic: target restored on overflow") {
    val a = GraftCuckooFilter.create(2)
    val b = GraftCuckooFilter.create(2)
    (0L until 12L).foreach(i => a.insert(XxHash64.hashLong(i, 1L)))
    (100L until 112L).foreach(i => b.insert(XxHash64.hashLong(i, 2L)))
    val before = a.serialized
    val failed = a.mergeInPlace(b) // 24 fps into 16 slots must fail
    assert(failed > 0)
    assert(a.serialized.sameElements(before), "target mutated by failed merge")
  }
}

class SeenSetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fe(h: Long): FrontierEntry =
    FrontierEntry(h, s"https://h$h.com/", s"h$h.com", 0, new Timestamp(0L), 0L, 0L, 0.0)

  private val seenHashes = (0L until 3000L).map(i => XxHash64.hashLong(i, 3L))
  private val newHashes = (0L until 1000L).map(i => XxHash64.hashLong(i + 7777777L, 5L))

  test("agg-built segments + filterNewFiltered ≡ filterNewExact") {
    val p = 8
    val seenDf = seenHashes.toDF("url_hash")
    val segments = SeenSet.buildDeltaSegments(seenDf, p, expectedPerSegment = 1024)
    assert(segments.count() == p)
    assert(segments.as[SeenSet.Segment].collect().map(_.n_items).sum == 3000)

    val candidates = spark.createDataset((seenHashes.take(200) ++ newHashes).map(fe))
    val exact = SeenSet.filterNewExact(candidates, seenDf).collect().map(_.url_hash).sorted
    val filtered = SeenSet
      .filterNewFiltered(candidates, segments, seenDf, p)
      .collect().map(_.url_hash).sorted
    assert(exact.toSeq == newHashes.sorted.toSeq)
    assert(filtered.toSeq == exact.toSeq)
  }

  test("broadcast probe path ≡ exact ≡ cogroup path (mixed filter + list segments)") {
    val p = 8
    val seenDf = seenHashes.toDF("url_hash")
    // mixed stack: filters over the first 2000, exact delta lists over the rest
    val segments = SeenSet.buildDeltaSegments(seenHashes.take(2000).toDF("url_hash"), p, expectedPerSegment = 1024)
      .union(SeenSet.buildDeltaList(seenHashes.drop(2000).toDF("url_hash"), p))
    val candidates = spark.createDataset((seenHashes.take(300) ++ newHashes).map(fe))
    val exact = SeenSet.filterNewExact(candidates, seenDf).collect().map(_.url_hash).sorted
    val viaBroadcast = SeenSet
      .filterNewBroadcast(candidates, segments.collect(), seenDf, p)
      .collect().map(_.url_hash).sorted
    val viaCogroup = SeenSet
      .filterNewFiltered(candidates, segments, seenDf, p)
      .collect().map(_.url_hash).sorted
    assert(viaBroadcast.toSeq == exact.toSeq)
    assert(viaCogroup.toSeq == exact.toSeq)
  }

  test("filterNew dispatch: small seen set broadcasts (zero cogroup), huge gate falls back") {
    val p = 4
    val seenDf = seenHashes.toDF("url_hash")
    val segments = SeenSet.buildDeltaSegments(seenDf, p, expectedPerSegment = 1024)
    val candidates = spark.createDataset((seenHashes.take(100) ++ newHashes.take(100)).map(fe))
    val broadcastPlan = SeenSet.filterNew(candidates, segments, seenDf, p)
    assert(broadcastPlan.queryExecution.analyzed.toString.contains("seen_probe"),
      "small seen set should take the broadcast scan-side probe")
    assert(broadcastPlan.collect().map(_.url_hash).sorted.toSeq == newHashes.take(100).sorted.toSeq)
    val cogroupPlan = SeenSet.filterNew(candidates, segments, seenDf, p, broadcastMaxBytes = 0L)
    assert(!cogroupPlan.queryExecution.analyzed.toString.contains("seen_probe"),
      "over-gate seen set must fall back to the cogroup probe")
    assert(cogroupPlan.collect().map(_.url_hash).sorted.toSeq == newHashes.take(100).sorted.toSeq)
  }

  test("cuckoo segments work through the same path") {
    val p = 4
    val seenDf = seenHashes.toDF("url_hash")
    val segments = SeenSet.buildDeltaSegments(seenDf, p, expectedPerSegment = 2048, kind = "cuckoo")
    val candidates = spark.createDataset(newHashes.take(200).map(fe))
    val out = SeenSet.filterNewFiltered(candidates, segments, seenDf, p).collect()
    assert(out.map(_.url_hash).sorted.toSeq == newHashes.take(200).sorted.toSeq)
  }

  test("mergeSegments: probe over merged ≡ probe over union") {
    val p = 8
    val segA = SeenSet.buildDeltaSegments(seenHashes.take(1500).toDF("url_hash"), p, 1024)
    val segB = SeenSet.buildDeltaSegments(seenHashes.drop(1500).toDF("url_hash"), p, 1024)
    val merged = SeenSet.mergeSegments(segA, segB).collect().sortBy(_.partition_id)
    assert(merged.map(_.n_items).sum == 3000)
    val probes = merged.map(s => s.partition_id -> SeenSegments.probeFn(s.segment)).toMap
    seenHashes.foreach { h =>
      val pid = math.floorMod(h, p.toLong).toInt
      assert(probes(pid)(h), s"false negative after merge: $h")
    }
  }

  test("filter_might_contain column fn probes segments") {
    val segs = SeenSet.buildDeltaSegments(seenHashes.toDF("url_hash"), 1, 4096)
    val segBytes = segs.collect().head.segment
    val df = (seenHashes.take(100) ++ newHashes.take(100)).toDF("url_hash")
    val got = df
      .withColumn("hit", SeenSegments.filter_might_contain(lit(segBytes), $"url_hash"))
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    seenHashes.take(100).foreach(h => assert(got(h), "bloom false negative"))
    val fps = newHashes.take(100).count(got(_))
    assert(fps <= 3, s"implausible fp count $fps")
  }

  test("long-list delta segments: probe + merge dispatch across kinds") {
    val blob = GraftLongList.serialize(Array(5L, 1L, 9L, 1L))
    val probe = SeenSegments.probeFn(blob)
    assert(probe(1L) && probe(5L) && probe(9L) && !probe(2L))
    // list ⊕ list
    val ll = SeenSegments.merge(blob, GraftLongList.serialize(Array(2L)))
    assert(SeenSegments.probeFn(ll)(2L) && SeenSegments.probeFn(ll)(9L))
    // filter ⊕ list (both argument orders) folds keys into the filter
    val bloom = GraftBloomFilter.forExpected(100, 1e-3)
    bloom.insert(42L)
    Seq(SeenSegments.merge(bloom.serialized, blob), SeenSegments.merge(blob, bloom.serialized))
      .foreach { b =>
        assert(java.nio.ByteBuffer.wrap(b, 0, 4).getInt == GraftBloomFilter.Magic)
        val p = SeenSegments.probeFn(b)
        assert(p(42L) && p(1L) && p(5L) && p(9L))
      }
    val cuckoo = GraftCuckooFilter.forExpected(100)
    cuckoo.insert(42L)
    val cl = SeenSegments.merge(cuckoo.serialized, blob)
    assert(SeenSegments.probeFn(cl)(42L) && SeenSegments.probeFn(cl)(9L))
  }

  test("filterNewFiltered is exact over mixed filter + delta-list segments") {
    val p = 8
    val (seenA, seenB) = seenHashes.splitAt(1500)
    val segments = SeenSet.buildDeltaSegments(seenA.toDF("url_hash"), p, 1024)
      .unionByName(SeenSet.buildDeltaList(seenB.toDF("url_hash"), p))
    val seenDf = seenHashes.toDF("url_hash")
    val candidates = spark.createDataset(
      (seenA.take(100) ++ seenB.take(100) ++ newHashes).map(fe))
    val out = SeenSet.filterNewFiltered(candidates, segments, seenDf, p)
      .collect().map(_.url_hash).sorted
    assert(out.toSeq == newHashes.sorted.toSeq)
  }

  test("filterNewFiltered plans the probe cogroup exactly once") {
    val p = 8
    val seenDf = seenHashes.toDF("url_hash")
    val segments = SeenSet.buildDeltaSegments(seenDf, p, expectedPerSegment = 1024)
    val candidates = spark.createDataset((seenHashes.take(50) ++ newHashes.take(50)).map(fe))
    val plan = SeenSet.filterNewFiltered(candidates, segments, seenDf, p)
      .queryExecution.executedPlan.toString
    val cogroups = "CoGroup".r.findAllIn(plan).size
    assert(cogroups == 1, s"probe subtree duplicated: $cogroups CoGroup nodes in plan\n$plan")
  }

  private def magic(b: Array[Byte]): Int = java.nio.ByteBuffer.wrap(b, 0, 4).getInt

  test("compactStack: small pure-list partitions stay exact lists") {
    val out = SeenSegments.compactStack(
      Seq((GraftLongList.serialize(Array(1L, 2L, 3L)), 3L),
        (GraftLongList.serialize(Array(9L)), 1L)),
      "bloom", expectedPerSegment = 1024)
    assert(out.size == 1 && magic(out.head._1) == GraftLongList.Magic)
    val p = SeenSegments.probeFn(out.head._1)
    assert(p(1L) && p(2L) && p(3L) && p(9L) && !p(4L))
  }

  test("compactStack: pure-list partitions converge to a bounded filter once large") {
    // round-2 advisor item 1: partitions never seeded with a filter used to
    // accumulate raw 8 B/key lists forever
    val keys = (0L until 4000L).map(i => XxHash64.hashLong(i, 77L)).toArray
    for (kind <- Seq("bloom", "cuckoo")) {
      val out = SeenSegments.compactStack(
        Seq((GraftLongList.serialize(keys), keys.length.toLong)), kind, expectedPerSegment = 1024)
      val expectedMagic = if (kind == "bloom") GraftBloomFilter.Magic else GraftCuckooFilter.Magic
      assert(magic(out.head._1) == expectedMagic, s"$kind did not convert")
      // strictly smaller than the list it replaced, and every key still hits
      assert(out.map(_._1.length.toLong).sum < 8L + 8L * keys.length)
      val probes = out.map(s => SeenSegments.probeFn(s._1))
      keys.foreach(k => assert(probes.exists(_(k)), s"$kind lost $k in conversion"))
    }
  }

  test("compactStack: cuckoo saturation spills to a list segment, never throws") {
    // round-2 advisor item 2: a saturated cuckoo partition must not hard-stop
    // the crawl at every subsequent compact tick
    val tiny = GraftCuckooFilter.create(2) // 16 slots
    (0L until 14L).foreach(i => tiny.insert(XxHash64.hashLong(i, 5L)))
    val delta = (100L until 200L).map(i => XxHash64.hashLong(i, 5L)).toArray
    val out = SeenSegments.compactStack(
      Seq((tiny.serialized, 14L), (GraftLongList.serialize(delta), delta.length.toLong)),
      "cuckoo", expectedPerSegment = 16)
    assert(out.size >= 2, s"expected filter + overflow list, got ${out.size}")
    assert(out.exists(s => magic(s._1) == GraftCuckooFilter.Magic))
    assert(out.exists(s => magic(s._1) == GraftLongList.Magic))
    val probes = out.map(s => SeenSegments.probeFn(s._1))
    ((0L until 14L) ++ (100L until 200L)).map(XxHash64.hashLong(_, 5L))
      .foreach(k => assert(probes.exists(_(k)), s"lost $k across spill"))
  }

  test("compactStack: a bloom at design capacity is never overfilled — keys stack beside it") {
    // round-5 review: folding deltas into a full Bloom silently walks its
    // FPR toward 1 (the pre-screen collapses to the exact path); past the
    // design load the keys must become their own segment instead
    val expected = 1024L
    val full = GraftBloomFilter.forExpected(expected, 1e-3)
    (0L until expected).foreach(i => full.insert(XxHash64.hashLong(i, 11L)))
    val delta = (5000L until 5512L).map(XxHash64.hashLong(_, 11L)).toArray
    val out = SeenSegments.compactStack(
      Seq((full.serialized, expected), (GraftLongList.serialize(delta), delta.length.toLong)),
      "bloom", expectedPerSegment = expected)
    assert(out.size == 2, s"expected full filter + stacked keys, got ${out.size}")
    val bloomSeg = out.find(s => magic(s._1) == GraftBloomFilter.Magic).get
    // the full filter is byte-identical (untouched) and keeps its count
    assert(java.util.Arrays.equals(bloomSeg._1, full.serialized) && bloomSeg._2 == expected)
    // probing the stack still covers both populations
    val probes = out.map(s => SeenSegments.probeFn(s._1))
    ((0L until expected).map(XxHash64.hashLong(_, 11L)) ++ delta)
      .foreach(k => assert(probes.exists(_(k)), s"lost $k"))
    // and a HALF-full filter still folds in place (no gratuitous stacking)
    val half = GraftBloomFilter.forExpected(expected, 1e-3)
    (0L until expected / 4).foreach(i => half.insert(XxHash64.hashLong(i, 11L)))
    val out2 = SeenSegments.compactStack(
      Seq((half.serialized, expected / 4),
        (GraftLongList.serialize(delta), delta.length.toLong)),
      "bloom", expectedPerSegment = expected)
    assert(out2.size == 1 && magic(out2.head._1) == GraftBloomFilter.Magic)
  }

  test("compactStack: two well-loaded blooms stay side by side; undersized siblings still merge") {
    def filled(n: Long, seed: Long): GraftBloomFilter = {
      val f = GraftBloomFilter.forExpected(1024, 1e-3)
      (0L until n).foreach(i => f.insert(XxHash64.hashLong(i, seed)))
      f
    }
    val outFull = SeenSegments.compactStack(
      Seq((filled(1000, 1L).serialized, 1000L), (filled(1000, 2L).serialized, 1000L)),
      "bloom", 1024)
    assert(outFull.size == 2, "OR-merging two near-full blooms would double bit density")
    val outSmall = SeenSegments.compactStack(
      Seq((filled(300, 1L).serialized, 300L), (filled(300, 2L).serialized, 300L)),
      "bloom", 1024)
    assert(outSmall.size == 1, "undersized same-geometry siblings must still merge")
  }

  test("bloom FPR holds at design rate even when every key shares url_hash mod P") {
    // round-5 review: h1 must be the MIXED key — segment members all share
    // url_hash ≡ pid (mod P), and a raw-key first probe concentrated in a
    // coset of the bit array, inflating FPR ~1.5x past the configured fpp
    val p = 64
    val n = 4096
    val f = GraftBloomFilter.forExpected(n, 1e-3)
    // members: keys ≡ 7 (mod 64)
    (0 until n).foreach(i => f.insert(7L + 64L * i))
    var fp = 0
    val probes = 200000
    var j = 0
    while (j < probes) {
      val k = 7L + 64L * (1000000L + j) // same residue class, disjoint range
      if (f.mightContain(k)) fp += 1
      j += 1
    }
    val fpr = fp.toDouble / probes
    assert(fpr <= 1.35e-3, f"coset-biased FPR $fpr%.2e exceeds design 1e-3 + noise margin")
  }

  test("compactStack: unmergeable filter geometries stay side by side") {
    val a = GraftBloomFilter.forExpected(1000, 1e-3); a.insert(1L)
    val b = GraftBloomFilter.forExpected(5000, 1e-3); b.insert(2L)
    val out = SeenSegments.compactStack(
      Seq((a.serialized, 1L), (b.serialized, 1L)), "bloom", 1024)
    assert(out.size == 2)
    val probes = out.map(s => SeenSegments.probeFn(s._1))
    assert(probes.exists(_(1L)) && probes.exists(_(2L)))
  }

  test("mergeSegments with cuckoo kind folds oversized deltas without failing the tick") {
    val p = 2
    val existing = SeenSet.buildDeltaSegments(
      seenHashes.take(64).toDF("url_hash"), p, expectedPerSegment = 32, kind = "cuckoo")
    val delta = SeenSet.buildDeltaList(seenHashes.slice(64, 1064).toDF("url_hash"), p)
    val merged = SeenSet.mergeSegments(existing, delta, "cuckoo", expectedPerSegment = 32).collect()
    val byPid = merged.groupBy(_.partition_id)
    seenHashes.take(1064).foreach { h =>
      val pid = math.floorMod(h, p.toLong).toInt
      assert(byPid(pid).exists(s => SeenSegments.probeFn(s.segment)(h)), s"lost $h")
    }
  }

  test("retired v1 cuckoo layout is rejected loudly") {
    val blob = GraftCuckooFilter.forExpected(100).serialized
    val bb = java.nio.ByteBuffer.wrap(blob)
    bb.putInt(0, GraftCuckooFilter.MagicV1)
    val e1 = intercept[IllegalArgumentException](GraftCuckooFilter.deserialize(blob))
    assert(e1.getMessage.contains("retired"))
    intercept[IllegalArgumentException](SeenSegments.probeFn(blob))
  }

  test("property: random hash sets never produce false negatives (scalacheck gen)") {
    val gen = Gen.listOfN(500, Gen.long)
    val hs = gen.apply(Gen.Parameters.default, Seed(7L)).get.distinct
    val f = GraftBloomFilter.forExpected(hs.size.toLong, 1e-3)
    hs.foreach(f.insert)
    hs.foreach(h => assert(f.mightContain(h)))
  }
}
