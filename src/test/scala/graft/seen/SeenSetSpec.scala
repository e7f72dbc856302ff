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

  test("property: random hash sets never produce false negatives (scalacheck gen)") {
    val gen = Gen.listOfN(500, Gen.long)
    val hs = gen.apply(Gen.Parameters.default, Seed(7L)).get.distinct
    val f = GraftBloomFilter.forExpected(hs.size.toLong, 1e-3)
    hs.foreach(f.insert)
    hs.foreach(h => assert(f.mightContain(h)))
  }
}
