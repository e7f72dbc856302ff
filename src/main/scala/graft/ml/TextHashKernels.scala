package graft.ml

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

import graft.util.XxHash64

/** Text-hash kernels for web-scale dedup (MinHash, SimHash, Karp–Rabin
  * rolling fingerprint). All pure functions of the text bytes — no RNG, no
  * state — so signatures are reproducible across runs/partitions.
  *
  * Scale shape: each kernel is O(text) per row and emits a tiny fixed-size
  * signature; candidate generation then happens relationally (LSH band
  * explode → shuffle on band key → within-bucket verify) in
  * [[TextDedup]] — the full O(n²) pair space is never materialized.
  */
object TextHashKernels {

  /** Word tokens (runs of non-JS-whitespace), lowercased. */
  def tokens(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && graft.util.JsText.isJsWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !graft.util.JsText.isJsWhitespace(text.charAt(i))) i += 1
      if (i > start) out += text.substring(start, i).toLowerCase(java.util.Locale.ROOT)
    }
    out.toArray
  }

  /** Hashes of w-token shingles (w-grams of the token stream). */
  def shingleHashes(text: String, w: Int): Array[Long] =
    shingleHashesFromTokens(tokens(text), w)

  /** Shingle hashes over an already-tokenized stream — lets a fused caller
    * (e.g. [[EnrichDoc]]) tokenize once for minhash AND simhash.
    *
    * Values are xxh64 of the space-joined shingle's UTF-8 bytes, computed
    * from per-token byte arrays assembled in one reusable buffer (UTF-8
    * concatenates byte-exactly, so this is bit-identical to hashing the
    * joined String) — the previous slice+mkString+getBytes PER SHINGLE was
    * the hot allocation site of every minhash pass (round 7). */
  def shingleHashesFromTokens(ts: Array[String], w: Int): Array[Long] = {
    if (ts.length < w) {
      if (ts.isEmpty) Array.empty
      else Array(XxHash64.hashUtf8(ts.mkString(" ")))
    } else {
      val tb = new Array[Array[Byte]](ts.length)
      var t = 0
      while (t < ts.length) {
        tb(t) = ts(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        t += 1
      }
      val out = new Array[Long](ts.length - w + 1)
      var buf = new Array[Byte](256)
      var i = 0
      while (i + w <= ts.length) {
        var need = w - 1
        var j = 0
        while (j < w) { need += tb(i + j).length; j += 1 }
        if (buf.length < need) buf = new Array[Byte](math.max(need, buf.length * 2))
        var pos = 0
        j = 0
        while (j < w) {
          if (j > 0) { buf(pos) = ' '; pos += 1 }
          val b = tb(i + j)
          System.arraycopy(b, 0, buf, pos, b.length)
          pos += b.length
          j += 1
        }
        out(i) = XxHash64.hash(buf, 0, pos, XxHash64.DefaultSeed)
        i += 1
      }
      out
    }
  }

  /** Per-family multiply-shift coefficients (a_i odd), derived once from
    * xxh64 and memoized per numHashes — the hash family h_i(x) = a_i·x + b_i
    * over the already-xxh64-mixed shingle hash. Replaces numHashes xxh64
    * calls per shingle with one multiply-add each (~5× less work in the
    * per-page hot loop); the base shingle hash supplies the avalanche, the
    * affine family supplies the independence (standard MinHash practice). */
  private val mhCoeffs = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coeffsFor(k: Int): (Array[Long], Array[Long]) =
    mhCoeffs.computeIfAbsent(k, _ => (
      Array.tabulate(k)(i => XxHash64.hashLong(i.toLong, 0x5851f42d4c957f2dL) | 1L),
      Array.tabulate(k)(i => XxHash64.hashLong(i.toLong, 0x14057b7ef767814fL))))

  /** MinHash signature: for each of `numHashes` hash families take the min
    * over shingle hashes. */
  def minhash(text: String, shingleWidth: Int, numHashes: Int): Array[Long] =
    minhashFromShingles(shingleHashes(text, shingleWidth), numHashes)

  def minhashFromShingles(shingles: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val (as, bs) = coeffsFor(numHashes)
    var s = 0
    while (s < shingles.length) {
      val base = shingles(s)
      var i = 0
      while (i < numHashes) {
        val h = as(i) * base + bs(i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** 64-bit SimHash over token hashes (bit-vote). */
  def simhash(text: String): Long = simhashFromTokens(tokens(text))

  def simhashFromTokens(ts: Array[String]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < ts.length) {
      val h = XxHash64.hashUtf8(ts(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Karp–Rabin rolling polynomial fingerprint of the whitespace-normalized
    * text (deterministic document fingerprint). */
  def rollingFingerprint(text: String): Long = {
    val B = 1000003L
    var h = 0L
    var pendingSpace = false
    var seenAny = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (graft.util.JsText.isJsWhitespace(c)) {
        if (seenAny) pendingSpace = true // deferred: trailing ws never hashed
      } else {
        if (pendingSpace) { h = h * B + ' '.toLong; pendingSpace = false }
        h = h * B + java.lang.Character.toLowerCase(c).toLong
        seenAny = true
      }
      i += 1
    }
    XxHash64.hashLong(h, 1315423911L)
  }

  /** Per-(numBits, seed, dim) ±1 hyperplane matrix, memoized like
    * [[coeffsFor]] — the signs are row-independent constants, and
    * recomputing numBits×dim xxhashes per ROW was ~10^3 wasted hash calls
    * per row on the ANN scan path (round-5 review). Values are identical
    * to the on-the-fly derivation (sign of xxh64((j<<32)|i, seed)), so
    * bucket assignments are bit-for-bit unchanged. */
  private val rhSigns =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long, Int), Array[Double]]()
  /** A normal job has exactly one (numBits, seed, dim) key; ragged
    * embedding columns add one entry per distinct vector LENGTH, which is
    * unbounded executor memory on adversarial data (round-5 advisor). A
    * hard cap with clear-on-overflow keeps the steady state (≤ a few
    * matrices, hit every row) while bounding the worst case to one
    * recompute per ragged row — the pre-memoization cost, only for data
    * that was already pathological. */
  private val RhSignsMaxEntries = 64
  private def rhSignMatrix(numBits: Int, seed: Long, dim: Int): Array[Double] = {
    if (rhSigns.size() >= RhSignsMaxEntries) rhSigns.clear()
    rhSigns.computeIfAbsent((numBits, seed, dim), key => {
      val (nb, s, d) = key
      val m = new Array[Double](nb * d)
      var j = 0
      while (j < nb) {
        var i = 0
        while (i < d) {
          m(j * d + i) =
            if ((XxHash64.hashLong((j.toLong << 32) | i.toLong, s) & 1L) == 0L) 1.0 else -1.0
          i += 1
        }
        j += 1
      }
      m
    })
  }

  /** Random-hyperplane LSH bucket for an embedding: `numBits` sign bits of
    * dot products against deterministic ±1 hyperplanes (plane j component i
    * = sign of xxh64(seed, j, i)) — no stored plane matrix, reproducible on
    * any executor. `elemIsFloat` selects the element reader: reading an
    * array<double> slot with getFloat returned 4 bytes of garbage and
    * silently noised every bucket (round-5 review). */
  def rhLshBucket(vec: ArrayData, numBits: Int, seed: Long, elemIsFloat: Boolean): Long = {
    val n = vec.numElements()
    val signs = rhSignMatrix(numBits, seed, n)
    var bucket = 0L
    var j = 0
    while (j < numBits) {
      var dot = 0.0
      val off = j * n
      var i = 0
      while (i < n) {
        val x = if (elemIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        dot += signs(off + i) * x
        i += 1
      }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  // ---- Spark internal-type bridges (static call targets for codegen) ----

  def minhashArrayData(text: UTF8String, w: Int, k: Int): ArrayData =
    new GenericArrayData(minhash(text.toString, w, k))

  def simhashLong(text: UTF8String): Long = simhash(text.toString)

  def fingerprintLong(text: UTF8String): Long = rollingFingerprint(text.toString)
}

/** `minhash_sig(text)` → array<bigint> of length numHashes. */
case class MinHashSig(child: Expression, shingleWidth: Int, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(t: Any): Any =
    TextHashKernels.minhashArrayData(t.asInstanceOf[UTF8String], shingleWidth, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.ml.TextHashKernels.minhashArrayData($t, $shingleWidth, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash64(text)` → bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(t: Any): Any =
    TextHashKernels.simhashLong(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.ml.TextHashKernels.simhashLong($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `doc_fingerprint(text)` → bigint rolling-hash fingerprint. */
case class DocFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "doc_fingerprint"
  override protected def nullSafeEval(t: Any): Any =
    TextHashKernels.fingerprintLong(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.ml.TextHashKernels.fingerprintLong($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `rh_lsh_bucket(embedding)` → bigint LSH bucket (random-hyperplane);
  * accepts array<float> or array<double> (the element reader is resolved
  * from the child's type, mirroring VecDot/VecCosine). */
case class RhLshBucket(child: Expression, numBits: Int, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rh_lsh_bucket"
  private def childIsFloat: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(v: Any): Any =
    TextHashKernels.rhLshBucket(v.asInstanceOf[ArrayData], numBits, seed, childIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.ml.TextHashKernels.rhLshBucket($v, $numBits, ${seed}L, $childIsFloat)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextHashFunctions {
  def minhash_sig(text: Column, shingleWidth: Int = 3, numHashes: Int = 64): Column =
    EU.column(MinHashSig(EU.expression(text), shingleWidth, numHashes))
  def simhash64(text: Column): Column =
    EU.column(SimHash64(EU.expression(text)))
  def doc_fingerprint(text: Column): Column =
    EU.column(DocFingerprint(EU.expression(text)))
  def rh_lsh_bucket(embedding: Column, numBits: Int = 16, seed: Long = 42L): Column =
    EU.column(RhLshBucket(EU.expression(embedding), numBits, seed))
}
