package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed sketch aggregators for the dedup family (SURVEY.md §2.10 L2,
  * §4 "custom code concentrates in … one Aggregator").
  *
  * Both consume the per-shingle 57-bit [[Hashes.polyHash]] value and
  * build a fixed-size per-document signature in a single pass. Compared
  * to the explode-K-rows-per-shingle formulation this removes the K×
  * row blow-up and its shuffle: the buffer is a constant-size array,
  * partials combine associatively (elementwise min / elementwise sum),
  * so map-side partial aggregation applies and the shuffle carries one
  * small buffer per (partition, doc).
  *
  * Signatures are order-independent (min / integer sum), so results are
  * deterministic under any partitioning — the DuckDB oracle parity of
  * the downstream pair sets is unaffected.
  *
  * @note scale: at 100 TB this is the difference between shuffling
  *   64×|shingles| rows and |docs| fixed-width buffers.
  */
object SketchAggregators {

  /** MinHash signature: K=64 permutations hᵢ(x) = (aᵢ·x + bᵢ) mod M over
    * the shingle-hash domain reduced mod M = 2³¹−1 (keeps aᵢ·x inside
    * 64-bit arithmetic — same formula the oracle-free LSH layer and any
    * cross-engine check would use). */
  object MinHashSig extends Aggregator[Long, Array[Long], Seq[Long]] {
    private val M = 2147483647L
    private val K = 64

    override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < K) {
        val h = ((2L * i + 1L) * x + (1000003L * i + 12345L)) % M
        if (h < b(i)) b(i) = h
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < K) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** SimHash signature: 57 bit-vote counters over the shingle hashes,
    * packed to one BIGINT (bit i set iff vote ≥ 0). 57, not 64: the
    * input hash domain is [[Hashes.P]] < 2^57, so higher bits are
    * constant in every input and would carry zero similarity signal. */
  object SimHashSig extends Aggregator[Long, Array[Int], Long] {
    private val B = 57

    override def zero: Array[Int] = new Array[Int](B)

    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < B) {
        b(i) += (if (((h >> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      b
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < B) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(r: Array[Int]): Long = {
      var s = 0L
      var i = 0
      while (i < B) { if (r(i) >= 0) s |= (1L << i); i += 1 }
      s
    }

    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** SpaceSaving heavy hitters (Metwally et al., "Efficient computation
    * of frequent and top-k elements in data streams"): bounded-capacity
    * counter summary — when a new term arrives at a full summary it
    * evicts the minimum counter and inherits its count as error bound.
    * Partials merge by union-sum then trim (the mergeable-summaries
    * treatment, Agarwal et al.), so map-side combine applies and the
    * shuffle carries one ≤`capacity` map per partition.
    *
    * Guarantees: true count ∈ [cnt − err, cnt]; any term with frequency
    * > N/capacity is present. With capacity ≥ distinct terms the sketch
    * degenerates to EXACT counting (err = 0) — the fixture key runs in
    * that regime so the DuckDB oracle can check it; the spec exercises
    * the approximate regime on skewed data.
    *
    * @note scale: counter maps are capacity-bounded regardless of
    *   corpus size — the whole point vs an exact wordcount whose
    *   keyspace is the vocabulary. */
  class SpaceSavingTopK(capacity: Int)
      extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]] {
    require(capacity >= 1)

    override def zero: Map[String, (Long, Long)] = Map.empty

    override def reduce(b: Map[String, (Long, Long)], term: String): Map[String, (Long, Long)] =
      b.get(term) match {
        case Some((c, e)) => b.updated(term, (c + 1, e))
        case None if b.size < capacity => b.updated(term, (1L, 0L))
        case None =>
          val (mt, (mc, _)) = b.minBy { case (t, (c, _)) => (c, t) }
          (b - mt).updated(term, (mc + 1, mc))
      }

    override def merge(a: Map[String, (Long, Long)],
        b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
      // A term absent from a FULL summary may have been evicted there
      // with a count up to that summary's minimum counter — credit it
      // with that minimum (as both count and error), per the mergeable-
      // summaries treatment; crediting 0 would break the truth ≤ cnt
      // upper bound. A non-full summary genuinely never saw the term.
      val minA = if (a.size < capacity) 0L else a.valuesIterator.map(_._1).min
      val minB = if (b.size < capacity) 0L else b.valuesIterator.map(_._1).min
      val u = (a.keySet ++ b.keySet).map { t =>
        val (ac, ae) = a.getOrElse(t, (minA, minA))
        val (bc, be) = b.getOrElse(t, (minB, minB))
        t -> (ac + bc, ae + be)
      }.toMap
      if (u.size <= capacity) u
      else u.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(capacity).toMap
    }

    override def finish(r: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
      r.toSeq.map { case (t, (c, e)) => (t, c, e) }
        .sortBy { case (t, c, _) => (-c, t) }

    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      ExpressionEncoder[Map[String, (Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  /** Count-Min sketch (Cormode & Muthukrishnan, "An improved data
    * stream summary: the count-min sketch and its applications",
    * J. Algorithms 2005): `depth × width` counters; each key increments
    * one counter per row via pairwise-independent hashes
    * `hᵢ(x) = ((aᵢ·x + bᵢ) mod p) mod width`; a point estimate is the
    * MIN over its `depth` counters — never an underestimate, over by at
    * most `e/width · N` with probability `1 − e^-depth`. Partials merge
    * by elementwise ADD (the canonical mergeable summary), so map-side
    * combine applies and per-group sketches roll up into corpus
    * sketches WITHOUT re-reading history — same incremental pattern as
    * the HLL/KLL keys, for per-key frequencies.
    *
    * Deterministic: fixed hash constants, integer arithmetic — a CMS
    * built on any partitioning of the same multiset is bit-identical
    * (addition commutes), unlike sampling-based summaries.
    *
    * @note scale: the buffer is `depth·width` longs regardless of
    *   corpus size or key cardinality; the shuffle carries one buffer
    *   per (partition, group). Estimation reads the merged counters —
    *   a bounded `depth·width`-long table, broadcast-size. */
  class CountMin(val depth: Int = 4, val width: Int = 2048)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(depth >= 1 && depth <= CountMin.A.length && width >= 2)

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < depth) {
        b(i * width + CountMin.cell(x, i, width)) += 1L
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** KMV / bottom-k distinct-count sketch (Bar-Yossef et al., "Counting
    * distinct elements in a data stream", RANDOM 2002 — the estimator
    * family theta sketches build on): keep the `k` smallest DISTINCT
    * hash values of the keys; with hashes uniform on `[0, M)`, the
    * k-th smallest value `h_k` estimates the distinct count as
    * `(k−1)·M / h_k`. Fewer than `k` retained values means the sketch
    * saw every distinct hash — the estimate degenerates to the EXACT
    * count. Partials merge by union + re-trim (associative,
    * order-independent), so map-side combine applies and per-group
    * sketches roll up into corpus sketches without re-reading history.
    *
    * Unlike the DataSketches HLL/theta builtins, every step here is
    * engine-portable integer arithmetic (`h = (a·(x mod M) + b) mod M`,
    * a sorted distinct bottom-k, one IEEE division) — so the DuckDB
    * oracle REBUILDS the sketch and hash-checks the estimates exactly,
    * the [[CountMin]] template applied to the distinct-count family.
    *
    * Accuracy: relative SE ≈ 1/√(k−2) (~6% at k=256); hash collisions
    * under-count by O(n²/M) — negligible below ~10⁷ distinct at
    * M = 2³¹−1, and the estimate stays deterministic regardless.
    *
    * @note scale: the buffer is ≤ k longs however many rows stream in;
    *   the shuffle carries one bounded array per (partition, group).
    *   The reduce path is a membership binary-search + ordered insert —
    *   O(log k) search, O(k) worst-case insert, amortized cheap because
    *   most values fall above the current k-th minimum and are
    *   rejected in O(log k). */
  class BottomK(val k: Int = 256) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(k >= 2)
    import BottomK.{M, A, B}

    override def zero: Array[Long] = Array.empty

    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      val xm = ((x % M) + M) % M
      val h = (A * xm + B) % M
      insert(buf, h)
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var r = a
      var i = 0
      while (i < b.length) { r = insert(r, b(i)); i += 1 }
      r
    }

    /** Sorted-unique insert keeping the k smallest. */
    private def insert(buf: Array[Long], h: Long): Array[Long] = {
      val p = java.util.Arrays.binarySearch(buf, h)
      if (p >= 0) buf // already present
      else {
        val at = -(p + 1)
        if (at >= k) buf // above the k-th minimum — rejected
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, at)
          out(at) = h
          System.arraycopy(buf, at, out, at + 1, n - at - 1)
          out
        }
      }
    }

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  object BottomK {
    /** Same BIGINT-safe modulus discipline as [[CountMin.M]]. */
    val M = 2147483647L
    val A = 1000000007L
    val B = 12345L

    /** DuckDB fragment for the hash — shared by the oracle restatement. */
    def oHash(x: String): String =
      s"(($A * ((($x % $M) + $M) % $M) + $B) % $M)"
  }

  /** Fixed equi-width histogram counts over integer CENTS — the
    * [[graft.queries.ExtendedQueries]] `agg_hist_mergeable` bin math
    * (`bin = (cents·bins) div (domainCents)`, clamped to the last bin)
    * packaged as an Aggregator so ONE scan can emit histogram partials
    * alongside [[BottomK]]/[[HllRegisters]] sketches (the multi-sketch
    * profile-job pattern). Counts merge by elementwise addition —
    * associative, order-independent, map-side-combine friendly — and
    * every derived statistic (quantile = first bin reaching ⌈p·n⌉) is
    * exact integer arithmetic the DuckDB oracle rebuilds.
    *
    * @note scale: fixed `bins` longs per (partition, group). */
  class HistCounts(val bins: Int = 1024, val domainCents: Long)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(bins >= 2 && domainCents > 0)

    override def zero: Array[Long] = new Array[Long](bins)

    override def reduce(b: Array[Long], cents: Long): Array[Long] = {
      val bin = math.min(bins - 1L, cents * bins / domainCents).toInt
      b(math.max(0, bin)) += 1
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bins) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** PORTABLE HyperLogLog registers (Flajolet et al., "HyperLogLog: the
    * analysis of a near-optimal cardinality estimation algorithm",
    * AofA 2007) over the [[BottomK]] hash: bucket = low `p` bits of
    * `h = (A·x+B) mod M`, rho = leading-zero run of the remaining
    * `31−p` bits plus one, register = max rho per bucket. Every step is
    * integer arithmetic on a shared 31-bit hash, so — unlike the
    * DataSketches `hll_sketch_agg` builtin, whose HIP estimator and
    * binary layout are engine-specific — the DuckDB oracle REBUILDS
    * the registers and the estimate and hash-checks both (the
    * [[CountMin]]/[[BottomK]] template applied to HLL itself).
    *
    * `finish` returns the FULL 2^p register array (zeros included), so
    * downstream arithmetic (`Σ 2^(rmax−r)` as an exact BIGINT, zero
    * count, raw estimate `α·m²·2^rmax / S`) is pure column math. The
    * published small-range linear-counting correction needs `ln`,
    * which is NOT identically rounded across libm implementations —
    * the oracle-checked contract is therefore the RAW estimate
    * (deterministic IEEE mul/div only), with the exact register array
    * carried alongside; accuracy against exact counts is spec-gated in
    * the estimator's working regime (`n ≳ 2.5·m`).
    *
    * Registers merge by elementwise max (associative,
    * order-independent) — map-side combine applies, per-group sketches
    * roll up to corpus sketches without re-reading history.
    *
    * @note scale: fixed 2^p ints per (partition, group) buffer; the
    *   shuffle carries one bounded array per group. */
  class HllRegisters(val p: Int = 8) extends Aggregator[Long, Array[Int], Seq[Long]] {
    require(p >= 4 && p <= 16)
    import BottomK.{M, A, B}
    private val m = 1 << p
    private val suffixBits = 31 - p

    override def zero: Array[Int] = new Array[Int](m)

    override def reduce(buf: Array[Int], x: Long): Array[Int] = {
      val xm = ((x % M) + M) % M
      val h0 = (A * xm + B) % M
      // quadratic strengthening: the affine map alone sends sequential
      // keys to an arithmetic progression whose high bits correlate
      // with the leading-zero statistic (measured ~50% bias on 1..n
      // keys); (h²+h) mod M breaks the linearity and stays exact in
      // BIGINT (h² < 2^62), so the oracle still rebuilds it verbatim
      val h = (h0 * h0 + h0) % M
      val bucket = (h & (m - 1)).toInt
      val w = h >>> p
      val rho =
        if (w == 0L) suffixBits + 1
        else suffixBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho
      buf
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(r: Array[Int]): Seq[Long] = r.toSeq.map(_.toLong)
    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  object CountMin {
    /** Modulus 2³¹−1 keeps `a·x` under 2⁶² — exact in BIGINT on any
      * engine, which is what lets the DuckDB oracle REBUILD the sketch
      * arithmetic and hash-check the estimates (the opaque-bytes
      * sketches can't). */
    val M = 2147483647L
    val A = Array(1000000007L, 998244353L, 786433L, 104857601L, 479001599L)
    val B = Array(12345L, 67891L, 13579L, 24680L, 11111L)

    /** Row-i cell index of key `x` — shared by build, estimate and the
      * oracle restatement: `((aᵢ·(x mod M) + bᵢ) mod M) mod width`. */
    def cell(x: Long, i: Int, width: Int): Int = {
      val xm = ((x % M) + M) % M
      (((A(i) * xm + B(i)) % M) % width).toInt
    }

    /** Point estimate of `x` from merged counters (depth-major layout). */
    def estimate(counters: IndexedSeq[Long], depth: Int, width: Int,
        x: Long): Long = {
      var best = Long.MaxValue
      var i = 0
      while (i < depth) {
        val c = counters(i * width + cell(x, i, width))
        if (c < best) best = c
        i += 1
      }
      best
    }
  }
}
