package graft.functions

/** Top-level JVM kernels invoked from generated (Janino) code.
  *
  * These live in a top-level object on purpose: Scala emits a static
  * forwarder class with a `$`-free name (`graft.functions.Kernels`),
  * which is what whole-stage-codegen'd Java can legally reference —
  * nested objects compile to `Outer$Inner$` names Janino cannot parse,
  * silently dropping the expression out of codegen.
  */
object Kernels {

  /** ArrayData -> Array[Float] with a LOUD null-element check.
    * `toFloatArray()` alone reads null slots as 0.0f (the unsafe format
    * copies the primitive region, ignoring null bits) — a partially-null
    * corrupt embedding would then score a plausible similarity and rank
    * in top-k, the exact silent wrongness [[cosine]]'s dimension guard
    * exists to prevent. The null-bit scan is O(n) bit tests, noise next
    * to the O(n) multiply loops it protects. */
  def floatsStrict(
      a: org.apache.spark.sql.catalyst.util.ArrayData): Array[Float] = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"embedding contains a NULL element at index $i — corrupt " +
            "vector; clean or drop it upstream")
      i += 1
    }
    a.toFloatArray()
  }

  /** Cosine similarity, double accumulation in index order. Dimension
    * mismatch FAILS FAST: truncating to the shorter vector would score
    * a corrupt (e.g. upstream-truncated) embedding with a plausible
    * similarity and let it rank in top-k results — the data error must
    * surface, not propagate as silently wrong neighbors. */
  def cosine(x: Array[Float], y: Array[Float]): Double = {
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"cosine: dimension mismatch ${x.length} vs ${y.length}")
    val n = x.length
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Dot product alone, double accumulation in index order — the
    * [[cosine]] numerator with the identical per-element sequence
    * (`dot += x(i)*y(i)`), so `dot(x,y) / (norm(x) * norm(y))` is
    * bit-identical to `cosine(x,y)` whenever both norms are nonzero.
    * Exists for quadratic pair stages (SemDeDup's within-cluster join):
    * precomputing each side's norm once per VECTOR instead of once per
    * PAIR cuts the per-pair flops 3x without perturbing a single
    * result bit. Same fail-fast dimension guard as [[cosine]]. */
  def dot(x: Array[Float], y: Array[Float]): Double = {
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"dot: dimension mismatch ${x.length} vs ${y.length}")
    val n = x.length
    var d = 0.0; var i = 0
    while (i < n) { d += x(i).toDouble * y(i).toDouble; i += 1 }
    d
  }

  /** [[dot]] straight off the columnar `ArrayData`, no intermediate
    * float arrays: a quadratic pair stage calls this once per PAIR, and
    * the two per-call `toFloatArray` copies (allocation + memcpy) cost
    * more than the 2n multiplies they feed. Identical accumulation
    * order and dimension guard; the null-element scan is folded into
    * the same pass (strictness contract of [[floatsStrict]], same
    * failure). */
  def dotAD(x: org.apache.spark.sql.catalyst.util.ArrayData,
            y: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"dot: dimension mismatch $n vs ${y.numElements()}")
    var d = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          s"embedding contains a NULL element at index $i — corrupt " +
            "vector; clean or drop it upstream")
      d += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    d
  }

  /** Euclidean norm with the [[cosine]] denominator's exact arithmetic:
    * the same `nx += x(i)*x(i)` accumulation order, then one sqrt —
    * `norm(x) == math.sqrt(nx)` for the nx [[cosine]] would compute, so
    * a zero norm here is exactly cosine's `nx == 0.0` branch (sqrt(0)
    * is exact) and the precomputed-norm cosine reconstruction above is
    * bitwise faithful, zero-vector contract included. */
  def norm(x: Array[Float]): Double = {
    val n = x.length
    var nx = 0.0; var i = 0
    while (i < n) { val xi = x(i).toDouble; nx += xi * xi; i += 1 }
    math.sqrt(nx)
  }

  /** Universal-hash parameters for MinHash, fixed seed. Cached per k. */
  private val P = 2147483647L // 2^31-1
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def minhashParams(k: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(k, _ => {
      val rnd = new scala.util.Random(42)
      (Array.fill(k)(rnd.nextInt(Int.MaxValue - 1).toLong + 1),
        Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong))
    })

  def fnv1a64Bytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** One-pass MinHash signature straight from a token array: token FNV
    * hashes -> rolling combine over `w`-token shingles -> all k universal
    * hashes min'd in a single loop. No shingle strings are materialized
    * and the token array is traversed once — O(tokens * k) long ops,
    * versus the naive HOF formulation's O(k) *re-generations* of the
    * shingle strings. Returns null-length-0 array for < w tokens.
    */
  def minhashFromTokenHashes(tokenHashes: Array[Long], w: Int, k: Int): Array[Long] = {
    val n = tokenHashes.length - w + 1
    if (n <= 0) return Array.empty
    val (as, bs) = minhashParams(k)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // combine w consecutive token hashes into one shingle hash
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < w) { h ^= tokenHashes(i + j); h *= 0x100000001b3L; j += 1 }
      val hp = ((h % P) + P) % P
      var t = 0
      while (t < k) {
        val v = (as(t) * hp + bs(t)) % P
        if (v < sig(t)) sig(t) = v
        t += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys from a MinHash signature: one FNV key per band of
    * r consecutive signature values, band index mixed in. One pass. */
  def bandKeys(sig: org.apache.spark.sql.catalyst.util.ArrayData,
      bands: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = sig.numElements()
    // loud guard, not silent wrongness: bands > n would give r = 0 and
    // every row the identical band-index-only keys (one giant bucket);
    // a non-dividing bands would silently drop the tail sig values
    if (bands < 1 || n < 1 || n % bands != 0)
      throw new IllegalArgumentException(
        s"band_keys: bands ($bands) must divide the signature length ($n)" +
          " and both must be positive (an empty signature would give" +
          " every row the identical band-index-only keys)")
    val r = n / bands
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var h = 0xcbf29ce484222325L
      h ^= j; h *= 0x100000001b3L
      var t = 0
      while (t < r) { h ^= sig.getLong(j * r + t); h *= 0x100000001b3L; t += 1 }
      out(j) = h; j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** SimHash chunk keys: the 64-bit signature split into `chunks` bit
    * ranges (last chunk absorbs the remainder), chunk index NOT mixed in
    * (the pair (pos, key) is the bucket id downstream). */
  def chunkKeys(sig: Long, chunks: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // loud guard like bandKeys: chunks > 64 gives width 0 and
    // constant-0 keys for every position but the last (giant buckets,
    // silent recall collapse); chunks < 1 would divide by zero per row
    if (chunks < 1 || chunks > 64)
      throw new IllegalArgumentException(
        s"chunk_keys: chunks must be in [1, 64], got $chunks")
    val width = 64 / chunks
    val out = new Array[Long](chunks)
    var j = 0
    while (j < chunks) {
      val w = if (j == chunks - 1) 64 - j * width else width
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      out(j) = (sig >>> (j * width)) & mask
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Index of the max-cosine centroid for `v` (first max wins). One pass
    * over the centroid matrix — the IVF assignment hot loop. */
  def argmaxCosine(v: Array[Float], cents: Array[Array[Float]]): Int = {
    if (cents.length == 0)
      throw new IllegalArgumentException(
        "argmax_cosine: empty centroid matrix (every vector would land" +
          " in a phantom cluster 0)")
    var best = 0; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val s = cosine(v, cents(c))
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    best
  }

  /** Best centroid by (HALF_UP-6-rounded cosine DESC, centroid id ASC)
    * in one compiled pass — the k-means assignment hot loop
    * ([[graft.ops.Clustering]]). Differs from [[argmaxCosine]] on
    * purpose: the similarity is rounded BEFORE the comparison (the
    * DuckDB-oracle total order — an unrounded arg-max could flip on
    * last-ulp noise between engines), and ties go to the smallest id,
    * which `ids` being sorted ascending plus the strict `>` delivers
    * for free. Returns struct(sim, cid). */
  def bestCentroid(v: Array[Float], cents: Array[Array[Float]],
                   ids: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    if (cents.length == 0 || cents.length != ids.length)
      throw new IllegalArgumentException(
        s"best_centroid: ${cents.length} centroids vs ${ids.length} ids")
    var best = 0; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val s = graft.functions.Rounding.roundHalfUpDouble(cosine(v, cents(c)), 6)
      if (s > bestSim) { bestSim = s; best = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestSim, ids(best)))
  }

  /** Best centroid via a two-level route — the hierarchical (IVF-style)
    * answer to [[bestCentroid]]'s flat k-flop scan: arg-max over the g
    * coarse group centroids first (rounded cosine DESC, group id ASC —
    * the same total order), then arg-max over only the fine centroids
    * belonging to that group. Per-row cost is g + |group| ≈ 2·sqrt(k)
    * cosines instead of k. `fineGroup(i)` is the group id of fine
    * centroid i; both id arrays are ascending so first-max-wins IS the
    * smallest-id tie-break the DuckDB oracle replays. Every reachable
    * group must hold at least one fine centroid ([[graft.ops.Clustering
    * .kmeansTree]] guarantees it: seeds come from group members under
    * the SAME fixed coarse routing); an empty route fails loud. */
  def bestCentroidRouted(v: Array[Float], coarse: Array[Array[Float]],
      coarseIds: Array[Long], fine: Array[Array[Float]], fineIds: Array[Long],
      fineGroup: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    if (coarse.length == 0 || coarse.length != coarseIds.length)
      throw new IllegalArgumentException(
        s"best_centroid_routed: ${coarse.length} coarse centroids vs " +
          s"${coarseIds.length} ids")
    if (fine.length == 0 || fine.length != fineIds.length ||
        fine.length != fineGroup.length)
      throw new IllegalArgumentException(
        s"best_centroid_routed: ${fine.length} fine centroids vs " +
          s"${fineIds.length} ids vs ${fineGroup.length} groups")
    var bg = 0; var bgSim = Double.NegativeInfinity
    var c = 0
    while (c < coarse.length) {
      val s = graft.functions.Rounding.roundHalfUpDouble(cosine(v, coarse(c)), 6)
      if (s > bgSim) { bgSim = s; bg = c }
      c += 1
    }
    val gid = coarseIds(bg)
    var best = -1; var bestSim = Double.NegativeInfinity
    c = 0
    while (c < fine.length) {
      if (fineGroup(c) == gid) {
        val s = graft.functions.Rounding.roundHalfUpDouble(cosine(v, fine(c)), 6)
        if (s > bestSim) { bestSim = s; best = c }
      }
      c += 1
    }
    if (best < 0)
      throw new IllegalStateException(
        s"best_centroid_routed: group $gid holds no fine centroid — " +
          "the routing table is inconsistent with the seeding contract")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestSim, fineIds(best)))
  }

  /** All `keep`-element subsets of 0..m-1 in lexicographic order
    * (cached): the block-combination tables for SimHash banding. */
  private val subsetCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Int]]]()
  def blockSubsets(m: Int, keep: Int): Array[Array[Int]] =
    subsetCache.computeIfAbsent(m << 8 | keep, _ =>
      (0 until m).combinations(keep).map(_.toArray).toArray)

  /** Permuted-block SimHash table keys (Manku/Jain/Sarma, WWW'07 shape):
    * the signature is split into `m` blocks; for every `keep`-subset of
    * block positions one table key is emitted (FNV mix of the subset id
    * and the selected blocks' bits). A pair within Hamming distance
    * m - keep corrupts at most m - keep blocks, so at least `keep`
    * blocks survive intact and SOME table key matches — banding recall
    * is exact for that radius, with a `keep * 64/m`-bit keyspace per
    * table instead of the single-chunk scheme's `64/(h+1)` bits. */
  def permTableKeys(sig: Long, m: Int,
      keep: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // keep > m would yield ZERO subsets -> zero table keys -> zero
    // candidate pairs, a silent recall collapse; fail like bandKeys
    if (m < 1 || m > 64 || keep < 1 || keep > m)
      throw new IllegalArgumentException(
        s"perm_table_keys: need 1 <= keep <= m <= 64, got m=$m keep=$keep")
    val width = 64 / m
    val blocks = new Array[Long](m)
    var j = 0
    while (j < m) {
      val w = if (j == m - 1) 64 - j * width else width
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      blocks(j) = (sig >>> (j * width)) & mask
      j += 1
    }
    val subsets = blockSubsets(m, keep)
    val out = new Array[Long](subsets.length)
    var t = 0
    while (t < subsets.length) {
      var h = 0xcbf29ce484222325L
      h ^= t; h *= 0x100000001b3L
      val s = subsets(t)
      var i = 0
      while (i < s.length) { h ^= blocks(s(i)); h *= 0x100000001b3L; i += 1 }
      out(t) = h
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Codegen entry point: token ArrayData -> SimHash64 signature. */
  def simhashFromArrayData(
      arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64Bytes(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Codegen entry point: token ArrayData -> MinHash signature. */
  def minhashSigFromArrayData(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      w: Int, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // skip nulls (same semantics as simhashFromArrayData): hashing them
    // to a constant would correlate the signatures of unrelated
    // null-bearing documents and inflate their estimated similarity
    val n = arr.numElements()
    var nonNull = 0
    var i = 0
    while (i < n) { if (!arr.isNullAt(i)) nonNull += 1; i += 1 }
    val hashes = new Array[Long](nonNull)
    i = 0; var o = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        hashes(o) = fnv1a64Bytes(arr.getUTF8String(i).getBytes); o += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      minhashFromTokenHashes(hashes, w, k))
  }

  /** Spread the low 32 bits of v into the even bit positions. */
  private def spreadBits(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton (z-order) key: interleave the low 32 bits of a and b —
    * a gets the even positions, b the odd. Sorting by the key yields
    * the space-filling z-curve, so both dimensions cluster at once.
    * Inputs must be non-negative (callers offset/bucket first). */
  def zorder(a: Long, b: Long): Long = {
    // enforce the documented contract instead of silently aliasing:
    // values outside [0, 2^32) lose their high bits to the interleave
    // mask and the "clustered" key becomes a scramble — every file
    // then spans the whole domain and min/max skipping dies quietly
    if (((a | b) & 0xFFFFFFFF00000000L) != 0L)
      throw new IllegalArgumentException(
        s"z_order: inputs must be in [0, 2^32), got ($a, $b) — offset" +
          " or bucket them first")
    spreadBits(a) | (spreadBits(b) << 1)
  }

  /** Winnowing anchors: the positions [[fingerprints]] discards. Per
    * sliding window of `w` gram hashes, the SMALLEST position holding
    * the window minimum (signed compare, like fingerprints); distinct
    * (pos, hash) pairs in ascending-pos order. `pos` is the 0-based
    * char offset of the k-gram. Returned pre-packed as ArrayData of
    * (pos INT, h LONG) rows so the expression wrapper is a one-line
    * static call that stays inside whole-stage codegen. */
  /** The winnow selection shared by [[winnowAnchorRows]] and
    * [[anchorContextRows]]: FNV k-gram hashes and the distinct,
    * pos-sorted anchor positions. Empty selection for |s| < k. */
  private def winnowSelect(s: String, k: Int, w: Int)
      : (Array[Long], Array[Int]) = {
    if (k < 1 || w < 1)
      throw new IllegalArgumentException(
        s"winnow_anchors: k and w must be >= 1, got k=$k w=$w")
    if (s.length < k) return (Array.empty[Long], Array.empty[Int])
    val n = s.length - k + 1
    val grams = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h ^= (s.charAt(i + j) & 0xffffL); h *= 0x100000001b3L; j += 1 }
      grams(i) = h; i += 1
    }
    // ascending-pos dedup: window starts only move right, and each
    // window's argmin is >= the previous window's start, so a TreeSet
    // of positions yields the distinct anchors already pos-sorted
    val sel = scala.collection.mutable.TreeSet.empty[Int]
    if (n <= w) {
      var m = Long.MaxValue; var best = 0; i = 0
      while (i < n) { if (grams(i) < m) { m = grams(i); best = i }; i += 1 }
      sel += best
    } else {
      i = 0
      while (i + w <= n) {
        var m = Long.MaxValue; var best = i; var j = i
        while (j < i + w) { if (grams(j) < m) { m = grams(j); best = j }; j += 1 }
        sel += best
        i += 1
      }
    }
    (grams, sel.toArray)
  }

  def winnowAnchorRows(s: String, k: Int, w: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val (grams, sel) = winnowSelect(s, k, w)
    val rows = sel.map { p =>
      org.apache.spark.sql.catalyst.InternalRow(p, grams(p)): Any
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** The whole per-document anchor-context stage of the ExactSubstr
    * family in ONE map-side pass: winnow anchors, bounded context
    * windows (maxExt chars either side of the k-gram — pre = the up-to-
    * maxExt chars before pos, post = the k-gram plus up to maxExt chars
    * after), and duplicate-context collapse — anchors with identical
    * (h, pre, post) merge into one row carrying ALL their positions.
    * Returned as (h, pre, post, ps) rows ordered by first position —
    * deterministic, and the collapse happens BEFORE any shuffle, which
    * is the point: a doc full of repeated boilerplate ships each
    * distinct context once, however many times it occurs. */
  def anchorContextRows(s: String, k: Int, w: Int, maxExt: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val (grams, sel) = winnowSelect(s, k, w)
    // first-seen (= ascending first-pos) insertion order is the
    // deterministic output order; duplicates append their position
    val m = scala.collection.mutable.LinkedHashMap
      .empty[(Long, String, String), scala.collection.mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < sel.length) {
      val p = sel(i)
      val pre = s.substring(math.max(0, p - maxExt), p)
      val post = s.substring(p, math.min(s.length, p + k + maxExt))
      m.getOrElseUpdate((grams(p), pre, post),
        scala.collection.mutable.ArrayBuffer.empty[Int]) += p
      i += 1
    }
    val rows = m.iterator.map { case ((h, pre, post), ps) =>
      org.apache.spark.sql.catalyst.InternalRow(
        h,
        org.apache.spark.unsafe.types.UTF8String.fromString(pre),
        org.apache.spark.unsafe.types.UTF8String.fromString(post),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ps.toArray.map(x => x: Any))): Any
    }.toArray
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Longest common prefix length in chars (UTF-16 units — identical to
    * codepoints on the ASCII corpora the oracle contract covers, same
    * status as [[fingerprints]]' charAt hashing). */
  def commonPrefixLen(a: org.apache.spark.unsafe.types.UTF8String,
                      b: org.apache.spark.unsafe.types.UTF8String): Int = {
    val sa = a.toString; val sb = b.toString
    val n = math.min(sa.length, sb.length)
    var i = 0
    while (i < n && sa.charAt(i) == sb.charAt(i)) i += 1
    i
  }

  /** Longest common suffix length in chars (see [[commonPrefixLen]]). */
  def commonSuffixLen(a: org.apache.spark.unsafe.types.UTF8String,
                      b: org.apache.spark.unsafe.types.UTF8String): Int = {
    val sa = a.toString; val sb = b.toString
    val la = sa.length; val lb = sb.length
    val n = math.min(la, lb)
    var i = 0
    while (i < n && sa.charAt(la - 1 - i) == sb.charAt(lb - 1 - i)) i += 1
    i
  }

  /** Winnowing fingerprints: rolling FNV over char k-grams, min per
    * window of w, distinct sorted. */
  def fingerprints(s: String, k: Int, w: Int): Array[Long] = {
    // k < 1 would make every doc return the constant FNV-basis
    // fingerprint (all-pairs match); w < 1 emits sentinel values
    if (k < 1 || w < 1)
      throw new IllegalArgumentException(
        s"winnow_fingerprint: k and w must be >= 1, got k=$k w=$w")
    if (s.length < k) return Array.empty
    val n = s.length - k + 1
    val grams = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h ^= (s.charAt(i + j) & 0xffffL); h *= 0x100000001b3L; j += 1 }
      grams(i) = h; i += 1
    }
    if (n <= w) return Array(grams.min)
    val out = scala.collection.mutable.TreeSet.empty[Long]
    i = 0
    while (i + w <= n) {
      var m = Long.MaxValue; var j = i
      while (j < i + w) { if (grams(j) < m) m = grams(j); j += 1 }
      out += m; i += 1
    }
    out.toArray
  }

  /** Sennrich merge-rule replay for ONE word: code-point character
    * seeding, then each learned rule applied in rank order with the
    * left-to-right non-overlapping scan — exactly the training fold's
    * semantics (Bpe.mergeFold: after a merge the new symbol is l+r
    * with r nonempty, so it can never re-match as a left element in
    * the same pass). Replaying the full rule table on an in-vocab
    * word therefore reproduces its trained segmentation; the encode
    * path uses this for the OOV tail only. */
  def bpeSegment(word: org.apache.spark.unsafe.types.UTF8String,
                 lefts: Array[String], rights: Array[String])
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = word.toString
    var syms = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var ci = 0
    while (ci < s.length) {
      val n = Character.charCount(s.codePointAt(ci))
      syms += s.substring(ci, ci + n)
      ci += n
    }
    var k = 0
    while (k < lefts.length) {
      if (syms.length > 1) {
        val l = lefts(k); val r = rights(k)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      syms.map(org.apache.spark.unsafe.types.UTF8String.fromString)
        .toArray[Any])
  }

  /** Luhn checksum over a digit string (ISO/IEC 7812) — the validator
    * that separates real card numbers from arbitrary digit runs in
    * PII scrubbing: from the RIGHT, double every second digit
    * (subtract 9 past 9), valid iff the sum ≡ 0 (mod 10). False on
    * empty or non-digit input (never throws — scrub paths feed it
    * regex candidates, not validated data). */
  def luhnValid(s: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val str = s.toString
    if (str.isEmpty) return false
    var sum = 0
    var i = str.length - 1
    var pos = 1
    while (i >= 0) {
      val c = str.charAt(i)
      if (c < '0' || c > '9') return false
      var d = c - '0'
      if (pos % 2 == 0) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      i -= 1
      pos += 1
    }
    sum % 10 == 0
  }

  /** Redact Luhn-VALID 13–19-digit runs in one pass: scan for maximal
    * digit runs, validate each with [[luhnValid]], splice `<CARD>`
    * over the valid ones — the conditional replacement a regex engine
    * cannot express (replace only when a checksum holds). Runs longer
    * than 19 digits are left alone (not a card; a regex {13,19} would
    * wrongly redact their prefix). */
  def redactCards(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    val out = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < str.length && str.charAt(j) >= '0' &&
          str.charAt(j) <= '9') j += 1
        val run = str.substring(i, j)
        if (run.length >= 13 && run.length <= 19 &&
            luhnValid(org.apache.spark.unsafe.types.UTF8String
              .fromString(run)))
          out.append("<CARD>")
        else out.append(run)
        i = j
      } else { out.append(c); i += 1 }
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(out.toString)
  }

  /** Portable polynomial feature bucket (the DSIR hashing primitive):
    * `acc = (acc·31 + codepoint) mod 2^20` folded left-to-right over
    * UNICODE CODE POINTS, then mod `buckets` — exactly the integer
    * chain a DuckDB oracle replays with
    * `list_reduce(... unicode(w[i]) ...)`. Code points (not UTF-16
    * units) on purpose: that is what `unicode()` yields, so the two
    * engines agree beyond the BMP too. One tight JVM loop instead of
    * the split("")/aggregate HOF chain — no per-char string array. */
  def polyBucket(s: org.apache.spark.unsafe.types.UTF8String,
                 buckets: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1048576L
      i += Character.charCount(cp)
    }
    acc % buckets
  }
}
