package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftBridge.{column, expression, oneOf, AbstractType}

/** Native Catalyst expressions for the hot paths the built-in function
  * library can't express efficiently: embedding cosine similarity (HOF
  * `aggregate`/`zip_with` boxes every float; this stays primitive),
  * SimHash signatures, and winnowing fingerprints.
  *
  * All are deterministic, null-intolerant scalar expressions — they sit
  * inside whole-stage codegen via `doGenCode` (cosine) or fall back to
  * interpreted eval where the op is not in a per-row hot loop.
  */
object Expressions {

  /** Cosine similarity of two float vectors, accumulated in double
    * left-to-right (index order) — the exact summation the DuckDB oracle
    * formula uses, so results are bit-comparable. Codegen emits a tight
    * primitive loop: no boxing, no virtual calls per element.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    // fail at ANALYSIS on any other element type: toFloatArray() would
    // memcpy-reinterpret e.g. array<double> into plausible float garbage
    override def inputTypes: Seq[AbstractType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosine(Kernels.floatsStrict(a.asInstanceOf[ArrayData]),
        Kernels.floatsStrict(b.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Kernels.cosine(" +
          s"graft.functions.Kernels.floatsStrict($a), " +
          s"graft.functions.Kernels.floatsStrict($b));")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** [[Kernels.dot]] as an expression: the cosine numerator alone, for
    * pair stages that carry precomputed [[VecNorm]] norms —
    * `DotProduct(a,b) / (na * nb)` reproduces [[CosineSim]] bit-for-bit
    * (guard the zero-norm case to 0.0 first, cosine's contract). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.dotAD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Kernels.dotAD($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** [[Kernels.norm]] as an expression — [[CosineSim]]'s denominator
    * factor for one vector, computed once per row instead of once per
    * pair. */
  case class VecNorm(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      Kernels.norm(Kernels.floatsStrict(input.asInstanceOf[ArrayData]))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.norm(" +
          s"graft.functions.Kernels.floatsStrict($a));")
  }

  /** 64-bit SimHash over a token array: each token hashed with FNV-1a 64,
    * bit-vote per position, sign -> signature bit. Near-duplicate docs
    * yield signatures at small Hamming distance. Deterministic; no seed.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      Kernels.simhashFromArrayData(input.asInstanceOf[ArrayData])
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.simhashFromArrayData($a);")
  }

  /** Portable polynomial feature bucket over code points
    * ([[Kernels.polyBucket]]) — the oracle-replayable DSIR hashing
    * primitive, codegen'd so the per-word cost is one tight loop. */
  case class PolyBucket(child: Expression, buckets: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      Kernels.polyBucket(input.asInstanceOf[UTF8String], buckets)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.polyBucket($a, ${buckets}L);")
  }

  /** Luhn checksum validity of a digit string ([[Kernels.luhnValid]])
    * — composes inside array HOF lambdas over regex candidates. */
  case class LuhnValid(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      Kernels.luhnValid(input.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.luhnValid($a);")
  }

  /** Redact Luhn-valid 13–19-digit runs ([[Kernels.redactCards]]) —
    * the checksum-conditional replacement plain regex cannot do. */
  case class RedactCards(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      Kernels.redactCards(input.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.redactCards($a);")
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * rolling FNV hash over character k-grams, minimum per sliding window of
    * w hashes, consecutive-duplicate-collapsed, returned sorted distinct.
    * Two documents sharing any fingerprint share a k-gram run — the
    * standard scalable copy-detection primitive.
    */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        Kernels.fingerprints(input.asInstanceOf[UTF8String].toString, k, w))
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.functions.Kernels.fingerprints($a.toString(), $k, $w));")
  }

  /** Winnowing anchors: [[WinnowFingerprint]] keeping the POSITIONS —
    * per window of w gram hashes, the smallest position holding the
    * window minimum, as (pos, h) structs in ascending-pos order. The
    * seed points for variable-length exact-substring extension
    * ([[graft.ops.DedupOps.exactSubstrSpans]]): two documents sharing
    * a verbatim run of >= k+w-1 chars are guaranteed to share an
    * anchor hash inside it (the winnowing guarantee, SIGMOD'03 §3). */
  case class WinnowAnchors(child: Expression, k: Int, w: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.winnowAnchorRows(input.asInstanceOf[UTF8String].toString, k, w)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.winnowAnchorRows(" +
          s"$a.toString(), $k, $w);")
  }

  /** Per-document anchor contexts with map-side duplicate collapse
    * (see [[Kernels.anchorContextRows]]): (h, pre, post, ps) rows, one
    * per DISTINCT bounded context, carrying every position it occurs
    * at. Lets the ExactSubstr operators ship each repeated context
    * once through the bucket shuffle with no dedup exchange. */
  case class AnchorContexts(child: Expression, k: Int, w: Int, maxExt: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("pre", StringType, nullable = false),
      StructField("post", StringType, nullable = false),
      StructField("ps", ArrayType(IntegerType, containsNull = false),
        nullable = false))), containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.anchorContextRows(
        input.asInstanceOf[UTF8String].toString, k, w, maxExt)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.anchorContextRows(" +
          s"$a.toString(), $k, $w, $maxExt);")
  }

  /** Longest common prefix length of two strings — the bounded span
    * extension step of exact-substring dedup. Codegen'd char loop; a
    * HOF formulation (filter over sequence of per-char substrings)
    * allocates a UTF8String per compared char and trips over Spark's
    * descending-sequence inference on empty inputs. */
  case class CommonPrefixLen(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType, StringType)
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.commonPrefixLen(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Kernels.commonPrefixLen($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Longest common suffix length (see [[CommonPrefixLen]]). */
  case class CommonSuffixLen(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType, StringType)
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.commonSuffixLen(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Kernels.commonSuffixLen($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** One-pass MinHash signature from a token array (see
    * [[Kernels.minhashFromTokenHashes]]). Stays in whole-stage codegen.
    */
  case class MinHashSig(child: Expression, shingleWidth: Int, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.minhashSigFromArrayData(
        input.asInstanceOf[ArrayData], shingleWidth, k)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.minhashSigFromArrayData(" +
          s"$a, $shingleWidth, $k);")
  }

  /** Band keys for MinHash LSH (child = signature array, evaluated once —
    * building the keys inside one expression sidesteps the optimizer
    * duplicating the signature computation per band reference). */
  case class BandKeys(child: Expression, bands: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.bandKeys(input.asInstanceOf[ArrayData], bands)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.bandKeys($a, $bands);")
  }

  /** Chunk keys for SimHash banding (same single-evaluation rationale). */
  case class ChunkKeys(child: Expression, chunks: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(LongType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.chunkKeys(input.asInstanceOf[Long], chunks)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.chunkKeys($a, $chunks);")
  }

  /** IVF cluster assignment: index of the max-cosine centroid for a
    * float vector, against a centroid matrix carried in the expression
    * (driver-trained, ~sqrt(corpus) rows — small enough to ship with the
    * plan). One kernel pass per row; building an array of per-centroid
    * cosines in the plan instead would be re-evaluated per reference
    * (argmax = array_position + array_max reads it twice). */
  case class ArgMaxCosine(child: Expression, cents: Array[Array[Float]])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      Kernels.argmaxCosine(
        Kernels.floatsStrict(input.asInstanceOf[ArrayData]), cents)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.argmaxCosine(" +
          s"graft.functions.Kernels.floatsStrict($a), $centsRef);")
    }
  }

  /** K-means assignment: struct(sim, cid) of the best centroid by
    * (rounded cosine DESC, id ASC) — see [[Kernels.bestCentroid]]. A
    * plan-level formulation of this arg-max (a CASE-WHEN fold over k
    * struct candidates with the centroid literals inlined) was measured
    * to blow the janino method-size limit at k=8, dims=64, dropping the
    * whole map stage out of codegen; one kernel call per row keeps the
    * stage compiled at any k. `ids` must be sorted ascending — that is
    * what makes first-max-wins equal ties-to-smallest-id. */
  case class BestCentroid(child: Expression, cents: Array[Array[Float]],
                          ids: Array[Long])
      extends UnaryExpression with ExpectsInputTypes {
    require(ids.length == cents.length,
      s"best_centroid: ${cents.length} centroids vs ${ids.length} ids")
    require(ids.isEmpty || ids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "best_centroid: ids must be strictly ascending (tie-break contract)")
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = StructType(Seq(
      StructField("sim", DoubleType, nullable = false),
      StructField("cid", LongType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      Kernels.bestCentroid(
        Kernels.floatsStrict(input.asInstanceOf[ArrayData]), cents, ids)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
      val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.bestCentroid(" +
          s"graft.functions.Kernels.floatsStrict($a), $centsRef, $idsRef);")
    }
  }

  /** Two-level routed k-means assignment: struct(sim, cid) of the best
    * fine centroid reached through the coarse-group arg-max — see
    * [[Kernels.bestCentroidRouted]]. Same determinism contract as
    * [[BestCentroid]] (rounded cosine DESC, id ASC at both levels, both
    * id arrays ascending so first-max-wins is the tie-break), at
    * g + |group| cosines per row instead of k. */
  case class BestCentroidRouted(child: Expression,
      coarse: Array[Array[Float]], coarseIds: Array[Long],
      fine: Array[Array[Float]], fineIds: Array[Long],
      fineGroup: Array[Long])
      extends UnaryExpression with ExpectsInputTypes {
    require(coarseIds.length == coarse.length && fineIds.length == fine.length
      && fineGroup.length == fine.length,
      s"best_centroid_routed: ${coarse.length}/${coarseIds.length} coarse, " +
        s"${fine.length}/${fineIds.length}/${fineGroup.length} fine")
    require(coarseIds.isEmpty ||
      coarseIds.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "best_centroid_routed: coarse ids must be strictly ascending")
    require(fineIds.isEmpty ||
      fineIds.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "best_centroid_routed: fine ids must be strictly ascending")
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = StructType(Seq(
      StructField("sim", DoubleType, nullable = false),
      StructField("cid", LongType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      Kernels.bestCentroidRouted(
        Kernels.floatsStrict(input.asInstanceOf[ArrayData]),
        coarse, coarseIds, fine, fineIds, fineGroup)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val coarseRef = ctx.addReferenceObj("coarse", coarse, "float[][]")
      val coarseIdsRef = ctx.addReferenceObj("coarseIds", coarseIds, "long[]")
      val fineRef = ctx.addReferenceObj("fine", fine, "float[][]")
      val fineIdsRef = ctx.addReferenceObj("fineIds", fineIds, "long[]")
      val fineGroupRef = ctx.addReferenceObj("fineGroup", fineGroup, "long[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.bestCentroidRouted(" +
          s"graft.functions.Kernels.floatsStrict($a), $coarseRef, " +
          s"$coarseIdsRef, $fineRef, $fineIdsRef, $fineGroupRef);")
    }
  }

  /** Permuted-block table keys for SimHash banding at radius >= 4 (see
    * [[Kernels.permTableKeys]]): C(m, keep) keys per signature, exact
    * recall for Hamming <= m - keep with a keep*64/m-bit keyspace. */
  case class PermTableKeys(child: Expression, m: Int, keep: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(LongType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.permTableKeys(input.asInstanceOf[Long], m, keep)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.permTableKeys($a, $m, $keep);")
  }

  /** Random-hyperplane LSH bucket id for a float vector (Charikar, STOC'02):
    * `bits` pseudo-random Rademacher (+/-1) hyperplanes, weights derived
    * deterministically from (plane, dim) via FNV mixing — no stored
    * projection matrix, so executors need no broadcast side data. Vectors
    * with high cosine similarity collide with high probability; used as
    * the bucketed (scale) path for ANN search.
    */
  case class HyperplaneLsh(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    require(bits >= 1 && bits <= 30,
      s"hyperplane_lsh: bits must be in [1, 30] (int bucket, no aliasing), got $bits")
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val v = Kernels.floatsStrict(input.asInstanceOf[ArrayData])
      HyperplaneLsh.bucket(v, bits)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  object HyperplaneLsh {
    /** Deterministic ±1 from (plane, dim). The FNV-style fold alone is
      * NOT enough here: multiplying by an odd constant preserves the
      * LOW bit, so testing `h & 1` after xor-multiply depends only on
      * the parity of plane and dim — every even plane becomes the SAME
      * hyperplane and every odd plane its negation, collapsing the
      * keyspace to ~3 buckets no matter how many bits were requested.
      * The splitmix64 finalizer mixes high bits into the low bit, so
      * the sign is independent across (plane, dim). */
    private def rademacher(plane: Int, dim: Int): Double = {
      var h = 0xcbf29ce484222325L
      h ^= plane; h *= 0x100000001b3L
      h ^= dim; h *= 0x100000001b3L
      h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27; h *= 0x94d049bb133111ebL
      h ^= h >>> 31
      if ((h & 1L) == 0L) 1.0 else -1.0
    }
    /** The plane matrix is deterministic per (bits, dims) — cache it
      * per executor (the minhashParams pattern) instead of re-running
      * the splitmix finalizer bits×dims times for EVERY row: at 24
      * bits × 768 dims that was ~18k hash finalizations per corpus
      * row on the ANN hot path, ~10× the cost of the dot products. */
    private val planeCache = new java.util.concurrent.ConcurrentHashMap[
      Long, Array[Array[Double]]]()
    private def planes(bits: Int, dims: Int): Array[Array[Double]] =
      planeCache.computeIfAbsent((bits.toLong << 32) | dims, _ =>
        Array.tabulate(bits, dims)(rademacher))

    /** The ±1 plane matrix, exposed so the DuckDB oracle can embed the
      * SAME signs as a literal table (the minhashParams pattern: the
      * oracle reads constants from the kernel, so the two can never
      * drift). Row j is plane j — the bit `bucket` sets via `1 << j`. */
    def signs(bits: Int, dims: Int): Array[Array[Int]] =
      planes(bits, dims).map(_.map(_.toInt))

    def bucket(v: Array[Float], bits: Int): Int = {
      val m = planes(bits, v.length)
      var sig = 0; var j = 0
      while (j < bits) {
        val row = m(j)
        var dot = 0.0; var i = 0
        while (i < v.length) { dot += v(i) * row(i); i += 1 }
        if (dot >= 0) sig |= (1 << j)
        j += 1
      }
      sig
    }
  }

  /** Membership probe against a driver-built Bloom filter carried in
    * the plan (same ship-with-the-plan shape as [[ArgMaxCosine]]): the
    * pre-shuffle pruning predicate of [[graft.ops.Prune]]. No false
    * negatives, so filtering before a join never drops real matches;
    * false positives are removed by the join itself. Codegen'd — one
    * virtual call per row against the referenced sketch. */
  case class BloomMightContain(child: Expression,
      bloom: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression with ExpectsInputTypes {
    // int/long only, enforced at analysis — the interpreted eval's match
    // and the codegen cast must agree on the accepted types
    override def inputTypes: Seq[AbstractType] =
      Seq(oneOf(IntegerType, LongType))
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any = input match {
      case i: Int => bloom.mightContainLong(i.toLong)
      case l: Long => bloom.mightContainLong(l)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bloom,
        "org.apache.spark.util.sketch.BloomFilter")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $ref.mightContainLong((long) $a);")
    }
  }

  /** Morton (z-order) interleave of two long columns — the multi-
    * dimensional clustering key for [[graft.ops.Layout]]: range-
    * partition + sort by this and BOTH dimensions get tight per-file
    * min/max stats. Codegen'd primitive bit-twiddling. */
  case class ZOrderKey(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    // int/long only, enforced at analysis (SQL literals are INT) — keeps
    // the interpreted match and the codegen (long) cast in agreement
    override def inputTypes: Seq[AbstractType] =
      Seq(oneOf(IntegerType, LongType), oneOf(IntegerType, LongType))
    override def dataType: DataType = LongType
    private def toL(x: Any): Long = x match {
      case i: Int => i.toLong
      case l: Long => l
    }
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.zorder(toL(a), toL(b))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Kernels.zorder((long) $a, (long) $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** [[Kernels.bpeSegment]] as an expression: Sennrich merge-rule
    * replay for one word — the encode-time OOV path. The rule table
    * rides as codegen reference objects (the [[BestCentroid]]
    * pattern), bounded by the merge count; per row the cost is
    * O(rules × word length). */
  case class BpeSegmentWord(child: Expression,
                            lefts: Array[String], rights: Array[String])
      extends UnaryExpression with ExpectsInputTypes {
    require(lefts.length == rights.length,
      s"bpe_segment: ${lefts.length} lefts vs ${rights.length} rights")
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.bpeSegment(input.asInstanceOf[UTF8String], lefts, rights)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lRef = ctx.addReferenceObj("lefts", lefts, "java.lang.String[]")
      val rRef = ctx.addReferenceObj("rights", rights, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.Kernels.bpeSegment($a, $lRef, $rRef);")
    }
  }

  // ------------------------------------------------------- Column wrappers

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def vec_norm(a: Column): Column = column(VecNorm(expression(a)))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def winnow_anchors(text: Column, k: Int, w: Int): Column =
    column(WinnowAnchors(expression(text), k, w))
  def anchor_contexts(text: Column, k: Int, w: Int, maxExt: Int): Column =
    column(AnchorContexts(expression(text), k, w, maxExt))
  def common_prefix_len(a: Column, b: Column): Column =
    column(CommonPrefixLen(expression(a), expression(b)))
  def common_suffix_len(a: Column, b: Column): Column =
    column(CommonSuffixLen(expression(a), expression(b)))
  def winnow_fingerprint(text: Column, k: Int, w: Int): Column =
    column(WinnowFingerprint(expression(text), k, w))
  def poly_bucket(text: Column, buckets: Long): Column =
    column(PolyBucket(expression(text), buckets))
  def luhn_valid(digits: Column): Column =
    column(LuhnValid(expression(digits)))
  def redact_cards(text: Column): Column =
    column(RedactCards(expression(text)))
  def hyperplane_lsh(vec: Column, bits: Int): Column =
    column(HyperplaneLsh(expression(vec), bits))
  def minhash_sig(tokens: Column, shingleWidth: Int, k: Int): Column =
    column(MinHashSig(expression(tokens), shingleWidth, k))
  def band_keys(sig: Column, bands: Int): Column =
    column(BandKeys(expression(sig), bands))
  def chunk_keys(sig: Column, chunks: Int): Column =
    column(ChunkKeys(expression(sig), chunks))
  def perm_table_keys(sig: Column, m: Int, keep: Int): Column =
    column(PermTableKeys(expression(sig), m, keep))
  def argmax_cosine(vec: Column, cents: Array[Array[Float]]): Column =
    column(ArgMaxCosine(expression(vec), cents))
  def best_centroid(vec: Column, cents: Seq[(Long, Array[Float])]): Column =
    column(BestCentroid(expression(vec),
      cents.map(_._2).toArray, cents.map(_._1).toArray))
  /** `fine` rows are (cid, gid, vec), cid-ascending. */
  def best_centroid_routed(vec: Column, coarse: Seq[(Long, Array[Float])],
      fine: Seq[(Long, Long, Array[Float])]): Column =
    column(BestCentroidRouted(expression(vec),
      coarse.map(_._2).toArray, coarse.map(_._1).toArray,
      fine.map(_._3).toArray, fine.map(_._1).toArray, fine.map(_._2).toArray))
  /** `rules` in merge-rank order. */
  def bpe_segment(word: Column, rules: Seq[(String, String)]): Column =
    column(BpeSegmentWord(expression(word),
      rules.map(_._1).toArray, rules.map(_._2).toArray))
  def z_order(a: Column, b: Column): Column =
    column(ZOrderKey(expression(a.cast("long")), expression(b.cast("long"))))
  def bloom_might_contain(key: Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    column(BloomMightContain(expression(key), bloom))
}
