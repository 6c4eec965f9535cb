package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftBridge.{column, expression}

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
      extends BinaryExpression {
    // inputs: two array<float> columns
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosine(a.asInstanceOf[ArrayData].toFloatArray(),
        b.asInstanceOf[ArrayData].toFloatArray())
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Kernels.cosine(" +
          s"$a.toFloatArray(), $b.toFloatArray());")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 64-bit SimHash over a token array: each token hashed with FNV-1a 64,
    * bit-vote per position, sign -> signature bit. Near-duplicate docs
    * yield signatures at small Hamming distance. Deterministic; no seed.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    // input: array<string> token column
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val h = SimHash64.fnv1a64(arr.getUTF8String(i))
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
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  object SimHash64 {
    def fnv1a64(s: UTF8String): Long = {
      val bytes = s.getBytes
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      h
    }
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * rolling FNV hash over character k-grams, minimum per sliding window of
    * w hashes, consecutive-duplicate-collapsed, returned sorted distinct.
    * Two documents sharing any fingerprint share a k-gram run — the
    * standard scalable copy-detection primitive.
    */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    // input: string column
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

  /** Random-hyperplane LSH bucket id for a float vector (Charikar, STOC'02):
    * `bits` pseudo-random Rademacher (+/-1) hyperplanes, weights derived
    * deterministically from (plane, dim) via FNV mixing — no stored
    * projection matrix, so executors need no broadcast side data. Vectors
    * with high cosine similarity collide with high probability; used as
    * the bucketed (scale) path for ANN search.
    */
  case class HyperplaneLsh(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    // input: array<float>
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData].toFloatArray()
      HyperplaneLsh.bucket(v, bits)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  object HyperplaneLsh {
    private def rademacher(plane: Int, dim: Int): Double = {
      var h = 0xcbf29ce484222325L
      h ^= plane; h *= 0x100000001b3L
      h ^= dim; h *= 0x100000001b3L
      if ((h & 1L) == 0L) 1.0 else -1.0
    }
    def bucket(v: Array[Float], bits: Int): Int = {
      var sig = 0; var j = 0
      while (j < bits) {
        var dot = 0.0; var i = 0
        while (i < v.length) { dot += v(i) * rademacher(j, i); i += 1 }
        if (dot >= 0) sig |= (1 << j)
        j += 1
      }
      sig
    }
  }

  // ------------------------------------------------------- Column wrappers

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def winnow_fingerprint(text: Column, k: Int, w: Int): Column =
    column(WinnowFingerprint(expression(text), k, w))
  def hyperplane_lsh(vec: Column, bits: Int): Column =
    column(HyperplaneLsh(expression(vec), bits))
}
