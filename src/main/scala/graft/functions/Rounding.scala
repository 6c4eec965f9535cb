package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-exact HALF_UP rounding shared between the Spark queries and the
  * DuckDB oracle SQL.
  *
  * Why not builtin `round`: Spark rounds via BigDecimal on the exact
  * binary value, DuckDB via C-library double math — on values that land
  * within an ulp of a .5 boundary the two can disagree, which breaks the
  * driver's hash compare. Instead both sides evaluate the *same* IEEE
  * double expression
  *   (CASE WHEN x < 0 THEN -floor((-x)*f + 0.5) ELSE floor(x*f + 0.5) END) / f + 0.0
  * so results are bit-identical by construction. The trailing `+ 0.0`
  * canonicalizes -0.0 to +0.0 on both engines.
  *
  * Matches the reference's ROUND(x::numeric, n) semantics (HALF_UP,
  * reference: etl_project/assets/sql/transform/stock_bars_analysis.sql:21).
  */
object Rounding {
  def roundHalfUp(c: Column, n: Int): Column = {
    require(n >= 0, s"roundHalfUp: n must be >= 0, got $n")
    val f = lit(math.pow(10, n))
    val scaled = when(c < 0, -floor((-c) * f + lit(0.5)))
      .otherwise(floor(c * f + lit(0.5)))
    scaled / f + lit(0.0)
  }

  /** The same expression as SQL text, for `SparkEntry.oracleSql` and
    * the Spark-dialect S4/S5 SQL paths. `castDouble` wraps the CASE in
    * a DOUBLE cast — needed on the Spark side where `floor` returns
    * BIGINT (DuckDB's floor stays DOUBLE). ONE definition on purpose:
    * this expression is the bit-parity linchpin, and a drifted copy
    * would split the SQL path from the DataFrame path silently. */
  def sqlRound(expr: String, n: Int, castDouble: Boolean = false): String = {
    // n < 0 would truncate the factor to 0 (division by zero) here while
    // roundHalfUp's double factor kept working — exactly the silent
    // drift between the two definitions the doc above forbids
    require(n >= 0, s"sqlRound: n must be >= 0, got $n")
    val f = s"${math.pow(10, n).toLong}.0"
    val cased = s"CASE WHEN ($expr) < 0 THEN -floor((-($expr))*$f + 0.5) " +
      s"ELSE floor(($expr)*$f + 0.5) END"
    val num = if (castDouble) s"CAST($cased AS DOUBLE)" else s"($cased)"
    s"(($num) / $f + 0.0)"
  }

  /** Scalar twin of [[roundHalfUp]]: the SAME IEEE double expression
    * evaluated in JVM arithmetic, for native kernels that fold the
    * rounding inside a compiled loop (e.g. Kernels.bestCentroid). The
    * Column version's floor lands in a BIGINT before the division; here
    * it stays a double — identical values for |scaled| < 2^53, which
    * |cosine| * 10^n at any sane n satisfies by orders of magnitude.
    * ONE definition pair on purpose — see the class doc: this rounding
    * is the bit-parity linchpin. */
  def roundHalfUpDouble(x: Double, n: Int): Double = {
    val f = math.pow(10, n)
    val s = if (x < 0) -math.floor((-x) * f + 0.5) else math.floor(x * f + 0.5)
    s / f + 0.0
  }
}
