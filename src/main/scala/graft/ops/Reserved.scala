package graft.ops

import org.apache.spark.sql.DataFrame

/** The ONE reserved-working-column guard every operator shares:
  * `withColumn` silently replaces a same-named input column, so an op
  * that introduces working or output columns must fail fast when the
  * input already carries one of those names. Case-insensitive to match
  * Spark's default column resolver. */
object Reserved {
  def requireAbsent(df: DataFrame, op: String, names: Seq[String]): Unit = {
    val lower = names.map(_.toLowerCase)
    val clash = df.columns.filter(c => lower.contains(c.toLowerCase))
    require(clash.isEmpty,
      s"$op: input must not contain reserved column(s) ${clash.mkString(", ")} " +
        s"(reserved: ${names.mkString(", ")})")
  }
}
