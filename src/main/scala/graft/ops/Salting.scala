package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the skewed (fact) side with a
  * deterministic hash-derived salt, replicate the build side across all
  * salt values, join on (key, salt).
  *
  * At 100 TB a single hot key (one ticker, one user) turns a hash join
  * into one straggler task; salting fans the hot key's rows across
  * `salts` reducers. AQE's skew-join handles sort-merge cases
  * adaptively; explicit salting is the deterministic tool when the skew
  * is known and extreme (or the join is not AQE-eligible). The salt is
  * derived from a caller-supplied unique-ish column so results stay
  * reproducible run-to-run (no rand()).
  */
object Salting {
  def saltedJoin(fact: DataFrame, build: DataFrame, factKey: String,
                 buildKey: String, saltSource: Column, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val replicated = build
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
      salted(factKey) === replicated(buildKey) &&
        salted("_salt") === replicated("_salt"),
      joinType)
      .drop("_salt")
  }
}
