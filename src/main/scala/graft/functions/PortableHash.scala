package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod}

/** The ONE portable multiplicative-hash predicate (Knuth constant),
  * shared by every sampling / split / shard assignment and mirrored
  * verbatim as `(key * 2654435761) % m` in each oracle SQL — like
  * [[Rounding]], a single definition on purpose: a drifted copy would
  * surface only as a DuckDB parity failure. Engine-portable and
  * replay-stable, unlike `rand()` or engine-native hash functions.
  *
  * 64-bit wrap caveat: Spark multiplies in Long (wrapping) while
  * DuckDB promotes to HUGEINT (no wrap) — identical only while
  * `key * 2654435761` stays within Long range, i.e. keys below ~3.5e9.
  * Key spaces beyond that need the oracle side to CAST to BIGINT
  * before the multiply. */
object PortableHash {
  def hashMod(c: Column, m: Long): Column =
    pmod(c * lit(2654435761L), lit(m))
}
