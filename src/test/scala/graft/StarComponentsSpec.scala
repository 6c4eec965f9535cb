package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Large-star/small-star connected components: same labeling contract
  * as min-label propagation, but round count independent of component
  * diameter — the chain-shaped pair graphs propagation cannot finish. */
class StarComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("star components equal propagation components on a random graph") {
    val rnd = new scala.util.Random(7)
    // ~200 nodes, ~180 random edges: a mix of small components, a few
    // larger blobs, and isolated self-pairs
    val pairs = ((0 until 180).map { _ =>
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)
    } ++ Seq((500L, 500L))).toDF("id_a", "id_b")
    val star = labelsOf(DedupOps.connectedComponentsStar(pairs))
    val prop = labelsOf(DedupOps.connectedComponents(pairs))
    assert(star == prop, s"star=$star\nprop=$prop")
  }

  test("a 400-link chain defeats propagation's round budget; star converges") {
    val chain = (0L until 400L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // propagation needs one round per diameter unit — the default
    // budget refuses (partial labels would be silent under-dedup)
    intercept[IllegalArgumentException] {
      DedupOps.connectedComponents(chain)
    }
    val star = labelsOf(DedupOps.connectedComponentsStar(chain))
    assert(star.size == 401 && star.values.forall(_ == 0L),
      s"chain not fully contracted: ${star.filter(_._2 != 0L)}")
  }

  test("connectedComponentsAuto: propagation when it converges, star fallback past the budget") {
    // clique-shaped input: converges inside the budget, labels match
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L), (9L, 8L))
      .toDF("id_a", "id_b")
    assert(labelsOf(DedupOps.connectedComponentsAuto(clique)) ==
      labelsOf(DedupOps.connectedComponents(clique)))
    // chain past the budget: plain propagation refuses, auto falls back
    // to star and returns the full contraction
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      DedupOps.connectedComponents(chain, maxIter = 25)
    }
    val auto = labelsOf(DedupOps.connectedComponentsAuto(chain, maxIter = 25))
    assert(auto.size == 61 && auto.values.forall(_ == 0L),
      s"auto fallback did not contract the chain: ${auto.filter(_._2 != 0L)}")
  }

  test("self-loops assert no connectivity; isolated nodes label themselves") {
    val pairs = Seq((5L, 5L), (9L, 9L), (1L, 2L)).toDF("id_a", "id_b")
    val star = labelsOf(DedupOps.connectedComponentsStar(pairs))
    assert(star == Map(5L -> 5L, 9L -> 9L, 1L -> 1L, 2L -> 1L))
  }

  test("clique + bridge + chain mix contracts to the global minima") {
    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val chain = (20L until 40L).map(i => (i, i + 1))
    val bridge = Seq((14L, 20L))
    val pairs = (clique ++ chain ++ bridge).toDF("id_a", "id_b")
    val star = labelsOf(DedupOps.connectedComponentsStar(pairs))
    assert(star.values.toSet == Set(10L), s"mixed graph split: $star")
  }
}
