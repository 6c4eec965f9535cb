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

  /** Cosine similarity, double accumulation in index order. */
  def cosine(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Winnowing fingerprints: rolling FNV over char k-grams, min per
    * window of w, distinct sorted. */
  def fingerprints(s: String, k: Int, w: Int): Array[Long] = {
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
}
