package graft.operators

/** Dynamic Time Warping kernel — pure Scala, primitive arrays, no
  * dependencies. Runs in-JVM inside `mapGroups` (no Arrow / Python worker
  * boundary, unlike the reference's pandas UDF).
  *
  * Behavior matches /root/reference/mapping_engine.py:109-216 exactly:
  *   - z-score normalization with population stddev; std==0 (or NaN) series
  *     degrade to mean-centering (mapping_engine.py:109-115);
  *   - O(n·m) DP with optional Sakoe-Chiba band of half-width `window`
  *     (mapping_engine.py:186-189) → O(n·w) work per pair;
  *   - absolute-difference local cost;
  *   - backtrack tie-break order: up (i-1,j), then left (i,j-1), then
  *     diagonal (i-1,j-1) — Python `min` keeps the first minimum
  *     (mapping_engine.py:203-211).
  */
object Dtw {

  /** Z-score with population stddev; constant series → mean-centered. */
  def normalize(arr: Array[Double]): Array[Double] = {
    val n = arr.length
    if (n == 0) return arr
    var sum = 0.0
    var i = 0
    while (i < n) { sum += arr(i); i += 1 }
    val mean = sum / n
    var ss = 0.0
    i = 0
    while (i < n) { val d = arr(i) - mean; ss += d * d; i += 1 }
    val std = math.sqrt(ss / n)
    val out = new Array[Double](n)
    if (std == 0.0 || std.isNaN) {
      i = 0; while (i < n) { out(i) = arr(i) - mean; i += 1 }
    } else {
      i = 0; while (i < n) { out(i) = (arr(i) - mean) / std; i += 1 }
    }
    out
  }

  /** DTW distance + optimal warping path.
    *
    * @param window Sakoe-Chiba band half-width (None = unconstrained)
    * @return (total cost, path as (idx1, idx2) pairs, increasing)
    */
  def distance(
      s1: Array[Double],
      s2: Array[Double],
      window: Option[Int] = None,
      normalizeInput: Boolean = true): (Double, Array[(Int, Int)]) = {
    val a = if (normalizeInput) normalize(s1) else s1
    val b = if (normalizeInput) normalize(s2) else s2
    val n = a.length
    val m = b.length
    require(n > 0 && m > 0, "DTW requires non-empty series")

    // (n+1) x (m+1) DP matrix, flattened row-major.
    val inf = Double.PositiveInfinity
    val dp = Array.fill((n + 1) * (m + 1))(inf)
    @inline def idx(i: Int, j: Int): Int = i * (m + 1) + j
    dp(idx(0, 0)) = 0.0

    var i = 1
    while (i <= n) {
      val (jStart, jEnd) = window match {
        case Some(w) => (math.max(1, i - w), math.min(m, i + w))
        case None    => (1, m)
      }
      var j = jStart
      while (j <= jEnd) {
        val cost = math.abs(a(i - 1) - b(j - 1))
        val up = dp(idx(i - 1, j))
        val left = dp(idx(i, j - 1))
        val diag = dp(idx(i - 1, j - 1))
        var best = up
        if (left < best) best = left
        if (diag < best) best = diag
        dp(idx(i, j)) = cost + best
        j += 1
      }
      i += 1
    }

    // Backtrack: first-minimum preference up > left > diag (Python min order).
    val path = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var ci = n
    var cj = m
    while (ci > 0 && cj > 0) {
      path += ((ci - 1, cj - 1))
      val up = dp(idx(ci - 1, cj))
      val left = dp(idx(ci, cj - 1))
      val diag = dp(idx(ci - 1, cj - 1))
      if (up <= left && up <= diag) ci -= 1
      else if (left <= diag) cj -= 1
      else { ci -= 1; cj -= 1 }
    }
    (dp(idx(n, m)), path.reverse.toArray)
  }
}
