package graft.functions

/**
 * Jaro-Winkler string similarity (public algorithm; the reference uses the
 * rapidfuzz implementation at `crates/tss-submit/src/map/score.rs:168`).
 * Driver-side only — used by the schema-matching scorer, never in the data
 * plane.
 */
object JaroWinkler {

  def jaro(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val matchWindow = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - matchWindow)
      val hi = math.min(len2 - 1, i + matchWindow)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true; matched2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions halve by INTEGER division (floor): the textbook "half
    // the out-of-order matches" as DuckDB, rapidfuzz and classic Winkler
    // implement it. Keeping the fraction (x/2.0) scores odd counts lower
    // by 1/(6m) and broke oracle parity the first time a q-gram candidate
    // pair had 3 out-of-order matches (f5; SNM pairs never hit an odd
    // count because adjacent sorted names differ by substitution only).
    (m / len1 + m / len2 + (m - transpositions / 2) / m) / 3.0
  }

  /** Standard Winkler modification: prefix bonus up to 4 chars, p=0.1. */
  def similarity(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var prefix = 0
    val max = math.min(4, math.min(s1.length, s2.length))
    while (prefix < max && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }
}
