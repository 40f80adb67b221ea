package graft.functions

/** String-similarity kernels invoked from generated code.
  *
  * These are the scalar kernels behind the Catalyst expressions in
  * [[graft.functions.sims]]. They are plain static methods (Scala
  * object ⇒ static forwarders) so whole-stage codegen can call them
  * directly without boxing or closure dispatch.
  *
  * Semantics follow the classical definitions (and DuckDB's built-ins,
  * which the correctness oracle uses): reference behavior is
  * PyDI/utils/similarity_registry.py:27-72 and
  * PyDI/entitymatching/comparators.py:16-243.
  */
object SimImpl {

  /** Jaro similarity in [0,1]. Empty∧empty → 1, empty∨empty → 0. */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var mismatches = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    // Transpositions = mismatched match positions / 2, TRUNCATED —
    // matches DuckDB's jaro (the correctness oracle); implementations
    // that keep the 0.5 fraction differ on odd mismatch counts.
    val t = mismatches / 2
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t) / m) / 3.0
  }

  /** Jaro–Winkler with p=0.1, prefix ≤ 4, boost threshold 0.7. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var prefix = 0
    val maxP = math.min(4, math.min(s1.length, s2.length))
    while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1 - j)
  }

  /** Damerau–Levenshtein distance (unrestricted, with adjacent
    * transpositions), as a double for uniform expression typing. */
  /** Plain Levenshtein distance — two-row int DP over UTF-16 chars.
    * Values match any codepoint-level implementation on BMP text (the
    * engine's string domain); kept here because the char-array DP is
    * ~5× faster than byte-walking a UTF-8 encoding per cell, and this
    * comparator sits in the 10⁶-pairs-per-query hot path.
    */
  def levenshtein(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0) return l2.toDouble
    if (l2 == 0) return l1.toDouble
    var prev = new Array[Int](l2 + 1)
    var cur = new Array[Int](l2 + 1)
    var j = 0
    while (j <= l2) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= l1) {
      cur(0) = i
      val c1 = s1.charAt(i - 1)
      j = 1
      while (j <= l2) {
        val cost = if (c1 == s2.charAt(j - 1)) 0 else 1
        var m = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < m) m = del
        val ins = cur(j - 1) + 1
        if (ins < m) m = ins
        cur(j) = m
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(l2).toDouble
  }

  def damerauLevenshtein(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0) return l2.toDouble
    if (l2 == 0) return l1.toDouble
    val inf = l1 + l2
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](l1 + 2, l2 + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= l1) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val i1 = Option(da.get(s2.charAt(j - 1))).map(_.intValue).getOrElse(0)
        val j1 = db
        var cost = 1
        if (s1.charAt(i - 1) == s2.charAt(j - 1)) { cost = 0; db = j }
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, math.min(d(i + 1)(j) + 1, d(i)(j + 1) + 1)),
          d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1))
        j += 1
      }
      da.put(s1.charAt(i - 1), i)
      i += 1
    }
    d(l1 + 1)(l2 + 1).toDouble
  }

  /** Hamming distance; unequal lengths count the excess as mismatches. */
  def hamming(s1: String, s2: String): Double = {
    val n = math.min(s1.length, s2.length)
    var d = math.abs(s1.length - s2.length)
    var i = 0
    while (i < n) { if (s1.charAt(i) != s2.charAt(i)) d += 1; i += 1 }
    d.toDouble
  }

  /** Jaccard over distinct characters (DuckDB `jaccard` semantics). */
  def charJaccard(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    val a = new java.util.HashSet[Character]()
    val b = new java.util.HashSet[Character]()
    var i = 0
    while (i < s1.length) { a.add(s1.charAt(i)); i += 1 }
    i = 0
    while (i < s2.length) { b.add(s2.charAt(i)); i += 1 }
    val union = new java.util.HashSet[Character](a)
    union.addAll(b)
    a.retainAll(b)
    if (union.isEmpty) 0.0 else a.size.toDouble / union.size.toDouble
  }

  /** Length of the longest common substring. */
  def lcsStr(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val prev = new Array[Int](l2 + 1)
    val cur = new Array[Int](l2 + 1)
    var best = 0
    var i = 1
    while (i <= l1) {
      var j = 1
      while (j <= l2) {
        if (s1.charAt(i - 1) == s2.charAt(j - 1)) {
          cur(j) = prev(j - 1) + 1
          if (cur(j) > best) best = cur(j)
        } else cur(j) = 0
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, l2 + 1)
      i += 1
    }
    best.toDouble
  }

  /** Needleman–Wunsch global alignment similarity (match 1, mismatch −1,
    * gap −1), min-max normalized to [0,1]: (score + maxLen) / (2·maxLen).
    * Reference: PyDI/utils/similarity_registry.py (textdistance NW).
    */
  def needlemanWunsch(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    val mx = math.max(l1, l2)
    if (mx == 0) return 1.0
    var prev = Array.tabulate(l2 + 1)(-_)
    val cur = new Array[Int](l2 + 1)
    var i = 1
    while (i <= l1) {
      cur(0) = -i
      var j = 1
      while (j <= l2) {
        val m = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 1 else -1
        cur(j) = math.max(prev(j - 1) + m, math.max(prev(j) - 1, cur(j - 1) - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, l2 + 1)
      i += 1
    }
    (prev(l2).toDouble + mx) / (2.0 * mx)
  }

  /** Smith–Waterman local alignment similarity (match 1, mismatch −1,
    * gap −1), normalized by min length.
    */
  def smithWaterman(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val prev = new Array[Int](l2 + 1)
    val cur = new Array[Int](l2 + 1)
    var best = 0
    var i = 1
    while (i <= l1) {
      var j = 1
      while (j <= l2) {
        val m = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 1 else -1
        cur(j) = math.max(0, math.max(prev(j - 1) + m, math.max(prev(j) - 1, cur(j - 1) - 1)))
        if (cur(j) > best) best = cur(j)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, l2 + 1)
      i += 1
    }
    best.toDouble / math.min(l1, l2)
  }

  /** Ratcliff–Obershelp similarity (difflib ratio): 2·M / (|s1|+|s2|)
    * where M recursively counts longest-common-substring matches.
    */
  def ratcliffObershelp(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    def matches(a: String, b: String): Int = {
      if (a.isEmpty || b.isEmpty) return 0
      // longest common substring + its positions
      var best = 0; var ba = 0; var bb = 0
      val prev = new Array[Int](b.length + 1)
      val cur = new Array[Int](b.length + 1)
      var i = 1
      while (i <= a.length) {
        var j = 1
        while (j <= b.length) {
          if (a.charAt(i - 1) == b.charAt(j - 1)) {
            cur(j) = prev(j - 1) + 1
            if (cur(j) > best) { best = cur(j); ba = i - best; bb = j - best }
          } else cur(j) = 0
          j += 1
        }
        System.arraycopy(cur, 0, prev, 0, b.length + 1)
        i += 1
      }
      if (best == 0) 0
      else best +
        matches(a.substring(0, ba), b.substring(0, bb)) +
        matches(a.substring(ba + best), b.substring(bb + best))
    }
    2.0 * matches(s1, s2) / (s1.length + s2.length)
  }

  /** Longest common subsequence LENGTH (lcsseq). */
  def lcsSeq(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val prev = new Array[Int](l2 + 1)
    val cur = new Array[Int](l2 + 1)
    var i = 1
    while (i <= l1) {
      var j = 1
      while (j <= l2) {
        cur(j) =
          if (s1.charAt(i - 1) == s2.charAt(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, l2 + 1)
      i += 1
    }
    prev(l2).toDouble
  }

  /** Length of the common prefix. */
  def commonPrefixLen(s1: String, s2: String): Double = {
    val n = math.min(s1.length, s2.length)
    var i = 0
    while (i < n && s1.charAt(i) == s2.charAt(i)) i += 1
    i.toDouble
  }

  /** Length of the common suffix. */
  def commonSuffixLen(s1: String, s2: String): Double = {
    val n = math.min(s1.length, s2.length)
    var i = 0
    while (i < n && s1.charAt(s1.length - 1 - i) == s2.charAt(s2.length - 1 - i)) i += 1
    i.toDouble
  }
}
