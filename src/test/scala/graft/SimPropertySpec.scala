package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.functions.SimImpl

/** Property tests over random strings: every similarity kernel must
  * stay in range, agree with itself on identical inputs, and the
  * symmetric ones must not depend on argument order.
  */
class SimPropertySpec extends AnyFunSuite {

  private val rnd = new Random(1234)
  private def randStr(maxLen: Int): String = {
    val n = rnd.nextInt(maxLen + 1)
    (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString // small alphabet → collisions
  }
  private val cases: Seq[(String, String)] =
    Seq.fill(300)((randStr(12), randStr(12))) ++
      Seq(("", ""), ("", "abc"), ("abc", ""), ("a", "a"))

  test("similarities stay in [0,1]") {
    for ((a, b) <- cases) {
      for ((name, f) <- Seq[(String, (String, String) => Double)](
        "jaro" -> SimImpl.jaro,
        "jaroWinkler" -> SimImpl.jaroWinkler,
        "charJaccard" -> SimImpl.charJaccard,
        "needlemanWunsch" -> SimImpl.needlemanWunsch,
        "ratcliffObershelp" -> SimImpl.ratcliffObershelp)) {
        val v = f(a, b)
        assert(v >= 0.0 && v <= 1.0, s"$name('$a','$b') = $v out of range")
      }
      if (a.nonEmpty || b.nonEmpty) {
        val sw = SimImpl.smithWaterman(a, b)
        assert(sw >= 0.0 && sw <= 1.0, s"sw('$a','$b') = $sw")
      }
    }
  }

  test("identity: sim(x,x) is maximal, distance(x,x) is zero") {
    for ((a, _) <- cases) {
      assert(SimImpl.jaro(a, a) == 1.0)
      assert(SimImpl.damerauLevenshtein(a, a) == 0.0)
      assert(SimImpl.hamming(a, a) == 0.0)
      assert(SimImpl.charJaccard(a, a) == 1.0)
      assert(SimImpl.needlemanWunsch(a, a) == 1.0)
      assert(SimImpl.ratcliffObershelp(a, a) == 1.0)
      assert(SimImpl.lcsSeq(a, a) == a.length.toDouble)
      assert(SimImpl.lcsStr(a, a) == (if (a.isEmpty) 0.0 else a.length.toDouble))
    }
  }

  test("symmetry for the symmetric kernels") {
    for ((a, b) <- cases) {
      assert(SimImpl.jaro(a, b) == SimImpl.jaro(b, a), s"jaro '$a' '$b'")
      assert(SimImpl.damerauLevenshtein(a, b) == SimImpl.damerauLevenshtein(b, a))
      assert(SimImpl.hamming(a, b) == SimImpl.hamming(b, a))
      assert(SimImpl.charJaccard(a, b) == SimImpl.charJaccard(b, a))
      assert(SimImpl.lcsStr(a, b) == SimImpl.lcsStr(b, a))
      assert(SimImpl.lcsSeq(a, b) == SimImpl.lcsSeq(b, a))
      assert(SimImpl.commonPrefixLen(a, b) == SimImpl.commonPrefixLen(b, a))
      assert(SimImpl.commonSuffixLen(a, b) == SimImpl.commonSuffixLen(b, a))
      assert(SimImpl.needlemanWunsch(a, b) == SimImpl.needlemanWunsch(b, a))
    }
  }

  test("alignment kernels: hand-computed textbook values") {
    // NW(match 1, mismatch −1, gap −1), normalized (score+max)/(2·max):
    // "gattaca" vs "gcatgcu" has optimal global score 0 → (0+7)/14 = 0.5
    assert(math.abs(SimImpl.needlemanWunsch("gattaca", "gcatgcu") - 0.5) < 1e-9)
    // disjoint alphabets: score = −maxLen → 0.0
    assert(SimImpl.needlemanWunsch("aaa", "bbb") == 0.0)
    // SW local alignment: best local match "bc" (score 2) / min len 3
    assert(math.abs(SimImpl.smithWaterman("abc", "xbcy") - 2.0 / 3.0) < 1e-9)
    assert(SimImpl.smithWaterman("abc", "xyz") == 0.0)
    // Ratcliff–Obershelp vs Python difflib.SequenceMatcher.ratio():
    // "mathematics"/"informatics" → 12/22; "abcde"/"abXde" → 0.8
    assert(math.abs(SimImpl.ratcliffObershelp("mathematics", "informatics") - 12.0 / 22.0) < 1e-9)
    assert(math.abs(SimImpl.ratcliffObershelp("abcde", "abXde") - 0.8) < 1e-9)
    // lcsseq("ABCBDAB","BDCABA") = 4 ("BCAB")
    assert(SimImpl.lcsSeq("ABCBDAB", "BDCABA") == 4.0)
  }

  test("triangle-ish sanity: DL distance bounded by max length") {
    for ((a, b) <- cases) {
      val d = SimImpl.damerauLevenshtein(a, b)
      assert(d <= math.max(a.length, b.length).toDouble)
      assert(d >= math.abs(a.length - b.length).toDouble)
    }
  }
}
