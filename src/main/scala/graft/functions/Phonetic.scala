package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** American Soundex as an explicit cross-engine circuit (reference
  * semantics incl. the H/W-transparency rule: 'Ashcraft' → A261,
  * 'Pfister' → P236, 'Honeyman' → H555 — all spec-pinned).
  *
  * Deliberately NOT Spark's builtin `soundex`: the oracle must replay
  * the identical algorithm, and builtin implementations differ on the
  * H/W and leading-run edge cases. The circuit uses only `translate`,
  * `regexp_replace` (no backreferences — DuckDB's RE2 lacks them; runs
  * collapse via one replace per digit), `substr`, and `rpad`, all of
  * which behave identically in both engines. Codegen'd, zero shuffle —
  * a phonetic key is scan-stage work at any scale.
  */
object Phonetic {

  private val Letters = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
  private val Digits = "11112222222233455600000000"

  /** Soundex code (e.g. 'R163') of a name column; '' for no-letter input. */
  def soundex(c: Column): Column = {
    val u = upper(regexp_replace(c, "[^A-Za-z]", ""))
    val first = substring(u, 1, 1)
    val firstDigit = translate(first, Letters, Digits)
    // H/W are transparent AFTER the first letter: same-code letters
    // separated only by H/W collapse into one run.
    val restNoHw = translate(substring(u, 2, Int.MaxValue), "HW", "")
    val coded = concat(firstDigit, translate(restNoHw, Letters, Digits))
    val collapsed = (0 to 6).foldLeft(coded)((e, i) =>
      regexp_replace(e, s"$i+", i.toString))
    val body = regexp_replace(substring(collapsed, 2, Int.MaxValue), "0", "")
    when(length(u) === 0, lit(""))
      .otherwise(concat(first, rpad(substring(body, 1, 3), 3, "0")))
  }

  /** The identical circuit as DuckDB SQL over a column expression. */
  def sqlSoundex(col: String): String = {
    val u = s"upper(regexp_replace($col, '[^A-Za-z]', '', 'g'))"
    val first = s"substr($u,1,1)"
    val firstDigit = s"translate($first, '$Letters', '$Digits')"
    val noHw = s"translate(substr($u,2), 'HW', '')"
    val coded = s"($firstDigit || translate($noHw, '$Letters', '$Digits'))"
    val collapsed = (0 to 6).foldLeft(coded)((e, i) =>
      s"regexp_replace($e, '$i+', '$i', 'g')")
    val body = s"regexp_replace(substr($collapsed,2), '0', '', 'g')"
    s"CASE WHEN length($u)=0 THEN '' ELSE $first || rpad(substr($body,1,3),3,'0') END"
  }
}
