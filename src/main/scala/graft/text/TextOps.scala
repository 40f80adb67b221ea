package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data pipelines (SURVEY §2.12
  * #60–63): stopword-profile language ID, quality scoring, token
  * counting, and winnowing document fingerprints. Pure `functions._`
  * pipelines — codegen'd, no UDFs, scan-shaped (no shuffle).
  */
object TextOps {

  /** Stopword profiles for the heuristic language identifier (lang asc —
    * the when-chain order doubles as the deterministic tie-break).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
    "es" -> Seq("el", "la", "y", "los", "es", "un", "una", "que"),
    "fr" -> Seq("le", "la", "et", "les", "est", "un", "une", "des"))

  private def hits(toks: Column, profile: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(profile.toArray), t)))

  /** Language ID (#60): per-language stopword occurrence count over
    * lowercase word tokens; argmax, ties → language code asc; 'unknown'
    * when nothing hits. Output: (id, lang_pred, lang_score).
    */
  def langId(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = split(lower(col(text)), " ")
    val n = greatest(size(toks), lit(1))
    val hitCols = LangProfiles.map { case (lang, prof) => lang -> hits(toks, prof) }
    val maxHits = greatest(hitCols.map(_._2): _*)
    val pred = hitCols.foldLeft(when(maxHits <= 0, "unknown")) {
      case (acc, (lang, h)) => acc.when(h === maxHits, lang)
    }.otherwise("unknown")
    docs.select(col(id), pred.as("lang_pred"),
      round(maxHits.cast("double") / n, 5).as("lang_score"))
  }

  /** Quality score (#61): word count, mean word length, punctuation
    * ratio, English-stopword ratio → weighted composite. All ratios are
    * exact integer fixed-point (milli-units / basis points): the raw
    * rationals here (k/nw, k/nc) land on decimal midpoints constantly,
    * where cross-engine `round(x, 5)` is not reproducible — integer
    * division is.
    */
  def quality(docs: DataFrame, id: String, text: String): DataFrame = {
    val t = lower(col(text))
    val toks = split(t, " ")
    docs.select(col(id),
        size(toks).cast("long").as("nw"),
        length(t).cast("long").as("nc"),
        length(regexp_replace(t, "[a-z0-9 ]", "")).cast("long").as("np"),
        hits(toks, LangProfiles.toMap.apply("en")).cast("long").as("nstop"))
      .select(col(id),
        col("nw").as("n_words"),
        col("nc").as("n_chars"),
        expr("(nc - nw + 1) * 1000 div nw").as("mean_word_len_milli"),
        expr("np * 1000 div nc").as("punct_milli"),
        expr("nstop * 1000 div nw").as("stopword_milli"),
        // 0–1000: 40% length (capped at 50 words), 30% non-punct, 30% stopwords
        expr("least(nw, 50) * 8 + (nc - np) * 300 div nc + nstop * 300 div nw")
          .as("quality_bp"))
  }

  /** Token counting (#62): whitespace tokens and BPE-ish regex tokens
    * (letter runs, digit runs, single symbols).
    */
  def tokenCounts(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id),
      size(split(col(text), " ")).cast("long").as("ws_tokens"),
      regexp_count(lower(col(text)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")
        .as("regex_tokens"),
      length(col(text)).cast("long").as("n_chars"))

  /** Winnowing fingerprints (#63, Schleimer et al.): char 5-gram rolling
    * hashes (md5-prefix), per-window (w=4) minima, distinct + sorted →
    * count and digest per document.
    */
  def fingerprint(docs: DataFrame, id: String, text: String): DataFrame = {
    val prepared = docs.select(col(id), lower(col(text)).as("_t"))
    val h = expr(
      "transform(sequence(1, greatest(length(_t) - 4, 1)), i -> substring(md5(substring(_t, i, 5)), 1, 8))")
    val withH = prepared.withColumn("_h", h)
    val mins = expr("transform(sequence(1, greatest(size(_h) - 3, 1)), j -> array_min(slice(_h, j, 4)))")
    withH.withColumn("_fp", array_sort(array_distinct(mins)))
      .select(col(id),
        size(col("_fp")).cast("long").as("fp_count"),
        md5(array_join(col("_fp"), ",")).as("fp_digest"))
  }
}
