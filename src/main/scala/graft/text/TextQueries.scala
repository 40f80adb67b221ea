package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis queries + DuckDB oracles (SURVEY §2.12 #60–63). */
object TextQueries {

  def textLangid(s: SparkSession, dir: String): DataFrame =
    TextOps.langId(documents(s, dir), "doc_id", "text").orderBy("doc_id")

  val textLangidOracle: String = {
    val hitSql = TextOps.LangProfiles.map { case (lang, prof) =>
      val lst = prof.map(w => s"'$w'").mkString(", ")
      s"  len(list_filter(toks, x -> list_contains([$lst], x))) AS h_$lang"
    }.mkString(",\n")
    val langs = TextOps.LangProfiles.map(_._1)
    val maxH = s"greatest(${langs.map("h_" + _).mkString(", ")})"
    val whenChain = langs.map(l => s"WHEN h_$l = mx THEN '$l'").mkString(" ")
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |h AS (SELECT doc_id, greatest(len(toks), 1) AS n,
       |$hitSql
       |FROM t),
       |m AS (SELECT *, $maxH AS mx FROM h)
       |SELECT doc_id,
       |  CASE WHEN mx <= 0 THEN 'unknown' $whenChain ELSE 'unknown' END AS lang_pred,
       |  round(CAST(mx AS DOUBLE) / n, 5) AS lang_score
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  def textQuality(s: SparkSession, dir: String): DataFrame =
    TextOps.quality(documents(s, dir), "doc_id", "text").orderBy("doc_id")

  val textQualityOracle: String = {
    val en = TextOps.LangProfiles.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    """WITH t AS (SELECT doc_id, lower(text) AS t, string_split(lower(text), ' ') AS toks
      |           FROM documents),
      |b AS (SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS nw,
      |  CAST(length(t) AS BIGINT) AS nc,
      |  CAST(length(regexp_replace(t, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS np,
      |  CAST(len(list_filter(toks, x -> list_contains([__EN__], x))) AS BIGINT) AS nstop
      |FROM t)
      |SELECT doc_id,
      |  nw AS n_words,
      |  nc AS n_chars,
      |  (nc - nw + 1) * 1000 // nw AS mean_word_len_milli,
      |  np * 1000 // nc AS punct_milli,
      |  nstop * 1000 // nw AS stopword_milli,
      |  least(nw, 50) * 8 + (nc - np) * 300 // nc + nstop * 300 // nw AS quality_bp
      |FROM b
      |ORDER BY doc_id""".stripMargin.replace("__EN__", en)
  }

  def textTokens(s: SparkSession, dir: String): DataFrame =
    TextOps.tokenCounts(documents(s, dir), "doc_id", "text").orderBy("doc_id")

  val textTokensOracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
      |    AS regex_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextOps.fingerprint(documents(s, dir), "doc_id", "text").orderBy("doc_id")

  val textFingerprintOracle: String =
    """WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
      |h AS (SELECT doc_id,
      |        [substr(md5(substr(t, i, 5)), 1, 8)
      |         for i in range(1, greatest(length(t) - 4, 1) + 1)] AS h
      |      FROM t),
      |m AS (SELECT doc_id,
      |        list_sort(list_distinct(
      |          [list_min(h[j:j+3]) for j in range(1, greatest(len(h) - 3, 1) + 1)])) AS fp
      |      FROM h)
      |SELECT doc_id, CAST(len(fp) AS BIGINT) AS fp_count,
      |       md5(array_to_string(fp, ',')) AS fp_digest
      |FROM m
      |ORDER BY doc_id""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_langid" -> (textLangid _),
    "text_quality" -> (textQuality _),
    "text_tokens" -> (textTokens _),
    "text_fingerprint" -> (textFingerprint _)
  )

  def oracles: Map[String, String] = Map(
    "text_langid" -> textLangidOracle,
    "text_quality" -> textQualityOracle,
    "text_tokens" -> textTokensOracle,
    "text_fingerprint" -> textFingerprintOracle
  )
}
