package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.normalization.Normalize

/** Unit guards for the round-5 value-function additions:
  * standardize_country_name, encoding detect/fix, column quality.
  */
class ValueFnSpec extends AnyFunSuite {
  import TestSpark._

  private def country(raw: String): String = {
    val spark2 = spark
    import spark2.implicits._
    Seq(Tuple1(raw)).toDF("c")
      .select(Normalize.standardizeCountry(col("c")).as("s"))
      .collect()(0).getString(0)
  }

  test("standardizeCountry: direct, partial-in-order, title fallback") {
    assert(country("usa") == "United States")
    assert(country(" US ") == "United States")
    assert(country("Great Britain") == "United Kingdom")
    // partial: 'br' is a substring of key 'britain' — first partial in
    // map order wins (reference dict-order semantics)
    assert(country("br") == "United Kingdom")
    // unmapped → per-word title case
    assert(country("new zealand") == "New Zealand")
    assert(country("JAPAN") == "Japan")
    // empty string partially matches every key ('' in 'usa') → first map value
    assert(country("") == "United States")
  }

  test("standardizeCountry: null stays null") {
    val spark2 = spark
    import spark2.implicits._
    val r = Seq(Tuple1(null: String)).toDF("c")
      .select(Normalize.standardizeCountry(col("c")).as("s")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("fixEncoding replays the reference's sequential-replace quirks") {
    val spark2 = spark
    import spark2.implicits._
    val moji = Normalize.EncodingFixes.map(_._1)
    val rows = Seq(
      ("caf" + moji(5), "café", true),
      ("it" + moji(0) + "s", "it's", true),
      // em-dash mojibake: the bare right-quote rule already consumed the
      // "â€" prefix, so the em dash is never produced (reference quirk)
      ("a" + moji(3) + "b", "a\"\"b", true),
      ("clean", "clean", false))
    val got = rows.map(_._1).map(Tuple1(_)).toDF("c")
      .select(col("c"), Normalize.fixEncoding(col("c")).as("f"),
        Normalize.detectEncodingIssues(col("c")).as("i"))
      .collect()
    rows.zip(got).foreach { case ((_, expFixed, expIssue), r) =>
      assert(r.getString(1) == expFixed, s"fix of ${r.getString(0)}")
      assert(r.getBoolean(2) == expIssue, s"detect of ${r.getString(0)}")
    }
  }

  test("columnQuality: hand-computed metrics on a tiny frame") {
    val spark2 = spark
    import spark2.implicits._
    // 'n/a' is a null sentinel; 100 is the lone IQR outlier of {1,2,3,4,100}
    val df = Seq("1", "2", "3", "4", "100", "n/a").map(Tuple1(_)).toDF("x")
    val r = Normalize.columnQuality(df, Seq("x")).collect()(0)
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("total_values") == 6L)
    assert(m("null_count") == 1L)
    assert(m("unique_count") == 5L)
    assert(m("outlier_count") == 1L)
    assert(m("mean") == 22.0) // (1+2+3+4+100)/5
    assert(m("min_value") == 1.0 && m("max_value") == 100.0)
    // sample std of {1,2,3,4,100}: sqrt((10030 - 110*110/5)/4)
    assert(m("std") == math.sqrt((10030.0 - 110.0 * 110.0 / 5) / 4))
  }
}
