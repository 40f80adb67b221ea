package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

/** Round-8 additions, second batch: distributed BPE merge training, the
  * ORC / compaction / schema-evolution IO queries, and streaming CDC
  * upsert.
  */
class Round8bSpec extends AnyFunSuite {
  import TestSpark._

  test("bpeTrain reproduces hand-computed merges incl. greedy same-pair runs") {
    val spark2 = spark
    import spark2.implicits._
    // words: aaab ×2, ab ×1
    //   v1: "a a a b"(2), "a b"(1)
    //   r1 pairs: (a,a)=4 [two per 'aaab'], (a,b)=3 -> merge "a a" (4)
    //     greedy left-to-right: "a a a b" -> "aa a b" (NOT "a aa b")
    //   r2 pairs: (aa,a)=2, (a,b)=3 -> merge "a b" (3)
    //   r3 pairs: (aa,ab)=2 -> merge "aa ab" (2)
    val docs = Seq("aaab aaab", "ab").toDF("text")
    val got = TextOps.bpeTrain(docs, "text", merges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a a", "aa", 4L),
      (2L, "a b", "ab", 3L),
      (3L, "aa ab", "aaab", 2L)))
  }

  test("bpeTrain breaks pair-count ties lexicographically asc") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq("zq zq yx yx").toDF("text")
    val got = TextOps.bpeTrain(docs, "text", merges = 1).collect()
    assert(got(0).getString(1) == "y x" && got(0).getLong(3) == 2L)
  }

  test("io_compact writes exactly ceil(rows/target) files, loses no rows") {
    val out = graft.io.IoQueries.ioCompact(spark, sf).collect()(0)
    val rows = Tables.documents(spark, sf).count()
    val expectFiles = (rows + graft.io.IoQueries.CompactTargetRows - 1) /
      graft.io.IoQueries.CompactTargetRows
    assert(out.getAs[Long]("n_files") == expectFiles)
    assert(out.getAs[Long]("n_rows") == rows)
    assert(out.getAs[Long]("n_docs") == rows)
  }

  test("io_orc roundtrip equals the parquet-side aggregate") {
    val viaOrc = graft.io.IoQueries.ioOrc(spark, sf).collect().toSeq
    val direct = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"),
        Tables.cents(col("l_extendedprice")).as("price_c"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"),
        (sum("price_c").cast("double") / 100.0).as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().toSeq
    assert(viaOrc == direct)
  }

  test("io_merge_schema: v1 rows surface blank lang, per-batch counts add up") {
    val rows = graft.io.IoQueries.ioMergeSchema(spark, sf).collect()
    val (v1, v2) = rows.partition(_.getAs[String]("batch") == "v1")
    assert(v1.length == 1 && v1(0).getAs[String]("lang") == "")
    assert(v2.forall(_.getAs[String]("lang").nonEmpty))
    val docs = Tables.documents(spark, sf)
    assert(v1.map(_.getAs[Long]("n")).sum == docs.filter(col("doc_id") % 2 === 0).count())
    assert(v2.map(_.getAs[Long]("n")).sum == docs.filter(col("doc_id") % 2 === 1).count())
  }

  test("soundex circuit: reference codes, H/W rule, leading-run collapse") {
    val spark2 = spark
    import spark2.implicits._
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163", "Ashcraft" -> "A261",
      "Ashcroft" -> "A261", "Tymczak" -> "T522", "Pfister" -> "P236",
      "Honeyman" -> "H555", "White" -> "W300", "Jackson" -> "J250",
      "Washington" -> "W252", "Lee" -> "L000", "" -> "", "42!" -> "")
    val got = cases.map(_._1).toDF("n")
      .select(graft.functions.Phonetic.soundex(col("n")))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("every curated surname variant pair shares a soundex code") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.blocking.BlockQueries.SurnameVariants.toDF("a", "b")
      .select(graft.functions.Phonetic.soundex(col("a")).as("ca"),
        graft.functions.Phonetic.soundex(col("b")).as("cb"))
      .collect()
    assert(rows.forall(r => r.getString(0) == r.getString(1)))
  }

  test("phonetic blocking recovers every gold pair; exact keys recover none") {
    val out = graft.blocking.BlockQueries.blockPhonetic(spark, sf).collect()
    // R drops custkey%10==3; L and R bucket counts must pair up per key
    assert(out.forall(r => r.getAs[Long]("n_pairs") ==
      r.getAs[Long]("n_l") * r.getAs[Long]("n_r")))
    assert(out.forall(r => r.getAs[Long]("n_l") > 0 && r.getAs[Long]("n_r") > 0),
      "every phonetic key must exist on both sides (variant pairs share codes)")
    // exact surname equality across sides: zero overlap by construction
    val variants = graft.blocking.BlockQueries.SurnameVariants
    assert(variants.map(_._1).toSet.intersect(variants.map(_._2).toSet).isEmpty)
  }

  test("bpeEncode: per-doc counts reconcile with the merge table's compression") {
    val spark2 = spark
    import spark2.implicits._
    // corpus: aaab aaab ab -> merges (a a), (a b), (aa ab)
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val got = TextOps.bpeEncode(docs, "doc_id", "text", merges = 3)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens_char"), r.getAs[Long]("n_tokens_bpe"))).toSeq
    // after 3 merges: "aaab" -> [aaab] (1 token), "ab" -> [ab] (1 token).
    // NOTE pair_count ≠ tokens removed: "a a a b" holds 2 (a,a) pair
    // occurrences but greedy merges only the non-overlapping one — the
    // per-doc BPE counts are the ground truth asserted here.
    assert(got == Seq((1L, 2L, 8L, 2L), (2L, 1L, 2L, 1L)))
  }

  test("phrase search: positional join finds exactly the planted occurrences") {
    val spark2 = spark
    import spark2.implicits._
    val phrase = graft.text.TextQueries.SearchPhrase.mkString(" ")
    val docs = Seq(
      (1L, s"x $phrase y $phrase"),      // 2 occurrences
      (2L, s"$phrase"),                  // exact
      (3L, "row column x sort"),         // broken phrase -> no hit
      (4L, "nothing here")).toDF("doc_id", "text")
    val posts = docs.select(col("doc_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
    val hits = graft.text.TextQueries.SearchPhrase.zipWithIndex.map { case (t, i) =>
      posts.filter(col("w") === t).select(col("doc_id"), (col("pos") - i).as("start"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n")).toMap
    assert(hits == Map(1L -> 2L, 2L -> 1L))
  }

  test("events_scd2: contiguous intervals, one current row per user") {
    val rows = ExtraQueries.eventsScd2(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rs =>
      val sorted = rs.sortBy(r => (r.getAs[Long]("valid_from"), r.getAs[Long]("event_id")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from"))
        case _ =>
      }
      assert(sorted.last.getAs[Long]("valid_to") == Long.MaxValue)
      assert(rs.count(_.getAs[Boolean]("is_current")) == 1)
    }
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length.toLong == purchases)
  }

  test("checkSuite: completeness, uniqueness, domain and a failing bound") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (2L, None, -5.0), (3L, Some("z"), 30.0)).toDF("k", "s", "v")
    val out = graft.profiling.Profiler.checkSuite(df, Seq(
      ("s_complete", count(col("s")), 1000L),
      ("k_unique", countDistinct(col("k")), 1000L),
      ("s_domain", sum(when(col("s").isin("a", "b"), 1L).otherwise(0L)), 500L),
      ("v_nonneg", sum(when(col("v") >= 0, 1L).otherwise(0L)), 1000L)))
      .collect().map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Long]("metric_milli"), r.getAs[Boolean]("passed")))).toMap
    assert(out("s_complete") == ((750L, false)))  // 3/4 non-null
    assert(out("k_unique") == ((750L, false)))    // 3 distinct of 4
    assert(out("s_domain") == ((500L, true)))     // 2/4 >= 0.5
    assert(out("v_nonneg") == ((750L, false)))    // one negative
  }

  test("morton layout bounds both dimensions: z-span never worse than single-sort span") {
    val rows = graft.io.IoQueries.ioZorder(spark, sf).collect()
    val (z, single) = rows.partition(_.getAs[String]("layout") == "zorder")
    assert(z.length == 16 && single.length == 16)
    val zSpan = z.map(_.getAs[Long]("span")).sum
    val sSpan = single.map(_.getAs[Long]("span")).sum
    // single-column sort leaves nat full-range in every chunk; the
    // z-layout must beat it overall on the two-dimensional span
    assert(zSpan < sSpan, s"z=$zSpan single=$sSpan")
  }

  test("containment: contained-in catches the asymmetric copy Jaccard misses") {
    val spark2 = spark
    import spark2.implicits._
    val core = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, core),                                  // the excerpt
      (2L, s"intro words here then $core and a very long tail of extra content padding onward"),
      (3L, "completely different text about nothing shared at all here")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.containment(docs, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 1 is contained in 2 (all of 1's shingles appear in 2); NOT vice versa
    assert(out == Seq((1L, 2L)))
    // symmetric Jaccard at the same bar misses it
    val j = graft.dedup.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.9).count()
    assert(j == 0L)
  }

  test("readability: milli circuit on hand-computed inputs") {
    val spark2 = spark
    import spark2.implicits._
    // "spark is fast. very fast." -> words=5, sentences=3 (trailing '.'
    // yields an empty tail segment), syllables: a/i/a/e-y/a = 1+1+1+2+1=6
    val out = TextOps.readability(Seq((1L, "spark is fast. very fast."))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(out.getAs[Long]("n_words") == 5L)
    assert(out.getAs[Long]("n_sentences") == 3L)
    assert(out.getAs[Long]("n_syllables") == 6L)
    // grade_milli = 390*5 div 3 + 11800*6 div 5 - 15590 = 650 + 14160 - 15590
    assert(out.getAs[Long]("fk_grade_milli") == 650L + 14160L - 15590L)
  }

  test("table diff classifies every planted status with exact counts") {
    val rows = graft.io.IoQueries.ioTableDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val docs = Tables.documents(spark, sf)
    val n0 = docs.filter(col("doc_id") % 10 === 0).count()
    val n3 = docs.filter(col("doc_id") % 10 === 3).count()
    val n7 = docs.filter(col("doc_id") % 10 === 7).count()
    val all = docs.count()
    assert(rows("added") == n0 && rows("removed") == n7 && rows("changed") == n3)
    assert(rows("unchanged") == all - n3 - n7)
  }

  test("fellegi-sunter: full recall on gold, near-perfect precision") {
    val out = graft.matching.MatchQueries.matchFellegiSunter(spark, sf)
    val pred = out.filter(col("is_match_pred"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gold = graft.blocking.EmScenario.gold(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every true pair scores positive (the strong field's ln(m/u)
    // dominates); a couple of chance band+bal agreements may slip in at
    // threshold 0 — CORRECT F-S behavior, so assert recall exactly and
    // precision tightly rather than set equality
    assert(gold.subsetOf(pred), "recall must be 1.0")
    assert((pred -- gold).size <= math.max(2, gold.size / 50),
      s"precision too low: ${(pred -- gold).size} false positives")
    // gold pairs agree on the strong field and must carry its positive weight
    val goldScores = out.filter(col("a_name")).agg(min("score_scaled")).collect()(0).getLong(0)
    assert(goldScores > 0L)
  }

  test("truth discovery: learned trust ranks sources by their real accuracy") {
    val rows = graft.fusion.FuseQueries.fuseTruthDiscovery(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("trust_milli"), r.getAs[Long]("n_correct"), r.getAs[Long]("n_objects"))))
      .toMap
    val (ta, tb, tc) = (rows("srcA")._1, rows("srcB")._1, rows("srcC")._1)
    // accuracy order srcA (always right) > srcB (1/7 wrong) > srcC (1/3 wrong)
    assert(rows("srcA")._2 == rows("srcA")._3)
    assert(ta > tb && tb > tc, s"trust order broken: $ta $tb $tc")
    // unsupervised trust tracks real accuracy but NOT perfectly: on
    // obj % 21 == 0, B and C collude on the identical wrong value and
    // outvote A — so even the perfect source scores below 1000 (the
    // classic truth-discovery failure mode, worth pinning)
    assert(ta < 1000L)
    val nColluding = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 21 === 0).count()
    assert(ta == (rows("srcA")._3 - nColluding) * 1000 / rows("srcA")._3)
  }

  test("events_json: schema-on-read parse, zero unparsed on clean data") {
    val rows = ExtraQueries.eventsJson(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_unparsed") == 0L))
    assert(rows.forall(r => r.getAs[Long]("min_k") <= r.getAs[Long]("max_k")))
  }

  test("k-anonymity: class rollup reconciles with the row count") {
    val out = graft.profiling.ProfileQueries.profileKanon(spark, sf).collect()(0)
    assert(out.getAs[Long]("n_rows") == Tables.customer(spark, sf).count())
    assert(out.getAs[Long]("n_small_classes") <= out.getAs[Long]("n_classes"))
    assert(out.getAs[Long]("min_class_size") >= 1L)
  }

  test("stream_upsert state equals batch last-writer-wins per key") {
    import org.apache.spark.sql.expressions.Window
    val got = ExtraQueries.streamUpsert(spark, sf)
    val events = Tables.events(spark, sf)
    // independent circuit: rank-1 row per key via a window, not max_by
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val want = events
      .withColumn("rn", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"),
        col("ts").as("last_ts"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"))
      .orderBy("user_id")
    assert(got.collect().toSeq == want.collect().toSeq)
  }
}
