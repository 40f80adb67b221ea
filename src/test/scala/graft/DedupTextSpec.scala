package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.text.TextOps
import graft.ann.Ann

class DedupTextSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, "the quick brown fox jumps over dog"),
      (2L, "quick the brown fox jumps over dog"), // same word SET as 1
      (3L, "the quick brown fox jumps over dog"), // identical to 1
      (4L, "completely different text entirely here now")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups canonicalized word sets, keeps min id") {
    val r = Dedup.exact(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == (1L, 3L) && r(2L) == (1L, 3L) && r(3L) == (1L, 3L))
    assert(r(4L) == (4L, 1L))
  }

  test("ngram jaccard finds only the true near-dup pair") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.8).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 3L)))
    assert(pairs.head._3 == 1.0)
  }

  test("semanticDedup: planted cluster keeps the centroid-nearest member, singletons keep themselves") {
    val spark2 = spark
    import spark2.implicits._
    // 3 vectors on a line: a=(1,0,..), b=(cos t, sin t,..), m halfway —
    // m is nearest the centroid and must win; z is orthogonal (singleton)
    val dim = 8
    def unit(x: Double, y: Double) =
      Array(x, y) ++ Array.fill(dim - 2)(0.0)
    val t = 0.12
    val docs = Seq(
      (1L, unit(1.0, 0.0)),
      (2L, unit(math.cos(t), math.sin(t))),
      (3L, unit(math.cos(t / 2), math.sin(t / 2))),
      (9L, unit(0.0, 1.0))).toDF("vec_id", "v")
    val out = graft.ann.Ann.semanticDedup(docs, "vec_id", "v", dim, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(out(1L)._1 == 3L && !out(1L)._2)   // middle vector is canonical
    assert(out(2L)._1 == 3L && out(3L)._2)
    assert(out(9L) == (9L, true))             // orthogonal singleton
  }

  test("hashFamily conf flips minhash to xxhash64 with the same verified pair set") {
    val d = graft.Tables.documents(spark, sf).limit(300)
    val md5Pairs = Dedup.minhashLsh(d, "doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    spark.conf.set(Dedup.HashFamilyConf, "xxhash64")
    try {
      val xxPairs = Dedup.minhashLsh(d, "doc_id", "text").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      // verification filters by TRUE jaccard, so both families emit the
      // same near-dup set (candidate recall coincides at this scale)
      assert(xxPairs == md5Pairs)
    } finally spark.conf.unset(Dedup.HashFamilyConf)
    intercept[IllegalArgumentException] {
      spark.conf.set(Dedup.HashFamilyConf, "fnv")
      try Dedup.hashFamily(spark) finally spark.conf.unset(Dedup.HashFamilyConf)
    }
  }

  test("minhash LSH surfaces identical docs; simhash hamming 0 for identical") {
    val mh = Dedup.minhashLsh(docs, "doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(mh.contains((1L, 3L)))
    val sh = Dedup.simhashPairs(docs, "doc_id", "text", 0).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    // 1,2,3 share the same word SET → identical simhash signatures
    assert(sh == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("minhash hash families (md5 oracle-parity vs xxhash64 scale) agree on planted dups") {
    val d = Tables.documents(spark, sf)
    val md5Pairs = Dedup.minhashLsh(d, "doc_id", "text", hashHex = Some(Dedup.Md5Hash))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val xxPairs = Dedup.minhashLsh(d, "doc_id", "text", hashHex = Some(Dedup.XxHash))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(md5Pairs == xxPairs, s"md5=${md5Pairs.size} xx=${xxPairs.size}")
    assert(md5Pairs.nonEmpty)
  }

  test("langid picks the profile with most stopword hits") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, "the cat and the dog"),
      (2L, "der hund und die katze"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val r = TextOps.langId(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "en" && r(2L) == "de" && r(3L) == "unknown")
  }

  test("winnowing fingerprint is stable and shorter than gram count") {
    val r = TextOps.fingerprint(docs, "doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val byId = r.map(x => x._1 -> x).toMap
    assert(byId(1L)._3 == byId(3L)._3) // identical text → identical digest
    assert(byId(1L)._3 != byId(4L)._3)
    assert(byId(1L)._2 > 0)
  }

  test("repeatedNgrams: cross-doc repeated span flags both docs, coverage is a UNION of spans") {
    val spark2 = spark
    import spark2.implicits._
    // A and B share the 6-word span s1..s6; with n=4 that is three
    // duplicated 4-grams per doc whose coverage must count the UNION
    // (6 tokens), not 3×4. C shares nothing.
    val docs = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 a7 a8 a9 a10"),
      (2L, "b0 s1 s2 s3 s4 s5 s6 b7 b8 b9"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
    val out = TextOps.repeatedNgrams(docs, "doc_id", "text", n = 4, dropThreshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    assert(out(1L) == ((10L, 3L, 6L, true)))  // 6/10 covered > 0.5 → drop
    assert(out(2L) == ((10L, 3L, 6L, true)))
    assert(out(3L) == ((10L, 0L, 0L, false)))
  }

  test("IVF top-k finds planted twins (recall@1 vs brute force)") {
    val spark2 = spark
    import spark2.implicits._
    val orig = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val twins = orig.select((col("vec_id") + 100000).as("vec_id"),
      concat(array(element_at(col("v"), 1) + 0.2), slice(col("v"), 2, 63)).as("v"))
    val corpus = orig.unionByName(twins)
    val queries = orig.limit(20)
    val ivf = Ann.ivfTopK(queries, corpus, "vec_id", "v", 64, k = 1,
      nlist = 8, nprobe = 2).collect()
    // each query's true nearest neighbor is its twin (cosine ≈ 0.98)
    val hits = ivf.count(r => r.getLong(1) == r.getLong(0) + 100000)
    assert(hits >= (ivf.length * 0.9).toInt, s"recall@1 too low: $hits/${ivf.length}")
  }

  test("DetMath.detLn tracks math.log to 1e-14 relative across [1, 2^40)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val xs = (0 until 2000).map(_ => math.exp(rnd.nextDouble() * 40 * math.log(2))) :+
      1.0 :+ 2.0 :+ 1024.0 :+ 3.5 :+ 1.0000001 :+ math.pow(2, 39.9)
    val got = xs.toDF("x")
      .select(col("x"), graft.functions.DetMath.detLn(col("x")).as("l"))
      .collect()
    got.foreach { r =>
      val x = r.getDouble(0); val l = r.getDouble(1)
      val exact = math.log(x)
      val tol = math.max(1e-14 * math.abs(exact), 5e-16)
      assert(math.abs(l - exact) <= tol, s"detLn($x)=$l vs ${exact}")
    }
  }

  test("bm25TopK: a query with a planted rare term ranks its source doc #1") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = ((1L to 40L).map(i => (i, "alpha beta gamma delta epsilon zeta")) :+
      (99L, "alpha beta zzyzxq gamma delta epsilon")).toDF("doc_id", "text")
    val queries = Seq((99L, "zzyzxq alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val r = TextOps.bm25TopK(corpus, "doc_id", "text", queries, "doc_id", "text",
      qTerms = 6, k = 5).orderBy("rank").collect()
    assert(r.head.getLong(1) == 99L, s"rare-term doc not ranked first: ${r.toSeq}")
    assert(r.length == 5 && r.map(_.getLong(2)).sameElements(1L to 5L))
    // scores strictly non-increasing in rank
    val scores = r.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("tokenEntropy: all-distinct doc has H=ln(n) (norm 1), constant doc has H=0") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq((1L, "a b c d e f g h"), (2L, "x x x x x x x x"),
      (3L, "a a b b c c d d")).toDF("doc_id", "text")
    val r = TextOps.tokenEntropy(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(math.abs(r(0).getDouble(3) - math.log(8)) < 1e-9)
    assert(math.abs(r(0).getDouble(4) - 1.0) < 1e-9 && !r(0).getBoolean(5))
    // ≈0 up to the 1e-9 fixed-point quantization of the Σ tf·ln tf sum
    assert(r(1).getDouble(3) < 1e-8 && r(1).getBoolean(5)) // constant → flagged
    assert(math.abs(r(2).getDouble(3) - math.log(4)) < 1e-9) // 4 values × 2
  }

  test("unigramCrossEntropy: docs of rare terms score higher than docs of common terms") {
    val spark2 = spark
    import spark2.implicits._
    val common = (1L to 20L).map(i => (i, "the the the the"))
    val rare = Seq((100L, "qux zot fizz buzz"))
    val r = TextOps.unigramCrossEntropy((common ++ rare).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(100L) > r(1L) + 1.0, s"rare doc not more surprising: $r")
    // corpus-uniform sanity: xent of common docs ≈ -ln p(the) = ln(84/80)
    assert(math.abs(r(1L) - math.log(84.0 / 80.0)) < 1e-9)
  }

  test("groupKlDivergence: matching-mix group ≈ 0, skewed group > 0, all ≥ -quantization") {
    val spark2 = spark
    import spark2.implicits._
    // groups a and b share the corpus mix exactly; c is all-one-token
    val d = Seq(("a", "x x y z"), ("a", "x y z z"),
      ("b", "x x y z"), ("b", "x y z z"),
      ("c", "q q q q"), ("c", "q q q q")).toDF("source", "text")
    val r = TextOps.groupKlDivergence(d, "source", "text").collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r.values.forall(_ >= -1e-8)) // Gibbs, up to 1e-9 fixed-point floor
    assert(r("a") == r("b")) // identical distributions, identical KL bits
    assert(r("c") > 1.0, s"pure-q group should diverge strongly: $r")
    assert(r("a") < r("c"))
  }

  test("lshCandidateEval: identical twins are always candidates (recall 1), counts consistent") {
    val spark2 = spark
    import spark2.implicits._
    // 5 identical twin pairs (same shingle set → same signatures in every
    // band) + noise docs: truth = 5 pairs, all 5 must be candidates
    val twins = (1L to 5L).flatMap(i => Seq(
      (i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"),
      (i + 100, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")))
    val noise = (200L to 210L).map(i => (i, s"n${i}a n${i}b n${i}c n${i}d n${i}e"))
    val r = Dedup.lshCandidateEval((twins ++ noise).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(r.getLong(1) == 5L, s"truth pairs: $r")       // n_truth
    assert(r.getDouble(4) == 1.0, s"recall must be 1: $r")
    assert(r.getLong(2) <= r.getLong(0))                  // hits ≤ candidates
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0) // precision sane
  }

  test("embeddingContamination: planted eval twin flags its train source, clean vectors pass") {
    val spark2 = spark
    import spark2.implicits._
    val train = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.0, 1.0, 0.0, 0.0)),
      (3L, Array(0.0, 0.0, 1.0, 0.0))).toDF("vec_id", "v")
    // eval vector ≈ train 1 (same bucket, cosine ≈ 0.995); nothing near 2/3
    val eval = Seq((900L, Array(1.0, 0.1, 0.0, 0.0))).toDF("vec_id", "v")
    val r = Ann.embeddingContamination(train, eval, "vec_id", "v", 4, 0.9)
      .collect()
    assert(r.map(_.getLong(0)).toSet == Set(1L), s"flags: ${r.toSeq}")
    assert(r.head.getLong(2) == 900L && r.head.getDouble(3) > 0.99)
  }

  test("bigramCrossEntropy: deterministic transitions → 0, shuffled doc scores higher") {
    val spark2 = spark
    import spark2.implicits._
    // corpus where "a b" always follows deterministically except doc 9
    val d = ((1L to 8L).map(i => (i, "a b a b a b a b")) :+
      (9L, "b b a a b a b b")).toDF("doc_id", "text")
    val r = TextOps.bigramCrossEntropy(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    // doc 1: transitions a→b (p≈1) and b→a (p<1 since doc 9 adds b→b) —
    // near-zero but positive; doc 9 must be clearly more surprising
    assert(r(1L) >= 0.0 && r(1L) < 0.3, s"regular doc: $r")
    assert(r(9L) > r(1L) + 0.2, s"shuffled doc not penalized: $r")
    // docs with identical text get identical bits
    assert(r(1L) == r(2L))
  }

  test("DetMath.detExp tracks math.exp to 1e-14 relative across [-40, 40]") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(13)
    val xs = (0 until 2000).map(_ => (rnd.nextDouble() - 0.5) * 80) :+
      0.0 :+ 1.0 :+ -1.0 :+ math.log(2) :+ 39.9 :+ -39.9
    val got = xs.toDF("x")
      .select(col("x"), graft.functions.DetMath.detExp(col("x")).as("e"))
      .collect()
    got.foreach { r =>
      val x = r.getDouble(0); val e = r.getDouble(1)
      val exact = math.exp(x)
      assert(math.abs(e - exact) <= 1e-14 * exact, s"detExp($x)=$e vs $exact")
    }
  }

  test("mixtureTemperature: τ=1 is the identity, τ>1 flattens toward uniform") {
    val spark2 = spark
    import spark2.implicits._
    val d = (Seq.fill(60)("big") ++ Seq.fill(8)("mid") ++ Seq.fill(2)("small"))
      .zipWithIndex.map { case (s, i) => (s, "tok " * 5 + i) }.toDF("source", "text")
    def shares(tau: Double) = TextOps.mixtureTemperature(d, "source", "text", tau)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val id = shares(1.0)
    id.values.foreach { case (share, temp) => assert(math.abs(share - temp) < 1e-9) }
    val flat = shares(2.0)
    assert(flat("big")._2 < flat("big")._1)     // dominant source damped
    assert(flat("small")._2 > flat("small")._1) // low-resource upsampled
    assert(math.abs(flat.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("zipfFit: planted 1/rank corpus fits slope ≈ -1, uniform corpus ≈ 0") {
    val spark2 = spark
    import spark2.implicits._
    val zipfWords = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"w$i"))
    val zipf = Seq((1L, zipfWords.mkString(" "))).toDF("doc_id", "text")
    val rz = TextOps.zipfFit(zipf, "text", 40).collect().head
    assert(rz.getLong(0) == 40L)
    assert(math.abs(rz.getDouble(1) + 1.0) < 0.05, s"slope: ${rz.getDouble(1)}")
    val flatWords = (1 to 40).flatMap(i => Seq.fill(50)(s"w$i"))
    val flat = Seq((1L, flatWords.mkString(" "))).toDF("doc_id", "text")
    val rf = TextOps.zipfFit(flat, "text", 40).collect().head
    assert(math.abs(rf.getDouble(1)) < 1e-9, s"flat slope: ${rf.getDouble(1)}")
  }

  test("leakage-free split: every near-dup cluster lands in exactly one split") {
    val r = graft.dedup.DedupQueries.dedupSplitLeakfree(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.nonEmpty)
    // the property the op exists for: one split value per canonical id
    r.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"cluster $cid straddles splits: ${rows.map(_._3).distinct.toSeq}")
    }
    // and the corpus actually exercises it: at least one multi-doc
    // cluster exists (else the test proves nothing)
    assert(r.groupBy(_._2).exists(_._2.length > 1))
    // all three splits appear at the 500-doc scale
    assert(r.map(_._3).distinct.sorted.sameElements(Array("test", "train", "val")))
  }

  test("cosine helpers: unit vector self-similarity and bucket determinism") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Array(1.0, 0.0, 0.0, 0.0)), (2L, Array(0.0, 1.0, 0.0, 0.0)))
      .toDF("vec_id", "v")
    val top = Ann.bruteForceTopK(df, df, "vec_id", "v", 4, 1).collect()
    assert(top.length == 2) // each query gets its single non-self neighbor
    assert(top.forall(_.getDouble(2) == 0.0)) // orthogonal → cosine 0
    // bucket string: 4 planes default 8 → deterministic across calls
    val b1 = df.select(Ann.lshBucket(col("v"), 4).as("b")).collect().map(_.getString(0))
    val b2 = df.select(Ann.lshBucket(col("v"), 4).as("b")).collect().map(_.getString(0))
    assert(b1.sameElements(b2))
  }
}
