package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** r13 (resumed session) phase decomposition of the remaining solo-heavy
  * queries — guide §1 "measure first": each target is split at its
  * materialization boundaries and every phase is forced separately with
  * the bench's forcing hash, min over reps, so the next optimization
  * attacks the phase that actually costs, not the one that looks big.
  *
  * Usage: runMain graft.tools.R13bProbe [reps] [which,which,...]
  */
object R13bProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val which: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def force(df: DataFrame): Long =
      df.agg(expr(s"bit_xor(xxhash64(${df.columns.map(c => s"`$c`").mkString(",")}))"))
        .collect()(0).getLong(0)

    // ---- phase thunks ------------------------------------------------
    // Each entry runs ONE variant/phase end to end and returns a hash.

    def docs() = graft.Tables.documents(spark, sfDir)

    val phases: Seq[(String, () => Long)] = Seq(
      // floor: job-submission latency for a trivial 1-stage query
      "floor_1row" -> (() => force(spark.range(1).toDF("x"))),
      // corpus scan+spread only
      "docs_scan" -> (() => force(docs())),

      // ---- dedup_ngram_jaccard decomposition ----
      "ngram_sh" -> (() => {
        val sh = graft.dedup.Dedup.shingleFrame(docs(), "doc_id", "text", 3, sorted = true)
        force(sh.select(col("_id"), size(col("_sh")).as("n")))
      }),
      "ngram_cands" -> (() => {
        val sh = graft.dedup.Dedup.shingleFrame(docs(), "doc_id", "text", 3, sorted = true)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val withPrefix = sh.withColumn("_pl",
          (size(col("_sh")) - ceil(lit(0.8) * size(col("_sh"))) + 1).cast("int"))
        val inv = withPrefix
          .select(col("_id"), size(col("_sh")).as("_n"),
            explode(slice(col("_sh"), lit(1), col("_pl"))).as("_s"))
        val cands = inv.select(col("_id").as("id1"), col("_n").as("_na"), col("_s"))
          .join(inv.select(col("_id").as("id2"), col("_n").as("_nb"), col("_s")), "_s")
          .filter(col("id1") < col("id2") &&
            col("_na") >= lit(0.8) * col("_nb") &&
            col("_nb") >= lit(0.8) * col("_na"))
          .select("id1", "id2").distinct()
        val h = force(cands)
        sh.unpersist(false)
        h
      }),
      "ngram_full" -> (() =>
        force(graft.dedup.DedupQueries.dedupNgramJaccard(spark, sfDir))),

      // ---- dedup_eval decomposition ----
      "eval_lshcands" -> (() =>
        force(graft.dedup.Dedup.minhashCandidates(docs(), "doc_id", "text", 3, 4, 3))),
      "eval_full" -> (() =>
        force(graft.dedup.DedupQueries.dedupEval(spark, sfDir))),

      // ---- cluster_max_bipartite decomposition ----
      "bip_score" -> (() =>
        force(graft.clustering.ClusterQueries.bipartiteEdges(spark, sfDir))),
      "bip_ckpt_cc" -> (() => {
        val edgesN = graft.clustering.ClusterQueries.bipartiteEdges(spark, sfDir)
          .select(col("id1").cast("long"), col("id2").cast("long"),
            col("score").cast("double"))
          .localCheckpoint(true)
        val labels = graft.clustering.Clusterers.connectedComponents(edgesN)
        force(labels)
      }),
      "bip_full" -> (() =>
        force(graft.clustering.ClusterQueries.clusterMaxBipartite(spark, sfDir))),

      // ---- fuse_voting decomposition ----
      "fuse_src" -> (() => force(graft.fusion.FuseQueries.sources(spark, sfDir))),
      "fuse_voting_full" -> (() =>
        force(graft.fusion.FuseQueries.fuseVoting(spark, sfDir))),

      // ---- graph lpa decomposition ----
      "lpa_full" -> (() =>
        force(graft.graph.GraphQueries.all("graph_lpa")(spark, sfDir))),

      // ---- text bm25 ----
      "bm25_full" -> (() =>
        force(graft.text.TextQueries.all("text_bm25")(spark, sfDir)))
    )

    val sel = phases.filter { case (n, _) => which.isEmpty || which.contains(n) }
    val results = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (name, fn) <- sel) {
      val t0 = System.nanoTime()
      val h = fn()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Bench.clearSessionState(spark)
      results(name) = results(name) :+ dt
      println(f"R13B rep$r $name%-16s $dt%7.2f s hash=$h")
    }
    for ((name, _) <- sel) {
      val rs = results(name)
      val warm = if (rs.size > 1) rs.tail else rs
      println(f"R13B MIN $name%-16s ${rs.min}%7.2f s warmmin=${warm.min}%7.2f")
    }
    spark.stop()
  }
}
