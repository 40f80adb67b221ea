package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 optimization drill (not part of the driver contract): interleaved
  * A/B of the round's restructured operators against their pre-r13
  * shapes, in ONE JVM, min-of-N per variant — the measurement method the
  * r12 probes established (same-box interleaving cancels JIT/GC drift
  * that makes separate solo runs incomparable).
  *
  * Usage: runMain graft.tools.R13Probe [reps]
  */
object R13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    // ---- co-purchase pair derivations ----
    def loRaw(): DataFrame =
      graft.Tables.lineitem(spark, sfDir)
        .select(col("l_suppkey").as("sk"), to_date(col("l_shipdate")).as("dt"),
          col("l_orderkey"))
        .join(graft.Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("sk"), col("dt"), col("o_custkey").as("c"))

    def pairsOf(lo: DataFrame): DataFrame =
      lo.as("x").join(lo.as("y"),
          col("x.sk") === col("y.sk") && col("x.dt") === col("y.dt") &&
            col("x.c") < col("y.c"))
        .select(col("x.c").as("id1"), col("y.c").as("id2"))

    def pairsOld(): DataFrame = pairsOf(loRaw().persist())
    def pairsNew(): DataFrame = pairsOf(
      loRaw().repartition(col("sk"), col("dt"))
        .dropDuplicates("sk", "dt", "c").persist())

    // ---- sssp sweep shapes (old: join+filter / union+agg per sweep) ----
    def ssspOld(): DataFrame = {
      val edges = graft.clustering.ClusterQueries.weightedEdges(spark, sfDir)
      val seeds = graft.Tables.customer(spark, sfDir)
        .filter(col("c_custkey") % 40 === 0).select(col("c_custkey").as("v"))
      val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val adj = edges
        .select(col("id1").as("src"), col("id2").as("dst"), col("w").cast("long").as("w"))
        .unionByName(edges.select(col("id2").as("src"), col("id1").as("dst"),
          col("w").cast("long").as("w")))
        .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
        .repartition(col("src")).persist()
      var best = seeds.select(col("v")).distinct()
        .select(col("v"), lit(0L).as("dist")).persist()
      persisted += best
      var frontier = best
      for (_ <- 1 to 4) {
        val cand = frontier.join(adj, col("v") === col("src"))
          .select(col("dst").as("v"), (col("dist") + col("w")).as("dist"))
          .groupBy(col("v")).agg(min(col("dist")).as("dist"))
        val improved = cand
          .join(best.select(col("v"), col("dist").as("_old")), Seq("v"), "left")
          .filter(col("_old").isNull || col("dist") < col("_old"))
          .select(col("v"), col("dist"))
          .persist()
        persisted += improved
        best = best.unionByName(improved)
          .groupBy(col("v")).agg(min(col("dist")).as("dist"))
          .persist()
        persisted += best
        frontier = improved
      }
      val out = best.localCheckpoint(true)
      adj.unpersist(false)
      persisted.foreach(_.unpersist(false))
      out.orderBy("v")
    }
    def ssspNew(): DataFrame = {
      val edges = graft.clustering.ClusterQueries.weightedEdges(spark, sfDir)
      val seeds = graft.Tables.customer(spark, sfDir)
        .filter(col("c_custkey") % 40 === 0).select(col("c_custkey").as("v"))
      graft.graph.Sssp.run(seeds, edges, iters = 4).orderBy("v")
    }

    def force(df: DataFrame): Long = {
      df.agg(expr(s"bit_xor(xxhash64(${df.columns.map(c => s"`$c`").mkString(",")}))"))
        .collect()(0).getLong(0)
    }
    def timed(fn: () => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val h = force(fn())
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Bench.clearSessionState(spark)
      (dt, h)
    }
    // ---- pagerank sweep shapes (old: per-sweep broadcast joins) ----
    def prEdges(): DataFrame =
      graft.Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
        .join(graft.Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(graft.Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(graft.Tables.supplier(spark, sfDir)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
    def prNodes(): DataFrame =
      graft.Tables.nation(spark, sfDir).select(col("n_nationkey").as("v"))
    def pagerankOld(): DataFrame = {
      val edges = prEdges(); val nodes = prNodes()
      val iters = 10; val dampPct = 85L
      val scale = 1000000000000L; val pscale = 1000000L
      val sNum = dampPct * pscale / 100
      val wsum = edges.groupBy("src").agg(sum("w").as("wt"))
      val e = edges.join(wsum, "src")
        .select(col("src"), col("dst"), expr(s"(w * ${sNum}L) div wt").as("s"))
        .persist()
      val nn = nodes.agg(count(lit(1)).as("nn"))
      val bases = nodes.crossJoin(broadcast(nn))
        .select(col("v"),
          expr(s"(${scale / 100 * (100 - dampPct)}L div nn)").as("base"),
          expr(s"(${scale}L div nn)").as("r0"))
        .persist()
      var ranks = bases.select(col("v"), col("r0").as("r"))
      for (_ <- 1 to iters) {
        val contribs = e.join(ranks, e("src") === ranks("v"))
          .groupBy("dst").agg(sum(expr("(r * s) div " + pscale)).as("c"))
        ranks = bases.join(contribs, bases("v") === contribs("dst"), "left")
          .select(bases("v"), (col("base") + coalesce(col("c"), lit(0L))).as("r"))
      }
      ranks.select(col("v"), col("r").as("rank_scaled"),
        (col("r").cast("double") / lit(scale.toDouble)).as("rank"))
        .orderBy(col("rank_scaled").desc, col("v"))
    }
    def pagerankNew(): DataFrame =
      graft.graph.PageRank.run(prNodes(), prEdges())
        .orderBy(col("rank_scaled").desc, col("v"))

    // ---- basket mining shapes (old: distinct + unkeyed persists) ----
    def assocOld(): DataFrame = {
      val items = graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
        .distinct().persist()
      try {
        val small = items.groupBy("oid").agg(count(lit(1)).as("k"))
          .filter(col("k") <= 20).select("oid")
        val basket = items.join(small, "oid")
        val nBaskets = small.agg(count(lit(1)).as("n_baskets"))
        val sup = basket.groupBy("item").agg(count(lit(1)).as("sup"))
        val pairs = basket.as("x").join(basket.as("y"),
            col("x.oid") === col("y.oid") && col("x.item") =!= col("y.item"))
          .groupBy(col("x.item").as("ante"), col("y.item").as("cons"))
          .agg(count(lit(1)).as("sup_ab"))
          .filter(col("sup_ab") >= 2)
        pairs
          .join(sup.select(col("item").as("ante"), col("sup").as("sup_a")), "ante")
          .join(sup.select(col("item").as("cons"), col("sup").as("sup_b")), "cons")
          .crossJoin(broadcast(nBaskets))
          .select(col("ante"), col("cons"), col("sup_ab"),
            expr("sup_ab * 1000 div sup_a").as("conf_milli"),
            expr("CAST(CAST(sup_ab AS DECIMAL(38,0)) * n_baskets * 1000 div " +
              "(CAST(sup_a AS DECIMAL(38,0)) * sup_b) AS BIGINT)").as("lift_milli"))
          .orderBy(col("lift_milli").desc, col("conf_milli").desc,
            col("ante"), col("cons"))
          .limit(50)
          .localCheckpoint(true)
      } finally items.unpersist(false)
    }
    def assocNew(): DataFrame =
      graft.SparkEntry.queries("mine_assoc_rules")(spark, sfDir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "pagerank_old" -> (pagerankOld _),
      "pagerank_new" -> (pagerankNew _),
      "assoc_old" -> (assocOld _),
      "assoc_new" -> (assocNew _),
      "pairs_tri_old" -> (() => {
        val nodes = graft.Tables.customer(spark, sfDir).select(col("c_custkey").as("v"))
        graft.graph.Triangles.vertexTriangles(nodes, pairsOld()).orderBy("v")
      }),
      "pairs_tri_new" -> (() => {
        val nodes = graft.Tables.customer(spark, sfDir).select(col("c_custkey").as("v"))
        graft.graph.Triangles.vertexTriangles(nodes, pairsNew()).orderBy("v")
      }),
      "sssp_old" -> (ssspOld _),
      "sssp_new" -> (ssspNew _))
    // interleave: one rep of each variant per round
    val results = scala.collection.mutable.Map[String, List[(Double, Long)]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (name, fn) <- variants) {
      val (dt, h) = timed(fn)
      results(name) = results(name) :+ ((dt, h))
      println(f"R13PROBE rep$r $name%-16s $dt%7.2f s hash=$h")
    }
    for ((name, _) <- variants) {
      val rs = results(name)
      val warm = if (rs.size > 1) rs.tail else rs
      println(f"R13PROBE MIN $name%-16s ${rs.map(_._1).min}%7.2f s " +
        f"warmmin=${warm.map(_._1).min}%7.2f hashes=${rs.map(_._2).distinct.size} distinct")
    }
    spark.stop()
  }
}
