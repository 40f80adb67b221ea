package graft.clustering

import scala.collection.mutable

/** Sequential per-component kernels behind the post-clusterers
  * (PyDI/entitymatching/post_clustering). Each runs on the edge list of
  * ONE connected component inside `mapGroups` — valid because every
  * algorithm's decisions only ever involve nodes connected by an edge, so
  * a per-component run equals the reference's whole-graph run. Components
  * are bounded-size by construction after blocking (SURVEY §5).
  *
  * All kernels use the deterministic edge order (score desc, id1 asc,
  * id2 asc) where the reference relies on pandas' stable sort order —
  * identical except on exact score ties, where the reference inherits
  * input order (documented deviation).
  */
object ComponentKernels {

  final case class Edge(id1: Long, id2: Long, score: Double)

  private def sorted(edges: Seq[Edge]): Seq[Edge] =
    edges.sortBy(e => (-e.score, e.id1, e.id2))

  /** Greedy 1:1 matching (greedy_one_to_one.py:108): walk edges by score
    * desc, keep an edge iff both endpoints are still unmatched.
    */
  def greedyOneToOne(edges: Seq[Edge]): Seq[Edge] = {
    val matched = mutable.Set.empty[Long]
    val out = mutable.ArrayBuffer.empty[Edge]
    for (e <- sorted(edges)) {
      if (!matched(e.id1) && !matched(e.id2)) {
        out += e
        matched += e.id1
        matched += e.id2
      }
    }
    out.toSeq
  }

  /** CENTER clustering (centre_clusterer.py:117): walk edges by score
    * desc; unassigned-unassigned starts a cluster with id1 as centre;
    * an unassigned node joins the other endpoint's cluster only if that
    * endpoint is a centre. Returns (member, centre) rows.
    */
  def centre(edges: Seq[Edge]): Seq[(Long, Long)] = {
    val assigned = mutable.Set.empty[Long]
    val centres = mutable.Set.empty[Long]
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    for (e <- sorted(edges)) {
      val a1 = assigned(e.id1)
      val a2 = assigned(e.id2)
      if (!a1 && !a2) {
        centres += e.id1
        assigned += e.id1
        assigned += e.id2
        out += ((e.id1, e.id1))
        out += ((e.id2, e.id1))
      } else if (!a1 && a2 && centres(e.id2)) {
        assigned += e.id1
        out += ((e.id1, e.id2))
      } else if (a1 && !a2 && centres(e.id1)) {
        assigned += e.id2
        out += ((e.id2, e.id1))
      }
    }
    out.toSeq
  }

  /** Mutual-preference stable matching (stable_matching.py:92, their
    * variant with force_one_to_one=True): process left ids ascending;
    * each takes its best available partner such that the partner has no
    * strictly-better available option.
    */
  def stableMatching(edges: Seq[Edge]): Seq[Edge] = {
    val prefs = mutable.Map.empty[Long, mutable.ArrayBuffer[(Long, Double)]]
    val lookup = mutable.Map.empty[(Long, Long), Edge]
    for (e <- sorted(edges)) {
      prefs.getOrElseUpdate(e.id1, mutable.ArrayBuffer.empty) += ((e.id2, e.score))
      prefs.getOrElseUpdate(e.id2, mutable.ArrayBuffer.empty) += ((e.id1, e.score))
      lookup((e.id1, e.id2)) = e
      lookup((e.id2, e.id1)) = e
    }
    // Preference lists: score desc, partner asc (deterministic ties).
    val ordered = prefs.map { case (k, v) => k -> v.sortBy(p => (-p._2, p._1)).toSeq }
    val matched = mutable.Set.empty[Long]
    val out = mutable.ArrayBuffer.empty[Edge]

    def isStable(e1: Long, e2: Long): Boolean = {
      val p2 = ordered.getOrElse(e2, Seq.empty)
      val rank1 = p2.indexWhere(_._1 == e1)
      if (rank1 < 0) return false
      // Any available candidate strictly before e1 makes it unstable.
      !p2.take(rank1).exists { case (c, _) => !matched(c) }
    }

    for (left <- edges.map(_.id1).distinct.sorted) {
      if (!matched(left)) {
        val found = ordered.getOrElse(left, Seq.empty).iterator
          .filter { case (c, _) => !matched(c) }
          .find { case (c, _) => isStable(left, c) }
        found.foreach { case (c, _) =>
          val e = lookup((left, c))
          out += e
          matched += e.id1
          matched += e.id2
        }
      }
    }
    out.toSeq
  }

  /** Maximum-weight bipartite matching (maximum_bipartite_matching.py:112;
    * the reference calls scipy/networkx). Left partition = distinct id1,
    * right = distinct id2 (caller guarantees the partitions are disjoint).
    * Hungarian algorithm with potentials, O(n³); components after
    * blocking are small, so per-component cost is bounded. Non-edges get
    * weight 0 and are never emitted.
    */
  def maxWeightBipartite(edges: Seq[Edge]): Seq[Edge] = {
    val es = sorted(edges)
    val leftIds = es.map(_.id1).distinct.sorted
    val rightIds = es.map(_.id2).distinct.sorted
    val li = leftIds.zipWithIndex.toMap
    val ri = rightIds.zipWithIndex.toMap
    val n = leftIds.size
    val m = rightIds.size
    val w = Array.fill(n, m)(0.0)
    val has = Array.fill(n, m)(false)
    for (e <- es) {
      val i = li(e.id1); val j = ri(e.id2)
      if (!has(i)(j)) { w(i)(j) = e.score; has(i)(j) = true }
    }
    // Hungarian (max-weight, rectangular; pad implicit zeros). Standard
    // JV-style with row potentials over the left side.
    val size = math.max(n, m)
    def weight(i: Int, j: Int): Double =
      if (i < n && j < m) w(i)(j) else 0.0
    val u = Array.fill(size + 1)(0.0)
    val v = Array.fill(size + 1)(0.0)
    val p = Array.fill(size + 1)(0) // p(j) = row matched to column j (1-based)
    val way = Array.fill(size + 1)(0)
    for (i <- 1 to size) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(size + 1)(Double.MaxValue)
      val used = Array.fill(size + 1)(false)
      var continue = true
      while (continue) {
        used(j0) = true
        val i0 = p(j0)
        var delta = Double.MaxValue
        var j1 = 0
        for (j <- 1 to size if !used(j)) {
          // Minimize cost = -weight.
          val cur = -weight(i0 - 1, j - 1) - u(i0) - v(j)
          if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
          if (minv(j) < delta) { delta = minv(j); j1 = j }
        }
        for (j <- 0 to size) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
        }
        j0 = j1
        continue = p(j0) != 0
      }
      while (j0 != 0) {
        val j1 = way(j0)
        p(j0) = p(j1)
        j0 = j1
      }
    }
    val out = mutable.ArrayBuffer.empty[Edge]
    for (j <- 1 to size) {
      val i = p(j)
      if (i >= 1 && i <= n && j <= m && has(i - 1)(j - 1))
        out += Edge(leftIds(i - 1), rightIds(j - 1), w(i - 1)(j - 1))
    }
    out.sortBy(e => (e.id1, e.id2)).toSeq
  }

  /** Agglomerative clustering (hierarchical_clusterer.py:137): single /
    * complete / average linkage over the component's similarity matrix
    * (missing pairs = 0); merge the best pair while best ≥ minSimilarity.
    * Ties break on (minId of first cluster, minId of second). Returns
    * (member, cluster) with cluster = min member id.
    */
  def hierarchical(edges: Seq[Edge], linkage: String, minSimilarity: Double): Seq[(Long, Long)] = {
    val ids = (edges.map(_.id1) ++ edges.map(_.id2)).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.size
    val sim = Array.fill(n, n)(0.0)
    for (e <- edges) {
      val i = idx(e.id1); val j = idx(e.id2)
      sim(i)(j) = math.max(sim(i)(j), e.score)
      sim(j)(i) = sim(i)(j)
    }
    val clusters = mutable.Map.empty[Int, mutable.Set[Int]]
    for (i <- 0 until n) clusters(i) = mutable.Set(i)

    def link(a: mutable.Set[Int], b: mutable.Set[Int]): Double = {
      val sims = for (x <- a.toSeq; y <- b.toSeq) yield sim(x)(y)
      linkage match {
        case "single"   => sims.max
        case "complete" => sims.min
        case _          => sims.sum / sims.size
      }
    }

    var done = false
    while (!done && clusters.size > 1) {
      val keys = clusters.keys.toSeq.sorted
      var best = Double.NegativeInfinity
      var bp: (Int, Int) = (-1, -1)
      for (a <- keys; b <- keys if a < b) {
        val s = link(clusters(a), clusters(b))
        if (s > best) { best = s; bp = (a, b) }
      }
      if (best < minSimilarity) done = true
      else {
        clusters(bp._1) ++= clusters(bp._2)
        clusters -= bp._2
      }
    }
    clusters.values.toSeq.flatMap { members =>
      val mem = members.toSeq.map(ids)
      val label = mem.min
      mem.map(m => (m, label))
    }
  }
}
