package graft.blocking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed blockers for entity matching — the Spark re-expression of
  * PyDI/entitymatching/blocking/{standard,token_blocking,sorted_neighbourhood,
  * noblocking}.py. All emit a candidate-pair DataFrame `(id1, id2)` with the
  * left dataset's id in `id1` (reference CandidateBatch contract,
  * blocking/base.py).
  *
  * Scale notes (100 TB): every blocker here is a single equi-join shuffle on
  * its block key — never an all-pairs comparison. The only O(n²) op is
  * [[cross]], which mirrors the reference NoBlocker and is only valid for
  * small×small inputs (used with a broadcast side).
  */
object Blockers {

  /** Standard (equality) blocking on one or more key columns
    * (standard.py:17). The reference builds the key by casting each column
    * to string, lowercasing, and joining with "||" (standard.py:84-95);
    * nulls stringify to "nan" in pandas — we mirror that token so null keys
    * block together identically.
    */
  def blockKey(on: Seq[String]): Column =
    lower(concat_ws("||", on.map(c => coalesce(col(c).cast("string"), lit("nan"))): _*))

  def standard(left: DataFrame, right: DataFrame, on: Seq[String], idCol: String): DataFrame = {
    val l = left.select(col(idCol).as("id1"), blockKey(on).as("_bk"))
    val r = right.select(col(idCol).as("id2"), blockKey(on).as("_bk"))
    // Plain equi-join: Catalyst picks broadcast vs shuffle by stats; at
    // scale this is one shuffle on the block key, AQE splits skewed keys.
    l.join(r, "_bk").select("id1", "id2")
  }

  /** Pair-count estimate for standard blocking without materializing pairs
    * (standard.py:74 estimate_pairs): Σ_key |L_key|·|R_key|.
    */
  def estimateStandardPairs(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame = {
    val lc = left.groupBy(blockKey(on).as("_bk")).agg(count(lit(1)).as("nl"))
    val rc = right.groupBy(blockKey(on).as("_bk")).agg(count(lit(1)).as("nr"))
    lc.join(rc, "_bk").agg(coalesce(sum(col("nl") * col("nr")), lit(0L)).as("est_pairs"))
  }

  /** Pair-count estimate for token blocking (token_blocking.py
    * estimate_pairs shape): Σ_token |L_tok|·|R_tok| over surviving
    * tokens — an upper bound (before the cross-token pair dedup).
    */
  def estimateTokenPairs(left: DataFrame, right: DataFrame, column: String,
      minTokenLen: Int = 2): DataFrame = {
    val lc = left.select(explode(tokens(col(column), minTokenLen)).as("_tok"))
      .groupBy("_tok").agg(count(lit(1)).as("nl"))
    val rc = right.select(explode(tokens(col(column), minTokenLen)).as("_tok"))
      .groupBy("_tok").agg(count(lit(1)).as("nr"))
    lc.join(rc, "_tok").agg(coalesce(sum(col("nl") * col("nr")), lit(0L)).as("est_pairs"))
  }

  /** Skew-safe variant of [[standard]]: when a handful of block keys
    * hold most rows (the classic hot-key shuffle straggler), salt the
    * left side deterministically by id hash into `salt` sub-keys and
    * replicate the right side across all of them. Output is identical
    * to [[standard]]; the shuffle spreads each hot key over `salt`
    * reducers at the cost of a `salt`× right-side replication — use for
    * hot keys with a small right side, or rely on AQE skew-split when
    * both sides are large.
    */
  def standardSalted(left: DataFrame, right: DataFrame, on: Seq[String], idCol: String,
      salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val l = left.select(col(idCol).as("id1"), blockKey(on).as("_bk"))
      .withColumn("_salt", pmod(xxhash64(col("id1")), lit(salt.toLong)).cast("int"))
    val r = right.select(col(idCol).as("id2"), blockKey(on).as("_bk"))
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq("_bk", "_salt")).select("id1", "id2")
  }

  /** Default tokenizer of token_blocking.py:120-141: lowercase, split into
    * maximal alphanumeric runs, keep tokens with length ≥ minTokenLen,
    * distinct. Returns an array<string> column.
    */
  def tokens(c: Column, minTokenLen: Int = 2): Column =
    array_distinct(filter(
      split(lower(c.cast("string")), "[^a-z0-9]+"),
      t => length(t) >= minTokenLen))

  /** Token blocking (token_blocking.py:17): candidates share ≥1 token.
    * `maxPairsPerToken`: tokens whose block would exceed this many pairs
    * (|L_tok|·|R_tok|) are pruned — the standard high-document-frequency
    * guard that keeps a stop-word token from producing a quadratic block
    * at scale. The reference generates all blocks (single node, small
    * data); pass None to match it exactly.
    */
  def token(
      left: DataFrame,
      right: DataFrame,
      column: String,
      idCol: String,
      minTokenLen: Int = 2,
      maxPairsPerToken: Option[Long] = None): DataFrame = {
    val l = left
      .select(col(idCol).as("id1"), explode(tokens(col(column), minTokenLen)).as("_tok"))
    val r = right
      .select(col(idCol).as("id2"), explode(tokens(col(column), minTokenLen)).as("_tok"))
    val (lf, rf) = maxPairsPerToken match {
      case None => (l, r)
      case Some(cap) =>
        // Document frequency per side, one shuffle each (tiny result —
        // one row per distinct token); the kept-token set broadcasts.
        val lc = l.groupBy("_tok").agg(count(lit(1)).as("nl"))
        val rc = r.groupBy("_tok").agg(count(lit(1)).as("nr"))
        val keep = lc.join(rc, "_tok")
          .filter(col("nl") * col("nr") <= cap)
          .select("_tok")
        (l.join(broadcast(keep), "_tok"), r.join(broadcast(keep), "_tok"))
    }
    lf.join(rf, "_tok").select("id1", "id2").distinct()
  }

  /** Sorted-neighbourhood blocking (sorted_neighbourhood.py:17): both
    * datasets are merged into one ordering by `key` (lowercased when
    * string) and every cross-dataset pair within a sliding window of
    * `window` positions becomes a candidate. Ties in the sort key are
    * broken by (side, id) — a deterministic total order (the reference
    * relies on pandas' stable mergesort over concat order, which is the
    * same left-before-right rule).
    *
    * Scale: global sort (range partition) + zipWithIndex for a consecutive
    * rank, then the window is an explode of ≤ `window` offsets + one
    * equi-join on rank — O(n·w) rows, no range join, no single-task window.
    */
  def sortedNeighbourhood(
      left: DataFrame,
      right: DataFrame,
      key: String,
      idCol: String,
      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = left.sparkSession
    import spark.implicits._
    val sortKey = lower(col(key).cast("string"))
    val l = left.select(col(idCol).cast("long").as("id"), sortKey.as("k")).withColumn("side", lit(0))
    val r = right.select(col(idCol).cast("long").as("id"), sortKey.as("k")).withColumn("side", lit(1))
    val ordered = l.unionByName(r).orderBy("k", "side", "id")
    // zipWithIndex preserves the sort order and is fully distributed —
    // unlike row_number over an unpartitioned window (single task).
    val ranked = ordered.select("id", "side").rdd
      .zipWithIndex
      .map { case (row, rn) => (row.getLong(0), row.getInt(1), rn) }
      .toDF("id", "side", "rn")
    val a = ranked.select(col("id").as("ida"), col("side").as("sa"), col("rn").as("rna"))
      .withColumn("off", explode(sequence(lit(1), lit(window))))
      .withColumn("rnb", col("rna") + col("off"))
    val b = ranked.select(col("id").as("idb"), col("side").as("sb"), col("rn").as("rnb"))
    a.join(b, "rnb")
      .filter(col("sa") =!= col("sb"))
      .select(
        when(col("sa") === 0, col("ida")).otherwise(col("idb")).as("id1"),
        when(col("sa") === 0, col("idb")).otherwise(col("ida")).as("id2"))
  }

  /** Full Cartesian product (noblocking.py:15). Only valid small×small —
    * the caller is expected to know both sides are bounded; at scale this
    * is a broadcast nested-loop join by construction.
    */
  def cross(left: DataFrame, right: DataFrame, idCol: String): DataFrame =
    left.select(col(idCol).as("id1"))
      .crossJoin(right.select(col(idCol).as("id2")))

  /** Deterministic canopy clustering (McCallum–Nigam–Ungar, KDD 2000) as
    * a cheap pre-blocker — the classic two-threshold scheme with the
    * randomness removed so it can be oracle-replayed: within each group
    * (a cheap partition key, e.g. the standard blocking key — group
    * sizes are the caller's contract, exactly as for the per-component
    * clustering kernels), centers are picked in ASCENDING ID ORDER from
    * the pool; each center's canopy is every group member with cheap
    * similarity ≥ t1 (loose — membership is evaluated over ALL members,
    * so a record can sit in several canopies, the property that makes
    * canopies a valid pre-blocker), and members at ≥ t2 (tight, t2 ≥ t1
    * in similarity space) leave the POOL (never become centers; the
    * center itself leaves at sim 1000).
    *
    * Cheap similarity: token-set Jaccard over lowercased alphanumeric
    * runs, in EXACT integer milli (inter·1000 div union; both-empty →
    * 1000) — threshold compares and the emitted sim are integer laws
    * shared bit-for-bit with the DuckDB oracle.
    *
    * Scale: one shuffle on the group key; per group O(centers·members)
    * integer set intersections in a single task — the same bounded-
    * group contract every sequential kernel in this library uses. The
    * canopy frame then feeds pair generation as a self-join on the
    * canopy id (pairs sharing a canopy), never an all-pairs compare.
    * Output: (canopy, id, sim_milli), one row per membership.
    */
  def canopy(records: DataFrame, groupCols: Seq[String], idCol: String,
      textCol: String, t1Milli: Long, t2Milli: Long): DataFrame = {
    require(t2Milli >= t1Milli, "t2 (tight) must be >= t1 (loose) in similarity space")
    val spark = records.sparkSession
    import spark.implicits._
    val prepped = records.select(
      concat_ws("||", groupCols.map(c => coalesce(col(c).cast("string"), lit("nan"))): _*).as("_g"),
      col(idCol).cast("long").as("_id"),
      coalesce(lower(col(textCol).cast("string")), lit("")).as("_t"))
    prepped.as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.map { case (_, id, t) =>
          (id, t.split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSet)
        }.toArray.sortBy(_._1)
        val n = members.length
        val removed = new java.util.HashSet[java.lang.Long]()
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var i = 0
        while (i < n) {
          val (cid, ctoks) = members(i)
          if (!removed.contains(cid)) {
            var j = 0
            while (j < n) {
              val (mid, mtoks) = members(j)
              val inter = ctoks.count(mtoks.contains)
              val union = ctoks.size + mtoks.size - inter
              val sim = if (union == 0) 1000L else inter.toLong * 1000L / union
              if (sim >= t1Milli) out += ((cid, mid, sim))
              if (sim >= t2Milli) removed.add(mid)
              j += 1
            }
          }
          i += 1
        }
        out
      }
      .toDF("canopy", "id", "sim_milli")
  }

  /** Blocking evaluation (evaluation.py:104 evaluate_blocking): pair
    * completeness (blocking recall), pair quality (blocking precision) and
    * reduction ratio vs the full cross product. One metrics row.
    */
  /** Grid-bucketed nearest-neighbour GEO blocker — the spatial member
    * of the family (reference anchor: CoordinateParser,
    * normalization/rules.py — PyDI parses coordinates; matching on
    * them at scale needs a blocker that never goes all-pairs).
    * Coordinates are exact integer micro-degrees; each probe is
    * hashed to its `cell`-width grid cell and exploded to the 3×3
    * neighbourhood (probe side ×9, index side stays 1× — the LSH
    * banding asymmetry), candidates meet in ONE equi-join on
    * (cellX, cellY), and the nearest index record per probe is the
    * lexicographic min of (squared distance, sid) — all-long
    * arithmetic, engine-identical. A probe whose 3×3 window is empty
    * is dropped (blocker contract: candidates only; widen `cell` for
    * sparser indexes). Skew is bounded by cell occupancy, the
    * explicit tuning knob.
    *
    * `probes` must have (id, lat, lon); `index` (sid, lat, lon).
    */
  def geoNearest(probes: DataFrame, index: DataFrame, cell: Long): DataFrame = {
    val offs = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val l = probes
      .withColumn("_o", explode(array(offs: _*)))
      .select(col("id"), col("lat"), col("lon"),
        (expr(s"lat div $cell") + col("_o.dx")).as("_cx"),
        (expr(s"lon div $cell") + col("_o.dy")).as("_cy"))
    val r = index.select(col("sid"), col("lat").as("_rlat"), col("lon").as("_rlon"))
      .withColumn("_rcx", expr(s"_rlat div $cell"))
      .withColumn("_rcy", expr(s"_rlon div $cell"))
    l.join(r, l("_cx") === r("_rcx") && l("_cy") === r("_rcy"))
      .withColumn("_d",
        (col("lat") - col("_rlat")) * (col("lat") - col("_rlat")) +
          (col("lon") - col("_rlon")) * (col("lon") - col("_rlon")))
      .groupBy(col("id"))
      .agg(min(struct(col("_d").as("dist_sq"), col("sid"))).as("_m"))
      .select(col("id"), col("_m.sid").as("sid"), col("_m.dist_sq").as("dist_sq"))
  }

  def evaluate(candidates: DataFrame, gold: DataFrame, totalPossiblePairs: Long): DataFrame = {
    val cand = candidates.select("id1", "id2").distinct()
    val g = gold.select("id1", "id2").distinct()
    val candN = cand.agg(count(lit(1)).as("total_candidates"))
    val goldN = g.agg(count(lit(1)).as("total_true_pairs"))
    val tpN = cand.join(g, Seq("id1", "id2")).agg(count(lit(1)).as("true_positives_found"))
    candN.crossJoin(goldN).crossJoin(tpN)
      .select(
        round(col("true_positives_found") / greatest(col("total_true_pairs"), lit(1L)), 5)
          .as("pair_completeness"),
        round(col("true_positives_found") / greatest(col("total_candidates"), lit(1L)), 5)
          .as("pair_quality"),
        round(lit(1.0) - col("total_candidates") / lit(totalPossiblePairs.toDouble), 5)
          .as("reduction_ratio"),
        col("total_candidates"),
        lit(totalPossiblePairs).as("total_possible_pairs"),
        col("true_positives_found"),
        col("total_true_pairs"))
  }
}
