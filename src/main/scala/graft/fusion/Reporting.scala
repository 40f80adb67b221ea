package graft.fusion

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FusionReport (reference fusion/reporting.py:35, group stats :94,
  * attribute stats :119, conflict analysis :171) — the post-fusion
  * report every PyDI fusion user prints, as ONE long-format frame
  * `(section, metric, attribute, value)` instead of a nested dict:
  *
  *   - section `group`: total/multi/singleton group counts, largest and
  *     average group size (reporting.py:96–110);
  *   - section `group_size_dist`: groups per size (:113);
  *   - section `conflict_pattern`: groups per distinct sorted source
  *     combination, multi-record groups only (:200–209);
  *   - section `attribute`: per-attribute fill rate over all source
  *     records, number of groups holding ≥2 distinct non-null values,
  *     and that count over total groups (:119, :161);
  *   - section `confidence`: voting-confidence bins (pd.cut bins
  *     (0,.2],(.2,.4],…,(.8,1] incl. lowest), resolved (≥0.5) vs
  *     unresolved counts, and mean confidence (:171–196).
  *
  * Scale shape: ONE groupBy(cluster) pass feeds every group-level
  * section (checkpointed — it is consumed four times); fill rates are
  * one agg over the raw frame; the confidence section reuses
  * [[Fusion.voting]] (one two-level agg). Post-agg row counts are
  * bounded by #attributes + #distinct sizes + #source combos + 5 bins —
  * never by the data. Mean confidence is an exact integer sum of
  * 1e-5-unit confidences (float SUM order is engine-dependent; integer
  * SUM is not), divided once at the end.
  */
object Reporting {

  private def row(section: String, metric: String, attribute: Column, value: Column): Column =
    struct(lit(section).as("section"), lit(metric).as("metric"),
      attribute.as("attribute"), value.cast("double").as("value"))

  def fusionReport(src: DataFrame, cluster: String, srcCol: String,
      attrs: Seq[String], confAttr: String): DataFrame = {
    // size(collect_set) == countDistinct for these bounded groups, but
    // stays a single-pass aggregation — k countDistincts would plan an
    // Expand that multiplies the input k+1 times before the shuffle
    val perAggs = Seq(
      count(lit(1)).as("_sz"),
      array_join(sort_array(collect_set(col(srcCol))), "+").as("_combo")) ++
      attrs.map(a => size(collect_set(col(a))).cast("long").as(s"_cd_$a"))
    val per = src.groupBy(col(cluster))
      .agg(perAggs.head, perAggs.tail: _*)
      .localCheckpoint(true)

    val gAggs = Seq(
      count(lit(1)).as("_tg"),
      sum((col("_sz") > 1).cast("long")).as("_multi"),
      sum((col("_sz") === 1).cast("long")).as("_single"),
      max(col("_sz")).as("_largest"),
      sum(col("_sz")).as("_sumsz")) ++
      attrs.map(a => sum((col(s"_cd_$a") >= 2).cast("long")).as(s"_ncf_$a"))
    val g = per.agg(gAggs.head, gAggs.tail: _*)

    val fAggs = count(lit(1)).as("_n") +: attrs.map(a => count(col(a)).as(s"_nn_$a"))
    val fills = src.agg(fAggs.head, fAggs.tail: _*)

    val scalarRows = Seq(
      row("group", "total_groups", lit(""), col("_tg")),
      row("group", "multi_record_groups", lit(""), col("_multi")),
      row("group", "singleton_groups", lit(""), col("_single")),
      row("group", "largest_group_size", lit(""), col("_largest")),
      row("group", "average_group_size", lit(""),
        col("_sumsz").cast("double") / col("_tg"))) ++
      attrs.flatMap { a =>
        Seq(
          row("attribute", "fill_rate", lit(a),
            col(s"_nn_$a").cast("double") / col("_n")),
          row("attribute", "n_conflict_groups", lit(a), col(s"_ncf_$a")),
          row("attribute", "conflict_rate", lit(a),
            col(s"_ncf_$a").cast("double") / col("_tg")))
      }
    val scalars = g.crossJoin(fills)
      .select(explode(array(scalarRows: _*)).as("_r"))
      .select(col("_r.section"), col("_r.metric"), col("_r.attribute"), col("_r.value"))

    val dist = per.groupBy(col("_sz")).agg(count(lit(1)).as("_ng"))
      .select(lit("group_size_dist").as("section"), lit("n_groups").as("metric"),
        col("_sz").cast("string").as("attribute"), col("_ng").cast("double").as("value"))

    val patterns = per.filter(col("_sz") > 1)
      .groupBy(col("_combo")).agg(count(lit(1)).as("_ng"))
      .select(lit("conflict_pattern").as("section"), lit("n_groups").as("metric"),
        col("_combo").as("attribute"), col("_ng").cast("double").as("value"))

    // confidence section over the voting resolution of `confAttr` —
    // ONE voting pass: the per-bin aggregate (≤5 rows, checkpointed)
    // feeds both the bin counts and the resolved/unresolved/mean
    // scalars, instead of re-running voting per consumer.
    val binned = Fusion.voting(src, cluster, confAttr)
      .select(col("confidence").as("_c"))
      .withColumn("_bin",
        when(col("_c") <= 0.2, "very_low")
          .when(col("_c") <= 0.4, "low")
          .when(col("_c") <= 0.6, "medium")
          .when(col("_c") <= 0.8, "high")
          .otherwise("very_high"))
      .groupBy(col("_bin")).agg(
        count(lit(1)).as("_ng"),
        sum((col("_c") >= 0.5).cast("long")).as("_res"),
        sum((col("_c") < 0.5).cast("long")).as("_unres"),
        sum(round(col("_c") * 100000).cast("long")).as("_csum"))
      .localCheckpoint(true)
    val confScalars = binned.agg(
        sum(col("_ng")).as("_n"), sum(col("_res")).as("_res"),
        sum(col("_unres")).as("_unres"), sum(col("_csum")).as("_csum"))
      .select(explode(array(
        row("confidence", "resolved_conflicts", lit(""), col("_res")),
        row("confidence", "unresolved_conflicts", lit(""), col("_unres")),
        row("confidence", "mean_confidence", lit(""),
          col("_csum").cast("double") / 100000.0 / col("_n")))).as("_r"))
      .select(col("_r.section"), col("_r.metric"), col("_r.attribute"), col("_r.value"))
    val bins = binned
      .select(lit("confidence").as("section"), lit("bin_count").as("metric"),
        col("_bin").as("attribute"), col("_ng").cast("double").as("value"))

    scalars.unionByName(dist).unionByName(patterns)
      .unionByName(confScalars).unionByName(bins)
  }

  /** `analyze_conflicts_preview` (reference fusion/analysis.py:270):
    * concrete conflicting values for the first `sampleSize` matched
    * pairs — unlike the statistical reports, this shows the ACTUAL
    * record pairs a user inspects before choosing fusion rules. One row
    * per (pair, attribute) whose stringified values differ (str(val)
    * comparison per the reference, trimmed, both non-null).
    *
    * Scale shape: the deterministic sample LIMIT happens before any
    * join, so both record joins run on ≤ sampleSize broadcast rows no
    * matter how large the correspondence set or the record frames are.
    */
  def conflictsPreview(corr: DataFrame, left: DataFrame, right: DataFrame,
      idCol: String, attrs: Seq[String], sampleSize: Int = 5): DataFrame = {
    val top = corr.orderBy(col("id1"), col("id2")).limit(sampleSize)
    val l = left.select(col(idCol).as("id1") +:
      attrs.map(a => col(a).cast("string").as(s"_l_$a")): _*)
    val r = right.select(col(idCol).as("id2") +:
      attrs.map(a => col(a).cast("string").as(s"_r_$a")): _*)
    val rows = attrs.map(a => struct(lit(a).as("attribute"),
      col(s"_l_$a").as("value1"), col(s"_r_$a").as("value2")))
    top.join(l, "id1").join(r, "id2")
      .select(col("id1"), col("id2"), col("score"), explode(array(rows: _*)).as("_c"))
      .select(col("id1"), col("id2"), col("score"),
        col("_c.attribute").as("attribute"),
        col("_c.value1").as("value1"), col("_c.value2").as("value2"))
      .filter(col("value1").isNotNull && col("value2").isNotNull &&
        trim(col("value1")) =!= trim(col("value2")))
  }
}
