package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Test-table access + oracle-determinism helpers shared by queries. */
object Tables {
  /** Plain parquet read — session conf (naive-timestamp inference,
    * nanos-as-long) is owned by [[Sessions.tune]], applied once at every
    * entry path; readers themselves never mutate conf.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), read as long (see
    * [[Sessions.tune]]) and converted to a micros timestamp here
    * (truncation — matches DuckDB's ns→us read). Guarded on the actual
    * inferred dtype so the helper works on any session conf.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // integer division — `/` would go through DOUBLE and lose µs
      // precision on epoch-nano magnitudes (~1.7e18 ≫ 2^53)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  /** documents is read PLAIN. r13 put spread() here at the shared
    * reader and the driver bench showed it is the wrong altitude: the
    * exchange won 3-5× on ~8 per-row-heavy consumers but taxed ~35
    * cheap consumers 2-4× each (text family 38.8→53.5 s, profile +47%,
    * io +37%, pipeline +91%) — the exact multi-consumer pathology the
    * r13 fuse/norm revert (1a899a8) measured. The reader cannot know
    * the consumer's per-row cost; the call site can. Heavy consumers
    * opt in via [[documentsSpread]].
    */
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  /** documents + [[spread]], for call sites whose per-row work is
    * expensive enough to amortize one round-robin exchange of the
    * corpus (shingling / minhash-banding / per-position fingerprints /
    * language-profile scans). Opt-in at the consumer — guide §2.5
    * (repair input skew right before the heavy compute) combined with
    * §2.1 (don't add an exchange light work can't amortize).
    */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    spread(t(s, d, "documents"))
  // embeddings stays UNSPREAD (r13 measured-and-rejected): the ann
  // consumers are either already sub-second or dominated by seeded
  // k-means fits, where 32-way scheduling over a 2000-vector corpus
  // measured ann_pq_fit 7.4 → 11.1 s — and fit-input partitioning must
  // stay fixed anyway so the certified float-iterative codebooks do
  // not drift.
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Repair an under-parallelized scan (optimization guide §2.5, "input
    * skew: one huge unsplittable file"). The corpus fixtures are
    * SINGLE-ROW-GROUP parquet files: no split configuration can
    * parallelize them, so every per-row-expensive projection pinned
    * above the scan (shingling, per-position md5 fingerprints, minhash
    * families, 64-dim vector kernels) runs in ONE task while the other
    * cores idle — and the scan stage cannot scale with
    * SPARK_GRAFT_CPUS at all. When the planned scan parallelism is
    * below the session default, spread the rows round-robin BEFORE the
    * heavy compute; one exchange of the (small, corpus-bounded) input
    * buys a full-width compute stage. On a production layout — many
    * files / many row groups, scan splits ≥ cores — the gate never
    * fires and the plan is untouched, so this is scale-adaptive, not a
    * local-mode constant.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Money column → exact integer cents (BIGINT). Summing cents is
    * exact and order-independent, unlike summing doubles — the oracle
    * (DuckDB) does the identical transform, so aggregates hash-match
    * bit-for-bit at any scale factor.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact integer sum of cents back to a deterministic double. */
  def centsToDouble(sumCents: Column): Column = sumCents.cast("double") / 100.0

  /** Round a double for output comparison (used only where the value
    * is already deterministic; magnitude-sensitive sums go via cents).
    */
  def r5(c: Column): Column = round(c, 5)
}
