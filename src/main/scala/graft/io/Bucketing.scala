package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the co-located-join path for pipelines that
  * JOIN ON THE SAME KEY ROUND AFTER ROUND (entity matching re-runs,
  * incremental fusion, candidate re-scoring).
  *
  * A 100 TB fact table shuffled on every pipeline run is the single
  * largest avoidable cost in a recurring integration job. Writing it
  * ONCE bucketed (and sorted) by the join key makes every subsequent
  * equi-join on that key exchange-free: Spark's bucketing rule proves
  * both sides hash-partitioned the same way at WRITE time, so the join
  * compiles to a zero-shuffle (and with sortBy, zero-sort) SortMergeJoin.
  *
  * Verified in BucketingSpec: the joined plan contains no
  * ShuffleExchangeExec, and results equal the unbucketed join.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) parquet table
    * registered in the session catalog. Bucket count is a real tuning
    * choice at scale: one bucket ≈ one task's worth of the biggest
    * expected join (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket —
    * split further by files within a bucket).
    */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** [[saveBucketed]] with an EXPLICIT external path (an entry-path
    * query must not write into the caller session's default warehouse
    * directory — the driver's cwd is not ours to fill). `repartition(1)`
    * first: one task → exactly one file per bucket, the layout whose
    * per-bucket read is a single sorted run.
    */
  def saveBucketedAt(df: DataFrame, table: String, key: String, buckets: Int,
      path: String): Unit =
    df.repartition(1)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** The two bucketed tables joined on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
