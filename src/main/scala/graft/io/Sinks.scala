package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output side of the IO surface: partitioned / bucketed parquet and
  * csv/json writers. At 100 TB the two knobs that matter are
  * partitionBy (partition pruning for downstream readers) and bucketBy
  * (co-located, shuffle-free joins on the bucket key for repeated
  * consumers) — both are declarative here.
  */
object Sinks {

  /** Hive-style partitioned parquet: downstream filters on the
    * partition columns prune whole directories.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed table (requires saveAsTable — bucket metadata lives in the
    * catalog): equi-joins on `bucketCols` between tables bucketed the
    * same way skip the shuffle entirely.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
