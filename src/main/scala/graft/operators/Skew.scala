package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual fallback when AQE's
  * skew-join splitting can't apply (non-sort-merge plans, skewed
  * aggregations, or a hot key known AHEAD of time from `profile_topk`
  * / `profile_cms_topk`, which is exactly what those sketches are for).
  *
  * The law that makes salting safe is replication × spreading: the
  * small side is replicated once per salt value, the big side computes
  * a DETERMINISTIC salt from row identity, and the join key becomes
  * (key, salt) — every big-side row still meets exactly one replica of
  * its key's dim row, so the salted join is row-for-row the unsalted
  * join, while the hot key's rows now land in `s` shuffle partitions
  * instead of one. Cost: the dim shuffle grows ×s — pick s ≈ (hot-key
  * rows / healthy-partition rows), not "big".
  */
object Skew {

  /** Salted equi-join: `big ⋈ dim` on `key`, with the big side spread
    * across `s` salt buckets by a hash of `spread` (a row-identity
    * column set — NOT the join key, whose skew is the problem).
    * `merge` hint: the point is to fix the sort-merge shuffle; letting
    * the tiny test dim broadcast would hide the demonstrated plan (at
    * scale a dim too big to broadcast is the reason salting exists).
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, s: Int,
      spread: Column): DataFrame = {
    val dimX = dim.withColumn("_salt",
      explode(array((0 until s).map(i => lit(i.toLong)): _*)))
    val bigX = big.withColumn("_salt", pmod(xxhash64(spread), lit(s.toLong)))
    bigX.hint("merge").join(dimX, Seq(key, "_salt")).drop("_salt")
  }
}
