package graft

import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery semantics: streaming state must survive a
  * stop/restart cycle — the mechanism behind every production claim
  * this library makes about streaming exactly-once. A restarted query
  * resumes from the offsets+state in the checkpoint dir: batches
  * committed before the stop are not replayed, and dedup state seen
  * before the stop still suppresses duplicates after it.
  */
class CheckpointRecoverySpec extends AnyFunSuite {
  import TestSpark._

  test("dedup state survives stop/restart from checkpoint (no replay, no re-emit)") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqc: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("k", "v")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_recovery").toString

    // the memory sink refuses checkpoint recovery by design; foreachBatch
    // is the restartable sink, so each phase drains into its own buffer
    def start(buf: scala.collection.mutable.ArrayBuffer[Long]) =
      src.dropDuplicates("k")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val ks = df.collect().map(_.getLong(0))
          buf.synchronized { buf ++= ks }; ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // phase 1: two keys (plus an in-batch dup), then a clean stop
    val p1 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q1 = start(p1)
    try {
      mem.addData((1L, "a"), (2L, "b"), (1L, "dup-in-batch"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(p1.sorted.toSeq == Seq(1L, 2L))

    // phase 2: RESTART from the same checkpoint — committed batches are
    // not replayed into the new sink, and key 2's duplicate is
    // suppressed by the RECOVERED dedup state
    val p2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = start(p2)
    try {
      mem.addData((2L, "post-restart dup"), (3L, "c"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(p2.toSeq == Seq(3L), s"phase-2 emitted: $p2")
  }
}
