package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingPipeline

/** Streaming exact dedup must keep one row per content key across
  * micro-batch boundaries (state store), and the min-id variant must equal
  * the batch `Dedup.exactSurvivors` keeper under id-ordered arrival.
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  // 3 distinct texts, each duplicated across BOTH micro-batches — the
  // cross-batch duplicate is the part only the state store can catch
  private val batch1 = Seq((0L, "alpha beta gamma"), (1L, "delta epsilon"),
    (2L, "alpha beta gamma"))
  private val batch2 = Seq((3L, "delta epsilon"), (4L, "zeta eta theta"),
    (5L, "alpha beta gamma"))

  test("built-in streaming dropDuplicates dedups across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData(batch1)
    stream.addData(batch2)
    val out = StreamingPipeline.streamingDedup(
      stream.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("dedup_stream").collect()
    assert(rows.length == 3) // one survivor per distinct text
    assert(rows.map(_.getAs[String]("dup_key")).distinct.length == 3)
  }

  test("min-id stateful variant equals batch exactSurvivors keepers") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData(batch1)
    stream.addData(batch2)
    val out = StreamingPipeline.streamingExactDedupMinId(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory")
      .queryName("dedup_minid_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedup_minid_stream").collect()
      .map(r => r.getAs[String]("dup_key") -> r.getAs[Long]("id")).toMap

    val batchDf = (batch1 ++ batch2).toDF("doc_id", "text")
    val batch = graft.dedup.Dedup.exactSurvivors(batchDf, "doc_id", "text")
      .select(md5(col("text").cast("binary")).as("dup_key"), col("doc_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      s"streamed $streamed\nbatch $batch")
  }
}
