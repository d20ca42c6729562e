package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.fixtures.SynthCorpus
import graft.model.WebDoc
import graft.streaming.StreamingPipeline

/** The streaming pipeline must equal the batch pipeline per url — the
  * narrow-transformations-only property made observable.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming micro-batches reproduce batch labels byte-for-byte") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 120L).map(SynthCorpus.docFor)
    val stream = MemoryStream[WebDoc]
    stream.addData(docs.take(50))
    stream.addData(docs.drop(50))

    val scored = StreamingPipeline.score(stream.toDF(), spark)
      .select("url", "lang", "overall_score", "keep")
    val q = scored.writeStream.format("memory")
      .queryName("scored_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("scored_stream").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2), r.getBoolean(3))).toMap
    val batch = Pipeline.score(docs.toDF(), spark)
      .select("url", "lang", "overall_score", "keep").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(streamed.size == 120)
    assert(streamed == batch)
  }

  test("watermarked window aggregation is streamable (append mode runs)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[WebDoc]
    stream.addData((0L until 40L).map(SynthCorpus.docFor))
    val agg = StreamingPipeline.keepRateByWindow(
      StreamingPipeline.score(stream.toDF(), spark))
    val q = agg.writeStream.format("memory")
      .queryName("keeprate_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // append mode only emits closed windows — with no watermark-advancing
    // later data the table may be empty; the assertion is that the plan is
    // a VALID streaming plan (unboundedness + watermark accepted) and runs.
    assert(spark.table("keeprate_stream").schema.fieldNames.contains("n_docs"))
  }
}
