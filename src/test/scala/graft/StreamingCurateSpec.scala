package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.curate.Curate
import graft.streaming.StreamingPipeline

/** The streaming curation face: gopher + exact-dedup + scrub must equal
  * the batch chain's corresponding stages across micro-batch boundaries
  * (those stages have exact streaming semantics); the SimHash near-dup
  * stage must drop fingerprint-identical re-phrasings.
  */
class StreamingCurateSpec extends SparkTestBase {
  import spark.implicits._

  private def prose(seed: Int): String = {
    val vocab = Seq("the", "stream", "keeps", "state", "for", "every",
      "content", "key", "and", "emits", "only", "first", "arrivals",
      "with", "clean", "text")
    val rnd = new scala.util.Random(seed)
    Seq.fill(30)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }

  // batch 1: two keepers + a gopher reject; batch 2: a cross-batch exact
  // dup of doc 1 and a fresh keeper with PII; batch 3: a cross-batch
  // exact dup of doc 5 (kept in separate batches: WITHIN a micro-batch
  // dropDuplicates picks an arbitrary row, across batches first-arrival
  // is deterministic)
  private val b1 = Seq((1L, prose(1)), (2L, prose(2)), (3L, "too short"))
  private val b2 = Seq((4L, prose(1)), (5L, prose(3) + " mail a@b.co now"))
  private val b3 = Seq((6L, prose(3) + " mail a@b.co now"))

  test("streaming chain ≡ batch gopher+exact+scrub across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // near-dup stage off: compare the exactly-streamable stages
    val out = StreamingPipeline.curateStream(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      simhashNearDup = false)
    val q = out.writeStream.format("memory")
      .queryName("curate_stream").outputMode("append").start()
    // sequential micro-batches: first-arrival semantics need b1 fully
    // processed before b2 arrives (one combined batch would make the
    // within-batch dropDuplicates pick arbitrary)
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      stream.addData(b3); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("curate_stream").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("scrubbed")).toMap

    // id-ordered arrival → first-arrival survivor = batch min-id keeper,
    // so the streamed set must equal the batch chain's kept+near_dup rows
    // (near-dup losers are NOT dropped with the stage off)
    val batchDf = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val log = Curate.curationLog(batchDf, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val wantIds = log.collect {
      case (id, s, _) if s == Curate.StageKept || s == Curate.StageNearDup => id
    }.toSet
    assert(streamed.keySet == wantIds, s"streamed=${streamed.keySet} want=$wantIds")
    // scrub parity on the rows both sides kept
    log.foreach { case (id, s, scrubbed) =>
      if (s == Curate.StageKept) assert(streamed(id) == scrubbed)
    }
    assert(streamed(5L).contains("<EMAIL>"))
  }

  test("SimHash near-dup stage drops fingerprint-identical docs across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // same text in both batches is ALSO an exact dup — so plant a
    // fingerprint collision that is not byte-identical: SimHash is
    // computed over token features, so doubled whitespace changes bytes
    // but not tokens
    val out = StreamingPipeline.curateStream(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory")
      .queryName("curate_stream_sim").outputMode("append").start()
    try {
      stream.addData(Seq((1L, prose(7)))); q.processAllAvailable()
      stream.addData(Seq((2L, prose(7).replace(" ", "  ")))); q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("curate_stream_sim").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(1L), s"doc 2 shares doc 1's SimHash and must drop: $ids")
  }
}
