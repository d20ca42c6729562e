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

/** flatMapGroupsWithState: cumulative per-domain keep stats across
  * micro-batches (state survives batch boundaries).
  */
class StreamingStateSpec extends SparkTestBase {
  import graft.fixtures.SynthCorpus
  import graft.model.WebDoc
  import graft.streaming.StreamingPipeline

  test("per-domain running stats accumulate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 80L).map(SynthCorpus.docFor)
    val stream = MemoryStream[WebDoc]
    val scored = StreamingPipeline.score(stream.toDF(), spark)
    val updates = StreamingPipeline.domainRunningStats(scored)
    val q = updates.writeStream.format("memory")
      .queryName("domain_state_stream").outputMode("append").start()
    try {
      stream.addData(docs.take(40)); q.processAllAvailable()
      stream.addData(docs.drop(40)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("domain_state_stream").collect()
    assert(rows.nonEmpty)
    // final cumulative totals across domains must equal the doc count
    val lastPerDomain = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getLong(1)).max }
    assert(lastPerDomain.sum == 80L, s"got ${lastPerDomain.sum}")
    // keep_rate always within [0,1]
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }
}

/** The derive/builder batteries are narrow plans — they must run on a
  * stream and reproduce the batch rows exactly.
  */
class StreamingDeriveSpec extends SparkTestBase {
  import spark.implicits._
  import graft.fixtures.SynthCorpus
  import graft.model.WebDoc
  import graft.streaming.StreamingPipeline
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("streaming training examples and v3 benchmark items equal batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 150L).map(SynthCorpus.docFor)
    val stream = MemoryStream[WebDoc]
    stream.addData(docs.take(70))
    stream.addData(docs.drop(70))

    val scoredStream = StreamingPipeline.score(stream.toDF(), spark)
    val q1 = StreamingPipeline.trainingExamplesStream(scoredStream)
      .select("id", "example_type", "difficulty", "quality_score")
      .writeStream.format("memory").queryName("train_stream")
      .outputMode("append").start()
    val q2 = StreamingPipeline.benchmarkItemsV3Stream(scoredStream)
      .select("problem_id", "type", "difficulty")
      .writeStream.format("memory").queryName("bench_stream")
      .outputMode("append").start()
    try { q1.processAllAvailable(); q2.processAllAvailable() }
    finally { q1.stop(); q2.stop() }

    val scoredBatch = Pipeline.score(docs.toDF(), spark)
    val trainBatch = StreamingPipeline.trainingExamplesStream(scoredBatch)
      .select("id", "example_type", "difficulty", "quality_score")
      .collect().map(_.toSeq).toSet
    val trainStreamed = spark.table("train_stream").collect().map(_.toSeq).toSet
    assert(trainStreamed.nonEmpty && trainStreamed == trainBatch)

    val benchBatch = StreamingPipeline.benchmarkItemsV3Stream(scoredBatch)
      .select("problem_id", "type", "difficulty")
      .collect().map(_.toSeq).toSet
    val benchStreamed = spark.table("bench_stream").collect().map(_.toSeq).toSet
    assert(benchStreamed.nonEmpty && benchStreamed == benchBatch)
  }

  test("streaming gopher stats equal batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 120L).map(SynthCorpus.docFor)
    val stream = MemoryStream[WebDoc]
    stream.addData(docs.take(50))
    stream.addData(docs.drop(50))
    val scoredStream = StreamingPipeline.score(stream.toDF(), spark)
    val q = StreamingPipeline.gopherStatsStream(scoredStream)
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val batch = StreamingPipeline.gopherStatsStream(
      Pipeline.score(docs.toDF(), spark)).collect().map(_.toSeq).toSet
    val streamed = spark.table("gopher_stream").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming RL and UG training builders equal batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 150L).map(SynthCorpus.docFor)
    val stream = MemoryStream[WebDoc]
    stream.addData(docs.take(70))
    stream.addData(docs.drop(70))

    val scoredStream = StreamingPipeline.score(stream.toDF(), spark)
    val faces = Seq(
      ("rl_v2_stream", StreamingPipeline.rlTrainingExamplesStream(scoredStream)
        .select("id", "example_type", "step_count", "difficulty")),
      ("rl_v3_stream", StreamingPipeline.rlTrainingExamplesV3Stream(scoredStream)
        .select("id", "example_type", "difficulty")),
      ("ug_stream", StreamingPipeline.ugTrainingExamplesStream(scoredStream)
        .select("id", "example_type", "step_count", "difficulty", "topic")))
    val queries = faces.map { case (name, df) =>
      df.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    }
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())

    val scoredBatch = Pipeline.score(docs.toDF(), spark)
    val batch = Seq(
      StreamingPipeline.rlTrainingExamplesStream(scoredBatch)
        .select("id", "example_type", "step_count", "difficulty"),
      StreamingPipeline.rlTrainingExamplesV3Stream(scoredBatch)
        .select("id", "example_type", "difficulty"),
      StreamingPipeline.ugTrainingExamplesStream(scoredBatch)
        .select("id", "example_type", "step_count", "difficulty", "topic"))
    faces.map(_._1).zip(batch).foreach { case (name, b) =>
      val streamed = spark.table(name).collect().map(_.toSeq).toSet
      val expected = b.collect().map(_.toSeq).toSet
      assert(streamed == expected, s"$name != batch")
      assert(streamed.nonEmpty, s"$name produced no rows")
    }
  }
}
