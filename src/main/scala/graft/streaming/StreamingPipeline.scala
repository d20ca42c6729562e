package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming face of the quality filter.
  *
  * The reference has no streaming (SURVEY.md §2.9) and the batch pipeline is
  * the primary path; this module exists because every transformation in
  * graft.Pipeline is NARROW (project/filter/mapPartitions — no global sort,
  * no cross-row state), so the identical plan runs unchanged on an unbounded
  * `readStream` source. That property is itself worth a test: streaming
  * micro-batches must produce byte-for-byte the batch pipeline's labels.
  *
  * Also provided: watermarked per-window keep-rate aggregation (the
  * monitoring stream a production filter runs next to the main sink).
  */
object StreamingPipeline {

  /** Apply the full scoring pipeline to a streaming docs_raw DataFrame.
    * Works on any streaming source with the input_hint schema
    * (url, warc_ts, html binary, ...).
    */
  def score(streamingDocs: DataFrame, spark: SparkSession): DataFrame =
    graft.Pipeline.score(streamingDocs, spark)

  /** Windowed keep-rate monitoring: 1-minute tumbling windows on warc_ts
    * with a 2-minute watermark — late crawl records beyond the watermark are
    * dropped, state is bounded (north-star driver-light requirement).
    */
  def keepRateByWindow(scored: DataFrame): DataFrame =
    scored
      .withWatermark("warc_ts", "2 minutes")
      .groupBy(window(col("warc_ts"), "1 minute"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        avg(col("overall_score")).as("avg_score"))

  /** Sink helper: parquet append with checkpointing — the streaming analog
    * of the batch manifest (exactly-once via the stream checkpoint).
    */
  def toParquetSink(scored: DataFrame, path: String,
                    checkpoint: String): DataStreamWriter[Row] =
    scored.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
}
