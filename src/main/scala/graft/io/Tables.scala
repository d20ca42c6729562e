package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** TableFormat seam (SURVEY.md §1.4): the engine targets Iceberg tables per
  * north_rule, but no Iceberg runtime jar exists in the sandbox's offline
  * repos (verified), so the default implementation is partitioned Parquet
  * whose visibility protocol emulates Iceberg snapshots via the Manifest
  * module (commit = atomic manifest append; readers see only committed
  * buckets). The call surface is `spark.read.table`-shaped so a real
  * Iceberg catalog slots in by swapping this object's two methods.
  */
object Tables {

  /** Table names from SURVEY.md §1.4. */
  val DocsRaw = "docs_raw"
  val DocsScored = "docs_scored"
  val BenchmarkItems = "benchmark_items"
  val TrainingExamples = "training_examples"
  val RunManifest = "run_manifest"

  /** Root directory standing in for the warehouse/catalog. */
  def path(warehouse: String, table: String): String = s"$warehouse/$table"

  /** Write a table partitioned by url-hash bucket (the north_star layout:
    * `repartition(pmod(xxhash64(url), N))`). `numBuckets` sizes partitions —
    * pick so that bucket_bytes ≈ input_bytes / numBuckets stays well under
    * executor memory at the target scale.
    */
  def writeBucketed(df: DataFrame, warehouse: String, table: String,
                    urlCol: String, numBuckets: Int): Unit =
    df.withColumn("bucket", pmod(xxhash64(col(urlCol)), lit(numBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(path(warehouse, table))

  def read(spark: SparkSession, warehouse: String, table: String): DataFrame =
    spark.read.parquet(path(warehouse, table))

  /** The cluster configuration the pipeline is designed against — what a
    * spark-submit deployment sets (BASELINE.json north_star: AQE on, skew
    * join handling, explicit shuffle sizing). local-mode callers mirror it.
    */
  val RecommendedConfs: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // ~128MB input splits: regex-heavy scoring wants smaller CPU-bound
    // tasks than pure scans; tune down if docs are large
    "spark.sql.files.maxPartitionBytes" -> "134217728",
    // shuffle partitions sized to 2-3x total cores; AQE coalesces down
    "spark.sql.shuffle.partitions" -> "auto-via-AQE (set 2-3x cores)",
    "spark.sql.session.timeZone" -> "UTC",
    // the graft native functions for plain-SQL users
    "spark.sql.extensions" -> "graft.functions.GraftExtensions")
}
