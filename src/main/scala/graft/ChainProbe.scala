package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side probe: stage timers for the Curate chain on a materialized
  * raw-corpus directory. Not part of the driver contract.
  *   SPARK_GRAFT_CPUS=8 SPARK_GRAFT_PROBE_DIR=/tmp/graft_scaling_corpus_20000 \
  *     sbt "runMain graft.ChainProbe"
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
      "/tmp/graft_scaling_corpus_20000")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def t(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
    }

    val extracted = spark.read.parquet(dir)
      .withColumn("text", call_function("graft_extract_clean", col("html")))
      .select(col("url").as("id"), col("text"))
    t("extract+count")(extracted.count())
    val g = graft.functions.ComputeOnce(extracted, "__g",
      graft.rules.Heuristics.gopherStats(col("text")))
    t("gopher keep count")(g.filter(col("__g.gopher_keep")).count())
    val toks = graft.functions.ComputeOnce(extracted, "sh",
      graft.dedup.Dedup.shingles(col("text"), 3)).select("id", "sh")
    t("shingle count")(toks.count())
    t("sig count") {
      graft.functions.ComputeOnce(toks.filter(size(col("sh")) > 0), "sig",
        graft.dedup.Dedup.minhashSignature(col("sh"), 32)).count()
    }
    // minhashPairs internals, re-created stage by stage
    locally {
      val toksB = graft.functions.ComputeOnce(extracted, "sh",
        graft.dedup.Dedup.shingles(col("text"), 3)).select("id", "sh")
        .localCheckpoint()
      val withSig = graft.functions.ComputeOnce(
        toksB.filter(size(col("sh")) > 0),
        "sig", graft.dedup.Dedup.minhashSignature(col("sh"), 32))
        .withColumn("bucket",
          explode(graft.dedup.Dedup.bandKeys(col("sig"), 8, 4)))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy("id")
      val capped = withSig.select(col("bucket"), col("id"))
        .withColumn("rnk", row_number().over(wB))
        .filter(col("rnk") <= 64).drop("rnk").localCheckpoint()
      t("  capped postings (from toks ck)")(capped.count())
      val cand = capped.as("x").join(capped.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      t("  raw cand rows")(cand.count())
      val candD = cand.distinct().localCheckpoint()
      t("  distinct cand")(candD.count())
      t("  verify join") {
        candD
          .join(toksB.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(toksB.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .withColumn("inter",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .withColumn("uni",
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .filter(col("inter") / col("uni") >= 0.8).count()
      }
    }
    val pairs = graft.dedup.Dedup.minhashPairs(extracted, "id", "text",
      threshold = 0.8)
    t("minhashPairs count")(pairs.count())
    t("components construction") {
      graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.minhashPairs(extracted, "id", "text", threshold = 0.8),
        "id_a", "id_b").count()
    }
    t("curationLog(minhash) count") {
      graft.curate.Curate.curationLog(extracted, "id", "text",
        strategy = "minhash").count()
    }
    t("curationLog(minhash, materialize) count") {
      graft.curate.Curate.curationLog(extracted, "id", "text",
        strategy = "minhash", materialize = true).count()
    }
    t("full(minhash, materialize) agg") {
      graft.curate.Curate.full(
        spark.read.parquet(dir), spark, strategy = "minhash",
        materialize = true)
        .agg(count(lit(1)), sum(when(col("keep"), 1L).otherwise(0L)))
        .head()
    }
    t("full(minhash) agg") {
      graft.curate.Curate.full(
        spark.read.parquet(dir), spark, strategy = "minhash")
        .agg(count(lit(1)), sum(when(col("keep"), 1L).otherwise(0L)))
        .head()
    }
    spark.stop()
  }
}
