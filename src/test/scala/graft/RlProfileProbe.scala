package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.Tag
import graft.derive.RlBuilder

/** Dev probe (runs with the suite — cheap since the Let-binding fix):
  * times each RL-builder battery pattern and pipeline stage over the
  * fixture corpus to catch regex/expression-duplication hotspots
  * regressing (the pre-Let chain measured ~50 s for `full`).
  */
object ProbeTag extends Tag("graft.Probe")

class RlProfileProbe extends SparkTestBase {

  test("profile rl batteries", ProbeTag) {
    val corpus = spark.read
      .parquet(graft.fixtures.SynthCorpus.materializedCorpus(spark))
      .cache()
    corpus.count()
    def time(name: String, pat: String): Unit = {
      val t0 = System.nanoTime()
      corpus.select(sum(size(regexp_extract_all(col("text"), lit(pat), lit(0))))).head()
      info(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("gate-crash-slow", RlBuilder.CalculationCrashPattern)
    time("gate-crash-fast", RlBuilder.CrashExistencePattern)
    RlBuilder.ExplicitPatterns.zipWithIndex.foreach { case (p, i) => time(s"explicit$i", p) }
    RlBuilder.DerivationSeqPatterns.zipWithIndex.foreach { case (p, i) => time(s"deriv$i", p) }
    RlBuilder.CalculationPatterns.zipWithIndex.foreach { case (p, i) => time(s"calc$i", p) }
    RlBuilder.V3ExplicitPatterns.zipWithIndex.foreach { case (p, i) => time(s"v3explicit$i", p) }
    time("v3deriv", RlBuilder.V3DerivationPattern)
  }

  test("profile rl stages", ProbeTag) {
    val corpus = spark.read
      .parquet(graft.fixtures.SynthCorpus.materializedCorpus(spark))
      .withColumn("subject", lit("Physics")).withColumn("title", lit("T"))
      .cache()
    corpus.count()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      info(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val crashes = col("text").rlike(RlBuilder.CrashExistencePattern)
    val gated = corpus.filter(
      RlBuilder.suitableForRlTraining(col("text")) && !crashes)
    t("gate")(gated.count())
    info(s"gated docs: ${gated.count()}")
    t("battery")(gated
      .select(size(RlBuilder.extractedExamples(col("text"))).as("n"))
      .agg(sum("n")).head())
    t("full")(RlBuilder.rlTrainingExamples(corpus, "url", "text", "subject", "title").count())
    t("v3full")(RlBuilder.rlTrainingExamplesV3(corpus, "url", "text", "subject", "title").count())
  }
}
