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

  test("anchor-free web text skips every battery scan", ProbeTag) {
    import spark.implicits._
    // no pattern's full anchor set present → every guardedZip takes the
    // empty branch. The structural guarantee is AnchorGuardSpec (analyzed
    // + optimized plan); this probe times the residual per-row cost,
    // which is the guard contains-scans themselves (interpreted inside
    // the HOF lambda; full-text scan when a term is ABSENT, early-exit
    // when present — so anchor-free can legitimately exceed anchor-rich
    // on the contains portion).
    val neutral = ("the cat sat on the mat and the dog barked at the moon " +
      "while rain fell over the quiet town square at dusk ") * 600 // ~60 KB
    val df = Seq.fill(200)(neutral).toDF("text").cache(); df.count()
    def t(name: String)(c: org.apache.spark.sql.Column): Unit = {
      df.select(sum(size(c))).head()
      val t0 = System.nanoTime()
      df.select(sum(size(c))).head()
      info(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (200 docs x 60 KB)")
    }
    // one raw unguarded battery scan, for scale: ~22 of these would run
    // per row without the guards
    t("raw battery scan x1")(
      regexp_extract_all(col("text"), lit(RlBuilder.ExplicitPatterns.head), lit(1)))
    t("guarded v2 extraction")(RlBuilder.extractedExamples(col("text")))
    t("guarded v3 extraction")(RlBuilder.v3ExtractedExamples(col("text")))
    // and zero examples come out of anchor-free text (sanity)
    val n = df.select(sum(size(RlBuilder.extractedExamples(col("text")))).as("n"))
      .head().getLong(0)
    assert(n == 0)
    df.unpersist()
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
