package graft

import org.apache.spark.sql.functions._
import graft.derive.{RlBuilder, UgBuilders}

/** Robustness sweep for the RL/UG builders: arbitrary and degenerate
  * inputs must never throw (ANSI mode — empty-array element_at,
  * zero-length splits, null propagation) and outputs must respect the
  * reference caps. Random texts reuse the fixture generator (seeded,
  * heterogeneous: empty docs, junk language, planted batteries).
  */
class BuilderRobustnessSpec extends SparkTestBase {
  import spark.implicits._

  private val degenerate = Seq(
    "", " ", ".", "...", "\n\n", "a.", "= 5", "Problem: Solution:",
    "Given . Therefore .", "Calculate . We have = 1",
    "Problem: x Solution: y " * 200, ". " * 500, "= " * 300)

  private lazy val corpus =
    ((0L until 80L).map(graft.fixtures.SynthCorpus.bodyFor) ++ degenerate)
      .zipWithIndex
      .map { case (t, i) => (s"https://host$i.example.com/p/$i", t,
        "Physics", "3 Pages. T", t.take(500)) }
      .toDF("url", "text", "subject", "title", "abstract")

  test("rl builders never throw and respect caps on arbitrary input") {
    val v2 = RlBuilder.rlTrainingExamples(corpus, "url", "text", "subject", "title")
      .groupBy("url").agg(count(lit(1)).as("n"), max("step_count").as("ms"))
      .collect()
    assert(v2.forall(_.getAs[Long]("n") <= 3)) // extracted[:5][:3]
    val v3 = RlBuilder.rlTrainingExamplesV3(corpus, "url", "text", "subject", "title")
      .groupBy("url").agg(count(lit(1)).as("n")).collect()
    assert(v3.forall(_.getAs[Long]("n") <= 2)) // extracted[:2]
  }

  test("ug builders never throw and respect caps on arbitrary input") {
    val bench = UgBuilders.ugBenchmarkItems(
      corpus.withColumn("issues", array(lit("i1")))
        .withColumn("sophistication", lit(5.0))
        .withColumn("recommendation", lit("R"))
        .withColumn("overall_score", lit(0.5)),
      "url", "text", "subject", "title", "abstract")
      .groupBy("url").agg(count(lit(1)).as("n"), max("n_questions").as("q"))
      .collect()
    assert(bench.forall { r =>
      val n = r.getAs[Long]("n"); val q = r.getAs[Int]("q")
      n == q && q >= 2 && q <= 4
    })
    val train = UgBuilders.ugTrainingExamples(corpus, "url", "text", "subject", "title")
      .agg(max("step_count").as("ms"), min("step_count").as("mn"),
        count(lit(1)).as("n")).head()
    // per-block steps capped at 8, gated >= 2
    assert(train.getAs[Long]("n") == 0 ||
      (train.getAs[Int]("mn") >= 2 && train.getAs[Int]("ms") <= 8))
  }

  test("anchor guards are necessary conditions: match implies anchors") {
    // over heterogeneous fixture docs: if a pattern matches, its anchor
    // groups must all be present (otherwise the guard would change results)
    val df = corpus.select(col("text"), lower(col("text")).as("lo")).cache()
    def anyOf(terms: Seq[String]) =
      terms.map(t => col("lo").contains(t)).reduce(_ || _)
    val cases: Seq[(String, Seq[Seq[String]])] =
      RlBuilder.ExplicitPatterns.zip(RlBuilder.ExplicitAnchors) ++
        RlBuilder.DerivationSeqPatterns.zip(RlBuilder.DerivationSeqAnchors) ++
        RlBuilder.CalculationPatterns.zip(RlBuilder.CalculationAnchors) ++
        RlBuilder.V3ExplicitPatterns.zip(RlBuilder.V3ExplicitAnchors) ++
        Seq(RlBuilder.V3DerivationPattern -> RlBuilder.V3DerivationAnchors) ++
        UgBuilders.UgDerivationPatterns.zip(UgBuilders.UgDerivationAnchors) ++
        UgBuilders.UgDerivPatterns.zip(UgBuilders.UgDerivAnchors) ++
        UgBuilders.UgProblemPatterns.zip(UgBuilders.UgProblemAnchors)
    cases.zipWithIndex.foreach { case ((p, anchors), i) =>
      val violations = df.filter(
        (size(regexp_extract_all(col("text"), lit(p), lit(0))) > 0) &&
          !anchors.map(anyOf).reduce(_ && _)).count()
      assert(violations == 0, s"pattern $i: anchors not necessary")
    }
    // equation anchors are case-sensitive: test against the RAW text
    def anyOfRaw(terms: Seq[String]) =
      terms.map(t => col("text").contains(t)).reduce(_ || _)
    UgBuilders.UgEqPatterns.zip(UgBuilders.UgEqAnchors).zipWithIndex.foreach {
      case ((p, anchors), i) =>
        val violations = df.filter(
          (size(regexp_extract_all(col("text"), lit(p), lit(0))) > 0) &&
            !anchors.map(anyOfRaw).reduce(_ && _)).count()
        assert(violations == 0, s"eq pattern $i: anchors not necessary")
    }
    // and the crash-gate guard
    val crashViol = df.filter(col("text").rlike(RlBuilder.CrashExistencePattern) &&
      !(anyOf(Seq("calculate", "computing", "to find")) && col("text").contains("="))).count()
    assert(crashViol == 0)
  }

  test("Let is semantically an identity wrapper (incl. null flow)") {
    val df = (degenerate :+ null).toDF("t")
    val expr = upper(trim(col("t")))
    val a = df.select(graft.functions.Let(expr)(x =>
      concat(x, lit("|"), x)).as("v")).collect().map(_.getString(0))
    val b = df.select(concat(expr, lit("|"), expr).as("v"))
      .collect().map(_.getString(0))
    assert(a.toSeq == b.toSeq)
  }
}
