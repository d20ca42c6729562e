package graft

import org.apache.spark.sql.functions._
import graft.derive.UgBuilders

/** UGPhysics-builder parity: expected values produced by EXECUTING the
  * reference's EnhancedBenchmarkBuilder, and — for the training variant —
  * the reference's EnhancedTrainingDataBuilder with the two documented
  * repairs monkey-patched in (pattern-3 full match; `_enhanced` helpers →
  * parent methods), since the class as written crashes (UgBuilders
  * Scaladoc).
  */
class UgBuildersSpec extends SparkTestBase {
  import spark.implicits._

  private val Abstract =
    "We study the energy of the quantum field using the wave equation and derive the mass relation for the particle system under consideration in this work."

  private val T1 =
    "We consider the energy of the quantum system for the field. " * 12 +
      "The key relation is $E = m c^2$ given for the particle. " +
      "To derive the momentum relation we use the energy and the force of the field for the mass and Therefore the momentum follows from the energy relation. " +
      "Problem: find the energy of the particle given the mass and the velocity for the system of the field. " +
      "Solution: the energy follows from the equation for the mass and the velocity so we obtain the result for the particle and the field with the momentum of the system. " +
      "More words about the quantum theory and the conservation of the wave follow here to pad the text. " * 3

  private val T2 =
    "We calculate and solve the formula for the theory and the model. " * 10 +
      "Here stands a relation K = alpha beta gamma delta epsilon for the system. " +
      "filler sentences about nothing in particular continue. " * 10

  private def benchDf(text: String, issues: Seq[String]) =
    Seq((("https://host0.example.com/p/1"), text, "Quantum Physics",
      "3 Pages. A Study of Planted Physics Fragments", Abstract, issues,
      6.25, "EDUCATIONAL_FAILURE", 0.5523))
      .toDF("url", "text", "subject", "title", "abstract", "issues",
        "sophistication", "recommendation", "overall_score")

  private def run(text: String, issues: Seq[String] = Seq(
    "potential mathematical errors", "questionable physics assumptions")) =
    UgBuilders.ugBenchmarkItems(benchDf(text, issues), "url", "text",
      "subject", "title", "abstract").collect()

  test("ug benchmark t1 yields all four questions, strings exact") {
    val rows = run(T1)
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("qtype")).toSeq == Seq(
      "mathematical_derivation", "reasoning_analysis", "problem_solving",
      "principles_application"))
    assert(rows.forall(_.getAs[Int]("n_questions") == 4))
    assert(rows.forall(_.getAs[String]("clean_title") ==
      "A Study of Planted Physics Fragments"))
    val q1 = rows(0).getAs[String]("question")
    assert(q1.startsWith(
      "Given the physics context from this work on quantum physics:\n\nAbstract: We study the energy"))
    assert(q1.contains(
      "given for the particle. To derive the momentum relation we use the energy"))
    assert(q1.endsWith("4. Any logical gaps or unjustified steps"))
    val q3 = rows(2).getAs[String]("question")
    assert(q3.contains(
      "**Problem**: Problem: find the energy of the particle given the mass and the velocity for the system of the field. Solution:"))
    assert(q3.contains("**Proposed Solution**: the energy follows from the equation"))
    val q4 = rows(3).getAs[String]("question")
    assert(q4.contains(
      "Focus particularly on the application of: wave-particle duality, uncertainty principle, quantum superposition"))
  }

  test("ug benchmark t2 drops problem_solving, keeps 3 questions") {
    val rows = run(T2)
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("qtype")).toSeq == Seq(
      "mathematical_derivation", "reasoning_analysis", "principles_application"))
    // best content falls back to the first >20-char equation
    assert(rows(0).getAs[String]("question").contains(
      "K = alpha beta gamma delta epsilon for the system\n\nProvide a detailed analysis"))
  }

  test("ug benchmark needs >= 2 questions and non-empty content") {
    // no issues and no extractable content → at most the principles
    // question → item dropped
    val rows = run("short text with energy and force words only. " * 20,
      issues = Seq.empty)
    assert(rows.isEmpty)
  }

  // ------------------------------------------------------------------
  // EnhancedTrainingDataBuilder (repaired)
  // ------------------------------------------------------------------

  private val T3 =
    "the energy of the field and the mass of the particle for the system " * 20 +
      "Given the energy equation for the field we work as follows.\n" +
      "First we use the energy formula for the mass of the particle to solve the system. " +
      "Then we substitute the velocity value with v = 3 into the relation to calculate the energy for the field. " +
      "Therefore we obtain the energy result for the particle system. Solution: the energy follows for the mass.\n\n" +
      "additional padding about the force and the momentum of the wave. " * 5

  test("ug training examples match the repaired reference run") {
    val df = Seq(("https://host0.example.com/p/1", T3, "Quantum Physics",
      "3 Pages. A Study of Planted Physics Fragments"))
      .toDF("url", "text", "subject", "title")
    val rows = UgBuilders.ugTrainingExamples(df, "url", "text", "subject", "title")
      .collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("example_type")).toSeq ==
      Seq("derivation", "solution", "solution", "solution"))
    val r = rows.head
    assert(r.getAs[String]("problem_statement") ==
      "the energy equation for the field we work as follows. First we use the energy formula for the mass of the particle to solve the system. Then we substitute the velocity value with v = 3 into the relation to calculate the energy for the field. Therefore we obtain the energy result for the particle system. Solution: the energy follows for the mass.")
    assert(r.getAs[scala.collection.Seq[String]]("steps").toSeq == Seq(
      "we use the energy formula for the mass of the particle to solve the system.",
      "we substitute the velocity value with v = 3 into the relation to calculate the energy for the field.",
      "with v = 3 into the relation to calculate the energy for the field.",
      "Therefore we obtain the energy result for the particle system.",
      "the energy equation for the field we work as follows.",
      "the energy formula for the mass of the particle to solve the system.",
      "the velocity value with v = 3 into the relation to calculate the energy for the field.",
      "the energy result for the particle system."))
    assert(r.getAs[Int]("step_count") == 8)
    assert(r.getAs[String]("difficulty") == "introductory")
    assert(r.getAs[String]("topic") == "mechanics")
    assert(r.getAs[String]("reasoning_type") == "problem_solving")
    assert(r.getAs[scala.collection.Seq[String]]("prerequisites").isEmpty)
    // set-compare: Python's list(set(...)) order is unstable; our
    // array_distinct keeps first occurrence (documented E-divergence)
    assert(r.getAs[scala.collection.Seq[String]]("concepts").toSet ==
      Set("relation to", "equation for", "formula for"))
    assert(r.getAs[String]("clean_title") == "A Study of Planted Physics Fragments")
    assert(r.getAs[String]("raw_text").length == 353)
    // the later solution blocks shrink: the reference matched overlapping
    // worked-solution spans whose cleans diverge
    val r2 = rows(2)
    assert(r2.getAs[String]("problem_statement") ==
      "the energy for the field. Therefore we obtain the energy result for the particle system.")
    assert(r2.getAs[scala.collection.Seq[String]]("steps").toSeq == Seq(
      "we substitute the velocity value with v = 3 into the relation to calculate the energy for the field.",
      "with v = 3 into the relation to calculate the energy for the field.",
      "Therefore we obtain the energy result for the particle system.",
      "the velocity value with v = 3 into the relation to calculate the energy for the field.",
      "the energy result for the particle system."))
    assert(r2.getAs[Int]("step_count") == 5)
    val r3 = rows(3)
    assert(r3.getAs[scala.collection.Seq[String]]("steps").toSeq == Seq(
      "with v = 3 into the relation to calculate the energy for the field.",
      "Therefore we obtain the energy result for the particle system.",
      "the relation to calculate the energy for the field.",
      "the energy result for the particle system."))
    assert(r3.getAs[Int]("step_count") == 4)
  }

  test("ug completeness predicate gates derivation candidates") {
    val df = Seq(("u", "x")).toDF("u", "t")
    def check(s: String): Boolean = df
      .select(UgBuilders.isCompleteDerivation(lit(s)).as("ok"))
      .head().getBoolean(0)
    val base = "Given the energy equation for the field we therefore obtain results. "
    assert(check(base * 3))          // starter + conclusion + math/physics
    assert(!check(base))             // < 100 chars fails
    assert(!check("the energy of the field appears here without structure. " * 3))
  }
}
