package graft

import org.apache.spark.sql.functions._
import graft.derive.RlBuilder

/** RL-builder parity: every expected value below was derived by EXECUTING
  * the reference's own logic (analysis/enhanced_training_builder.py
  * ChainOfThoughtTrainingBuilder and enhanced_analyzer_integration2.py
  * RLTrainingDataBuilder) on these exact texts, then hardcoded.
  *
  * The v2 crash semantics are part of the spec: the reference's first
  * calculation pattern (enhanced_training_builder.py:75-81) unpacks two
  * captured groups into three variables — any text it matches raises
  * ValueError and the per-paper `except` discards the whole document.
  */
class RlBuilderSpec extends SparkTestBase {
  import spark.implicits._

  private val DerivText =
    "Given the conservation of momentum for the particle system in the field we proceed. " +
      "We derive the energy relation for the mass using E = m c^2 and the velocity relation p = m v for the field. " +
      "Therefore the total energy is E = 42 J for this system.\n\n"

  private val Calc2Text =
    "We have F = m a for the force on the particle in the field. " +
      "Using the equation for the given mass of the system we substitute the values to derive the force result. " +
      "Therefore F = 10 N for the particle.\n\n"

  private val ExplicitText =
    "Problem: determine the kinetic energy of the particle given the mass and the velocity of the system. " +
      "Solution: We use the energy equation E = m v^2 / 2 to derive the result for the particle. " +
      "Then we substitute the mass value into the equation to obtain E = 8 J for this energy. " +
      "Therefore the energy of the particle is E = 8 J in the field.\n\n"

  private val CrashText =
    "Calculate the force on the particle of mass 2 kg in the field.\n" +
      "Using the force equation from the given mass we write F = m a = 2 * 5 and therefore obtain F = 10 N.\n\n"

  private val Pad =
    ("We consider the problem of the field and the solution for the energy using the equation of the mass. " +
      "First we find the force and then we derive the result step by step as given. ") * 8

  private val FullText = Pad + ExplicitText + DerivText

  private def batteryRows(text: String) =
    Seq(text).toDF("text")
      .select(explode(RlBuilder.extractedExamples(col("text"))).as("e"))
      .select("e.example_type", "e.problem_statement", "e.solution_steps",
        "e.final_answer", "e.quality_score")
      .collect()

  test("v2 derivation battery matches the reference exactly") {
    val rows = batteryRows(DerivText)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "mathematical_derivation")
    assert(r.getString(1) ==
      "Given: the conservation of momentum for the particle system in the field we proceed\nDerive the following result and show all steps.")
    assert(r.getSeq[String](2) == Seq(
      "the energy relation for the mass using E = m c^2 and the velocity relation p = m v for the field.",
      "Therefore: the total energy is E = 42 J for this system."))
    assert(r.getString(3) == "the total energy is E = 42 J for this system.")
    assert(math.abs(r.getDouble(4) - 0.9999999999999999) < 1e-12)
  }

  test("v2 calculation battery (pattern 2 only) matches the reference") {
    val rows = batteryRows(Calc2Text)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "numerical_calculation")
    assert(r.getString(1) == "Calculate: F = m a for the force on the particle in the field")
    // reference quirk: the raw capture's leading ". " survives strip()
    assert(r.getSeq[String](2) == Seq(
      ". Using the equation for the given mass of the system we substitute the values to derive the force result.",
      "Therefore: F = 10 N for the particle."))
    assert(r.getString(3) == "F = 10 N for the particle.")
    assert(math.abs(r.getDouble(4) - 0.8999999999999999) < 1e-12)
  }

  private def rlDf(text: String) =
    Seq(("https://host0.example.com/p/1", text, "Physics",
      "A Study of Planted Physics Fragments in Webtext"))
      .toDF("url", "text", "subject", "title")

  test("v2 crash gate: a doc matching the buggy pattern yields nothing") {
    // gate-passing length + indicators, but contains Calculate…= digit
    val doc = Pad + CrashText + ExplicitText
    assert(RlBuilder.rlTrainingExamples(rlDf(doc), "url", "text", "subject", "title")
      .count() == 0)
  }

  test("v2 end-to-end equals the reference on the full gated text") {
    val rows = RlBuilder.rlTrainingExamples(
      rlDf(FullText), "url", "text", "subject", "title").collect()
    assert(rows.length == 3)
    def f(i: Int, c: String) = rows(i).getAs[Any](c)
    // example 0: the explicit plant — exact prompt/completion
    assert(f(0, "example_type") == "explicit_problem_solution")
    assert(f(0, "prompt") ==
      "determine the kinetic energy of the particle given the mass and the velocity of the system.")
    assert(f(0, "completion") ==
      "<think>\nLet me work through this physics problem step by step.\n\n" +
        "First, we substitute the mass value into the equation to obtain E = 8 J for this energy.\n\n" +
        "Next, the energy equation E = m v2 / 2 to derive the result for the particle.\n\n" +
        "Finally, the energy of the particle is E = 8 J in the field.\n\n" +
        "Let me verify this makes physical sense...\nThe approach is consistent with known physics principles.\n\n" +
        "</think>\n\nthe energy of the particle is E = 8 J in the field")
    assert(f(0, "reasoning_quality") == 0.75)
    assert(f(0, "step_count") == 3)
    assert(f(0, "difficulty") == "introductory")
    assert(f(0, "source_context") ==
      "From Physics paper: A Study of Planted Physics Fragments in Webtext...")
    // example 1: explicit pattern 2 over the pad (huge prompt — lengths only)
    assert(f(1, "example_type") == "explicit_problem_solution")
    assert(f(1, "reasoning_quality") == 0.95)
    assert(f(1, "step_count") == 3)
    assert(f(1, "prompt").asInstanceOf[String].length == 1408)
    assert(f(1, "completion").asInstanceOf[String].length == 457)
    // example 2: the derivation battery
    assert(f(2, "example_type") == "mathematical_derivation")
    assert(f(2, "reasoning_quality") == 1.0) // 0.9999999999999999 rounded at 6
    assert(f(2, "step_count") == 2)
    assert(f(2, "difficulty") == "intermediate")
    assert(f(2, "prompt").asInstanceOf[String].length == 1890)
  }

  test("crash-existence rewrite ≡ the buggy pattern (corpus + edges)") {
    val texts = (0L until 60L).map(graft.fixtures.SynthCorpus.bodyFor) ++ Seq(
      "Calculate x\n\n= 5", "Calculate x. y = 5", "Calculate x y = 5",
      "no anchors here = 5", "To find a. b... c = 9",
      "Calculate a.b=c then d = 3", "Computing\nresult = 7",
      "calculate the value. but no equals digit anywhere")
    val df = texts.toDF("text")
    val n = df.filter(
      (size(regexp_extract_all(col("text"),
        lit(RlBuilder.CalculationCrashPattern), lit(0))) > 0) =!=
        col("text").rlike(RlBuilder.CrashExistencePattern)).count()
    assert(n == 0, s"$n texts disagree between slow and fast crash checks")
  }

  // ------------------------------------------------------------------
  // V3 (RLTrainingDataBuilder)
  // ------------------------------------------------------------------

  private def v3BatteryRows(text: String) =
    Seq(text).toDF("text")
      .select(explode(RlBuilder.v3ExtractedExamples(col("text"))).as("e"))
      .select("e.example_type", "e.problem", "e.solution", "e.quality")
      .collect()

  test("v3 explicit battery matches the reference (incl. '^' strip)") {
    val rows = v3BatteryRows(ExplicitText)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "explicit_problem")
    assert(r.getString(1) ==
      "determine the kinetic energy of the particle given the mass and the velocity of the system.")
    assert(r.getString(2) ==
      "We use the energy equation E = m v2 / 2 to derive the result for the particle. Then we substitute the mass value into the equation to obtain E = 8 J for this energy. Therefore the energy of the particle is E = 8 J in the field.")
    assert(r.getDouble(3) == 1.0)
    // and the v2-only texts yield nothing for v3
    assert(v3BatteryRows(DerivText).isEmpty)
    assert(v3BatteryRows(Calc2Text).isEmpty)
  }

  test("v3 derivation battery matches the reference") {
    val text =
      "Starting with the conservation of momentum for the particle in the field we apply the relation " +
        "and we obtain the energy of the mass for the moving system under the field equation. " +
        "Therefore the energy is E = 21 J for the system.\n\n"
    val rows = v3BatteryRows(text)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "derivation")
    assert(r.getString(1) ==
      "Given: the conservation of momentum for the particle in the field we apply the relation and\nDerive the result and show all steps.")
    assert(r.getString(2) ==
      "Starting with: the conservation of momentum for the particle in the field we apply the relation and\nProcess: the energy of the mass for the moving system under the field equation.\nResult: the energy is E = 21 J for the system.")
    assert(r.getDouble(3) == 1.0)
  }

  test("v3 end-to-end equals the reference on the full gated text") {
    val rows = RlBuilder.rlTrainingExamplesV3(
      rlDf(FullText), "url", "text", "subject", "title").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("example_type") == "explicit_problem")
    assert(r.getAs[String]("prompt") ==
      "determine the kinetic energy of the particle given the mass and the velocity of the system.")
    assert(r.getAs[String]("completion") ==
      "<think>\nLet me work through this physics problem step by step.\n\n" +
        "First, We use the energy equation E = m v2 / 2 to derive the result for the particle.\n\n" +
        "Next, Then we substitute the mass value into the equation to obtain E = 8 J for this energy.\n\n" +
        "Next, Therefore the energy of the particle is E = 8 J in the field..\n\n" +
        "This gives us the solution following standard physics principles." +
        "\n</think>\n\nTherefore: the energy of the particle is E = 8 J in the field")
    assert(r.getAs[Double]("reasoning_quality") == 1.0)
    assert(r.getAs[String]("difficulty") == "introductory")
  }
}
