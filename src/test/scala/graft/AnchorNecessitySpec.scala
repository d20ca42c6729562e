package graft

import java.util.regex.Pattern
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.derive.{AnchorGuard, Extract, RlExample, StepExtract, UgBuilders, UgExample}

/** Machine-check of the AnchorGuard safety condition: an anchor set is
  * NECESSARY for its regex — whenever the pattern matches a string, every
  * anchor group has a literal present in the ASCII-folded string. A guard
  * that fails this would silently skip a matchable regex (a wrong-answer
  * bug, not a perf bug), so the claim must not rest on hand inspection:
  * this property pins it against future pattern or anchor edits.
  */
class AnchorNecessitySpec extends SparkTestBase {

  private def families: Seq[(String, Seq[String], Array[Array[Array[String]]])] = Seq(
    ("RlExample/Extract.StepPatterns",
      Extract.StepPatterns, RlExample.StepAnchors),
    ("StepExtract/AnalyserStepPatterns",
      Extract.AnalyserStepPatterns, StepExtract.StepAnchors),
    ("UgExample/UgStepPatterns",
      UgBuilders.UgStepPatterns.map(_._1), UgExample.StepAnchors),
    ("UgExample/UgProblemStmtPatterns",
      UgBuilders.UgProblemStmtPatterns.map(_._1), UgExample.StmtAnchors),
    ("UgExample/ConceptPatterns",
      Extract.ConceptPatterns, UgExample.ConceptAnchors))

  // token soup biased to hit the patterns: every anchor literal (random
  // casing), connective filler, math, punctuation, newlines
  private def textGen(literals: Seq[String]): Gen[String] = {
    val caseGen: Gen[String => String] = Gen.oneOf(
      (s: String) => s,
      (s: String) => s.toUpperCase(java.util.Locale.ROOT),
      (s: String) => s.capitalize)
    val tokenGen: Gen[String] = Gen.frequency(
      5 -> (for { l <- Gen.oneOf(literals); f <- caseGen } yield f(l)),
      3 -> Gen.oneOf("the", "a", "of", "energy", "force", "x", "y",
        "particle", "wave", "momentum", "conservation", "equation"),
      2 -> Gen.oneOf("=", "= 3", ":", ".", ",", "\n", "e2e", "42"),
      1 -> Gen.oneOf("ünïcödé", "İ", "ß", "中文"))
    Gen.chooseNum(3, 25).flatMap(n =>
      Gen.listOfN(n, tokenGen).map(_.mkString(" ") + "."))
  }

  test("anchor sets are necessary: a match implies every group present") {
    families.foreach { case (name, patternStrs, anchors) =>
      assert(patternStrs.length == anchors.length, s"$name arity")
      val ps = patternStrs.map(Pattern.compile)
      val literals = anchors.flatten.flatten.toSeq.distinct
      var matches = 0
      val prop = Prop.forAll(textGen(literals)) { s =>
        val fold = AnchorGuard.asciiLower(s)
        ps.indices.forall { i =>
          val m = ps(i).matcher(s).find()
          if (m) matches += 1
          !m || AnchorGuard.anchored(fold, anchors(i))
        }
      }
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(800), prop)
      assert(res.passed, s"$name: ${res.status}")
      // non-vacuous: the soup must actually exercise the match->anchored
      // implication, not just its trivially-true branch
      assert(matches > 500, s"$name: only $matches matches generated")
      info(s"$name: $matches pattern matches all anchored")
    }
  }
}
