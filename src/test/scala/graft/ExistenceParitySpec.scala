package graft

import org.apache.spark.sql.functions._
import graft.derive.{RlBuilder, UgBuilders}

/** The RE2-safe existence rewrites must agree with the original
  * lookahead battery patterns on MATCH EXISTENCE for every document —
  * both evaluated by Java regex here; the driver then evaluates the
  * rewrite in DuckDB (RE2) against the original in Spark. A divergence
  * on any fixture/degenerate/adversarial doc kills the q47/q48/q49
  * oracles before the driver does.
  */
class ExistenceParitySpec extends SparkTestBase {
  import spark.implicits._

  private val adversarial = Seq(
    // terminator-is-next-start: the lookahead's non-consuming repeat case
    "Problem: a Solution: b Problem: c Solution: d",
    "Find x. Solution: y Find z. We have w",
    // anchor words present but out of order
    "Solution: b Problem: a", "Therefore x Given y we derive z",
    // adjacency breakers: dot between verb and solution-cue
    "Find the mass of the rod. It is heavy. Solution: m = 3 kg",
    "Find it\nWe have x", "Find it We have x", "Find it.We have x",
    // equation-with-dot breaks D2's [^.]* run
    "From the first equation. we get x", "From the main. equation we get x",
    "Using equation (1). Substituting v we get x",
    "We have = 5 Therefore done", "We have a = b. Thus c",
    "The value of x = 3 Therefore y", "The value of x == 3. Thus",
    "Given f. We derive g Therefore h", "Given f. We derive g Therefore",
    "Starting with a we get b Therefore c", "Starting with a we get b Thus",
    "Step 1: do x", "Step: do x", "step 12 then", "First, integrate.",
    "Using conservation of momentum we get p", "Using conservation of. we get p",
    "Applying law of gravity this gives F", "From theorem of calculus we obtain I",
    "equation (12) rearranging we obtain y", "relation(3) solving we get z",
    "equation (a) solving we get z", "Problem: p Solution: s Therefore t",
    "Problem: p Solution: s Final answer: t", "Question q Answer a Hence h",
    "", " ", ".", "\n\n", "Problem", "Solution")

  /** Seeded random docs mixing anchors, terminators, paragraph breaks
    * (the \n\n lookahead alternative) and filler — the regime where a
    * wrong existence rewrite would diverge.
    */
  private def randomDoc(seed: Long): String = {
    var x = seed | 1L
    def nxt(n: Int): Int = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      ((x % n + n) % n).toInt
    }
    val vocab = Seq("Problem:", "Question", "Example", "Solution:", "Answer",
      "Result", "Find", "Calculate", "Determine", "Show", "Prove", "Given",
      "Starting with", "Consider", "From", "Using", "We derive", "We show",
      "We find", "We have", "We start", "We get", "we obtain", "this gives",
      "Therefore", "Thus", "Hence", "equation", "relation", "formula",
      "The value of", "x = 3", "= 5", "Step 2", "First", "Initially",
      "Next", "Then", "conservation", "law", "principle", "theorem", "of",
      "momentum", "substituting", "rearranging", "solving", "(1)", "(12)",
      "Final answer:", ".", "\n", "\n\n", "the", "a", "and", "filler",
      "words", "here", "Q.E.D.")
    (0 until (20 + nxt(100))).map(_ => vocab(nxt(vocab.length))).mkString(" ")
  }

  private lazy val corpus =
    ((0L until 120L).map(graft.fixtures.SynthCorpus.bodyFor) ++ adversarial ++
      (1L to 150L).map(randomDoc))
      .toDF("text").cache()

  private def assertParity(cases: Seq[(String, String)], tag: String): Unit =
    cases.zipWithIndex.foreach { case ((real, exist), i) =>
      val diff = corpus.filter(
        col("text").rlike(real) =!= col("text").rlike(exist))
      val ex = diff.select("text").take(1).map(_.getString(0))
      assert(ex.isEmpty,
        s"$tag pattern $i existence mismatch on: ${ex.headOption.map(_.take(200))}")
    }

  test("v2 RL existence rewrites match the lookahead patterns") {
    assertParity(RlBuilder.ExplicitPatterns.zip(RlBuilder.ExplicitExistence), "explicit")
    assertParity(RlBuilder.DerivationSeqPatterns.zip(RlBuilder.DerivationSeqExistence), "deriv")
    assertParity(RlBuilder.CalculationPatterns.zip(RlBuilder.CalculationExistence), "calc")
  }

  test("v3 RL existence rewrites match the lookahead patterns") {
    assertParity(RlBuilder.V3ExplicitPatterns.zip(RlBuilder.V3ExplicitExistence), "v3explicit")
    assertParity(Seq(RlBuilder.V3DerivationPattern).zip(RlBuilder.V3DerivationExistence), "v3deriv")
  }

  test("UG derivation existence rewrites match the lookahead patterns") {
    assertParity(UgBuilders.UgDerivationPatterns.zip(UgBuilders.UgDerivationExistence), "ugderiv")
  }
}
