package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Clean
import graft.rules.{Heuristics, TokenStats, PatternCounts}
import graft.score.{Perplexity, Score, Stages}
import graft.scrub.PiiScrub

/** Property-based invariants (SURVEY.md §5.4) — pure-Scala mirrors, no
  * Spark session needed, so thousands of cases run in milliseconds.
  */
class PropertySpec extends AnyFunSuite {

  /** Raw ScalaCheck runner (scalatestplus bridge not in the offline repo). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val textGen: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    2 -> Gen.listOf(Gen.oneOf("the", "energy", "force", "$x=1$", "[1]",
      "a@b.co", "1.2.3.4", "α", "ﬁ", "  ", "\n", "Page 3", "3.14",
      "assume", "therefore", "we obtain")).map(_.mkString(" ")),
    1 -> Gen.listOf(Gen.choose(0x20.toChar, 0x2FF.toChar)).map(_.mkString))

  test("clean stabilizes after second application (property)") {
    check(Prop.forAll(textGen) { t =>
      val twice = Clean.basicCleanStr(Clean.basicCleanStr(t))
      Clean.basicCleanStr(twice) == twice
    })
  }

  test("fast clean equals regex clean (property)") {
    check(Prop.forAll(textGen) { t =>
      Clean.basicCleanFastStr(t) == Clean.basicCleanStr(t)
    })
  }

  test("fused token stats equal regex mirrors (property)") {
    check(Prop.forAll(textGen) { t =>
      val a = TokenStats.compute(t)
      a(0) == Heuristics.wordCountStr(t) &&
        a(1) == Heuristics.tokenMembershipCountStr(t, Heuristics.PhysicsTerms) &&
        a(2) == Heuristics.tokenMembershipCountStr(t, Heuristics.MathTerms) &&
        a(3) == t.count(_ == '.').toLong
    })
  }

  test("fused pattern counts equal regex mirrors (property)") {
    check(Prop.forAll(textGen) { t =>
      val a = PatternCounts.compute(t)
      a(0) == Heuristics.mathExpressionCountStr(t) &&
        a(1) == Heuristics.referenceCountStr(t) &&
        a(2) == Heuristics.equationCountStr(t)
    })
  }

  test("fused extract+clean equals chained extract -> basicClean (property)") {
    // html-shaped generator over the documented input domain (no bare C0
    // control chars — see HtmlText.extractCleanStr divergence note)
    val htmlGen: Gen[String] = Gen.listOf(Gen.frequency(
      4 -> Gen.asciiPrintableStr,
      2 -> Gen.oneOf("<p>", "</p>", "<div>", "<br>", "<b>", "</b>",
        "<li>", "<table>", "<H2>", "</H2>", "<span class='x'>", "</span>"),
      1 -> Gen.oneOf("&amp;", "&nbsp;", "&eacute;", "&lt;", "&#65;", "&#x42;",
        "&bogus;", "& loose"),
      1 -> Gen.oneOf("<!-- c -->", "<script>x='<i>'</script>",
        "<style>p{}</style>", "<tag", "α β", "ﬁ", "\n", "\t", "  "),
      1 -> Gen.listOf(Gen.choose(0x20.toChar, 0x2FF.toChar)).map(_.mkString)
    )).map(_.mkString(" "))
    check(Prop.forAll(htmlGen) { t =>
      val b = t.getBytes("UTF-8")
      graft.extract.HtmlText.extractClean(b) ==
        Clean.basicCleanStr(graft.extract.HtmlText.extract(b))
    })
  }

  test("byte-native extract+clean equals decode-then-scan on RANDOM BYTES (property)") {
    // fully adversarial: arbitrary byte arrays, including malformed UTF-8,
    // split multi-byte sequences, stray tag/entity/comment syntax
    val bytesGen: Gen[Array[Byte]] = Gen.listOf(Gen.frequency(
      6 -> Gen.choose(0x20, 0x7E),
      1 -> Gen.oneOf('<'.toInt, '>'.toInt, '&'.toInt, ';'.toInt, '/'.toInt,
        '!'.toInt, '-'.toInt, '\n'.toInt, '\t'.toInt),
      2 -> Gen.choose(0x80, 0xFF),
      1 -> Gen.oneOf(0xC2, 0xA0, 0xE2, 0x80, 0x87, 0xF0, 0x9F, 0x98, 0x80)
    )).map(_.map(_.toByte).toArray)
    check(Prop.forAll(bytesGen) { b =>
      graft.extract.HtmlText.extractCleanBytes(b).toString ==
        graft.extract.HtmlText.extractClean(b)
    })
  }

  test("scrub is idempotent and never reveals an email (property)") {
    val emailGen = for {
      u <- Gen.alphaLowerStr.suchThat(_.nonEmpty)
      d <- Gen.alphaLowerStr.suchThat(_.length > 1)
      pre <- textGen
    } yield (s"$pre $u@$d.com", s"$u@$d.com")
    check(Prop.forAll(emailGen) { case (t, email) =>
      val out = PiiScrub.scrubStr(t)
      PiiScrub.scrubStr(out) == out && !out.contains(email)
    })
  }

  test("overall score always in [0,1]; stage-1 fail forces 0 (property)") {
    val g = for {
      pass <- Gen.oneOf(true, false)
      soph <- Gen.choose(0.0, 1.0)
      avg2 <- Gen.choose(1.0, 10.0)
      rec <- Gen.oneOf(Score.RecommendationScores.keys.toSeq :+ "GARBAGE")
    } yield (pass, soph, avg2, rec)
    check(Prop.forAll(g) { case (pass, soph, avg2, rec) =>
      val s = Score.overallStr(pass, soph, avg2, rec)
      s >= 0.0 && s <= 1.0 && (pass || s == 0.0)
    })
  }

  test("perplexity is positive, bounded, and whitespace-padding stable (property)") {
    val m = Perplexity.buildModel()
    check(Prop.forAll(textGen) { t =>
      val p = m.score(t)
      val padded = m.score("   " + t.take(4000))
      p > 0.0 && p <= Perplexity.MaxPpl &&
        (t.trim.isEmpty || t.length > 4000 || math.abs(p - padded) < 1e-9 * p + 1e-9)
    })
  }

  test("stage-2 dims always in [1,10] or the 5.0 default (property)") {
    check(Prop.forAll(textGen, Gen.choose(0L, 100000L), Gen.choose(0L, 1000L)) {
      (t, words, refs) =>
        val dims = Seq(
          Stages.dimMathErrorsStr(refs, words),
          Stages.dimPhysicsAssumptionsStr(t),
          Stages.dimLogicalConsistencyStr(math.max(1.0, words.toDouble), t),
          Stages.dimLiteratureIntegrationStr(refs, t))
        dims.forall(d => d >= 1.0 && d <= 10.0 || d == 5.0)
    })
  }
}
