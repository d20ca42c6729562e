package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{MultiContainsMask, MultiContainsMaskExpr}
import graft.derive.{RlBuilder, UgBuilders}

/** MultiContainsMaskExpr must agree bit-for-bit with the Column form
  * `lower(text).contains(term)` — on ASCII (fast path), on arbitrary
  * Unicode (slow path, exact toLowerCase+contains), and on the real
  * anchor term lists the builders use.
  */
class MultiContainsSpec extends SparkTestBase {
  import spark.implicits._

  private def maskOf(texts: Seq[String], terms: Seq[String]): Seq[Long] =
    texts.toDF("text")
      .select(MultiContainsMask(col("text"), terms).as("m"))
      .collect().map(_.getLong(0)).toSeq

  private def referenceMask(texts: Seq[String], terms: Seq[String]): Seq[Long] =
    texts.toDF("text").select(
      terms.zipWithIndex.map { case (t, i) =>
        when(lower(col("text")).contains(t), lit(1L << i)).otherwise(0L)
      }.reduce(_ + _).as("m"))
      .collect().map(_.getLong(0)).toSeq

  test("mask equals per-term lower+contains on the builder corpora") {
    val texts = (0L until 80L).map(graft.fixtures.SynthCorpus.bodyFor) ++ Seq(
      "", " ", "PROBLEM: X SOLUTION: Y", "problem solution",
      "The VALUE OF x = 3. Thus y.", "wE hAvE a = b ThErEfOrE c",
      "ünïcödé PROBLEM: ös SOLUTION: ß", "Straße ẞ FIND. We Have x",
      "İstanbul problem solution", "ĸelvin K problem")
    for (terms <- Seq(RlBuilder.V2AnchorTerms, RlBuilder.V3AnchorTerms,
      UgBuilders.UgWordAnchorTerms)) {
      assert(maskOf(texts, terms) == referenceMask(texts, terms))
    }
  }

  test("mask equals per-term lower+contains on random unicode (property)") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.Literal
    val terms = Seq("problem", "we have", "=", "therefore", "q.e.d.", "step")
    // eval-level check against the exact Column semantics
    // (UTF8String.toLowerCase + UTF8String.contains) — no Spark job per
    // sample, so thousands of cases run fast
    def exprMask(t: String): Long =
      MultiContainsMaskExpr(Literal(UTF8String.fromString(t)), terms)
        .eval(null).asInstanceOf[Long]
    def refMask(t: String): Long = {
      val lo = UTF8String.fromString(t).toLowerCase
      terms.zipWithIndex.map { case (term, i) =>
        if (lo.contains(UTF8String.fromString(term))) 1L << i else 0L
      }.reduce(_ | _)
    }
    val textGen: Gen[String] = Gen.frequency(
      3 -> Gen.asciiPrintableStr,
      2 -> Gen.listOf(Gen.oneOf("PROBLEM", "We HaVe", "=", "İ", "K",
        "ß", "Straße", "THEREFORE", "q.E.d.", "sTeP", "α", "ﬁ", "\n"))
        .map(_.mkString(" ")),
      1 -> Gen.listOf(Gen.choose(0x20.toChar, 0x2FF.toChar)).map(_.mkString))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(1000),
      Prop.forAll(textGen)(t => exprMask(t) == refMask(t)))
    assert(res.passed, res.status.toString)
  }

  test("all-terms-found early exit returns the full mask") {
    // the fast path stops scanning once every term is found — on a text
    // containing all terms (uppercased, with trailing content) the mask
    // must still be exactly allMask, matching the reference
    for (terms <- Seq(RlBuilder.V2AnchorTerms, RlBuilder.V3AnchorTerms,
      UgBuilders.UgWordAnchorTerms)) {
      val text = terms.map(_.toUpperCase).mkString(" ") + " trailing tail " * 50
      assert(maskOf(Seq(text), terms) == referenceMask(Seq(text), terms))
      assert(maskOf(Seq(text), terms).head == (1L << terms.length) - 1)
    }
  }

  test("allGroups matches the conjunction-of-disjunctions form") {
    val terms = RlBuilder.V2AnchorTerms
    val anchors = RlBuilder.ExplicitAnchors.head
    val texts = Seq("problem here solution there", "problem only",
      "solution only", "neither", "Example: e ANSWER: a")
    val got = texts.toDF("text").select(
      MultiContainsMask.allGroups(
        MultiContainsMask(col("text"), terms), terms, anchors).as("g"))
      .collect().map(_.getBoolean(0)).toSeq
    val want = texts.map { t =>
      val lo = t.toLowerCase
      anchors.forall(g => g.exists(lo.contains))
    }
    assert(got == want)
  }
}
