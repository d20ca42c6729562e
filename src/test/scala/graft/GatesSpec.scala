package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.derive.Gates
import graft.sources.Feeds

/** Golden tests for the remaining §2 operators (P9/P10/P12/P14, C7/C9/C11/
  * C12, E9/E14/E19/E27, S2/S4/S10).
  */
class GatesSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, in: String): org.apache.spark.sql.Row =
    Seq(in).toDF("t").select(c.as("r")).head()

  test("P9 meaningful-equation predicate") {
    def check(s: String) = one(Gates.isMeaningfulEquation(col("t")), s).getBoolean(0)
    assert(check("E = m c^2 + p")) // '=', physics var E, op +, len>8
    assert(!check("x = y"))        // too short
    assert(!check("energy balance holds")) // no '='
  }

  test("P10 meaningful-numerical predicate") {
    def check(s: String) = one(Gates.isMeaningfulNumerical(col("t")), s).getBoolean(0)
    assert(check("42 J of energy"))
    assert(!check("no digits here at all"))
    assert(!check("12345"))       // digits but no physics context... ('a'? no)
  }

  test("P12 benchmark eligibility") {
    val df = Seq((Seq("issue"), 0.1), (Seq[String](), 0.35), (Seq[String](), 0.1))
      .toDF("issues", "score")
    val got = df.select(Gates.benchmarkEligible(col("issues"), col("score"))).collect()
      .map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, true, false))
  }

  test("C7 derivation clean: artifacts stripped, meaningful sentences joined") {
    val in = "We derive the energy balance from first principles [12]. " +
      "Page 3 noise here....... " +
      "Therefore the force equals mass times acceleration Eq. (4). short."
    val got = one(Gates.derivationClean(col("t")), in).getString(0)
    assert(got.contains("derive the energy"))
    assert(!got.contains("[12]"))
    assert(!got.contains("Eq. (4)"))
    assert(got.endsWith("."))
  }

  test("C9 clean+validate returns NULL on junk, cleaned text on physics") {
    val good = one(Gates.cleanAndValidate(col("t")),
      "the energy of the particle is E = 5 J in this trap").getString(0)
    assert(good != null && good.contains("energy"))
    assert(one(Gates.cleanAndValidate(col("t")), "zx qv plk wrt nmb").isNullAt(0))
    assert(one(Gates.cleanAndValidate(col("t")), "short").isNullAt(0))
  }

  test("C11/C12 markdown + latex normalizers") {
    val md = one(Gates.nougatMarkdownClean(col("t")),
      "# Header\n**bold** and *it* and `code`\n|a|b|\n").getString(0)
    assert(!md.contains("#") && !md.contains("**") && !md.contains("|"))
    val lx = one(Gates.latexNormalize(col("t")), "x$a+b$y").getString(0)
    assert(lx == "x $a+b$ y")
  }

  test("E9 latex quality score formula") {
    val t = ("\\frac{a}{b} \\partial \\alpha $x$ " + ("pad " * 50)).take(1000)
    val got = one(Gates.latexQualityScore(col("t")), t).getDouble(0)
    assert(got > 0.0 && got <= 1.0)
    assert(one(Gates.latexQualityScore(col("t")), "").getDouble(0) == 0.0)
  }

  test("E14 problem/solution split at first separator end; midpoint fallback") {
    val r = one(Gates.problemSolutionParts(col("t")),
      "Find the mass. Solution: m equals E over c squared.")
    assert(r.getStruct(0).getString(0).endsWith("Solution:"))
    assert(r.getStruct(0).getString(1).startsWith("m equals"))
    val fb = one(Gates.problemSolutionParts(col("t")), "abcdefgh")
    assert(fb.getStruct(0).getString(0) == "abcd")
    assert(fb.getStruct(0).getString(1) == "efgh")
  }

  test("E19 physics domain classifier from subject") {
    def d(s: String) = one(Gates.physicsDomain(col("t")), s).getString(0)
    assert(d("Classical Mechanics") == "mechanics")
    assert(d("Electromagnetism and fields") == "electromagnetism")
    assert(d("Quantum Gravity") == "quantum") // quantum wins before relativity
    assert(d("underwater basket weaving") == "general_physics")
  }

  test("E27 robust model-JSON parsing: fences + span extraction + defaults") {
    val schema = StructType(Seq(
      StructField("pass", BooleanType), StructField("score", DoubleType)))
    val inputs = Seq(
      """```json
        |{"pass": true, "score": 0.7}
        |```""".stripMargin,
      """noise before {"pass": false, "score": 0.1} noise after""",
      "no json at all")
    val got = inputs.toDF("t")
      .select(Gates.parseModelJson(col("t"), schema).as("j")).collect()
    assert(got(0).getStruct(0).getBoolean(0))
    assert(got(1).getStruct(0).getDouble(1) == 0.1)
    assert(got(2).isNullAt(0) || got(2).getStruct(0) == null)
  }

  test("S2 Atom entry parse with null-tolerant defaults") {
    val xml =
      """<entry><id>http://arxiv.org/abs/1234.5678</id>
        |<title>A Title</title><summary>Sum</summary>
        |<published>2024-01-01T00:00:00Z</published>
        |<author><name>A. Author</name></author>
        |<author><name>B. Author</name></author></entry>""".stripMargin
    val r = one(Feeds.parseAtomEntry(col("t")), xml).getStruct(0)
    assert(r.getString(1) == "A Title")
    assert(r.getSeq[String](4) == Seq("A. Author", "B. Author"))
    val empty = one(Feeds.parseAtomEntry(col("t")), "<entry></entry>").getStruct(0)
    assert(empty.getString(1) == "Untitled")
  }

  test("S4 viXra listing parse: rich tier with simple-ID fallback") {
    val richPage =
      "[3003] viXra:2505.0145 [pdf] submitted on 2025-05-12 11:22:33 " +
        "Authors: Alice One, Bob Two\nmore text"
    val r = one(Feeds.parseVixraListing(col("t")), richPage).getSeq[org.apache.spark.sql.Row](0)
    assert(r.nonEmpty)
    assert(r.head.getString(0) == "2505.0145")
    assert(r.head.getSeq[String](2) == Seq("Alice One", "Bob Two"))
    val simplePage = "see viXra:1111.2222 and viXra:3333.4444 and viXra:1111.2222"
    val s = one(Feeds.parseVixraListing(col("t")), simplePage).getSeq[org.apache.spark.sql.Row](0)
    assert(s.map(_.getString(0)) == Seq("1111.2222", "3333.4444"))
  }

  test("S10 category dim broadcast join") {
    val df = Seq(("gr-qc", 1), ("quant", 2), ("nope", 3)).toDF("category", "x")
    val joined = Feeds.withCategoryName(df, "category")
    val m = joined.collect().map(r => r.getInt(1) -> r.getAs[String]("category_name")).toMap
    assert(m(1) == "General Relativity and Quantum Cosmology")
    assert(m(2) == "Quantum Physics")
    assert(m(3) == null)
    assert(joined.queryExecution.executedPlan.toString.contains("Broadcast"))
  }
}
