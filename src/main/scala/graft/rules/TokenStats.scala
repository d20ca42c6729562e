package graft.rules

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass token statistics (E2 + E5-dots + E6).
  *
  * The pure-Catalyst form tokenizes the full text with `split` per use and
  * scans a 15-term array per token (`array_contains`) — for a 3,000-token
  * page that is two full tokenizations plus ~90k string comparisons per
  * row. This expression computes word count, physics-term count, math-term
  * count, and dot count in ONE forward scan with hash-set membership.
  *
  * Tokenizer parity: Python `str.split()` / `(?U)\s+` semantics — the
  * Unicode White_Space property. Java's `Character.isWhitespace` differs in
  * exactly two ways (it excludes NBSP-family spaces and includes
  * U+001C–U+001F), both corrected below, so counts match the regex mirrors
  * bit-for-bit (property-tested in StatsFusedSpec).
  */
object TokenStats {

  val PhysicsSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Heuristics.PhysicsTerms.foreach(s.add)
    s
  }
  val MathSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Heuristics.MathTerms.foreach(s.add)
    s
  }

  @inline def isUnicodeWs(c: Char): Boolean =
    (Character.isWhitespace(c) && !(c >= 0x1C && c <= 0x1F)) ||
      c == '\u0085' || c == '\u00A0' || c == '\u2007' || c == '\u202F'

  /** One pass: (word_count, physics_terms, math_terms, dot_count). */
  def compute(s: String): Array[Long] = {
    val out = new Array[Long](4)
    if (s == null || s.isEmpty) return out
    val n = s.length
    var i = 0
    var tokStart = -1
    val tok = new java.lang.StringBuilder(24)
    def endToken(): Unit = {
      if (tokStart >= 0) {
        out(0) += 1
        val w = tok.toString
        if (PhysicsSet.contains(w)) out(1) += 1
        else if (MathSet.contains(w)) out(2) += 1
        tok.setLength(0)
        tokStart = -1
      }
    }
    while (i < n) {
      val c = s.charAt(i)
      if (isUnicodeWs(c)) endToken()
      else {
        if (tokStart < 0) tokStart = i
        tok.append(Character.toLowerCase(c))
        if (c == '.') out(3) += 1
      }
      i += 1
    }
    endToken()
    // dots outside tokens are impossible (non-ws chars are all in tokens),
    // but dots can only be counted inside the loop's else-branch — count is
    // total '.' occurrences, matching length-delta dotCount
    out
  }

  /** Codegen entry: UTF8String in, InternalRow(word, physics, math, dots). */
  def computeRow(u: UTF8String): InternalRow = {
    val a = compute(if (u == null) null else u.toString)
    new GenericInternalRow(Array[Any](a(0), a(1), a(2), a(3)))
  }

  val OutSchema: StructType = StructType(Seq(
    StructField("word_count", LongType, nullable = false),
    StructField("physics_terms", LongType, nullable = false),
    StructField("math_terms", LongType, nullable = false),
    StructField("dot_count", LongType, nullable = false)))
}

/** Fused pattern-count battery (E3 math expressions + E4 references + E8
  * equation battery): the Catalyst form runs 10 `regexp_extract_all` passes
  * per row, each MATERIALIZING every match string just to take the array
  * size. This runs the same 10 precompiled patterns with find()-only loops —
  * no substring extraction, one UTF8String→String conversion total.
  * Patterns and counting semantics identical to Heuristics (parity-tested).
  */
object PatternCounts {

  private val mathPs = Heuristics.MathPatterns.map(java.util.regex.Pattern.compile)
  private val refP = java.util.regex.Pattern.compile(Heuristics.RefPatternBasic)
  private val eqPs = Heuristics.EquationPatterns.map(java.util.regex.Pattern.compile)

  @inline private def countOf(p: java.util.regex.Pattern, s: String): Long = {
    val m = p.matcher(s)
    var c = 0L
    while (m.find()) c += 1
    c
  }

  /** (math_expressions, reference_count, equation_count) in one call. */
  def compute(s: String): Array[Long] = {
    if (s == null || s.isEmpty) return new Array[Long](3)
    val out = new Array[Long](3)
    mathPs.foreach(p => out(0) += countOf(p, s))
    out(1) = countOf(refP, s)
    eqPs.foreach(p => out(2) += countOf(p, s))
    out
  }

  def computeRow(u: UTF8String): InternalRow = {
    val a = compute(if (u == null) null else u.toString)
    new GenericInternalRow(Array[Any](a(0), a(1), a(2)))
  }

  val OutSchema: StructType = StructType(Seq(
    StructField("math_expressions", LongType, nullable = false),
    StructField("reference_count", LongType, nullable = false),
    StructField("equation_count", LongType, nullable = false)))
}

case class PatternCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PatternCounts.OutSchema
  override def nullSafeEval(input: Any): Any =
    PatternCounts.computeRow(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.rules.PatternCounts.computeRow($c)")
  override protected def withNewChildInternal(newChild: Expression): PatternCountsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_pattern_counts"
}

/** The Catalyst expression wrapper (registered as `graft_token_stats`). */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStats.OutSchema

  override def nullSafeEval(input: Any): Any =
    TokenStats.computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.rules.TokenStats.computeRow($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_token_stats"
}
