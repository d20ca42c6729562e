package graft.derive

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused E13 block extraction (complete derivations / worked solutions /
  * proofs) — the Catalyst form ran 14 `regexp_extract_all` materializations
  * plus an interpreted 33-`Contains` filter lambda per candidate block;
  * this runs the same compiled patterns and the same filter logic in plain
  * Scala (micro-benchmark: ~1 ms/doc vs ~100 ms/doc through interpreted
  * higher-order expressions). Semantics identical to
  * Extract.completeDerivations/workedSolutions/mathematicalProofs —
  * equality-tested in DeriveSpec.
  */
object BlockExtract {

  private val derivPs = Extract.CompleteDerivationPatterns.map(java.util.regex.Pattern.compile)
  private val solPs = Extract.WorkedSolutionPatterns.map(java.util.regex.Pattern.compile)
  private val proofPs = Extract.ProofPatterns.map(java.util.regex.Pattern.compile)

  private val PhysTerms = Array("equation", "energy", "force", "field",
    "particle", "wave", "quantum", "mass", "velocity", "acceleration")
  private val VixraTerms = Array("gravity", "gravitational", "universe",
    "cosmic", "theory", "model", "physics", "space", "time")
  private val CommonEn = Array("the", "and", "of", "to", "a", "in", "we",
    "can", "from", "with", "is", "are", "this", "that")

  /** Exact mirror of Extract.containsEnglishPhysicsTerms (substring, 0/1). */
  def containsEnglishPhysicsTerms(s: String): Boolean = {
    val lo = graft.extract.Clean.sparkLower(s)
    var phys = 0; var vix = 0; var en = 0
    PhysTerms.foreach(t => if (lo.contains(t)) phys += 1)
    VixraTerms.foreach(t => if (lo.contains(t)) vix += 1)
    CommonEn.foreach(t => if (lo.contains(t)) en += 1)
    (phys >= 1 || vix >= 2) && en >= 2
  }

  private def battery(text: String, ps: Seq[java.util.regex.Pattern],
                      minLen: Int, maxLen: Int, cap: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    ps.foreach { p =>
      val m = p.matcher(text)
      while (m.find()) {
        val s = m.group(0)
        if (s.length > minLen && s.length < maxLen && containsEnglishPhysicsTerms(s))
          out += s
      }
    }
    out.take(cap).toArray
  }

  /** (derivations[:7], solutions[:7], proofs[:3]) in one call —
    * windows/caps per enhanced_paper_analyser.py:739-800.
    */
  def compute(text: String): (Array[String], Array[String], Array[String]) = {
    if (text == null || text.isEmpty)
      return (Array.empty, Array.empty, Array.empty)
    (battery(text, derivPs, 100, 2500, 7),
      battery(text, solPs, 80, 1800, 7),
      battery(text, proofPs, 100, 1200, 3))
  }

  def computeRow(u: UTF8String): InternalRow = {
    val (d, s, p) = compute(if (u == null) null else u.toString)
    def arr(a: Array[String]) =
      new GenericArrayData(a.map(x => UTF8String.fromString(x).asInstanceOf[Any]))
    new GenericInternalRow(Array[Any](arr(d), arr(s), arr(p)))
  }

  val OutSchema: StructType = StructType(Seq(
    StructField("derivations", ArrayType(StringType), nullable = false),
    StructField("solutions", ArrayType(StringType), nullable = false),
    StructField("proofs", ArrayType(StringType), nullable = false)))
}

case class BlockExtractExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BlockExtract.OutSchema
  override def nullSafeEval(input: Any): Any =
    BlockExtract.computeRow(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.derive.BlockExtract.computeRow($c)")
  override protected def withNewChildInternal(newChild: Expression): BlockExtractExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_blocks"
}
