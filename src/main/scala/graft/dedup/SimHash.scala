package graft.dedup

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass SimHash (the 64-bit near-dup signature of
  * Dedup.simhashHof).
  *
  * The pure-Catalyst form is an `aggregate`/`zip_with` doing 64 interpreted
  * lambda evaluations PER TOKEN with boxing — the exact interpreted-HOF
  * shape measured at ~100x native cost elsewhere in this repo (round-1
  * verdict; cf. the TokenStatsExpr / BlockExtractExpr history). This
  * computes the identical signature in one forward scan: tokenize on
  * ASCII-\s runs of the lowercased text (Java regex `\s` — matching
  * `split(lower(text), "\\s+")` exactly), hash each token with Spark's own
  * xxhash64 (XxHash64Function, seed 42 — bit-identical to the `xxhash64`
  * SQL function the HOF form calls), accumulate 64 signed bit votes,
  * sign-pack. Equality vs the HOF form is property-tested in DedupSpec.
  */
object SimHash {

  @inline private def isJavaRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar /* U+000B vertical tab */ || c == '\f' || c == '\r'

  /** Signature of the already-lowercased string (empty/blank → 0L). */
  def compute(s: String): Long = {
    val votes = new Array[Int](64)
    val n = s.length
    var i = 0
    var start = -1
    while (i <= n) {
      if (i == n || isJavaRegexWs(s.charAt(i))) {
        if (start >= 0) {
          val h = XxHash64Function.hash(
            UTF8String.fromString(s.substring(start, i)), StringType, 42L)
          var b = 0
          while (b < 64) {
            votes(b) += (((h >>> b) & 1L).toInt << 1) - 1 // +1 if bit set else -1
            b += 1
          }
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Codegen entry: lowercases via UTF8String (identical to `lower()`). */
  def computeLong(u: UTF8String): Long = compute(u.toLowerCase.toString)
}

/** Catalyst wrapper, registered as `graft_simhash`. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHash.computeLong(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.SimHash.computeLong($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}
