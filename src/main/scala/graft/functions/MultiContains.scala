package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-literal containment mask: bit i of the result is set
  * iff `lower(text)` contains `terms(i)`.
  *
  * The builder anchor guards are conjunctions of `lower(text).contains`
  * checks — 30-50 per battery family. Each Column `contains` is a
  * separate full-text scan (the worst case, a term that is ABSENT, scans
  * the entire document), so anchor-free web text paid ~n×terms byte
  * scans per row even with the batteries themselves skipped. This
  * expression folds all terms into ONE pass over the bytes: a 256-entry
  * first-byte dispatch table mapping each (case-folded) byte to the
  * terms starting with it, then a bounded memcmp per candidate — the
  * poor man's Aho-Corasick, which suffices because membership is
  * re-tested at every position anyway. The scan also exits early once
  * every term has been found (anchor-RICH text exits fastest).
  *
  * Case semantics must equal `Lower(text)` + `Contains`: the fast path
  * folds ASCII A-Z byte-wise, which is exact for pure-ASCII text and
  * pure-ASCII lowercase terms; any non-ASCII byte in the text routes the
  * whole document through UTF8String.toLowerCase + contains — the exact
  * Column semantics (MultiContainsSpec property-tests parity on random
  * Unicode). Terms are capped at 63 so the mask fits a Long with a
  * sentinel-free "all found" compare.
  *
  * CodegenFallback is deliberate: the guards live inside higher-order
  * function lambdas, which Spark always evaluates interpreted — a
  * doGenCode body would never run there.
  */
case class MultiContainsMaskExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(terms.nonEmpty && terms.length <= 63,
    s"1..63 terms required, got ${terms.length}")
  require(terms.forall(t => t.nonEmpty && t == t.toLowerCase),
    "terms must be non-empty lowercase")

  override def dataType: DataType = LongType

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes("UTF-8")).toArray

  @transient private lazy val asciiTerms: Boolean =
    termBytes.forall(_.forall(b => (b & 0x80) == 0))

  /** dispatch(b) = indices of terms whose first byte case-folds to b. */
  @transient private lazy val dispatch: Array[Array[Int]] = {
    val d = Array.fill(256)(List.empty[Int])
    termBytes.zipWithIndex.foreach { case (tb, i) =>
      val b0 = tb(0) & 0xff
      d(b0) = i :: d(b0)
    }
    d.map(_.reverse.toArray)
  }

  private def fold(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  private val allMask: Long = (1L << terms.length) - 1

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    // fast path requires pure-ASCII text (byte-folding == toLowerCase
    // there) and pure-ASCII terms; the ASCII check rides the scan itself
    // (no separate pre-pass, no getBytes copy — getByte reads in place)
    if (!asciiTerms) return slowEval(s)
    var mask = 0L
    var i = 0
    while (i < n && mask != allMask) {
      val b = s.getByte(i)
      if ((b & 0x80) != 0) return slowEval(s)
      val cand = dispatch(fold(b) & 0xff)
      var j = 0
      while (j < cand.length) {
        val ti = cand(j)
        if ((mask & (1L << ti)) == 0L) {
          val tb = termBytes(ti)
          if (i + tb.length <= n) {
            var k = 1
            var ok = true
            while (ok && k < tb.length) {
              val bk = s.getByte(i + k)
              // a non-ASCII byte inside a candidate window cannot match
              // an ASCII term byte, so folding it is moot — but it also
              // means the doc is not pure ASCII: bail to the exact path
              if ((bk & 0x80) != 0) return slowEval(s)
              ok = fold(bk) == tb(k)
              k += 1
            }
            if (ok && k == tb.length) mask |= 1L << ti
          }
        }
        j += 1
      }
      i += 1
    }
    mask
  }

  private def slowEval(s: UTF8String): Long = {
    val lowered = s.toLowerCase
    var mask = 0L
    var i = 0
    while (i < termBytes.length) {
      if (lowered.contains(UTF8String.fromBytes(termBytes(i)))) mask |= 1L << i
      i += 1
    }
    mask
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContainsMaskExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_multi_contains_mask"
}

object MultiContainsMask {
  /** Column form: a Long whose bit i says `lower(text) contains terms(i)`. */
  def apply(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MultiContainsMaskExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text), terms))

  /** The bit test for one anchor GROUP (any-of): (mask & groupBits) != 0. */
  def anyOf(mask: Column, terms: Seq[String], group: Seq[String]): Column = {
    import org.apache.spark.sql.functions.lit
    val bits = group.map { t =>
      val i = terms.indexOf(t)
      require(i >= 0, s"group term '$t' missing from mask terms")
      1L << i
    }.reduce(_ | _)
    mask.bitwiseAND(lit(bits)) =!= 0L
  }

  /** The full anchor guard: every group has at least one present term. */
  def allGroups(mask: Column, terms: Seq[String],
                anchors: Seq[Seq[String]]): Column =
    anchors.map(g => anyOf(mask, terms, g)).reduce(_ && _)
}
