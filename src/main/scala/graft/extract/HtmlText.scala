package graft.extract

import java.nio.charset.StandardCharsets
import java.nio.charset.CodingErrorAction
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** E1 — deterministic HTML → text extraction (SURVEY.md §2.4 E1).
  *
  * The reference extracts text from PDF bytes with pdfplumber, falling back
  * to PyPDF2 on exception (reference: analysis/pdf_processor.py:25-65). The
  * graft's input is `html: binary` (BASELINE.json input_hint), so the analog
  * is a deterministic tag-stripping/entity-decoding extractor with the same
  * rich-parse → simple-strip fallback chain.
  *
  * This is the byte-identical-per-url invariant surface: a single canonical
  * implementation, golden-file tested, used both by the Spark pipeline (as a
  * UDF — the one documented non-codegen point besides the perplexity scorer)
  * and by the row-at-a-time oracle.
  */
object HtmlText {

  /** Lossy UTF-8 decode: drops malformed byte sequences, mirroring Python's
    * `bytes.decode('utf-8', errors='ignore')` used throughout the reference
    * (e.g. enhanced_paper_analyser.py:900).
    */
  def decodeUtf8Ignore(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)
    dec.decode(ByteBuffer.wrap(bytes)).toString
  }

  // Block-level tags that imply a paragraph/line break when stripped.
  private val BlockTags =
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|section|article|header|footer|blockquote|pre"

  private val EntityMap: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "#39" -> "'", "nbsp" -> " ",
    // common Latin-1 named entities seen in web text
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à", "ccedil" -> "ç",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß",
    "ntilde" -> "ñ", "copy" -> "©", "reg" -> "®", "deg" -> "°",
    "middot" -> "·", "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "'", "rsquo" -> "'", "ldquo" -> "“", "rdquo" -> "”"
  )

  private val CommentRe = "(?s)<!--.*?-->".r
  private val ScriptStyleRe = "(?is)<(script|style|head|noscript)\\b[^>]*>.*?</\\1\\s*>".r
  private val BlockOpenCloseRe = ("(?is)</?(" + BlockTags + ")\\b[^>]*>").r
  private val AnyTagRe = "(?s)<[^>]+>".r
  private val EntityRe = "&(#?[0-9a-zA-Z]+);".r

  private def decodeEntities(s: String): String =
    EntityRe.replaceAllIn(s, m => {
      val name = m.group(1)
      val rep =
        if (name.startsWith("#x") || name.startsWith("#X"))
          try String.valueOf(Integer.parseInt(name.drop(2), 16).toChar)
          catch { case _: Exception => m.matched }
        else if (name.startsWith("#"))
          try String.valueOf(Integer.parseInt(name.drop(1)).toChar)
          catch { case _: Exception => m.matched }
        else EntityMap.getOrElse(name, m.matched)
      java.util.regex.Matcher.quoteReplacement(rep)
    })

  private val BlockTagSet: Set[String] = BlockTags.split('|').toSet
  private val SkipTagSet: Set[String] = Set("script", "style", "head", "noscript")

  /** Rich extraction: strips comments, script/style/head blocks, turns block
    * tags into newlines, strips remaining tags, decodes entities, and
    * normalizes blank-line runs. Analogous to the reference's pdfplumber
    * page-join with "\n\n" (pdf_processor.py:46-49).
    *
    * Implemented as a SINGLE-PASS scanner: the original 4-regex-pass chain
    * materialized four full copies of the page per document — pure memory
    * traffic, which is the measured scaling bottleneck on string pipelines
    * (BENCH/BASELINE.md §2). One forward scan allocates one output buffer.
    */
  def extractRich(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // parse tag name (skip optional '/')
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          if (!closing && SkipTagSet.contains(name)) {
            // skip to the matching close tag (case-insensitive), then to '>'
            val close = "</" + name
            var k = i + 1
            var found = -1
            while (found < 0 && k >= 0 && k < n) {
              k = html.indexOf('<', k)
              if (k < 0) found = -2
              else if (k + close.length <= n &&
                html.regionMatches(true, k, close, 0, close.length)) found = k
              else k += 1
            }
            if (found >= 0) {
              val gt = html.indexOf('>', found)
              i = if (gt < 0) n else gt + 1
            } else i = n
          } else {
            if (BlockTagSet.contains(name)) sb.append("\n\n")
            val gt = html.indexOf('>', i)
            i = if (gt < 0) n else gt + 1
          }
        }
      } else if (c == '&') {
        // inline entity decode: &name; or &#nnn; or &#xhh; within 12 chars
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val name = html.substring(i + 1, semi)
          val rep: String =
            if (name.startsWith("#x") || name.startsWith("#X"))
              try String.valueOf(Integer.parseInt(name.substring(2), 16).toChar)
              catch { case _: Exception => null }
            else if (name.startsWith("#"))
              try String.valueOf(Integer.parseInt(name.substring(1)).toChar)
              catch { case _: Exception => null }
            else EntityMap.getOrElse(name, null)
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else {
        sb.append(c)
        i += 1
      }
    }
    // normalize: trim each line, collapse 3+ newlines to exactly two
    val s = sb.toString.split("\n", -1).map(_.trim).mkString("\n")
    s.replaceAll("\n{3,}", "\n\n").trim
  }

  /** Simple fallback: strip every tag, decode entities. Mirrors the
    * reference's PyPDF2 fallback (pdf_processor.py:51-59).
    */
  def extractSimple(html: String): String =
    decodeEntities(AnyTagRe.replaceAllIn(html, " ")).trim

  /** Canonical extraction with the fallback chain (try/catch mirrors the
    * reference's try pdfplumber / except → PyPDF2 at pdf_processor.py:42-59).
    */
  def extract(bytes: Array[Byte]): String = {
    val html = decodeUtf8Ignore(bytes)
    if (html.isEmpty) return ""
    try extractRich(html)
    catch { case _: Exception => extractSimple(html) }
  }

  /** FUSED extract + C1 basic clean: one forward scan from decoded html to
    * the final cleaned text (the round-1 stretch item — the pipeline's
    * remaining DRAM traffic was the extraction output materializations:
    * scan buffer → per-line strings → join → newline-collapse regex →
    * clean pass → output, six string copies per document; this emits ONE).
    *
    * Why it is equivalent to `basicCleanStr(extractRich(html))`: C1
    * collapses every (?U)\s run to a single space and strips non-ASCII, so
    * extractRich's intermediate line-trim/newline-collapse normalization —
    * pure whitespace restructuring — is invisible to the cleaned output.
    * The scan therefore classifies each emitted char directly with the C1
    * rules (ws-run → one ' '; non-ASCII dropped WITHOUT merging adjacent
    * ws runs — the reference's collapse-before-strip order, cf.
    * basicCleanFastStr). Block tags count as whitespace (they inserted
    * "\n\n"); comments/script blocks emit nothing and leave the ws-run
    * state untouched, exactly like their removal did.
    *
    * Documented divergence (same class as the U+001C note in Clean): a C0
    * control char that is NOT Unicode whitespace sitting at a line edge
    * was stripped by extractRich's per-line trim but is kept here; no
    * reference input path can produce one (they never survive the
    * reference's own cleaning) and the fixture/corpus generators emit
    * none. Equality vs the chained form is property-tested over the
    * corpus and an html-shaped generator in StatsFusedSpec/PropertySpec.
    */
  def extractCleanStr(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var prevWs = false
    @inline def emit(c: Char): Unit = {
      if (graft.rules.TokenStats.isUnicodeWs(c)) {
        if (!prevWs) sb.append(' ')
        prevWs = true
      } else {
        prevWs = false
        if (c <= 0x7F) sb.append(c)
      }
    }
    @inline def emitWs(): Unit = { if (!prevWs) sb.append(' '); prevWs = true }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          if (!closing && SkipTagSet.contains(name)) {
            val close = "</" + name
            var k = i + 1
            var found = -1
            while (found < 0 && k >= 0 && k < n) {
              k = html.indexOf('<', k)
              if (k < 0) found = -2
              else if (k + close.length <= n &&
                html.regionMatches(true, k, close, 0, close.length)) found = k
              else k += 1
            }
            if (found >= 0) {
              val gt = html.indexOf('>', found)
              i = if (gt < 0) n else gt + 1
            } else i = n
          } else {
            if (BlockTagSet.contains(name)) emitWs() // was "\n\n"
            val gt = html.indexOf('>', i)
            i = if (gt < 0) n else gt + 1
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val name = html.substring(i + 1, semi)
          val rep: String =
            if (name.startsWith("#x") || name.startsWith("#X"))
              try String.valueOf(Integer.parseInt(name.substring(2), 16).toChar)
              catch { case _: Exception => null }
            else if (name.startsWith("#"))
              try String.valueOf(Integer.parseInt(name.substring(1)).toChar)
              catch { case _: Exception => null }
            else EntityMap.getOrElse(name, null)
          if (rep != null) {
            var r = 0
            while (r < rep.length) { emit(rep.charAt(r)); r += 1 }
            i = semi + 1
          } else { emit(c); i += 1 }
        } else { emit(c); i += 1 }
      } else {
        emit(c)
        i += 1
      }
    }
    sb.toString.trim
  }

  /** Fused bytes → cleaned text with the same fallback discipline as
    * `extract` (scan failure → simple strip + chained clean).
    */
  def extractClean(bytes: Array[Byte]): String = {
    val html = decodeUtf8Ignore(bytes)
    if (html.isEmpty) return ""
    try extractCleanStr(html)
    catch { case _: Exception => Clean.basicCleanFastStr(extractSimple(html)) }
  }

  /** Column form. A deterministic Scala UDF — the extraction is genuinely
    * imperative (fallback chain + stateful entity decode), one of the two
    * sanctioned non-expression points (SURVEY.md §7.3).
    */
  private val extractUdf = udf((b: Array[Byte]) => extract(b))

  def extractCol(c: Column): Column = extractUdf(c)
}
