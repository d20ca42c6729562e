package graft.lang

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P4 — language identification (SURVEY.md §2.2 P4, §2.7).
  *
  * Two implementations, per BASELINE.json north_rule:
  *
  * 1. `englishStopwordCount` — the reference's exact semantics: count how
  *    many of a fixed stopword list occur (substring containment, 0/1 each)
  *    in the lowercased first-K-chars sample
  *    (reference: enhanced_paper_analyser.py:152-160; 14-word variant
  *    :716-724). Pure Catalyst — stays in whole-stage codegen.
  *
  * 2. `NgramModel` — a fastText-style hashed char-n-gram linear classifier:
  *    hashed trigram features → per-language weight table → argmax. The
  *    weight table is built deterministically from embedded per-language
  *    marker lexicons (no training data exists in the sandbox; the model is
  *    a fixed, reproducible profile). It is broadcast to executors and
  *    applied inside `mapPartitions` so the table lookup is amortized per
  *    batch, not per row (SURVEY.md §2.7 M2 pattern).
  */
object LangId {

  /** The reference's 10-word list (enhanced_paper_analyser.py:152). */
  val EnglishStopwords10: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "that", "is", "for", "with")

  /** The 14-word training-gate variant (enhanced_paper_analyser.py:716). */
  val EnglishStopwords14: Seq[String] =
    EnglishStopwords10 ++ Seq("equation", "we", "can", "from")

  /** Count of stopwords present (substring containment, each counted 0/1)
    * in `lower(substring(text, 1, sampleLen))` — exact reference semantics:
    * `sum(1 for word in english_words if word in text_sample)`.
    */
  def englishStopwordCount(text: Column, words: Seq[String] = EnglishStopwords10,
                           sampleLen: Int = 1000): Column = {
    val sample = lower(substring(text, 1, sampleLen))
    words.map(w => when(sample.contains(w), 1).otherwise(0).cast("int"))
      .reduce(_ + _)
  }

  /** Reference keep-threshold: >= 2 for viXra-like, >= 3 otherwise
    * (enhanced_paper_analyser.py:158-160).
    */
  def isEnglishStopword(text: Column, threshold: Int = 3): Column =
    englishStopwordCount(text) >= threshold

  /** Plain-Scala mirror for the oracle — exact Column semantics:
    * code-point sampling (Spark substring) + Spark lower (sparkLower).
    */
  def englishStopwordCountStr(text: String, words: Seq[String] = EnglishStopwords10,
                              sampleLen: Int = 1000): Int = {
    if (text == null) return 0
    val sample = graft.extract.Clean.sparkLower(
      graft.extract.Clean.sparkSubstr(text, sampleLen))
    words.count(sample.contains)
  }

  // ------------------------------------------------------------------
  // Hashed char-n-gram model (fastText-style)
  // ------------------------------------------------------------------

  /** Deterministic FNV-1a 32-bit over a char trigram — cheap, stable across
    * JVMs (no String.hashCode dependence on future JDKs, no salted hash like
    * Python's — cf. SURVEY.md §7.4 item 4).
    */
  @inline private[lang] def hashGram(a: Char, b: Char, c: Char, dim: Int): Int = {
    var h = 0x811c9dc5
    h = (h ^ a) * 0x01000193
    h = (h ^ b) * 0x01000193
    h = (h ^ c) * 0x01000193
    math.floorMod(h, dim)
  }

  /** Per-language marker lexicons (most-frequent function words; public
    * knowledge). Rank implies weight: earlier = heavier.
    */
  private val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with",
      "was", "this", "are", "from", "which", "not", "have", "has", "they"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "nicht",
      "mit", "sich", "auf", "ein", "eine", "als", "auch", "werden", "für"),
    "es" -> Seq("que", "los", "las", "una", "por", "con", "para", "está",
      "del", "como", "pero", "más", "este", "esta", "son", "sus"),
    "fr" -> Seq("les", "des", "est", "une", "dans", "qui", "pour", "pas",
      "sur", "sont", "avec", "être", "cette", "mais", "nous", "vous"),
    "it" -> Seq("che", "della", "per", "una", "sono", "con", "del", "nel",
      "alla", "anche", "come", "più", "questo", "gli", "dei")
  )

  val Languages: Array[String] = Lexicons.map(_._1).toArray

  /** The broadcastable model: flat weight matrix [lang][bucket]. */
  final case class NgramModel(dim: Int, langs: Array[String],
                              weights: Array[Array[Float]]) extends Serializable {
    /** Classify one text sample. Returns language code or "und".
      *
      * Trigram extraction mirrors training exactly: each whitespace token is
      * padded " tok " and its trigrams hashed — never sliding across word
      * boundaries (a raw char window would score "der" inside English
      * "order" as German evidence).
      */
    def predict(text: String, sampleLen: Int = 500): String = {
      if (text == null || text.length < 3) return "und"
      val s = text.substring(0, math.min(text.length, sampleLen)).toLowerCase(java.util.Locale.ROOT)
      val scores = new Array[Double](langs.length)
      var grams = 0
      val n = s.length
      var i = 0
      while (i < n) {
        // find the next token [i, j)
        while (i < n && graft.rules.TokenStats.isUnicodeWs(s.charAt(i))) i += 1
        var j = i
        while (j < n && !graft.rules.TokenStats.isUnicodeWs(s.charAt(j))) j += 1
        if (j > i) {
          // trigrams of " tok " without materializing the padded string
          var k = -1 // window start relative to padding: char at p = if in-range s else ' '
          val end = j - i // token length
          while (k <= end - 2) {
            val c0 = if (k < 0) ' ' else s.charAt(i + k)
            val c1 = if (k + 1 < end) s.charAt(i + k + 1) else ' '
            val c2 = if (k + 2 < end) s.charAt(i + k + 2) else ' '
            val b = hashGram(c0, c1, c2, dim)
            var l = 0
            while (l < langs.length) { scores(l) += weights(l)(b); l += 1 }
            grams += 1
            k += 1
          }
        }
        i = j
      }
      if (grams == 0) return "und"
      var best = 0; var l = 1
      while (l < langs.length) { if (scores(l) > scores(best)) best = l; l += 1 }
      // absolute floor + margin test: junk text accumulates a little mass
      // on every profile; a real language wins by a clear factor over the
      // runner-up. Both thresholds deterministic.
      var second = 0.0
      l = 0
      while (l < langs.length) {
        if (l != best && scores(l) > second) second = scores(l)
        l += 1
      }
      val bestAvg = scores(best) / grams
      if (bestAvg < 0.01 || scores(best) < second * 1.3) "und" else langs(best)
    }
  }

  /** Build the fixed model (deterministic, no RNG). */
  def buildModel(dim: Int = 1 << 15): NgramModel = {
    val weights = Array.fill(Lexicons.length)(new Array[Float](dim))
    Lexicons.zipWithIndex.foreach { case ((_, words), li) =>
      words.zipWithIndex.foreach { case (w, rank) =>
        val ww = 1.0f / (1 + rank) // Zipf-ish rank weight
        val padded = " " + w + " "
        var i = 0
        while (i + 3 <= padded.length) {
          val b = hashGram(padded.charAt(i), padded.charAt(i + 1), padded.charAt(i + 2), dim)
          weights(li)(b) += ww
          i += 1
        }
      }
    }
    NgramModel(dim, Languages, weights)
  }

  /** Apply the model over a DataFrame: broadcast once, score per partition.
    * Adds `langCol` from `textCol`. Driver-light: only the (dim × langs)
    * float table ships; rows never visit the driver.
    */
  def withLangNgram(df: DataFrame, textCol: String, langCol: String,
                    spark: SparkSession): DataFrame = {
    val model = spark.sparkContext.broadcast(buildModel())
    val predictUdf = udf((t: String) => model.value.predict(t))
    df.withColumn(langCol, predictUdf(col(textCol)))
  }

  /** The north_star-literal form: broadcast model applied inside a typed
    * `mapPartitions` batch (model deref amortized per partition, no UDF
    * boundary). Identical labels to `withLangNgram` by construction; the
    * UDF form is the default because it composes inside whole-stage
    * codegen while this one is a fence.
    */
  def withLangNgramMapPartitions(df: DataFrame, textCol: String,
                                 langCol: String,
                                 spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.StringType
    val bc = spark.sparkContext.broadcast(buildModel())
    val outSchema = df.schema.add(langCol, StringType, nullable = true)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val m = bc.value // one deref per partition
      it.map { r =>
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        Row.fromSeq(r.toSeq :+ m.predict(t))
      }
    }(Encoders.row(outSchema))
  }
}
