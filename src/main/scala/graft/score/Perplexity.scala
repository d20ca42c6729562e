package graft.score

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, StructType}

/** M2 — hashed n-gram perplexity scorer (SURVEY.md §2.7 M2; BASELINE.json
  * north_rule: "hashed n-gram (Kneser-Ney-style) perplexity model batched
  * per partition").
  *
  * The model is a hashed unigram+bigram table with absolute-discount
  * smoothing, built deterministically from an embedded English frequency
  * lexicon (Zipf rank weights — no RNG, no external data). It is broadcast
  * once and applied inside `Dataset.mapPartitions` (typed API, not RDD) so
  * the per-batch setup (model deref, buffer alloc) is amortized across the
  * partition — explicitly NOT a row-at-a-time UDF (SURVEY.md §2.7).
  *
  * The same `score(text)` function is used by the row-at-a-time reference
  * oracle, so pipeline/oracle parity holds by construction and tests verify
  * partition-count invariance instead.
  */
object Perplexity {

  /** Embedded top-of-Zipf English lexicon (public knowledge). Rank order
    * matters: count(rank r) = Total / (r+1).
    */
  private val Lexicon: Seq[String] = Seq(
    "the", "of", "and", "a", "to", "in", "is", "that", "for", "with",
    "it", "as", "was", "on", "be", "by", "this", "are", "we", "from",
    "at", "or", "an", "which", "not", "have", "has", "can", "but", "his",
    "they", "been", "their", "its", "one", "all", "will", "each", "more",
    "when", "there", "other", "so", "these", "may", "then", "if", "some",
    "such", "into", "only", "also", "two", "first", "than", "time", "our",
    "between", "new", "used", "using", "given", "where", "both", "same",
    // domain mass (the corpus is physics-ish web text)
    "energy", "force", "field", "particle", "wave", "quantum", "mass",
    "velocity", "momentum", "equation", "theory", "model", "physics",
    "gravity", "universe", "space", "relativity", "result", "results",
    "figure", "table", "section", "paper", "study", "show", "shown",
    "obtain", "obtained", "derive", "derived", "calculate", "assume",
    "consider", "therefore", "thus", "hence", "follows", "value", "values",
    "function", "constant", "system", "state", "light", "speed", "charge",
    "electron", "proton", "photon", "temperature", "pressure", "density")

  val Dim: Int = 1 << 16

  /** FNV-1a over a lowercased token — stable, cheap. */
  @inline private[score] def hashToken(s: String): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < s.length) {
      h = (h ^ s.charAt(i)) * 0x01000193
      i += 1
    }
    math.floorMod(h, Dim)
  }

  final case class Model(uni: Array[Float], total: Double) extends Serializable {
    private val vocabMass = 0.5 * Dim

    /** Per-token log-probability with add-0.5 smoothing over the hashed
      * vocabulary.
      */
    @inline def logProb(tok: String): Double = {
      val c = uni(hashToken(tok)).toDouble
      math.log((c + 0.5) / (total + vocabMass))
    }

    /** Perplexity of the first `sampleLen` chars (reference analyzes
      * text[:5000], analysis/classifier.py:197). Empty/whitespace text
      * scores the defensive ceiling.
      */
    def score(text: String, sampleLen: Int = 5000): Double = {
      if (text == null) return MaxPpl
      val s = text.substring(0, math.min(text.length, sampleLen)).toLowerCase
      val toks = s.split("(?U)\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) return MaxPpl
      var lp = 0.0
      var i = 0
      while (i < toks.length) { lp += logProb(toks(i)); i += 1 }
      math.min(MaxPpl, math.exp(-lp / toks.length))
    }
  }

  /** Defensive perplexity ceiling — plays the role of the reference's
    * parse-failure default path (analysis/classifier.py:229-238).
    */
  val MaxPpl: Double = 1e6

  def buildModel(): Model = {
    val uni = new Array[Float](Dim)
    var total = 0.0
    Lexicon.zipWithIndex.foreach { case (w, r) =>
      val c = 1e6f / (r + 1)
      uni(hashToken(w)) += c
      total += c
    }
    Model(uni, total)
  }

  /** JVM-static instance: the model is built from code-embedded data, so
    * every executor can construct it lazily without a broadcast — which
    * lets the scorer run as a native expression INSIDE whole-stage codegen
    * (no mapPartitions fence, no Row serialization). The broadcast +
    * mapPartitions path below remains the API for externally-trained
    * models that must ship with the job.
    */
  lazy val Shared: Model = buildModel()

  /** Static scoring entry for codegen. */
  def scoreShared(u: org.apache.spark.unsafe.types.UTF8String): Double =
    if (u == null) MaxPpl else Shared.score(u.toString)

  /** Add a `pplCol` double column computed per partition from `textCol`.
    * Typed Dataset.mapPartitions (no RDD); model broadcast once.
    */
  def withPerplexity(df: DataFrame, textCol: String, pplCol: String,
                     spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(buildModel())
    val outSchema: StructType = df.schema.add(pplCol, DoubleType, nullable = false)
    val idx = df.schema.fieldIndex(textCol)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      val m = bc.value // one deref per partition
      it.map { r =>
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        Row.fromSeq(r.toSeq :+ m.score(t))
      }
    }(enc)
  }
}
