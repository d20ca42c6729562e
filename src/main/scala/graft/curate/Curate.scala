package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Pipeline
import graft.dedup.Dedup
import graft.functions.ComputeOnce
import graft.rules.Heuristics
import graft.scrub.PiiScrub

/** The composed end-to-end curation chain — the north_star's actual
  * product: one keep/drop + scrub decision per crawled document, built
  * from the already-oracled operators in CHEAP-FIRST order (SURVEY.md
  * §4.1):
  *
  *   1. Gopher/C4 pre-filter  — pure narrow Catalyst expressions
  *      (`Heuristics.gopherStats` behind a ComputeOnce barrier): zero
  *      shuffles, whole-stage codegen, drops degenerate text before
  *      anything pays a shuffle for it.
  *   2. Exact dedup           — min-id per md5 fingerprint. The window
  *      runs over a PROJECTED (id, fingerprint) frame, so the one
  *      shuffle moves ~48 bytes/row, never the document text; the loser
  *      ids come back via a join that AQE broadcasts whenever the dup
  *      rate is low (the common crawl-snapshot case).
  *   3. Near-dup dedup        — n-gram Jaccard pairs (inverted-index
  *      join, df-capped and observable; Dedup.ngramJaccardPairs) over
  *      the exact-dedup survivors only, then connected components
  *      (adaptive driver union-find / HashMin+pointer-jumping) and
  *      keep-one-per-cluster.
  *   4. PII/toxicity scrub    — compiled battery, applied ONLY to kept
  *      documents.
  *
  * Stage order is part of the semantics (and of the DuckDB oracle, q52):
  * near-dup pairs are generated only among exact-dedup survivors, which
  * are only gopher survivors — each stage shrinks the input of the next,
  * strictly cheaper → more expensive. Model scoring composes after the
  * chain via [[full]] (survivors only reach the perplexity model).
  *
  * Scale notes: the gopher stage recomputes on each downstream reference
  * rather than materializing the corpus (narrow expressions over a
  * column-pruned scan are cheaper to re-run than writing a corpus-sized
  * intermediate; flip `persistSurvivors` when executor storage is
  * provisioned for the survivor set). Reference behavioral basis: the
  * reference pipeline is single-stream per-document filtering
  * (paper_analyser.py:87) — the multi-document dedup stages are the
  * graft's own 100-TB mandate (BASELINE.json north_star).
  */
object Curate {

  val StageGopher = "gopher"
  val StageExactDup = "exact_dup"
  val StageNearDup = "near_dup"
  val StageKept = "kept"

  /** Shared chain plumbing: gopher-annotated frame + the loser list.
    *
    * @return (gophered, losers): `gophered` is `docs` plus a `__g`
    *         gopherStats struct column; `losers` is (idCol, stage) for
    *         every document dropped by stage 2 or 3 — stage 2 losers
    *         never feed stage 3's pair generation.
    */
  private def chain(docs: DataFrame, idCol: String, textCol: String,
                    shingleN: Int, minJaccard: Double, maxDf: Int,
                    collectThreshold: Int,
                    persistSurvivors: Boolean): (DataFrame, DataFrame) = {
    val id = col(idCol)
    val text = col(textCol)
    // one tokenizer pass per row (Let-bound inside gopherStats) behind a
    // Generate barrier — without it CollapseProject re-inlines the
    // tokenizer per field reference (the round-2 trap)
    val gophered = ComputeOnce(docs, "__g", Heuristics.gopherStats(text))
    val gopherKept = gophered.filter(col("__g.gopher_keep"))

    // stage 2: exact dedup — shuffle (id, 16-byte fingerprint) only
    val exactLosers = gopherKept
      .select(id, md5(text.cast("binary")).as("__fp"))
      .withColumn("__keeper", min(id).over(Window.partitionBy("__fp")))
      .filter(id =!= col("__keeper"))
      .select(id, lit(StageExactDup).as("stage"))

    // stage 3 input: exact-dedup survivors, text column pruned to what
    // pair generation needs
    val exactKept0 = gopherKept.select(id, text)
      .join(exactLosers.select(id), Seq(idCol), "left_anti")
    val exactKept =
      if (persistSurvivors) exactKept0.persist(StorageLevel.MEMORY_AND_DISK)
      else exactKept0
    val pairs = Dedup.ngramJaccardPairs(exactKept, idCol, textCol,
      n = shingleN, minJaccard = minJaccard, maxDf = maxDf)
    val nearLosers = Dedup
      .connectedComponents(pairs, "id_a", "id_b",
        collectThreshold = collectThreshold)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol), lit(StageNearDup).as("stage"))

    // disjoint by construction: near-dup pairs are generated among exact
    // KEEPERS only, so no id carries two loser labels
    (gophered, exactLosers.unionByName(nearLosers))
  }

  /** The auditable per-document decision log: ONE row per input document
    * with `stage` ∈ {gopher, exact_dup, near_dup, kept} naming the stage
    * that dropped it (or `kept`), and `scrubbed` = the PII/toxicity-
    * scrubbed text for kept documents (null otherwise — dropped text is
    * never scrubbed). This is the frame a curation run would write next
    * to the training sink: every drop is attributable, every kept byte
    * is scrub-clean. Fully DuckDB-oracled end-to-end (q52).
    */
  def curationLog(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, minJaccard: Double = 0.8,
                  maxDf: Int = 10000, collectThreshold: Int = 1 << 20,
                  persistSurvivors: Boolean = false): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)
    val (gophered, losers) = chain(docs, idCol, textCol, shingleN,
      minJaccard, maxDf, collectThreshold, persistSurvivors)
    val gopherDropped = gophered.filter(!col("__g.gopher_keep"))
      .select(id, lit(StageGopher).as("stage"),
        lit(null).cast("string").as("scrubbed"))
    val labeled = gophered.filter(col("__g.gopher_keep"))
      .select(id, text)
      .join(losers, Seq(idCol), "left")
      .withColumn("stage", coalesce(col("stage"), lit(StageKept)))
      .select(id, col("stage"),
        when(col("stage") === StageKept, PiiScrub.scrub(text))
          .otherwise(lit(null).cast("string")).as("scrubbed"))
    gopherDropped.unionByName(labeled)
  }

  /** Chain survivors with every input column intact plus `scrubbed` —
    * the frame downstream consumers (training sinks, the model scorer)
    * actually read.
    */
  def curated(docs: DataFrame, idCol: String, textCol: String,
              shingleN: Int = 3, minJaccard: Double = 0.8,
              maxDf: Int = 10000, collectThreshold: Int = 1 << 20,
              persistSurvivors: Boolean = false): DataFrame = {
    val (gophered, losers) = chain(docs, idCol, textCol, shingleN,
      minJaccard, maxDf, collectThreshold, persistSurvivors)
    gophered.filter(col("__g.gopher_keep"))
      .drop("__g")
      .join(losers.select(col(idCol)), Seq(idCol), "left_anti")
      .withColumn("scrubbed", PiiScrub.scrub(col(textCol)))
  }

  /** The WHOLE pipeline over a raw crawl frame (url, warc_ts, html, …):
    * extract → curation chain (cheap gates + dedup) → model scoring of
    * the survivors only. The model (perplexity + stage dims — the
    * expensive per-byte work) never sees a document that gopher rules or
    * dedup would discard; at web scale that is the majority of the
    * corpus. Output: `Pipeline.score`'s full docs_scored schema for the
    * surviving documents.
    */
  def full(docsRaw: DataFrame, spark: SparkSession,
           cfg: Pipeline.Config = Pipeline.Config(),
           shingleN: Int = 3, minJaccard: Double = 0.8,
           maxDf: Int = 10000, collectThreshold: Int = 1 << 20,
           persistSurvivors: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val extracted = docsRaw
      .withColumn("text", call_function("graft_extract_clean", col("html")))
      .drop("html")
    val survivors = curated(extracted, "url", "text", shingleN, minJaccard,
      maxDf, collectThreshold, persistSurvivors).drop("scrubbed")
    // scoreExtracted re-applies the scrub on its own output column
    Pipeline.scoreExtracted(survivors, spark, cfg)
  }
}
