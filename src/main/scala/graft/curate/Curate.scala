package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  *   2. Exact dedup           — min-id per md5 fingerprint, in the
  *      map-side-combinable groupBy.agg form over a PROJECTED
  *      (id, fingerprint) frame: the shuffles move ~48 bytes/row, never
  *      the document text, a mega-duplicated page collapses in the
  *      partial aggregate instead of materializing its whole group in
  *      one window task, and the loser ids come back via joins that AQE
  *      broadcasts/skew-splits (dup-group table shrinks to n>1 groups —
  *      tiny in the common crawl-snapshot case).
  *   3. Near-dup dedup        — candidate pairs over the exact-dedup
  *      survivors only, then connected components (adaptive driver
  *      union-find / HashMin+pointer-jumping) and keep-one-per-cluster.
  *      Two candidate strategies: `strategy = "exact"` (default) is the
  *      prefix-filtered all-pairs Jaccard join — every J ≥ t pair,
  *      DuckDB-oracle-able (q52), inherently quadratic in near-dup
  *      CLUSTER size; `strategy = "minhash"` is the web-scale regime —
  *      capped, observable MinHash-LSH band buckets propose candidates
  *      and each is exactly verified (recall < 1; a missed pair keeps an
  *      extra doc, the safe direction). On a boilerplate-dense corpus
  *      (the scaling fixture: ~300k true pairs in 20k docs) exact is
  *      the wrong tool by construction — use minhash.
  *   4. PII/toxicity scrub    — compiled battery, applied ONLY to kept
  *      documents.
  *
  * Stage order is part of the semantics (and of the DuckDB oracle, q52):
  * near-dup pairs are generated only among exact-dedup survivors, which
  * are only gopher survivors — each stage shrinks the input of the next,
  * strictly cheaper → more expensive. Model scoring composes after the
  * chain via [[full]] (survivors only reach the perplexity model).
  *
  * Scale notes: by default the gopher stage recomputes on each
  * downstream reference rather than materializing the corpus (narrow
  * expressions over a column-pruned scan are cheaper to re-run than
  * writing a corpus-sized intermediate at 100 TB); flip `materialize`
  * to checkpoint the post-gopher frame once when the working set fits
  * executor storage. Reference behavioral basis: the
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
    * @return (gophered, losers): `gophered` is `docs` plus a `__keep`
    *         gopher-keep boolean; `losers` is (idCol, stage) for
    *         every document dropped by stage 2 or 3 — stage 2 losers
    *         never feed stage 3's pair generation.
    */
  private def chain(docs: DataFrame, idCol: String, textCol: String,
                    shingleN: Int, minJaccard: Double, maxDf: Int,
                    collectThreshold: Int, materialize: Boolean,
                    strategy: String): (DataFrame, DataFrame) = {
    val id = col(idCol)
    val text = col(textCol)
    // one tokenizer pass per row (Let-bound inside gopherStats) behind a
    // Generate barrier — without it CollapseProject re-inlines the
    // tokenizer per field reference (the round-2 trap); only the keep
    // bit is carried forward (the signal fields are q51's surface)
    // null text ⇒ gopher-dropped, not silently kept: every gopher signal
    // is null on null input, so an un-coalesced keep bit would three-
    // valued-logic its way past BOTH the drop branch and the loser join
    // straight to 'kept' (and real crawls do carry null extractions)
    val gophered0 = ComputeOnce(docs, "__g", Heuristics.gopherStats(text))
      .withColumn("__keep", coalesce(col("__g.gopher_keep"), lit(false)))
      .drop("__g")
    // materialize: the chain references this frame from several branches
    // (exact-dedup window, pair generation, final labeling) — each
    // re-runs the upstream scan + extraction + gopher pass (~8 s per
    // evaluation on the 20k-doc raw corpus). When the working set fits
    // executor storage (corpus ≪ memory), one eager localCheckpoint
    // replaces ~4 re-evaluations; at true 100-TB scale leave false —
    // recomputing a narrow scan beats writing a corpus-sized
    // intermediate (blocks are freed by ContextCleaner when the frame
    // is GC'd).
    val gophered = if (materialize) gophered0.localCheckpoint() else gophered0
    val gopherKept = gophered.filter(col("__keep"))

    // stage 2: exact dedup — shuffle (id, 16-byte fingerprint) only, in
    // the map-side-combinable form (round-5 verdict #1): a full-group
    // window (min(id) over partitionBy(__fp)) must co-locate EVERY row
    // of a duplicate group in one task before the min is known — a page
    // duplicated 10^8 times at crawl scale is a multi-GB single-task
    // sort. groupBy.agg collapses the mega-group map-side (partial_min/
    // partial_count), the n>1 filter shrinks the group table to actual
    // dup groups, and the join-back is a join AQE's skew handling CAN
    // split (unlike a window partition). Same output, ties included:
    // both forms label every row with id ≠ group-min as the loser.
    // null-text sentinel (defense in depth, mirrors Dedup.exactSurvivors):
    // md5(null) is null and null keys never equi-join, so without it a
    // null-text row could never be labeled exact_dup. Unreachable TODAY —
    // stage 1 drops null text (gopher signals are null ⇒ keep=false) —
    // but stage 2 must not silently depend on stage 1's ordering for
    // correctness. Real digests are 32 hex chars; no collision.
    val fps = gopherKept.select(id,
      when(text.isNull, lit("__graft_null_text__"))
        .otherwise(md5(text.cast("binary"))).as("__fp"))
    val dupGroups = fps.groupBy("__fp")
      .agg(min(id).as("__keeper"), count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select("__fp", "__keeper")
    val exactLosers = fps.join(dupGroups, "__fp")
      .filter(id =!= col("__keeper"))
      .select(id, lit(StageExactDup).as("stage"))

    // stage 3 input: exact-dedup survivors, text column pruned to what
    // pair generation needs
    val exactKept = gopherKept.select(id, text)
      .join(exactLosers.select(id), Seq(idCol), "left_anti")
    val pairs = strategy match {
      case "exact" =>
        // exhaustive prefix-filtered all-pairs: every J ≥ t pair found —
        // the DuckDB-oracled configuration (q52). Output is inherently
        // quadratic in near-dup CLUSTER size, so this is the
        // sparse-duplication / oracle regime.
        Dedup.ngramJaccardPairs(exactKept, idCol, textCol,
          n = shingleN, minJaccard = minJaccard, maxDf = maxDf,
          materialize = materialize)
      case "minhash" =>
        // web-scale regime (what production crawl dedup runs): MinHash
        // band buckets propose candidates (bucket sizes capped and
        // observable — boilerplate mega-clusters stay near-linear),
        // each candidate exactly verified. Recall < 1 by construction:
        // a missed pair keeps an extra document (the safe direction).
        Dedup.minhashPairs(exactKept, idCol, textCol,
          shingleN = shingleN, threshold = minJaccard,
          materialize = materialize)
      case other =>
        throw new IllegalArgumentException(
          s"unknown near-dup strategy '$other' (exact | minhash)")
    }
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
    *
    * Reserved column names (round-5 ADVICE): the chain labels rows
    * through columns named `stage`, `scrubbed`, `__keep`, `__stage`,
    * `__fp`, `__keeper`, `__n` and `__g`; an input frame that already
    * carries one of these makes the labeling join ambiguous
    * (AnalysisException) or mislabels rows. Callers must rename such
    * input columns first — the declared-query surface (doc_id, text)
    * never collides.
    */
  def curationLog(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, minJaccard: Double = 0.8,
                  maxDf: Int = 10000, collectThreshold: Int = 1 << 20,
                  materialize: Boolean = false,
                  strategy: String = "exact"): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)
    val (gophered, losers) = chain(docs, idCol, textCol, shingleN,
      minJaccard, maxDf, collectThreshold, materialize, strategy)
    // single-branch labeling: one left join over ALL docs instead of a
    // filter-split + union (the split evaluated the gopher subtree once
    // per branch — measured ~6 s/evaluation on the 20k-doc raw corpus).
    // A gopher-dropped doc can't be in `losers` (losers ⊂ gopher
    // survivors), so its joined stage is null and the CASE falls through
    // to 'gopher'; the scrub runs lazily only on kept rows.
    gophered
      .join(losers, Seq(idCol), "left")
      .withColumn("__stage",
        when(!col("__keep"), lit(StageGopher))
          .otherwise(coalesce(col("stage"), lit(StageKept))))
      .select(id, col("__stage").as("stage"),
        when(col("__stage") === StageKept, PiiScrub.scrub(text))
          .otherwise(lit(null).cast("string")).as("scrubbed"))
  }

  /** Chain survivors with every input column intact plus `scrubbed` —
    * the frame downstream consumers (training sinks, the model scorer)
    * actually read.
    */
  def curated(docs: DataFrame, idCol: String, textCol: String,
              shingleN: Int = 3, minJaccard: Double = 0.8,
              maxDf: Int = 10000, collectThreshold: Int = 1 << 20,
              materialize: Boolean = false,
              strategy: String = "exact"): DataFrame = {
    val (gophered, losers) = chain(docs, idCol, textCol, shingleN,
      minJaccard, maxDf, collectThreshold, materialize, strategy)
    gophered.filter(col("__keep"))
      .drop("__keep")
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
           materialize: Boolean = false,
           strategy: String = "exact"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val extracted = docsRaw
      .withColumn("text", call_function("graft_extract_clean", col("html")))
      .drop("html")
    val survivors = curated(extracted, "url", "text", shingleN, minJaccard,
      maxDf, collectThreshold, materialize, strategy).drop("scrubbed")
    // scoreExtracted re-applies the scrub on its own output column
    Pipeline.scoreExtracted(survivors, spark, cfg)
  }
}
