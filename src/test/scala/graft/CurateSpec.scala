package graft

import org.apache.spark.sql.functions._
import graft.curate.Curate

/** The composed curation chain: stage attribution on planted documents,
  * cheap-first ORDER semantics (a gopher-dropped document never enters
  * dedup; an exact-dup loser never enters pair generation), scrub only on
  * kept rows, and the face equivalences (curated ≡ curationLog-kept;
  * full ≡ curate-then-score).
  */
class CurateSpec extends SparkTestBase {
  import spark.implicits._

  /** ~40 natural-looking words with a seeded shuffle — passes every
    * gopher gate and shares no 3-gram run with other seeds' docs.
    */
  private def prose(seed: Int): String = {
    val vocab = Seq("the", "quick", "engine", "reads", "a", "column", "and",
      "writes", "batches", "of", "rows", "to", "storage", "for", "later",
      "analysis", "with", "careful", "ordering", "that", "keeps", "costs",
      "low", "in", "practice")
    val rnd = new scala.util.Random(seed)
    Seq.fill(40)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }

  // Planted corpus (ids chosen so every keeper is the cluster MIN):
  //  1: prose A                      -> kept
  //  2: exact copy of 1              -> exact_dup (keeper is 1)
  //  3: exact copy of 1              -> exact_dup (3-way exact cluster)
  //  4: prose B                      -> kept
  //  5: near-dup of 4 (tail tweak)   -> near_dup (keeper is 4)
  //  6: symbol-heavy                 -> gopher (symbol_ratio > 0.3)
  //  7: near-dup of 6's prose core BUT 6 is gopher-dropped -> kept
  //     (cheap-first: 6 never enters pair generation)
  //  8: prose C with an email        -> kept, scrubbed to <EMAIL>
  //  9: too short                    -> gopher (min length)
  private val proseA = prose(1)
  private val proseB = prose(2)
  private val proseCore6 = prose(3)
  private lazy val corpus = Seq(
    (1L, proseA),
    (2L, proseA),
    (3L, proseA),
    (4L, proseB),
    (5L, proseB + " with one extra tail"),
    (6L, proseCore6 + " " + ("@#$%&*!@#$%&*!" * 14)),
    (7L, proseCore6),
    (8L, prose(4) + " contact me at jane.doe@example.org thanks"),
    (9L, "too short"),
    (10L, null.asInstanceOf[String]) // null extraction -> gopher-dropped
  ).toDF("doc_id", "text")

  private lazy val log = Curate
    .curationLog(corpus, "doc_id", "text")
    .collect()
    .map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
    .toMap

  test("every input document gets exactly one stage row") {
    assert(log.keySet == (1L to 10L).toSet)
  }

  test("stage attribution: gopher, exact_dup, near_dup, kept") {
    assert(log(1L)._1 == Curate.StageKept)
    assert(log(2L)._1 == Curate.StageExactDup)
    assert(log(3L)._1 == Curate.StageExactDup)
    assert(log(4L)._1 == Curate.StageKept)
    assert(log(5L)._1 == Curate.StageNearDup)
    assert(log(6L)._1 == Curate.StageGopher)
    assert(log(9L)._1 == Curate.StageGopher)
    // null text: every gopher signal is null — without the coalesced
    // keep bit this row sailed through three-valued logic to 'kept'
    assert(log(10L)._1 == Curate.StageGopher)
    assert(log(10L)._2 == null)
  }

  test("cheap-first order: a near-dup of a gopher-DROPPED doc is kept") {
    // 7 shares ~all 3-grams with 6's prose core, but 6 fell at the gopher
    // stage and so never entered pair generation — 7 has no surviving
    // near-dup partner and must be kept. (If the stages ran dedup-first,
    // 6 < 7 would make 7 the cluster loser.)
    assert(log(7L)._1 == Curate.StageKept)
  }

  test("scrubbed text only on kept rows, with the PII battery applied") {
    log.foreach { case (_, (stage, scrubbed)) =>
      assert((stage == Curate.StageKept) == (scrubbed != null))
    }
    assert(log(8L)._2.contains("<EMAIL>"))
    assert(!log(8L)._2.contains("jane.doe@example.org"))
    assert(log(1L)._2 == proseA) // clean text passes through unchanged
  }

  test("curated() returns exactly the kept rows with original columns + scrubbed") {
    val curated = Curate.curated(corpus, "doc_id", "text")
    assert(curated.columns.toSeq == Seq("doc_id", "text", "scrubbed"))
    val keptIds = log.collect { case (id, (s, _)) if s == Curate.StageKept => id }
    assert(curated.select("doc_id").as[Long].collect().sorted.toSeq ==
      keptIds.toSeq.sorted)
    // original text intact, scrubbed matches the log
    curated.collect().foreach { r =>
      assert(r.getString(2) == log(r.getLong(0))._2)
    }
  }

  test("full(): the model scores ONLY chain survivors") {
    // html-wrap the planted corpus the same way the flagship does
    val raw = corpus.select(
      concat(lit("https://t.example.org/doc/"), col("doc_id")).as("url"),
      to_timestamp(lit("2026-01-01 00:00:00")).as("warc_ts"),
      encode(concat(lit("<html><head><title>t</title></head><body><p>"),
        col("text"), lit("</p></body></html>")), "UTF-8").as("html"))
    val scored = Curate.full(raw, spark)
    val urls = scored.select("url").as[String].collect().toSet
    val keptIds = log.collect { case (id, (s, _)) if s == Curate.StageKept => id }
    assert(urls == keptIds.map(id => s"https://t.example.org/doc/$id").toSet)
    // the full docs_scored surface is present for survivors
    Seq("sophistication", "avg_stage2", "recommendation", "overall_score",
      "keep", "scrubbed_text").foreach(c => assert(scored.columns.contains(c)))
  }

  test("stages partition the corpus at driver scale too (sf0.001 documents)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stages = Curate.curationLog(docs, "doc_id", "text")
      .groupBy("stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages.values.sum == docs.count())
    assert(stages.getOrElse(Curate.StageKept, 0L) > 0L)
  }

  test("minhash strategy finds the planted clusters (stage-identical here)") {
    // at the planted similarities (J ≈ 0.9+) the 8×4 band scheme's
    // collision probability is ~1-(1-J⁴)⁸ ≈ 0.999 — and LSH is
    // deterministic given the corpus, so on this fixture the capped
    // minhash chain must reproduce the exact chain's stages
    val viaMinhash = Curate.curationLog(corpus, "doc_id", "text",
        strategy = "minhash")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaMinhash == log.map { case (k, (s, _)) => k -> s })
    // unknown strategy fails fast
    intercept[IllegalArgumentException] {
      Curate.curationLog(corpus, "doc_id", "text", strategy = "typo")
    }
  }

  test("AQE broadcasts the loser-labeling join when the loser set is small") {
    // the scaladoc's scale claim: the loser ids come back via a join
    // that AQE converts to broadcast whenever the dup rate is low (the
    // common crawl-snapshot case) — so labeling needs NO shuffle of the
    // document text. Assert it on the final adaptive plan.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val log = Curate.curationLog(docs, "doc_id", "text")
    // collect(), not head(): head() plans a SEPARATE limited query
    assert(log.collect().length == docs.count())
    val finalPlan = log.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"loser join should broadcast under AQE; plan:\n${finalPlan.take(4000)}")
  }

  test("exact-dedup stage is map-side-combinable: mega-dup group, no window") {
    // round-5 verdict #1: a page duplicated 10^5+ times must collapse in
    // a partial aggregate on the fingerprint, never co-locate as one
    // window partition. Plant one mega-duplicated text and assert (a)
    // the labels, (b) the plan shape: a HashAggregate keyed on the
    // fingerprint with partial_min, and NO Window node anywhere on the
    // exact-dedup path (the only windows in the chain plan belong to the
    // pair-generation caps, which never see the mega-group — exact
    // losers are removed before pair generation).
    val mega = spark.range(0, 100000).select(col("id").as("doc_id"),
        lit(proseA).as("text"))
      .unionByName(Seq((200000L, proseB), (200001L, proseB + " extra tail"))
        .toDF("doc_id", "text"))
    val log = Curate.curationLog(mega, "doc_id", "text")
    val stages = log.groupBy("stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages(Curate.StageExactDup) == 99999L)
    assert(stages(Curate.StageNearDup) == 1L)
    assert(stages(Curate.StageKept) == 2L) // doc 0 and doc 200000
    val plan = log.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*HashAggregate\\(keys=\\[__fp[#\\d]*\\]" +
      ".*partial_min.*"),
      s"expected a partial aggregate on the fingerprint; plan:\n${plan.take(4000)}")
    val windowsOnFp = plan.linesIterator
      .filter(_.contains("Window")).filter(_.contains("__fp")).toSeq
    assert(windowsOnFp.isEmpty,
      s"exact-dedup path must not use a window over the fingerprint: $windowsOnFp")
  }

  test("forced distributed components path labels identically") {
    // collectThreshold=0 forces the HashMin+jump loop inside the chain
    val viaLoop = Curate.curationLog(corpus, "doc_id", "text",
        collectThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaLoop == log.map { case (k, (s, _)) => k -> s })
  }
}
