package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.scrub.PiiScrub

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SQL-expressible operator has BOTH a `queries` entry (DataFrame API)
  * and an `oracleSql` entry (ANSI SQL for DuckDB over the same parquet).
  * Column names and row order are made to match exactly; double-valued
  * aggregates are rounded on both sides so bit-level engine differences
  * can't flip the driver's hash compare.
  *
  * Non-SQL-expressible operators (the model-scoring pipeline, MinHash/LSH)
  * are rows-only checked by the driver and correctness-tested in ScalaTest
  * against the deterministic oracle instead.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** ASCII whitespace split (matches RE2/DuckDB `\s`); documents are ASCII. */
  private val Ws = "\\s+"

  /** Fixed title fed to the q31 fixture (exercises the title-clean chain). */
  private val BenchmarkTitleFixture = "3 Pages. A Study of Planted Physics Fragments"

  /** Deterministic subject mix for the builder fixtures — exercises every
    * branch of the domain classifiers.
    */
  private def fixtureSubject(url: Column): Column =
    element_at(
      array(lit("Classical Mechanics"), lit("Quantum Physics"),
        lit("Thermodynamics"), lit("Relativity and Gravity"),
        lit("High Energy Physics")),
      (pmod(xxhash64(url), lit(5L)) + 1).cast("int"))

  private def wordCountAscii(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), Ws)).cast("long"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val raw = Pipeline.docsRawFromDocuments(spark, "/root/testdata/sf0.001")
    Pipeline.score(raw, spark)
      .select("url", "lang", "sophistication", "avg_stage2", "recommendation",
        "overall_score", "keep")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- flagship: full quality-filter pipeline (rows-only check) ----
    "q00_score_label" -> ((s, dir) => {
      val raw = Pipeline.docsRawFromDocuments(s, dir)
      Pipeline.score(raw, s)
        .select(col("url"), col("lang"), round(col("sophistication"), 6).as("sophistication"),
          round(col("overall_score"), 6).as("overall_score"), col("keep"))
        .orderBy("url")
    }),

    // ---- relational core over TPC-H-ish tables ----
    "q01_lineitem_agg" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_topk_orders" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
    }),

    "q03_region_customers" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val n = tbl(s, dir, "nation")
      val r = tbl(s, dir, "region")
      // dims are tiny → broadcast (SURVEY.md §2.8 category-dim pattern)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name").as("region"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum("c_acctbal"), 2).as("sum_acctbal"))
        .orderBy("region")
    }),

    // ---- quality-filter operator family over `documents` ----
    "q10_langid_stopword" -> ((s, dir) => {
      val sample = lower(substring(col("text"), 1, 1000))
      val enCount = graft.lang.LangId.EnglishStopwords10
        .map(w => when(sample.contains(w), 1).otherwise(0)).reduce(_ + _)
      docs(s, dir)
        .select(col("doc_id"), enCount.cast("int").as("en_count"),
          (enCount >= 3).as("is_en"))
        .orderBy("doc_id")
    }),

    "q11_text_stats" -> ((s, dir) => {
      val t = col("text")
      val wc = wordCountAscii(t)
      val dots = (length(t) - length(regexp_replace(t, "\\.", ""))).cast("long")
      docs(s, dir).select(
        col("doc_id"),
        wc.as("word_count"),
        length(t).cast("long").as("char_count"),
        dots.as("dot_count"),
        round(wc.cast("double") / greatest(dots, lit(1L)).cast("double"), 4)
          .as("avg_sentence_len"))
        .orderBy("doc_id")
    }),

    "q12_source_stats" -> ((s, dir) => {
      docs(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n"),
          round(avg("n_chars"), 4).as("avg_chars"),
          max("n_chars").as("max_chars"))
        .orderBy("source")
    }),

    "q13_dedup_exact" -> ((s, dir) => {
      docs(s, dir)
        .groupBy(md5(col("text").cast("binary")).as("dup_key"))
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
        .orderBy("dup_key")
    }),

    "q14_token_count" -> ((s, dir) => {
      val t = col("text")
      val bpePat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
      docs(s, dir).select(
        col("doc_id"),
        wordCountAscii(t).as("ws_tokens"),
        size(regexp_extract_all(t, lit(bpePat), lit(0))).cast("long").as("bpe_tokens"))
        .orderBy("doc_id")
    }),

    "q15_scrub" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), PiiScrub.scrub(col("text")).as("scrubbed"))
        .orderBy("doc_id")
    }),

    "q16_minlen_buckets" -> ((s, dir) => {
      val len = length(trim(col("text")))
      docs(s, dir)
        .groupBy(when(len >= 1000, "long").when(len >= 300, "mid")
          .otherwise("short").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    "q17_events_daily" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("day", "event_type")
    }),

    "q18_top_docs_per_source" -> ((s, dir) => {
      val w = Window.partitionBy("source")
        .orderBy(desc("n_chars"), asc("doc_id"))
      docs(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("source", "doc_id", "n_chars", "rk")
        .orderBy("source", "rk")
    }),

    // ---- dedup family ----
    "q20_ngram_jaccard" -> ((s, dir) => {
      graft.dedup.Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 20), "doc_id", "text", n = 1)
        .orderBy("id_a", "id_b")
    }),

    "q21_minhash_sigs" -> ((s, dir) => {
      // per-doc MinHash signature + LSH band buckets (rows-only check;
      // pair-finding correctness is ScalaTest-verified on planted dups)
      val d = docs(s, dir)
      // scalar digests only — a raw array<bigint> column breaks the driver's
      // pandas sort/hash compare (round-1 q21 err: "unhashable numpy.ndarray")
      d.select(col("doc_id"),
        graft.dedup.Dedup.shingles(col("text"), 3).as("sh"))
        .withColumn("sig", graft.dedup.Dedup.minhashSignature(col("sh"), 32))
        .withColumn("buckets", graft.dedup.Dedup.bandKeys(col("sig"), 8, 4))
        .select(col("doc_id"), size(col("sh")).as("n_shingles"),
          xxhash64(col("sig")).as("sig_hash"),
          xxhash64(col("buckets")).as("buckets_hash"))
        .orderBy("doc_id")
    }),

    "q22_simhash" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), graft.dedup.Dedup.simhash(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),

    // ---- similarity search ----
    "q23_ann_brute" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      graft.similarity.Ann.bruteForceTopK(
        e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
        .orderBy("query_id", "rk")
    }),

    "q24_ann_lsh" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      graft.similarity.Ann.lshTopK(
        e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, numPlanes = 4)
        .orderBy("query_id", "rk")
    }),

    // ---- IVF ANN (k-means coarse quantizer + cell-probed search). Full
    // probe (nProbe = nList) is chosen HERE because it makes the routing
    // machinery exactly oracle-checkable: every corpus vector lands in one
    // cell and every cell is probed, so the result must equal exact
    // search — any mis-assignment, dropped cell, or duplicate candidate
    // breaks the DuckDB equality. The approximate regime (nProbe < nList,
    // recall vs brute force) is IvfSpec-tested. ----
    "q40_ann_ivf" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      graft.similarity.Ivf.ivfTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nList = 8, nProbe = 8, iters = 3)
        .orderBy("query_id", "rk")
    }),

    "q25_cos_neardup" -> ((s, dir) => {
      graft.similarity.Ann.cosineNearDupPairs(
        tbl(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.35, numPlanes = 6)
        .orderBy("id_a", "id_b")
    }),

    // near-dup clusters over the q25 pair graph: every vertex labeled
    // with its min reachable id (HashMin, O(diameter) rounds); "keep one
    // doc per cluster" is then filter(id === component)
    "q50_neardup_components" -> ((s, dir) => {
      val pairs = graft.similarity.Ann.cosineNearDupPairs(
        tbl(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.35, numPlanes = 6)
      graft.dedup.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .orderBy("id")
    }),

    // Gopher/C4 repetition + shape signals (north_star: "repetition
    // n-gram dedup signals ... as Catalyst expressions") + the composite
    // pre-filter keep rule
    "q51_gopher_stats" -> ((s, dir) => {
      // one tokenizer pass per row (Let-bound arrays inside gopherStats)
      // behind a ComputeOnce barrier — the individual-Column composition
      // re-tokenized ~20x per row under CollapseProject
      graft.functions.ComputeOnce(docs(s, dir), "__g",
        graft.rules.Heuristics.gopherStats(col("text")))
        .select(col("doc_id"),
          col("__g.dup_line_frac").as("dup_line_frac"),
          col("__g.dup_3gram_frac").as("dup_3gram_frac"),
          col("__g.mean_word_len").as("mean_word_len"),
          col("__g.symbol_ratio").as("symbol_ratio"),
          col("__g.stopword_ratio").as("stopword_ratio"),
          col("__g.gopher_keep").as("gopher_keep"))
        .orderBy("doc_id")
    }),

    // THE composed curation chain (VERDICT r4 "what's missing" #1):
    // gopher pre-filter → exact dedup → near-dup components → scrub, in
    // cheap-first order — one auditable decision row per input document.
    // Stage order is semantic: near-dup pairs exist only among exact-dedup
    // survivors, which are only gopher survivors; the DuckDB oracle
    // replicates the full nesting end-to-end including the scrubbed text.
    "q52_curation_chain" -> ((s, dir) => {
      // materialize: execution knob only (checkpoint the post-gopher
      // frame once — the sf tables fit storage by orders of magnitude);
      // oracle semantics identical
      graft.curate.Curate.curationLog(docs(s, dir), "doc_id", "text",
        materialize = true)
        .orderBy("doc_id")
    }),

    // the chain's aggregate face: drop/keep counts per stage — the
    // one-line health dashboard a curation run reports
    "q53_curation_stages" -> ((s, dir) => {
      graft.curate.Curate.curationLog(docs(s, dir), "doc_id", "text",
        materialize = true)
        .groupBy("stage").agg(count(lit(1)).as("n"))
        .orderBy("stage")
    }),

    // ---- text analysis ----
    "q26_quality_score" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"),
          graft.textanalysis.TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    "q27_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"),
          graft.textanalysis.TextAnalysis.rollingFingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // ---- derived datasets over the pre-materialized fixture corpus
    // (pure parquet scans; the driver's documents table is DB jargon and
    // legitimately fails the physics-suitability gates). q30 stays
    // rows-only (its block/step batteries aren't SQL-expressible); q31 has
    // a full DuckDB oracle reading the same materialized files. ----
    "q30_training_examples" -> ((s, dir) => {
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
        .withColumn("subject", lit("Physics"))
      graft.derive.Derive.trainingExamples(corpus, "url", "text", "subject")
        .select("id", "url", "example_type", "problem_statement", "step_count",
          "difficulty", "topic", "reasoning_type", "quality_score")
        .orderBy("id")
    }),

    "q31_benchmark_items" -> ((s, dir) => {
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
        .withColumn("subject", lit("Physics"))
        .withColumn("title", lit(BenchmarkTitleFixture))
        .withColumn("abstract", substring(col("text"), 1, 1200))
      graft.derive.Derive.benchmarkItems(corpus, "url", "text", "subject",
        "title", "abstract")
        .select("url", "clean_title", "n_questions")
        .orderBy("url")
    }),

    // ---- v2/v3 benchmark builders over the pre-scored fixture corpus
    // (rows-only: per-concept problem templating isn't SQL-expressible;
    // builder semantics are golden-tested in BenchmarkBuildersSpec) ----
    "q36_benchmark_v2" -> ((s, dir) => {
      val scored = s.read.parquet(graft.fixtures.SynthCorpus.materializedScored(s))
        .withColumn("subject", SparkEntry.fixtureSubject(col("url")))
      graft.derive.BenchmarkBuilders.benchmarkItemsV2(scored, "url", "text", "subject")
        .select("url", "problem_id", "type", "difficulty", "domain",
          "difficulty_level", "problem_count")
        .orderBy("problem_id")
    }),

    "q37_benchmark_v3" -> ((s, dir) => {
      val scored = s.read.parquet(graft.fixtures.SynthCorpus.materializedScored(s))
        .withColumn("subject", SparkEntry.fixtureSubject(col("url")))
      graft.derive.BenchmarkBuilders.benchmarkItemsV3(scored, "url", "text", "subject")
        .select("url", "problem_id", "type", "difficulty", "domain",
          "problem_count")
        .orderBy("problem_id")
    }),

    // ---- v2/v3 builder distribution oracles (q36/q37 stay rows-only with
    // the full problem text; these pin the gates, concept batteries, and
    // per-problem type/difficulty logic against DuckDB, reading the SAME
    // scored parquet — `issues` is an input column there, so the model-
    // dependent part is data, not recomputation) ----
    "q41_benchmark_v2_dist" -> ((s, dir) => {
      val scored = s.read.parquet(graft.fixtures.SynthCorpus.materializedScored(s))
        .withColumn("subject", SparkEntry.fixtureSubject(col("url")))
      graft.derive.BenchmarkBuilders.benchmarkItemsV2(scored, "url", "text", "subject")
        .groupBy("type", "difficulty", "difficulty_level")
        .agg(count(lit(1)).as("n"))
        .orderBy("type", "difficulty", "difficulty_level")
    }),

    "q42_benchmark_v3_dist" -> ((s, dir) => {
      val scored = s.read.parquet(graft.fixtures.SynthCorpus.materializedScored(s))
        .withColumn("subject", SparkEntry.fixtureSubject(col("url")))
      graft.derive.BenchmarkBuilders.benchmarkItemsV3(scored, "url", "text", "subject")
        .groupBy("type", "difficulty")
        .agg(count(lit(1)).as("n"))
        .orderBy("type", "difficulty")
    }),

    // ---- RL training builders (third and fourth training paths of the
    // reference; rows-only — the explicit batteries use lookaheads, which
    // RE2/DuckDB lacks; parity is golden-tested in RlBuilderSpec against
    // values produced by executing the reference logic itself) ----
    "q43_rl_training_v2" -> ((s, dir) => {
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
        .withColumn("subject", lit("Physics"))
        .withColumn("title", lit(BenchmarkTitleFixture))
      graft.derive.RlBuilder.rlTrainingExamples(corpus, "url", "text",
        "subject", "title")
        .orderBy("id")
    }),

    "q44_rl_training_v3" -> ((s, dir) => {
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
        .withColumn("subject", lit("Physics"))
        .withColumn("title", lit(BenchmarkTitleFixture))
      graft.derive.RlBuilder.rlTrainingExamplesV3(corpus, "url", "text",
        "subject", "title")
        .orderBy("id")
    }),

    // ---- UGPhysics-style builders (EnhancedBenchmarkBuilder /
    // EnhancedTrainingDataBuilder). q45 carries a full DuckDB oracle —
    // its batteries have no lookaheads, so gate, batteries, best-content
    // selection, the advanced problem/solution split, and the >= 2 rule
    // are all recomputed in SQL. q46 is rows-only (lookahead patterns);
    // both are reference-run golden-tested in UgBuildersSpec. ----
    "q45_ug_benchmark" -> ((s, dir) => {
      val scored = s.read.parquet(graft.fixtures.SynthCorpus.materializedScored(s))
        .withColumn("subject", lit("Quantum Physics"))
        .withColumn("title", lit(BenchmarkTitleFixture))
        .withColumn("abstract", substring(col("text"), 1, 1200))
      graft.derive.UgBuilders.ugBenchmarkItems(scored, "url", "text",
        "subject", "title", "abstract")
        .select("url", "qtype", "n_questions")
        .orderBy("url", "qtype")
    }),

    "q46_ug_training" -> ((s, dir) => {
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
        .withColumn("subject", lit("Physics"))
        .withColumn("title", lit(BenchmarkTitleFixture))
      graft.derive.UgBuilders.ugTrainingExamples(corpus, "url", "text",
        "subject", "title")
        .select(col("id"), col("url"), col("example_type"),
          col("problem_statement"), col("step_count"), col("difficulty"),
          col("topic"), col("reasoning_type"),
          array_join(col("prerequisites"), "|").as("prereqs"),
          size(col("concepts")).as("n_concepts"))
        .orderBy("id")
    }),

    // ---- q43/q44/q46's oracle-checkable layers: the RL/UG suitability
    // gates, the crash gate, and per-battery MATCH EXISTENCE. Spark
    // evaluates the REAL lookahead patterns (rlike, Java regex); the
    // DuckDB oracle recomputes the gates from their term definitions and
    // the existence flags from the RE2-safe rewrites
    // (RlBuilder.*Existence / UgBuilders.UgDerivationExistence, proven
    // equivalent by ExistenceParitySpec). The full extraction output
    // stays rows-only (lookahead capture groups aren't RE2-expressible);
    // these rows pin every gate and every battery's firing set. ----
    "q47_rl_v2_gates" -> ((s, dir) => {
      import graft.derive.RlBuilder
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
      val text = col("text")
      val pats = RlBuilder.ExplicitPatterns ++
        RlBuilder.DerivationSeqPatterns ++ RlBuilder.CalculationPatterns
      corpus.select(col("url") +:
        RlBuilder.suitableForRlTraining(text).as("suitable") +:
        RlBuilder.crashGate(text).as("crash") +:
        pats.zipWithIndex.map { case (p, i) => text.rlike(p).as(s"m$i") }: _*)
        .orderBy("url")
    }),

    "q48_rl_v3_gates" -> ((s, dir) => {
      import graft.derive.RlBuilder
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
      val text = col("text")
      val pats = RlBuilder.V3ExplicitPatterns :+ RlBuilder.V3DerivationPattern
      corpus.select(col("url") +:
        RlBuilder.suitableForRlTrainingV3(text).as("suitable") +:
        pats.zipWithIndex.map { case (p, i) => text.rlike(p).as(s"m$i") }: _*)
        .orderBy("url")
    }),

    "q49_ug_deriv_gates" -> ((s, dir) => {
      import graft.derive.UgBuilders
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
      val text = col("text")
      corpus.select(col("url") +:
        UgBuilders.suitableForUgBenchmark(text, col("url")).as("suitable") +:
        UgBuilders.UgDerivationPatterns.zipWithIndex.map { case (p, i) =>
          text.rlike(p).as(s"m$i") }: _*)
        .orderBy("url")
    }),

    // ---- training gate + E13 block-battery counts: the oracle-checkable
    // layer of the q30 derive path (DuckDB recomputes the suitability gate
    // and all 14 battery patterns with their length windows and term
    // filters over the same materialized corpus; the fused
    // BlockExtractExpr computes the Spark side) ----
    "q38_training_gate" -> ((s, dir) => {
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
      val fused = org.apache.spark.sql.GraftColumnBridge.column(
        graft.derive.BlockExtractExpr(
          org.apache.spark.sql.GraftColumnBridge.expression(col("text"))))
      corpus
        .withColumn("__bx", fused)
        .select(col("url"),
          graft.derive.Derive.suitableForTraining(col("text"), col("url"))
            .as("suitable"),
          least(size(col("__bx.derivations")), lit(5)).as("n_derivations"),
          least(size(col("__bx.solutions")), lit(5)).as("n_solutions"),
          least(size(col("__bx.proofs")), lit(2)).as("n_proofs"))
        .orderBy("url")
    }),

    // ---- q30's aggregate oracle: the full training-example derive chain
    // (gate → E13 block batteries → C6 clean → E15 step battery → E17/E20
    // classifiers) reduced to a distribution DuckDB can recompute
    // end-to-end over the same materialized corpus. q30 itself stays
    // rows-only (prompt/completion assembly isn't SQL-expressible); this
    // pins the gate, batteries, filters, and classifiers. ----
    "q39_training_dist" -> ((s, dir) => {
      val corpus = s.read.parquet(graft.fixtures.SynthCorpus.materializedCorpus(s))
        .withColumn("subject", lit("Physics"))
      graft.derive.Derive.trainingExamples(corpus, "url", "text", "subject")
        .groupBy("example_type", "difficulty", "reasoning_type")
        .agg(count(lit(1)).as("n"),
          sum(col("step_count").cast("long")).as("sum_steps"))
        .orderBy("example_type", "difficulty", "reasoning_type")
    }),

    // ---- salted aggregation (A8): provably identical to the plain agg ----
    "q32_salted_stats" -> ((s, dir) => {
      graft.agg.DomainStats.saltedStats(docs(s, dir), "source", "text", "n_chars")
        .orderBy("source")
    }),

    // ---- multimodal plumbing (binary blobs + batched feature extraction;
    // decode is a deterministic stub — no codec libs in the container) ----
    "q33_media_features" -> ((s, dir) => {
      val media = graft.multimodal.Media.mediaFromBinary(
        docs(s, dir).withColumn("blob", encode(col("text"), "UTF-8")),
        "doc_id", "blob", "image")
      // the stub's bucket-0 value is compared as an EXACT integer: the
      // normalized Float times the byte length recovers the bucket count
      // (error ~1e-8·n ≪ 0.5 at these blob sizes), which DuckDB recounts
      // independently — decimal-rounding the Float itself is unsound (real
      // blobs land exactly on .5 rounding ties, e.g. 61/320 = 0.190625)
      graft.multimodal.Media.withFeatures(media, "bytes", "features")
        .select(col("media_id"), col("meta.kind").as("kind"),
          size(col("features")).as("feature_dim"),
          round(element_at(col("features"), 1).cast("double") *
            length(col("bytes"))).cast("long").as("f0_count"))
        .orderBy("media_id")
    }),

    // ---- sessionization over the events stream table (gap > 30 min) ----
    "q35_sessions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapped = tbl(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      // sum_value in exact integer cents: per-row round → bigint → sum is
      // order-independent, so Spark/DuckDB FP summation-order differences
      // can't flip the driver's hash compare (round-1 q35 failure mode)
      gapped.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("sum_value_c"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
            .as("duration_s"))
        .orderBy("user_id", "session_id")
    }),

    "q34_blob_stats" -> ((s, dir) => {
      val blob = encode(col("text"), "UTF-8")
      docs(s, dir).select(
        col("doc_id"),
        length(blob).cast("long").as("n_bytes"),
        md5(blob).as("content_md5"))
        .orderBy("doc_id")
    })
  )

  /** The PII/toxicity battery as one nested DuckDB regexp_replace chain
    * over `src` — shared by q15 and the q52 chain's kept-row scrub.
    */
  private def scrubSqlExpr(src: String): String =
    (PiiScrub.Battery :+ (PiiScrub.ToxicPattern, "<TOXIC>"))
      .foldLeft(src) { case (acc, (p, r)) =>
        val pEsc = p.replace("'", "''")
        s"regexp_replace($acc, '$pEsc', '$r', 'g')"
      }

  def oracleSql: Map[String, String] = {
    val enCountSql = graft.lang.LangId.EnglishStopwords10
      .map(w => s"(CASE WHEN contains(substr(lower(text),1,1000), '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val wcSql =
      "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END"
    // LSH hyperplanes are pure deterministic literals (Ann.hyperplanes) —
    // inline them so DuckDB recomputes the exact bucket assignment
    def lshBucketSql(numPlanes: Int): String =
      graft.similarity.Ann.hyperplanes(numPlanes, 64).zipWithIndex.map {
        case (h, p) =>
          val arr = h.map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $arr) >= 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
    Map(
      "q01_lineitem_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  round(sum(l_quantity), 2) AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_price,
          |  round(avg(l_discount), 4) AS avg_disc,
          |  count(*) AS n
          |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q02_topk_orders" ->
        """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
          |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

      "q03_region_customers" ->
        """SELECT r.r_name AS region, count(*) AS n_customers,
          |  round(sum(c.c_acctbal), 2) AS sum_acctbal
          |FROM customer c
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |JOIN region r ON n.n_regionkey = r.r_regionkey
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q10_langid_stopword" ->
        s"""SELECT doc_id, CAST($enCountSql AS INT) AS en_count,
           |  ($enCountSql) >= 3 AS is_en
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q11_text_stats" ->
        s"""SELECT doc_id,
           |  $wcSql AS word_count,
           |  length(text) AS char_count,
           |  length(text) - length(replace(text, '.', '')) AS dot_count,
           |  round(CAST($wcSql AS DOUBLE) /
           |    greatest(length(text) - length(replace(text, '.', '')), 1), 4)
           |    AS avg_sentence_len
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q12_source_stats" ->
        """SELECT source, count(*) AS n, round(avg(n_chars), 4) AS avg_chars,
          |  max(n_chars) AS max_chars
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "q13_dedup_exact" ->
        """SELECT md5(text) AS dup_key, count(*) AS n, min(doc_id) AS keeper
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "q14_token_count" ->
        s"""SELECT doc_id,
           |  $wcSql AS ws_tokens,
           |  array_length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
           |    AS bpe_tokens
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q15_scrub" ->
        s"SELECT doc_id, ${scrubSqlExpr("text")} AS scrubbed FROM documents ORDER BY doc_id",

      "q16_minlen_buckets" ->
        """SELECT CASE WHEN length(trim(text)) >= 1000 THEN 'long'
          |  WHEN length(trim(text)) >= 300 THEN 'mid' ELSE 'short' END AS bucket,
          |  count(*) AS n
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "q17_events_daily" ->
        """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
          |  round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q18_top_docs_per_source" ->
        """SELECT source, doc_id, n_chars, rk FROM (
          |  SELECT source, doc_id, n_chars,
          |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
          |  FROM documents)
          |WHERE rk <= 3 ORDER BY source, rk""".stripMargin,

      "q20_ngram_jaccard" ->
        """WITH t AS (
          |  SELECT DISTINCT doc_id,
          |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |  FROM documents WHERE doc_id < 20 AND length(trim(text)) > 0),
          |sz AS (SELECT doc_id, count(*) AS n FROM t GROUP BY 1),
          |c AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT c.id_a, c.id_b, c.inter,
          |  round(CAST(c.inter AS DOUBLE) / (sa.n + sb.n - c.inter), 6) AS jaccard
          |FROM c JOIN sz sa ON sa.doc_id = c.id_a JOIN sz sb ON sb.doc_id = c.id_b
          |ORDER BY 1, 2""".stripMargin,

      "q23_ann_brute" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
          |scored AS (
          |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |    round(list_dot_product(q.v, c.v) /
          |      sqrt(list_dot_product(q.v, q.v) * list_dot_product(c.v, c.v)), 6) AS cos
          |  FROM q JOIN e c ON q.vec_id <> c.vec_id),
          |ranked AS (
          |  SELECT query_id, neighbor_id, cos,
          |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
          |  FROM scored)
          |SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 3
          |ORDER BY query_id, rk""".stripMargin,

      "q24_ann_lsh" ->
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |b AS (SELECT vec_id, v, (${lshBucketSql(4)}) AS bucket FROM e),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    round(list_dot_product(q.v, c.v) /
           |      sqrt(list_dot_product(q.v, q.v) * list_dot_product(c.v, c.v)), 6) AS cos
           |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 20),
           |ranked AS (
           |  SELECT query_id, neighbor_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |  FROM scored)
           |SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 3
           |ORDER BY query_id, rk""".stripMargin,

      // q40 oracle: full-probe IVF ≡ exact search (see the query comment) —
      // DuckDB computes brute-force cosine top-3 for the same queries
      "q40_ann_ivf" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
          |scored AS (
          |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |    round(list_dot_product(q.v, c.v) /
          |      sqrt(list_dot_product(q.v, q.v) * list_dot_product(c.v, c.v)), 6) AS cos
          |  FROM q JOIN e c ON q.vec_id <> c.vec_id),
          |ranked AS (
          |  SELECT query_id, neighbor_id, cos,
          |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
          |  FROM scored)
          |SELECT query_id, neighbor_id, cos, rk FROM ranked WHERE rk <= 3
          |ORDER BY query_id, rk""".stripMargin,

      "q25_cos_neardup" ->
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |b AS (SELECT vec_id, v, (${lshBucketSql(6)}) AS bucket FROM e),
           |p AS (
           |  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           |    round(list_dot_product(a.v, c.v) /
           |      sqrt(list_dot_product(a.v, a.v) * list_dot_product(c.v, c.v)), 6) AS cos
           |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
           |SELECT DISTINCT id_a, id_b, cos FROM p WHERE cos >= 0.35
           |ORDER BY id_a, id_b""".stripMargin,

      // transitive closure via recursive CTE: min reachable id per vertex
      // (UNION, not UNION ALL, so the recursion reaches a fixpoint).
      // Oracle-scale only: reach holds one row per (vertex, reachable id)
      // — O(|component|^2) for a dense cluster, fine at the driver's SFs
      // (largest fixture component ~100 vertices); the Spark side's
      // HashMin+jump loop is the scale path
      "q50_neardup_components" ->
        s"""WITH RECURSIVE
           |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |b AS (SELECT vec_id, v, (${lshBucketSql(6)}) AS bucket FROM e),
           |p AS (
           |  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           |    round(list_dot_product(a.v, c.v) /
           |      sqrt(list_dot_product(a.v, a.v) * list_dot_product(c.v, c.v)), 6) AS cos
           |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id),
           |pr AS (SELECT DISTINCT id_a, id_b FROM p WHERE cos >= 0.35),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
           |          UNION ALL SELECT id_b, id_a FROM pr),
           |verts AS (SELECT DISTINCT src AS id FROM edges),
           |reach(id, c) AS (
           |  SELECT id, id FROM verts
           |  UNION
           |  SELECT e2.dst, r.c FROM reach r JOIN edges e2 ON e2.src = r.id)
           |SELECT id, min(c) AS component FROM reach GROUP BY id
           |ORDER BY id""".stripMargin,

      // per-row ratios of small integers: IEEE division is identical in
      // both engines, so round(x, 6) is hash-stable (the integer-cents
      // rule is for order-dependent SUMS, not per-row ratios); the keep
      // rule compares the UNROUNDED values like the Spark side. The
      // tokenizer class is the EXACT RE2 spelling of Java's (?U)\s
      // (Unicode White_Space: \p{Zs} + controls + NEL + LS/PS — GopherSpec
      // pins the Spark side incl. the U+001C non-member), and the symbol
      // class spells out Java's ASCII \s including \x0B, which RE2's \s
      // lacks
      "q51_gopher_stats" ->
        """WITH g AS (
          |  SELECT doc_id, text,
          |    list_filter(list_transform(string_split(text, chr(10)),
          |      x -> trim(x)), x -> length(x) > 0) AS lines,
          |    list_filter(regexp_split_to_array(lower(text), '[\t\n\x0B\f\r\x{0085}\x{2028}\x{2029}\p{Zs}]+'),
          |      x -> length(x) > 0) AS ltok,
          |    list_filter(regexp_split_to_array(text, '[\t\n\x0B\f\r\x{0085}\x{2028}\x{2029}\p{Zs}]+'),
          |      x -> length(x) > 0) AS tok
          |  FROM documents),
          |h AS (
          |  SELECT doc_id, text, lines, ltok, tok,
          |    CASE WHEN len(ltok) < 3 THEN CAST([] AS VARCHAR[])
          |      ELSE list_transform(generate_series(1, len(ltok) - 2),
          |        i -> ltok[i] || ' ' || ltok[i+1] || ' ' || ltok[i+2]) END AS grams
          |  FROM g),
          |r AS (
          |  SELECT doc_id, text, tok,
          |    CASE WHEN len(lines) = 0 THEN 0.0
          |      ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) END AS dl,
          |    CASE WHEN len(grams) = 0 THEN 0.0
          |      ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) END AS dg,
          |    CASE WHEN len(tok) = 0 THEN 0.0
          |      ELSE CAST(list_aggregate(list_transform(tok, x -> length(x)), 'sum') AS DOUBLE) / len(tok) END AS mwl,
          |    CASE WHEN length(text) = 0 THEN 0.0
          |      ELSE CAST(length(regexp_replace(text, '[[:alnum:]\t\n\x0B\f\r ]', '', 'g')) AS DOUBLE) / length(text) END AS sym,
          |    CASE WHEN len(tok) = 0 THEN 0.0
          |      ELSE CAST(len(list_filter(tok, x -> list_contains(
          |        ['the','and','of','to','a','in','that','is','for','with'],
          |        lower(x)))) AS DOUBLE) / len(tok) END AS swr
          |  FROM h)
          |SELECT doc_id,
          |  round(dl, 6) AS dup_line_frac,
          |  round(dg, 6) AS dup_3gram_frac,
          |  round(mwl, 6) AS mean_word_len,
          |  round(sym, 6) AS symbol_ratio,
          |  round(swr, 6) AS stopword_ratio,
          |  (length(trim(text)) >= 50 AND len(tok) BETWEEN 10 AND 200000
          |    AND mwl BETWEEN 2.0 AND 12.0 AND sym < 0.30
          |    AND dl < 0.50 AND dg < 0.80) AS gopher_keep
          |FROM r ORDER BY doc_id""".stripMargin,

      // The composed chain end-to-end. Stage nesting is replicated
      // exactly: gopher signals (q51's formulas, UNROUNDED comparisons)
      // gate who enters exact dedup; exact-dedup survivors (min doc_id
      // per md5) are the only pair-generation input; trigram-shingle
      // Jaccard ≥ 0.8 (rounded to 6 like the Spark side) feeds the
      // recursive-CTE components; kept rows get the full scrub battery.
      // The shingle tokenizer class spells Java's ASCII \s (incl \x0B,
      // which RE2's \s lacks) over lower(trim(text)), with NO
      // empty-token filtering — exactly Dedup.shingles.
      "q52_curation_chain" ->
        raw"""WITH RECURSIVE
           |gtok AS (
           |  SELECT doc_id, text,
           |    list_filter(list_transform(string_split(text, chr(10)),
           |      x -> trim(x)), x -> length(x) > 0) AS lines,
           |    list_filter(regexp_split_to_array(lower(text), '[\t\n\x0B\f\r\x{0085}\x{2028}\x{2029}\p{Zs}]+'),
           |      x -> length(x) > 0) AS ltok,
           |    list_filter(regexp_split_to_array(text, '[\t\n\x0B\f\r\x{0085}\x{2028}\x{2029}\p{Zs}]+'),
           |      x -> length(x) > 0) AS tok
           |  FROM documents),
           |ggrams AS (
           |  SELECT doc_id, text, lines, ltok, tok,
           |    CASE WHEN len(ltok) < 3 THEN CAST([] AS VARCHAR[])
           |      ELSE list_transform(generate_series(1, len(ltok) - 2),
           |        i -> ltok[i] || ' ' || ltok[i+1] || ' ' || ltok[i+2]) END AS grams
           |  FROM gtok),
           |gsig AS (
           |  SELECT doc_id, text,
           |    CASE WHEN len(lines) = 0 THEN 0.0
           |      ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) END AS dl,
           |    CASE WHEN len(grams) = 0 THEN 0.0
           |      ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) END AS dg,
           |    CASE WHEN len(tok) = 0 THEN 0.0
           |      ELSE CAST(list_aggregate(list_transform(tok, x -> length(x)), 'sum') AS DOUBLE) / len(tok) END AS mwl,
           |    CASE WHEN length(text) = 0 THEN 0.0
           |      ELSE CAST(length(regexp_replace(text, '[[:alnum:]\t\n\x0B\f\r ]', '', 'g')) AS DOUBLE) / length(text) END AS sym,
           |    length(trim(text)) AS lt, len(tok) AS nt
           |  FROM ggrams),
           |gk AS (
           |  SELECT doc_id, text,
           |    COALESCE(lt >= 50 AND nt BETWEEN 10 AND 200000 AND mwl BETWEEN 2.0 AND 12.0
           |      AND sym < 0.30 AND dl < 0.50 AND dg < 0.80, FALSE) AS gopher_keep
           |  FROM gsig),
           |gkeep AS (SELECT doc_id, text FROM gk WHERE gopher_keep),
           |elos AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
           |    FROM gkeep)
           |  WHERE doc_id <> keeper),
           |ekeep AS (SELECT doc_id, text FROM gkeep
           |          WHERE doc_id NOT IN (SELECT doc_id FROM elos)),
           |sh AS (
           |  SELECT DISTINCT doc_id, unnest(
           |    list_transform(generate_series(1, len(w) - 2),
           |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w
           |        FROM ekeep)),
           |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
           |pc AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           |  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |pr AS (
           |  SELECT id_a, id_b FROM pc
           |  JOIN sz sa ON sa.doc_id = pc.id_a
           |  JOIN sz sb ON sb.doc_id = pc.id_b
           |  WHERE round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) >= 0.8),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
           |          UNION ALL SELECT id_b, id_a FROM pr),
           |verts AS (SELECT DISTINCT src AS id FROM edges),
           |reach(id, c) AS (
           |  SELECT id, id FROM verts
           |  UNION
           |  SELECT e2.dst, r.c FROM reach r JOIN edges e2 ON e2.src = r.id),
           |comp AS (SELECT id, min(c) AS component FROM reach GROUP BY id),
           |nlos AS (SELECT id FROM comp WHERE id <> component),
           |sel AS (
           |  SELECT g.doc_id,
           |    CASE WHEN NOT g.gopher_keep THEN 'gopher'
           |         WHEN el.doc_id IS NOT NULL THEN 'exact_dup'
           |         WHEN nl.id IS NOT NULL THEN 'near_dup'
           |         ELSE 'kept' END AS stage,
           |    g.text
           |  FROM gk g
           |  LEFT JOIN elos el ON el.doc_id = g.doc_id
           |  LEFT JOIN nlos nl ON nl.id = g.doc_id)
           |SELECT doc_id, stage,
           |  CASE WHEN stage = 'kept' THEN ${scrubSqlExpr("text")} END AS scrubbed
           |FROM sel ORDER BY doc_id""".stripMargin,

      // the q52 chain, aggregated: per-stage counts (same CTE, GROUP BY)
      "q53_curation_stages" ->
        raw"""WITH RECURSIVE
           |gtok AS (
           |  SELECT doc_id, text,
           |    list_filter(list_transform(string_split(text, chr(10)),
           |      x -> trim(x)), x -> length(x) > 0) AS lines,
           |    list_filter(regexp_split_to_array(lower(text), '[\t\n\x0B\f\r\x{0085}\x{2028}\x{2029}\p{Zs}]+'),
           |      x -> length(x) > 0) AS ltok,
           |    list_filter(regexp_split_to_array(text, '[\t\n\x0B\f\r\x{0085}\x{2028}\x{2029}\p{Zs}]+'),
           |      x -> length(x) > 0) AS tok
           |  FROM documents),
           |ggrams AS (
           |  SELECT doc_id, text, lines, ltok, tok,
           |    CASE WHEN len(ltok) < 3 THEN CAST([] AS VARCHAR[])
           |      ELSE list_transform(generate_series(1, len(ltok) - 2),
           |        i -> ltok[i] || ' ' || ltok[i+1] || ' ' || ltok[i+2]) END AS grams
           |  FROM gtok),
           |gsig AS (
           |  SELECT doc_id, text,
           |    CASE WHEN len(lines) = 0 THEN 0.0
           |      ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) END AS dl,
           |    CASE WHEN len(grams) = 0 THEN 0.0
           |      ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) END AS dg,
           |    CASE WHEN len(tok) = 0 THEN 0.0
           |      ELSE CAST(list_aggregate(list_transform(tok, x -> length(x)), 'sum') AS DOUBLE) / len(tok) END AS mwl,
           |    CASE WHEN length(text) = 0 THEN 0.0
           |      ELSE CAST(length(regexp_replace(text, '[[:alnum:]\t\n\x0B\f\r ]', '', 'g')) AS DOUBLE) / length(text) END AS sym,
           |    length(trim(text)) AS lt, len(tok) AS nt
           |  FROM ggrams),
           |gk AS (
           |  SELECT doc_id, text,
           |    COALESCE(lt >= 50 AND nt BETWEEN 10 AND 200000 AND mwl BETWEEN 2.0 AND 12.0
           |      AND sym < 0.30 AND dl < 0.50 AND dg < 0.80, FALSE) AS gopher_keep
           |  FROM gsig),
           |gkeep AS (SELECT doc_id, text FROM gk WHERE gopher_keep),
           |elos AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
           |    FROM gkeep)
           |  WHERE doc_id <> keeper),
           |ekeep AS (SELECT doc_id, text FROM gkeep
           |          WHERE doc_id NOT IN (SELECT doc_id FROM elos)),
           |sh AS (
           |  SELECT DISTINCT doc_id, unnest(
           |    list_transform(generate_series(1, len(w) - 2),
           |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS w
           |        FROM ekeep)),
           |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
           |pc AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           |  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |pr AS (
           |  SELECT id_a, id_b FROM pc
           |  JOIN sz sa ON sa.doc_id = pc.id_a
           |  JOIN sz sb ON sb.doc_id = pc.id_b
           |  WHERE round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) >= 0.8),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
           |          UNION ALL SELECT id_b, id_a FROM pr),
           |verts AS (SELECT DISTINCT src AS id FROM edges),
           |reach(id, c) AS (
           |  SELECT id, id FROM verts
           |  UNION
           |  SELECT e2.dst, r.c FROM reach r JOIN edges e2 ON e2.src = r.id),
           |comp AS (SELECT id, min(c) AS component FROM reach GROUP BY id),
           |nlos AS (SELECT id FROM comp WHERE id <> component),
           |sel AS (
           |  SELECT g.doc_id,
           |    CASE WHEN NOT g.gopher_keep THEN 'gopher'
           |         WHEN el.doc_id IS NOT NULL THEN 'exact_dup'
           |         WHEN nl.id IS NOT NULL THEN 'near_dup'
           |         ELSE 'kept' END AS stage,
           |    g.text
           |  FROM gk g
           |  LEFT JOIN elos el ON el.doc_id = g.doc_id
           |  LEFT JOIN nlos nl ON nl.id = g.doc_id)
           |SELECT stage, count(*) AS n
           |FROM sel GROUP BY stage ORDER BY stage""".stripMargin,

      "q26_quality_score" -> {
        val stopSum = graft.lang.LangId.EnglishStopwords10
          .map(w => s"(CASE WHEN list_contains(toks, '$w') THEN 1.0 ELSE 0.0 END)")
          .mkString(" + ")
        s"""WITH d AS (
           |  SELECT doc_id, text,
           |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
           |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
           |  FROM documents)
           |SELECT doc_id, round(least(1.0,
           |    least(1.0, length(text) / 1000.0) * 0.25
           |  + least(1.0, array_length(toks) / 200.0) * 0.25
           |  + (($stopSum) / 10.0) * 0.25
           |  + (CASE WHEN length(text) = 0 THEN 0.0
           |      ELSE CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
           |           / length(text) END) * 0.25), 6) AS quality
           |FROM d ORDER BY doc_id""".stripMargin
      },

      "q27_fingerprint" ->
        """SELECT doc_id,
          |  CASE WHEN length(text) = 0 THEN 0 ELSE
          |    list_reduce(
          |      list_prepend(CAST(0 AS BIGINT),
          |        list_transform(regexp_extract_all(text, '[\s\S]'),
          |                       ch -> CAST(ascii(ch) AS BIGINT))),
          |      (a, b) -> (a * 31 + b) % 2147483647)
          |  END AS fp
          |FROM documents ORDER BY doc_id""".stripMargin,

      // q31 oracle: DuckDB recomputes the eligibility gate + the three
      // extraction-battery lengths from the SAME materialized fixture
      // corpus the Spark query scans (patterns are shared constants,
      // RE2-compatible by construction)
      "q31_benchmark_items" -> {
        import graft.derive.Extract
        val corpusGlob = new java.io.File(
          "target/graft_fixture/corpus_400").getAbsolutePath + "/*.parquet"
        // RE2 pattern → SQL literal: escape quotes, and turn REAL newline
        // chars inside patterns into the RE2 \n escape — a raw newline
        // followed by '|' would otherwise be EATEN by stripMargin and
        // silently corrupt the alternation
        def pat(p: String) =
          "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
        def joinedLen(patterns: Seq[String], cap: Int): String = {
          val lists = patterns
            .map(p => s"regexp_extract_all(text, ${pat(p)})").mkString(" || ")
          s"length(trim(array_to_string(list_slice(($lists), 1, $cap), chr(10))))"
        }
        val eqLen = joinedLen(Extract.LatexPatterns :+ Extract.EquationIndicator, 10)
        val derLen = joinedLen(Extract.DerivationPatterns, 5)
        val asmLen = joinedLen(Extract.AssumptionPatterns, 10)
        val sampleSql = "substr(lower(text), 1, 1000)"
        val enCnt = graft.lang.LangId.EnglishStopwords10
          .map(w => s"(CASE WHEN contains($sampleSql, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val termCnt = (graft.rules.Heuristics.PhysicsIndicators ++
          graft.rules.Heuristics.VixraIndicators)
          .map(w => s"(CASE WHEN contains($sampleSql, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val cleanTitle = graft.extract.Clean.titleCleanStr(BenchmarkTitleFixture)
        s"""WITH c AS (SELECT url, text FROM read_parquet('$corpusGlob')),
           |elig AS (
           |  SELECT url, text FROM c
           |  WHERE length(trim(text)) >= 300
           |    AND ($enCnt) >= (CASE WHEN contains(lower(url), 'vixra') THEN 2 ELSE 3 END)
           |    AND ($termCnt) >= (CASE WHEN contains(lower(url), 'vixra') THEN 1 ELSE 2 END))
           |SELECT url, '$cleanTitle' AS clean_title,
           |  CAST(1 + (CASE WHEN $eqLen > 100 THEN 1 ELSE 0 END)
           |         + (CASE WHEN $asmLen > 50 THEN 1 ELSE 0 END)
           |         + (CASE WHEN $derLen > 100 THEN 1 ELSE 0 END) AS INT) AS n_questions
           |FROM elig ORDER BY url""".stripMargin
      },

      // q38 oracle: suitability gate + the E13 batteries recomputed in SQL
      // (patterns/windows/term-filters are shared constants, RE2-safe)
      // q47/q48/q49: gate + battery-existence oracles for the RL/UG
      // training chains. DuckDB recomputes the gates from term counts and
      // the battery firing flags from the RE2-safe existence rewrites —
      // the Spark side ran the REAL lookahead patterns, so a green row
      // proves the rewrite equivalence holds on real data too.
      "q47_rl_v2_gates" -> {
        import graft.derive.RlBuilder
        val corpusGlob = new java.io.File(
          "target/graft_fixture/corpus_400").getAbsolutePath + "/*.parquet"
        def pat(p: String) =
          "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
        def cnt(terms: Seq[String], over: String) = terms
          .map(w => s"(CASE WHEN contains($over, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val sample = "substr(lower(text), 1, 2000)"
        val probs = cnt(RlBuilder.RlProblemIndicators, sample)
        val reas = cnt(RlBuilder.RlReasoningIndicators, sample)
        val phys = cnt(RlBuilder.RlPhysicsTerms, sample)
        val ex = (RlBuilder.ExplicitExistence ++
          RlBuilder.DerivationSeqExistence ++ RlBuilder.CalculationExistence)
          .zipWithIndex
          .map { case (p, i) => s"regexp_matches(text, ${pat(p)}) AS m$i" }
          .mkString(",\n  ")
        val crashAnchor = Seq("calculate", "computing", "to find")
          .map(w => s"contains(lower(text), '$w')").mkString("(", " OR ", ")")
        s"""SELECT url,
           |  (length(trim(text)) >= 1000 AND ($probs) >= 2
           |   AND ($reas) >= 3 AND ($phys) >= 2) AS suitable,
           |  ($crashAnchor AND contains(text, '=')
           |   AND regexp_matches(text, ${pat(RlBuilder.CrashExistencePattern)})) AS crash,
           |  $ex
           |FROM read_parquet('$corpusGlob') ORDER BY url""".stripMargin
      },

      "q48_rl_v3_gates" -> {
        import graft.derive.RlBuilder
        val corpusGlob = new java.io.File(
          "target/graft_fixture/corpus_400").getAbsolutePath + "/*.parquet"
        def pat(p: String) =
          "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
        def cnt(terms: Seq[String], over: String) = terms
          .map(w => s"(CASE WHEN contains($over, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val gate = cnt(RlBuilder.V3GateIndicators, "substr(lower(text), 1, 1500)")
        val ex = (RlBuilder.V3ExplicitExistence ++ RlBuilder.V3DerivationExistence)
          .zipWithIndex
          .map { case (p, i) => s"regexp_matches(text, ${pat(p)}) AS m$i" }
          .mkString(",\n  ")
        s"""SELECT url,
           |  (length(trim(text)) >= 800 AND ($gate) >= 3) AS suitable,
           |  $ex
           |FROM read_parquet('$corpusGlob') ORDER BY url""".stripMargin
      },

      "q49_ug_deriv_gates" -> {
        import graft.derive.UgBuilders
        val corpusGlob = new java.io.File(
          "target/graft_fixture/corpus_400").getAbsolutePath + "/*.parquet"
        def pat(p: String) =
          "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
        def cnt(terms: Seq[String], over: String) = terms
          .map(w => s"(CASE WHEN contains($over, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val sample = "substr(lower(text), 1, 2000)"
        val gate = s"(${cnt(UgBuilders.UgPhysicsIndicators, sample)} + " +
          s"${cnt(UgBuilders.UgMathIndicators, sample)})"
        val ex = UgBuilders.UgDerivationExistence.zipWithIndex
          .map { case (p, i) => s"regexp_matches(text, ${pat(p)}) AS m$i" }
          .mkString(",\n  ")
        s"""SELECT url,
           |  (length(trim(text)) >= 500 AND $gate >=
           |   (CASE WHEN contains(lower(url), 'vixra') THEN 2 ELSE 3 END)) AS suitable,
           |  $ex
           |FROM read_parquet('$corpusGlob') ORDER BY url""".stripMargin
      },

      "q38_training_gate" -> {
        import graft.derive.{Derive, Extract}
        val corpusGlob = new java.io.File(
          "target/graft_fixture/corpus_400").getAbsolutePath + "/*.parquet"
        // RE2 pattern → SQL literal: escape quotes, and turn REAL newline
        // chars inside patterns into the RE2 \n escape — a raw newline
        // followed by '|' would otherwise be EATEN by stripMargin and
        // silently corrupt the alternation
        def pat(p: String) =
          "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
        def cnt(terms: Seq[String], over: String) = terms
          .map(w => s"(CASE WHEN contains($over, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        // _contains_english_physics_terms over a candidate block `m`
        val phys = cnt(Extract.EnglishPhysicsTerms, "lower(m)")
        val vix = cnt(Extract.VixraPhysicsTerms, "lower(m)")
        val en = cnt(Extract.CommonEnglish, "lower(m)")
        def batterySql(patterns: Seq[String], lo: Int, hi: Int, cap: Int): String = {
          val pred =
            s"length(m) > $lo AND length(m) < $hi AND ((($phys) >= 1 OR ($vix) >= 2) AND ($en) >= 2)"
          val lists = patterns
            .map(p => s"len(list_filter(regexp_extract_all(text, ${pat(p)}), m -> $pred))")
            .mkString(" + ")
          s"least($lists, $cap)"
        }
        val sample = "substr(lower(text), 1, 2000)"
        val en14 = cnt(graft.lang.LangId.EnglishStopwords14, sample)
        val stepPhys = cnt(Derive.TrainingStepIndicators ++
          Derive.TrainingPhysIndicators, sample)
        s"""SELECT url,
           |  (length(trim(text)) >= 500
           |   AND ($en14) >= (CASE WHEN contains(lower(url), 'vixra') THEN 5 ELSE 8 END)
           |   AND ($stepPhys) >= (CASE WHEN contains(lower(url), 'vixra') THEN 2 ELSE 3 END))
           |    AS suitable,
           |  CAST(${batterySql(Extract.CompleteDerivationPatterns, 100, 2500, 5)} AS INT) AS n_derivations,
           |  CAST(${batterySql(Extract.WorkedSolutionPatterns, 80, 1800, 5)} AS INT) AS n_solutions,
           |  CAST(${batterySql(Extract.ProofPatterns, 100, 1200, 2)} AS INT) AS n_proofs
           |FROM read_parquet('$corpusGlob') ORDER BY url""".stripMargin
      },

      // q45 oracle: the UGPhysics benchmark builder end-to-end in SQL —
      // suitability gate, the three content batteries, first-longest /
      // first->20-char best-content selection, the advanced
      // problem/solution split (first separator match located via
      // regexp_split prefix + matched text), per-question presence rules,
      // and the >= 2-questions item gate
      "q45_ug_benchmark" -> {
        import graft.derive.UgBuilders._
        val scoredGlob = new java.io.File(
          "target/graft_fixture/scored_400").getAbsolutePath + "/*.parquet"
        def pat(p: String) =
          "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
        def cnt(terms: Seq[String], over: String) = terms
          .map(w => s"(CASE WHEN contains($over, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        def battery(patterns: Seq[String], minLen: Int) = patterns
          .map(p => s"list_filter(list_transform(regexp_extract_all(text, ${pat(p)}), " +
            s"x -> trim(x)), m -> length(m) > $minLen)")
          .mkString("(", " || ", ")")
        val eqs = battery(UgEqPatterns, 5)
        val derivs = battery(UgDerivPatterns, 50)
        val probs = battery(UgProblemPatterns, 100)
        val sample = "substr(lower(text), 1, 2000)"
        val gate = s"(${cnt(UgPhysicsIndicators, sample)} + ${cnt(UgMathIndicators, sample)})"
        // first element among maximal lengths = Python max(key=len)
        def firstLongest(l: String) =
          s"list_filter($l, x -> length(x) = list_max(list_transform($l, y -> length(y))))[1]"
        // advanced split (Gates.problemSolutionParts): end of the FIRST
        // match of the first separator pattern that matches; midpoint
        // fallback. DuckDB locates the first match via split-prefix length.
        val seps = Seq(
          "(?is)(?:Solution|Answer)\\s*:",
          "(?is)(?:Given|Find|Calculate|Determine).*?(?:Solution|Answer)",
          "(?is)(?:Problem)\\s*:.*?(?:Solution|Answer)\\s*:")
        def sepEnd(over: String) = seps.map { sp =>
          s"(CASE WHEN regexp_extract($over, ${pat(sp)}, 0) <> '' THEN " +
            s"length(regexp_split_to_array($over, ${pat(sp)})[1]) + " +
            s"length(regexp_extract($over, ${pat(sp)}, 0)) ELSE NULL END)"
        }.mkString("coalesce(", ", ", s", CAST(length($over) // 2 AS INT))")
        s"""WITH suit AS (
           |  SELECT url, text, issues FROM read_parquet('$scoredGlob')
           |  WHERE length(trim(text)) >= 500
           |    AND $gate >= (CASE WHEN contains(lower(url), 'vixra') THEN 2 ELSE 3 END)),
           |cx AS (
           |  SELECT url, issues, $eqs AS eqs, $derivs AS derivs, $probs AS probs
           |  FROM suit),
           |base AS (
           |  SELECT * FROM cx WHERE len(eqs) + len(derivs) + len(probs) > 0),
           |best AS (
           |  SELECT *,
           |    (CASE WHEN len(derivs) > 0 THEN ${firstLongest("derivs")}
           |          ELSE list_filter(eqs, e -> length(e) > 20)[1] END) AS bestc,
           |    (CASE WHEN len(probs) > 0 THEN ${firstLongest("probs")} END) AS bestp
           |  FROM cx WHERE len(eqs) + len(derivs) + len(probs) > 0),
           |flags AS (
           |  SELECT url,
           |    ((len(eqs) > 0 OR len(derivs) > 0)
           |      AND bestc IS NOT NULL AND length(bestc) >= 30) AS q1,
           |    (len(issues) > 0) AS q2,
           |    (len(probs) > 0 AND
           |      length(trim(substr(bestp, 1, ${sepEnd("bestp")}))) >= 30 AND
           |      length(trim(substr(bestp, ${sepEnd("bestp")} + 1,
           |        length(bestp)))) >= 50) AS q3,
           |    true AS q4
           |  FROM best),
           |kept AS (
           |  SELECT url,
           |    (CASE WHEN q1 THEN 1 ELSE 0 END + CASE WHEN q2 THEN 1 ELSE 0 END +
           |     CASE WHEN q3 THEN 1 ELSE 0 END + 1) AS n_questions,
           |    q1, q2, q3 FROM flags
           |  WHERE (CASE WHEN q1 THEN 1 ELSE 0 END + CASE WHEN q2 THEN 1 ELSE 0 END +
           |         CASE WHEN q3 THEN 1 ELSE 0 END + 1) >= 2)
           |SELECT url, qtype, n_questions FROM (
           |  SELECT url, 'mathematical_derivation' AS qtype, n_questions FROM kept WHERE q1
           |  UNION ALL
           |  SELECT url, 'reasoning_analysis', n_questions FROM kept WHERE q2
           |  UNION ALL
           |  SELECT url, 'problem_solving', n_questions FROM kept WHERE q3
           |  UNION ALL
           |  SELECT url, 'principles_application', n_questions FROM kept)
           |ORDER BY url, qtype""".stripMargin
      },

      // q41 oracle: the V2 benchmark builder's gate, concept batteries,
      // problem-presence logic, and concept-difficulty variant recomputed
      // in SQL over the same scored parquet (issues is an input column)
      "q41_benchmark_v2_dist" -> {
        import graft.derive.BenchmarkBuilders._
        import graft.extract.Clean
        val scoredGlob = new java.io.File(
          "target/graft_fixture/scored_400").getAbsolutePath + "/*.parquet"
        def pat(p: String) =
          "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
        def cnt(terms: Seq[String], over: String) = terms
          .map(w => s"(CASE WHEN contains($over, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        def anyOf(terms: Seq[String], over: String) = terms
          .map(w => s"contains($over, '${w.replace("'", "''")}')")
          .mkString("(", " OR ", ")")
        // battery: group-1 extraction per pattern → transform → filter
        def battery(patterns: Seq[String], mk: String => String,
                    pred: String): String =
          patterns.map(p =>
            s"list_filter(list_transform(regexp_extract_all(text, ${pat(p)}, 1), " +
              s"x -> ${mk("x")}), e -> $pred)")
            .mkString("(", " || ", ")")
        val eqClean = (x: String) =>
          s"trim(regexp_replace(regexp_replace($x, '\\s+', ' ', 'g'), " +
            s"${pat(Clean.EqStripClass)}, '', 'g'))"
        val meaningfulEq =
          s"(contains(e, '=') AND ${anyOf(graft.derive.Gates.PhysicsVars, "e")} AND " +
            s"${anyOf(graft.derive.Gates.MathOps, "e")} AND length(trim(e)) > 8)"
        val physV2 = s"(${anyOf(V2PhysicsTerms, "lower(e)")} OR ${anyOf(V2MathChars, "e")})"
        val eqs = battery(V2EqPatterns, eqClean, s"length(e) > 0 AND $meaningfulEq")
        val derivs = battery(V2DerivPatterns, x => s"trim($x)",
          s"length(e) > 20 AND $physV2")
        val scens = battery(V2ScenarioPatterns, x => s"trim($x)",
          s"length(e) > 30 AND $physV2")
        val nums = battery(V2NumPatterns, x => s"trim($x)",
          s"regexp_matches(e, '\\d') AND ${anyOf(V2NumContexts, "lower(e)")} AND length(e) > 5")
        val prins = V2PrinciplePatterns.map(p =>
          s"list_transform(regexp_extract_all(text, ${pat(p)}, 1), x -> trim(x))")
          .mkString("(", " || ", ")")
        val suitSample = "substr(lower(text), 1, 2000)"
        val dl =
          s"""CASE WHEN (len(list_filter(eqs, e -> ${anyOf(AdvMathTerms, "lower(e)")}))
             | + len(list_filter(prins, e -> ${anyOf(AdvPhysTerms, "lower(e)")}))) >= 3
             |THEN 'advanced'
             |WHEN (len(list_filter(eqs, e -> ${anyOf(AdvMathTerms, "lower(e)")}))
             | + len(list_filter(prins, e -> ${anyOf(AdvPhysTerms, "lower(e)")}))) >= 1
             |THEN 'intermediate' ELSE 'introductory' END"""
            .stripMargin.replace("\n", " ")
        s"""WITH suit AS (
           |  SELECT text, issues FROM read_parquet('$scoredGlob')
           |  WHERE length(trim(text)) >= 800
           |    AND ((contains(text, '=') AND len(regexp_extract_all(text, '[A-Za-z]\\s*=')) >= 2)
           |         OR (${cnt(V2SuitIndicators, suitSample)}) >= 4)),
           |cx AS (
           |  SELECT issues, $eqs AS eqs, $derivs AS derivs, $scens AS scens,
           |    $nums AS nums, $prins AS prins
           |  FROM suit),
           |base AS (
           |  SELECT *, $dl AS difficulty_level FROM cx
           |  WHERE len(eqs) + len(derivs) + len(scens) + len(nums) + len(prins) > 0),
           |probs AS (
           |  SELECT 'mathematical_derivation_analysis' AS type, 'intermediate' AS difficulty,
           |    difficulty_level FROM base WHERE len(eqs) > 0 OR len(derivs) > 0
           |  UNION ALL
           |  SELECT 'physical_scenario_analysis', 'intermediate', difficulty_level
           |  FROM base WHERE len(scens) > 0
           |  UNION ALL
           |  SELECT 'error_detection_analysis', 'advanced', difficulty_level
           |  FROM base WHERE len(issues) > 0 AND len(eqs) > 0
           |  UNION ALL
           |  SELECT 'numerical_analysis', 'intermediate', difficulty_level
           |  FROM base WHERE len(nums) > 0)
           |SELECT type, difficulty, difficulty_level, count(*) AS n
           |FROM probs GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
      },

      // q42 oracle: the V3 builder — including the pairwise two-group
      // derivation battery (list_zip of group-1/group-2 extractions) and
      // the issues-conditional scenario difficulty
      "q42_benchmark_v3_dist" -> {
        import graft.derive.BenchmarkBuilders._
        val scoredGlob = new java.io.File(
          "target/graft_fixture/scored_400").getAbsolutePath + "/*.parquet"
        def pat(p: String) =
          "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
        def cnt(terms: Seq[String], over: String) = terms
          .map(w => s"(CASE WHEN contains($over, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        def anyOf(terms: Seq[String], over: String) = terms
          .map(w => s"contains($over, '${w.replace("'", "''")}')")
          .mkString("(", " OR ", ")")
        val eqCleanV3 = (x: String) =>
          s"trim(regexp_replace(regexp_replace($x, '\\s+', ' ', 'g'), " +
            s"${pat(EqStripClassV3)}, '', 'g'))"
        val physEqV3 =
          s"(contains(e, '=') AND length(trim(e)) >= 5 AND " +
            s"${anyOf(V3PhysicsVars, "e")} AND ${anyOf(V3MathOps, "e")})"
        val eqs = V3EqPatterns.map(p =>
          s"list_filter(list_transform(regexp_extract_all(text, ${pat(p)}, 1), " +
            s"x -> ${eqCleanV3("x")}), e -> length(e) > 0 AND $physEqV3)")
          .mkString("(", " || ", ")")
        // pairwise (starting_point, result) via zipped group extractions
        val derivs = V3DerivPatterns.map(p =>
          s"list_filter(list_zip(" +
            s"list_transform(regexp_extract_all(text, ${pat(p)}, 1), x -> trim(x)), " +
            s"list_transform(regexp_extract_all(text, ${pat(p)}, 2), x -> trim(x))), " +
            s"z -> length(z[1]) > 15 AND length(z[2]) > 10)")
          .mkString("(", " || ", ")")
        val nums = V3NumPatterns.map(p =>
          s"list_filter(list_transform(regexp_extract_all(text, ${pat(p)}, 1), " +
            s"x -> trim(x)), e -> regexp_matches(e, '\\d') AND " +
            s"${anyOf(V3NumContexts, "lower(e)")} AND length(e) > 4)")
          .mkString("(", " || ", ")")
        val scens = V3ScenarioPatterns.map(p =>
          s"list_filter(list_transform(regexp_extract_all(text, ${pat(p)}, 1), " +
            s"x -> trim(x)), e -> length(e) > 25 AND ${anyOf(V3PhysicsTerms, "lower(e)")})")
          .mkString("(", " || ", ")")
        val suitSample = "substr(lower(text), 1, 1500)"
        s"""WITH suit AS (
           |  SELECT text, issues FROM read_parquet('$scoredGlob')
           |  WHERE length(trim(text)) >= 600
           |    AND ((contains(text, '=') AND len(regexp_extract_all(text, '[A-Za-z]\\s*=')) >= 1)
           |         OR (${cnt(V3SuitTerms, suitSample)}) >= 3)),
           |cx AS (
           |  SELECT issues, $eqs AS eqs, $derivs AS derivs, $nums AS nums,
           |    $scens AS scens
           |  FROM suit),
           |base AS (
           |  SELECT * FROM cx
           |  WHERE len(eqs) > 0 OR len(derivs) > 0 OR len(nums) > 0),
           |probs AS (
           |  SELECT 'equation_analysis' AS type, 'intermediate' AS difficulty
           |  FROM base WHERE len(eqs) > 0
           |  UNION ALL
           |  SELECT 'derivation_verification', 'advanced' FROM base WHERE len(derivs) > 0
           |  UNION ALL
           |  SELECT 'numerical_analysis', 'intermediate' FROM base WHERE len(nums) > 0
           |  UNION ALL
           |  SELECT 'scenario_analysis',
           |    (CASE WHEN len(issues) > 0 THEN 'advanced' ELSE 'intermediate' END)
           |  FROM base WHERE len(scens) > 0)
           |SELECT type, difficulty, count(*) AS n
           |FROM probs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      },

      // q39 oracle: the ENTIRE training-example derive chain in SQL —
      // suitability gate, E13 block batteries (windows + term filters +
      // caps), C6 training clean, E15 analyser step battery (primary
      // patterns + sentence fallback + meaningful-step predicate), E17
      // difficulty, E20 reasoning type, and the problem/solution boundary
      // that defines step_count. Patterns/terms/thresholds are the shared
      // Scala constants; corpus is ASCII post-clean so RE2 '\s' ≡ the
      // Spark side's (?U)\s.
      "q39_training_dist" -> {
        import graft.derive.{Derive, Extract}
        val corpusGlob = new java.io.File(
          "target/graft_fixture/corpus_400").getAbsolutePath + "/*.parquet"
        // RE2 pattern → SQL literal (same trap as q31/q38: real newlines in
        // patterns must become RE2 \n or stripMargin corrupts alternations)
        def pat(p: String) =
          "'" + p.replace("'", "''").replace("\n", "\\n") + "'"
        def cnt(terms: Seq[String], over: String) = terms
          .map(w => s"(CASE WHEN contains($over, '$w') THEN 1 ELSE 0 END)")
          .mkString(" + ")
        def anyOf(terms: Seq[String], over: String) = terms
          .map(w => s"contains($over, '$w')").mkString("(", " OR ", ")")

        // -- gate (same as q38) --
        val sample = "substr(lower(text), 1, 2000)"
        val en14 = cnt(graft.lang.LangId.EnglishStopwords14, sample)
        val stepPhys = cnt(Derive.TrainingStepIndicators ++
          Derive.TrainingPhysIndicators, sample)

        // -- E13 batteries as LISTS (q38 oracles the counts; here we need
        // the block strings themselves) --
        val phys = cnt(Extract.EnglishPhysicsTerms, "lower(m)")
        val vix = cnt(Extract.VixraPhysicsTerms, "lower(m)")
        val en = cnt(Extract.CommonEnglish, "lower(m)")
        def batteryList(patterns: Seq[String], lo: Int, hi: Int): String =
          patterns.map(p =>
            s"list_filter(regexp_extract_all(text, ${pat(p)}), " +
              s"m -> length(m) > $lo AND length(m) < $hi AND " +
              s"((($phys) >= 1 OR ($vix) >= 2) AND ($en) >= 2))")
            .mkString("(", " || ", ")")
        val derList = batteryList(Extract.CompleteDerivationPatterns, 100, 2500)
        val solList = batteryList(Extract.WorkedSolutionPatterns, 80, 1800)
        val prfList = batteryList(Extract.ProofPatterns, 100, 1200)

        // -- C6 trainingClean (the $..$ rewrite is an identity — skipped) --
        val cleanSql =
          """trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            |block, '\s+', ' ', 'g'), '\[\d+\]', '', 'g'),
            |'Page \d+ of \d+', '', 'g'), 'Figure \d+', '', 'g'))"""
            .stripMargin.replace("\n", " ")

        // -- E15 analyser step battery over `cleaned` --
        val meaningful =
          s"((${anyOf(Extract.AnalyserMeaningful, "lower(s)")} OR " +
            s"${anyOf(Extract.AnalyserVixra, "lower(s)")}) AND " +
            s"NOT ${anyOf(Extract.AnalyserAvoid, "lower(s)")} AND " +
            s"${anyOf(Extract.AnalyserCommon, "lower(s)")})"
        val primarySql = Extract.AnalyserStepPatterns.map(p =>
          s"list_filter(list_transform(regexp_extract_all(cleaned, ${pat(p)}), " +
            s"x -> trim(x)), s -> length(s) > 8 AND length(s) < 250 AND $meaningful)")
          .mkString("(", " || ", ")")
        val sentencesSql =
          s"list_filter(list_transform(regexp_split_to_array(cleaned, '[.!?]+'), " +
            s"x -> trim(x)), s -> length(s) > 15 AND length(s) < 180 AND $meaningful)"

        // -- E17 difficulty / E20 reasoning type over `cleaned` --
        val lo = "lower(cleaned)"
        val difficultySql =
          s"""CASE WHEN (${cnt(Extract.AdvancedIndicators, lo)}) > 0 THEN 'advanced'
             |WHEN (${cnt(Extract.IntermediateIndicators, lo)}) > 1 THEN 'intermediate'
             |ELSE 'introductory' END""".stripMargin.replace("\n", " ")
        val reasoningTypeSql =
          s"""CASE WHEN ${anyOf(Seq("derive", "derivation", "proof", "show that"), lo)}
             |THEN 'mathematical_derivation'
             |WHEN ${anyOf(Seq("conservation", "law", "principle", "theorem"), lo)}
             |THEN 'law_application'
             |WHEN ${anyOf(Seq("calculate", "find", "determine", "solve"), lo)}
             |THEN 'problem_solving'
             |WHEN ${anyOf(Seq("given", "known", "condition"), lo)}
             |THEN 'knowledge_recall'
             |ELSE 'reasoning_chain' END""".stripMargin.replace("\n", " ")

        // -- problem/solution boundary → step_count --
        val solFlagsSql =
          s"list_transform(steps, s -> ${anyOf(Extract.SolutionIndicators, "lower(s)")})"

        s"""WITH suit AS (
           |  SELECT url, text FROM read_parquet('$corpusGlob')
           |  WHERE length(trim(text)) >= 500
           |    AND ($en14) >= (CASE WHEN contains(lower(url), 'vixra') THEN 5 ELSE 8 END)
           |    AND ($stepPhys) >= (CASE WHEN contains(lower(url), 'vixra') THEN 2 ELSE 3 END)),
           |blk AS (
           |  SELECT example_type, unnest(blks) AS block FROM (
           |    SELECT 'derivation' AS example_type, list_slice($derList, 1, 3) AS blks FROM suit
           |    UNION ALL
           |    SELECT 'solution' AS example_type, list_slice($solList, 1, 3) AS blks FROM suit
           |    UNION ALL
           |    SELECT 'proof' AS example_type, list_slice($prfList, 1, 2) AS blks FROM suit)),
           |cf AS (
           |  SELECT example_type, cleaned FROM
           |    (SELECT example_type, $cleanSql AS cleaned FROM blk)
           |  WHERE length(cleaned) >= 50),
           |st AS (
           |  SELECT example_type, cleaned, prim,
           |    list_slice(CASE WHEN len(prim) < 2 THEN prim || $sentencesSql
           |               ELSE prim END, 1, 10) AS steps
           |  FROM (SELECT example_type, cleaned, $primarySql AS prim FROM cf)),
           |sf AS (SELECT example_type, cleaned, steps FROM st WHERE len(steps) >= 2),
           |sc AS (
           |  SELECT example_type, cleaned, steps,
           |    least(2, (CASE WHEN list_position($solFlagsSql, true) IS NULL
           |                     OR list_position($solFlagsSql, true) = 0
           |                   THEN 9223372036854775807
           |                   ELSE list_position($solFlagsSql, true) END) - 1) AS boundary
           |  FROM sf),
           |fin AS (
           |  SELECT example_type,
           |    $difficultySql AS difficulty,
           |    $reasoningTypeSql AS reasoning_type,
           |    (CASE WHEN len(list_slice(steps, boundary + 1, len(steps))) = 0
           |          THEN len(steps)
           |          ELSE len(list_slice(steps, boundary + 1, len(steps))) END) AS step_count
           |  FROM sc)
           |SELECT example_type, difficulty, reasoning_type,
           |  count(*) AS n, CAST(sum(step_count) AS BIGINT) AS sum_steps
           |FROM fin GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
      },

      // the salted two-phase aggregate must equal the plain GROUP BY —
      // DuckDB computes the plain version, proving the salting is lossless
      "q32_salted_stats" ->
        """SELECT source, count(*) AS n,
          |  round(avg(n_chars), 6) AS avg_value,
          |  round(CAST(sum(n_chars) AS DOUBLE), 6) AS sum_value
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      // q33 oracle: the mapPartitions feature plumbing verified against an
      // independent recompute of the stub's bucket-0 value — the fraction
      // of blob bytes ≡ 0 (mod 16), i.e. ASCII NUL/DLE/space/0/@/P/`/p
      // (documents.text is pure ASCII, so chars ≡ bytes; q34 pins the
      // byte-length equivalence)
      "q33_media_features" ->
        """SELECT doc_id AS media_id, 'image' AS kind, 16 AS feature_dim,
          |  CAST(len(regexp_extract_all(text, '[\x00\x10 0@P`p]')) AS BIGINT)
          |    AS f0_count
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q34_blob_stats" ->
        """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q35_sessions" ->
        """WITH g AS (
          |  SELECT user_id, event_id, ts, value,
          |    CASE WHEN lag(ts) OVER w IS NULL
          |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
          |         THEN 1 ELSE 0 END AS new_session
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |s AS (
          |  SELECT user_id, event_id, ts, value,
          |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          |  FROM g)
          |SELECT user_id, session_id, count(*) AS n_events,
          |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
          |  CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
          |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    )
  }
}
