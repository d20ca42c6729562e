package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-side parsers and dimension tables (SURVEY.md §2.1 S2 / S4 / S10).
  *
  * The network legs (S1/S3/S5) are explicit non-goals — the crawl already
  * exists as the input table (SURVEY.md §7.5). What survives engine-side is
  * the PARSING of fetched payloads and the category dimension lookup.
  */
object Feeds {

  // ------------------------------------------------------------------
  // S2 — Atom XML entry parse (reference: scrapers/arxiv_scraper.py:93-171).
  // One Atom <entry> payload column → typed struct, via Spark 4's built-in
  // from_xml. Null-tolerant defaults mirror the reference (:120-139).
  // ------------------------------------------------------------------
  val AtomEntrySchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("summary", StringType),
    StructField("published", StringType),
    StructField("author", ArrayType(StructType(Seq(
      StructField("name", StringType)))))))

  def parseAtomEntry(xml: Column): Column = {
    val parsed = from_xml(xml, AtomEntrySchema)
    struct(
      coalesce(parsed.getField("id"), lit("")).as("id"),
      coalesce(parsed.getField("title"), lit("Untitled")).as("title"),
      coalesce(parsed.getField("summary"), lit("")).as("abstract"),
      coalesce(parsed.getField("published"), lit("")).as("published"),
      coalesce(
        transform(parsed.getField("author"), a => a.getField("name")),
        array().cast("array<string>")).as("authors"))
  }

  // ------------------------------------------------------------------
  // S4 — viXra HTML listing → records via the mega-regex
  // (reference: scrapers/vixra_scraper.py:123), with the bare-ID fallback
  // tier (:174) — first-match-wins O6 via coalesce of the two tiers.
  // ------------------------------------------------------------------
  val VixraRichPattern: String =
    "(?s)\\[(\\d+)\\]\\s+viXra:(\\d{4}\\.\\d{4})\\s+.*?submitted on ([\\d\\-\\s:]+).*?Authors:\\s+([^\n]+)"
  val VixraSimplePattern: String = "viXra:(\\d{4}\\.\\d{4})"

  /** All records from one listing-page text: array of structs
    * (paper_id, submitted, authors) from the rich tier, falling back to
    * bare-ID structs when the rich tier finds nothing.
    */
  def parseVixraListing(pageText: Column): Column = {
    val rich = zip_with(
      zip_with(
        regexp_extract_all(pageText, lit(VixraRichPattern), lit(2)),
        regexp_extract_all(pageText, lit(VixraRichPattern), lit(3)),
        (id, sub) => struct(id.as("paper_id"), trim(sub).as("submitted"))),
      regexp_extract_all(pageText, lit(VixraRichPattern), lit(4)),
      (s, au) => struct(
        s.getField("paper_id").as("paper_id"),
        s.getField("submitted").as("submitted"),
        transform(split(trim(au), ","), a => trim(a)).as("authors")))
    val simple = transform(
      array_distinct(regexp_extract_all(pageText, lit(VixraSimplePattern), lit(1))),
      id => struct(id.as("paper_id"), lit("").as("submitted"),
        array().cast("array<string>").as("authors")))
    when(size(rich) > 0, rich).otherwise(simple)
  }

  // ------------------------------------------------------------------
  // S10 — category dimension tables (reference: utils/categories.py:6-73)
  // as broadcast-joinable DataFrames. A representative subset of the public
  // arXiv/viXra code→name mappings.
  // ------------------------------------------------------------------
  val ArxivCategories: Seq[(String, String)] = Seq(
    "astro-ph" -> "Astrophysics",
    "cond-mat" -> "Condensed Matter Physics",
    "gr-qc" -> "General Relativity and Quantum Cosmology",
    "hep-ex" -> "High Energy Physics - Experiment",
    "hep-ph" -> "High Energy Physics - Phenomenology",
    "hep-th" -> "High Energy Physics - Theory",
    "math-ph" -> "Mathematical Physics",
    "nucl-th" -> "Nuclear Theory",
    "physics" -> "Physics (Other)",
    "quant-ph" -> "Quantum Physics")

  val VixraCategories: Seq[(String, String)] = Seq(
    "astro" -> "Astrophysics", "atom" -> "Atomic and Molecular Physics",
    "cond" -> "Condensed Matter Physics", "gen" -> "General Physics",
    "hep" -> "High Energy Particle Physics",
    "grav" -> "Quantum Gravity and String Theory",
    "rel" -> "Relativity and Cosmology", "quant" -> "Quantum Physics",
    "nucl" -> "Nuclear Physics", "math" -> "Mathematical Physics",
    "stat" -> "Statistical Mechanics", "thermo" -> "Thermodynamics",
    "class" -> "Classical Physics")

  def categoryDim(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (ArxivCategories.map { case (c, n) => (c, n, "arxiv") } ++
      VixraCategories.map { case (c, n) => (c, n, "vixra") })
      .toDF("category", "category_name", "source_kind")
  }

  /** Attach category names — always a broadcast join (the dim is tiny). */
  def withCategoryName(df: DataFrame, categoryCol: String): DataFrame = {
    val dim = categoryDim(df.sparkSession)
    df.join(broadcast(dim),
      df(categoryCol) === dim("category"), "left")
      .drop(dim("category")).drop(dim("source_kind"))
  }
}
