package graft

import org.apache.spark.sql.functions._
import graft.similarity.Ann

class AnnSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random unit-ish vectors, pure function of (id, d)
  private def vec(id: Int, dim: Int = 16): Array[Float] =
    Array.tabulate(dim) { d =>
      var x = (id.toLong * 6364136223846793005L + d * 1442695040888963407L + 7L) | 1L
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x.toDouble / Long.MaxValue.toDouble).toFloat
    }

  private lazy val corpus = (0 until 200)
    .map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  test("brute-force cosine top-k: self-similar planted vector is rank 1") {
    // plant: vec 201 = vec(0) scaled → cosine 1.0 with vec 0
    val planted = Seq((201L, vec(0).map(_ * 2.0f))).toDF("vec_id", "embedding")
    val all = corpus.union(planted)
    val top = Ann.bruteForceTopK(all, all.filter(col("vec_id") === 201), "vec_id", "embedding", 3)
      .collect()
    assert(top.head.getAs[Long]("neighbor_id") == 0L)
    assert(top.head.getAs[Double]("cos") == 1.0)
  }

  test("brute-force agrees with a local exact computation") {
    val q = 5
    val local = (0 until 200).filter(_ != q).map { i =>
      val (a, b) = (vec(q).map(_.toDouble), vec(i).map(_.toDouble))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val cos = dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
      (i.toLong, BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, c) => (-c, id) }.take(5)
    val got = Ann.bruteForceTopK(corpus, corpus.filter(col("vec_id") === q),
      "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSeq
    assert(got == local, s"\ngot   $got\nwant  $local")
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val k = 5
    val queries = corpus.filter(col("vec_id") < 20)
    val brute = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(corpus, queries, "vec_id", "embedding", k,
      numPlanes = 4, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(f"LSH recall@$k = $recall%.3f (4 planes)")
    assert(recall >= 0.2, f"recall $recall%.3f too low even for 4 planes")
    // and every LSH result is a genuine same-bucket candidate with a valid rank
    assert(lsh.nonEmpty)
  }

  test("multi-table OR-amplification raises LSH recall, never lowers it") {
    val k = 5
    val queries = corpus.filter(col("vec_id") < 20)
    val brute = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(tables: Int): Double = {
      val got = Ann.lshTopK(corpus, queries, "vec_id", "embedding", k,
        numPlanes = 6, dim = 16, numTables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val r1 = recall(1); val r4 = recall(4)
    info(f"recall@$k: 1 table $r1%.3f, 4 tables $r4%.3f (6 planes)")
    assert(r4 >= r1, f"OR-amplification lowered recall: $r1%.3f -> $r4%.3f")
    assert(r4 > r1, "4 tables should strictly beat 1 at 6 planes on this corpus")
  }

  test("partial top-k aggregate equals the window reference form exactly") {
    val queries = corpus.filter(col("vec_id") < 25)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSet
    val agg = rows(Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", 4))
    val win = rows(Ann.bruteForceTopKWindow(corpus, queries, "vec_id", "embedding", 4))
    assert(agg == win)
    assert(agg.size == 25 * 4)
    // partition-invariance of the aggregate (map-side partial merge path)
    val repart = rows(Ann.bruteForceTopK(corpus.repartition(13), queries,
      "vec_id", "embedding", 4))
    assert(repart == win)
  }

  test("LSH partial top-k equals the window reference form exactly") {
    val queries = corpus.filter(col("vec_id") < 25)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSet
    for (tables <- Seq(1, 3)) {
      val agg = rows(Ann.lshTopK(corpus, queries, "vec_id", "embedding", 4,
        numPlanes = 4, dim = 16, numTables = tables))
      val win = rows(Ann.lshTopKWindow(corpus, queries, "vec_id", "embedding", 4,
        numPlanes = 4, dim = 16, numTables = tables))
      assert(agg == win, s"numTables=$tables")
    }
  }

  test("cosine near-dup pairs finds a planted duplicate embedding") {
    val dup = Seq((500L, vec(7).map(v => v * 1.001f))).toDF("vec_id", "embedding")
    val pairs = Ann.cosineNearDupPairs(corpus.union(dup), "vec_id", "embedding",
      threshold = 0.99, numPlanes = 4, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 500L)), s"planted dup not found: $pairs")
  }

  test("near-dup bucket cap bounds a planted mega-bucket and reports the drop") {
    // 50 copies of the same vector → one bucket; maxBucket=10 must bound
    // the self-join at C(10,2)=45 pairs and report 40 dropped rows
    val flood = (0 until 50).map(i => (i.toLong, vec(3))).toDF("vec_id", "embedding")
    val pairs = Ann.cosineNearDupPairs(flood, "vec_id", "embedding",
      threshold = 0.5, numPlanes = 4, dim = 16, maxBucket = 10)
    // collect() (not count()) — observed metrics live on THIS dataset's
    // QueryExecution; count() plans a separate aggregate query
    assert(pairs.collect().length == 45)
    val m = pairs.queryExecution.observedMetrics("cos_neardup_bucket_cap")
    assert(m.getAs[Long]("dropped_rows") == 40L)
    assert(m.getAs[Int]("max_bucket_size") == 50)
  }
}

/** Native DotExpr must equal the higher-order form bit-for-bit. */
class DotParitySpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("DotExpr equals aggregate(zip_with(...)) on float and double arrays") {
    val df = (0 until 50).map { i =>
      (Array.tabulate(16)(d => (i * 17 + d * 3 % 7 - 3).toFloat / 11f),
       Array.tabulate(16)(d => (i * 13 - d * 5 % 9 + 2).toFloat / 7f))
    }.toDF("a", "b")
    val bad = df.filter(
      graft.similarity.Ann.dot(col("a"), col("b")) =!=
        graft.similarity.Ann.dotHof(col("a"), col("b"))).count()
    assert(bad == 0)
    val dbl = df.select(col("a").cast("array<double>").as("a"),
      col("b").cast("array<double>").as("b"))
    val bad2 = dbl.filter(
      graft.similarity.Ann.dot(col("a"), col("b")) =!=
        graft.similarity.Ann.dotHof(col("a"), col("b"))).count()
    assert(bad2 == 0)
  }

  test("DotExpr stays in codegen") {
    val df = spark.range(3).select(
      graft.similarity.Ann.dot(
        array(lit(1.0f), lit(2.0f)), array(lit(3.0f), lit(4.0f))).as("d"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
    assert(df.head().getDouble(0) == 11.0)
  }
}
