package graft
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN", "q25_cos_neardup")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.explain("formatted")
    spark.stop()
  }
}
