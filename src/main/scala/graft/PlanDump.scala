package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every declared query to a directory
  * (round-6 deliverable: plans/r06/<query>_{before,after}.txt). Not part of
  * the driver contract.
  *
  *   SPARK_GRAFT_PLAN_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=_before \
  *     sbt -batch "runMain graft.PlanDump"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r06")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "_before")
    val only = sys.env.get("SPARK_GRAFT_PLAN_ONLY") // comma-separated prefixes
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.split(",").exists(name.startsWith))) {
        try {
          // queryExecution.explainString — the same text explain() prints.
          // NOTE: plans with driver-side precomputation (components
          // union-find, IVF Lloyd) EXECUTE those jobs during construction.
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/$name$suffix.txt")
          try w.write(txt) finally w.close()
          println(s"[plan] wrote $name$suffix (${txt.length} chars)")
        } catch {
          case e: Throwable => println(s"[plan] $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
