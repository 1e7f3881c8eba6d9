package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: dump `.explain("formatted")` for a set of
  * registry queries to files (plans/r{N}/{query}_{tag}.txt) so before/after
  * plan shapes are auditable without running Spark.
  *
  * Usage: runMain graft.PlanDump <tag> <q_a,q_b,...> [outDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = if (args.length > 2) args(2) else "/root/repo/plans/r15"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $n")
        spark.catalog.clearCache()
        System.gc()
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
