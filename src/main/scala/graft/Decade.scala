package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{Ivf, Text}

/** Dev main for the scale-decade sweeps (SURVEY robustness notes): runs one
  * parameterized heavy operator against a `tools/scaleup.py` output dir and
  * prints a one-line JSON wall/rows record. Parameterized ops cover the
  * cell-sizing rule the registry's fixed-param queries can't express
  * (nLists scales with corpus size — 16 at sf0.1, ~2048 at the 100×
  * decade). Heap via SPARK_DRIVER_MEM (graph/semantic decades need 48g).
  *
  * Usage: runMain graft.Decade <sfDir> <op> [params...]
  *   semantic_flat <nLists> | semantic_hier <nLists> <nCoarse> |
  *   ann_join <nLists> | <any registry query name>
  */
object Decade {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val op = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Sessions.tune(spark)
    val t0 = System.nanoTime()
    val df = op match {
      case "semantic_flat" =>
        Ivf.semanticDedupGated(spark, sfDir, args(2).toInt, 130000000L)
      case "semantic_hier" => // args: nCoarse kPerGroup
        Ivf.semanticDedupHier(spark, sfDir, args(2).toInt, args(3).toInt, 130000000L)
      case "ann_join" =>
        Ivf.annJoinGated(spark, sfDir, args(2).toInt, 130000000L)
      case "diag_flat" =>
        Ivf.assignDiag(spark, sfDir, args(2).toInt, 0, hier = false)
      case "diag_hier" =>
        Ivf.assignDiag(spark, sfDir, args(2).toInt, args(3).toInt, hier = true)
      case "served_batch" => // args: nProbes — per-probe cost flatness of
        // the served IVFPQ tier (r12 verdict item 6): the ADC broadcasts
        // are (probes × nprobe × codes)-bounded, so wall(256)/wall(8)
        // should sit far below 32×
        Ivf.annIvfPqServed(spark, sfDir, 16, 4, 8, args(2).toInt, 10)
      case "served_batch_adaptive" => // args: nProbes — the same flatness
        // measurement at the PRODUCTION sizing (r13 verdict item 3): the
        // q_ann_ivf_adaptive rule nLists = max(4, min(256, ceil(sqrt(n))))
        // keeps per-cell candidate volume √n-bounded, so per-probe wall
        // should stay flat across the decade where fixed nLists=16 grew
        val n = graft.util.Tables.t(spark, sfDir, "embeddings")
          .select(org.apache.spark.sql.functions.col("vec_id")).count()
        val nLists = math.max(4L, math.min(256L,
          math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
        System.err.println(s"[decade] adaptive nLists=$nLists (n=$n)")
        Ivf.annIvfPqServed(spark, sfDir, nLists, 4, 8, args(2).toInt, 10)
      case other =>
        SparkEntry.queries(other)(spark, sfDir)
    }
    val n = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val extra = if (op.startsWith("diag_")) {
      val r = df.head()
      s""","stats":"${r.toString}""""
    } else ""
    println(f"""{"op":"$op","sf":"$sfDir","rows":$n,"wall_sec":$wall%.1f$extra}""")
    spark.stop()
  }
}
