package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Operational per-stage run accounting for composed batch pipelines — the
  * reference's logging+alerting intent (run_etl_bat:10–31 logs each step
  * and emails on failure) re-expressed as a DATA artifact: one row per
  * stage with rows-in/rows-out/dropped and wall time, the frame a driver
  * writes next to the batch output and an alert rule reads.
  *
  * [[timed]] is EAGER by design (each stage's `count()` is the
  * materialization being timed) — it is the harness AROUND a batch run,
  * never a registry query; the lazy, oracle-gated twin that computes pure
  * row accounting in one plan is [[CorpusPrep.runReport]]
  * (q_etl_run_report). Counts are row-linear actions on frames the run
  * was going to materialize anyway; nothing here collects data rows.
  */
object RunReport {

  final case class StageRun(stage_id: Long, stage: String, rows_in: Long,
                            rows_out: Long, rows_dropped: Long, wall_ms: Long)

  /** Run `stages` sequentially from `input`, timing each stage's
    * materialization (count of its output) and recording rows in/out.
    * Returns (final frame, per-stage report). `rows_dropped` can be
    * negative for fan-out stages (explodes, dimension unions) — the
    * report records reality, it does not assume monotone pipelines.
    */
  def timed(input: DataFrame,
            stages: Seq[(String, DataFrame => DataFrame)]): (DataFrame, Seq[StageRun]) = {
    var cur = input
    var nIn = input.count()
    val runs = Seq.newBuilder[StageRun]
    stages.zipWithIndex.foreach { case ((name, fn), i) =>
      val t0 = System.nanoTime()
      val out = fn(cur)
      val nOut = out.count()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      runs += StageRun(i + 1L, name, nIn, nOut, nIn - nOut, wallMs)
      cur = out
      nIn = nOut
    }
    (cur, runs.result())
  }

  /** The report as a frame (what a driver persists next to the batch). */
  def toDF(spark: SparkSession, runs: Seq[StageRun]): DataFrame = {
    import spark.implicits._
    runs.toDF()
  }
}
