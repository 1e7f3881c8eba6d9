package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPrep

/** The composed corpus-prep pipeline: stage yields, survivor provenance,
  * packing contiguity, end-to-end determinism. (Each stage's exact values
  * are already under the DuckDB oracle via its own query; this proves the
  * COMPOSITION is sound.)
  */
class CorpusPrepSpec extends SparkSpec {

  test("stage yields are monotone and every survivor is quality-kept, canonical, train") {
    val (packed, stages) = CorpusPrep.run(spark, Sf)
    val counts = stages.map(_._2)
    assert(counts === counts.sorted.reverse, s"yields must be monotone: $stages")
    assert(stages.head._2 > 0 && stages.last._2 > 0)
    val out = packed.collect()
    assert(out.length.toLong === stages.last._2)

    val kept = operators.Text.qualityBand(spark, Sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val canon = operators.Dedup.dedupComponents(spark, Sf)
      .filter(col("is_canonical")).select("doc_id").collect().map(_.getLong(0)).toSet
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(kept.contains(id) && canon.contains(id) && id % 10 < 8,
        s"survivor $id must pass every stage")
    }
  }

  test("packing is contiguous over the filtered corpus and deterministic across runs") {
    val (packed, _) = CorpusPrep.run(spark, Sf)
    val rows = packed.collect().sortBy(_.getAs[Long]("doc_id"))
    // exclusive prefix: first span starts at 0, each next starts where the
    // previous ended — no gaps, no overlaps, in doc_id order
    var expectStart = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("tok_start") === expectStart)
      assert(r.getAs[Long]("seq_id") === expectStart / 2048L)
      assert(r.getAs[Long]("seq_offset") === expectStart % 2048L)
      expectStart += r.getAs[Long]("n_tokens")
    }
    val again = CorpusPrep.run(spark, Sf)._1.collect().sortBy(_.getAs[Long]("doc_id"))
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "two runs must produce identical output")
  }

  test("snapshot time travel: readSnapshotAsOf returns the exact historical table") {
    import java.nio.file.Files
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tt").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$base/v00000")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(s"$base/v00002")
    Seq((1L, "z"), (2L, "b"), (3L, "c")).toDF("k", "v").write.parquet(s"$base/v00005")
    assert(sources.SnapshotStore.snapshotVersions(spark, base) === Seq(0L, 2L, 5L))
    def at(v: Long) = sources.SnapshotStore.readSnapshotAsOf(spark, base, v)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(at(0L) === Seq((1L, "a")))
    assert(at(3L) === Seq((1L, "a"), (2L, "b")), "as-of between versions reads the floor")
    assert(at(99L) === Seq((1L, "z"), (2L, "b"), (3L, "c")))
    intercept[IllegalArgumentException] {
      sources.SnapshotStore.readSnapshotAsOf(spark, s"$base/empty", 0L)
    }
  }
}
