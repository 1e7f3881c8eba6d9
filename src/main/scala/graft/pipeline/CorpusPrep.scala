package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Text}
import graft.util.Tables._

/** The end-to-end training-corpus preparation run — the composed "what this
  * engine is for" pipeline over the `documents` table:
  *
  *   quality band → near-dup dedup (canonical survivors) → split assignment
  *   → sequence packing
  *
  * Every stage is one of the individually-oracled operators (q_quality_band,
  * q_doc_dedup_components, q_split_assign, q_seq_pack); this module is the
  * composition a user actually runs, plus per-stage row accounting (the
  * yield report every corpus build publishes). Stages stay DataFrames end
  * to end, so Catalyst fuses the filter chain: the text column is read
  * ONCE, each successive stage joins only (doc_id)-shaped survivors.
  *
  * Scale shape: quality banding is two passes (aggregate + broadcast
  * edges); dedup shuffles digests/signatures, never text; split assignment
  * is a pure doc_id hash (zero shuffle); packing is the two-phase
  * distributed prefix sum. No stage collects, no stage holds state
  * proportional to the corpus on any single node.
  */
object CorpusPrep {

  /** Runs the full prep; returns (packed sequences, per-stage row counts).
    * Output: one row per surviving document with its token span and
    * training-sequence assignment (seq_id, seq_offset).
    */
  def run(spark: SparkSession, sfDir: String,
          seqLen: Long = 2048L): (DataFrame, Seq[(String, Long)]) = {
    val corpus = t(spark, sfDir, "documents")
    val n0 = corpus.count()

    // 1. quality band: keep the p10–p90 score band (drops boilerplate and
    //    degenerate-length tails on both ends)
    val kept = Text.qualityBand(spark, sfDir).select(col("doc_id"))
    val n1 = kept.count()

    // 2. near-dup dedup: canonical representative per minhash component
    val canon = Dedup.dedupComponents(spark, sfDir)
      .filter(col("is_canonical")).select(col("doc_id"))
    val afterDedup = kept.join(canon, "doc_id")
    val n2 = afterDedup.count()

    // 3. deterministic split: training partition only
    val train = Text.splitAssign(spark, sfDir)
      .filter(col("split") === "train").select(col("doc_id"))
    val afterSplit = afterDedup.join(train, "doc_id")
    val n3 = afterSplit.count()

    // 4. sequence packing over the SURVIVING corpus (token offsets are
    //    relative to the filtered, doc_id-ordered corpus — same two-phase
    //    prefix sum as q_seq_pack, never a single-reducer window)
    val toks = corpus.join(afterSplit, "doc_id").select(
      col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = ordered(
      graft.util.PrefixSum.exclusive(toks, "doc_id", col("n_tokens"), "tok_start")
        .select(col("doc_id"), col("n_tokens"), col("tok_start"),
                expr(s"tok_start div ${seqLen}L").as("seq_id"),
                pmod(col("tok_start"), lit(seqLen)).as("seq_offset")),
      "doc_id")

    (packed, Seq(
      "corpus" -> n0, "quality_band" -> n1,
      "dedup_canonical" -> n2, "train_split" -> n3))
  }

  /** Structured ETL run report — the per-stage yield table every corpus
    * build publishes (and the reference's logging+alerting intent,
    * run_etl_bat:10–31, re-expressed as DATA instead of a console log):
    * one row per pipeline stage with rows-in/rows-out/dropped/drop-rate
    * for the oracle-expressible curation chain
    * ingest → Gopher quality rules → exact dedup (canonical survivor per
    * normalized digest, WITHIN quality survivors) → train split.
    *
    * Deliberately NOT [[run]]'s eager `count()` accounting: the whole
    * report is ONE lazy plan — a single projection computes every
    * per-doc stage flag (each stage's predicate conjoins the previous
    * one, so survival is monotone by construction), one digest hash-agg
    * finds canonical ids among quality survivors, and ONE wide
    * conditional aggregate produces all four counts, unstacked to stage
    * rows. At 100 TB that's one corpus scan + one digest-shaped shuffle
    * — the report costs what the dedup stage alone costs, and the
    * registry entry stays action-free.
    */
  def runReport(spark: SparkSession, sfDir: String): DataFrame = {
    val words = size(split(col("text"), " ")).cast("long")
    val mwl = (length(col("text")).cast("long") - (words - 1)).cast("double") /
      words.cast("double")
    val alphaWords =
      size(expr("filter(split(text, ' '), w -> w rlike '[A-Za-z]')")).cast("long")
    val stopHits = Seq("the", "a", "of", "and", "to", "with")
      .map(w => array_contains(split(col("text"), " "), w).cast("int"))
      .reduce(_ + _)
    val gKeep = (words >= 20 && words <= 1000) &&
      (mwl >= 3.0 && mwl <= 10.0) &&
      (alphaWords * 5 >= words * 4) && (stopHits >= 2)
    val proj = t(spark, sfDir, "documents").select(
      col("doc_id"),
      gKeep.as("g"),
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("dg"),
      (pmod(col("doc_id"), lit(10L)) < 8).as("tr"))
    val canon = proj.filter(col("g"))
      .groupBy(col("dg")).agg(min(col("doc_id")).as("mn"))
    val flags = proj.join(canon, Seq("dg"), "left")
      .select(col("g"), (col("g") && col("doc_id") === col("mn")).as("c"),
              col("tr"))
    val agg = flags.agg(
      count(lit(1)).as("n0"),
      sum(when(col("g"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("c"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("c") && col("tr"), 1L).otherwise(0L)).as("n3"))
    ordered(
      agg.select(expr(
        "stack(4, 1, 'ingest', n0, n0, 2, 'gopher_quality', n0, n1, " +
          "3, 'exact_dedup', n1, n2, 4, 'train_split', n2, n3) " +
          "AS (stage_id, stage, rows_in, rows_out)"))
        .select(col("stage_id").cast("long").as("stage_id"), col("stage"),
                col("rows_in"), col("rows_out"),
                (col("rows_in") - col("rows_out")).as("rows_dropped"),
                r4((col("rows_in") - col("rows_out")).cast("double") /
                   col("rows_in").cast("double")).as("drop_pct")),
      "stage_id")
  }
}
