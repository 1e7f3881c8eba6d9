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
}
