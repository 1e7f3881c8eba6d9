package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for graft's native expressions — both the
  * SparkSessionExtensions path (spark.sql.extensions=graft.functions.
  * GraftExtensions, cluster-wide) and a direct per-session helper.
  * After registration the functions are first-class SQL:
  * `SELECT cosine_sim(a.embedding, b.embedding) FROM ...`.
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_f"      -> (es => DotProductF(es(0), es(1))),
    "sig_match"  -> (es => SignatureMatchCount(es(0), es(1))),
    "sq_l2"      -> (es => SquaredL2Long(es(0), es(1))),
    "dot_q"      -> (es => DotProductLong(es(0), es(1))),
    "shingles"   -> (es => DistinctShingles(es(0), es(1))),
    "pos_shingles" -> (es => PositionalShingles(es(0), es(1))),
    "hyperplane_bands" -> (es => HyperplaneBands(es(0))),
    "vec_sum_q"  -> (es => VecSumLong(es(0))),
    "simhash64"  -> (es => SimHash64(es(0))),
    "minhash_sig" -> (es => MinHashSig(es(0), es(1))),
    // xxHash64 with a CALLER-CHOSEN seed (the SQL builtin pins seed=42).
    // Catalyst's XXH64 is a faithful xxHash64, so over binary input it is
    // bit-identical to the net.jpountz hash the CMS/MinHash aggregators
    // use — which is what lets a sketch POINT QUERY run in-plan
    // (Text.cmsHeavyHitters) instead of on the driver. Seed must be a
    // foldable literal: it parameterizes the expression, it is not data.
    "xxh64_seed" -> (es => {
      val seed = es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
          v.toString.toLong
        case other =>
          throw new IllegalArgumentException(s"xxh64_seed: seed must be a literal, got $other")
      }
      org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(es(0)), seed)
    }),
  )

  /** Register on a live session (tests, notebooks). */
  def register(spark: SparkSession): SparkSession = {
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    spark
  }

  /** Column-API helpers (no registration needed). */
  def cosineSim(a: Column, b: Column)(implicit spark: SparkSession): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
  }
}

/** Injectable extensions: spark.sql.extensions=graft.functions.GraftExtensions */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (es: Seq[Expression]) => DotProductF(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("sig_match"),
      new ExpressionInfo(classOf[SignatureMatchCount].getName, "sig_match"),
      (es: Seq[Expression]) => SignatureMatchCount(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("sq_l2"),
      new ExpressionInfo(classOf[SquaredL2Long].getName, "sq_l2"),
      (es: Seq[Expression]) => SquaredL2Long(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_q"),
      (es: Seq[Expression]) => DotProductLong(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[DistinctShingles].getName, "shingles"),
      (es: Seq[Expression]) => DistinctShingles(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("pos_shingles"),
      new ExpressionInfo(classOf[PositionalShingles].getName, "pos_shingles"),
      (es: Seq[Expression]) => PositionalShingles(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bands"),
      new ExpressionInfo(classOf[HyperplaneBands].getName, "hyperplane_bands"),
      (es: Seq[Expression]) => HyperplaneBands(es(0))))
    ext.injectFunction((
      FunctionIdentifier("vec_sum_q"),
      new ExpressionInfo(classOf[VecSumLong].getName, "vec_sum_q"),
      (es: Seq[Expression]) => VecSumLong(es(0))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es(0), es(1))))
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
    ext.injectOptimizerRule(_ => graft.plans.BroadcastGuardRule)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
