package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Similarity

/** Native vector expressions: correctness vs the zip_with/aggregate
  * formulation (must be bit-identical — same double accumulation order),
  * null/edge semantics, and a relative-throughput check.
  */
class VectorFunctionsSpec extends SparkSpec {

  test("cosine_sim matches the zip_with/aggregate formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val emb = graft.util.Tables.t(spark, Sf, "embeddings")
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("p"))
    val both = emb.crossJoin(broadcast(probe)).select(
      col("vec_id"),
      call_function("cosine_sim", col("embedding"), col("p")).as("native"),
      (Similarity.dot(col("embedding"), col("p")) /
        (Similarity.norm(col("embedding")) * Similarity.norm(col("p")))).as("hof"))
    val diff = both.filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
  }

  test("cosine_sim via SQL after extension-style registration") {
    GraftFunctions.register(spark)
    graft.util.Tables.t(spark, Sf, "embeddings").createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb a JOIN emb b ON b.vec_id = 0 WHERE a.vec_id = 0""".stripMargin).head()
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12) // self-similarity
  }

  test("sig_match equals the zip_with/filter/size HOF formulation") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val d = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),   // 3 agree
      (Seq(5L, 5L), Seq(5L, 5L)),                   // all agree
      (Seq(1L, 2L), Seq(3L, 4L)))                   // none agree
      .toDF("a", "b")
    val both = d.select(
      call_function("sig_match", col("a"), col("b")).as("native"),
      size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), m => m)).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    assert(both.select("native").as[Int].collect().toSeq === Seq(3, 2, 0))
  }

  test("zero-norm input yields NULL, not NaN") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val d = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val r = d.select(call_function("cosine_sim", col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("native kernel beats the interpreted lambda path on a wide scan") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val n = 200000
    val vecs = spark.range(n)
      .select(col("id"), transform(sequence(lit(0), lit(63)),
        i => (pmod(col("id") + i, lit(97)).cast("float"))).as("v"))
      .select(col("id"), col("v").cast("array<float>").as("v"))
      .cache()
    vecs.count()
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val probe = vecs.filter(col("id") === 0).select(col("v").as("p"))
    val native = time(vecs.crossJoin(broadcast(probe))
      .select(call_function("cosine_sim", col("v"), col("p")).as("c"))
      .agg(sum("c")).head().getDouble(0))
    val hof = time(vecs.crossJoin(broadcast(probe))
      .select((Similarity.dot(col("v"), col("p")) /
        (Similarity.norm(col("v")) * Similarity.norm(col("p")))).as("c"))
      .agg(sum("c")).head().getDouble(0))
    info(f"native=$native%.2fs  hof=$hof%.2fs  speedup=${hof / native}%.1fx")
    vecs.unpersist()
    assert(native < hof, f"native $native%.2fs should beat interpreted $hof%.2fs")
  }
}
