package graft

import org.apache.spark.sql.functions._

/** The custom physical as-of join (plans/AsofJoin.scala). Exact output
  * equivalence to the oracle is under the driver gate (q_asof_join_native
  * shares q_asof_join's oracle); these specs pin what the gate can't see:
  * that the custom operator actually executes (plan shape), that it agrees
  * with the compositional window form row-for-row, and the boundary
  * semantics (equal-time match, no-candidate nulls, key isolation).
  */
class AsofJoinExecSpec extends SparkSpec {

  test("plan contains AsofJoinExec and no window/union fallback") {
    val df = operators.TimeJoins.asofJoinNative(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"custom operator must plan:\n$p")
    assert(!p.contains("Union"),
      "the native path must not fall back to the tagged-union formulation")
    // the only windows allowed are the signup-side dedup's, never a
    // last(ignoreNulls) timeline carry (the compositional form's engine)
    assert(!p.contains("last("), s"no window-carry fallback:\n$p")
  }

  test("native operator ≡ compositional window form, row for row") {
    val native = operators.TimeJoins.asofJoinNative(spark, Sf).collect().map(_.toSeq)
    val window = operators.TimeJoins.asofJoin(spark, Sf).collect().map(_.toSeq)
    assert(native.length === window.length)
    assert(native.toSeq === window.toSeq)
  }

  test("boundary semantics: equal time matches, earlier-only keys null out") {
    import spark.implicits._
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 50L, "c"))
      .toDF("rk", "rt", "v")
    val left = Seq((1L, 9L), (1L, 10L), (1L, 25L), (2L, 40L), (3L, 100L))
      .toDF("k", "t")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val out = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        graft.plans.AsofJoinPlan(lp, rp, Seq(a(lp, "k")), Seq(a(rp, "rk")),
          a(lp, "t"), a(rp, "rt")))
      .select(col("k"), col("t"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(x => (x._1, x._2))
    assert(out === Array(
      (1L, 9L, null),      // before any right row
      (1L, 10L, "a"),      // equal time matches (<=)
      (1L, 25L, "b"),      // latest at-or-before wins
      (2L, 40L, null),     // right exists for key but only later
      (3L, 100L, null)))   // key absent from right entirely

    // tolerance: the (1, 25) match is 5 ticks old — in band at 5, out at 4
    def withTol(tol: Long) = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        graft.plans.AsofJoinPlan(lp, rp, Seq(a(lp, "k")), Seq(a(rp, "rk")),
          a(lp, "t"), a(rp, "rt"), toleranceUs = Some(tol)))
      .filter(col("k") === 1L && col("t") === 25L)
      .select(col("v")).collect().map(_.getString(0)).toSeq
    assert(withTol(5L) === Seq("b"))
    assert(withTol(4L) === Seq(null))
  }

  test("randomized differential: operator ≡ in-memory reference on 5 generated datasets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val leftGen = Gen.listOfN(200, for {
      k <- Gen.choose(0L, 8L); t <- Gen.choose(0L, 50L)
    } yield (k, t))
    val rightGen = Gen.listOfN(60, for {
      k <- Gen.choose(0L, 8L); t <- Gen.choose(0L, 50L); v <- Gen.choose(0L, 999L)
    } yield (k, t, v))
    (1 to 5).foreach { i =>
      val ls = leftGen(Gen.Parameters.default, Seed(7L * i)).get.zipWithIndex
        .map { case ((k, t), id) => (id.toLong, k, t) }
      // as-of contract: right unique per (key, time)
      val rs = rightGen(Gen.Parameters.default, Seed(11L * i)).get
        .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
      val tol = if (i % 2 == 0) Some(7L) else None
      // in-memory reference: latest right at-or-before, within tolerance
      val expect = ls.map { case (id, k, t) =>
        val m = rs.filter(r => r._1 == k && r._2 <= t &&
                               tol.forall(b => t - r._2 <= b))
        (id, k, t, if (m.isEmpty) null else m.maxBy(_._2)._3.asInstanceOf[Any])
      }.sortBy(_._1)
      val lp = ls.toDF("id", "k", "t").repartition(3).queryExecution.analyzed
      val rp = rs.toDF("rk", "rt", "v").repartition(2).queryExecution.analyzed
      def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      val got = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
          graft.plans.AsofJoinPlan(lp, rp, Seq(a(lp, "k")), Seq(a(rp, "rk")),
            a(lp, "t"), a(rp, "rt"), tol))
        .select(col("id"), col("k"), col("t"), col("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                             if (r.isNullAt(3)) null else r.getLong(3).asInstanceOf[Any]))
        .sortBy(_._1).toSeq
      assert(got === expect, s"dataset $i (tol=$tol) diverged from the reference")
    }
  }
}
