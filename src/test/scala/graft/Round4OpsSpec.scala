package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Invariants for the round-4 operators (exact values are covered by the
  * DuckDB oracle via graft.Verify; these pin the semantic properties and
  * the plan shapes that the hash gate can't see).
  */
class Round4OpsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("tfidf: ranks are 1..k per doc, scores descend, rare terms beat common ones") {
    val r = SparkEntry.queries("q_tfidf")(spark, Sf)
    val byDoc = r.collect().groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { docRows =>
      val ranks = docRows.map(_.getAs[Long]("rn")).sorted
      assert(ranks.toSeq === (1L to ranks.length).toSeq, "ranks must be dense 1..k")
      val scores = docRows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "tfidf must be non-increasing in rank")
    }
    // idf monotonicity: among picked terms with identical tf, higher df ⇒ lower tfidf
    val sameTf = r.collect().groupBy(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("tf")))
    sameTf.values.filter(_.length > 1).foreach { g =>
      val byDf = g.sortBy(_.getAs[Long]("df"))
      assert(byDf.head.getAs[Double]("tfidf") >= byDf.last.getAs[Double]("tfidf"))
    }
  }

  test("token entropy: 0 <= H <= ln(n_terms) per language") {
    val r = SparkEntry.queries("q_token_entropy")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val h = row.getAs[Double]("entropy_nats")
      val cap = math.log(row.getAs[Long]("n_terms").toDouble)
      assert(h >= 0.0 && h <= cap + 1e-4, s"entropy $h outside [0, $cap]")
    }
  }

  test("quality band keeps the interior ~80% and drops both tails") {
    val all = SparkEntry.queries("q_quality_score")(spark, Sf)
    val band = SparkEntry.queries("q_quality_band")(spark, Sf)
    val nAll = all.count(); val nBand = band.count()
    assert(nBand < nAll, "band must drop something")
    assert(nBand >= (nAll * 0.7).toLong && nBand <= (nAll * 0.9).toLong,
      s"10/90 band should keep ~80%, kept $nBand of $nAll")
    // every kept score lies within [min kept, max kept] == no tail leakage:
    // the min overall score must NOT be in the band, nor the max
    val keptIds = band.select("doc_id").collect().map(_.getLong(0)).toSet
    val lowest = all.orderBy(col("quality_score").asc, col("doc_id").asc).head().getAs[Long]("doc_id")
    val highest = all.orderBy(col("quality_score").desc, col("doc_id").asc).head().getAs[Long]("doc_id")
    assert(!keptIds.contains(lowest) && !keptIds.contains(highest))
  }

  test("MAD outliers: robust stats bound the fence count; fence uses 3*1.4826*MAD") {
    val r = SparkEntry.queries("q_outlier_mad")(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n"); val out = row.getAs[Long]("n_outliers")
      assert(row.getAs[Double]("mad") >= 0.0)
      assert(out >= 0 && out < n / 2, "a robust fence can never flag a majority")
    }
  }

  test("argmax: no customer in the nation beats the winner; member counts sum to total") {
    val win = SparkEntry.queries("q_argmax")(spark, Sf)
    val cust = graft.util.Tables.t(spark, Sf, "customer")
      .join(graft.util.Tables.t(spark, Sf, "nation"),
            col("c_nationkey") === col("n_nationkey"))
    val beat = cust.join(win, "n_name")
      .filter(col("c_acctbal") > col("top_acctbal") + lit(1e-9))
    assert(beat.isEmpty, "someone outranks the argmax winner")
    assert(win.agg(sum("n_members")).head().getLong(0) === cust.count())
  }

  test("bloom-pruned join returns exactly the plain join result") {
    val pruned = SparkEntry.queries("q_bloom_join")(spark, Sf)
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
    val urgent = graft.util.Tables.t(spark, Sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
           graft.util.Tables.r4(sum(graft.util.Tables.money(col("l_extendedprice")))
             .cast("double")).as("revenue"))
    assert(pruned.except(plain).isEmpty && plain.except(pruned).isEmpty,
      "bloom false positives must be removed by the real join")
  }

  test("edit-distance pairs: a<b, same block, and dist=0 iff identical prefixes") {
    val d = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("lang"), expr("n_chars div 8").as("blk"),
              substring(col("text"), 1, 40).as("head"))
    val pairs = SparkEntry.queries("q_near_dup_editdist")(spark, Sf)
    val joined = pairs
      .join(d.select(col("doc_id").as("a_id"), col("lang").as("a_lang"),
                     col("blk").as("a_blk"), col("head").as("a_head")), "a_id")
      .join(d.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
                     col("blk").as("b_blk"), col("head").as("b_head")), "b_id")
      .collect()
    assert(joined.nonEmpty, "sf0.001 corpus contains exact dups → expect pairs")
    joined.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[String]("a_lang") === r.getAs[String]("b_lang"))
      assert(r.getAs[Long]("a_blk") === r.getAs[Long]("b_blk"))
      val same = r.getAs[String]("a_head") == r.getAs[String]("b_head")
      assert((r.getAs[Long]("dist") == 0L) === same)
    }
  }

  test("plan: MAD pipeline broadcasts both stat frames back over the scan") {
    val p = plan(SparkEntry.queries("q_outlier_mad")(spark, Sf))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(3000))
    assert(!p.contains("Window"), "robust stats must not use a window")
  }

  test("plan: argmax is a partial+final aggregate, never a window sort") {
    val p = plan(SparkEntry.queries("q_argmax")(spark, Sf))
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("max_by") || p.contains("ObjectHashAggregate")
           || p.contains("SortAggregate"), p.take(3000))
  }

  test("plan: bloom prune filters lineitem BEFORE its shuffle/join") {
    val df = SparkEntry.queries("q_bloom_join")(spark, Sf)
    val p = plan(df)
    // the UDF filter must sit under the join, i.e. appear in the plan at all
    assert(p.contains("Filter"), p.take(3000))
    // any real join strategy qualifies (r16: preferSortMergeJoin=false
    // lets the planner pick shuffled-hash where its size gate holds)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
           || p.contains("ShuffledHashJoin"))
  }
}
