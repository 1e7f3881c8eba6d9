package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Text}

/** Round-8n additions: the information-theory tier — lang×source mutual
  * information, the token-stream entropy rate, and Theil inequality
  * indices. Driver folds plus the information inequalities the oracle
  * can't state (nonnegativity, subadditivity, conditioning-reduces-
  * entropy, Jensen).
  */
class Round8nOpsSpec extends SparkSpec {

  private def entropy(counts: Iterable[Long]): Double = {
    val n = counts.sum.toDouble
    math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n
  }

  test("mutualInfo: entropies match a driver fold; information inequalities hold") {
    val row = Insights.mutualInfo(spark, Sf).collect().head
    val cells = graft.util.Tables.t(spark, Sf, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("source")),
                 r.getAs[Long]("c"))).toMap
    val hL = entropy(cells.groupBy(_._1._1).map(_._2.values.sum))
    val hS = entropy(cells.groupBy(_._1._2).map(_._2.values.sum))
    val hJ = entropy(cells.values)
    val mi = hL + hS - hJ
    assert(row.getAs[Long]("n_docs") === cells.values.sum)
    assert(math.abs(row.getAs[Double]("h_lang") - hL) < 1e-3)
    assert(math.abs(row.getAs[Double]("h_source") - hS) < 1e-3)
    assert(math.abs(row.getAs[Double]("h_joint") - hJ) < 1e-3)
    assert(math.abs(row.getAs[Double]("mi_nats") - mi) < 1e-3)
    // information laws: 0 <= MI <= min(H), max(H) <= H_joint <= H_l + H_s
    assert(row.getAs[Double]("mi_nats") >= -1e-4)
    assert(row.getAs[Double]("mi_nats") <=
      math.min(row.getAs[Double]("h_lang"), row.getAs[Double]("h_source")) + 1e-4)
    assert(row.getAs[Double]("h_joint") + 1e-4 >=
      math.max(row.getAs[Double]("h_lang"), row.getAs[Double]("h_source")))
    assert(row.getAs[Double]("nmi") >= -1e-4 && row.getAs[Double]("nmi") <= 1 + 1e-4)
  }

  test("entropyRate: bigram entropies match a driver fold; conditioning reduces entropy") {
    val row = Text.entropyRate(spark, Sf).collect().head
    val docs = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { t =>
      val ws = t.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      ws.sliding(2).foreach {
        case Array(a, b) => big((a, b)) = big.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val hJ = entropy(big.values)
    val hF = entropy(big.groupBy(_._1._1).map(_._2.values.sum))
    assert(row.getAs[Long]("n_bigrams") === big.values.sum)
    assert(row.getAs[Long]("n_distinct_bigrams") === big.size.toLong)
    assert(math.abs(row.getAs[Double]("h_joint") - hJ) < 1e-3)
    assert(math.abs(row.getAs[Double]("h_first") - hF) < 1e-3)
    assert(math.abs(row.getAs[Double]("h_cond") - (hJ - hF)) < 1e-3)
    // H(w2|w1) >= 0 and conditioning can't beat the joint
    assert(row.getAs[Double]("h_cond") >= -1e-4)
    assert(row.getAs[Double]("h_cond") <= row.getAs[Double]("h_joint") + 1e-4)
  }

  test("theilIndex: T and L match a driver fold and respect Jensen nonnegativity") {
    val row = Insights.theilIndex(spark, Sf).collect().head
    val xs = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_custkey"))
      .agg((sum(graft.util.Tables.money(col("o_totalprice"))) * 100)
        .cast("long").as("x"))
      .collect().map(_.getAs[Long]("x").toDouble)
    val n = xs.length
    val mu = xs.sum / n
    val t = xs.map(x => (x / mu) * math.log(x / mu)).sum / n
    val l = xs.map(x => math.log(mu / x)).sum / n
    assert(row.getAs[Long]("n_customers") === n.toLong)
    assert(math.abs(row.getAs[Double]("theil_t") - t) < 1e-3)
    assert(math.abs(row.getAs[Double]("theil_l") - l) < 1e-3)
    assert(row.getAs[Double]("theil_t") >= -1e-4) // Jensen: T >= 0
    assert(row.getAs[Double]("theil_l") >= -1e-4) // Jensen: L >= 0
  }
}
