package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Windows}

/** Round-8m additions: the boundary-sweep concurrency profile, per-user
  * interval-union coverage, and directed-graph reciprocity. Sequential
  * driver folds plus the conservation laws the oracle can't state.
  */
class Round8mOpsSpec extends SparkSpec {

  private val GapUs = 30L * 60 * 1000 * 1000
  private val LenUs = 10L * 60 * 1000 * 1000

  private def userEvents: Map[Long, Seq[(Long, Long)]] =
    graft.util.Tables.events(spark, Sf)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
                 r.getAs[Long]("ts_us")))
      .groupBy(_._1)
      .map { case (u, es) => u -> es.map(e => (e._3, e._2)).sorted.toSeq }

  private def sessionsOf(es: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // (start, end) per 30-min-gap session of one user's (ts, id)-sorted events
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var s = -1L; var e = -1L
    es.foreach { case (ts, _) =>
      if (s < 0) { s = ts; e = ts }
      else if (ts - e > GapUs) { out += ((s, e)); s = ts; e = ts }
      else e = ts
    }
    if (s >= 0) out += ((s, e))
    out.toSeq
  }

  test("concurrentSessions: per-day peaks match a sequential sweep; deltas conserve") {
    val out = Windows.concurrentSessions(spark, Sf).collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate ->
        (r.getAs[Long]("peak_concurrency"), r.getAs[Long]("n_boundaries"))).toMap
    val sess = userEvents.values.flatMap(sessionsOf).toSeq
    // sweep: +1 at start, -1 at end+1, zero-delta seed at every midnight
    // strictly inside [s, e] (the cross-midnight carry-in fix); ties
    // order +1, then 0, then -1
    val DayUs = 86400000000L
    val bounds = sess.flatMap { case (s, e) =>
      val seeds = ((s / DayUs + 1) to (e / DayUs)).map(d => (d * DayUs, 0L))
      Seq((s, 1L), (e + 1, -1L)) ++ seeds
    }.sortBy { case (ts, d) => (ts, -d) }
    var run = 0L
    val peaks = scala.collection.mutable.Map.empty[java.time.LocalDate, Long]
    val counts = scala.collection.mutable.Map.empty[java.time.LocalDate, Long]
    bounds.foreach { case (ts, d) =>
      run += d
      val day = java.time.Instant.ofEpochSecond(ts / 1000000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), run)
      if (d != 0L) counts(day) = counts.getOrElse(day, 0L) + 1
    }
    assert(run === 0L) // every +1 has its -1
    assert(out.keySet === peaks.keySet)
    out.foreach { case (day, (p, nb)) =>
      assert(p === peaks(day), s"peak of $day")
      assert(nb === counts.getOrElse(day, 0L), s"boundaries of $day")
    }
    assert(out.values.map(_._2).sum === 2L * sess.size)
  }

  test("intervalCoverage: per-user union length matches a sequential merge") {
    val out = Windows.intervalCoverage(spark, Sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_islands"),
         r.getAs[Long]("covered_us"), r.getAs[Long]("max_island_events"))).toMap
    userEvents.foreach { case (u, es) =>
      val ivs = es.map { case (ts, _) => (ts, ts + LenUs) }
      val islands = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      ivs.foreach { case (s, e) =>
        if (islands.nonEmpty && s <= islands.last._2)
          islands(islands.length - 1) =
            (islands.last._1, math.max(islands.last._2, e), islands.last._3 + 1)
        else islands += ((s, e, 1L))
      }
      val (ne, ni, cov, mx) = out(u)
      assert(ne === es.length.toLong, s"events of $u")
      assert(ni === islands.length.toLong, s"islands of $u")
      assert(cov === islands.map(i => i._2 - i._1).sum, s"coverage of $u")
      assert(mx === islands.map(_._3).max, s"max island of $u")
      // union bounds: one interval <= coverage <= n * len
      assert(cov >= LenUs && cov <= es.length * LenUs)
    }
  }

  test("reciprocity: ratios match a driver fold over the sequential edge list") {
    val row = Insights.reciprocity(spark, Sf).collect().head
    val lines = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
              col("l_suppkey"))
      .collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
                 r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    lines.groupBy(_._1).foreach { case (_, ls) =>
      val ps = ls.sortBy(l => (l._2, l._3, l._4)).map(_._3)
      ps.sliding(2).foreach {
        case Array(a, b) if a != b => w((a, b)) = w.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val nEdges = w.size.toLong
    val nRecip = w.keys.count { case (a, b) => w.contains((b, a)) }.toLong
    val totalW = w.values.sum
    val recipW = w.map { case ((a, b), c) =>
      math.min(c, w.getOrElse((b, a), 0L)) }.sum
    assert(row.getAs[Long]("n_edges") === nEdges)
    assert(row.getAs[Long]("n_recip") === nRecip)
    assert(row.getAs[Long]("total_w") === totalW)
    assert(row.getAs[Long]("recip_w") === recipW)
    assert(math.abs(row.getAs[Double]("reciprocity") -
      nRecip.toDouble / nEdges) < 1e-3)
    // flow mutuality can't exceed edge mutuality's weight bound
    assert(recipW <= totalW)
  }
}
