package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Structured Streaming ↔ batch agreement: the same StreamOps transform fed
  * through a MemoryStream must produce exactly the rows of its batch
  * execution (SURVEY §2.2 — streaming is the declared growth path; batch
  * twins are the verified contract).
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val sample = Seq(
    (ts("2024-01-01 00:05:00"), 1L, 10.0),
    (ts("2024-01-01 00:45:00"), 1L, 20.0),
    (ts("2024-01-01 01:10:00"), 1L, 30.0), // next hour, >30min gap → new session
    (ts("2024-01-01 00:20:00"), 2L, 5.0),
    (ts("2024-01-01 02:00:00"), 2L, 7.0),
  )

  test("tumbling window: stream output equals batch execution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "value")
    val q = StreamOps.tumblingCounts(streamDf)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling_out")
      .orderBy("window_start").collect().toSeq
    val batch = StreamOps.tumblingCounts(sample.toDF("ts", "user_id", "value"))
      .orderBy("window_start").collect().toSeq
    assert(streamed === batch)
    assert(batch.map(_.getAs[Long]("n_events")).sum === sample.length)
  }

  test("session window: stream output equals batch execution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamOps.sessionCounts(mem.toDF().toDF("ts", "user_id", "value"))
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("session_out")
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = StreamOps.sessionCounts(sample.toDF("ts", "user_id", "value"))
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamed === batch)
    // user 1: 00:05 | 00:45+01:10 (40min gap splits, 25min gap merges) → 2
    // sessions; user 2: 00:20 | 02:00 → 2 sessions
    assert(batch.count(_.getAs[Long]("user_id") == 1L) === 2)
    assert(batch.count(_.getAs[Long]("user_id") == 2L) === 2)
  }

  test("flatMapGroupsWithState: per-user state accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "value")
      .as[StreamOps.UserEvent]
    val q = StreamOps.runningUserProfile(events)
      .writeStream.format("memory").queryName("running_out")
      .outputMode("append").start()
    // micro-batch 1
    mem.addData((ts("2024-01-01 00:05:00"), 1L, 10.0),
                (ts("2024-01-01 00:06:00"), 1L, 5.0))
    q.processAllAvailable()
    // micro-batch 2: state must carry over, not reset
    mem.addData((ts("2024-01-01 00:30:00"), 1L, 1.0),
                (ts("2024-01-01 00:31:00"), 2L, 7.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("running_out")
      .orderBy("user_id", "n_events").collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    // two emissions for user 1: (2 events, 15.0) then (3 events, 16.0)
    assert(u1.map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSeq
      === Seq((2L, 15.0), (3L, 16.0)))
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSeq
      === Seq((1L, 7.0)))
  }
}
