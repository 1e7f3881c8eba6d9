package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming formulations of the windowing tier (SURVEY §2.2
  * "Streaming"): the reference is a daily batch with CDC as its only change
  * feed; real-time is its declared growth path (README.md:390). These
  * transforms run identically on a batch DataFrame or a `readStream` source
  * — the batch twins in operators.Windows are the oracle-checkable
  * equivalents, and StreamingSpec proves batch/stream agreement over
  * MemoryStream input.
  *
  * Scale notes: watermarks bound state (late events beyond 1 hour are
  * dropped, so state per key is finite); both aggregations shuffle once on
  * the window/session key, the same plan shape as their batch twins.
  */
object StreamOps {

  /** Tumbling 1-hour event-time counts. On a stream: append-mode output
    * once the watermark passes the window end.
    */
  def tumblingCounts(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour").as("win"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("window_start"), col("n_events"), col("sum_value"))

  /** Session windows with a 30-minute inactivity gap, per user — the
    * built-in session_window (state-backed on a stream); the batch twin is
    * Windows.sessionGaps' lag+cumsum rewrite.
    */
  def sessionCounts(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(col("user_id"), session_window(col(tsCol), "30 minutes").as("win"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("win.start").as("session_start"), col("n_events"))
}
