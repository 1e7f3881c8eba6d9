package graft

import org.apache.spark.sql.functions._

/** Round-14 regression fixtures: the r13 ADVICE items (mixTemperature
  * ultra-tail floor) and the round's new temporal/CDC operators.
  */
class Round14OpsSpec extends SparkSpec {

  test("mixTemperature floors the reduced token count: a language with " +
       "tokens < red keeps a nonzero temperature weight (r13 ADVICE)") {
    import spark.implicits._
    // total = 5.0003e9 => red = total div 1e6 = 5000; the tail language
    // sits BELOW the reduction quantum (300 < 5000) — pre-fix its reduced
    // count, share, weight and boost all collapsed to exactly 0
    val counts = Seq(
      ("en", 1000000L, 5000000000L),
      ("mid", 2000L, 3000000L),
      ("xx", 3L, 300L)
    ).toDF("lang", "n_docs", "tokens")
    val out = graft.operators.Text.mixTemperatureOf(counts)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (xxShare, xxWeight, xxBoost) = out("xx")
    // reduced tk floors at 1: s = floor(sqrt(1e12 div (total div red))) > 0
    assert(xxWeight > 0L,
      s"sub-red tail language zeroed out: weight_bp=$xxWeight")
    assert(xxBoost > 0L, s"tail boost_bp=$xxBoost must be positive")
    // share_bp stays 0 at this magnitude (1 * 10000 div ~1e6 = 0) — the
    // boost divides by the documented 1-bp floor, not by zero
    assert(xxShare === 0L)
    // and the tail is UP-weighted relative to its share while the head is
    // DOWN-weighted: τ=0.5 semantics hold across the reduction boundary
    val (enShare, enWeight, _) = out("en")
    assert(enWeight < enShare, "head language must be down-weighted")
    assert(xxBoost > 10000L, "tail boost must exceed parity (10000 bp)")
  }

  test("mixTemperature boundary: a language with tokens exactly AT red " +
       "reduces to 1 and agrees with the floored path") {
    import spark.implicits._
    val counts = Seq(
      ("en", 1000L, 5000000000L),
      ("at", 1L, 5000L),   // tokens == red exactly -> tokens div red = 1
      ("lo", 1L, 4999L)    // one below -> div = 0, floored to 1
    ).toDF("lang", "n_docs", "tokens")
    val out = graft.operators.Text.mixTemperatureOf(counts)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("at") === out("lo"),
      "adjacent languages across the reduction boundary must not diverge " +
        "by more than the 1-count floor (both reduce to 1)")
    assert(out("at") > 0L)
  }
}
