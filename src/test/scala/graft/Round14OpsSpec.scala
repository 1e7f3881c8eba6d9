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

  test("temporal predicate family is mutually consistent: ALL contains " +
       "AS OF, FROM..TO and CONTAINED IN row-for-row on the same fixture") {
    import graft.operators.Warehouse
    def keyed(df: org.apache.spark.sql.DataFrame) =
      rows(df.select(col("user_id"), col("event_id"),
                     col("valid_from_us"))).toSet
    val all = keyed(Warehouse.scd2All(spark, Sf))
    val asOf = keyed(Warehouse.scd2AsOf(spark, Sf))
    val between = keyed(Warehouse.scd2Between(spark, Sf))
    val contained = keyed(Warehouse.scd2ContainedIn(spark, Sf))
    assert(all === keyed(Warehouse.scd2Versions(spark, Sf)),
      "ALL must be exactly the full version relation")
    assert(asOf.subsetOf(all), "AS OF escaped ALL")
    assert(between.subsetOf(all), "FROM..TO escaped ALL")
    assert(contained.subsetOf(all), "CONTAINED IN escaped ALL")
    // CONTAINED IN is the strictest predicate on this interval nesting
    assert(contained.subsetOf(between) || contained.isEmpty,
      "a fully-contained version must also overlap the wider interval")
    assert(asOf.nonEmpty && between.nonEmpty && contained.nonEmpty)
    // the ordinal is dense 1..n per key and current rows close the chain
    val byKey = rows(Warehouse.scd2All(spark, Sf)
        .select(col("user_id"), col("version_no"), col("is_current"),
                col("src_table")))
      .groupBy(_.head.asInstanceOf[Long])
    byKey.foreach { case (uid, vs) =>
      val ords = vs.map(_(1).asInstanceOf[Long]).sorted
      assert(ords === (1L to ords.size).toSeq, s"user $uid ordinal gap")
      val currents = vs.filter(_(2).asInstanceOf[Boolean])
      assert(currents.size === 1, s"user $uid must have ONE current row")
      assert(currents.head(3) === "current" &&
             vs.filterNot(_(2).asInstanceOf[Boolean])
               .forall(_(3) === "history"),
        s"user $uid src_table tag disagrees with is_current")
    }
  }

  test("cdcIncrementalConsume: a crash between replica commit and " +
       "bookmark advance replays idempotently — exactly-once net effect") {
    import graft.operators.Warehouse
    import graft.sources.SnapshotStore
    val root = java.nio.file.Files.createTempDirectory("cdcconsume").toString
    // cycle 1 CRASHES in the window: replica advanced, bookmark NOT
    val crashed = rows(Warehouse.cdcIncrementalConsume(
      spark, Sf, Some(root), crashBeforeBookmark = true))
    assert(crashed.forall(_(2).asInstanceOf[Long] === 0L),
      "crashed cycle must still report the UNADVANCED bookmark")
    val replicaAfterCrash = rows(
      SnapshotStore.readCommitted(spark, s"$root/replica")
        .select(col("o_orderkey"), col("p"))).toSet
    // cycle 2 replays the full (0, 2] slice onto the advanced replica
    val healed = Warehouse.cdcIncrementalConsume(spark, Sf, Some(root))
    val healedRows = rows(healed)
    assert(healedRows.forall(_(2).asInstanceOf[Long] === 2L),
      "bookmark must advance to the latest LSN after the healing cycle")
    val replicaHealed = rows(
      SnapshotStore.readCommitted(spark, s"$root/replica")
        .select(col("o_orderkey"), col("p"))).toSet
    assert(replicaHealed === replicaAfterCrash,
      "replaying the consumed slice changed the replica — apply is not " +
        "idempotent, net effect would be at-least-once")
    // and the net state IS the latest dimension snapshot, exactly
    val want = rows(Warehouse.cdcSnap(spark, Sf, 2)
      .select(col("o_orderkey"), col("p"))).toSet
    assert(replicaHealed === want, "consumer replica != latest snapshot")
    // a third, no-op cycle: bookmark current, nothing re-applied
    val versionsBefore =
      SnapshotStore.committedVersions(spark, s"$root/replica").size
    rows(Warehouse.cdcIncrementalConsume(spark, Sf, Some(root)))
    assert(SnapshotStore.committedVersions(spark, s"$root/replica").size
             === versionsBefore,
      "an up-to-date consumer must not rewrite its replica")
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
