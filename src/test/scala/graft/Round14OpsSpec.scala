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

  test("cdcCleanup: the low-water mark clamps at the lagging consumer's " +
       "bookmark, survivors replay losslessly, partitions physically drop") {
    import graft.operators.Warehouse
    import graft.sources.SnapshotStore
    val root = java.nio.file.Files.createTempDirectory("cdccleanup").toString
    val got = rows(Warehouse.cdcCleanup(spark, Sf, Some(root)))
    // retention cutoff is the head LSN (2) — aggressive enough to prune
    // EVERYTHING by age — but the subscriber's bookmark sits at 1, so the
    // clamp must hold lwm at 1 and keep the whole LSN-2 slice alive
    assert(got.nonEmpty)
    assert(got.forall(_(0).asInstanceOf[Long] === 2L),
      "exactly the LSN-2 slice must survive (lsn<=1 pruned, lsn=2 kept)")
    assert(got.forall(_(5).asInstanceOf[Long] === 1L),
      "low_water_mark must be the bookmark (1), not the retention cutoff")
    val wantSlice = rows(Warehouse.cdcAllChanges(spark, Sf)
      .filter(col("lsn") === 2L)).toSet
    assert(got.map(_.take(5)).toSet === wantSlice.map(_.take(5)),
      "survivors must equal the LSN-2 slice of the full change log")
    // NO DATA LOSS for the lagging subscriber: its replica (consumed
    // through the bookmark) + the surviving log replays to the latest
    // dimension snapshot exactly — nothing it still needs was pruned
    val surv = SnapshotStore.readCommitted(spark, s"$root/changetable")
      .select(col("lsn").cast("long").as("lsn"), col("o_orderkey"),
              col("op"), col("img"))
    val finals = surv.filter(col("op") =!= 3L)
      .groupBy(col("o_orderkey"))
      .agg(max_by(struct(col("op"), col("img")),
                  struct(col("lsn"), col("op"))).as("f"))
      .select(col("o_orderkey"), col("f.op").as("op"), col("f.img").as("img"))
    val replica = SnapshotStore.readCommitted(spark, s"$root/consumer/replica")
    val replayed = replica.join(finals, Seq("o_orderkey"), "left_anti")
      .unionByName(finals.filter(col("op") =!= 1L)
        .select(col("o_orderkey"), col("img").as("p")))
    val want = rows(Warehouse.cdcSnap(spark, Sf, 2)
      .select(col("o_orderkey"), col("p"))).toSet
    assert(rows(replayed).toSet === want,
      "replica@bookmark + surviving log must reconstruct the latest " +
        "snapshot — cleanup destroyed changes the subscriber still needs")
    // the prune is PHYSICAL at directory grain: the cleaned version's data
    // dir holds only the lsn=2 partition, while v1 still holds both
    val dataDirs = new java.io.File(s"$root/changetable").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("data-"))
      .map(_.listFiles().map(_.getName).filter(_.startsWith("lsn=")).sorted.toSeq)
      .toSeq
    assert(dataDirs.contains(Seq("lsn=1", "lsn=2")), "v1 = full log")
    assert(dataDirs.contains(Seq("lsn=2")),
      "cleaned version must contain ONLY the surviving lsn=2 directory")
    // idempotence: a second cleanup is a pure read — same rows, no new
    // change-table version
    assert(rows(Warehouse.cdcCleanup(spark, Sf, Some(root))) === got)
    assert(SnapshotStore.committedVersions(spark, s"$root/changetable")
             .size === 2,
      "re-running cleanup must not commit another change-table version")
  }

  test("scd2Retention: closed versions past the cutoff purge, current " +
       "rows never age out, ordinals re-densify over the survivors") {
    import graft.operators.Warehouse
    val cutoff = 1705276800000000L
    val all = rows(Warehouse.scd2All(spark, Sf))
    val ret = rows(Warehouse.scd2Retention(spark, Sf, cutoff))
    def ident(r: Seq[Any]) = (r(0), r(1), r(2), r(3), r(4))
    // survivors are EXACTLY the ALL rows passing the retention predicate
    val expected = all.filter(r => r(4).asInstanceOf[Boolean] ||
        r(3).asInstanceOf[Long] > cutoff).map(ident).toSet
    assert(ret.map(ident).toSet === expected,
      "retained relation must equal ALL filtered by the retention rule")
    assert(ret.size < all.size, "fixture must actually purge something")
    // a current row is NEVER aged out, however old its valid_from
    val curAll = all.filter(_(4).asInstanceOf[Boolean]).map(ident).toSet
    val curRet = ret.filter(_(4).asInstanceOf[Boolean]).map(ident).toSet
    assert(curAll === curRet, "retention purged a current row")
    // ordinals re-densify: 1..m per key over the retained table
    ret.groupBy(_(0)).foreach { case (uid, rs) =>
      val ns = rs.map(_(5).asInstanceOf[Long]).sorted
      assert(ns == (1L to ns.size.toLong),
        s"key $uid survivor ordinals not dense 1..${ns.size}: $ns")
    }
  }
}
