package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.{Insights, Text, Warehouse}
import graft.util.Tables.r4

/** Round-13 tier: the CDC all-changes ordered log (replayability), SQL
  * Server FROM..TO boundary semantics, and the r12 ADVICE hardening —
  * mixTemperature at a >9.2M-token language (the BIGINT-overflow regime
  * of the old 10¹²-scale intermediate) with a sub-1-bp tail language, and
  * Bradley–Terry with a zero-win event type.
  */
class Round13OpsSpec extends SparkSpec {

  test("cdcAllChanges: replaying the LSN-ordered log onto version 1 " +
       "reconstructs version 3 exactly (op codes 1/2/3/4 all present)") {
    val log = Warehouse.cdcAllChanges(spark, Sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val ops = rows(log.select(col("op")).distinct()).map(_.head).toSet
    assert(ops === Set(1L, 2L, 3L, 4L),
      s"log must exercise all four __$$operation codes, got $ops")
    // replay: per LSN step, drop deleted + replaced keys, add insert +
    // update-new images — the standard CDC consumer loop
    var state = Warehouse.cdcSnap(spark, Sf, 0)
      .select(col("o_orderkey"), r4(col("p").cast("double")).as("price"))
    Seq(1L, 2L).foreach { l =>
      val ch = log.filter(col("lsn") === l)
      val gone = ch.filter(col("op").isin(1L, 4L)).select(col("o_orderkey"))
      state = state.join(gone, Seq("o_orderkey"), "left_anti")
        .unionByName(ch.filter(col("op").isin(2L, 4L))
          .select(col("o_orderkey"), col("price")))
    }
    val want = rows(Warehouse.cdcSnap(spark, Sf, 2)
      .select(col("o_orderkey"), r4(col("p").cast("double")).as("price"))
      .orderBy(col("o_orderkey"))).map(_.toList)
    val got = rows(state.orderBy(col("o_orderkey"))).map(_.toList)
    assert(got === want,
      s"replayed state diverges from version 3 (${got.size} vs ${want.size} rows)")
    log.unpersist()
  }

  test("cdcNetChanges: mid-history insert-then-delete keys net to NOTHING " +
       "(present in the all-changes log twice, absent from net), and net " +
       "ops carry the right images") {
    val all = Warehouse.cdcAllChanges(spark, Sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val net = Warehouse.cdcNetChanges(spark, Sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // keys inserted at lsn 1 and deleted at lsn 2 — the 5-LOW widen-in slice
    val transient = all.filter(col("lsn") === 1L && col("op") === 2L)
      .select(col("o_orderkey"))
      .join(all.filter(col("lsn") === 2L && col("op") === 1L)
              .select(col("o_orderkey")), Seq("o_orderkey"), "left_semi")
    val nTransient = transient.count()
    assert(nTransient > 0, "fixture must plant insert-then-delete keys")
    assert(net.join(transient, Seq("o_orderkey"), "left_semi").count() === 0L,
      "insert-then-delete keys must net to nothing")
    val ops = rows(net.select(col("op")).distinct()).map(_.head).toSet
    assert(ops === Set(1L, 2L, 4L), s"net mask must be {1,2,4}, got $ops")
    // net ≡ first-vs-last: every net insert key is in v3 but not v1
    val v1 = Warehouse.cdcSnap(spark, Sf, 0).select(col("o_orderkey"))
    val ins = net.filter(col("op") === 2L).select(col("o_orderkey"))
    assert(ins.join(v1, Seq("o_orderkey"), "left_semi").count() === 0L,
      "a net insert key already existed in the first version")
    all.unpersist(); net.unpersist()
  }

  test("scd2ContainedIn: inclusive containment — a version is contained " +
       "in exactly its own [valid_from, valid_to]; shrinking either bound " +
       "by 1 us drops it; open versions are never contained") {
    val v = Warehouse.scd2Versions(spark, Sf)
      .filter(col("valid_to_us").isNotNull)
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
      .limit(1).collect()(0)
    val (user, vf, vt) = (v.getLong(0), v.getLong(2), v.getLong(3))
    def hit(lo: Long, hi: Long): Boolean =
      Warehouse.scd2ContainedIn(spark, Sf, lo, hi)
        .filter(col("user_id") === user && col("valid_from_us") === vf)
        .count() > 0
    assert(hit(vf, vt), "a version must be contained in its own bounds (inclusive)")
    assert(!hit(vf + 1, vt), "lo past valid_from must drop the version")
    assert(!hit(vf, vt - 1), "hi before valid_to must drop the version")
    // open versions never contained, whatever the interval
    val open = Warehouse.scd2ContainedIn(spark, Sf, 0L, Long.MaxValue)
      .filter(col("valid_to_us").isNull).count()
    assert(open === 0L, "an open version has no end to contain")
  }

  test("lengthBucketing: bucketed batching covers every doc exactly once " +
       "and beats naive doc_id-order batching on the fixture") {
    val out = Text.lengthBucketing(spark, Sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    assertNonDegenerate(out, Seq("bucket", "n_docs", "pad_tokens"))
    val agg = out.agg(sum(col("n_docs")), min(col("savings_bp")),
                      min(col("naive_pad_total") - col("bucketed_pad_total")))
      .collect()(0)
    val nDocs = graft.util.Tables.t(spark, Sf, "documents").count()
    assert(agg.getLong(0) === nDocs,
      s"buckets must partition the corpus: ${agg.getLong(0)} vs $nDocs docs")
    assert(agg.getLong(2) > 0L, "bucketing must beat naive batching here")
    out.unpersist()
  }

  test("scd2Between: SQL Server FROM..TO strict boundaries — a version " +
       "starting exactly AT the upper bound is excluded; one closing " +
       "exactly AT the lower bound is excluded") {
    // pick a real closed version from the fixture
    val v = Warehouse.scd2Versions(spark, Sf)
      .filter(col("valid_to_us").isNotNull)
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
      .limit(1).collect()(0)
    val (user, vf, vt) = (v.getLong(0), v.getLong(2), v.getLong(3))
    def hit(lo: Long, hi: Long): Boolean =
      Warehouse.scd2Between(spark, Sf, lo, hi)
        .filter(col("user_id") === user && col("valid_from_us") === vf)
        .count() > 0
    assert(!hit(vf - 10, vf), "version starting exactly at hi must be excluded")
    assert(hit(vf - 10, vf + 1), "version starting before hi must be included")
    assert(!hit(vt, vt + 10), "version closing exactly at lo must be excluded")
    assert(hit(vt - 1, vt + 10), "version open past lo must be included")
  }

  test("mixTemperature: survives a >9.2M-token language (old 10^12-scale " +
       "intermediate would overflow BIGINT under ANSI) and a sub-1-bp " +
       "tail language (share_bp = 0) — tail boosted, head damped") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft-r13-mixtemp"
    val docsPath = s"$dir/documents.parquet"
    val fs = new org.apache.hadoop.fs.Path(docsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(docsPath))) {
      // 'en': 100 docs x 100k tokens = 10M tokens (> 2^63 / 10^12 = 9.2M);
      // 'xx': 1 doc x 10 tokens — far below 1 bp of the 10M total
      val big = ("w " * 99999) + "w"
      val en = spark.range(100).select(col("id").as("doc_id"),
        lit("en").as("lang"), lit(big).as("text"))
      val xx = spark.range(1).select((col("id") + 1000L).as("doc_id"),
        lit("xx").as("lang"), lit("t t t t t t t t t t").as("text"))
      en.unionByName(xx).coalesce(1).write.mode("overwrite").parquet(docsPath)
    }
    val out = rows(Text.mixTemperature(spark, dir))
      .map(r => r.head.asInstanceOf[String] ->
        (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
         r(4).asInstanceOf[Long], r(5).asInstanceOf[Long])).toMap
    val (enTok, enShare, enW, enBoost) = out("en")
    val (xxTok, xxShare, xxW, xxBoost) = out("xx")
    assert(enTok === 10000000L && xxTok === 10L, s"token counts off: $out")
    assert(xxShare === 0L, "tail language must sit below 1 bp on this fixture")
    assert(enShare > 9990L, "head language must hold ~the whole corpus")
    // temperature 0.5: tail up-weighted (vs its ~0 share), head damped
    assert(xxW >= 1L && xxBoost > 10000L,
      s"tail must be up-sampled: weight=$xxW boost=$xxBoost")
    assert(enBoost <= 10000L, s"head must not be up-sampled: boost=$enBoost")
    assert(enW + xxW <= 10000L && enW + xxW > 9900L,
      s"weights must ~partition 10000 bp: $enW + $xxW")
  }

  test("bradleyTerry: an event type with ZERO directed wins stays in the " +
       "output at the 1-micro theta floor and ranks last — not dropped " +
       "after round 1") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft-r13-btzero"
    val evPath = s"$dir/events.parquet"
    val fs = new org.apache.hadoop.fs.Path(evPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(evPath))) {
      // every user spends a > b > z: 'z' loses every comparison it enters
      val rws = for (u <- 0L until 4L; (t, v) <- Seq(("a", 3.0), ("b", 2.0), ("z", 1.0)))
        yield Row(u * 10 + t.hashCode % 7, u, t,
                  1700000000000000000L + u * 1000000000L, v)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("ts", LongType),
        StructField("value", DoubleType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rws.toSeq, 1), schema)
        .coalesce(1).write.mode("overwrite").parquet(evPath)
    }
    val out = rows(Insights.bradleyTerry(spark, dir))
      .map(r => r.head.asInstanceOf[String] ->
        (r(1).asInstanceOf[Long], r(3).asInstanceOf[Long],
         r(4).asInstanceOf[Long])).toMap
    assert(out.keySet === Set("a", "b", "z"),
      s"zero-win type must survive all MM rounds, got ${out.keySet}")
    val (zw, zTheta, zRank) = out("z")
    assert(zw === 0L, "fixture broken: z must have zero wins")
    assert(zTheta === 1L, s"zero-win theta must sit at the 1-micro floor, got $zTheta")
    assert(zRank === 3L, "zero-win type must rank last")
    assert(out("a")._2 > out("b")._2, "a must out-rate b on this fixture")
  }
}
