package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.pipeline.WeatherEtl
import graft.operators.Warehouse

/** Property-based invariants (SURVEY §5.2.3) over generated weather-shaped
  * data: dedup/merge idempotence, imputation no-touch, z-cap bounds.
  * Raw scalacheck generators sampled with fixed seeds (the scalatest-plus
  * bridge isn't in the offline artifact cache) — 5 datasets per property.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic forAll replacement: sample gen at 5 fixed seeds. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 5).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(42L + i)).get)
    }
  private def forAll2[A](g1: Gen[A], g2: Gen[A])(body: (A, A) => Unit): Unit =
    (1 to 5).foreach { i =>
      body(g1.apply(Gen.Parameters.default, Seed(142L + i)).get,
           g2.apply(Gen.Parameters.default, Seed(4242L + i)).get)
    }
  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  private val cities = Gen.oneOf("London", "Dubai", "Oslo", "Lahore", "Sydney")
  private val dates = Gen.choose(1, 20).map(d => f"2024-01-$d%02d")
  private val temp = Gen.option(Gen.choose(-300, 450).map(t => (t / 10.0)))

  private val rowGen = for {
    c <- cities; d <- dates; tx <- temp; tn <- temp
    pr <- Gen.choose(0, 100).map(_ / 10.0)
  } yield (c, d, tx, tn, pr)

  private def toStg(rows: List[(String, String, Option[Double], Option[Double], Double)]) = {
    import spark.implicits._
    rows.toDF("city_name", "d", "tx", "tn", "pr")
      .select(col("city_name"), col("d").cast("date").as("date"),
        col("tx").cast("decimal(5,2)").as("temp_max"),
        col("tn").cast("decimal(5,2)").as("temp_min"),
        col("pr").cast("decimal(5,2)").as("precipitation"),
        lit(false).as("is_processed"))
  }

  test("dedup: output keys unique; idempotent; subset of input") {
    forAll(Gen.listOfN(25, rowGen)) { rows =>
      whenever(rows.nonEmpty) {
        val stg = toStg(rows)
        val d1 = WeatherEtl.dedupStaging(stg)
        assert(d1.groupBy("city_name", "date").count().filter(col("count") > 1).isEmpty)
        val d2 = WeatherEtl.dedupStaging(d1)
        assert(d1.exceptAll(d2).isEmpty && d2.exceptAll(d1).isEmpty)
        assert(d1.exceptAll(stg).isEmpty) // every surviving row existed
      }
    }
  }

  test("imputation never touches rows with both measures present") {
    forAll(Gen.listOfN(20, rowGen)) { rows =>
      whenever(rows.nonEmpty) {
        val stg = WeatherEtl.dedupStaging(toStg(rows))
        val complete = stg.filter(col("temp_max").isNotNull && col("temp_min").isNotNull)
        val imputedComplete = WeatherEtl.imputeMissing(stg)
          .join(complete.select(col("city_name"), col("date"),
            col("temp_max").as("orig_max"), col("temp_min").as("orig_min")),
            Seq("city_name", "date"))
        assert(imputedComplete.filter(
          col("temp_max") =!= col("orig_max") || col("temp_min") =!= col("orig_min")).isEmpty)
      }
    }
  }

  test("z-cap output is always original value or group mean") {
    forAll(Gen.listOfN(20, rowGen)) { rows =>
      whenever(rows.nonEmpty) {
        val stg = WeatherEtl.dedupStaging(toStg(rows))
        val stats = stg.groupBy("city_name").agg(avg("temp_max").as("mu"))
        val capped = WeatherEtl.capOutliers(stg)
          .join(stg.select(col("city_name"), col("date"), col("temp_max").as("orig")),
            Seq("city_name", "date"))
          .join(stats, Seq("city_name"))
        val bad = capped.filter(col("temp_max").isNotNull &&
          col("temp_max") =!= col("orig") &&
          abs(col("temp_max") - col("mu")) > 0.01)
        assert(bad.isEmpty)
      }
    }
  }

  test("merge upsert: keys unique; re-merge of same source is a no-op") {
    import spark.implicits._
    val kv = for { k <- Gen.choose(1, 15); v <- Gen.choose(1, 999) } yield (k.toLong, v.toLong)
    forAll2(Gen.listOfN(12, kv), Gen.listOfN(12, kv)) { (t, s) =>
      val target = t.toDF("k", "v").dropDuplicates("k")
      val source = s.toDF("k", "v").dropDuplicates("k")
      val m1 = Warehouse.mergeUpsert(target, source, Seq("k"), Seq("v"))
      assert(m1.groupBy("k").count().filter(col("count") > 1).isEmpty)
      val m2 = Warehouse.mergeUpsert(m1, source, Seq("k"), Seq("v"))
      assert(m1.exceptAll(m2).isEmpty && m2.exceptAll(m1).isEmpty)
    }
  }

  // ── round-2 algorithmic invariants ──────────────────────────────────────

  /** In-test union-find with union-by-min: find gives the component min. */
  private def unionFind(edges: Seq[(Long, Long)]): Long => Long = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    find
  }

  test("connected components agree with union-find ground truth on random graphs") {
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.choose(5, 60)
      m <- Gen.choose(1, 80)
      es <- Gen.listOfN(m, for { a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) } yield (a.toLong, b.toLong))
    } yield es.filter(e => e._1 != e._2).map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    forAll(edgeGen) { edges =>
      whenever(edges.nonEmpty) {
        val cc = graft.operators.Dedup
          .connectedComponents(edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val truth = unionFind(edges)
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        assert(cc.keySet === nodes.toSet)
        nodes.foreach(n => assert(cc(n) === truth(n), s"node $n"))
      }
    }
  }

  test("TopK.perGroup equals the naive single-window top-k on random data") {
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.choose(1, 250)
      rs <- Gen.listOfN(n, for { g <- Gen.choose(0, 4); s <- Gen.choose(0, 40) } yield (g, s))
    } yield rs.zipWithIndex.map { case ((g, s), i) => (g.toLong, s.toLong, i.toLong) }
    forAll(rowsGen) { rows =>
      val df = rows.toDF("g", "s", "id").repartition(7) // force many partitions
      val twoPhase = graft.util.TopK
        .perGroup(df, Seq(col("g")), Seq(col("s").desc, col("id").asc), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                             r.getInt(r.fieldIndex("rn")))).toSet
      val naive = rows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
          .map { case ((g, s, id), i) => (g, s, id, i + 1) }
      }.toSet
      assert(twoPhase === naive)
    }
  }

  test("PrefixSum.exclusive equals the single-window global scan on random data") {
    import spark.implicits._
    val valGen = Gen.listOfN(400, Gen.choose(0L, 500L))
    forAll(valGen) { vals =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("k", "v")
      for (parts <- Seq(1, 3, 32)) {
        val dist = graft.util.PrefixSum.exclusive(df, "k", col("v"), "ps", parts)
        val naive = df.withColumn("ps",
          coalesce(sum(col("v")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("k"))
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
            lit(0L)))
        assert(dist.exceptAll(naive).isEmpty && naive.exceptAll(dist).isEmpty,
          s"prefix sum mismatch at $parts partitions")
      }
    }
  }

  test("ntileGlobal equals the window NTILE on random sizes, ks and partitionings") {
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.choose(1, 300)
      k <- Gen.choose(1, 12)
      vs <- Gen.listOfN(n, Gen.choose(0, 20)) // heavy ties — the tie-break must decide
    } yield (k, vs.zipWithIndex.map { case (v, i) => (v.toLong, i.toLong) })
    forAll(rowsGen) { case (k, rows) =>
      val df = rows.toDF("v", "id").repartition(5)
      val ours = operators.Insights
        .ntileGlobal(df, Seq(col("v").asc, col("id").asc), k, "b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("v").asc, col("id").asc)
      val naive = df.select(col("v"), col("id"), ntile(k).over(w).as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(ours === naive, s"k=$k n=${rows.length}")
    }
  }

  test("PrefixSum.exclusiveCols orders by the lexicographic composite on random data") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(300, for {
      a <- Gen.choose(0, 5); v <- Gen.choose(0L, 100L)
    } yield (a.toLong, v))
    forAll(rowsGen) { rs =>
      val rows = rs.zipWithIndex.map { case ((a, v), i) => (a, i.toLong, v) }
      val df = rows.toDF("a", "id", "v").repartition(7)
      val dist = graft.util.PrefixSum
        .exclusiveCols(df, Seq(col("a").asc, col("id").asc), col("v"), "ps")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      val sorted = rows.sortBy(r => (r._1, r._2))
      val naive = sorted.zip(sorted.scanLeft(0L)(_ + _._3))
        .map { case ((a, id, _), ps) => (a, id, ps) }.toSet
      assert(dist === naive)
    }
  }

  test("PrefixSum stays self-consistent at partial-sample scale (60k rows)") {
    // Regression: the pre-round-6 two-phase scan derived bucket ids from
    // spark_partition_id() over a sampled repartitionByRange; the offsets
    // branch and the main branch re-execute that subtree with different
    // sampling seeds, so at inputs large enough for PARTIAL range samples
    // (invisible below ~2k rows) the branches disagreed on boundaries and
    // every bucket-boundary row went wrong. Deterministic min/max
    // bucketing cannot disagree with itself; this pins that at a size
    // where the old code failed on every run.
    val df = spark.range(60000).select(col("id").as("k"),
      (pmod(col("id") * 2654435761L, lit(1000L)) + 1L).as("v"))
    val got = graft.util.PrefixSum.exclusive(df, "k", col("v"), "ps")
      .orderBy("k").collect()
    assert(got.length === 60000)
    var run = 0L
    got.foreach { r =>
      assert(r.getAs[Long]("ps") === run, s"k=${r.getAs[Long]("k")}")
      run += r.getAs[Long]("v")
    }
  }

  test("PrefixSum.exclusiveColsTotal with a DESCENDING leading key matches the naive scan") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(300, Gen.choose(0L, 50L)) // heavy ties in the lead key
    forAll(rowsGen) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      val df = rows.toDF("rev", "pk").repartition(7)
      val dist = graft.util.PrefixSum
        .exclusiveColsTotal(df, Seq(col("rev").desc, col("pk").asc), col("rev"), "ps", "tot")
        .collect().map(r => (r.getAs[Long]("rev"), r.getAs[Long]("pk"),
                             r.getAs[Long]("ps"), r.getAs[Long]("tot"))).toSet
      val sorted = rows.sortBy(r => (-r._1, r._2))
      val total = vs.sum
      val naive = sorted.zip(sorted.scanLeft(0L)(_ + _._1))
        .map { case ((rev, pk), ps) => (rev, pk, ps, total) }.toSet
      assert(dist === naive)
    }
  }

  test("bucketCandidates keeps every bucket's membership connected, hot or not") {
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.choose(5, 120) // with cap=8, buckets regularly exceed the cap
      rs <- Gen.listOfN(n, Gen.choose(0, 2))
    } yield rs.zipWithIndex.map { case (b, i) => (b.toLong, i.toLong) }
    forAll(rowsGen) { rows =>
      val cand = graft.operators.Dedup
        .bucketCandidates(rows.toDF("bkt", "doc_id"), Seq("bkt"), "doc_id", Seq(), cap = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      cand.foreach { case (a, b) => assert(a < b) }
      val reach = unionFind(cand.toSeq)
      // every pair of docs sharing a bucket must end up in one component
      rows.groupBy(_._1).values.filter(_.size > 1).foreach { members =>
        val roots = members.map(m => reach(m._2)).distinct
        assert(roots.size === 1, s"bucket not connected: $members")
      }
    }
  }
}
