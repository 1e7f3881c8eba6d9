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
}
