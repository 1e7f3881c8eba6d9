package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. local[2] + 2 shuffle partitions
  * keeps plans identical in shape to production (shuffles still happen)
  * while tests stay fast.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.util.Sessions.tune(
    SparkSession.builder()
      .master("local[2]")
      .appName(getClass.getSimpleName)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  override def afterAll(): Unit = { /* shared session: left for next suite */ }

  val Sf = "/root/testdata/sf0.001"

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** The §2.33 non-degeneracy lesson codified (r9 verdict item 8): the
    * hash gate pins a degenerate output — constant column, saturated
    * threshold, all-null measure — exactly as happily as a meaningful one
    * (three r9 first drafts slipped through that way and were caught only
    * by manual reads). Every new-tier spec calls this on its query output:
    * each named column must carry at least `minDistinct` distinct non-null
    * values over at least `minRows` rows, i.e. the statistic actually
    * MOVES on the fixture corpus.
    */
  def assertNonDegenerate(df: DataFrame, cols: Seq[String],
                          minDistinct: Int = 2, minRows: Long = 2): Unit = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit}
    val aggs = count(lit(1)).as("_n") +:
      cols.map(c => countDistinct(col(c)).as(s"_d_$c"))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    assert(r.getLong(0) >= minRows,
      s"degenerate output: ${r.getLong(0)} rows < $minRows")
    cols.zipWithIndex.foreach { case (c, i) =>
      assert(r.getLong(i + 1) >= minDistinct,
        s"degenerate column '$c': ${r.getLong(i + 1)} distinct values " +
        s"< $minDistinct (constant/saturated/all-null output)")
    }
  }
}
