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
}
