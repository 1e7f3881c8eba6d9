package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Declarative data-quality rule engine — the Great-Expectations-style
  * surface the reference's design doc aspires to (ref
  * /root/reference/README.md:392–393) on top of the check primitives the
  * engine already ships ([[Quality.dqProfile]], [[Relational.refIntegrity]],
  * [[graft.sources.CsvQuarantine]]).
  *
  * A rule set is plain data ([[DqRule]] ADT); evaluation compiles it into
  * the minimal plan shape per rule class:
  *  - ROW-LEVEL rules (not-null, range, set, regex, custom predicate)
  *    fold into ONE conditional-count aggregate — a single pass over the
  *    table regardless of rule count, the way a 100 TB scan must be
  *    audited (one job, map-side partials, no per-rule scans).
  *  - TABLE-LEVEL rules get the cheapest correct shape each: uniqueness is
  *    count−countDistinct over the key, referential integrity is a
  *    left-anti count against the parent's keys (AQE picks the join
  *    strategy — no forced broadcast, parents scale with the data).
  * The report is their union — one composed plan, ONE action, like
  * refIntegrity's.
  *
  * [[DqRules.enforce]] is the row-level twin: tag each row with its
  * violated rule names and split clean/quarantine in one pass — the same
  * split contract as [[graft.sources.CsvQuarantine]], for rules instead
  * of parse failures.
  */
sealed trait DqRule {
  def name: String
  /** Row-level predicate: TRUE ⇔ the row VIOLATES the rule (null-safe);
    * None for table-level rules.
    */
  def violation: Option[Column]
}

/** `column IS NULL` is a violation. */
final case class NotNull(column: String) extends DqRule {
  val name = s"not_null($column)"
  val violation = Some(col(column).isNull)
}

/** Value outside [lo, hi] (inclusive) is a violation; NULLs pass (compose
  * with [[NotNull]] when both are required — orthogonal rules report
  * independently, the GE convention).
  */
final case class InRange(column: String, lo: Double, hi: Double) extends DqRule {
  val name = s"in_range($column)"
  val violation = Some(col(column).isNotNull &&
    (col(column) < lit(lo) || col(column) > lit(hi)))
}

/** Value not in the allowed set is a violation; NULLs pass. */
final case class InSet(column: String, values: Seq[String]) extends DqRule {
  val name = s"in_set($column)"
  val violation = Some(col(column).isNotNull && !col(column).isin(values: _*))
}

/** Value not matching the anchored regex is a violation; NULLs pass. */
final case class MatchesRegex(column: String, pattern: String) extends DqRule {
  val name = s"matches_regex($column)"
  val violation = Some(col(column).isNotNull && !col(column).rlike(pattern))
}

/** Arbitrary row predicate (TRUE ⇔ violation) under a caller-chosen name. */
final case class Check(name: String, predicate: Column) extends DqRule {
  val violation = Some(predicate)
}

/** Key not unique (table-level): violations = extra rows beyond one per key. */
final case class Unique(column: String) extends DqRule {
  val name = s"unique($column)"
  val violation = None
}

/** FK has no matching parent key (table-level anti-join count). */
final case class RefIntegrity(column: String, parent: DataFrame,
                              parentKey: String) extends DqRule {
  val name = s"ref_integrity($column)"
  val violation = None
}

/** k-anonymity audit (table-level): every row whose quasi-identifier
  * equivalence class holds fewer than k rows is re-identifiable and
  * counts as a violation — the release-gate check a dataset publisher
  * runs before sharing. One hash-agg on the quasi columns (map-side
  * combined) + a bounded class-size filter; NULL quasi values form their
  * own class, matching SQL GROUP BY.
  */
final case class KAnonymity(quasi: Seq[String], k: Int) extends DqRule {
  val name = s"k_anonymity(${quasi.mkString(",")},$k)"
  val violation = None
}

object DqRules {

  /** Validation report: one row per rule — (rule, n_violations, n_rows,
    * pass). One action, one composed plan; see class doc for the per-rule
    * plan shapes.
    */
  def validate(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    val total = count(lit(1)).as("n_rows")
    val rowLevel = rules.filter(_.violation.isDefined)
    val rowFrame: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else Some {
        val aggs = rowLevel.map(r =>
          sum(when(r.violation.get, 1L).otherwise(0L)).as(r.name))
        val one = df.agg(aggs.head, (aggs.tail :+ total): _*)
        // unpivot the single aggregate row to (rule, n_violations, n_rows)
        one.select(explode(array(rowLevel.map(r =>
            struct(lit(r.name).as("rule"),
                   col(r.name).as("n_violations"),
                   col("n_rows"))): _*)).as("e"))
          .select(col("e.rule"), col("e.n_violations"), col("e.n_rows"))
      }
    val tableFrames: Seq[DataFrame] = rules.collect {
      case u: Unique =>
        df.agg((count(col(u.column)) - countDistinct(col(u.column))).as("n_violations"),
               count(lit(1)).as("n_rows"))
          .select(lit(u.name).as("rule"), col("n_violations"), col("n_rows"))
      case fk: RefIntegrity =>
        val orphans = df.select(col(fk.column)).filter(col(fk.column).isNotNull)
          .join(fk.parent.select(col(fk.parentKey)),
                col(fk.column) === col(fk.parentKey), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        orphans.crossJoin(df.agg(count(lit(1)).as("n_rows")))
          .select(lit(fk.name).as("rule"), col("n_violations"), col("n_rows"))
      case ka: KAnonymity =>
        val small = df.groupBy(ka.quasi.map(col): _*)
          .agg(count(lit(1)).as("n"))
          .filter(col("n") < lit(ka.k.toLong))
          .agg(coalesce(sum(col("n")), lit(0L)).as("n_violations"))
        small.crossJoin(df.agg(count(lit(1)).as("n_rows")))
          .select(lit(ka.name).as("rule"), col("n_violations"), col("n_rows"))
    }
    val all = (rowFrame.toSeq ++ tableFrames).reduce(_.unionAll(_))
    ordered(
      all.select(col("rule"), col("n_violations"), col("n_rows"),
                 (col("n_violations") === 0L).as("pass")),
      "rule")
  }

  /** Row-level enforcement: tag every row with the names of the row-level
    * rules it violates, split clean/quarantine in ONE pass (table-level
    * rules have no single offending row and are ignored here — they live
    * in [[validate]]'s report).
    */
  def enforce(df: DataFrame,
              rules: Seq[DqRule]): graft.sources.CsvQuarantine.IngestResult = {
    val rowLevel = rules.filter(_.violation.isDefined)
    val tags = array(rowLevel.map(r =>
      when(r.violation.get, lit(r.name)).otherwise(lit(null))): _*)
    val tagged = df.withColumn("_dq_violations", filter(tags, _.isNotNull))
    graft.sources.CsvQuarantine.IngestResult(
      clean = tagged.filter(size(col("_dq_violations")) === 0)
        .drop("_dq_violations"),
      quarantine = tagged.filter(size(col("_dq_violations")) > 0))
  }

  /** The registered rule set over `orders` — every rule class exercised;
    * the oracle states each count in ANSI SQL, so the whole engine
    * (fold-to-one-aggregate, unique, anti-join FK) is hash-gated.
    */
  def ordersRuleReport(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    validate(orders, Seq(
      NotNull("o_custkey"),
      NotNull("o_orderdate"),
      InRange("o_totalprice", 0.0, 1000000.0),
      InSet("o_orderstatus", Seq("F", "O", "P")),
      MatchesRegex("o_orderpriority", "^[1-5]-[A-Z ]+$"),
      Check("date_in_epoch", col("o_orderdate").cast("date") < lit("1990-01-01").cast("date")),
      Unique("o_orderkey"),
      RefIntegrity("o_custkey", t(spark, sfDir, "customer"), "c_custkey"),
      KAnonymity(Seq("o_orderstatus", "o_orderpriority"), 2)))
  }
}
