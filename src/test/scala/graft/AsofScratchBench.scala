package graft

// Scratch measurement (not a spec): native AsofJoinExec vs the
// compositional window form at 10M/1M rows. Run:
//   sbt "Test/runMain graft.AsofScratchBench"
object AsofScratchBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window

    val nLeft = 10000000L
    val nRight = 1000000L
    val nUsers = 200000L
    val left = spark.range(nLeft).select(
      (col("id") % nUsers).as("user_id"),
      (col("id") * 131L % 1000000000L).as("purchase_ts_us"),
      col("id").as("purchase_id"))
    val right = spark.range(nRight).select(
      (col("id") % nUsers).as("s_user_id"),
      (col("id") * 733L % 1000000000L).as("signup_ts_us"),
      col("id").as("signup_id"))

    def nativeForm(): org.apache.spark.sql.DataFrame = {
      val lPlan = left.queryExecution.analyzed
      val rPlan = right.queryExecution.analyzed
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        graft.plans.AsofJoinPlan(lPlan, rPlan,
          Seq(attr(lPlan, "user_id")), Seq(attr(rPlan, "s_user_id")),
          attr(lPlan, "purchase_ts_us"), attr(rPlan, "signup_ts_us")))
    }

    def windowForm(): org.apache.spark.sql.DataFrame = {
      val l = left.select(col("user_id"), col("purchase_ts_us").as("ts"),
        col("purchase_id").as("eid"), lit(1).as("tag"))
      val r = right.select(col("s_user_id").as("user_id"),
        col("signup_ts_us").as("ts"), col("signup_id").as("eid"), lit(0).as("tag"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("tag").asc, col("eid").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      r.unionByName(l)
        .withColumn("last_signup",
          last(when(col("tag") === 0, struct(col("ts"), col("eid"))),
               ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
    }

    def time(name: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-10s iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (sum=$n)")
      }
    }
    // aggregate the MATCHED columns so column pruning cannot delete the
    // as-of work itself (count() alone lets Catalyst prune the window away)
    time("native")(nativeForm()
      .agg(sum(col("signup_id")), sum(col("signup_ts_us"))).collect()(0).toSeq)
    time("window")(windowForm()
      .agg(sum(col("last_signup.eid")), sum(col("last_signup.ts"))).collect()(0).toSeq)
    spark.stop()
  }
}
