package graft

import org.apache.spark.sql.functions._
import graft.operators.{Insights, Text}

/** Round-9 additions: span-granular ExactSubstr dedup (sequential driver
  * fold differential + invariants against the whole-doc dedup family) and
  * the positional-shingle kernel's contract vs the distinct-shingle one.
  */
class Round9OpsSpec extends SparkSpec {

  private def docsRaw(): Map[Long, String] =
    graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap

  test("pos_shingles: positional n-grams; distinct-set equals shingles()") {
    graft.functions.GraftFunctions.register(spark)
    val d = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"),
              call_function("pos_shingles", col("text"), lit(3)).as("ps"),
              call_function("shingles", col("text"), lit(3)).as("ds"),
              col("text"))
      .collect()
    d.foreach { r =>
      val words = r.getAs[String]("text").split(" ", -1)
      val ps = r.getSeq[String](1)
      val ds = r.getSeq[String](2)
      // element i IS the 3-gram at word i — full positional contract
      val expect =
        if (words.length < 3) Seq.empty[String]
        else (0 to words.length - 3).map(i => words.slice(i, i + 3).mkString(" "))
      assert(ps === expect, s"doc ${r.getLong(0)}")
      // and the distinct set matches the DistinctShingles kernel exactly
      assert(ps.distinct === ds, s"doc ${r.getLong(0)} distinct order")
    }
  }

  test("dedupExactSubstr: matches a sequential span-removal fold exactly") {
    val got = Text.dedupExactSubstr(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_removed"),
          r.getAs[String]("kept_text")))).toMap

    val docs = docsRaw()
    // sequential: span -> distinct docs; covered positions per doc
    val spanDocs = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    val docWords = docs.map { case (id, t) => id -> t.split(" ", -1) }
    docWords.foreach { case (id, w) =>
      (0 to w.length - 3).foreach { i =>
        spanDocs.getOrElseUpdate(w.slice(i, i + 3).mkString(" "),
          scala.collection.mutable.Set.empty) += id
      }
    }
    val dup = spanDocs.filter(_._2.size >= 2).keySet
    docWords.foreach { case (id, w) =>
      val covered = scala.collection.mutable.Set.empty[Int]
      (0 to w.length - 3).foreach { i =>
        if (dup(w.slice(i, i + 3).mkString(" "))) covered ++= Seq(i, i + 1, i + 2)
      }
      val kept = w.indices.filterNot(covered).map(w)
      val (nw, nr, kt) = got(id)
      assert(nw === w.length.toLong, s"n_words of $id")
      assert(nr === covered.size.toLong, s"n_removed of $id")
      assert(kt === kept.mkString(" "), s"kept_text of $id")
    }
    assert(got.keySet === docs.keySet) // every doc present, removed-to-empty included
  }

  test("hits: matches a sequential weighted HITS fold with the same " +
       "fixed-point normalization exactly") {
    val got = Insights.hits(spark, Sf).collect()
      .map(r => r.getAs[Long]("part_id") ->
        ((r.getAs[Long]("auth_fp"), r.getAs[Long]("hub_fp")))).toMap

    // sequential: directed consecutive-line-item edges
    val lines = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
              col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    lines.groupBy(_._1).foreach { case (_, ls) =>
      val ps = ls.sortBy(l => (l._2, l._3, l._4)).map(_._3)
      ps.sliding(2).foreach {
        case Array(x, y) if x != y => w((x, y)) = w.getOrElse((x, y), 0L) + 1
        case _ =>
      }
    }
    val nodes = w.keys.flatMap(k => Seq(k._1, k._2)).toSet
    val T = 1000000000000L
    var h = nodes.map(_ -> T / nodes.size).toMap
    var a = Map.empty[Long, Long]
    (1 to Insights.HitsRounds).foreach { _ =>
      val araw = w.toSeq.groupBy(_._1._2).map { case (dst, es) =>
        dst -> es.map { case ((src, _), wt) => h(src) * wt }.sum }
      val sa = araw.values.sum
      a = nodes.map(n => n -> araw.getOrElse(n, 0L) / math.max(1L, sa / T)).toMap
      val hraw = w.toSeq.groupBy(_._1._1).map { case (src, es) =>
        src -> es.map { case ((_, dst), wt) => a(dst) * wt }.sum }
      val sh = hraw.values.sum
      h = nodes.map(n => n -> hraw.getOrElse(n, 0L) / math.max(1L, sh / T)).toMap
    }
    assert(got.keySet === nodes)
    nodes.foreach { n =>
      assert(got(n) === ((a(n), h(n))), s"node $n")
    }
  }

  test("linkPredJaccard: every pair is non-adjacent with a valid Jaccard, " +
       "matching the sequential score") {
    val rows = Insights.linkPredJaccard(spark, Sf).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
                 r.getAs[Long]("n_common"), r.getAs[Double]("jaccard")))
    assert(rows.nonEmpty)
    // sequential graph
    val items = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Int]
    items.groupBy(_._1).foreach { case (_, ps) =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        pairCount((parts(i), parts(j))) =
          pairCount.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val edges = pairCount.filter(_._2 >= 2).keySet
    val nbr = scala.collection.mutable.Map.empty[Long, Set[Long]]
    edges.foreach { case (x, y) =>
      nbr(x) = nbr.getOrElse(x, Set.empty) + y
      nbr(y) = nbr.getOrElse(y, Set.empty) + x
    }
    rows.foreach { case (x, y, nc, j) =>
      assert(!edges((x, y)), s"($x,$y) must be non-adjacent")
      val inter = (nbr(x) & nbr(y)).size.toLong
      assert(nc === inter, s"common neighbors of ($x,$y)")
      val expect = math.floor(inter.toDouble /
        (nbr(x).size + nbr(y).size - inter).toDouble * 10000.0 + 0.5) / 10000.0
      assert(j === expect, s"jaccard of ($x,$y)")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("scd6: type-1/2/3 columns are mutually consistent per key") {
    val rows = graft.operators.Warehouse.scd6Hybrid(spark, Sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("version_n"))
      // exactly one current version, and it is the last one
      assert(sorted.count(_.getAs[Boolean]("is_current")) === 1, s"user $u")
      assert(sorted.last.getAs[Boolean]("is_current"), s"user $u last")
      // type 1: every row carries the LAST version's value
      val cur = sorted.last.getAs[Long]("cents")
      assert(sorted.forall(_.getAs[Long]("current_cents") == cur), s"user $u t1")
      // type 3: prior = previous row's cents; first version has no prior
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("prior_cents")))
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getAs[Long]("prior_cents") === p.getAs[Long]("cents"))
          // type 2: intervals chain with no gaps
          assert(p.getAs[Long]("valid_to_us") === n.getAs[Long]("valid_from_us"))
        case _ =>
      }
    }
  }

  test("auditDim: checksum and counts match a driver fold per batch") {
    val got = graft.operators.Warehouse.auditDim(spark, Sf).collect()
      .map(r => r.getAs[java.sql.Date]("batch_month").toString ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("content_checksum")))).toMap
    val orders = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
              date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .collect()
    val expect = orders.groupBy(_.getAs[java.sql.Date]("m").toString)
      .map { case (m, rs) =>
        m -> ((rs.length.toLong,
               rs.map(r => (r.getLong(0) * 1000003L + r.getLong(1)) % 2147483647L).sum))
      }
    assert(got === expect)
  }

  test("mcnemar: cells partition the pairs; chi2 matches the driver formula") {
    val r = Insights.mcnemar(spark, Sf).collect().head
    val (np, nb, ao, bo, nn) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_both"),
      r.getAs[Long]("a_only"), r.getAs[Long]("b_only"), r.getAs[Long]("n_neither"))
    assert(np === nb + ao + bo + nn)
    val chi2 = math.floor(((math.abs(ao - bo) - 1) * (math.abs(ao - bo) - 1)).toDouble /
      (ao + bo).toDouble * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Double]("chi2_cc") === chi2)
  }

  test("pacf: Durbin-Levinson recursion from the exact ACF, driver-checked") {
    val r = Insights.pacf(spark, Sf).collect().head
    // recompute from daily cents on the driver
    val daily = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg((sum(graft.util.Tables.money(col("o_totalprice"))) * 100).cast("long").as("c"))
      .orderBy("d").collect().map(_.getAs[Long]("c"))
    val n = daily.length.toLong
    val s = daily.sum
    val cx = daily.map(v => BigInt(n * v - s))
    def acov(k: Int) = (0 until daily.length - k)
      .map(i => cx(i) * cx(i + k)).sum
    val den = acov(0)
    val Seq(r1, r2, r3) = (1 to 3).map(k =>
      acov(k).toDouble / den.toDouble) // same DECIMAL->double magnitudes
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 - p22 * r1
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Double]("acf1") === rr(r1))
    assert(r.getAs[Double]("pacf2") === rr(p22))
    assert(r.getAs[Double]("pacf3") === rr(p33))
    // PACF(1) IS ACF(1) by construction
    assert(r.getAs[Double]("pacf1") === r.getAs[Double]("acf1"))
  }

  test("readability: flesch formula recheck per doc; degenerate corpus " +
       "pins sentences at 1") {
    val rows = Text.readability(spark, Sf).collect()
    val texts = docsRaw()
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val nw = t.split(" ", -1).length.toLong
      val ns = math.max(1L, "[.!?]+".r.findAllIn(t).length.toLong)
      val syl = "[aeiouy]+".r.findAllIn(t.toLowerCase).length.toLong
      assert(r.getAs[Long]("n_words") === nw)
      assert(r.getAs[Long]("n_sentences") === ns)
      assert(r.getAs[Long]("n_syllables") === syl)
      val f = math.floor((206.835 - 1.015 * (nw.toDouble / ns.toDouble) -
        84.6 * (syl.toDouble / nw.toDouble)) * 10000.0 + 0.5) / 10000.0
      assert(r.getAs[Double]("flesch") === f)
    }
  }

  test("bpeTrain: matches a sequential BPE training loop exactly") {
    val got = Text.bpeTrain(spark, Sf).collect()
      .map(r => (r.getAs[Long]("merge_round"), r.getAs[String]("a"),
                 r.getAs[String]("b"), r.getAs[String]("merged"),
                 r.getAs[Long]("n")))

    // sequential trainer: vocab of lowercase-alpha words, greedy
    // left-to-right merge application per adopted rule
    var vocab: Map[Vector[String], Long] = docsRaw().values
      .flatMap(_.toLowerCase.split(" ", -1))
      .filter(_.matches("^[a-z]{2,}$"))
      .groupBy(identity).map { case (w, ws) =>
        w.toVector.map(_.toString) -> ws.size.toLong }
    val expect = (1 to Text.BpeRounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, wc) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + wc
          case _ =>
        }
      }
      val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.map { case (syms, wc) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == a && s == b)
            out(out.length - 1) = a + b
          else out += s
        }
        out.toVector -> wc
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum } // merged words may collide
      (r.toLong, a, b, a + b, n)
    }
    assert(got.toSeq === expect)
  }

  test("bpeApply: per-word tokenization matches applying the learned " +
       "merge list sequentially") {
    val got = Text.bpeApply(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_alpha_words"), r.getAs[Long]("n_chars_tokens"),
          r.getAs[Long]("n_bpe_tokens")))).toMap
    val rules = Text.bpeTrain(spark, Sf).collect()
      .sortBy(_.getAs[Long]("merge_round"))
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    def tokenize(word: String): Int = {
      var repr = word.map(c => s"($c)").mkString
      rules.foreach { case (a, b) =>
        repr = repr.replace(s"($a)($b)", s"($a$b)")
      }
      repr.count(_ == '(')
    }
    docsRaw().foreach { case (id, text) =>
      val words = text.toLowerCase.split(" ", -1).filter(_.matches("^[a-z]{2,}$"))
      if (words.nonEmpty) {
        val (nw, nc, nt) = got(id)
        assert(nw === words.length.toLong, s"doc $id words")
        assert(nc === words.map(_.length.toLong).sum, s"doc $id chars")
        assert(nt === words.map(tokenize(_).toLong).sum, s"doc $id tokens")
        assert(nt <= nc, s"doc $id merges can only shrink")
      } else assert(!got.contains(id))
    }
  }

  test("embedPcaPower: matches a sequential BigInt power iteration; the " +
       "loading direction aligns with the dominant variance axis") {
    val got = graft.operators.Similarity.embedPcaPower(spark, Sf).collect()
      .map(r => r.getAs[Long]("dim_idx") -> r.getAs[Long]("loading_fp")).toMap
    val vecs = graft.util.Tables.t(spark, Sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getSeq[Float](1).toArray.map(x =>
        math.floor(x.toDouble * 1000.0 + 0.5).toLong))
    val d = vecs.head.length
    val n = BigInt(vecs.length)
    val s = Array.tabulate(d)(i => BigInt(vecs.map(_(i)).sum))
    val cxs = vecs.map(v => Array.tabulate(d)(i => n * BigInt(v(i)) - s(i)))
    val cov = Array.tabulate(d, d)((i, j) => cxs.map(c => c(i) * c(j)).sum)
    var v = Array.fill(d)(BigInt(1000000 / d))
    (1 to graft.operators.Similarity.PcaRounds).foreach { _ =>
      val mv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val l1 = mv.map(_.abs).sum
      val div = (l1 / 1000000) max BigInt(1)
      v = mv.map(m => m.signum * (m.abs / div))
    }
    (0 until d).foreach { i =>
      assert(got(i.toLong) === v(i).toLong, s"dim $i")
    }
    // sanity: power iteration climbed the Rayleigh quotient vs the
    // uniform start (the dominant-axis convergence signal; the largest
    // single loading need NOT sit on the max-variance dim — loadings mix
    // covariance, not just the diagonal)
    def rayleigh(u: Array[BigInt]): Double = {
      val num = (0 until d).map(i => (0 until d).map(j =>
        u(i) * cov(i)(j) * u(j)).sum).sum
      val den = u.map(x => x * x).sum
      num.toDouble / den.toDouble
    }
    val v0 = Array.fill(d)(BigInt(1000000 / d))
    assert(rayleigh(v) > rayleigh(v0))
  }

  test("growthAccounting: classes balance to active; churn matches the " +
       "sequential ledger") {
    val rows = Insights.growthAccounting(spark, Sf).collect()
      .map(r => r.getAs[java.sql.Date]("month").toLocalDate ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
          r.getAs[Long]("n_churned")))).toMap
    // balance: every active customer-month is exactly one of the classes
    rows.values.foreach { case (act, nw, ret, res, _) =>
      assert(act === nw + ret + res)
    }
    // sequential ledger over collected customer-months
    val um = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey"),
              date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date]("m").toLocalDate))
    val byC = um.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val months = um.map(_._2).toSet
    months.foreach { m =>
      val prev = m.minusMonths(1)
      val active = byC.filter(_._2.contains(m))
      val nw = active.count(_._2.head == m).toLong
      val ret = active.count(c => c._2.contains(prev)).toLong
      val res = (active.size - nw - ret).toLong
      val churned = byC.count { case (_, ms) =>
        ms.contains(prev) && !ms.contains(m) }.toLong
      val (a, n, r2, rs, ch) = rows(m)
      assert(a === active.size.toLong, s"$m active")
      assert(n === nw, s"$m new"); assert(r2 === ret, s"$m retained")
      assert(rs === res, s"$m resurrected"); assert(ch === churned, s"$m churned")
    }
  }

  test("cochranQ and mcnemar agree on their shared margins; partialCorr " +
       "collapses to rxy when z is independent") {
    val q = Insights.cochranQ(spark, Sf).collect().head
    assert(q.getAs[Long]("n_blocks") > 0)
    assert(q.getAs[Double]("q_stat") >= 0.0)
    // t1 (has-F-order customers) must equal mcnemar's a-margin
    val m = Insights.mcnemar(spark, Sf).collect().head
    assert(q.getAs[Long]("t1") ===
      m.getAs[Long]("n_both") + m.getAs[Long]("a_only"))
    val pc = Insights.partialCorr(spark, Sf).collect().head
    // partialling out can move the correlation but |r| stays in [0,1]
    Seq("r_xy", "r_xz", "r_yz", "r_xy_given_z").foreach { c =>
      assert(math.abs(pc.getAs[Double](c)) <= 1.0, c)
    }
  }

  test("did: the four cell means reproduce from a driver fold") {
    val r = Insights.did(spark, Sf).collect().head
    val rows = graft.util.Tables.t(spark, Sf, "orders")
      .join(graft.util.Tables.t(spark, Sf, "customer"),
            col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderdate").cast("date").as("d"),
              graft.util.Tables.money(col("o_totalprice")).as("tp")).collect()
    def mean(treated: Boolean, post: Boolean): Double = {
      val sel = rows.filter { x =>
        (x.getAs[String]("c_mktsegment") == "BUILDING") == treated &&
        (!x.getAs[java.sql.Date]("d").toLocalDate.isBefore(
          java.time.LocalDate.parse("1998-01-01"))) == post
      }
      val s = sel.map(x => BigDecimal(x.getAs[java.math.BigDecimal]("tp"))).sum
      (s / sel.length).toDouble
    }
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Double]("treated_pre") === rr(mean(true, false)))
    assert(r.getAs[Double]("control_post") === rr(mean(false, true)))
    assert(r.getAs[Double]("did") === rr(
      (mean(true, true) - mean(true, false)) -
        (mean(false, true) - mean(false, false))))
  }

  test("srm: the deterministic modulo split shows only rounding-level " +
       "mismatch and full coverage") {
    val rows = Insights.srmCheck(spark, Sf).collect()
      .map(r => r.getAs[String]("split") ->
        ((r.getAs[Long]("observed"), r.getAs[Double]("expected"),
          r.getAs[Double]("chi2_contrib")))).toMap
    assert(rows.keySet === Set("train", "val", "test"))
    val total = rows.values.map(_._1).sum
    assert(total === graft.util.Tables.t(spark, Sf, "documents").count())
    // contiguous doc_ids 0..N-1: the modulo split is within 1 doc-decade
    // of design, so every cell's chi2 contribution is rounding-level
    rows.values.foreach { case (_, _, contrib) => assert(contrib < 1.0) }
  }

  test("embedOutliers: exact top-k matches a driver BigInt ranking") {
    val got = graft.operators.Similarity.embedOutliers(spark, Sf, 20).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dist_sq")))
    val vecs = graft.util.Tables.t(spark, Sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).toArray.map(x =>
          math.floor(x.toDouble * 1000.0 + 0.5).toLong))
    val d = vecs.head._2.length
    val n = BigInt(vecs.length)
    val s = Array.tabulate(d)(i => BigInt(vecs.map(_._2(i)).sum))
    val scored = vecs.map { case (id, v) =>
      id -> (0 until d).map(i => { val c = n * BigInt(v(i)) - s(i); c * c }).sum
    }
    val expect = scored.sortBy { case (id, sc) => (-sc, id) }.take(20)
    assert(got.map(_._1).toSeq === expect.map(_._1).toSeq)
    got.zip(expect).foreach { case ((_, dq), (_, sc)) =>
      val exact = sc.toDouble / n.toDouble / n.toDouble / 1000000.0
      assert(dq === math.floor(exact * 10000.0 + 0.5) / 10000.0)
    }
  }

  // ---- round-9g: survival + regression-diagnostics tier ----

  private def custLifetimes(censorDays: Int): Array[(Long, Long, Long)] = {
    // (custkey, duration_days, event) — the survivalKm/logrank construction
    val perCust = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate").cast("date")).as("f"),
           max(col("o_orderdate").cast("date")).as("l"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date]("f").toLocalDate,
                 r.getAs[java.sql.Date]("l").toLocalDate))
    val hz = perCust.map(_._3).maxBy(_.toEpochDay)
    perCust.map { case (ck, f, l) =>
      (ck, l.toEpochDay - f.toEpochDay,
       if (hz.toEpochDay - l.toEpochDay > censorDays) 1L else 0L)
    }
  }

  private def dec8(x: Double): BigDecimal =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)

  test("logrank: matches a sequential fold with the same DECIMAL term " +
       "accumulation; margins tie to survivalKm's population") {
    val r = Insights.logrank(spark, Sf, 90).collect().head
    val seg = graft.util.Tables.t(spark, Sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(x => x.getLong(0) -> (x.getString(1) == "BUILDING")).toMap
    val lives = custLifetimes(90).map { case (ck, t, ev) => (seg(ck), t, ev) }
    val n1tot = lives.count(_._1).toLong
    val n2tot = lives.length - n1tot
    // sequential sweep over event times in ascending duration order
    val times = lives.map(_._2).distinct.sorted
    var (rem1, rem2) = (n1tot, lives.length - n1tot)
    var (o1, o2) = (0L, 0L)
    var (e1s, vs) = (BigDecimal(0), BigDecimal(0))
    times.foreach { t =>
      val at = lives.filter(_._2 == t)
      val d1 = at.count(x => x._1 && x._3 == 1L).toLong
      val d2 = at.count(x => !x._1 && x._3 == 1L).toLong
      val (d, n, n1, n2) = (d1 + d2, rem1 + rem2, rem1, rem2)
      if (d > 0) {
        o1 += d1; o2 += d2
        e1s += dec8(d.toDouble * n1.toDouble / n.toDouble)
        if (n > 1)
          vs += dec8(d.toDouble * n1.toDouble * n2.toDouble * (n - d).toDouble /
                     (n.toDouble * n.toDouble * (n - 1).toDouble))
      }
      rem1 -= at.count(_._1); rem2 -= at.count(!_._1)
    }
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_group1") === n1tot)
    assert(r.getAs[Long]("n_group2") === n2tot)
    assert(r.getAs[Long]("observed1") === o1)
    assert(r.getAs[Long]("observed2") === o2)
    assert(r.getAs[Double]("expected1") === rr(e1s.toDouble))
    assert(r.getAs[Double]("chi2") === rr(
      (o1 - e1s.toDouble) * (o1 - e1s.toDouble) / vs.toDouble))
  }

  test("nelsonAalen: shares survivalKm's grain exactly; -ln(KM) dominates " +
       "the NA hazard and FH survival dominates KM") {
    val na = Insights.nelsonAalen(spark, Sf, 90).collect()
      .map(r => r.getAs[Long]("duration_days") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("deaths"),
          r.getAs[Double]("cum_hazard"), r.getAs[Double]("fh_survival")))).toMap
    val km = Insights.survivalKm(spark, Sf, 90).collect()
      .map(r => r.getAs[Long]("duration_days") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("deaths"),
          r.getAs[Double]("survival")))).toMap
    assert(na.keySet === km.keySet)
    assert(na.nonEmpty)
    na.foreach { case (t, (nr, d, h, fh)) =>
      val (knr, kd, ks) = km(t)
      assert(nr === knr, s"t=$t n_risk"); assert(d === kd, s"t=$t deaths")
      // 1-x <= e^-x termwise => KM <= FH survival (equality only pre-death)
      assert(fh >= ks - 1e-9, s"t=$t FH >= KM")
      // hazard is nonneg and nondecreasing is checked via the map below
      assert(h >= 0.0)
    }
    val sortedH = na.toSeq.sortBy(_._1).map(_._2._3)
    assert(sortedH === sortedH.sorted, "cumulative hazard must be monotone")
  }

  test("durbinWatson: matches a sequential OLS-residual fold") {
    val r = Insights.durbinWatson(spark, Sf).collect().head
    val daily = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("y"))
      .orderBy("d").collect()
      .map(x => (x.getAs[java.sql.Date]("d").toLocalDate, x.getLong(1)))
    val d0 = daily.head._1
    val pts = daily.map { case (d, y) => (d.toEpochDay - d0.toEpochDay, y) }
    val n = pts.length
    val (sx, sy) = (pts.map(p => BigInt(p._1)).sum, pts.map(p => BigInt(p._2)).sum)
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val b = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
            (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val (my, mx) = (sy.toDouble / n, sx.toDouble / n)
    val es = pts.map { case (x, y) => y.toDouble - (my + b * (x.toDouble - mx)) }
    val sse = es.map(e => dec8(e * e)).sum
    val sdd = es.sliding(2).collect { case Array(p, c) => dec8((c - p) * (c - p)) }.sum
    assert(r.getAs[Long]("n_days") === n.toLong)
    assert(r.getAs[Double]("dw") ===
      math.floor(sdd.toDouble / sse.toDouble * 10000.0 + 0.5) / 10000.0)
  }

  test("ljungBox: exact integer ACF matches a BigInt fold; Q is " +
       "positive and cumulative in the lag") {
    val rows = Insights.ljungBox(spark, Sf, 5).collect()
      .sortBy(_.getAs[Long]("lag_k"))
      .map(r => (r.getAs[Long]("lag_k"), r.getAs[Double]("acf"),
                 r.getAs[Double]("q_stat")))
    val daily = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("y"))
      .orderBy("d").collect().map(_.getLong(1))
    val n = daily.length
    val s = daily.sum
    val z = daily.map(y => BigInt(n.toLong * y - s))
    val c0 = z.map(x => x * x).sum
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    var qsum = BigDecimal(0)
    (1 to 5).foreach { k =>
      val ck = (0 until n - k).map(i => z(i) * z(i + k)).sum
      val rk = ck.toDouble / c0.toDouble
      qsum += BigDecimal(rk * rk / (n - k).toDouble)
        .setScale(18, BigDecimal.RoundingMode.HALF_UP)
      val (lg, acf, q) = rows(k - 1)
      assert(lg === k.toLong)
      assert(acf === rr(rk), s"lag $k acf")
      assert(q === rr(n.toDouble * (n + 2).toDouble * qsum.toDouble), s"lag $k Q")
      assert(q >= 0.0)
    }
    // Q accumulates: nondecreasing in the lag
    assert(rows.map(_._3).toSeq === rows.map(_._3).sorted.toSeq)
  }

  test("olsMulti: normal-equation solution matches a BigInt moment fold; " +
       "residuals are orthogonal to both predictors") {
    val r = Insights.olsMulti(spark, Sf).collect().head
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"),
              floor(col("l_quantity") * 100.0 + 0.5).cast("long"),
              floor(col("l_discount") * 10000.0 + 0.5).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val n = li.length
    def bsum(f: ((Long, Long, Long)) => BigInt) = li.map(f).sum
    val (sx, sy, sz) = (bsum(t => BigInt(t._2)), bsum(t => BigInt(t._1)), bsum(t => BigInt(t._3)))
    val sxy = bsum(t => BigInt(t._2) * BigInt(t._1))
    val sxz = bsum(t => BigInt(t._2) * BigInt(t._3))
    val szy = bsum(t => BigInt(t._3) * BigInt(t._1))
    val sxx = bsum(t => BigInt(t._2) * BigInt(t._2))
    val syy = bsum(t => BigInt(t._1) * BigInt(t._1))
    val szz = bsum(t => BigInt(t._3) * BigInt(t._3))
    val nd = n.toDouble
    val cxx = nd * sxx.toDouble - sx.toDouble * sx.toDouble
    val czz = nd * szz.toDouble - sz.toDouble * sz.toDouble
    val cxz = nd * sxz.toDouble - sx.toDouble * sz.toDouble
    val cxy = nd * sxy.toDouble - sx.toDouble * sy.toDouble
    val czy = nd * szy.toDouble - sz.toDouble * sy.toDouble
    val cyy = nd * syy.toDouble - sy.toDouble * sy.toDouble
    val det = cxx * czz - cxz * cxz
    val b1 = (czz * cxy - cxz * czy) / det
    val b2 = (cxx * czy - cxz * cxy) / det
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_lines") === n.toLong)
    assert(r.getAs[Double]("b_quantity") === rr(b1))
    assert(r.getAs[Double]("b_discount") === rr(b2))
    assert(r.getAs[Double]("intercept") === rr(
      sy.toDouble / nd - b1 * sx.toDouble / nd - b2 * sz.toDouble / nd))
    val r2 = (b1 * cxy + b2 * czy) / cyy
    assert(r.getAs[Double]("r2") === rr(r2))
    assert(r2 >= 0.0 && r2 <= 1.0)
    // normal equations ARE the orthogonality conditions: residual dot
    // each centered predictor must vanish (relative to the moment scale)
    val rx = cxy - b1 * cxx - b2 * cxz
    val rz = czy - b1 * cxz - b2 * czz
    assert(math.abs(rx) / (math.abs(cxy) + 1.0) < 1e-9)
    assert(math.abs(rz) / (math.abs(czy) + 1.0) < 1e-9)
  }

  test("bhFdr: sequential BH step-up agrees; discoveries form a prefix of " +
       "the p-ranked list and q-values are monotone") {
    val rows = Insights.bhFdr(spark, Sf, 500).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("n_lines"),
                 r.getAs[Double]("z"), r.getAs[Double]("p_value"),
                 r.getAs[Double]("q_value"), r.getAs[Boolean]("discovery")))
    // sequential: exact moments per brand, same erfc polynomial
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .join(graft.util.Tables.t(spark, Sf, "part")
              .select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), floor(col("l_quantity") * 100.0 + 0.5).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = li.length
    val s = li.map(x => BigInt(x._2)).sum
    val s2 = li.map(x => BigInt(x._2) * BigInt(x._2)).sum
    val mu = s.toDouble / n
    val sigma = math.sqrt((s2.toDouble - s.toDouble * s.toDouble / n) / n)
    def erfc(az: Double): Double = {
      val tt = 1.0 / (1.0 + 0.3275911 * az)
      (((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
        - 0.284496736) * tt + 0.254829592) * tt) * math.exp(-az * az)
    }
    val pv = li.groupBy(_._1).map { case (b, xs) =>
      val ng = xs.length
      val mg = xs.map(x => BigInt(x._2)).sum.toDouble / ng
      val z = (mg - mu) * math.sqrt(ng.toDouble) / sigma
      (b, ng.toLong, z, erfc(math.abs(z) / math.sqrt(2.0)))
    }.toSeq
    val m = pv.length
    val ranked = pv.sortBy(x => (x._4, x._1)).zipWithIndex
      .map { case ((b, ng, z, p), i0) => (b, ng, z, p, i0 + 1) }
    val kMax = ranked.filter { case (_, _, _, p, i) => p <= i * 0.05 / m }
      .map(_._5).foldLeft(0)(math.max)
    val qByBrand = ranked.sortBy(-_._5)
      .scanLeft(("", Double.MaxValue)) { case ((_, acc), (b, _, _, p, i)) =>
        (b, math.min(acc, m.toDouble * p / i)) }.tail.toMap
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val expect = ranked.map { case (b, ng, z, p, i) =>
      (b, ng, rr(z), rr(p), rr(qByBrand(b)), i <= kMax)
    }.sortBy(_._1)
    assert(rows.sortBy(_._1).toSeq === expect)
    // structural BH invariants on the engine output
    val byP = rows.sortBy(x => (x._4, x._1))
    assert(byP.map(_._5).toSeq === byP.map(_._5).sorted.toSeq, "q monotone in p")
    val discFlags = byP.map(_._6)
    assert(!discFlags.dropWhile(identity).contains(true), "discoveries prefix")
  }

  // ---- round-9h: LLM corpus-operations tier ----

  private def chunk20(words: Array[String]): Seq[String] =
    (0 until words.length by 20).map(i =>
      words.slice(i, math.min(i + 20, words.length)).mkString(" "))

  test("parDedup: matches a sequential first-occurrence paragraph fold " +
       "with in-order reassembly") {
    val got = Text.parDedup(spark, Sf, 20).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_pars"), r.getAs[Long]("n_removed"),
          r.getAs[String]("kept_text")))).toMap
    val docs = docsRaw()
    val seen = scala.collection.mutable.Set.empty[String]
    // sequential corpus order IS (doc_id, par_idx) order
    docs.toSeq.sortBy(_._1).foreach { case (id, text) =>
      val pars = chunk20(text.split(" ", -1))
      val kept = pars.filter { p =>
        if (seen(p)) false else { seen += p; true }
      }
      val (np, nr, kt) = got(id)
      assert(np === pars.length.toLong, s"doc $id n_pars")
      assert(nr === (pars.length - kept.length).toLong, s"doc $id n_removed")
      assert(kt === kept.mkString(" "), s"doc $id kept_text")
    }
    assert(got.keySet === docs.keySet)
  }

  test("boilerplateReport: per-source counts match a sequential fold; " +
       "ratios are consistent") {
    val got = Text.boilerplateReport(spark, Sf, 20).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_par_instances"), r.getAs[Long]("n_distinct_pars"),
          r.getAs[Long]("n_boilerplate"), r.getAs[Double]("boilerplate_ratio")))).toMap
    val src = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bySource = src.groupBy(_._2)
    assert(got.keySet === bySource.keySet)
    bySource.foreach { case (s, ds) =>
      val parDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
      var inst = 0L
      ds.foreach { case (id, _, text) =>
        chunk20(text.split(" ", -1)).foreach { p =>
          inst += 1
          parDocs(p) = parDocs.getOrElse(p, Set.empty) + id
        }
      }
      val boiler = parDocs.count(_._2.size >= 2).toLong
      val (ni, ndp, nb, ratio) = got(s)
      assert(ni === inst, s"$s instances")
      assert(ndp === parDocs.size.toLong, s"$s distinct")
      assert(nb === boiler, s"$s boilerplate")
      assert(ratio ===
        math.floor(boiler.toDouble / parDocs.size * 10000.0 + 0.5) / 10000.0)
    }
  }

  test("tokenBudgetMix: greedy waterfill matches a sequential fold; " +
       "allocations respect the budget and the rank order") {
    val budget = 50000L
    val rows = Text.tokenBudgetMix(spark, Sf, budget).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
                 r.getAs[Long]("tokens_available"), r.getAs[Double]("utility"),
                 r.getAs[Long]("tokens_allocated"), r.getAs[Double]("fill_frac")))
    val per = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, ds) =>
        val toks = ds.map(_._2.split(" ", -1).length.toLong).sum
        val dtoks = ds.map(_._2.split(" ", -1).distinct.length.toLong).sum
        (s, toks, dtoks)
      }.toSeq
    val ranked = per.sortBy { case (s, t, d) => (-d.toDouble / t, s) }
    var cum = 0L
    val expect = ranked.zipWithIndex.map { case ((s, t, d), i) =>
      val alloc = math.max(0L, math.min(t, budget - cum))
      cum += t
      def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
      (s, (i + 1).toLong, t, rr(d.toDouble / t), alloc, rr(alloc.toDouble / t))
    }.sortBy(_._1)
    assert(rows.sortBy(_._1).toSeq === expect)
    // the waterfill shape: full fills form a rank prefix, then at most one
    // partial, then zeros; total allocated never exceeds the budget
    val byRank = rows.sortBy(_._2)
    assert(byRank.map(_._5).sum <= budget)
    val states = byRank.map(x =>
      if (x._5 == x._3) "full" else if (x._5 == 0L) "zero" else "partial")
    val collapsed = states.foldLeft(List.empty[String]) {
      case (acc, s) if acc.headOption.contains(s) => acc
      case (acc, s) => s :: acc
    }.reverse
    assert(Seq(Seq("full"), Seq("full", "zero"), Seq("full", "partial", "zero"),
               Seq("full", "partial"), Seq("partial", "zero"), Seq("partial"),
               Seq("zero")).contains(collapsed),
           s"waterfill shape was $collapsed")
  }

  test("cosSimHist: bins match a driver fold over the stride pairs; " +
       "pair counts per stride are exact") {
    val rows = graft.operators.Similarity.cosSimHist(spark, Sf, Seq(1, 17, 257)).collect()
      .map(r => (r.getAs[Long]("ofs"), r.getAs[Long]("bin")) -> r.getAs[Long]("n"))
      .toMap
    val vecs = graft.util.Tables.t(spark, Sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    val expect = scala.collection.mutable.Map.empty[(Long, Long), Long]
    Seq(1, 17, 257).foreach { ofs =>
      vecs.keys.toSeq.sorted.foreach { a =>
        vecs.get(a + ofs).foreach { eb =>
          val ea = vecs(a)
          // same fold order as the codegen kernel: index-sequential doubles
          var (dp, na, nb) = (0.0, 0.0, 0.0)
          ea.indices.foreach { i =>
            dp += ea(i).toDouble * eb(i).toDouble
            na += ea(i).toDouble * ea(i).toDouble
            nb += eb(i).toDouble * eb(i).toDouble
          }
          val cos = math.floor(dp / (math.sqrt(na) * math.sqrt(nb)) *
            10000.0 + 0.5) / 10000.0
          val bin = math.floor(cos * 10.0 + 10.0).toLong
          expect((ofs.toLong, bin)) = expect.getOrElse((ofs.toLong, bin), 0L) + 1
        }
      }
    }
    assert(rows === expect.toMap)
    // stride pair counts: contiguous ids 0..N-1 give exactly N-ofs pairs
    val n = vecs.size
    Seq(1, 17, 257).foreach { ofs =>
      assert(rows.collect { case ((o, _), c) if o == ofs => c }.sum ===
        (n - ofs).toLong, s"ofs $ofs")
    }
  }

  // ---- round-9i: temporal warehouse + distribution tests ----

  test("scd2TimelineJoin: intervals tile each key's attribute history — " +
       "no gaps, no overlaps, attributes match the point-in-time lookup") {
    val rows = graft.operators.Warehouse.scd2TimelineJoin(spark, Sf).collect()
      .map(r => (r.getAs[Long]("c_custkey"),
                 r.getAs[java.sql.Date]("valid_from").toLocalDate,
                 Option(r.getAs[java.sql.Date]("valid_to")).map(_.toLocalDate),
                 r.getAs[String]("priority"), r.getAs[String]("status")))
    assert(rows.nonEmpty)
    // per key: sorted intervals chain exactly (each valid_to = next
    // valid_from), exactly one open interval, all non-empty
    rows.groupBy(_._1).foreach { case (ck, ivs) =>
      val sorted = ivs.sortBy(_._2.toEpochDay)
      assert(sorted.count(_._3.isEmpty) === 1, s"key $ck open count")
      assert(sorted.last._3.isEmpty, s"key $ck open last")
      sorted.foreach { iv =>
        iv._3.foreach(to => assert(iv._2.isBefore(to), s"key $ck empty interval"))
      }
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(p._3.contains(n._2), s"key $ck gap/overlap at ${n._2}")
        case _ =>
      }
    }
    // attribute correctness: a sequential per-key sweep over the orders
    val orders = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
              col("o_orderpriority"), col("o_orderstatus")).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date]("d").toLocalDate,
                 r.getString(2), r.getString(3)))
    val byKey = orders.groupBy(_._1)
    rows.groupBy(_._1).foreach { case (ck, ivs) =>
      val os = byKey(ck)
      ivs.foreach { case (_, from, _, pr, st) =>
        // at `from`, the active priority/status version is the min over
        // that key's orders on the latest order date <= from
        val prDay = os.filter(o => !o._2.isAfter(from)).maxBy(_._2.toEpochDay)._2
        val expPr = os.filter(o => o._2 == prDay).map(_._3).min
        val stDay = prDay // both timelines change on order dates
        val expSt = os.filter(o => o._2 == stDay).map(_._4).min
        assert(pr === expPr, s"key $ck at $from priority")
        assert(st === expSt, s"key $ck at $from status")
      }
    }
  }

  test("aggRewrite: the monthly-aggregate rollup equals the direct " +
       "fact-grain yearly aggregation exactly (DECIMAL re-aggregation)") {
    val viaAgg = graft.operators.Warehouse.aggRewrite(spark, Sf).collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("yr")) ->
        r.getAs[Double]("revenue")).toMap
    val direct = graft.util.Tables.t(spark, Sf, "orders")
      .join(graft.util.Tables.t(spark, Sf, "customer"),
            col("o_custkey") === col("c_custkey"))
      .join(graft.util.Tables.t(spark, Sf, "nation"),
            col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(graft.util.Tables.r4(
        sum(graft.util.Tables.money(col("o_totalprice"))).cast("double"))
        .as("revenue"))
      .collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("yr")) ->
        r.getAs[Double]("revenue")).toMap
    assert(viaAgg === direct)
  }

  test("moodsMedian: median and 2x2 cells match a sequential fold") {
    val r = Insights.moodsMedian(spark, Sf).collect().head
    val vals = graft.util.Tables.t(spark, Sf, "orders")
      .select((col("o_orderpriority") === "1-URGENT").as("g1"),
              floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
      .collect().map(x => (x.getBoolean(0), x.getLong(1)))
    val sorted = vals.map(_._2).sorted
    val med = sorted((vals.length + 1) / 2 - 1) // lower median, 1-based ceil
    assert(r.getAs[Double]("median_value") ===
      math.floor(med.toDouble / 100.0 * 10000.0 + 0.5) / 10000.0)
    val a = vals.count(x => x._1 && x._2 > med).toLong
    val b = vals.count(x => x._1 && x._2 <= med).toLong
    val c = vals.count(x => !x._1 && x._2 > med).toLong
    val d = vals.count(x => !x._1 && x._2 <= med).toLong
    assert((r.getAs[Long]("g1_above"), r.getAs[Long]("g1_at_below"),
            r.getAs[Long]("g2_above"), r.getAs[Long]("g2_at_below")) ===
           ((a, b, c, d)))
    // at-or-below must reach at least half by the median's definition
    assert(b + d >= (vals.length + 1) / 2)
  }

  test("bartlett: pooled variance and chi2 match a sequential fold; " +
       "chi2 agrees in spirit with brown-forsythe (same null here)") {
    val r = Insights.bartlett(spark, Sf).collect().head
    val by = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_returnflag"),
              floor(col("l_quantity") * 100.0 + 0.5).cast("long").as("x"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1).map { case (g, xs) =>
        val n = xs.length
        val s = xs.map(v => BigInt(v._2)).sum
        val s2 = xs.map(v => BigInt(v._2) * BigInt(v._2)).sum
        val si2 = (n.toDouble * s2.toDouble - s.toDouble * s.toDouble) /
                  (n.toDouble * (n - 1).toDouble)
        (g, n.toLong, si2)
      }.toSeq
    val n = by.map(_._2).sum
    val k = by.length.toLong
    val sv = by.map(x => dec8((x._2 - 1).toDouble * x._3)).sum
    val slog = by.map(x => dec8((x._2 - 1).toDouble * math.log(x._3))).sum
    val srec = by.map(x => BigDecimal(1.0 / (x._2 - 1).toDouble)
      .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
    val sp2 = sv.toDouble / (n - k).toDouble
    val chi2 = ((n - k).toDouble * math.log(sp2) - slog.toDouble) /
      (1.0 + (srec.toDouble - 1.0 / (n - k).toDouble) / (3.0 * (k - 1).toDouble))
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_total") === n)
    assert(r.getAs[Long]("n_groups") === k)
    assert(r.getAs[Double]("pooled_var") === rr(sp2))
    assert(r.getAs[Double]("chi2") === rr(chi2))
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("kpss: integer partial-sum statistic matches a BigInt fold and " +
       "stays below the 5% critical value on the stationary series") {
    val r = Insights.kpss(spark, Sf).collect().head
    val daily = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("y"))
      .orderBy("d").collect().map(_.getLong(1))
    val n = daily.length
    val s = daily.sum
    val z = daily.map(y => BigInt(n.toLong * y - s))
    val st = z.scanLeft(BigInt(0))(_ + _).tail
    val stat = st.map(x => x * x).sum.toDouble /
      (n.toDouble * z.map(x => x * x).sum.toDouble)
    assert(r.getAs[Long]("n_days") === n.toLong)
    assert(r.getAs[Double]("kpss_stat") ===
      math.floor(stat * 10000.0 + 0.5) / 10000.0)
    // synthetic daily counts are level-stationary: below the 5% critical
    // value 0.463 (Kwiatkowski et al. 1992, table 1)
    assert(r.getAs[Double]("kpss_stat") < 0.463)
  }

  test("granger: restricted/unrestricted RSS decomposition matches a " +
       "BigInt moment fold; F is nonnegative") {
    val r = Insights.granger(spark, Sf).collect().head
    val rev = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("y"))
      .collect().map(x => x.getAs[java.sql.Date]("d").toLocalDate -> x.getLong(1)).toMap
    val qty = graft.util.Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(sum(floor(col("l_quantity") * 100.0 + 0.5).cast("long")).as("x"))
      .collect().map(x => x.getAs[java.sql.Date]("d").toLocalDate -> x.getLong(1)).toMap
    val days = (rev.keySet & qty.keySet).toSeq.sortBy(_.toEpochDay)
    val trip = days.sliding(2).collect {
      case Seq(p, c) => (rev(c), rev(p), qty(p)) // (y, y_lag, x_lag)
    }.toSeq
    val n = trip.length
    def bs(f: ((Long, Long, Long)) => BigInt) = trip.map(f).sum
    val (s1, s2, sy) = (bs(t => BigInt(t._2)), bs(t => BigInt(t._3)), bs(t => BigInt(t._1)))
    val c11 = n.toDouble * bs(t => BigInt(t._2) * BigInt(t._2)).toDouble - s1.toDouble * s1.toDouble
    val c22 = n.toDouble * bs(t => BigInt(t._3) * BigInt(t._3)).toDouble - s2.toDouble * s2.toDouble
    val c12 = n.toDouble * bs(t => BigInt(t._2) * BigInt(t._3)).toDouble - s1.toDouble * s2.toDouble
    val c1y = n.toDouble * bs(t => BigInt(t._2) * BigInt(t._1)).toDouble - s1.toDouble * sy.toDouble
    val c2y = n.toDouble * bs(t => BigInt(t._3) * BigInt(t._1)).toDouble - s2.toDouble * sy.toDouble
    val cyy = n.toDouble * bs(t => BigInt(t._1) * BigInt(t._1)).toDouble - sy.toDouble * sy.toDouble
    val det = c11 * c22 - c12 * c12
    val b1 = (c22 * c1y - c12 * c2y) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val rssU = cyy - b1 * c1y - b2 * c2y
    val rssR = cyy - c1y * c1y / c11
    val f = (rssR - rssU) / (rssU / (n - 3).toDouble)
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_days") === n.toLong)
    assert(r.getAs[Double]("b_rev_lag") === rr(b1))
    assert(r.getAs[Double]("b_qty_lag") === rr(b2))
    assert(r.getAs[Double]("f_stat") === rr(f))
    // adding a regressor can only shrink RSS, so F >= 0 structurally
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  // ---- round-9j: graph structure + forecasting + agreement ----

  private def partGraph(): (Set[(Long, Long)], Map[Long, Int]) = {
    // undirected co-purchase edges with co-order support >= 2, and degrees
    val items = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pc = scala.collection.mutable.Map.empty[(Long, Long), Int]
    items.groupBy(_._1).foreach { case (_, ps) =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        pc((parts(i), parts(j))) = pc.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val edges = pc.filter(_._2 >= 2).keySet.toSet
    val deg = scala.collection.mutable.Map.empty[Long, Int]
    edges.foreach { case (x, y) =>
      deg(x) = deg.getOrElse(x, 0) + 1; deg(y) = deg.getOrElse(y, 0) + 1
    }
    (edges, deg.toMap)
  }

  test("modularity: community stats match a sequential 3-round LPA fold; " +
       "contributions sum to a sane Q") {
    val rows = Insights.modularity(spark, Sf, 2, 3).collect()
      .map(r => r.getAs[Long]("community") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("intra_edges"),
          r.getAs[Long]("d_c"), r.getAs[Double]("q_contrib")))).toMap
    val (edges, deg) = partGraph()
    val nbr = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (x, y) =>
      nbr(x) = y :: nbr.getOrElse(x, Nil); nbr(y) = x :: nbr.getOrElse(y, Nil)
    }
    var lab = nbr.keys.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      lab = nbr.keys.map { v =>
        val counts = nbr(v).groupBy(lab).view.mapValues(_.size).toMap
        val mx = counts.values.max
        v -> counts.filter(_._2 == mx).keys.min
      }.toMap
    }
    val m = edges.size.toLong
    val byC = lab.groupBy(_._2).map { case (c, ns) =>
      val nodes = ns.keySet
      val eC = edges.count { case (x, y) => nodes(x) && nodes(y) }.toLong
      val dC = nodes.toSeq.map(deg(_).toLong).sum
      c -> ((nodes.size.toLong, eC, dC))
    }
    assert(rows.keySet === byC.keySet)
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    byC.foreach { case (c, (nn, ec, dc)) =>
      val (gn, ge, gd, gq) = rows(c)
      assert(gn === nn, s"community $c nodes")
      assert(ge === ec, s"community $c intra")
      assert(gd === dc, s"community $c degree")
      assert(gq === rr(ec.toDouble / m - math.pow(dc.toDouble / (2 * m), 2)))
    }
    // total degree must be 2m exactly (handshake lemma over the partition)
    assert(rows.values.map(_._3).sum === 2 * m)
  }

  test("richClub: quantile thresholds and densities match a sequential " +
       "fold; phi rises with the threshold on this graph") {
    val rows = Insights.richClub(spark, Sf, Seq(50, 75, 90, 95)).collect()
      .map(r => r.getAs[Long]("pct") ->
        ((r.getAs[Long]("k"), r.getAs[Long]("n_k"), r.getAs[Long]("e_k"),
          r.getAs[Double]("phi")))).toMap
    // degrees from the FULL (support >= 1) co-purchase graph
    val items = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbr = scala.collection.mutable.Map.empty[Long, Set[Long]]
    items.groupBy(_._1).foreach { case (_, ps) =>
      val parts = ps.map(_._2).distinct
      for (x <- parts; y <- parts if x != y)
        nbr(x) = nbr.getOrElse(x, Set.empty) + y
    }
    val deg = nbr.view.mapValues(_.size.toLong).toMap
    val sortedDeg = deg.values.toSeq.sorted
    val n = sortedDeg.length
    Seq(50, 75, 90, 95).foreach { pct =>
      // min degree whose cumulative count reaches pct% of nodes
      val k = sortedDeg(math.ceil(pct * n / 100.0).toInt - 1)
      val rich = deg.filter(_._2 > k).keySet
      val nk = rich.size.toLong
      val ek = nbr.toSeq.flatMap { case (x, ys) =>
        ys.collect { case y if x < y && rich(x) && rich(y) => (x, y) }
      }.size.toLong
      val (gk, gn, ge, gphi) = rows(pct.toLong)
      assert(gk === k, s"pct $pct k")
      assert(gn === nk, s"pct $pct n_k")
      assert(ge === ek, s"pct $pct e_k")
      assert(gphi === math.floor(2.0 * ek / (nk * (nk - 1)).toDouble *
        10000.0 + 0.5) / 10000.0, s"pct $pct phi")
    }
    val phis = Seq(50L, 75L, 90L, 95L).map(rows(_)._4)
    assert(phis === phis.sorted, "rich club ordering on this graph")
  }

  test("forecastAcc: error metrics match a sequential fold; MASE near 1 " +
       "says lag-7 is no better than lag-1 on the stationary series") {
    val r = Insights.forecastAcc(spark, Sf).collect().head
    val daily = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("y"))
      .orderBy("d").collect().map(_.getLong(1))
    val n = daily.length
    val e7 = (7 until n).map(i => (daily(i), math.abs(daily(i) - daily(i - 7))))
    val e1 = (1 until n).map(i => math.abs(daily(i) - daily(i - 1)))
    val mae = e7.map(_._2).sum.toDouble / e7.size
    val mape = (7 until n).map(i => BigDecimal(
      math.abs(daily(i) - daily(i - 7)).toDouble / daily(i).toDouble)
      .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / e7.size
    val smape = (7 until n).map(i => BigDecimal(
      2.0 * math.abs(daily(i) - daily(i - 7)).toDouble /
      (daily(i) + daily(i - 7)).toDouble)
      .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / e7.size
    val mase = mae / (e1.sum.toDouble / e1.size)
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_days") === n.toLong)
    assert(r.getAs[Long]("n_forecast") === e7.size.toLong)
    assert(r.getAs[Double]("mae") === rr(mae))
    assert(r.getAs[Double]("mape") === rr(mape))
    assert(r.getAs[Double]("smape") === rr(smape))
    assert(r.getAs[Double]("mase") === rr(mase))
    // stationary noise: seasonal-naive ~ naive-1, MASE hovers near 1
    assert(r.getAs[Double]("mase") > 0.8 && r.getAs[Double]("mase") < 1.2)
  }

  test("ar2Yw: Yule-Walker coefficients reproduce from the exact ACF and " +
       "agree with pacf's Durbin-Levinson phi2") {
    val r = Insights.ar2Yw(spark, Sf).collect().head
    val (r1, r2) = (r.getAs[Double]("acf1"), r.getAs[Double]("acf2"))
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    // recompute phi from the ROUNDED acf (4dp) — tolerance-checked because
    // the engine derives phi from the unrounded r's
    val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(math.abs(r.getAs[Double]("phi1") - rr(phi1)) <= 2e-4)
    assert(math.abs(r.getAs[Double]("phi2") - rr(phi2)) <= 2e-4)
    // the exact BigInt fold (unrounded) must match exactly
    val daily = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("y"))
      .orderBy("d").collect().map(_.getLong(1))
    val n = daily.length
    val s = daily.sum
    val z = daily.map(y => BigInt(n.toLong * y - s))
    def ac(k: Int) = (k until n).map(i => z(i) * z(i - k)).sum
    val (c0, c1, c2) = (ac(0), ac(1), ac(2))
    val er1 = c1.toDouble / c0.toDouble
    val er2 = c2.toDouble / c0.toDouble
    val ephi1 = er1 * (1.0 - er2) / (1.0 - er1 * er1)
    val ephi2 = (er2 - er1 * er1) / (1.0 - er1 * er1)
    assert(r.getAs[Double]("phi1") === rr(ephi1))
    assert(r.getAs[Double]("phi2") === rr(ephi2))
    assert(r.getAs[Double]("innov_var_ratio") ===
      rr(1.0 - ephi1 * er1 - ephi2 * er2))
    // innovation variance cannot exceed the series variance
    assert(r.getAs[Double]("innov_var_ratio") <= 1.0)
  }

  test("gtest: likelihood-ratio statistic matches a sequential fold and " +
       "lands near chi2 on the same table") {
    val r = Insights.gtest(spark, Sf).collect().head
    val cells = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val n = cells.map(_._3).sum
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val g = 2.0 * cells.filter(_._3 > 0).map { case (p, s, o) =>
      dec8(o.toDouble * math.log(o.toDouble * n.toDouble /
        (rt(p).toDouble * ct(s).toDouble)))
    }.sum.toDouble
    assert(r.getAs[Long]("n_total") === n)
    assert(r.getAs[Long]("dof") ===
      (rt.size - 1).toLong * (ct.size - 1).toLong)
    assert(r.getAs[Double]("g_stat") ===
      math.floor(g * 10000.0 + 0.5) / 10000.0)
    // under independence G ~ chi2; both statistics should be same-order
    val chi2 = cells.map { case (p, s, o) =>
      val e = rt(p).toDouble * ct(s).toDouble / n.toDouble
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(g - chi2) < 0.2 * math.max(g, chi2) + 1.0)
  }

  test("cohensKappa: cells partition the corpus; kappa matches the " +
       "confusion-matrix fold and stays in [-1, 1]") {
    val r = Text.cohensKappa(spark, Sf).collect().head
    val (n, n11, n01, n10, n00) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("both_en"), r.getAs[Long]("pred_only"),
      r.getAs[Long]("truth_only"), r.getAs[Long]("both_other"))
    assert(n === n11 + n01 + n10 + n00)
    assert(n === graft.util.Tables.t(spark, Sf, "documents").count())
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) +
              (n00 + n01).toDouble * (n00 + n10)) / (n.toDouble * n)
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Double]("p_observed") === rr(po))
    assert(r.getAs[Double]("p_expected") === rr(pe))
    assert(r.getAs[Double]("kappa") === rr((po - pe) / (1.0 - pe)))
    assert(math.abs(r.getAs[Double]("kappa")) <= 1.0)
    // the langId margins must agree with the lang_id query itself
    val pred = Text.langId(spark, Sf).collect()
      .count(_.getAs[String]("lang_pred") == "en").toLong
    assert(n11 + n01 === pred)
  }

  // ---- round-9k: retrieval eval, leakage, sampling, power ----

  test("splitLeakage: paragraph-grain counts match a sequential fold; " +
       "doc-grain would be empty (the reason for the paragraph grain)") {
    val rows = Text.splitLeakage(spark, Sf, 20).collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b")) ->
        ((r.getAs[Long]("n_shared_fps"), r.getAs[Long]("n_leaked_docs")))).toMap
    val docs = docsRaw()
    def splitOf(id: Long) =
      if (id % 10 < 8) ("train", 0) else if (id % 10 == 8) ("val", 1) else ("test", 2)
    // paragraph -> set of (split, rank); doc -> its paragraphs
    val parSplits = scala.collection.mutable.Map.empty[String, Set[(String, Int)]]
    docs.foreach { case (id, t) =>
      val s = splitOf(id)
      chunk20(t.split(" ", -1)).foreach { p =>
        parSplits(p) = parSplits.getOrElse(p, Set.empty) + s
      }
    }
    val expShared = scala.collection.mutable.Map.empty[(String, String), Set[String]]
    parSplits.foreach { case (p, ss) =>
      for (a <- ss; b <- ss if a._2 < b._2)
        expShared((a._1, b._1)) = expShared.getOrElse((a._1, b._1), Set.empty) + p
    }
    val expLeaked = scala.collection.mutable.Map.empty[(String, String), Set[Long]]
    docs.foreach { case (id, t) =>
      val (sb, rb) = splitOf(id)
      chunk20(t.split(" ", -1)).foreach { p =>
        parSplits(p).filter(_._2 < rb).foreach { case (sa, _) =>
          expLeaked((sa, sb)) = expLeaked.getOrElse((sa, sb), Set.empty) + id
        }
      }
    }
    val keys = expShared.keySet ++ expLeaked.keySet
    assert(rows.keySet === keys.toSet)
    keys.foreach { k =>
      val (gs, gl) = rows(k)
      assert(gs === expShared.getOrElse(k, Set.empty).size.toLong, s"$k shared")
      assert(gl === expLeaked.getOrElse(k, Set.empty).size.toLong, s"$k leaked")
    }
    // doc-grain exact leakage really is zero on this corpus
    val fps = docs.values.groupBy(identity).view.mapValues(_.size)
    assert(fps.forall(_._2 == 1), "no exact doc twins expected")
  }

  test("ndcg: DCG/IDCG/precision/recall match a sequential fold over the " +
       "bm25 ranking; metric is properly discriminating (0 < ndcg < 1)") {
    val r = Text.ndcgAt(spark, Sf, 20).collect().head
    val rel = docsRaw().map { case (id, t) =>
      val w = t.toLowerCase.split(" ", -1)
      id -> Seq("join", "hash", "scan").forall(q => w.count(_ == q) >= 3)
    }
    val ranked = Text.bm25(spark, Sf, 20).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Double]("bm25")))
      .sortBy { case (id, s) => (-s, id) }
    val dcg = ranked.zipWithIndex.collect {
      case ((id, _), i0) if rel(id) =>
        dec8(1.0 / (math.log(i0 + 2.0) / math.log(2.0)))
    }.sum
    val rTot = rel.count(_._2)
    val idcg = (1 to math.min(20, rTot)).map(i =>
      dec8(1.0 / (math.log(i + 1.0) / math.log(2.0)))).sum
    val hits = ranked.count(x => rel(x._1))
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_relevant_total") === rTot.toLong)
    assert(r.getAs[Long]("n_relevant_topk") === hits.toLong)
    assert(r.getAs[Double]("dcg") === rr(dcg.toDouble))
    assert(r.getAs[Double]("idcg") === rr(idcg.toDouble))
    assert(r.getAs[Double]("ndcg") === rr(dcg.toDouble / idcg.toDouble))
    assert(r.getAs[Double]("precision_k") === rr(hits / 20.0))
    assert(r.getAs[Double]("recall_k") === rr(hits.toDouble / rTot))
    assert(r.getAs[Double]("ndcg") > 0.0 && r.getAs[Double]("ndcg") < 1.0)
  }

  test("distinctiveTerms: lift and ranks match a sequential fold; lift " +
       "of a source's terms averages to ~1 corpus-wide") {
    val rows = Text.distinctiveTerms(spark, Sf, 3).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[Long]("rank")) ->
        ((x.getAs[String]("term"), x.getAs[Long]("tf"), x.getAs[Double]("lift")))).toMap
    val cells = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("source"), explode(split(lower(col("text")), " ")).as("t"))
      .filter(length(col("t")) > 0).collect()
      .map(x => (x.getString(0), x.getString(1)))
    val bySrc = cells.groupBy(_._1)
    val ctf = cells.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val g = cells.length.toLong
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    bySrc.foreach { case (s, cs) =>
      val tf = cs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = cs.length.toLong
      val scored = tf.toSeq.map { case (t, f) =>
        (t, f, rr((f.toDouble / total) / (ctf(t).toDouble / g)))
      }.sortBy { case (t, _, l) => (-l, t) }.take(3)
      scored.zipWithIndex.foreach { case ((t, f, l), i0) =>
        assert(rows((s, i0 + 1L)) === ((t, f, l)), s"source $s rank ${i0 + 1}")
      }
    }
  }

  test("ksNormal: D statistic matches a sequential CDF sweep with the " +
       "same erfc polynomial") {
    val r = Insights.ksNormal(spark, Sf).collect().head
    val vals = graft.util.Tables.t(spark, Sf, "orders")
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vals.length
    val s = vals.map(BigInt(_)).sum
    val s2 = vals.map(v => BigInt(v) * BigInt(v)).sum
    val mu = s.toDouble / n
    val sigma = math.sqrt((s2.toDouble - s.toDouble * s.toDouble / n) / n)
    def erfcT(az: Double) = {
      val tt = 1.0 / (1.0 + 0.3275911 * az)
      (((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
        - 0.284496736) * tt + 0.254829592) * tt) * math.exp(-az * az)
    }
    def phi(z: Double) =
      if (z >= 0) 1.0 - 0.5 * erfcT(z / math.sqrt(2.0))
      else 0.5 * erfcT(-z / math.sqrt(2.0))
    // sweep over value grain with both one-sided gaps
    val grain = vals.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
    var cum = 0L
    var d = 0.0
    grain.foreach { case (v, c) =>
      val p = phi((v - mu) / sigma)
      d = math.max(d, math.max(math.abs((cum + c).toDouble / n - p),
                               math.abs(cum.toDouble / n - p)))
      cum += c
    }
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_orders") === n.toLong)
    assert(r.getAs[Double]("d_stat") === rr(d))
    assert(r.getAs[Double]("sqrt_n_d") === rr(math.sqrt(n.toDouble) * d))
    // order values are far from normal: D must reject at any level
    assert(r.getAs[Double]("sqrt_n_d") > 1.949) // 1% KS critical value
  }

  test("powerAnalysis: the closed form reproduces; n shrinks as the " +
       "effect grows (sanity of the formula's direction)") {
    val r = Insights.powerAnalysis(spark, Sf).collect().head
    val (ne, np) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_purchases"))
    val p1 = np.toDouble / ne
    val p2 = p1 * 1.1
    val pbar = (p1 + p2) / 2.0
    val nraw = math.pow(1.959963985 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
      0.8416212336 * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2) /
      ((p2 - p1) * (p2 - p1))
    assert(r.getAs[Long]("n_per_arm") === math.ceil(nraw).toLong)
    assert(r.getAs[Long]("n_total") === 2 * math.ceil(nraw).toLong)
    // doubling the effect quarters the sample (approximately)
    val p2b = p1 * 1.2
    val pbarB = (p1 + p2b) / 2.0
    val nB = math.pow(1.959963985 * math.sqrt(2.0 * pbarB * (1.0 - pbarB)) +
      0.8416212336 * math.sqrt(p1 * (1.0 - p1) + p2b * (1.0 - p2b)), 2) /
      ((p2b - p1) * (p2b - p1))
    assert(nB < nraw / 3.0)
  }

  test("uniformSampleK: exactly the k smallest hash-ranked docs, stable " +
       "across runs, and roughly uniform over sources") {
    val a = Insights.uniformSampleK(spark, Sf, 100).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("h")))
    val b = Insights.uniformSampleK(spark, Sf, 100).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("h")))
    assert(a.toSeq === b.toSeq, "deterministic across runs")
    val all = docsRaw().keySet.toSeq
      .map(id => (id, ((id * 48271L + 11L) % 1000003L + 1000003L) % 1000003L))
      .sortBy { case (id, h) => (h, id) }.take(100)
    assert(a.toSeq === all)
    // no doc_id aliasing: hashes are distinct for this id range
    assert(a.map(_._2).distinct.length === 100)
  }

  // ---- round-9l: embedding health, calibration, migration, profile ----

  test("embedDimVar: per-dimension moments match a BigInt fold; shares " +
       "sum to 1") {
    val rows = graft.operators.Similarity.embedDimVar(spark, Sf).collect()
      .map(r => r.getAs[Long]("dim_idx") ->
        ((r.getAs[Double]("mean"), r.getAs[Double]("variance"),
          r.getAs[Double]("var_share")))).toMap
    val vecs = graft.util.Tables.t(spark, Sf, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(x =>
        math.floor(x.toDouble * 1000.0 + 0.5).toLong))
    val d = vecs.head.length
    val n = vecs.length
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val varqs = (0 until d).map { i =>
      val s = vecs.map(v => BigInt(v(i))).sum
      val s2 = vecs.map(v => BigInt(v(i)) * BigInt(v(i))).sum
      (s, (n.toDouble * s2.toDouble - s.toDouble * s.toDouble) /
        (n.toDouble * n.toDouble))
    }
    val tv = varqs.map(v => dec8(v._2)).sum
    (0 until d).foreach { i =>
      val (s, vq) = varqs(i)
      val (m, v, sh) = rows(i.toLong)
      assert(m === rr(s.toDouble / n / 1000.0), s"dim $i mean")
      assert(v === rr(vq / 1e6), s"dim $i var")
      assert(sh === rr(vq / tv.toDouble), s"dim $i share")
    }
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 0.01)
  }

  test("calibrationBins: reliability table matches a sequential fold; " +
       "bins partition the corpus") {
    val rows = Text.calibrationBins(spark, Sf).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("avg_score"),
          r.getAs[Double]("obs_rate"), r.getAs[Double]("gap")))).toMap
    val docs = graft.util.Tables.t(spark, Sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getString(1) == "en", r.getString(2)))
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val scored = docs.map { case (en, t) =>
      val th = (t.length - t.replace("th", "").length) / 2
      val stops = "\\bthe\\b|\\band\\b|\\bis\\b".r.findAllIn(t).length
      val p = math.min(1.0, (th + stops).toDouble * 100.0 / t.length / 6.0)
      (math.min(9L, math.floor(p * 10.0).toLong), p, en)
    }
    val byBin = scored.groupBy(_._1)
    assert(rows.keySet === byBin.keySet)
    assert(rows.values.map(_._1).sum === docs.length.toLong)
    byBin.foreach { case (b, xs) =>
      val n = xs.length
      val sp = xs.map(x => BigDecimal(x._2)
        .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
      val ne = xs.count(_._3)
      val (gn, gs, go, gg) = rows(b)
      assert(gn === n.toLong, s"bin $b n")
      assert(gs === rr(sp.toDouble / n), s"bin $b score")
      assert(go === rr(ne.toDouble / n), s"bin $b rate")
      assert(gg === rr(math.abs(sp.toDouble / n - ne.toDouble / n)), s"bin $b gap")
    }
  }

  test("llrCollocations: the 2x2 G statistic matches a sequential fold " +
       "for every returned bigram") {
    val rows = Text.llrCollocations(spark, Sf, 20).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
                 r.getAs[Long]("n_pair"), r.getAs[Double]("llr")))
    assert(rows.length === 20)
    val pairs = docsRaw().values.flatMap { t =>
      t.toLowerCase.split(" ", -1).filter(_.nonEmpty).sliding(2)
        .collect { case Array(a, b) => (a, b) }
    }.toSeq
    val nn = pairs.length.toLong
    val big = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val lft = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rgt = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def llr(w1: String, w2: String): Double = {
      val k11 = big((w1, w2)); val r1 = lft(w1); val c1 = rgt(w2)
      val cells = Seq((k11, r1, c1), (r1 - k11, r1, nn - c1),
                      (c1 - k11, nn - r1, c1), (nn - r1 - c1 + k11, nn - r1, nn - c1))
      2.0 * cells.map { case (k, r, c) =>
        if (k > 0) k.toDouble * math.log(k.toDouble * nn / (r.toDouble * c)) else 0.0
      }.sum
    }
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    rows.foreach { case ((w1, w2), np, g) =>
      assert(np === big((w1, w2)), s"($w1,$w2) count")
      assert(g === rr(llr(w1, w2)), s"($w1,$w2) llr")
    }
    // the returned set IS the top-20 under (r4 llr desc, w1, w2)
    val all = big.keys.toSeq
      .map { case (a, b) => ((a, b), rr(llr(a, b))) }
      .sortBy { case ((a, b), g) => (-g, a, b) }.take(20).map(_._1)
    assert(rows.map(_._1).toSeq === all)
  }

  test("customerMigration: transition matrix matches a sequential ledger; " +
       "only consecutive-month transitions count") {
    val rows = Insights.customerMigration(spark, Sf).collect()
      .map(r => (r.getAs[String]("class_from"), r.getAs[String]("class_to")) ->
        r.getAs[Long]("n_transitions")).toMap
    val cm = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_custkey"),
              (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mi"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    def cls(n: Int) = if (n >= 3) "heavy" else if (n == 2) "regular" else "light"
    val exp = scala.collection.mutable.Map.empty[(String, String), Long]
    cm.keys.groupBy(_._1).foreach { case (_, ks) =>
      val months = ks.map(_._2).toSeq.sorted
      months.sliding(2).foreach {
        case Seq(a, b) if b == a + 1 =>
          val k = (cls(cm((ks.head._1, a))), cls(cm((ks.head._1, b))))
          exp(k) = exp.getOrElse(k, 0L) + 1
        case _ =>
      }
    }
    assert(rows === exp.toMap)
  }

  test("hourlyProfile: cells, margins and residuals match a sequential " +
       "fold over epoch-us integer calendar math") {
    val rows = Insights.hourlyProfile(spark, Sf).collect()
      .map(r => (r.getAs[Long]("dow"), r.getAs[Long]("hour")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("expected"),
          r.getAs[Double]("chi2_contrib")))).toMap
    val ts = graft.util.Tables.events(spark, Sf)
      .select(col("ts_us")).collect().map(_.getLong(0))
    val cells = ts.groupBy(t => (((t / 86400000000L) + 3) % 7,
                                 (t / 3600000000L) % 24))
      .view.mapValues(_.size.toLong).toMap
    assert(rows.keySet === cells.keySet)
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val tot = ts.length.toDouble
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    cells.foreach { case (k @ (d, h), n) =>
      val e = rt(d).toDouble * ct(h).toDouble / tot
      val (gn, ge, gc) = rows(k)
      assert(gn === n, s"cell $k")
      assert(ge === rr(e), s"cell $k expected")
      assert(gc === rr((n - e) * (n - e) / e), s"cell $k chi2")
    }
  }

  // ---- round-9m: resampling, ordered alternatives, snapshot audit ----

  test("poissonBootstrap: replicate means match a sequential hash fold; " +
       "the CI brackets the full-sample mean with a sane width") {
    val r = Insights.poissonBootstrap(spark, Sf, 100).collect().head
    val rows = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_orderkey"),
              floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    def w(k: Long, rep: Int): Long = {
      val u = (((k * 2654435761L + rep * 40503L + 7L) % 1048576L + 1048576L)
        % 1048576L).toDouble / 1048576.0
      if (u < 0.36787944117144233) 0L else if (u < 0.7357588823428847) 1L
      else if (u < 0.9196986029286058) 2L else if (u < 0.9810118431238462) 3L
      else if (u < 0.9963401531726563) 4L else 5L
    }
    val means = (0 until 100).map { rep =>
      var (swx, sw) = (BigInt(0), 0L)
      rows.foreach { case (k, x) =>
        val wt = w(k, rep); swx += BigInt(wt * x); sw += wt
      }
      (rep, swx.toDouble / sw)
    }
    val sorted = means.sortBy { case (rep, m) => (m, rep) }.map(_._2)
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_replicates") === 100L)
    assert(r.getAs[Double]("ci_lo") === rr(sorted(2) / 100.0))
    assert(r.getAs[Double]("ci_hi") === rr(sorted(97) / 100.0))
    val fullMean = rows.map(x => BigInt(x._2)).sum.toDouble / rows.length
    assert(r.getAs[Double]("mean_value") === rr(fullMean / 100.0))
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("mean_value"))
    assert(r.getAs[Double]("ci_hi") > r.getAs[Double]("mean_value"))
    // bootstrap SE should be within 3x of the analytic sigma/sqrt(n)
    val n = rows.length
    val s2 = rows.map(x => BigInt(x._2) * BigInt(x._2)).sum.toDouble / n -
      fullMean * fullMean
    val analytic = math.sqrt(s2 / n) / 100.0
    val se = r.getAs[Double]("se")
    assert(se > analytic / 3.0 && se < analytic * 3.0)
  }

  test("pageTrend: L and rank sums match a sequential fold over complete " +
       "year blocks only") {
    val r = Insights.pageTrend(spark, Sf).collect().head
    val cells = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("q"))
      .agg(sum(graft.util.Tables.money(col("o_totalprice"))).as("rev"))
      .collect()
      .map(x => (x.getInt(0), x.getInt(1),
                 BigDecimal(x.getAs[java.math.BigDecimal]("rev"))))
    val byYear = cells.groupBy(_._1).filter(_._2.length == 4)
    val b = byYear.size
    var l = 0L
    val rj = scala.collection.mutable.Map.empty[Int, Long]
    byYear.values.foreach { qs =>
      qs.sortBy(x => (x._3, x._2)).zipWithIndex.foreach { case ((_, q, _), i0) =>
        rj(q) = rj.getOrElse(q, 0L) + (i0 + 1)
      }
    }
    (1 to 4).foreach(q => l += q * rj(q))
    assert(r.getAs[Long]("n_blocks") === b.toLong)
    assert(r.getAs[Long]("k_treatments") === 4L)
    assert(r.getAs[Long]("l_stat") === l)
    val z = (12.0 * l - 3.0 * b * 4 * 25) / math.sqrt(b * 16.0 * 5 * 15)
    assert(r.getAs[Double]("z") === math.floor(z * 10000.0 + 0.5) / 10000.0)
  }

  test("snapshotReconcile: the audit identity holds and matches the two " +
       "as-of views; signup streams never remove keys") {
    val r = graft.operators.Warehouse.snapshotReconcile(spark, Sf).collect().head
    val (n1, n2, add, rem, chg, unch) = (r.getAs[Long]("n_t1"),
      r.getAs[Long]("n_t2"), r.getAs[Long]("n_added"), r.getAs[Long]("n_removed"),
      r.getAs[Long]("n_changed"), r.getAs[Long]("n_unchanged"))
    assert(n2 === n1 - rem + add)
    assert(n1 === rem + chg + unch)
    assert(rem === 0L, "signup-only SCD2 cannot drop keys")
    val a = graft.operators.Warehouse.scd2AsOf(spark, Sf, 1704844800000000L)
      .select(col("user_id"), col("event_id")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val bb = graft.operators.Warehouse.scd2AsOf(spark, Sf, 1705276800000000L)
      .select(col("user_id"), col("event_id")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(n1 === a.size.toLong); assert(n2 === bb.size.toLong)
    assert(add === (bb.keySet -- a.keySet).size.toLong)
    assert(chg === a.count { case (k, v) => bb.get(k).exists(_ != v) }.toLong)
    assert(unch === a.count { case (k, v) => bb.get(k).contains(v) }.toLong)
  }

  // ---- round-9n: regression diagnostics + robust statistics ----

  private def dailyFit(): (Array[(Long, Long)], Double, Double, Double, Double) = {
    val daily = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("y"))
      .orderBy("d").collect()
      .map(x => (x.getAs[java.sql.Date]("d").toLocalDate, x.getLong(1)))
    val d0 = daily.head._1
    val pts = daily.map { case (d, y) => (d.toEpochDay - d0.toEpochDay, y) }
    val n = pts.length
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val b = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
            (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val my = sy.toDouble / n
    val mx = sx.toDouble / n
    val sxxc = (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) / n
    (pts, b, my, mx, sxxc)
  }

  test("cooksDistance: top-10 influence matches a sequential closed-form " +
       "fold; D balances leverage against residual") {
    val got = Insights.cooksDistance(spark, Sf, 10).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
                 r.getAs[Double]("cooks_d"), r.getAs[Double]("leverage")))
    val (pts, b, my, mx, sxxc) = dailyFit()
    val n = pts.length
    val d0 = graft.util.Tables.t(spark, Sf, "orders")
      .agg(min(col("o_orderdate").cast("date"))).collect().head
      .getAs[java.sql.Date](0).toLocalDate
    val resid = pts.map { case (x, y) =>
      val e = y.toDouble - (my + b * (x.toDouble - mx))
      val h = 1.0 / n + (x.toDouble - mx) * (x.toDouble - mx) / sxxc
      (x, e, h)
    }
    val s2 = resid.map(r => dec8(r._2 * r._2)).sum.toDouble / (n - 2)
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val exp = resid.map { case (x, e, h) =>
      (d0.plusDays(x).toString, rr(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))),
       rr(h))
    }.sortBy { case (d, dd, _) => (-dd, d) }.take(10)
    assert(got.toSeq === exp.toSeq)
  }

  test("predictionInterval: the one-step-ahead interval matches the " +
       "closed form and brackets the forecast") {
    val r = Insights.predictionInterval(spark, Sf).collect().head
    val (pts, b, my, mx, sxxc) = dailyFit()
    val n = pts.length
    val sse = pts.map { case (x, y) =>
      val e = y.toDouble - (my + b * (x.toDouble - mx)); dec8(e * e)
    }.sum.toDouble
    val s = math.sqrt(sse / (n - 2))
    val x0 = (pts.map(_._1).max + 1).toDouble
    val yhat = my + b * (x0 - mx)
    val sep = s * math.sqrt(1.0 + 1.0 / n + (x0 - mx) * (x0 - mx) / sxxc)
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_days") === n.toLong)
    assert(r.getAs[Double]("forecast") === rr(yhat / 100.0))
    assert(r.getAs[Double]("pi_lo") === rr((yhat - 1.959963985 * sep) / 100.0))
    assert(r.getAs[Double]("pi_hi") === rr((yhat + 1.959963985 * sep) / 100.0))
    assert(r.getAs[Double]("pi_lo") < r.getAs[Double]("forecast"))
    assert(r.getAs[Double]("pi_hi") > r.getAs[Double]("forecast"))
  }

  test("trimmedMean: exact two-sided trim matches a sequential sort-based " +
       "fold and sits between median-ish robustness and the raw mean") {
    val rows = Insights.trimmedMean(spark, Sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_trimmed_each"),
          r.getAs[Double]("trimmed_mean")))).toMap
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .select(col("l_returnflag"),
              floor(col("l_quantity") * 100.0 + 0.5).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    li.groupBy(_._1).foreach { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      val t = n / 20
      val kept = sorted.slice(t, n - t)
      val (gn, gt, gm) = rows(g)
      assert(gn === n.toLong, s"$g n")
      assert(gt === t.toLong, s"$g trim")
      assert(gm === rr(kept.map(BigInt(_)).sum.toDouble / kept.length / 100.0),
             s"$g mean")
    }
  }

  test("cliffsDelta: delta ties out against mannWhitney's doubled U and " +
       "against a direct pairwise driver fold") {
    val r = Insights.cliffsDelta(spark, Sf).collect().head
    val mw = Insights.mannWhitney(spark, Sf).collect().head
    val (na, nb) = (mw.getAs[Long]("n_a"), mw.getAs[Long]("n_b"))
    val u2 = mw.getAs[Long]("u2_a")
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(r.getAs[Long]("n_a") === na)
    assert(r.getAs[Long]("n_b") === nb)
    assert(r.getAs[Double]("cliffs_delta") ===
      rr(u2.toDouble / (na.toDouble * nb.toDouble) - 1.0))
    // direct pairwise check on the value-grain histogram (exact)
    val vals = graft.util.Tables.t(spark, Sf, "orders")
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"),
              (col("o_orderpriority") === "1-URGENT").cast("int"))
      .collect().map(x => (x.getLong(0), x.getInt(1) == 1))
    val aH = vals.filter(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val bH = vals.filterNot(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var (gt, lt) = (BigInt(0), BigInt(0))
    val bSorted = bH.toSeq.sortBy(_._1)
    aH.foreach { case (va, ca) =>
      bSorted.foreach { case (vb, cb) =>
        if (va > vb) gt += BigInt(ca) * cb else if (va < vb) lt += BigInt(ca) * cb
      }
    }
    val delta = (gt - lt).toDouble / (na.toDouble * nb.toDouble)
    assert(math.abs(r.getAs[Double]("cliffs_delta") - delta) < 2e-4)
    assert(r.getAs[String]("magnitude") === "negligible")
  }

  // ---- round-9o: ML feature engineering + relationship profiling ----

  test("pitFeatures: strictly-prior expanding features match a sequential " +
       "per-customer sweep; the current order NEVER leaks into itself") {
    val got = Insights.pitFeatures(spark, Sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[Long]("prior_n_orders"), r.getAs[Double]("prior_revenue"),
          Option(r.getAs[java.lang.Long]("days_since_prev")).map(_.toLong)))).toMap
    val orders = graft.util.Tables.t(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
              col("o_orderdate").cast("date").as("d"),
              floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
                 r.getAs[java.sql.Date]("d").toLocalDate, r.getLong(3)))
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    orders.groupBy(_._2).foreach { case (_, os) =>
      val sorted = os.sortBy(o => (o._3.toEpochDay, o._1))
      var (cnt, rev) = (0L, BigInt(0))
      var prev: Option[java.time.LocalDate] = None
      sorted.foreach { case (ok, _, d, cents) =>
        val (gn, gr, gd) = got(ok)
        assert(gn === cnt, s"order $ok prior count")
        assert(gr === rr(rev.toDouble / 100.0), s"order $ok prior revenue")
        assert(gd === prev.map(p => d.toEpochDay - p.toEpochDay), s"order $ok gap")
        cnt += 1; rev += cents; prev = Some(d)
      }
    }
    assert(got.size === orders.length)
  }

  test("targetEncodingLoo: encoding excludes the row's own target; " +
       "re-adding it recovers the category mean exactly") {
    val rows = Insights.targetEncodingLoo(spark, Sf).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Double]("quantity"),
                 r.getAs[Double]("loo_encoding")))
    assert(rows.nonEmpty)
    val li = graft.util.Tables.t(spark, Sf, "lineitem")
      .join(graft.util.Tables.t(spark, Sf, "part")
              .select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), floor(col("l_quantity") * 100.0 + 0.5).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val g = li.groupBy(_._1).view
      .mapValues(xs => (xs.map(v => BigInt(v._2)).sum, xs.size.toLong)).toMap
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    rows.foreach { case (b, q, loo) =>
      val (sg, ng) = g(b)
      val x = math.floor(q * 100.0 + 0.5).toLong // quantity was r4(cents/100)
      val expect =
        if (ng > 1) (sg - x).toDouble / (ng - 1) else {
          val s = li.map(v => BigInt(v._2)).sum; s.toDouble / li.size
        }
      assert(loo === rr(expect / 100.0), s"brand $b q $q")
      // the LOO identity: loo*(n-1) + x == category sum, up to the r4
      // rounding of loo amplified by (n-1): half-ulp = 0.5e-4 dollars =
      // 0.005 cents per count
      if (ng > 1)
        assert(math.abs(loo * 100.0 * (ng - 1) + x - sg.toDouble) <
          0.01 * (ng - 1) + 1.0)
    }
  }

  test("fkCardinality: per-edge profile matches sequential folds and " +
       "refIntegrity's orphan-free edges have zero childless mismatch") {
    val rows = graft.operators.Relational.fkCardinality(spark, Sf).collect()
      .map(r => r.getAs[String]("fk_edge") ->
        ((r.getAs[Long]("n_parents"), r.getAs[Long]("n_parents_with_children"),
          r.getAs[Long]("n_childless"), r.getAs[Long]("n_children"),
          r.getAs[Long]("min_children"), r.getAs[Long]("max_children")))).toMap
    assert(rows.size === 5)
    // spot-check the lineitem -> orders edge with a driver fold
    val per = graft.util.Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("nc"))
      .collect().map(_.getLong(1))
    val nOrders = graft.util.Tables.t(spark, Sf, "orders").count()
    val (np, npc, nc0, nch, mn, mx) = rows("lineitem -> orders")
    assert(np === nOrders)
    assert(npc === per.length.toLong)
    assert(nc0 === nOrders - per.length)
    assert(nch === per.sum)
    assert(mn === per.min); assert(mx === per.max)
    // structural identities on every edge
    rows.values.foreach { case (p, pc, cl, ch, lo, hi) =>
      assert(p === pc + cl); assert(lo <= hi); assert(ch >= pc * lo)
    }
  }

  // ---- round-9p: attribution, survey weighting, concentration ----

  test("shapleyAttribution: matches an exact sequential Shapley fold; " +
       "efficiency and symmetry axioms hold") {
    val rows = Insights.shapleyAttribution(spark, Sf).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Double]("shapley_conversions"),
          r.getAs[Double]("credit_share")))).toMap
    val ev = graft.util.Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byU = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bits = Map("view" -> 1, "click" -> 2, "signup" -> 4, "error" -> 8)
    val masks = byU.values.map { ts =>
      (bits.filter(b => ts(b._1)).values.sum, if (ts("purchase")) 1L else 0L)
    }.toSeq
    def v(s: Int): Long = masks.collect {
      case (m, c) if (m & s) == m => c }.sum
    val w24 = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val phis = bits.map { case (ch, b) =>
      val num = (0 until 16).filter(s => (s & b) == 0).map { s =>
        w24(Integer.bitCount(s)) * (v(s | b) - v(s))
      }.sum
      ch -> num.toDouble / 24.0
    }
    phis.foreach { case (ch, phi) =>
      assert(rows(ch)._1 === rr(phi), s"channel $ch")
      assert(rows(ch)._2 === rr(phi / (v(15) - v(0)).toDouble), s"$ch share")
    }
    // efficiency: credits sum to v(full) - v(empty)
    assert(math.abs(phis.values.sum - (v(15) - v(0))) < 1e-6)
    // shares sum to 1 up to rounding
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 0.001)
  }

  test("rakingIpf: three unrolled rounds match a sequential IPF; margins " +
       "approach the uniform targets monotonically") {
    val rows = Insights.rakingIpf(spark, Sf, 3).collect()
      .map(r => (r.getAs[String]("pr"), r.getAs[String]("st")) ->
        r.getAs[Double]("raked_weight")).toMap
    val cells = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2).toDouble))
    val n = cells.map(_._2).sum
    val prs = cells.map(_._1._1).distinct
    val sts = cells.map(_._1._2).distinct
    var w = cells.toMap
    def dec18(x: Double) =
      BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    (1 to 3).foreach { _ =>
      val rm = w.groupBy(_._1._1).view
        .mapValues(cs => cs.values.map(dec18).sum.toDouble).toMap
      w = w.map { case (k, v0) => k -> (v0 * (n / prs.size) / rm(k._1)) }
      val cm = w.groupBy(_._1._2).view
        .mapValues(cs => cs.values.map(dec18).sum.toDouble).toMap
      w = w.map { case (k, v0) => k -> (v0 * (n / sts.size) / cm(k._2)) }
    }
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    w.foreach { case (k, v0) => assert(rows(k) === rr(v0), s"cell $k") }
    // post-fit column margins ARE exact (the last scaling step); row
    // margins are within 1% of target (IPF geometric convergence)
    sts.foreach { s =>
      val m = w.collect { case ((_, s2), v0) if s2 == s => v0 }.sum
      assert(math.abs(m - n / sts.size) < 1e-6, s"col $s")
    }
    prs.foreach { p =>
      val m = w.collect { case ((p2, _), v0) if p2 == p => v0 }.sum
      assert(math.abs(m - n / prs.size) < 0.01 * (n / prs.size), s"row $p")
    }
  }

  test("lorenzPoints: decile shares match a sequential sorted fold; the " +
       "curve is convex and ends at exactly 1") {
    val rows = Insights.lorenzPoints(spark, Sf).collect()
      .map(r => r.getAs[Int]("decile") ->
        ((r.getAs[Long]("n_customers"), r.getAs[Double]("cum_revenue_share"))))
      .toMap
    val per = graft.util.Tables.t(spark, Sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("v"))
      .collect().map(_.getAs[Long]("v")).sorted
    val n = per.length
    val s = per.map(BigInt(_)).sum
    def rr(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    (1 to 10).foreach { d =>
      val k = d * n / 10
      val cum = per.take(k).map(BigInt(_)).sum
      val (gk, gs) = rows(d)
      assert(gk === k.toLong, s"decile $d k")
      assert(gs === rr(cum.toDouble / s.toDouble), s"decile $d share")
    }
    // convexity: increments nondecreasing (sorted ascending values)
    val shares = (1 to 10).map(rows(_)._2)
    val incs = (0.0 +: shares).sliding(2).map { case Seq(a, b) => b - a }.toSeq
    assert(incs === incs.sorted, "Lorenz curve must be convex")
    assert(shares.last === 1.0)
  }

  test("parDedup: crafted corpus — exact twins lose every paragraph, " +
       "short docs are one paragraph, partial tail chunks dedup too") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pardedup").toString
    val w25 = (1 to 25).map(i => s"w$i").mkString(" ") // 2 paragraphs: 20 + 5
    Seq(
      (1L, w25, "en", "s", 10L),
      (2L, w25, "en", "s", 10L),                  // exact twin: both pars dup
      (3L, "tiny doc here", "en", "s", 10L),      // < 20 words: ONE paragraph
      (4L, "tiny doc here", "en", "s", 10L),      // twin of the short doc
      (5L, ((1 to 20).map(i => s"w$i").mkString(" ")) + " unique tail words",
           "en", "s", 10L) // first par duplicates doc 1's, tail par unique
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Text.parDedup(spark, dir, 20).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_pars"), r.getAs[Long]("n_removed"),
          r.getAs[String]("kept_text")))).toMap
    assert(out(1L) === ((2L, 0L, w25)))              // first occurrence keeps all
    assert(out(2L) === ((2L, 2L, "")))               // twin loses both paragraphs
    assert(out(3L) === ((1L, 0L, "tiny doc here")))  // short doc = 1 paragraph
    assert(out(4L) === ((1L, 1L, "")))               // short twin fully removed
    // doc 5: 20-word prefix par duplicates doc 1's first paragraph; the
    // 3-word tail paragraph is unique and survives
    assert(out(5L) === ((2L, 1L, "unique tail words")))
  }

  test("dedupExactSubstr: crafted corpus — exact twins empty out, " +
       "shared prefixes trim, unique docs survive untouched") {
    // the sf fixtures contain no exact-duplicate texts, so the boundary
    // semantics are pinned on a crafted corpus instead
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("exactsubstr").toString
    Seq(
      (1L, "the quick brown fox jumps high", "en", "s", 30L),
      (2L, "the quick brown fox jumps high", "en", "s", 30L), // exact twin of 1
      (3L, "the quick brown dog sits low today", "en", "s", 34L), // shares "the quick brown" only
      (4L, "completely different words here entirely", "en", "s", 40L), // untouched
      (5L, "tiny doc", "en", "s", 8L) // < 3 words: no spans ever
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Text.dedupExactSubstr(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("kept_text")))).toMap
    // exact twins: every span duplicated -> fully removed
    assert(out(1L) === ((6L, "")))
    assert(out(2L) === ((6L, "")))
    // doc 3 shares exactly the span "the quick brown" (positions 0-2);
    // "quick brown dog" etc. are unique, so only words 0..2 go
    assert(out(3L) === ((3L, "dog sits low today")))
    // no shared span: untouched
    assert(out(4L) === ((0L, "completely different words here entirely")))
    // sub-3-word doc: span-free, kept verbatim
    assert(out(5L) === ((0L, "tiny doc")))
  }
}
