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
