package graft

import org.apache.spark.sql.functions._
import graft.operators.Text

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
