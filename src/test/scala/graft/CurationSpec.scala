package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation

class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  test("wordNgrams: distinct space-joined n-grams; short docs yield empty") {
    val out = docsDf((1L, "a b c d a b c"), (2L, "one two"), (3L, ""))
      .select(col("doc_id"), Curation.wordNgrams(col("text"), 3).as("ngs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(out(1L) == Set("a b c", "b c d", "c d a", "d a b")) // distinct: "a b c" appears twice
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("qualityFilter: each rule trips its own bit; clean doc keeps") {
    val good = ("the quick brown fox jumps over the lazy dog and then it " +
      "runs far away to the old red barn it likes") // 22 words, stopword-rich
    val df = docsDf(
      (1L, good),                                     // keep
      (2L, "short text here"),                        // too few words (bit 0), no stopwords (bit 3)
      (3L, good + " " + Seq.fill(12)("spam").mkString(" ")) // repetition: 12/34 spam > 30% (bit 4)
    )
    val out = Curation.qualityFilter(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("fail_mask"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) == (0L, true))
    assert((out(2L)._1 & Curation.FailTooFewWords) != 0 && (out(2L)._1 & Curation.FailNoStopwords) != 0)
    assert((out(3L)._1 & Curation.FailRepetition) != 0 && !out(3L)._2)
  }

  test("decontaminate: overlap counts exact, bench docs excluded, broadcast plan") {
    val train = docsDf(
      (1L, "alpha beta gamma delta epsilon"),  // shares "alpha beta gamma" + "beta gamma delta"
      (2L, "zeta eta theta iota"),             // no overlap
      (3L, "alpha beta gamma"))                // exactly the contaminated 3-gram
    val bench = docsDf((100L, "alpha beta gamma delta"))
    val out = Curation.decontaminate(train, bench, "doc_id", "text", 3)
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_overlap"), r.getAs[Boolean]("contaminated"))).toMap
    assert(rows(1L) == (3L, 2L, true))
    assert(rows(2L) == (2L, 0L, false))
    assert(rows(3L) == (1L, 1L, true))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      "corpus side must never shuffle for the join")
  }

  test("stratifiedSample: deterministic, exact bucket arithmetic, rate-bounded") {
    val df = spark.range(10000).select(col("id").as("doc_id"),
      when(col("id") % 3 === 0, "en").otherwise("de").as("lang"))
    val s1 = Curation.stratifiedSample(df, "doc_id", "lang", Map("en" -> 500), 250)
    val got = s1.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // re-running selects the identical set
    val got2 = Curation.stratifiedSample(df, "doc_id", "lang", Map("en" -> 500), 250)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == got2.toSet)
    // bucket arithmetic matches the driver-side restatement
    got.foreach { case (id, lang, b) =>
      assert(b == ((id % 1000003L) * 2654435761L % 1000000007L) % 1000L)
      assert(b < (if (lang == "en") 500 else 250))
    }
    // uniform hash: realized rates within 5 points of nominal
    val enRate = got.count(_._2 == "en").toDouble / 10000 * 3
    val deRate = got.count(_._2 == "de").toDouble / 10000 * 1.5
    assert(math.abs(enRate - 0.5) < 0.05 && math.abs(deRate - 0.25) < 0.05)
  }

  test("packSequences: two-level prefix sum equals the global running sum; chunkSpan-invariant") {
    // i*7 mod 199 is a permutation of 0..198 — distinct ids in scrambled order
    val df = docsDf((0 until 199).map(i =>
      (i.toLong * 7 % 199, Seq.fill(i % 17 + 1)("tok").mkString(" "))): _*)
    def run(span: Long) =
      Curation.packSequences(df, "doc_id", "text", budget = 16L, chunkSpan = span)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .sortBy(_._1)
    val a = run(8L); val b = run(1000000L)
    assert(a.toSeq == b.toSeq, "chunking must not change the global offsets")
    // offsets are the exclusive prefix sum in id order; pack/crosses consistent
    var cum = 0L
    a.foreach { case (_, n, start, pack, crosses) =>
      assert(start == cum); cum += n
      assert(pack == start / 16L)
      assert(crosses == (n > 0 && (start + n - 1) / 16L != pack))
    }
  }

  test("resampleWeighted: exact per-row multiplicity from the id hash; copy index dense") {
    val df = spark.range(2000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val out = Curation.resampleWeighted(df, "doc_id", "lang", Map("en" -> 2500, "de" -> 400), 1000)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byId = out.groupBy(_._1)
    byId.foreach { case (id, rows) =>
      val w = if (rows.head._2 == "en") 2500L else 400L
      val bucket = (id % 1000003L) * 2654435761L % 1000000007L % 1000L
      val expected = w / 1000L + (if (bucket < w % 1000L) 1L else 0L)
      assert(rows.length == expected, s"id $id")
      assert(rows.map(_._3).sorted.toSeq == (0L until expected), s"copy indices for $id")
    }
    // realized mixture tracks the weights: en ~2.5x, de ~0.4x
    val en = out.count(_._2 == "en") / 1000.0; val de = out.count(_._2 == "de") / 1000.0
    assert(math.abs(en - 2.5) < 0.15 && math.abs(de - 0.4) < 0.1)
  }

  test("semDeDup: drops exactly the rows with a smaller-id similar neighbor; equi-key anti join") {
    import graft.ops.Dedup
    // cluster 0: ids 1,2 identical direction (sim 1.0), id 3 orthogonal;
    // cluster 1: id 4 alone; id 5 similar to id 1 but in another cluster
    val rows = Seq(
      (1L, 0, Array(1f, 0f, 0f)), (2L, 0, Array(2f, 0f, 0f)), (3L, 0, Array(0f, 1f, 0f)),
      (4L, 1, Array(0f, 0f, 1f)), (5L, 1, Array(1f, 0.01f, 0f)))
    val df = rows.toDF("vec_id", "cl", "embedding")
    val kept = Dedup.semDeDup(df, "vec_id", "embedding", col("cl"), 0.9)
    assert(kept.collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L, 5L))
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "cluster id must be extracted as the join's equi key:\n" + plan)
  }

  test("vocabTop: counts and (count desc, token) order") {
    val df = docsDf((1L, "b a a c C b a"), (2L, "a b x"))
    val out = Curation.vocabTop(df, "text", 3).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 4L), ("b", 3L), ("c", 2L))) // "C" lowercased into c
  }

  test("packBinsFfd: no-split packs within budget, every doc once, beats naive padding") {
    import org.apache.spark.sql.functions.col
    // token counts == word counts for plain words; craft lengths 6,5,4,3,2
    def doc(n: Int): String = Seq.fill(n)("word").mkString(" ")
    val rows = (0 until 40).map { i => (i.toLong, doc(2 + i % 5)) }
    val df = rows.toDF("doc_id", "text").repartition(7)
    val out = Curation.packBinsFfd(df, "doc_id", "text", budget = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc assigned exactly once
    assert(out.map(_._1).sorted.toSeq == (0L until 40L).toSeq)
    // no pack exceeds the budget; packs dense from 0
    val byPack = out.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(byPack.values.forall(_ <= 8L))
    assert(byPack.keys.min == 0L && byPack.keys.max == byPack.size - 1L)
    // slots are dense per pack
    out.groupBy(_._3).foreach { case (_, docs) =>
      assert(docs.map(_._4).sorted.toSeq == docs.indices.map(_.toLong))
    }
    // FFD efficiency: total tokens 160, budget 8 → ≥ 20 packs; FFD should
    // land well under the one-doc-per-pack naive (40) — and in fact under
    // the first-fit-in-id-order bound for this mix
    assert(byPack.size <= 22, s"packs=${byPack.size}")
    // deterministic across partitionings AND across two-level chunk
    // widths (chunkSpan=4 forces many (class, chunk) windows; the lifted
    // rank must equal the global per-class id rank bit for bit)
    val again = Curation.packBinsFfd(rows.toDF("doc_id", "text").coalesce(1),
      "doc_id", "text", budget = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val chunked = Curation.packBinsFfd(rows.toDF("doc_id", "text").repartition(5),
      "doc_id", "text", budget = 8, chunkSpan = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sortBy(_._1).toSeq == chunked.sortBy(_._1).toSeq)
    // over-budget docs fail fast
    val ex = intercept[IllegalArgumentException] {
      Curation.packBinsFfd(Seq((1L, doc(9))).toDF("doc_id", "text"), "doc_id", "text", 8)
    }
    assert(ex.getMessage.contains("chunk before packing"))
    // the slot and base tables join BROADCAST (the scaladoc's "corpus
    // never shuffles for assignment" claim): two broadcast joins, no SMJ
    val plan = Curation.packBinsFfd(df, "doc_id", "text", budget = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), plan.linesIterator.take(3).mkString("\n"))
  }

  test("packBinsFfd invariants hold on randomized corpora (seeded)") {
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    for (seed <- Seq(1, 7, 42, 99, 1234)) {
      val rnd = new scala.util.Random(seed)
      val budget = 8 + rnd.nextInt(24)                    // 8..31
      val rows = (0 until 60).map(i => (i.toLong, doc(1 + rnd.nextInt(budget.min(12)))))
      val lens = rows.map { case (id, t) => id -> t.count(_ == 'w').toLong }.toMap
      val out = Curation.packBinsFfd(rows.toDF("doc_id", "text").repartition(5),
        "doc_id", "text", budget = budget.toLong, chunkSpan = 7L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // every doc exactly once, with its true length
      assert(out.map(_._1).sorted.toSeq == (0L until 60L).toSeq, s"seed=$seed")
      out.foreach { case (id, n, _, _) => assert(n == lens(id), s"seed=$seed id=$id") }
      // capacity respected, pack ids dense from 0, slots dense per pack
      val byPack = out.groupBy(_._3)
      assert(byPack.values.forall(_.map(_._2).sum <= budget), s"seed=$seed capacity")
      assert(byPack.keys.min == 0L && byPack.keys.max == byPack.size - 1L, s"seed=$seed dense")
      byPack.foreach { case (p, docs) =>
        assert(docs.map(_._4).sorted.toSeq == docs.indices.map(_.toLong), s"seed=$seed pack=$p slots")
      }
      // deterministic across chunk widths
      val again = Curation.packBinsFfd(rows.toDF("doc_id", "text").coalesce(1),
        "doc_id", "text", budget = budget.toLong, chunkSpan = 4096L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq, s"seed=$seed determinism")
    }
  }

  test("oovRate: head-vocab hits are in, rare tokens are oov, empty doc is 0/0") {
    // corpus: 'alpha'/'beta' dominate; topN=2 vocab = {alpha, beta}
    val df = docsDf(
      (1L, "alpha beta alpha"), (2L, "alpha beta"), (3L, "alpha zeta qux"),
      (4L, ""), (5L, "beta beta nu"))
    val out = Curation.oovRate(df, "doc_id", "text", topN = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(3L)._1 == 3L && out(3L)._2 == 2L)                 // zeta, qux oov
    assert(out(4L) == ((0L, 0L, 0.0)))                           // empty: 0/0 -> 0
    assert(out(5L)._2 == 1L)                                     // nu oov
    // q20 grid: 2/3 rounded on the binary grid
    assert(out(3L)._3 == math.round(2.0 / 3.0 * 1048576.0) / 1048576.0)
    val ex = intercept[IllegalArgumentException] {
      Curation.oovRate(df, "doc_id", "text", topN = 0)
    }
    assert(ex.getMessage.contains("topN"))
  }

  test("blocklistFilter: token-grain match (no substring hits), case-normalized, audit columns") {
    val df = docsDf(
      (1L, "clean text here"),
      (2L, "contains BADWORD twice badword"),
      (3L, "assess association passes"),       // superstrings must NOT match
      (4L, ""))
    val out = Curation.blocklistFilter(df, "doc_id", "text", Seq("BadWord", "ass"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((0L, true)))
    assert(out(2L) == ((2L, false)))    // case-insensitive, counted per occurrence
    assert(out(3L) == ((0L, true)))     // "assess" is not "ass" at token grain
    assert(out(4L) == ((0L, true)))
    // phrases match only ADJACENT tokens, at their own gram length
    val p = docsDf(
      (1L, "the slow key turns"),       // phrase hit
      (2L, "slow and key apart"),       // words present but not adjacent
      (3L, "slow key slow key"))        // two occurrences
    val pout = Curation.blocklistFilter(p, "doc_id", "text", Seq("Slow Key"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(pout(1L) == ((1L, false)))
    assert(pout(2L) == ((0L, true)))
    assert(pout(3L) == ((2L, false)))
    val ex = intercept[IllegalArgumentException] {
      Curation.blocklistFilter(df, "doc_id", "text",
        Seq("a b c d e f g h i"))       // 9-word phrase over the cap
    }
    assert(ex.getMessage.contains("phrases longer"))
  }

  test("snapshotDiff: added/removed/changed classified; unchanged dropped; dup ids fail") {
    val ref = docsDf((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
    val cur = docsDf((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta"), (5L, "epsilon"))
    val out = Curation.snapshotDiff(ref, cur, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 5L -> "added")) // 1 and 4 unchanged → absent
    // the dup guard rides inside the single pass: it fires on EXECUTION
    // (no pre-flight jobs), surfacing as a raise_error in the aggregate
    val ex = intercept[Exception] {
      Curation.snapshotDiff(docsDf((1L, "a"), (1L, "b")), cur, "doc_id", "text").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("id-unique")))
  }

  test("psiDrift: identical snapshots ~0, a shifted snapshot alarms, empty bins stay finite") {
    import org.apache.spark.sql.functions.{col, lit}
    val ref = (0 until 1000).map(i => i.toDouble / 1000).toDF("s")
    def psi(cur: org.apache.spark.sql.DataFrame): Double =
      Curation.psiDrift(ref, cur, col("s"), col("s"), nBins = 8)
        .collect().map(_.getDouble(3)).sum
    // same distribution: PSI well under the 0.1 "stable" reading
    assert(math.abs(psi((0 until 1000).map(i => i.toDouble / 1000).toDF("s"))) < 0.01)
    // hard shift: all current mass above the reference median
    val shifted = (0 until 1000).map(i => 0.5 + i.toDouble / 2000).toDF("s")
    assert(psi(shifted) > 0.25)
    // degenerate current (one value): 7 empty bins, Laplace keeps terms finite
    val onePoint = Seq.fill(100)(0.99).toDF("s")
    val terms = Curation.psiDrift(ref, onePoint, col("s"), col("s"), 8)
      .collect().map(_.getDouble(3))
    assert(terms.length == 8 && terms.forall(t => !t.isNaN && !t.isInfinite))
    // non-power-of-two bins rejected (binary-fraction cut contract)
    val ex = intercept[IllegalArgumentException] {
      Curation.psiDrift(ref, ref, col("s"), col("s"), nBins = 10)
    }
    assert(ex.getMessage.contains("power of two"))
  }

  test("curationLog: one outcome per doc, stage-priority order, cap via the heap selection") {
    val good = "the quick brown fox jumps over the lazy dog and then it " +
      "runs far away to the old red barn it likes"
    val good2 = good + " again and again the story goes on with more words"
    val bad = "short text here" // fails quality (words + stopwords)
    val rows = Seq(
      (1L, "en", good),   // keeper of the good-fp group
      (2L, "en", good),   // exact_dup (1 is the smaller surviving id)
      (3L, "en", bad),    // quality:words (bit 0 beats bit 3 in attribution)
      (4L, "en", bad),    // quality too — a FAILED dup never reads exact_dup
      (5L, "de", good2),  // keeper, own key
      (6L, "de", good)    // survivor, DIFFERENT key than 1 — keeps (dedup is key-blind)
    ).toDF("doc_id", "lang", "text")
    val out = Curation.curationLog(rows, "doc_id", "text", "lang", capN = 2)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(3), r.getString(4))).toMap
    assert(out(1L) == (true, "kept"))
    assert(out(2L) == (false, "exact_dup"))
    assert(out(3L) == (false, "quality:words"))
    assert(out(4L) == (false, "quality:words"))
    assert(out(5L) == (true, "kept"))
    // 6 shares 1's text: the fp group's keeper is 1 (smallest id), so 6 is
    // an exact_dup even though it sits under another key
    assert(out(6L) == (false, "exact_dup"))
    assert(out.size == 6)
    // capN = 1 on a 2-surviving-keeper key drops the larger (h53, id)
    val capped = Curation.curationLog(
        Seq((1L, "en", good), (5L, "en", good2)).toDF("doc_id", "lang", "text"),
        "doc_id", "text", "lang", capN = 1)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(capped.values.toSeq.sorted == Seq("kept", "key_cap").sorted)
  }
}
