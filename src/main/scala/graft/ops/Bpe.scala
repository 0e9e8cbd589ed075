package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning — the tokenizer-training stage of
  * an LLM data pipeline, Spark-first: each merge round is ONE distributed
  * weighted pair-count over the distinct-word working set (map-side
  * partial aggregation, the shuffle carries (pair, count) rows only)
  * followed by a driver-side argmax and a codegen'd per-row merge
  * application ([[graft.expressions.BpeMerge]]). Classic char-level BPE
  * (Sennrich et al. 2016) without the end-of-word marker: symbols start
  * as the word's characters, counts are weighted by word frequency, each
  * round merges the most frequent adjacent pair (ties broken by
  * (count desc, a, b) so the learned table is corpus-deterministic).
  *
  * Scale: the working set is the DISTINCT vocabulary (Zipf: orders of
  * magnitude smaller than the corpus — the corpus itself is scanned once
  * to build it); R rounds = R scans of that vocabulary. The round-r scan
  * re-applies the r learned merges through a chain of codegen'd
  * expressions rather than materializing intermediate symbol tables —
  * O(R²·vocab) symbol work total, the standard trade for R ≤ a few
  * thousand; checkpoint the symbols frame every few hundred rounds if
  * the plan depth ever matters.
  */
object Bpe {

  /** Adjacent symbol pairs of a round's symbol arrays. */
  private def pairsOf(syms: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"), element_at(syms, i + 1).as("b"))))

  /** Learn `rounds` merges from a weighted vocabulary `(word, n)`.
    * Returns (round, a, b, weighted count) in learn order; stops early if
    * no adjacency remains.
    *
    * Corpus regime: like [[Unigram.learn]], the input is the DISTINCT
    * weighted vocabulary and each round's shuffle carries (pair, count)
    * rows only — but the per-round pair explode scales with total symbol
    * count across that vocabulary, the one unbounded dimension.
    * Tokenizer training is a sampled-corpus job by convention; hand in a
    * sampled or frequency-cut vocabulary at web scale and alarm on
    * [[pairRows]] before launching.
    */
  def learn(vocab: DataFrame, wordCol: String, weightCol: String,
            rounds: Int): Seq[(Int, String, String, Long)] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // explicit per-position substrings (NOT split(w, "")): engine-portable
    // char list, and the empty-word degenerate is filtered rather than
    // tripping sequence(1, 0)'s descending surprise
    var syms = vocab.where(length(col(wordCol)) > 0)
      .select(col(weightCol).as("n"),
        transform(sequence(lit(1), length(col(wordCol))),
          i => col(wordCol).substr(i, lit(1))).as("syms"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val top = syms.select(col("n"), explode(pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, c))
        syms = syms.withColumn("syms", graft.functions.bpe_merge(col("syms"), a, b))
        r += 1
      }
    }
    merges.toSeq
  }

  /** Size observer for [[learn]]'s per-round pair explode (the repo's
    * no-silent-caps companion): Σ over the vocabulary of (word length −
    * 1) — the round-1 adjacency volume, an upper bound for every later
    * round (merges only shrink symbol arrays). One narrow aggregation,
    * no explode.
    */
  def pairRows(vocab: DataFrame, wordCol: String): Long = {
    val r = vocab.where(length(col(wordCol)) > 1)
      .agg(sum(length(col(wordCol)).cast("long") - 1L)).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Apply a learned merge table to a symbol-array column, in learn order
    * (BPE application replays merges by rank).
    */
  def applyMerges(df: DataFrame, symsCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(df) { case (d, (a, b)) =>
      d.withColumn(symsCol, graft.functions.bpe_merge(col(symsCol), a, b))
    }
}
