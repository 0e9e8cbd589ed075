package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece subword ENCODING — the third mainstream subword scheme next
  * to [[Bpe]] (merge-rule replay) and [[Unigram]] (Viterbi max-likelihood):
  * greedy longest-match-first segmentation against a fixed vocabulary,
  * with `##` marking continuation pieces (Wu et al. 2016, "Google's
  * Neural Machine Translation System", §3.1 — the tokenizer BERT ships).
  * Unlike BPE the encoder never looks at merge order, and unlike unigram
  * it never scores: at each position it takes the LONGEST vocabulary
  * piece that matches (head form at position 1, `##`-prefixed form
  * after), and a word with any unmatchable position collapses to the
  * single `[UNK]` token — whole-word rejection, exactly the HuggingFace
  * `WordPiece` semantics, not per-character fallback.
  *
  * Determinism: greedy longest-match has a unique answer by construction
  * (no tie to break — lengths are totally ordered), so the segmentation
  * replays verbatim in any SQL engine with nothing subtler than integer
  * comparisons; there is no float anywhere in the pipeline.
  *
  * Scale shape (same envelope as the other two tokenizers): everything
  * runs on the DISTINCT weighted vocabulary `(word, n)`, orders of
  * magnitude smaller than the corpus; the vocabulary join broadcasts a
  * few hundred pieces; the greedy walk is one codegen'd `aggregate` fold
  * per word — zero shuffle beyond the word-distinct groupBy the caller
  * already paid, state bounded by word length, never corpus size.
  */
object Wordpiece {

  /** Deterministic frequency-truncated vocabulary from a weighted word
    * list `(word, n)` — the fixture rule for the encode gate (WordPiece
    * vocabularies are trained like [[Bpe]]; the operator under test here
    * is the ENCODER, so the vocab construction is a simple replayable
    * cut): count every positioned substring of length 1..maxPieceLen in
    * its surface form (head pieces verbatim, continuation pieces
    * `##`-prefixed, weighted by word frequency, one event per occurrence
    * position), keep ALL single-character pieces (both forms — coverage:
    * any word over the observed alphabet stays segmentable) plus the
    * `topKeep` multi-character pieces by (count desc, piece asc).
    * Output: (piece).
    */
  def vocab(words: DataFrame, wordCol: String, weightCol: String,
            maxPieceLen: Int, topKeep: Int): DataFrame = {
    val w = words.select(col(wordCol).as("word"), col(weightCol).as("n"))
      .where(length(col("word")).between(1, Unigram.MaxWordLen))
    val occ = w.select(col("n"), explode(flatten(
      transform(sequence(lit(1), length(col("word"))), s =>
        transform(sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - s + 1)),
          l => when(s === 1, col("word").substr(s, l))
            .otherwise(concat(lit("##"), col("word").substr(s, l))))))).as("piece"))
      .groupBy("piece").agg(sum(col("n")).cast("long").as("c"))
    // content length: a ##-prefixed single char is still a single-char piece
    val clen = when(col("piece").startsWith("##"), length(col("piece")) - 2)
      .otherwise(length(col("piece")))
    occ.where(clen === 1).select("piece")
      .unionByName(occ.where(clen > 1)
        .orderBy(col("c").desc, col("piece")).limit(topKeep).select("piece"))
  }

  /** Greedy longest-match-first encode of a weighted word list `(word,
    * n)` against `vocabDf` (one `piece` column, `##` marking
    * continuations). Per word: candidate (start, len) windows join the
    * broadcast vocabulary in surface form; an in-row fold then walks the
    * word left to right taking the longest match at each position; any
    * stall rejects the whole word as `[UNK]`. Output: (word, n, pieces
    * '|'-joined, n_pieces).
    */
  def encode(words: DataFrame, wordCol: String, weightCol: String,
             vocabDf: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= Unigram.MaxWordLen,
      s"maxPieceLen must be in [1, ${Unigram.MaxWordLen}], got $maxPieceLen")
    val w = words.select(col(wordCol).as("word"), col(weightCol).as("n"))
      .where(length(col("word")).between(1, Unigram.MaxWordLen))
    val cand = w.select(col("word"), col("n"), explode(flatten(
      transform(sequence(lit(1), length(col("word"))), s =>
        transform(sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - s + 1)),
          l => struct(s.as("start"), l.as("plen"),
            when(s === 1, col("word").substr(s, l))
              .otherwise(concat(lit("##"), col("word").substr(s, l))).as("piece")))))).as("p"))
      .select(col("word"), col("n"), col("p.start"), col("p.plen"), col("p.piece"))
    val matched = cand
      .join(broadcast(vocabDf.select(col("piece").as("vp")).distinct()),
        col("piece") === col("vp"))
      .groupBy(col("word"), col("n"))
      .agg(collect_list(struct(col("start"), col("plen"))).as("ps"))
    // words with zero vocabulary matches anywhere still need an [UNK] row
    val withPs = w.join(matched.drop("n"), Seq("word"), "left")
      .withColumn("ps", coalesce(col("ps"),
        array().cast("array<struct<start:int,plen:int>>")))

    val lenW = length(col("word"))
    // longest match per start position (null = no piece matches here)
    val bests = transform(sequence(lit(1), lenW), s =>
      array_max(transform(filter(col("ps"), p => p.getField("start") === s),
        p => p.getField("plen"))))
    // greedy walk: ≤ len(word) steps (every step advances ≥ 1 char);
    // cur = -1 flags a stall -> whole-word [UNK]
    val toks = aggregate(
      sequence(lit(1), lenW),
      struct(lit(1).as("cur"), array().cast("array<string>").as("ts")),
      (acc, _) => {
        val cur = acc.getField("cur")
        val bl = element_at(col("bs"), cur)
        when(cur <= 0 || cur > lenW, acc).otherwise(
          when(bl.isNull, struct(lit(-1).as("cur"), acc.getField("ts").as("ts")))
            .otherwise(struct((cur + bl).as("cur"),
              concat(acc.getField("ts"), array(
                when(cur === 1, col("word").substr(cur, bl))
                  .otherwise(concat(lit("##"), col("word").substr(cur, bl))))).as("ts"))))
      },
      acc => when(acc.getField("cur") === lenW + 1, acc.getField("ts"))
        .otherwise(array(lit("[UNK]"))))
    withPs.withColumn("bs", bests).withColumn("toks", toks)
      .select(col("word"), col("n"),
        array_join(col("toks"), "|").as("pieces"),
        size(col("toks")).cast("long").as("n_pieces"))
  }
}
