package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer training — the
  * other mainstream subword algorithm next to [[Bpe]] (Kudo 2018:
  * "Subword Regularization", the algorithm behind SentencePiece's
  * `--model_type=unigram`): start from a large candidate vocabulary,
  * alternate E (segment every word with the current token probabilities)
  * and M (re-estimate token frequencies from the segmentations), pruning
  * low-value tokens each round. This implementation is the deterministic
  * HARD-EM (Viterbi) variant: the E-step assigns each word its single
  * best segmentation — the choice that makes every step of training
  * replayable verbatim in any SQL engine, which soft-EM's
  * forward-backward lattice (a sum of products of doubles) would not be.
  *
  * Exactness across engines — the whole design reduces to integers:
  *  - token log-probabilities live on the q14 grid:
  *    `qln(c) = round(ln(c)·16384)` of an INTEGER count. Java's
  *    `Math.log` and DuckDB's `ln` agree bitwise on this grid for every
  *    count probed to 3·10⁶ (nearest half-boundary distance ~1e-7 vs a
  *    ~1e-11 libm divergence window), so both engines derive identical
  *    integer weights `w(tok) = qln(c) − qln(C)`;
  *  - the Viterbi DP compares packed BIGINT composites, never doubles:
  *    `cell = (score + OFF)·4096 + (63 − k)·64 + (63 − bp)` orders
  *    lexicographically by (higher score, fewer pieces, longer final
  *    piece) under plain integer max — the deterministic tie-break that
  *    makes the argmax segmentation unique. All packed values are
  *    non-negative, so div/mod decode identically everywhere.
  *
  * Scale shape (same envelope as [[Bpe.learn]]): the working set is the
  * DISTINCT weighted vocabulary, orders of magnitude smaller than the
  * corpus; each EM round is one broadcast join (token table: a few
  * hundred rows) against the per-word piece explosion plus one
  * vocabulary-sized recount shuffle. The per-word DP runs inside a
  * codegen'd `aggregate` fold — zero extra shuffle, state bounded by
  * word length (capped at [[MaxWordLen]]), never corpus size.
  */
object Unigram {

  /** Packed-score offset: keeps `score + OFF` non-negative (score ≥
    * −MaxWordLen · qln(C) ≈ −19M for any realistic corpus total).
    */
  val Off = 100000000L

  /** Words longer than this are excluded from training and encoding (the
    * packed bp/k fields carry 6 bits). Natural-language tokens virtually
    * never exceed it; URLs and digit runs that do are exactly what a
    * subword vocabulary should not be learned from.
    */
  val MaxWordLen = 32

  /** `round(ln(c)·16384)` — the q14 integer log grid (see scaladoc). */
  def qln(c: Column): Column =
    round(log(c.cast("double")) * 16384.0, 0).cast("long")

  /** Candidate vocabulary from a weighted word list `(word, n)`: counts
    * of every substring of length 1..maxPieceLen (weighted by word
    * frequency, one event per occurrence position), keeping ALL
    * single-character tokens (coverage: every word stays segmentable)
    * plus the `topKeep` multi-character candidates by (count desc, token
    * asc). Output: (tok, c).
    */
  def initCandidates(words: DataFrame, wordCol: String, weightCol: String,
                     maxPieceLen: Int, topKeep: Int): DataFrame = {
    val w = trainable(words, wordCol, weightCol)
    val subs = w.select(col("n"), explode(flatten(
      transform(sequence(lit(1), length(col("word"))), s =>
        transform(sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - s + 1)),
          l => col("word").substr(s, l))))).as("tok"))
      .groupBy("tok").agg(sum(col("n")).cast("long").as("c"))
    val singles = subs.where(length(col("tok")) === 1)
    val multi = subs.where(length(col("tok")) > 1)
      .orderBy(col("c").desc, col("tok")).limit(topKeep)
    singles.unionByName(multi)
  }

  /** The training word set: non-empty, length-capped (identical rule in
    * the oracle).
    */
  private def trainable(words: DataFrame, wordCol: String, weightCol: String): DataFrame =
    words.select(col(wordCol).as("word"), col(weightCol).cast("long").as("n"))
      .where(length(col("word")).between(1, MaxWordLen))

  /** Viterbi-segment every word under token table `(tok, c)`: one
    * broadcast join from the per-word piece explosion, then the packed
    * integer DP + backtrack folds per row. Output: (word, n, toks) with
    * `concat(toks) = word`; a word containing a character absent from
    * the token table is dropped (cannot occur when the table came from
    * [[initCandidates]]/[[emRound]] on the same corpus).
    */
  def viterbi(words: DataFrame, wordCol: String, weightCol: String,
              tokens: DataFrame, maxPieceLen: Int): DataFrame = {
    val total = tokens.agg(sum(col("c")).cast("long").as("ct"))
    val weighted = tokens.crossJoin(broadcast(total))
      .select(col("tok"), (qln(col("c")) - qln(col("ct"))).as("w"))
    val w = trainable(words, wordCol, weightCol)
    val cand = w.select(col("word"), col("n"), explode(flatten(
      transform(sequence(lit(1), length(col("word"))), s =>
        transform(sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - s + 1)),
          l => struct(s.as("start"), l.as("plen"),
            col("word").substr(s, l).as("piece")))))).as("p"))
      .select(col("word"), col("n"), col("p.start"), col("p.plen"), col("p.piece"))
    val pieces = cand.join(broadcast(weighted), col("piece") === col("tok"))
      .groupBy(col("word"), col("n"))
      .agg(collect_list(struct(col("start"), col("plen"), col("w"))).as("ps"))

    val lenW = length(col("word"))
    val ldiv = graft.functions.long_div _
    // cell 0 = (score 0, k 0, bp 0) packed; unreachable = NULL
    val cell0 = lit(Off * 4096L + 63L * 64L + 63L)
    val dp = aggregate(
      sequence(lit(1), lenW), array(cell0),
      (acc, i) => {
        val scored = transform(
          filter(col("ps"), p => p.getField("start") + p.getField("plen") === i + 1 &&
            element_at(acc, p.getField("start")).isNotNull),
          p => {
            val prev = element_at(acc, p.getField("start"))
            val scPrev = ldiv(prev, lit(4096L)) - Off
            val kPrev = lit(63L) - ldiv(pmod(prev, lit(4096L)), lit(64L))
            (scPrev + p.getField("w") + Off) * 4096L +
              (lit(63L) - (kPrev + 1L)) * 64L +
              (lit(63L) - p.getField("start"))
          })
        concat(acc, array(array_max(scored)))
      },
      acc => acc)
    val withDp = pieces.withColumn("dp", dp)
    // backtrack: cur = len, repeatedly cut the chosen final piece
    val toks = aggregate(
      sequence(lit(1), lenW),
      struct(when(element_at(col("dp"), lenW + 1).isNull, lit(-1))
        .otherwise(lenW).cast("int").as("cur"),
        array().cast("array<string>").as("ts")),
      (acc, _) => {
        val cur = acc.getField("cur")
        val cell = element_at(col("dp"), cur + 1)
        val bp = (lit(63L) - pmod(cell, lit(64L))).cast("int")
        when(cur <= 0, acc).otherwise(struct(
          (bp - 1).as("cur"),
          concat(array(col("word").substr(bp, cur - bp + 1)), acc.getField("ts")).as("ts")))
      },
      acc => when(acc.getField("cur") === 0, acc.getField("ts")))
    withDp.withColumn("toks", toks).where(col("toks").isNotNull)
      .select(col("word"), col("n"), col("toks"))
  }

  /** One hard-EM round: segment ([[viterbi]]), recount usage, floor
    * single-character tokens at 1 (they must stay usable for coverage
    * even when fully absorbed), drop unused multi-character tokens and
    * prune to the `topKeep` best by (count desc, token asc). Output:
    * (tok, c).
    */
  def emRound(words: DataFrame, wordCol: String, weightCol: String,
              tokens: DataFrame, maxPieceLen: Int, topKeep: Int): DataFrame = {
    val usage = viterbi(words, wordCol, weightCol, tokens, maxPieceLen)
      .select(col("n"), explode(col("toks")).as("tok"))
      .groupBy("tok").agg(sum(col("n")).cast("long").as("c"))
    val singles = tokens.where(length(col("tok")) === 1).select("tok")
      .join(usage, Seq("tok"), "left")
      .select(col("tok"), greatest(coalesce(col("c"), lit(0L)), lit(1L)).as("c"))
    val multi = usage.where(length(col("tok")) > 1)
      .orderBy(col("c").desc, col("tok")).limit(topKeep)
    singles.unionByName(multi)
  }

  /** Full training: candidate init + `rounds` hard-EM rounds. Output:
    * the final (tok, c) vocabulary.
    *
    * Corpus regime: the input is the DISTINCT weighted vocabulary (the
    * corpus enters through one word-count shuffle upstream), and every
    * table the rounds shuffle is bounded by `topKeep` — but the
    * candidate INIT explodes each vocabulary word into its ≤maxPieceLen
    * substrings, so the one unbounded dimension is the vocabulary size
    * itself. Tokenizer training is a sampled-corpus job by convention
    * (SentencePiece defaults to 10M sentences); hand in a sampled or
    * frequency-cut vocabulary at web scale and alarm on
    * [[candidateRows]] — the explode volume — rather than discovering
    * it as a slow first stage.
    */
  def learn(words: DataFrame, wordCol: String, weightCol: String,
            maxPieceLen: Int, topKeep: Int, rounds: Int): DataFrame = {
    require(maxPieceLen >= 2 && maxPieceLen <= 8,
      s"maxPieceLen must be in [2, 8], got $maxPieceLen")
    require(topKeep >= 1 && topKeep <= 100000, s"topKeep must be in [1, 100000], got $topKeep")
    require(rounds >= 1 && rounds <= 10, s"rounds must be in [1, 10], got $rounds")
    // Two barriers keep the round chain's plan FLAT instead of
    // geometrically nested: (1) the trainable vocabulary materializes
    // once — every round's Viterbi join and the candidate init otherwise
    // each replay the caller's corpus scan + word-count aggregation;
    // (2) each round's ≤topKeep-row token table materializes before the
    // next round references it two-to-three times (the broadcast weight
    // side, the singles floor, the prune), which would otherwise copy
    // the ENTIRE preceding round's subtree per reference. The LAST
    // round stays lazy so the returned frame's plan keeps the
    // broadcast-join shape observable (the plan-shape spec pins it);
    // its inputs are flat checkpoint scans either way. Blocks are tiny
    // and reclaimed by the context cleaner with the returned frame.
    val t = trainable(words, wordCol, weightCol).localCheckpoint(eager = false)
    // Intermediate rounds checkpoint EAGERLY and each predecessor's
    // blocks release as soon as its successor lands (the Bpe.learn
    // releaseSyms discipline — blocks no longer wait for the context
    // cleaner's GC in a long-lived session). The lazy `t` materializes
    // inside the init round's job; only `t` and the LAST round's input
    // stay persisted (both referenced by the returned lazy plan, and
    // reclaimed with it) — the last round stays lazy so the returned
    // frame's broadcast-join shape stays observable (the plan-shape
    // spec pins it).
    var (toks, prevRelease) = Dedup.materialize(
      initCandidates(t, "word", "n", maxPieceLen, topKeep),
      Dedup.Barrier.LocalCheckpoint)
    var r = 0
    while (r < rounds) {
      val round = emRound(t, "word", "n", toks, maxPieceLen, topKeep)
      if (r < rounds - 1) {
        val (g, rel) = Dedup.materialize(round, Dedup.Barrier.LocalCheckpoint)
        prevRelease()
        prevRelease = rel
        toks = g
      } else toks = round
      r += 1
    }
    toks
  }

  /** Size observer for [[learn]]'s candidate init (the repo's
    * no-silent-caps companion): the substring rows the init pass will
    * explode — Σ over vocabulary words of the ≤`maxPieceLen` windows.
    * One narrow aggregation, no explode; the number a web-scale caller
    * checks before launching training on an unsampled vocabulary.
    */
  def candidateRows(words: DataFrame, wordCol: String, maxPieceLen: Int): Long = {
    val l = length(col(wordCol)).cast("long")
    val windows = (1 to maxPieceLen)
      .map(n => greatest(l - (n - 1), lit(0L)))
      .reduce(_ + _)
    val r = words.agg(sum(windows)).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Encode a word list with a trained vocabulary: the same Viterbi pass,
    * emitting (word, n, pieces '|'-joined, n_pieces).
    */
  def encode(words: DataFrame, wordCol: String, weightCol: String,
             tokens: DataFrame, maxPieceLen: Int): DataFrame =
    viterbi(words, wordCol, weightCol, tokens, maxPieceLen)
      .select(col("word"), col("n"),
        array_join(col("toks"), "|").as("pieces"),
        size(col("toks")).cast("long").as("n_pieces"))
}
