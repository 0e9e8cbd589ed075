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
    // The initial symbol table is MATERIALIZED once: every round's argmax
    // is its own action, and without a barrier each of the R rounds
    // replays the caller's corpus scan + word-count aggregation that
    // produced `vocab` — R full corpus passes where one suffices. The
    // barrier's blocks release as soon as the merge table is learned.
    val (syms0, releaseSyms) = Dedup.materialize(
      vocab.where(length(col(wordCol)) > 0)
        .select(col(weightCol).as("n"),
          transform(sequence(lit(1), length(col(wordCol))),
            i => col(wordCol).substr(i, lit(1))).as("syms")),
      Dedup.Barrier.LocalCheckpoint, eager = false)
    try {
      var syms = syms0
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
    } finally releaseSyms()
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

  // ---------- byte-level profile (the GPT-2/Llama tokenizer family) ----------

  /** The GPT-2 byte→unicode alphabet (Radford et al. 2019, the
    * `bytes_to_unicode` table every byte-level BPE implementation
    * shares): printable bytes [33,126] ∪ [161,172] ∪ [174,255] map to
    * their own code points; the remaining 68 (whitespace, controls,
    * 0xAD) map to 256+n in byte order — so every byte is a VISIBLE
    * single character (space = 'Ġ'), merges never have to reason about
    * whitespace, and any UTF-8 byte sequence round-trips. Index = byte
    * value, entry = the mapped code point.
    */
  private[graft] val ByteAlphabet: IndexedSeq[Int] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 to 255).map { b =>
      if (direct(b)) b else { val cp = 256 + n; n += 1; cp }
    }
  }

  /** GPT-2 pretokenization regex, lookahead-free. The original rule
    * `\s+(?!\S)` (a whitespace run yields its LAST space to the next
    * ` ?<class>` token) is not RE2-restatable; [[pretokenize]] gets the
    * identical split by INJECTING a separator between the first n−1
    * whitespace chars and a final `space+non-space` pair, after which
    * plain greedy `\s+` is exact within each segment. ASCII-whitespace
    * profile (`\s` = Java/RE2 common subset); contractions, ` ?letters`,
    * ` ?digits`, ` ?punctuation-runs` as in the original.
    */
  private val TokRe = "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** GPT-2-style pretokens of a text column, in order: array<string> of
    * raw (unmapped) pretokens. One codegen'd per-row pass — injection
    * replace, split on the injected separator, `regexp_extract_all` per
    * segment, flatten — zero shuffle; an independent SQL engine restates
    * the identical chain (the injection is what makes that possible).
    *
    * Pre-existing U+0001 bytes are STRIPPED first: raw crawl text can
    * carry control chars all the way to tokenization (C4 cleaning is a
    * later pipeline stage), and a pre-existing separator byte would
    * split a segment mid-run and diverge from the GPT-2 rule. The strip
    * is the documented profile -- one C0 control char, which no
    * tokenizer should emit as corpus signal, maps to nothing -- rather
    * than a silent precondition on clean text.
    */
  def pretokenize(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    flatten(transform(
      split(regexp_replace(regexp_replace(text, "\u0001", ""),
        "(\\s+)(\\s\\S)", "$1\u0001$2"), "\u0001"),
      seg => regexp_extract_all(seg, lit(TokRe), lit(0))))

  /** Map a pretoken through [[ByteAlphabet]]: UTF-8 bytes → one visible
    * char each (multi-byte code points become several mapped chars —
    * byte-level BPE merges across them like any other pair). Pure
    * codegen'd chain: hex of the UTF-8 encoding walked two chars at a
    * time through a 256-entry literal array, zero shuffle.
    */
  def byteMapped(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val cps = array(ByteAlphabet.map(cp =>
      lit(new String(Character.toChars(cp)))): _*)
    val bin = encode(tok, "UTF-8")
    val hx = hex(bin)
    array_join(transform(sequence(lit(1), octet_length(bin)),
      i => element_at(cps,
        conv(hx.substr(i * 2 - 1, lit(2)), 16, 10).cast("int") + 1)), "")
  }

  /** One row per pretoken occurrence: (idCol, tok_idx, piece) with
    * `piece` byte-mapped — the working grain of byte-level BPE. Feed
    * `groupBy(piece).count()` into [[learn]] to train byte-level merges
    * (the mapped chars ARE the initial symbols), or the whole frame into
    * [[byteLevelEncode]] to apply learned ones.
    */
  def byteLevelPretokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(pretokenize(col(textCol))).as(Seq("tok_idx", "_raw")))
      .select(col(idCol), col("tok_idx").cast("long").as("tok_idx"),
        byteMapped(col("_raw")).as("piece"))

  /** Byte-level BPE encode: pretokenize + byte-map + apply `merges` in
    * rank order within each pretoken (merges never cross pretoken
    * boundaries — the pretokenizer IS the boundary rule). Output:
    * (idCol, tok_idx, piece, tokens = '|'-joined merged symbols). The
    * merge application is the per-row codegen'd [[applyMerges]] chain;
    * the only exchange is the input's own partitioning.
    */
  def byteLevelEncode(df: DataFrame, idCol: String, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val pre = byteLevelPretokens(df, idCol, textCol)
      .withColumn("syms",
        transform(sequence(lit(1), length(col("piece"))),
          i => col("piece").substr(i, lit(1))))
    applyMerges(pre, "syms", merges)
      .select(col(idCol), col("tok_idx"), col("piece"),
        array_join(col("syms"), "|").as("tokens"))
  }
}
