package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.ops.{Ann, Curation, Dedup, Graph, Knn, Layout, MediaCodec, Multimodal, Pq, Quantizer, TextAnalysis}

/** The operator inventory wired to the driver's correctness gate: every
  * entry has a Spark implementation and (where SQL-expressible) an ANSI
  * restatement the DuckDB oracle runs on the same parquet tables.
  *
  * Determinism rules that make hash-matching possible:
  *  - distance math: double precision, strictly sequential accumulation on
  *    both sides (list_sum in DuckDB is sequential);
  *  - probe literal uses only values exact in decimal AND binary (k/4);
  *  - cross-row sums go through DECIMAL (exact) and cast to double at the
  *    end; counts are BIGINT on both sides;
  *  - top-k ties break on id; distances rounded to 6 dp before output.
  */
object Queries {

  val Dim = 64
  val K = 10
  val AnnBits = 8   // hyperplane bits for the ANN bucket store
  val CosBits = 8   // hyperplane bits for cosine near-dup blocking
  val IvfCells = 16 // IVF coarse-quantizer cells
  val IvfProbes = 4 // IVF cells scanned per probe
  val PqM = 8       // PQ subspaces (dsub = Dim/PqM)
  val PqCodes = 16  // PQ codes per subspace
  val DupCluster = 1000 // identical-doc cluster size for the dedup skew gate

  /** Planted tail for the abbreviation-aware splitter gate: every
    * protection class appears mid-sentence (titles, e.g./i.e.,
    * a.m./p.m., vs/No), and exactly four TRUE boundaries follow the
    * doc body. Shared verbatim by the Spark query and the oracle.
    */
  val SentAbbrevTail: String = " Dr. Smith met Mrs. Jones at 5 p.m. near St. Louis." +
    " They compared costs, e.g. travel, i.e. flights, etc. and left!" +
    " Prof. Lee arrived at 9 a.m. sharp. Was it No. 7 vs. No. 9? Yes."

  /** Planted tail for the mojibake-repair gate: every entry of
    * [[graft.ops.TextAnalysis.MojibakeTable]] appears at least once.
    * Shared verbatim by the Spark query and the oracle.
    */
  val MojibakeTail: String = " Ã©lÃ¨ve dÃ©cidÃ© hÃ´tel fÃªte schÃ¶n strÃ¤ÃŸe" +
    " grÃ¼n faÃ§ade niÃ±o Ã¡ Ã³ Ãº â€” â€“ thatâ€™s â€œfineâ€¦ 25Â° Â«okÂ»"

  /** Planted tail for the Luhn card-redaction gate: a valid 16-digit PAN
    * with dash separators (the classic 4111… test number), a
    * card-SHAPED but Luhn-invalid 16-digit run that must survive, an
    * 11-digit run below the candidate floor, and a valid 13-digit PAN.
    * Shared verbatim by the Spark query and the oracle.
    */
  val CardTail: String = " pay 4111-1111-1111-1111 or 1234 5678 9012 3456" +
    " ref 79927398713 alt 4222222222222"

  /** One planted sentence per language for the `lang_id_script` gate,
    * built from each language's own function words in its own script
    * (doc_id % 25 selects). Order is [[LangExpected]]'s — the oracle's
    * decision table maps index → expected code and never sees the text.
    */
  val LangSentences: Seq[String] = Seq(
    "the cat and the dog of it is that for with to",       // en
    "der die das und ist nicht ein mit sich auf",          // de
    "le les et est une dans pour que pas vous",            // fr
    "el los una es por que no para con más",               // es
    "não uma os das em para com mais são do",              // pt
    "il di che la per con del si sono non",                // it
    "de het een van en niet dat met voor zijn",            // nl
    "nie się na do że jest po jak ale co",                 // pl
    "och att det som en på är av för med",                 // sv
    "og det at en den til er som på ikke",                 // da
    "bir ve bu için ile gibi çok ama daha kadar",          // tr
    "și la cu un este pentru nu care mai din",             // ro
    "yang dan di itu dengan untuk tidak dari ini akan",    // id
    "je se na že to pro jako ale tak když",                // cs
    "của và các có được trong là cho không một",           // vi
    "это как что не на его но из при был",                 // ru
    "це як що не на його але із при був",                  // uk
    "това като че не на се да от при той",                 // bg
    "في من على أن إلى هذا عن كان مع التي",                 // ar
    "در که از به را است این با برای آن",                   // fa
    "και το να είναι αυτό με για",                         // el (script-mapped)
    "यह एक है और के लिए से पर",                            // hi
    "これ は です の に を と",                             // ja
    "这 是 的 在 有 和 了",                                 // zh
    "이것 은 있다 의 에 를 과",                             // ko
    "東京都の会議で経済政策を発表した",                     // ja: kanji-HEAVY (11 Han > 5 kana — Han dominates; kana presence decides)
    "駅 峠 畑 込 働 円 気 枠 様 変",                        // ja: zero kana — kokuji/shinjitai marker vote decides
    "我们的经济政策在这个国家发展很快")                     // zh: simplified particles/forms — marker vote

  /** Expected language code per [[LangSentences]] index. */
  val LangExpected: Seq[String] = Seq("en", "de", "fr", "es", "pt", "it", "nl",
    "pl", "sv", "da", "tr", "ro", "id", "cs", "vi", "ru", "uk", "bg", "ar", "fa",
    "el", "hi", "ja", "zh", "ko", "ja", "ja", "zh")

  /** The planted eval-leak sentence for the `pipeline_e2e` gate's
    * decontamination stage (and its one-row benchmark table). */
  val PipeBench = "the secret benchmark answer is forty two exactly here today."

  /** Probe vector: values in {-0.375..0.375} — exactly representable in
    * both decimal and binary floating point, and inside the embedding
    * value range so the quantized probe doesn't saturate.
    */
  val probe: Array[Float] = Array.tabulate(Dim)(i => ((i % 7) - 3) / 8.0f)

  private def probeSqlList: String =
    probe.map(_.toString).mkString("[", ",", "]") + "::DOUBLE[]"

  def emb(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
  def docs(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def tbl(s: SparkSession, dir: String, name: String): DataFrame = s.read.parquet(s"$dir/$name.parquet")

  // ---------------- SQL fragments (DuckDB dialect) ----------------

  /** Per-row distance over `embedding` vs the probe list `pv`, sequential
    * double accumulation — mirrors VectorDistance's codegen loop exactly.
    */
  private def distSql(metric: String): String = {
    def lsum(term: String) =
      s"list_sum(list_transform(generate_series(1,$Dim), i -> $term))"
    val sq = lsum("(CAST(embedding[i] AS DOUBLE) - pv[i]) * (CAST(embedding[i] AS DOUBLE) - pv[i])")
    val dot = lsum("CAST(embedding[i] AS DOUBLE) * pv[i]")
    val na = lsum("CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)")
    val nb = lsum("pv[i] * pv[i]")
    metric match {
      case "l2" => s"sqrt($sq)"
      case "sq_l2" => sq
      case "l1" => lsum("abs(CAST(embedding[i] AS DOUBLE) - pv[i])")
      case "dot" => s"-($dot)"
      case "cosine" =>
        s"(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 1.0 " +
        s"ELSE 1.0 - greatest(-1.0, least(1.0, $dot / (sqrt($na) * sqrt($nb)))) END)"
    }
  }

  private def knnSql(metric: String): String =
    s"""WITH p AS (SELECT $probeSqlList AS pv),
       |d AS (SELECT vec_id, ${distSql(metric)} AS distance FROM embeddings, p WHERE embedding IS NOT NULL)
       |SELECT vec_id, round(distance, 6) AS distance FROM d ORDER BY round(distance, 6), vec_id LIMIT $K""".stripMargin

  /** Quant params CTE: AUTO qtype resolution + scale/offset + clamp bounds
    * (sqlite-vector.c:1258-1272).
    */
  private val paramsCte =
    s"""mm AS (SELECT CAST(min(u.x) AS DOUBLE) AS mn, CAST(max(u.x) AS DOUBLE) AS mx
       |  FROM embeddings, UNNEST(embedding) AS u(x) WHERE NOT isnan(CAST(u.x AS DOUBLE))),
       |par AS (SELECT
       |  CASE WHEN mn < 0 THEN 'INT8' ELSE 'UINT8' END AS qtype,
       |  CASE WHEN mn < 0 THEN (CASE WHEN greatest(abs(mn),abs(mx)) = 0 THEN 1.0 ELSE 127.0/greatest(abs(mn),abs(mx)) END)
       |       ELSE (CASE WHEN mx - mn = 0 THEN 1.0 ELSE 255.0/(mx - mn) END) END AS q_scale,
       |  CASE WHEN mn < 0 THEN 0.0 ELSE mn END AS q_offset,
       |  CASE WHEN mn < 0 THEN -128 ELSE 0 END AS lo,
       |  CASE WHEN mn < 0 THEN 127 ELSE 255 END AS hi
       |  FROM mm)""".stripMargin

  // NaN lanes code to 0 like Quantize.roundU8/roundI8 (sqlite-vector.c:495-515)
  private val codeSqlExpr =
    "CAST(CASE WHEN isnan(CAST(x AS DOUBLE)) THEN 0 " +
    "ELSE greatest(lo, least(hi, round((CAST(x AS DOUBLE) - q_offset) * q_scale))) END AS BIGINT)"

  private def quantKnnSql: String =
    s"""WITH p AS (SELECT $probeSqlList AS pv), $paramsCte,
       |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
       |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p)
       |SELECT vec_id,
       |  CAST(list_sum(list_transform(generate_series(1,$Dim), i -> (qc.c[i] - qp.c[i]) * (qc.c[i] - qp.c[i]))) AS BIGINT) AS dist_sq
       |FROM qc, qp ORDER BY dist_sq, vec_id LIMIT $K""".stripMargin

  // ---------------- packed-vector helpers ----------------

  /** Grid-quantize to m/256 via floor — every value exactly representable
    * in f16, bf16, f32 AND double, so the oracle restates them bit-for-bit
    * (floor has no rounding-mode ambiguity across engines).
    *
    * Data-dependent precondition: exactness in f16 needs |x| < 8 (11-bit
    * mantissa) and in bf16 |x| < 1 (8-bit mantissa); current embeddings are
    * within (-0.58, 0.52). Values are clamped to ±255/256 so a future
    * dataset with |x| >= 1 degrades to saturation, not silent inexactness
    * (the oracle's gridSql applies the same clamp).
    */
  private def grid256(c: Column): Column =
    transform(c, x =>
      greatest(lit(-255d / 256d), least(lit(255d / 256d),
        floor(x.cast("double") * 256d) / 256d)).cast("float"))

  private val gridSql =
    "greatest(-255.0/256, least(255.0/256, floor(CAST(embedding[i] AS DOUBLE) * 256) / 256))"

  /** Mirror of Distances.zeroClamp on a double-typed SQL value v. */
  private def clampSql(v: String): String =
    s"CASE WHEN abs($v) <= 9.5367431640625e-07 THEN 0.0 ELSE $v END"

  /** float32 narrowing in SQL: CAST .. AS REAL loses the same bits the
    * kernel's .toFloat does (both IEEE round-to-nearest-even).
    */
  private def asF32Sql(v: String): String = s"CAST(CAST($v AS REAL) AS DOUBLE)"

  /** u8-forced params CTE (qtype=UINT8 bypasses AUTO resolution). */
  private val paramsU8Cte =
    s"""mm AS (SELECT CAST(min(u.x) AS DOUBLE) AS mn, CAST(max(u.x) AS DOUBLE) AS mx
       |  FROM embeddings, UNNEST(embedding) AS u(x) WHERE NOT isnan(CAST(u.x AS DOUBLE))),
       |par AS (SELECT 'UINT8' AS qtype,
       |  CASE WHEN mx - mn = 0 THEN 1.0 ELSE 255.0/(mx - mn) END AS q_scale,
       |  mn AS q_offset, 0 AS lo, 255 AS hi FROM mm)""".stripMargin

  /** i8-forced params CTE — symmetric scale regardless of data sign,
    * mirroring computeParams(_, _, QType.I8) (AUTO's sign test must NOT
    * apply when the caller forces INT8).
    */
  private val paramsI8Cte =
    s"""mm AS (SELECT CAST(min(u.x) AS DOUBLE) AS mn, CAST(max(u.x) AS DOUBLE) AS mx
       |  FROM embeddings, UNNEST(embedding) AS u(x) WHERE NOT isnan(CAST(u.x AS DOUBLE))),
       |par AS (SELECT 'INT8' AS qtype,
       |  CASE WHEN greatest(abs(mn), abs(mx)) = 0 THEN 1.0 ELSE 127.0/greatest(abs(mn), abs(mx)) END AS q_scale,
       |  0.0 AS q_offset, -128 AS lo, 127 AS hi FROM mm)""".stripMargin

  // ---------------- packed grid-data kernel gating ----------------

  /** Gated query through one packed (metric × element-type) kernel over
    * grid256 data: every arithmetic step is exact (see grid256), so the
    * float/double kernel result is restated bit-for-bit by
    * [[packedGridSql]]. Covers the f32/f16/bf16 rows of the 25-kernel
    * dispatch table (distance-cpu.c:21).
    */
  private def packedGridQuery(metric: String, et: String, outCol: String)
                             (s: SparkSession, dir: String): DataFrame = {
    val pl = lit(graft.codec.VectorCodec.pack(probe, ElemType.parse(et)))
    emb(s, dir).where(col("embedding").isNotNull)
      .select(col("vec_id"),
        vector_distance_packed(pack_vector(grid256(col("embedding")), et), pl, metric, et)
          .cast("double").as(outCol))
  }

  private def packedGridSql(metric: String, outCol: String): String = {
    def lsum(term: String) =
      s"list_sum(list_transform(generate_series(1,$Dim), i -> $term))"
    val v = metric match {
      case "sq_l2" => lsum(s"($gridSql - pv[i]) * ($gridSql - pv[i])")
      case "l2"    => s"sqrt(${lsum(s"($gridSql - pv[i]) * ($gridSql - pv[i])")})"
      case "l1"    => lsum(s"abs($gridSql - pv[i])")
      case "dot"   => s"-(${lsum(s"$gridSql * pv[i]")})"
      case "cosine" =>
        val dot = lsum(s"$gridSql * pv[i]")
        val na = lsum(s"$gridSql * $gridSql")
        val nb = lsum("pv[i] * pv[i]")
        s"""(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 1.0
           | ELSE 1.0 - greatest(-1.0, least(1.0, ($dot) / (sqrt($na) * sqrt($nb)))) END)""".stripMargin
    }
    s"""WITH p AS (SELECT $probeSqlList AS pv),
       |d AS (SELECT vec_id, $v AS v FROM embeddings, p WHERE embedding IS NOT NULL)
       |SELECT vec_id, ${clampSql(asF32Sql("v"))} AS $outCol FROM d""".stripMargin
  }

  /** Gated query through one packed integer-code kernel (i8/u8 rows of the
    * dispatch table): exact integer accumulation, restated by
    * [[packedCodeSql]].
    */
  private def packedCodeQuery(metric: String, qt: QType, outCol: String)
                             (s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val p = Quantizer.computeParams(e, "embedding", qt)
    val codes = Quantizer.quantizeCodes(e, "vec_id", "embedding", p)
    val qp = lit(Quantizer.quantizeProbe(probe, p))
    val et = if (p.qType == QType.I8) "i8" else "u8"
    codes.select(col("id").as("vec_id"),
      vector_distance_packed(col("code"), qp, metric, et).cast("double").as(outCol))
  }

  private def packedCodeSql(metric: String, qt: QType, outCol: String): String = {
    // the Spark side forces the qtype, so the oracle must too — AUTO's
    // sign-resolution CTE would diverge on all-non-negative datasets
    val cte = if (qt == QType.U8) paramsU8Cte else paramsI8Cte
    def lsum(term: String) =
      s"list_sum(list_transform(generate_series(1,$Dim), i -> $term))"
    val v = metric match {
      case "sq_l2" => s"CAST(${lsum("(qc.c[i] - qp.c[i]) * (qc.c[i] - qp.c[i])")} AS DOUBLE)"
      case "l2"    => s"sqrt(CAST(${lsum("(qc.c[i] - qp.c[i]) * (qc.c[i] - qp.c[i])")} AS DOUBLE))"
      case "l1"    => s"CAST(${lsum("abs(qc.c[i] - qp.c[i])")} AS DOUBLE)"
      case "dot"   => s"CAST(-(${lsum("qc.c[i] * qp.c[i]")}) AS DOUBLE)"
      case "cosine" =>
        val dot = lsum("qc.c[i] * qp.c[i]")
        val na = lsum("qc.c[i] * qc.c[i]")
        val nb = lsum("qp.c[i] * qp.c[i]")
        s"""(CASE WHEN $na = 0 OR $nb = 0 THEN 1.0
           | ELSE 1.0 - greatest(-1.0, least(1.0,
           |   CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE))))) END)""".stripMargin
    }
    s"""WITH p AS (SELECT $probeSqlList AS pv), $cte,
       |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
       |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p),
       |d AS (SELECT vec_id, $v AS v FROM qc, qp)
       |SELECT vec_id, ${clampSql(asF32Sql("v"))} AS $outCol FROM d""".stripMargin
  }

  /** The remaining grid-gated (metric, type) combos of the 25-kernel
    * table. f32-cosine is gated separately by top-k ids
    * (packed_knn_f32_cosine): its float-division rounding is not portably
    * restatable value-for-value, but the induced ranking is — with that,
    * all 25 dispatch entries sit behind a green CORRECTNESS row.
    */
  private val packedGridCombos: Seq[(String, String)] = Seq(
    "sq_l2" -> "f16", "dot" -> "f16", "l1" -> "f16", "cosine" -> "f16",
    "sq_l2" -> "bf16", "dot" -> "bf16", "l1" -> "bf16", "cosine" -> "bf16",
    "l1" -> "f32")
  private val packedCodeCombos: Seq[(String, QType)] = Seq(
    "l1" -> QType.I8, "l2" -> QType.I8,
    "dot" -> QType.U8, "cosine" -> QType.U8, "l2" -> QType.U8)

  // ---------------- dedup SQL restatement ----------------

  /** Materialize a small final LSH result (post-limit) and release the
    * pipeline's cache deterministically — the gate-side pattern for
    * [[Dedup.minhashLshRun]]'s handle: collect ≤`limit` rows (the driver
    * writes them anyway), unpersist, hand back a local relation.
    */
  private def materializedLsh(s: SparkSession, run: graft.ops.Dedup.LshRun)
                             (finish: DataFrame => DataFrame): DataFrame = {
    val out = finish(run.pairs)
    val rows = out.collect()
    run.release()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Full independent BPE replay: `rounds` unrolled merge rounds in pure
    * SQL. Per round: weighted adjacent-pair counts → deterministic argmax
    * (count desc, a, b) → GREEDY left-to-right non-overlap merge, restated
    * with window functions (match islands; odd positions within an island
    * are the selected pairs — exactly the linear scan's choice, including
    * runs like "aaa" under an (a,a) merge).
    */
  private def bpeCtes(rounds: Int): String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    ctes += s"""s1 AS MATERIALIZED (SELECT w AS word, n, list_transform(generate_series(1, len(w)), i -> w[i]) AS syms
       |  FROM (SELECT w, count(*) AS n FROM (
       |    SELECT unnest(${cleanWsSql(cleanAcSql)}) AS w FROM documents) GROUP BY w))""".stripMargin
    for (r <- 1 to rounds) {
      ctes += s"""p$r AS MATERIALIZED (SELECT s.syms[i] AS a, s.syms[i + 1] AS b, s.n
         |  FROM s$r s, unnest(generate_series(1, len(s.syms) - 1)) t(i))""".stripMargin
      ctes += s"m$r AS MATERIALIZED (SELECT a, b, CAST(sum(n) AS BIGINT) AS c FROM p$r GROUP BY a, b ORDER BY c DESC, a, b LIMIT 1)"
      ctes += s"""e$r AS MATERIALIZED (SELECT s.word, s.n, i, s.syms[i] AS sym,
         |    coalesce(s.syms[i] = m.a AND s.syms[i + 1] = m.b, FALSE) AS ispair
         |  FROM s$r s, m$r m, unnest(generate_series(1, len(s.syms))) t(i))""".stripMargin
      ctes += s"isl$r AS MATERIALIZED (SELECT word, i, i - row_number() OVER (PARTITION BY word ORDER BY i) AS g FROM e$r WHERE ispair)"
      ctes += s"""sel$r AS MATERIALIZED (SELECT word, i FROM (
         |  SELECT word, i, row_number() OVER (PARTITION BY word, g ORDER BY i) AS rn FROM isl$r) WHERE rn % 2 = 1)""".stripMargin
      ctes += s"""s${r + 1} AS MATERIALIZED (SELECT e.word, any_value(e.n) AS n,
         |    list(CASE WHEN sl.i IS NOT NULL THEN m.a || m.b ELSE e.sym END ORDER BY e.i) AS syms
         |  FROM e$r e CROSS JOIN m$r m
         |  LEFT JOIN sel$r sl ON e.word = sl.word AND e.i = sl.i
         |  LEFT JOIN sel$r sp ON e.word = sp.word AND e.i = sp.i + 1
         |  WHERE sp.i IS NULL GROUP BY e.word)""".stripMargin
    }
    "WITH " + ctes.mkString(",\n")
  }

  /** Full independent unigram-LM replay ([[graft.ops.Unigram]]): candidate
    * init + `rounds` unrolled hard-EM rounds, plus (for the encode gate)
    * one final Viterbi pass, in pure SQL. The per-word Viterbi DP is a
    * recursive CTE carrying the packed-BIGINT cell list (the same
    * `(score+OFF)·4096 + (63−k)·64 + (63−bp)` composite the Spark fold
    * maximizes — the OFF term cancels in the transition algebra, leaving
    * `(cells[s]//4096 + w)·4096 + ((cells[s]%4096)//64 − 1)·64 + (63−s)`),
    * and the backtrack is a second recursion following the bp field. All
    * comparisons are integer; the only double is `ln(count)` quantized to
    * the q14 grid, on which DuckDB and the JVM agree bitwise (probed to
    * 3e6).
    */
  private def unigramCtes(rounds: Int, m: Int, k: Int, withEncode: Boolean): String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    ctes += s"""uw AS MATERIALIZED (SELECT w AS word, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT unnest(${cleanWsSql(cleanAcSql)}) AS w FROM documents) t
       |  WHERE len(w) BETWEEN 1 AND 32 GROUP BY w)""".stripMargin
    ctes += s"""us AS MATERIALIZED (SELECT substr(word, s, l) AS tok, CAST(sum(n) AS BIGINT) AS c
       |  FROM uw, unnest(generate_series(1, len(word))) ts(s), unnest(generate_series(1, $m)) tl(l)
       |  WHERE s + l - 1 <= len(word) GROUP BY 1)""".stripMargin
    ctes += s"""uv0 AS MATERIALIZED (SELECT tok, c FROM us WHERE len(tok) = 1
       |  UNION ALL SELECT tok, c FROM (
       |    SELECT tok, c FROM us WHERE len(tok) > 1 ORDER BY c DESC, tok LIMIT $k) tk)""".stripMargin
    val passes = if (withEncode) rounds + 1 else rounds
    for (r <- 1 to passes) {
      val prev = s"uv${r - 1}"
      ctes += s"""ut$r AS MATERIALIZED (SELECT tok,
         |  CAST(round(ln(CAST(c AS DOUBLE)) * 16384.0) AS BIGINT)
         |    - (SELECT CAST(round(ln(CAST(sum(c) AS DOUBLE)) * 16384.0) AS BIGINT) FROM $prev) AS w
         |  FROM $prev)""".stripMargin
      ctes += s"""ups$r AS MATERIALIZED (SELECT word, any_value(n) AS n, any_value(lw) AS lw,
         |    list({'start': start, 'plen': plen, 'w': w}) AS ps FROM (
         |  SELECT p.word, p.n, p.lw, p.start, p.plen, t.w FROM (
         |    SELECT word, n, len(word) AS lw, s AS start, l AS plen, substr(word, s, l) AS piece
         |    FROM uw, unnest(generate_series(1, len(word))) ts(s), unnest(generate_series(1, $m)) tl(l)
         |    WHERE s + l - 1 <= len(word)) p
         |  JOIN ut$r t ON p.piece = t.tok) j GROUP BY word)""".stripMargin
      ctes += s"""udp$r AS (
         |  SELECT word, n, ps, lw, 0 AS i, [CAST(409600004095 AS BIGINT)] AS cells FROM ups$r
         |  UNION ALL
         |  SELECT word, n, ps, lw, i + 1,
         |    list_append(cells, list_aggregate(list_transform(
         |      list_filter(ps, p -> p.start + p.plen = i + 2 AND cells[p.start] IS NOT NULL),
         |      p -> (cells[p.start] // 4096 + p.w) * 4096
         |           + ((cells[p.start] % 4096) // 64 - 1) * 64 + (63 - p.start)), 'max'))
         |  FROM udp$r WHERE i < lw)""".stripMargin
      ctes += s"""uwk$r AS (
         |  SELECT word, n, cells, lw AS cur, CAST([] AS VARCHAR[]) AS ts
         |  FROM udp$r WHERE i = lw AND cells[lw + 1] IS NOT NULL
         |  UNION ALL
         |  SELECT word, n, cells, CAST(63 - cells[cur + 1] % 64 AS INT) - 1 AS cur,
         |    list_prepend(substr(word, CAST(63 - cells[cur + 1] % 64 AS INT),
         |      cur - CAST(63 - cells[cur + 1] % 64 AS INT) + 1), ts)
         |  FROM uwk$r WHERE cur > 0)""".stripMargin
      ctes += s"useg$r AS MATERIALIZED (SELECT word, n, ts FROM uwk$r WHERE cur = 0)"
      if (r <= rounds) {
        ctes += s"""uu$r AS MATERIALIZED (SELECT tok, CAST(sum(n) AS BIGINT) AS c FROM (
           |  SELECT n, unnest(ts) AS tok FROM useg$r) e GROUP BY tok)""".stripMargin
        ctes += s"""uv$r AS MATERIALIZED (
           |  SELECT v.tok, CAST(greatest(coalesce(u.c, 0), 1) AS BIGINT) AS c
           |    FROM uv${r - 1} v LEFT JOIN uu$r u USING (tok) WHERE len(v.tok) = 1
           |  UNION ALL SELECT tok, c FROM (
           |    SELECT tok, c FROM uu$r WHERE len(tok) > 1 ORDER BY c DESC, tok LIMIT $k) tk)""".stripMargin
      }
    }
    "WITH RECURSIVE " + ctes.mkString(",\n")
  }

  private def unigramVocabSql(rounds: Int, m: Int, k: Int): String =
    unigramCtes(rounds, m, k, withEncode = false) +
      s"\nSELECT tok, c AS cnt FROM uv$rounds ORDER BY cnt DESC, tok"

  private def unigramEncodeSql(rounds: Int, m: Int, k: Int): String =
    unigramCtes(rounds, m, k, withEncode = true) +
      s"""\nSELECT word, n, array_to_string(ts, '|') AS pieces,
         |  CAST(len(ts) AS BIGINT) AS n_pieces FROM useg${rounds + 1}""".stripMargin

  /** Independent WordPiece replay ([[graft.ops.Wordpiece]]): the
    * frequency-truncated vocab cut, then (for the encode gate) the greedy
    * longest-match-first walk — per-position longest matches precomputed
    * non-recursively, the walk itself a recursive CTE whose chain is
    * linear (one row per word per position reached); a word whose walk
    * stalls before the end never reaches `cur = len + 1` and anti-joins
    * into the whole-word `[UNK]` row. Integer-only, like the Spark side.
    */
  private def wordpieceCtes(m: Int, k: Int): String =
    s"""WITH RECURSIVE ww AS MATERIALIZED (SELECT w AS word, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT unnest(${cleanWsSql(cleanAcSql)}) AS w FROM documents) t
       |  WHERE len(w) BETWEEN 1 AND 32 GROUP BY w),
       |wc AS MATERIALIZED (SELECT word, s, l,
       |    CASE WHEN s = 1 THEN substr(word, s, l) ELSE '##' || substr(word, s, l) END AS piece, n
       |  FROM ww, unnest(generate_series(1, len(word))) ts(s), unnest(generate_series(1, $m)) tl(l)
       |  WHERE s + l - 1 <= len(word)),
       |wo AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS c,
       |    CASE WHEN piece LIKE '##%' THEN len(piece) - 2 ELSE len(piece) END AS clen
       |  FROM wc GROUP BY piece),
       |wv AS MATERIALIZED (SELECT piece FROM wo WHERE clen = 1
       |  UNION ALL SELECT piece FROM (
       |    SELECT piece FROM wo WHERE clen > 1 ORDER BY c DESC, piece LIMIT $k) tk),
       |wb AS MATERIALIZED (SELECT c.word, c.s, max(c.l) AS bl
       |  FROM wc c JOIN wv v ON c.piece = v.piece GROUP BY c.word, c.s),
       |wwk AS (
       |  SELECT word, n, len(word) AS lw, 1 AS cur, CAST([] AS VARCHAR[]) AS ts FROM ww
       |  UNION ALL
       |  SELECT k.word, k.n, k.lw, k.cur + b.bl,
       |    list_append(k.ts, CASE WHEN k.cur = 1 THEN substr(k.word, k.cur, b.bl)
       |      ELSE '##' || substr(k.word, k.cur, b.bl) END)
       |  FROM wwk k JOIN wb b ON b.word = k.word AND b.s = k.cur
       |  WHERE k.cur <= k.lw),
       |wseg AS MATERIALIZED (SELECT word, n, ts FROM wwk WHERE cur = lw + 1)""".stripMargin

  private def wordpieceVocabSql(m: Int, k: Int): String =
    wordpieceCtes(m, k) + "\nSELECT piece FROM wv ORDER BY piece"

  /** Shared oracle fragments for the text-cleaning scalar surface — used
    * by both the Scala-API gates and the pure-SQL gate so the two
    * restatements cannot drift.
    */
  private def mojibakeChainSql(base: String): String =
    graft.ops.TextAnalysis.MojibakeTable.foldLeft(base) {
      case (acc, (b, g)) => s"replace($acc, '$b', '$g')"
    }

  /** `list_filter` keeping the Luhn-valid candidates of a list named
    * `cands` (see the card_redact gate).
    */
  private val cardValidSql: String = {
    val dg = "regexp_replace(c, '[ -]', '', 'g')"
    val v = s"CAST(substr($dg, len($dg) - i + 1, 1) AS INT)"
    s"""list_filter(cands, c ->
       |    len($dg) BETWEEN 13 AND 19 AND
       |    list_sum(list_transform(generate_series(1, len($dg)),
       |      i -> CASE WHEN i % 2 = 0 THEN
       |             CASE WHEN 2 * $v > 9 THEN 2 * $v - 9 ELSE 2 * $v END
       |           ELSE $v END)) % 10 = 0)""".stripMargin
  }

  private val cardCandsSql: String =
    """regexp_extract_all(tx, '\b(?:[0-9][ -]?){12,18}[0-9]\b')"""

  /** Per-script count projections + the dominant-script argmax, over a
    * text expression aliased `tx` (see the script_mix gate).
    */
  private def scriptCountsSql: String =
    graft.ops.TextAnalysis.ScriptClasses.map { case (nm, cls) =>
      s"CAST(len(regexp_replace(tx, '[^$cls]', '', 'g')) AS BIGINT) AS n_$nm"
    }.mkString(",\n  ")

  private def scriptDominantSql: String = {
    val classes = graft.ops.TextAnalysis.ScriptClasses
    val entries = classes.map { case (nm, _) =>
      s"{'n': n_$nm, 'script': '$nm'}"
    }.mkString("[", ", ", "]")
    val total = classes.map { case (nm, _) => s"n_$nm" }.mkString(" + ")
    s"""CASE WHEN $total = 0 THEN 'und' ELSE
       |    list_reduce($entries, (a, e) ->
       |      CASE WHEN e.n > a.n OR (e.n = a.n AND e.script < a.script)
       |           THEN e ELSE a END).script END""".stripMargin
  }

  private def wordpieceEncodeSql(m: Int, k: Int): String =
    wordpieceCtes(m, k) + "\n" +
      """SELECT w.word, w.n,
        |  CASE WHEN s.ts IS NULL THEN '[UNK]' ELSE array_to_string(s.ts, '|') END AS pieces,
        |  CAST(CASE WHEN s.ts IS NULL THEN 1 ELSE len(s.ts) END AS BIGINT) AS n_pieces
        |FROM ww w LEFT JOIN wseg s ON w.word = s.word""".stripMargin

  private def bpeSql(rounds: Int): String = {
    val out = (1 to rounds)
      .map(r => s"SELECT CAST($r AS BIGINT) AS round, a, b, c AS cnt FROM m$r")
      .mkString("\nUNION ALL\n")
    bpeCtes(rounds) + "\n" + out
  }

  /** Fixture tail for the byte-level BPE gates: contractions, a
    * double-space run (the lookahead-rule case), multi-byte UTF-8
    * (2-byte é, 3-byte …), digits, a punctuation run, an "llll" run
    * (greedy non-overlap), a PRE-EXISTING U+0001 control char (the
    * injected-separator collision — it must strip, not split the "x!!zz"
    * run), and trailing whitespace.
    */
  private val ByteBpeExtra = " don't all the café 42… llll x!!\u0001zz  "

  /** Literal merge table for `bytebpe_encode` ("Ġ" = byte-mapped
    * space): rank order matters (Ġt must exist before Ġt+h
    * fires), and l+l over "llll" exercises odd-rank selection.
    */
  private val ByteBpeMerges = Seq(
    ("Ġ", "t"), ("Ġt", "h"), ("Ġth", "e"), ("h", "e"), ("l", "l"))

  /** Byte-level pretokenize + byte→unicode mapping restatement shared by
    * the bytebpe gates: the injection replace (the lookahead-free form
    * of GPT-2's `\s+(?!\S)` rule), the per-segment token regex, and the
    * byte walk through the alphabet map — the 256 code points generated
    * from the SAME bytes_to_unicode formula the Spark side uses
    * ([[graft.ops.Bpe.ByteAlphabet]]). Ends with CTE `bpx` =
    * (doc_id, tok_idx, piece).
    */
  private def byteBpePxCtes: String = {
    val cps = graft.ops.Bpe.ByteAlphabet.mkString("[", ", ", "]")
    val extra = ByteBpeExtra.replace("'", "''")
    s"""bm AS (SELECT map(
       |    list_transform(generate_series(0, 255), b -> lpad(upper(to_hex(b)), 2, '0')),
       |    list_transform($cps, c -> chr(c))) AS m),
       |bt AS (SELECT doc_id, text || '$extra' AS text FROM documents),
       |binj AS (SELECT doc_id,
       |    regexp_replace(replace(text, chr(1), ''),
       |      '(\\s+)(\\s\\S)', '\\1' || chr(1) || '\\2', 'g') AS it
       |  FROM bt),
       |btk AS (SELECT doc_id, flatten(list_transform(string_split(it, chr(1)),
       |    seg -> regexp_extract_all(seg,
       |      '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))) AS toks
       |  FROM binj),
       |bpx AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS tok_idx,
       |    array_to_string(list_transform(
       |      generate_series(1, CAST(octet_length(encode(toks[i])) AS INTEGER)),
       |      j -> map_extract(m, substr(hex(encode(toks[i])), 2 * j - 1, 2))[1]), '') AS piece
       |  FROM btk, bm, unnest(generate_series(1, len(toks))) u(i))""".stripMargin
  }

  /** `bytebpe_encode` restatement: the pretokenize CTEs, then one
    * e/isl/sel/dp round per literal merge (the bpeCtes greedy
    * non-overlap idiom over the DISTINCT piece set), joined back to
    * positions.
    */
  private def byteBpeEncodeSql(merges: Seq[(String, String)]): String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String](byteBpePxCtes)
    ctes += """bdp1 AS MATERIALIZED (SELECT piece,
      |    list_transform(generate_series(1, len(piece)), i -> piece[i]) AS syms
      |  FROM (SELECT DISTINCT piece FROM bpx))""".stripMargin
    merges.zipWithIndex.foreach { case ((a, b), idx) =>
      val r = idx + 1
      val (qa, qb) = (a.replace("'", "''"), b.replace("'", "''"))
      ctes += s"""be$r AS MATERIALIZED (SELECT piece, i, syms[i] AS sym,
         |    coalesce(syms[i] = '$qa' AND syms[i + 1] = '$qb', FALSE) AS ispair
         |  FROM bdp$r, unnest(generate_series(1, len(syms))) t(i))""".stripMargin
      ctes += s"bisl$r AS MATERIALIZED (SELECT piece, i, i - row_number() OVER (PARTITION BY piece ORDER BY i) AS g FROM be$r WHERE ispair)"
      ctes += s"""bsel$r AS MATERIALIZED (SELECT piece, i FROM (
         |  SELECT piece, i, row_number() OVER (PARTITION BY piece, g ORDER BY i) AS rn FROM bisl$r) WHERE rn % 2 = 1)""".stripMargin
      ctes += s"""bdp${r + 1} AS MATERIALIZED (SELECT e.piece,
         |    list(CASE WHEN sl.i IS NOT NULL THEN '$qa$qb' ELSE e.sym END ORDER BY e.i) AS syms
         |  FROM be$r e
         |  LEFT JOIN bsel$r sl ON e.piece = sl.piece AND e.i = sl.i
         |  LEFT JOIN bsel$r sp ON e.piece = sp.piece AND e.i = sp.i + 1
         |  WHERE sp.i IS NULL GROUP BY e.piece)""".stripMargin
    }
    "WITH " + ctes.mkString(",\n") +
      s"""
         |SELECT bpx.doc_id, bpx.tok_idx, bpx.piece,
         |  array_to_string(bdp${merges.size + 1}.syms, '|') AS tokens
         |FROM bpx JOIN bdp${merges.size + 1} USING (piece)""".stripMargin
  }

  /** Encode restatement: per-doc symbol totals after `rounds` merges —
    * each doc's words looked up in the replayed final symbol table.
    */
  private def bpeEncodeSql(rounds: Int): String =
    bpeCtes(rounds) + "\n" +
      s"""SELECT d.doc_id, count(*) AS n_words, CAST(sum(len(s.syms)) AS BIGINT) AS n_symbols
         |FROM (SELECT doc_id, unnest(${cleanWsSql(cleanAcSql)}) AS word FROM documents) d
         |JOIN s${rounds + 1} s ON d.word = s.word GROUP BY d.doc_id""".stripMargin

  /** Exact all-pairs n-gram Jaccard ≥ threshold — the oracle restatement of
    * the LSH-prefiltered pipelines. O(n²) is fine at oracle SF; the Spark
    * side must reach the same rows through banded candidates only.
    *
    * The gates compare at `threshold` = 0.9, where 16×8 banding recall is
    * ≥ 1−1e-4 (vs ~0.95 for pairs exactly at 0.80, where a legitimate LSH
    * miss would fail a row-for-row gate on an unlucky corpus) — the
    * threshold choice makes the gate corpus-independent. The Spark
    * pipelines run at the same 0.9: banding (and so recall) is
    * threshold-independent, while the estimate filter's 4σ margin tracks
    * the threshold, so a tighter threshold only prunes more candidates
    * before the exact-verification join — it cannot drop a true ≥0.9 pair
    * the 0.8 setting would have kept.
    */
  /** Shared oracle for sentence_dedup AND its SQL TVF twin: the
    * separator-injection split, the string_hash61 key, keep = first
    * (doc, pos) per key, survivors rejoined with single spaces.
    */
  private lazy val sentenceDedupOracleSql: String = {
    val chars = "list_transform(generate_series(1, length(line)), i -> CAST(ascii(line[i]) AS BIGINT))"
    def poly(base: Int, mod: Long) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $chars), (acc, c) -> (acc * $base + c) % $mod)"
    s"""WITH d AS (SELECT doc_id,
       |  text || '. Subscribe to our newsletter today! Cookies are required.' AS text FROM documents),
       |t AS (SELECT doc_id, list_filter(list_transform(
       |  string_split(regexp_replace(replace(trim(text), chr(1), ''), '([.!?])\\s+', '\\1' || chr(1), 'g'), chr(1)),
       |  s -> trim(s)), s -> s <> '') AS ss FROM d),
       |z AS (SELECT doc_id, unnest(list_zip(ss, generate_series(1, len(ss)))) AS s FROM t),
       |sn AS (SELECT doc_id, CAST(s[2] AS BIGINT) - 1 AS pos, CAST(s[1] AS VARCHAR) AS line FROM z),
       |hk AS (SELECT doc_id, pos, line,
       |  (${poly(31, 1000000007L)} * 2147483648) + ${poly(131, 2147483647L)} AS k FROM sn),
       |mk AS (SELECT doc_id, pos, line,
       |  row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) = 1 AS keep FROM hk)
       |SELECT doc_id,
       |  coalesce(string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY pos), '') AS text_deduped,
       |  count(*) AS n_sentences, count(*) FILTER (WHERE NOT keep) AS n_removed
       |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Shingle-set CTE shared by the pair oracles: `sh` per doc over the
    * printable-lowered text, singleton set for sub-n texts.
    */
  private def shingleCte(n: Int, corpus: String = "documents"): String = {
    val span = n - 1
    s"""s AS (SELECT doc_id,
       |  CASE WHEN length(t) < $n THEN [t]
       |       ELSE list_distinct(list_transform(generate_series(1, length(t) - $span), i -> t[i:i+$span])) END AS sh
       |  FROM (SELECT doc_id, lower(regexp_replace(text, '[^ -~]', '', 'g')) AS t FROM $corpus))"""
  }

  /** PROVABLY-LOSSLESS prefix-filtered candidate generation for the
    * set-similarity pair oracles — the same blocking family the engine
    * uses, restated so the sf0.1 sweep completes instead of timing out
    * on a naive O(N²·|sh|) join. Single-sided GENERALIZED pigeonhole
    * (no reliance on the two-sided ppjoin lemma): order every doc's
    * tokens by ascending global document frequency (ties by token) and
    * keep the first |S| - ⌈t·|S|⌉ + K as its extended PREFIX. Any pair
    * with overlap |A∩B| ≥ ⌈t·|A|⌉ has at least min(K, ⌈t·|A|⌉) common
    * tokens inside A's prefix — the suffix holds only ⌈t·|A|⌉ - K
    * tokens — so `cand` (prefix postings × FULL postings, both
    * directions, HAVING count ≥ least(K, ⌈t·|A|⌉)) misses nothing:
    * jaccard ≥ t forces overlap ≥ t·max(|A|,|B|) (overlap = J·union ≥
    * t·max) and overlap/least ≥ t forces ≥ t·min, so a qualifying
    * side's prefix always hits. `lengthFilter` adds the exact jaccard
    * size bound t·|A| ≤ |B| ≤ |A|/t (NOT valid for overlap/least,
    * which has no size constraint). The survivor formula on candidates
    * is the same exact intersection as the old all-pairs restatement,
    * so results cannot drift; K = 32 trades prefix length against
    * candidate count (measured at sf0.1: every pair oracle ≤ ~26 s vs
    * the 150 s+ naive timeouts).
    */
  private def pairCandCtes(n: Int, threshold: Double,
                           corpus: String = "documents",
                           lengthFilter: Boolean = false): String = {
    val k = 32
    // every ceil/floor bound is epsilon-padded in the LOOSENING
    // direction: double rounding on t*nt (or nt/t) landing a hair past
    // an exact integer must never tighten a bound below the pigeonhole
    // requirement — ceil(x - 1e-9) <= true ceil and floor(x + 1e-9) >=
    // true floor, so a boundary-case qualifying pair can only gain
    // candidates, never lose them (losslessness is one-sided)
    val lf = if (!lengthFilter) "" else
      s"\n       |    AND q.nt >= CAST(ceil($threshold * p.nt - 1e-9) AS BIGINT)" +
      s" AND q.nt <= CAST(floor(p.nt / $threshold + 1e-9) AS BIGINT)"
    s"""${shingleCte(n, corpus)},
       |tokq AS MATERIALIZED (SELECT doc_id, len(sh) AS nt, unnest(sh) AS t FROM s),
       |dfq AS (SELECT t, count(*) AS df FROM tokq GROUP BY t),
       |ordq AS (SELECT tokq.doc_id, tokq.t, tokq.nt,
       |    row_number() OVER (PARTITION BY tokq.doc_id ORDER BY dfq.df, tokq.t) AS rnk
       |  FROM tokq JOIN dfq USING (t)),
       |pref AS MATERIALIZED (SELECT doc_id, t, nt FROM ordq
       |  WHERE rnk <= nt - CAST(ceil($threshold * nt - 1e-9) AS BIGINT) + $k),
       |cand AS MATERIALIZED (SELECT a, b FROM (
       |    SELECT least(p.doc_id, q.doc_id) AS a, greatest(p.doc_id, q.doc_id) AS b,
       |           p.doc_id AS src, count(*) AS c
       |    FROM pref p JOIN tokq q ON p.t = q.t AND p.doc_id <> q.doc_id$lf
       |    GROUP BY 1, 2, 3
       |    HAVING count(*) >= least($k, CAST(ceil($threshold * min(p.nt) - 1e-9) AS BIGINT)))
       |  GROUP BY a, b),
       |ov AS MATERIALIZED (SELECT c.a, c.b, len(list_intersect(sa.sh, sb.sh)) AS o,
       |    len(sa.sh) AS la, len(sb.sh) AS lb
       |  FROM cand c JOIN s sa ON sa.doc_id = c.a JOIN s sb ON sb.doc_id = c.b)"""
  }

  private val JaccardExpr =
    "round(CAST(o AS DOUBLE) / greatest(CAST(la + lb - o AS DOUBLE), 1.0), 6)"

  private def jaccardAllPairsSql(n: Int, threshold: Double, limit: Int): String =
    s"""WITH ${pairCandCtes(n, threshold, lengthFilter = true)}
       |SELECT a, b, $JaccardExpr AS jaccard FROM ov
       |WHERE $JaccardExpr >= $threshold
       |ORDER BY jaccard DESC, a, b LIMIT $limit""".stripMargin

  /** Overlap-coefficient pairs (shared by containment_pairs and its SQL
    * TVF twin) over the prefix-filtered candidates.
    */
  private def containmentPairsSql: String =
    s"""WITH ${pairCandCtes(8, 0.8)}
       |SELECT a, b,
       |  round(CAST(o AS DOUBLE) / CAST(least(la, lb) AS DOUBLE), 6) AS containment
       |FROM ov
       |WHERE round(CAST(o AS DOUBLE) / CAST(least(la, lb) AS DOUBLE), 6) >= 0.8
       |ORDER BY containment DESC, a, b LIMIT 100""".stripMargin

  /** Oracle for the duplicate-cluster gate: the documents table plus
    * `cluster` byte-identical clones of the lowest-id document. The oracle
    * groups identical shingle SETS first (a DuckDB `GROUP BY list_sort(sh)`
    * — independent machinery from the Spark side's hashed-set groupBy),
    * computes exact all-pairs Jaccard over distinct contents, and expands
    * member pairs — exact because Jaccard between identical sets is every
    * member pair's Jaccard, and within a group it is 1.0 by definition.
    */
  private def dupClusterSql(n: Int, threshold: Double, cluster: Int, limit: Int): String = {
    val span = n - 1
    // corpus = the gate's fixed 1500-doc window (see the Spark-side
    // comment) plus the planted clone cluster
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 1500
       |  UNION ALL
       |  SELECT 1000000 + i AS doc_id,
       |         (SELECT text FROM documents ORDER BY doc_id LIMIT 1) AS text
       |  FROM generate_series(0, ${cluster - 1}) AS g(i)),
       |s AS (SELECT doc_id,
       |  CASE WHEN length(t) < $n THEN [t]
       |       ELSE list_distinct(list_transform(generate_series(1, length(t) - $span), i -> t[i:i+$span])) END AS sh
       |  FROM (SELECT doc_id, lower(regexp_replace(text, '[^ -~]', '', 'g')) AS t FROM corpus)),
       |g AS (SELECT min(doc_id) AS rep, list_sort(list(doc_id)) AS members
       |      FROM s GROUP BY list_sort(sh)),
       |gs AS (SELECT g.rep, g.members, s.sh FROM g JOIN s ON g.rep = s.doc_id),
       |gtok AS MATERIALIZED (SELECT rep, len(sh) AS nt, unnest(sh) AS t FROM gs),
       |gdf AS (SELECT t, count(*) AS df FROM gtok GROUP BY t),
       |gord AS (SELECT gtok.rep, gtok.t, gtok.nt,
       |    row_number() OVER (PARTITION BY gtok.rep ORDER BY gdf.df, gtok.t) AS rnk
       |  FROM gtok JOIN gdf USING (t)),
       |gpref AS MATERIALIZED (SELECT rep, t, nt FROM gord
       |  WHERE rnk <= nt - CAST(ceil($threshold * nt - 1e-9) AS BIGINT) + 32),
       |gcand AS MATERIALIZED (SELECT ra, rb FROM (
       |    SELECT least(p.rep, q.rep) AS ra, greatest(p.rep, q.rep) AS rb,
       |           p.rep AS src, count(*) AS c
       |    FROM gpref p JOIN gtok q ON p.t = q.t AND p.rep <> q.rep
       |      AND q.nt >= CAST(ceil($threshold * p.nt - 1e-9) AS BIGINT)
       |      AND q.nt <= CAST(floor(p.nt / $threshold + 1e-9) AS BIGINT)
       |    GROUP BY 1, 2, 3
       |    HAVING count(*) >= least(32, CAST(ceil($threshold * min(p.nt) - 1e-9) AS BIGINT)))
       |  GROUP BY ra, rb),
       |rp AS (SELECT a.members AS ma, b.members AS mb,
       |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |        greatest(CAST(len(a.sh) + len(b.sh) AS DOUBLE) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE), 1.0), 6) AS jaccard
       |  FROM gcand c JOIN gs a ON a.rep = c.ra JOIN gs b ON b.rep = c.rb),
       |ca AS (SELECT jaccard, mb, unnest(ma) AS a0 FROM rp WHERE jaccard >= $threshold),
       |cb AS (SELECT jaccard, a0, unnest(mb) AS b0 FROM ca),
       |cross_pairs AS (SELECT least(a0, b0) AS a, greatest(a0, b0) AS b, jaccard FROM cb),
       |wa AS (SELECT members, unnest(members) AS a FROM g WHERE len(members) > 1),
       |wb AS (SELECT a, unnest(members) AS b FROM wa),
       |within_pairs AS (SELECT a, b, 1.0 AS jaccard FROM wb WHERE a < b)
       |SELECT a, b, jaccard FROM (SELECT * FROM within_pairs UNION ALL SELECT * FROM cross_pairs)
       |ORDER BY jaccard DESC, a, b LIMIT $limit""".stripMargin
  }

  /** Per-doc SimHash restatement: polynomial token hashes (bases 31/131)
    * mixed through the odd-multiplier bijections of
    * [[graft.kernels.Sketches.tokenHash63]] (per-bit balanced — see its
    * Scaladoc for why the raw composition would bias the majority vote),
    * then the per-bit majority. Exact BIGINT arithmetic throughout.
    */
  private val simhashSelect: String = {
    val chars = "list_transform(generate_series(1, length(t)), i -> CAST(ascii(t[i]) AS BIGINT))"
    def poly(base: Int, mod: Long) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $chars), (acc, c) -> (acc * $base + c) % $mod)"
    s"""tk AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(trim(regexp_replace(text, '[^ -~]', '', 'g')), '\\s+'), t -> t <> '') AS toks
       |  FROM documents),
       |hs AS (SELECT doc_id, list_transform(toks, t ->
       |  ((${poly(31, 1000000007L)} * 2654435761) % 2147483648) * 4294967296
       |    + ((${poly(131, 2147483647L)} * 2246822519) % 4294967296)) AS hl FROM tk),
       |sh AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 63), b ->
       |  CASE WHEN 2 * len(list_filter(hl, h -> ((h >> b) & 1) = 1)) - len(hl) > 0
       |       THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
       |FROM hs)""".stripMargin
  }

  /** PageRank replay: the simhash hamming≤3 pair graph symmetrized, then
    * `iters` unrolled power-iteration rounds with Graph.pageRank's exact
    * arithmetic — per-edge contribution `round(pr/deg, 9)` summed as
    * DECIMAL(38,9), damping update `(1.0 - 0.85)/n + 0.85·Σ` re-rounded
    * to 9 dp. Identical double trees on both engines; the decimal sums
    * make every round order-independent.
    */
  private def pageRankSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.v AS node,
         |  CAST(SUM(CAST(round(CAST(p.pr AS DOUBLE) / d.deg, 9) AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS s
         |  FROM ed e JOIN p${i - 1} p ON p.node = e.u JOIN dg d ON d.u = e.u GROUP BY e.v),
         |p$i AS (SELECT node,
         |  CAST(round((1.0 - 0.85) / n + 0.85 * CAST(s AS DOUBLE), 9) AS DECIMAL(38,9)) AS pr
         |  FROM c$i, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH $simhashSelect,
       |pr AS (SELECT a.doc_id AS a, b.doc_id AS b FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |ed AS (SELECT a AS u, b AS v FROM pr UNION SELECT b AS u, a AS v FROM pr),
       |dg AS (SELECT u, count(*) AS deg FROM ed GROUP BY u),
       |nn AS (SELECT count(*) AS n FROM dg),
       |p0 AS (SELECT u AS node, CAST(round(1.0 / n, 9) AS DECIMAL(38,9)) AS pr FROM dg, nn),
       |$rounds
       |SELECT node AS doc_id, CAST(pr AS DOUBLE) AS pagerank FROM p$iters ORDER BY doc_id""".stripMargin
  }

  /** HITS replay: the [[pageRankSql]] construction for the directed
    * (doc_id%17 → doc_id%23) fixture graph — per cycle an exact decimal
    * in-neighbor-hub sum, a broadcast L1 total, one 9-dp-rounded double
    * division, then the same for hubs against the NEW authorities.
    * Final node set = endpoint union, absent scores coalesce to 0.
    */
  private def hitsSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""a${i}s AS (SELECT e.v AS node, SUM(h.hub) AS s
         |  FROM ed e JOIN h${i - 1} h ON h.node = e.u GROUP BY e.v),
         |a${i}t AS (SELECT SUM(s) AS t FROM a${i}s),
         |a$i AS (SELECT node,
         |  CAST(round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 9) AS DECIMAL(38,9)) AS auth
         |  FROM a${i}s, a${i}t),
         |h${i}s AS (SELECT e.u AS node, SUM(a.auth) AS s
         |  FROM ed e JOIN a$i a ON a.node = e.v GROUP BY e.u),
         |h${i}t AS (SELECT SUM(s) AS t FROM h${i}s),
         |h$i AS (SELECT node,
         |  CAST(round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 9) AS DECIMAL(38,9)) AS hub
         |  FROM h${i}s, h${i}t)""".stripMargin
    }.mkString(",\n")
    s"""WITH ed AS (SELECT DISTINCT doc_id % 17 AS u, doc_id % 23 AS v
       |  FROM documents WHERE doc_id % 17 <> doc_id % 23),
       |nodes AS (SELECT u AS node FROM ed UNION SELECT v FROM ed),
       |h0 AS (SELECT node, CAST(1.0 AS DECIMAL(38,9)) AS hub FROM nodes),
       |$rounds
       |SELECT n.node,
       |  CAST(coalesce(h.hub, 0) AS DOUBLE) AS hub,
       |  CAST(coalesce(a.auth, 0) AS DOUBLE) AS authority
       |FROM nodes n
       |LEFT JOIN h$iters h ON h.node = n.node
       |LEFT JOIN a$iters a ON a.node = n.node
       |ORDER BY n.node""".stripMargin
  }

  /** Logistic-regression training replay ([[graft.ops.Curation.logregTrain]]'s
    * exact arithmetic): feature CTE `f` (binary-grid features + the
    * stopword-density label), count CTE `n`, zero-weights CTE `w0`, then
    * `rounds` unrolled GD rounds each = per-doc logit (z), 9-dp decimal
    * gradient sums, re-rounded weight update. The final weights live in
    * CTE `w{rounds}`; `f` stays in scope for inference replays.
    */
  private def logregCtes(rounds: Int): String = {
    val sig = "0.5 + (0.5 * z) / (1.0 + abs(z))"
    val cols = Seq("x0" -> "wa", "x1" -> "wb", "x2" -> "wc", "x3" -> "wd")
    val roundCtes = (1 to rounds).map { i =>
      val gs = cols.map { case (x, w) =>
        s"SUM(CAST(round(($sig - y) * $x, 9) AS DECIMAL(38,9))) AS g_$w"
      }.mkString(",\n    ")
      val ups = cols.map { case (_, w) =>
        s"CAST(round(CAST(p.$w AS DOUBLE) - 0.5 * (CAST(g.g_$w AS DOUBLE) / n.n), 9) AS DECIMAL(38,9)) AS $w"
      }.mkString(",\n    ")
      s"""zz$i AS (SELECT f.*,
         |    CAST(w.wa AS DOUBLE) * x0 + CAST(w.wb AS DOUBLE) * x1 +
         |    CAST(w.wc AS DOUBLE) * x2 + CAST(w.wd AS DOUBLE) * x3 AS z
         |  FROM f, w${i - 1} w),
         |g$i AS (SELECT
         |    $gs
         |  FROM zz$i),
         |w$i AS (SELECT
         |    $ups
         |  FROM w${i - 1} p, g$i g, n)""".stripMargin
    }.mkString(",\n")
    s"""t AS (SELECT doc_id, $cleanAcSql AS ac FROM documents),
       |b AS (SELECT doc_id, ac, ${cleanWsSql("ac")} AS ws FROM t),
       |f AS (SELECT doc_id, 1.0 AS x0,
       |  CAST(len(ws) AS DOUBLE) / 128.0 AS x1,
       |  CAST(len(list_filter(ws, w -> w IN ($enStopSql))) AS DOUBLE) / 32.0 AS x2,
       |  CAST(len(regexp_extract_all(ac, '[^a-z0-9 ]')) AS DOUBLE) / 64.0 AS x3,
       |  CASE WHEN 4 * len(list_filter(ws, w -> w IN ($enStopSql))) >= len(ws)
       |       THEN 1.0 ELSE 0.0 END AS y
       |  FROM b),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
       |w0 AS (SELECT CAST(0 AS DECIMAL(38,9)) AS wa, CAST(0 AS DECIMAL(38,9)) AS wb,
       |  CAST(0 AS DECIMAL(38,9)) AS wc, CAST(0 AS DECIMAL(38,9)) AS wd),
       |$roundCtes""".stripMargin
  }

  // ---------------- hyperplane-LSH SQL restatement ----------------

  /** The plane matrix as a SQL literal VALUES table `(b, plv)` — planes are
    * deterministic from (nBits, dim, seed) and Double.toString round-trips,
    * so the oracle recomputes the exact same signatures independently.
    */
  private def planesCte(nBits: Int): String = {
    val ps = graft.kernels.Sketches.planes(nBits, Dim, 42L)
    val rows = ps.zipWithIndex.map { case (row, b) =>
      s"($b, ${row.map(_.toString).mkString("[", ",", "]")}::DOUBLE[])"
    }.mkString(",\n    ")
    s"pl AS (SELECT * FROM (VALUES\n    $rows) AS t(b, plv))"
  }

  /** Per-row bucket: bit b set iff sequential-double dot(embedding, plane_b)
    * > 0 — mirrors HyperplaneSignature's accumulation order exactly.
    */
  // NB: NaN dots must NOT set the bit — the JVM's `acc > 0.0` is false for
  // NaN while DuckDB evaluates NaN > 0 as TRUE, so guard with isnan.
  private val bucketSigCte =
    s"""sg AS (SELECT vec_id, embedding,
       |  CAST(sum(CASE WHEN dt > 0 AND NOT isnan(dt) THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM (SELECT vec_id, embedding, b, list_sum(list_transform(generate_series(1,$Dim),
       |    i -> CAST(embedding[i] AS DOUBLE) * plv[i])) AS dt
       |    FROM embeddings, pl WHERE embedding IS NOT NULL)
       |  GROUP BY vec_id, embedding)""".stripMargin

  /** IVF restatement shared by ivf_knn / ivf_recall: hash-ordered sampled
    * centroids (exactly [[graft.ops.Ann.ivfCentroids]]' BIGINT arithmetic),
    * nearest-centroid assignment (ties to lower cid), probe cells.
    */
  private val ivfCte: String = ivfCteSampledFrom("TRUE")

  /** [[ivfCte]] with the centroid SAMPLE restricted to `sampleFilter`
    * rows (assignment still runs over every vector) — the frozen-
    * quantizer restatement for append gates, where centroids were
    * learned before the wave arrived.
    */
  private def ivfCteSampledFrom(sampleFilter: String): String = {
    def cdist(v: String) =
      s"list_sum(list_transform(generate_series(1,$Dim), i -> ($v - CAST(ct.cv[i] AS DOUBLE)) * ($v - CAST(ct.cv[i] AS DOUBLE))))"
    val hashOrder = "(vec_id % 1000003) * 2654435761 % 1000000007"
    s"""ctv AS (SELECT vec_id, embedding FROM embeddings
       |        WHERE embedding IS NOT NULL AND $sampleFilter
       |        ORDER BY $hashOrder, vec_id LIMIT $IvfCells),
       |ct AS (SELECT row_number() OVER (ORDER BY $hashOrder, vec_id) - 1 AS cid, embedding AS cv FROM ctv),
       |ad AS (SELECT e.vec_id, e.embedding, ct.cid,
       |  ${cdist("CAST(e.embedding[i] AS DOUBLE)")} AS d
       |  FROM embeddings e, ct WHERE e.embedding IS NOT NULL),
       |asg AS (SELECT vec_id, embedding, cid FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM ad) WHERE rn = 1),
       |pd AS (SELECT ct.cid, ${cdist("pv[i]")} AS d FROM ct, p),
       |pc AS (SELECT cid FROM pd ORDER BY d, cid LIMIT $IvfProbes)""".stripMargin
  }

  /** PQ restatement shared by pq_codes / pq_knn / pq_recall: the same
    * hash-ordered sample as ivfCte sliced into PqM sub-codebooks, exact
    * per-(vector, subspace) argmin (ties to the lower code), and the ADC
    * lookup table recomputed from the probe — all independent of the Spark
    * side's NearestCentroid/lut arithmetic but bit-identical to it
    * (sequential double accumulation).
    */
  private val pqCte: String = pqCteSampledFrom("TRUE")

  private def pqCteSampledFrom(sampleFilter: String): String = {
    val dsub = Dim / PqM
    val hashOrder = "(vec_id % 1000003) * 2654435761 % 1000000007"
    def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
    s"""ctv AS (SELECT vec_id, embedding FROM embeddings
       |        WHERE embedding IS NOT NULL AND $sampleFilter
       |        ORDER BY $hashOrder, vec_id LIMIT $PqCodes),
       |ct AS (SELECT row_number() OVER (ORDER BY $hashOrder, vec_id) - 1 AS code, embedding AS cv FROM ctv),
       |sub AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS s),
       |asd AS (SELECT e.vec_id, sub.s, ct.code,
       |  list_sum(list_transform(generate_series(1, $dsub), i ->
       |    ${sq(s"CAST(e.embedding[sub.s*$dsub+i] AS DOUBLE)", s"CAST(ct.cv[sub.s*$dsub+i] AS DOUBLE)")})) AS d
       |  FROM embeddings e, sub, ct WHERE e.embedding IS NOT NULL),
       |enc AS (SELECT vec_id, s, code FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn FROM asd) WHERE rn = 1)""".stripMargin
  }

  /** Probe ADC table + per-vector ADC distance (sequential sum over
    * subspaces, the Spark side's left-to-right reduce order).
    */
  private val pqAdcCte: String = {
    val dsub = Dim / PqM
    def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
    s"""lut AS (SELECT sub.s, ct.code,
       |  list_sum(list_transform(generate_series(1, $dsub), i ->
       |    ${sq(s"pv[sub.s*$dsub+i]", s"CAST(ct.cv[sub.s*$dsub+i] AS DOUBLE)")})) AS d
       |  FROM ct, sub, p),
       |ad AS (SELECT enc.vec_id, list_sum(list(lut.d ORDER BY enc.s)) AS adc
       |       FROM enc JOIN lut ON enc.s = lut.s AND enc.code = lut.code
       |       GROUP BY enc.vec_id)""".stripMargin
  }

  /** IVF restatement with `i`-prefixed CTE names so it composes with
    * pqCte/pqAdcCte (both define ctv/ct, and pqAdcCte defines ad) in one
    * WITH clause — used by the ivfpq_* oracles. Arithmetic is identical
    * to [[ivfCte]]: hash-ordered sampled centroids, argmin assignment with
    * ties to the lower cid, probe cells by centroid distance.
    */
  private val ivfCellFilterCte: String = ivfCellFilterCteSampledFrom("TRUE")

  private def ivfCellFilterCteSampledFrom(sampleFilter: String): String = {
    def cdist(v: String) =
      s"list_sum(list_transform(generate_series(1,$Dim), i -> ($v - CAST(ict.cv[i] AS DOUBLE)) * ($v - CAST(ict.cv[i] AS DOUBLE))))"
    val hashOrder = "(vec_id % 1000003) * 2654435761 % 1000000007"
    s"""ictv AS (SELECT vec_id, embedding FROM embeddings
       |        WHERE embedding IS NOT NULL AND $sampleFilter
       |        ORDER BY $hashOrder, vec_id LIMIT $IvfCells),
       |ict AS (SELECT row_number() OVER (ORDER BY $hashOrder, vec_id) - 1 AS cid, embedding AS cv FROM ictv),
       |icd AS (SELECT e.vec_id, ict.cid, ${cdist("CAST(e.embedding[i] AS DOUBLE)")} AS d
       |  FROM embeddings e, ict WHERE e.embedding IS NOT NULL),
       |iasg AS (SELECT vec_id, cid FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM icd) WHERE rn = 1),
       |ipd AS (SELECT ict.cid, ${cdist("pv[i]")} AS d FROM ict, p),
       |ipc AS (SELECT cid FROM ipd ORDER BY d, cid LIMIT $IvfProbes)""".stripMargin
  }

  /** Fixed-point per-label centroids + nearest-centroid assignment — the
    * clustering restatement shared by centroid_assign and semdedup_keep
    * (mirrors [[assignClusters]]: vector_avg fixed point, argmin ties to
    * the smaller label).
    */
  private val centroidClusterCte: String =
    s"""u AS (SELECT label, g.i AS i,
       |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
       |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS v
       |  FROM embeddings, UNNEST(generate_series(1, $Dim)) AS g(i) WHERE embedding IS NOT NULL),
       |c AS (SELECT label, list(cv_i ORDER BY i) AS cv FROM (
       |  SELECT label, i, sum(v) / (count(*) * 1000000.0) AS cv_i FROM u GROUP BY label, i) GROUP BY label),
       |d AS (SELECT e.vec_id, c.label,
       |  list_sum(list_transform(generate_series(1, $Dim),
       |    i -> (CAST(e.embedding[i] AS DOUBLE) - cv[i]) * (CAST(e.embedding[i] AS DOUBLE) - cv[i]))) AS dsq
       |  FROM embeddings e, c WHERE e.embedding IS NOT NULL),
       |r AS (SELECT vec_id, label, dsq,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY dsq, label) AS rn FROM d)""".stripMargin

  /** Probe signature + multi-probe hamming-1 bucket list. */
  private val probeBucketsCte =
    s"""psig AS (SELECT CAST(sum(CASE WHEN dt > 0 AND NOT isnan(dt) THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sg0
       |  FROM (SELECT b, list_sum(list_transform(generate_series(1,$Dim),
       |    i -> pv[i] * plv[i])) AS dt FROM pl, p)),
       |pb AS (SELECT sg0 AS bkt FROM psig
       |       UNION ALL SELECT xor(sg0, CAST(1 AS BIGINT) << b) FROM psig, pl)""".stripMargin

  // ---------------- vector query implementations ----------------

  private def knnQuery(metric: String)(s: SparkSession, dir: String): DataFrame = {
    val scored = Knn.distanceStream(emb(s, dir), "vec_id", "embedding", probe, metric)
      .withColumn("distance", round(col("distance"), 6))
    Knn.topK(scored, col("distance"), col("vec_id"), K)
  }

  private def quantCodesDf(s: SparkSession, dir: String): (DataFrame, QuantParams) = {
    val e = emb(s, dir)
    val p = Quantizer.computeParams(e, "embedding")
    (Quantizer.quantizeCodes(e, "vec_id", "embedding", p), p)
  }

  /** Nearest exact-vector_avg-centroid assignment (the SemDeDup clustering
    * step, shared by centroid_assign and semdedup_keep): centroid matrix
    * collected like ivfCentroids and inlined as a literal, per-row argmin
    * over a HOF distance array — NO join, NO shuffle. Adds `ds` (per-cell
    * squared distances) and `cluster` (argmin label, ties to the smallest
    * label via array_position-first-minimum).
    */
  private def assignClusters(e: DataFrame): DataFrame = {
    val cents = e.groupBy(col("label"))
      .agg(vector_avg(col("embedding"), Dim).as("c"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val centsLit = typedlit(cents.map(_._2.toSeq).toSeq)
    val labelsLit = typedlit(cents.map(_._1).toSeq)
    val dists = transform(centsLit, c =>
      aggregate(
        zip_with(col("embedding"), c, (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, x) => acc + x))
    e.withColumn("ds", dists)
      .withColumn("cluster",
        element_at(labelsLit, array_position(col("ds"), array_min(col("ds"))).cast("int")))
  }

  private def quantKnn(s: SparkSession, dir: String): DataFrame = {
    val (codes, p) = quantCodesDf(s, dir)
    Knn.topK(
      codes.select(col("id").as("vec_id"),
        code_distance(col("code"), lit(Quantizer.quantizeProbe(probe, p)), "sq_l2", p.qType).as("dist_sq")),
      col("dist_sq"), col("vec_id"), K)
  }

  // ---------------- the inventory ----------------

  /** Shared crawl fixture for the `pipeline_e2e` / `pipeline_funnel`
    * gates: per-document WARC captures with one planted drop-class per
    * stage (see the pipeline_e2e gate comment), the per-host robots.txt
    * table and the one-row benchmark corpus.
    */
  /** The per-host robots table of the pipeline fixtures. */
  /** Pages frame for the frontier gates and the XL bench row: the link
    * fixture under each page's own URL (the anchor_texts shape), over an
    * arbitrary doc_id frame. */
  private[graft] def frontierPagesFrom(d0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val idS = col("doc_id").cast("string")
    val pageUrl = concat(lit("https://h"), (col("doc_id") % 10).cast("string"),
      lit(".com/a/page"), idS, lit(".html"))
    d0.select(col("doc_id"), pageUrl.as("page_url"),
      linkHtmlFixture(col("doc_id")).as("html"))
  }

  private def frontierPages(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    frontierPagesFrom(docs(s, dir).select(col("doc_id")))

  /** robots.txt for the frontier gates: rules for the site{k}.com hosts
    * only (h{k}.com and alt{k}.org stay rule-less → fail-open): odd k
    * disallows /page (killing that whole class — including the sitemap-
    * seeded /page-sm URLs, by prefix), every k carries a Crawl-delay of
    * k seconds and a `Sitemap:` root seeding the frontier's index walk.
    */
  private[graft] def frontierRobots(s: SparkSession): org.apache.spark.sql.DataFrame =
    s.range(10).select(
      concat(lit("site"), col("id").cast("string"), lit(".com")).as("host"),
      concat(lit("User-agent: *\n"),
        when(col("id") % 2 === 1, lit("Disallow: /page\n")).otherwise(lit("")),
        lit("Crawl-delay: "), col("id").cast("string"), lit("\n"),
        lit("Sitemap: https://site"), col("id").cast("string"),
        lit(".com/sm.xml\n")).as("txt"))

  /** Sitemap fetch store for the frontier gates: each site{k}.com root
    * is an INDEX pointing at one fetched child and one never-fetched
    * ref (contributes nothing — fetch-what-you-have); the child urlset
    * plants one leaf per downstream decision class: a tracking-param
    * URL under the robots-disallowed /page prefix (canonicalization +
    * robots on seeded URLs), a clean /sm/{k} survivor, a blocklisted
    * alt3.org row, a link-duplicated h{k}.com/about (source = 'both'),
    * and an already-fetched page URL (the wave screen on seeded URLs).
    */
  private[graft] def frontierSitemaps(s: SparkSession): org.apache.spark.sql.DataFrame = {
    val ks = col("id").cast("string")
    val idx = s.range(10).select(
      concat(lit("https://site"), ks, lit(".com/sm.xml")).as("sitemap_url"),
      concat(lit("<?xml version=\"1.0\"?><sitemapindex>"),
        lit("<sitemap><loc>https://site"), ks,
        lit(".com/sm-child.xml</loc></sitemap>"),
        lit("<sitemap><loc>https://site"), ks,
        lit(".com/missing.xml</loc></sitemap>"),
        lit("</sitemapindex>")).as("xml"))
    val child = s.range(10).select(
      concat(lit("https://site"), ks, lit(".com/sm-child.xml")).as("sitemap_url"),
      concat(lit("<urlset>"),
        lit("<url><loc>https://site"), ks,
        lit(".com/page-sm?utm_source=z</loc></url>"),
        lit("<url><loc>https://site"), ks, lit(".com/sm/"), ks,
        lit("</loc><lastmod>2026-01-02</lastmod></url>"),
        lit("<url><loc>https://alt"), ks, lit(".org/sm</loc></url>"),
        lit("<url><loc>https://h"), ks, lit(".com/about</loc></url>"),
        lit("<url><loc>https://h"), ks, lit(".com/a/page"), ks,
        lit(".html</loc></url>"),
        lit("</urlset>")).as("xml"))
    idx.unionByName(child)
  }

  /** Sitemap store for the PRIORITY frontier gate: per site{k}.com an
    * index → child whose urlset declares `/sm/{k}` at priority 0.9,
    * `/pg/{k}` at priority 0.2 and `h{k}.com/about` with NO priority
    * (the protocol default 0.5 — also link-discovered, so provenance
    * stays 'both'). With 50 default-0.5 link candidates per even site
    * domain and a cap of 30, the 0.9 URL must survive and the 0.2 URL
    * must be cut — the site's own declared priorities decide the cap.
    */
  private[graft] def frontierPrioritySitemaps(s: SparkSession)
      : org.apache.spark.sql.DataFrame = {
    val ks = col("id").cast("string")
    val idx = s.range(10).select(
      concat(lit("https://site"), ks, lit(".com/sm.xml")).as("sitemap_url"),
      concat(lit("<?xml version=\"1.0\"?><sitemapindex>"),
        lit("<sitemap><loc>https://site"), ks,
        lit(".com/sm-child.xml</loc></sitemap>"),
        lit("</sitemapindex>")).as("xml"))
    val child = s.range(10).select(
      concat(lit("https://site"), ks, lit(".com/sm-child.xml")).as("sitemap_url"),
      concat(lit("<urlset>"),
        lit("<url><loc>https://site"), ks, lit(".com/sm/"), ks,
        lit("</loc><priority>0.9</priority></url>"),
        lit("<url><loc>https://site"), ks, lit(".com/pg/"), ks,
        lit("</loc><priority>0.2</priority></url>"),
        lit("<url><loc>https://h"), ks, lit(".com/about</loc></url>"),
        lit("</urlset>")).as("xml"))
    idx.unionByName(child)
  }

  /** HTTP response captures for the frontier REDIRECT gates: per doc
    * (k = doc_id % 10) six responses — a 301 with a RELATIVE Location
    * (`/page-r{i}`, must resolve against its source host; robots-
    * disallowed for odd k by the /page prefix), a 302→308 two-hop chain
    * landing on a fresh `x{k}.net/final{i}` (both hops' chains
    * terminate there — the decision table carries the terminal twice),
    * a 200 carrying a Location header (the trap: NOT a redirect, must
    * contribute nothing), a 307 onto the link-discovered
    * `alt{k}.org/p{i}` (source 'link+redirect'; blocked at eTLD+1 for
    * k=3), a 301 onto the page's own fetched URL (the wave screen must
    * drop it), and a 303 onto `h{k}.com/about` (link- AND sitemap-
    * discovered → source 'both+redirect') — plus, per k, a 301 onto the
    * sitemap-only `site{k}.com/sm/{k}` ('sitemap+redirect') and a
    * two-edge relative-Location CYCLE (cycA ↔ cycB, never terminal,
    * must drop). The oracle restates the terminals from THESE formulas;
    * the header parser, chain walk and RFC 3986 resolution never appear.
    */
  private[graft] def frontierRedirectCaptures(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    frontierRedirectCapturesFrom(docs(s, dir).select(col("doc_id")))

  /** The redirect-capture fixture over an arbitrary doc_id frame —
    * shared by the gates (documents table) and the XL bench row
    * (spark.range). */
  private[graft] def frontierRedirectCapturesFrom(
      d0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = d0.sparkSession
    val i = col("doc_id").cast("string")
    val ks = (col("doc_id") % 10).cast("string")
    def resp(status: String, loc: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column = concat(
      lit("HTTP/1.1 " + status + "\r\nServer: f\r\nLocation: "), loc,
      lit("\r\nContent-Type: text/html\r\n\r\nmoved"))
    def row(url: org.apache.spark.sql.Column, pay: org.apache.spark.sql.Column)
        : org.apache.spark.sql.DataFrame =
      d0.select(url.as("url"), pay.as("payload"))
    val perDoc =
      row(concat(lit("https://site"), ks, lit(".com/r301/"), i),
        resp("301 Moved Permanently", concat(lit("/page-r"), i)))
      .unionByName(row(concat(lit("https://h"), ks, lit(".com/hop1/"), i),
        resp("302 Found", concat(lit("https://h"), ks, lit(".com/hop2/"), i))))
      .unionByName(row(concat(lit("https://h"), ks, lit(".com/hop2/"), i),
        resp("308 Permanent Redirect",
          concat(lit("https://x"), ks, lit(".net/final"), i))))
      .unionByName(row(concat(lit("https://h"), ks, lit(".com/trap/"), i),
        resp("200 OK", concat(lit("https://trap"), ks, lit(".com/t"), i))))
      .unionByName(row(concat(lit("https://site"), ks, lit(".com/rb/"), i),
        resp("307 Temporary Redirect",
          concat(lit("https://alt"), ks, lit(".org/p"), i))))
      .unionByName(row(concat(lit("https://h"), ks, lit(".com/rf/"), i),
        resp("301 Moved Permanently",
          concat(lit("https://h"), ks, lit(".com/a/page"), i, lit(".html")))))
      // k=7 exempt: h7.com/about keeps the legacy bare-'both' provenance
      // (link+sitemap, no redirect) asserted in the gate's output
      .unionByName(d0.where(col("doc_id") % 10 =!= 7)
        .select(concat(lit("https://h"), ks, lit(".com/rabout/"), i).as("url"),
          resp("303 See Other",
            concat(lit("https://h"), ks, lit(".com/about"))).as("payload")))
    val rk = s.range(10).select(col("id").cast("string").as("ks"))
    def rowK(url: org.apache.spark.sql.Column, pay: org.apache.spark.sql.Column)
        : org.apache.spark.sql.DataFrame =
      rk.select(url.as("url"), pay.as("payload"))
    perDoc
      .unionByName(rowK(concat(lit("https://site"), col("ks"), lit(".com/rs")),
        resp("301 Moved Permanently",
          concat(lit("https://site"), col("ks"), lit(".com/sm/"), col("ks")))))
      .unionByName(rowK(concat(lit("https://h"), col("ks"), lit(".com/cycA")),
        resp("302 Found", lit("/cycB"))))
      .unionByName(rowK(concat(lit("https://h"), col("ks"), lit(".com/cycB")),
        resp("302 Found", lit("/cycA"))))
  }

  /** Pages for the INCREMENTAL frontier gates: each doc's html carries
    * two links — the PREVIOUS doc's page URL (doc 0 self-links: its own
    * page, screened by the wave's own fetched set) and a never-fetched
    * fresh URL — so a wave-2 candidate drops iff its target was fetched
    * by wave 1, the exact cross-wave NOT EXISTS the oracle replays.
    */
  private[graft] def frontierIncPages(d0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val idS = col("doc_id").cast("string")
    val prev = when(col("doc_id") === 0, lit(0L)).otherwise(col("doc_id") - 1)
    val pageUrl = concat(lit("https://h"), (col("doc_id") % 10).cast("string"),
      lit(".com/a/page"), idS, lit(".html"))
    val prevUrl = concat(lit("https://h"), (prev % 10).cast("string"),
      lit(".com/a/page"), prev.cast("string"), lit(".html"))
    val html = concat(
      lit("<html><body><a href=\""), prevUrl, lit("\">prev</a> "),
      lit("<a href=\"https://x"), (col("doc_id") % 10).cast("string"),
      lit(".net/f"), idS, lit("\">fresh</a></body></html>"))
    d0.select(col("doc_id"), pageUrl.as("page_url"), html.as("html"))
  }

  /** Pages for the IN-LINK evidence gates (FrontierConfig.useInlinks):
    * each doc (k = doc_id % 10, page at h{k}.com) links to the shared
    * `pop.net/hot{i%3}` (referenced from every h-domain present — the
    * high-evidence class), its own `pop.net/cold{i}` (exactly one
    * offsite referrer), its own ONSITE `/local{i}` (zero evidence — a
    * site cannot vote for itself), and, from EVEN docs only,
    * `mid.org/m{i%3}` (the even h-domains). With a pop.net cap of 8
    * over 3 hot + N cold candidates, the hot URLs must survive on
    * evidence regardless of their hash rank — the OPIC-lite claim.
    */
  private[graft] def frontierInlinkPages(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val idS = col("doc_id").cast("string")
    val ks = (col("doc_id") % 10).cast("string")
    val pageUrl = concat(lit("https://h"), ks,
      lit(".com/a/page"), idS, lit(".html"))
    val html = concat(
      lit("<html><body><a href=\"https://pop.net/hot"),
      (col("doc_id") % 3).cast("string"), lit("\">hot</a> "),
      lit("<a href=\"https://pop.net/cold"), idS, lit("\">cold</a> "),
      lit("<a href=\"/local"), idS, lit("\">self</a>"),
      when(col("doc_id") % 2 === 0,
        concat(lit(" <a href=\"https://mid.org/m"),
          (col("doc_id") % 3).cast("string"), lit("\">mid</a>")))
        .otherwise(lit("")),
      lit("</body></html>"))
    docs(s, dir).select(col("doc_id"), pageUrl.as("page_url"),
      html.as("html"))
  }

  private val FrontierCfg = graft.ops.Pipeline.FrontierConfig(
    blockedDomains = Seq("alt3.org"), maxPerSite = 30)

  private[graft] def pipeRobots(s: SparkSession): org.apache.spark.sql.DataFrame =
    s.range(10).select(
      concat(lit("site"), col("id").cast("string"), lit(".com")).as("host"),
      lit("User-agent: *\nDisallow: /blocked/\n").as("txt"))

  /** Text-profile WARC captures over an id frame (`doc_id`), pure column
    * formulas \u2014 shared by the pipeline gates and the XL bench row (which
    * feeds `spark.range(1M)` instead of the gate's documents table).
    * `httpWrap` = true wraps each html payload in an HTTP response
    * envelope (the real crawl shape) with three ingest drop classes:
    * a 404 status every 13th doc, an application/json media type every
    * 11th, and an UNTERMINATED header block (no blank line \u2014 the
    * truncated-capture shape, which parses status 200 + an allowed mime
    * but a NULL body) every 23rd \u2014 the pipeline_e2e_http gate's S1.5
    * filter targets.
    */
  private[graft] def pipeCaptures(d0: org.apache.spark.sql.DataFrame,
      httpWrap: Boolean = false): org.apache.spark.sql.DataFrame = {
    val did = col("doc_id")
    val e = when(did % 31 === 17, did - 1).otherwise(did) // content-clone source
    val u = when(did % 17 === 1, did - 1).otherwise(did)  // URL-twin source
    val eS = e.cast("string")
    val core = when(e % 29 === 13,
        concat(lit("der hund und die katze nr"), eS,
          lit(" ist nicht auf dem tisch und so weiter heute.")))
      .when(e % 23 === 11,
        concat(lit("the the the the the the the spam spam spam spam word word " +
          "word page p"), eS, lit(" here there.")))
      .otherwise(concat(
        lit("the quick brown fox number "), eS, lit(" jumps over one lazy dog. "),
        lit("it runs near town t"), (e % 7).cast("string"),
        lit(" beside marker m"), eS, lit("a and m"), eS, lit("b then m"), eS,
        lit("c every single day with speed.")))
    val body = concat(core,
      when(e % 19 === 7, lit(" " + PipeBench)).otherwise(lit("")),
      lit(" we met at the caf\u00c3\u00a9 yesterday." +
        " please enable javascript to view this content now"))
    val url = concat(lit("https://site"), (u % 10).cast("string"), lit(".com"),
      when(u % 7 === 3, lit("/blocked/")).otherwise(lit("/ok/")), u.cast("string"),
      lit("?utm_source=feed"))
    val html = concat(
      lit("<html><head><title>T</title></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav><article><p>"),
      body,
      lit("</p></article><footer>Copyright 2026 Example." +
        " <a href=\"/p\">Privacy</a></footer></body></html>"))
    val payload = if (!httpWrap) html else concat(
      lit("HTTP/1.1 "),
      when(did % 13 === 6, lit("404 Not Found")).otherwise(lit("200 OK")),
      lit("\r\nContent-Type: "),
      when(did % 11 === 4, lit("application/json"))
        .otherwise(lit("text/html; charset=UTF-8")),
      when(did % 23 === 15, lit("\r\n")).otherwise(lit("\r\n\r\n")), html)
    val warc = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
      lit("\r\nContent-Length: "), length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
    d0.select(did, warc.as("warc"))
  }

  private[graft] def pipeFixture(s: SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    (pipeCaptures(docs(s, dir).select(col("doc_id"))), pipeRobots(s),
      s.range(1).select(lit(PipeBench).as("text")))

  /** JVM-side mirror of [[pipeCaptures]]' per-document capture as a
    * per-record-gzip `.warc.gz` BINARY (fixture synthesis for the
    * pipeline_e2e_gz gate; wrapped in a udf like the other binary
    * fixtures): identical url/html formulas \u2014 so the pipeline_e2e oracle
    * replays this gate verbatim \u2014 plus a metadata member exercising the
    * gzip member chain and the response filter. The html embeds
    * multi-byte UTF-8 (the mojibake marker \u00c3\u00a9), so `Content-Length`
    * (bytes) \u2260 chars and a char-offset walk would shear the record and
    * value-fail.
    */
  private def pipeGzCapture(docId: Long): Array[Byte] = {
    val e = if (docId % 31 == 17) docId - 1 else docId
    val u = if (docId % 17 == 1) docId - 1 else docId
    val core =
      if (e % 29 == 13)
        s"der hund und die katze nr$e ist nicht auf dem tisch und so weiter heute."
      else if (e % 23 == 11)
        s"the the the the the the the spam spam spam spam word word word page p$e here there."
      else
        s"the quick brown fox number $e jumps over one lazy dog. " +
          s"it runs near town t${e % 7} beside marker m${e}a and m${e}b then m${e}c " +
          "every single day with speed."
    val body = core + (if (e % 19 == 7) " " + PipeBench else "") +
      " we met at the caf\u00c3\u00a9 yesterday." +
      " please enable javascript to view this content now"
    val url = s"https://site${u % 10}.com" +
      (if (u % 7 == 3) "/blocked/" else "/ok/") + s"$u?utm_source=feed"
    val html = "<html><head><title>T</title></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav><article><p>" +
      body + "</p></article><footer>Copyright 2026 Example." +
      " <a href=\"/p\">Privacy</a></footer></body></html>"
    graft.ops.Warc.gzMember("response", Some(url), html) ++
      graft.ops.Warc.gzMember("metadata", None,
        (if (docId % 7 == 0) "seen: WARC/1.0\r\n" else "") + "lang: en")
  }

  /** Fixture for the jpeg_luma_decode gate: a 72×64 grayscale and a
    * 72×64 color BufferedImage from deterministic per-doc pixel
    * formulas, encoded by the JDK's OWN ImageIO JPEG writer (an
    * INDEPENDENT implementation), then decoded back by ImageIO to give
    * reference luma stats + dHash. Returns (grayJpg, colorJpg,
    * gRefSum, gRefMax, gRefDhash, cRefSum, cRefDhash). The gate then
    * runs OUR decoder over the same bytes and asserts agreement —
    * dimensions exactly, sums/max/dhash within the documented
    * IDCT/color-roundtrip tolerances. Color uses the writer's default
    * 4:2:0 subsampling, so MCU padding + crop is exercised (72 is not a
    * multiple of 16). The gray image is additionally encoded
    * PROGRESSIVE (SOF2, the writer's default multi-scan script with
    * successive approximation) — fields 8-10: (progJpg, pRefSum,
    * pRefDhash) — so the multi-scan coefficient-accretion path earns
    * the same agreement.
    */
  private[graft] def jpegGateFixture(id: Long)
      : (Array[Byte], Array[Byte], Long, Long, Long, Long, Long,
         Array[Byte], Long, Long) = {
    import java.awt.image.BufferedImage
    val w = 72; val h = 64
    def encode(img: BufferedImage, progressive: Boolean = false): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      if (!progressive) javax.imageio.ImageIO.write(img, "jpg", bos)
      else {
        val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
        val pr = wr.getDefaultWriteParam
        pr.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
        val out = javax.imageio.ImageIO.createImageOutputStream(bos)
        wr.setOutput(out)
        wr.write(null, new javax.imageio.IIOImage(img, null, null), pr)
        out.close(); wr.dispose()
      }
      bos.toByteArray
    }
    val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val c = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val gv = ((x * 3 + y * 2 + (id % 64)).toInt) % 256
        g.getRaster.setSample(x, y, 0, gv)
        val r = ((x * 4 + id) % 256).toInt
        val gg = (y * 4 % 256)
        val b = ((x + y) * 2 % 256)
        c.setRGB(x, y, (r << 16) | (gg << 8) | b)
        x += 1
      }
      y += 1
    }
    val gJpg = encode(g); val cJpg = encode(c)
    // reference decode by the SAME independent implementation
    val gBack = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gJpg))
    val cBack = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cJpg))
    val gLuma = new Array[Int](w * h); val cLuma = new Array[Int](w * h)
    var gSum = 0L; var gMax = 0L; var cSum = 0L
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val gv = gBack.getRaster.getSample(x, y, 0)
        gLuma(y * w + x) = gv
        gSum += gv; if (gv > gMax) gMax = gv
        val rgb = cBack.getRGB(x, y)
        val cv = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
          + 114 * (rgb & 0xff)) / 1000
        cLuma(y * w + x) = cv
        cSum += cv
        x += 1
      }
      y += 1
    }
    val gDh = graft.ops.Jpeg.dhashOfLuma(w, h, gLuma).get
    val cDh = graft.ops.Jpeg.dhashOfLuma(w, h, cLuma).get
    // progressive twin of the gray image, reference-decoded from its OWN
    // bytes (coefficient-identical to baseline, but earned independently)
    val pJpg = encode(g, progressive = true)
    val pBack = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pJpg))
    val pLuma = new Array[Int](w * h)
    var pSum = 0L
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pv = pBack.getRaster.getSample(x, y, 0)
        pLuma(y * w + x) = pv
        pSum += pv
        x += 1
      }
      y += 1
    }
    val pDh = graft.ops.Jpeg.dhashOfLuma(w, h, pLuma).get
    (gJpg, cJpg, gSum, gMax, gDh, cSum, cDh, pJpg, pSum, pDh)
  }

  /** Fixture for image_dhash_cross_format: the SAME deterministic
    * grayscale pattern — a gentle gradient plus a 32-count checkerboard
    * aligned with BOTH the dHash pool grid and the JPEG block grid, so
    * pool margins are ≥24 counts and compression ringing cannot flip a
    * comparison — rendered losslessly into PNG (all five scanline
    * filters via doc_id%5) and lossily into JPEG via ImageIO — odd
    * doc_ids as PROGRESSIVE (SOF2) encodes, so the one dHash space
    * provably spans PNG ↔ baseline-JPEG ↔ progressive-JPEG.
    */
  private[graft] def crossFormatFixture(id: Long): (Array[Byte], Array[Byte]) = {
    val w = 72; val h = 64
    def v(y: Int, x: Int): Int =
      x + y + (if (((x / 8) + (y / 8)) % 2 == 0) 0 else 32) + (id % 64).toInt
    val png = MediaCodec.pngPixelFixture(w, h, id, (id % 5).toInt,
      channels = 1, pixel = (y, x, _) => v(y, x))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.getRaster.setSample(x, y, 0, v(y, x)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (id % 2 == 0) javax.imageio.ImageIO.write(img, "jpg", bos)
    else {
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val pr = wr.getDefaultWriteParam
      pr.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val out = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(out)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), pr)
      out.close(); wr.dispose()
    }
    (png, bos.toByteArray)
  }

  private[graft] val PipeConfig = graft.ops.Pipeline.CurateConfig(
    capPerDomain = 25, packBudget = 512, nShards = 4, shardBuckets = 32)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++
      packedGridCombos.map { case (m, et) =>
        s"packed_${et}_$m" -> (packedGridQuery(m, et, "dist") _)
      }.toMap ++
      packedCodeCombos.map { case (m, qt) =>
        val n = if (qt == QType.I8) "i8" else "u8"
        s"packed_${n}_$m" -> (packedCodeQuery(m, qt, "dist") _)
      }.toMap

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K1: exact brute-force k-NN, all 5 metrics (vector_full_scan)
    "knn_l2" -> knnQuery("l2") _,
    "knn_sq_l2" -> knnQuery("sq_l2") _,
    "knn_cosine" -> knnQuery("cosine") _,
    "knn_dot" -> knnQuery("dot") _,
    "knn_l1" -> knnQuery("l1") _,

    // K3: streaming distance annotation (vector_full_scan_stream)
    "dist_stream_l2" -> ((s, dir) =>
      Knn.distanceStream(emb(s, dir), "vec_id", "embedding", probe, "l2")
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))),

    // Batch k-NN join: N probes answered in ONE corpus scan via the
    // bounded-heap knn_topk aggregate (expressions/aggregates.scala) —
    // broadcast the probes, fold each partition into O(k) state per probe,
    // shuffle only N×k winners. The grouped generalization of the
    // reference's single-probe slot array (sqlite-vector.c:2022-2113); a
    // window row_number() restatement (the oracle) would shuffle+sort the
    // full N×corpus distance set.
    "knn_batch_probes" -> ((s, dir) => {
      val e = emb(s, dir)
      val probes = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      val scored = e.where(col("embedding").isNotNull)
        .crossJoin(broadcast(probes))
        .select(col("probe_id"), col("vec_id"),
          round(vector_distance(col("embedding"), col("pv"), "l2"), 6).as("distance"))
      scored.groupBy(col("probe_id"))
        .agg(knn_topk(col("distance"), col("vec_id"), 5).as("tk"))
        .select(col("probe_id"), posexplode(col("tk")))
        .select(col("probe_id"), (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("vec_id"), col("col.distance").as("distance"))
    }),

    // Hard-negative mining: per anchor, the 5 nearest DIFFERENT-label
    // corpus vectors (the contrastive-training companion op) — bounded
    // anchor broadcast, one corpus scan into per-anchor top-k heaps; the
    // oracle brute-forces the anchor×corpus distances with the label cut
    "hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.ops.Embeddings.hardNegatives(
        e.where(col("vec_id") % 50 === 0), "vec_id", "embedding", "label",
        e, "vec_id", "embedding", "label", k = 5, metric = "l2", roundDp = 6)
    }),

    // Per-label embedding centroids via the exact fixed-point vector_avg
    // aggregate: one (dim+1)-long buffer per group per task crosses the
    // shuffle — order-independent integer sums, so the result is
    // bit-reproducible at any partitioning (a plain double sum is not)
    "group_centroids" -> ((s, dir) =>
      emb(s, dir).where(col("embedding").isNotNull)
        .groupBy(col("label"))
        .agg(vector_avg(col("embedding"), Dim).as("c"))
        .select(col("label"), posexplode(col("c")))
        .select(col("label"), col("pos").cast("long").as("pos"),
          // q20 grid for the same decimal-half hazard as kmeans_iter
          (round(col("col") * 1048576.0) / 1048576.0).as("centroid"))),

    // Semantic outlier detection: each embedding's L2 distance to its OWN
    // label's exact fixed-point centroid, top-20 farthest — the noisy-
    // embedding filter. Centroids broadcast (few labels); the distance is
    // a sequential zip_with/aggregate fold (codegen'd built-ins, same
    // accumulation order as the oracle's list_sum)
    "embedding_outliers" -> ((s, dir) => {
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val cents = e.groupBy(col("label")).agg(vector_avg(col("embedding"), Dim).as("cent"))
      val scored = e.join(broadcast(cents), "label")
        .select(col("vec_id"), col("label"),
          round(sqrt(aggregate(
            zip_with(col("embedding"), col("cent"),
              (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
            lit(0.0), (acc, t) => acc + t)), 6).as("dist"))
      scored.orderBy(col("dist").desc, col("vec_id")).limit(20)
    }),

    // Top principal component by two distributed power iterations
    // (Embeddings.pcaTopComponent — the all-but-the-top / isotropy-audit
    // primitive): C·v as one scan per round with dim decimal partials,
    // fixed-point mean, 9-dp per-round handoffs. The oracle unrolls both
    // rounds — mean, dots, lane sums, normalization — independently
    "pca_top_component" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val (v, eig) = graft.ops.Embeddings.pcaTopComponent(e, "embedding", Dim, rounds = 2)
      v.zipWithIndex.map { case (x, i) => (i.toLong, x, eig) }
        .toDF("pos", "loading", "eigenvalue")
    }),

    // Top-2 components with Gram-Schmidt deflation (the general
    // all-but-the-top form): one power round per component, the second
    // iterated in the first's orthogonal complement — the oracle replays
    // mean, both C·v scans, BOTH deflations (9-dp re-rounds included),
    // and both normalizations
    "pca_top2" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val (vs, es) = graft.ops.Embeddings.pcaTopComponents(e, "embedding", Dim, d = 2, rounds = 1)
      vs.zipWithIndex.flatMap { case (v, ci) =>
        v.zipWithIndex.map { case (x, i) => (ci.toLong, i.toLong, x, es(ci)) }
      }.toDF("comp", "pos", "loading", "eigenvalue")
    }),

    // All-but-the-top: center + remove the power-iterated top component
    // for a 20-doc slice — a pure literal-projection scan (no shuffle);
    // the oracle recomputes mean, both rounds, AND the projection
    "abtt_embeddings" -> ((s, dir) => {
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val mu = graft.ops.Embeddings.meanVector(e, "embedding", Dim)
      val (v, _) = graft.ops.Embeddings.pcaTopComponent(e, "embedding", Dim, rounds = 2)
      graft.ops.Embeddings.removeTopComponent(
        e.where(col("vec_id") < 20), "vec_id", "embedding", Dim, mu, v)
    }),

    // SemDeDup assignment step: nearest vector_avg centroid per embedding.
    // The c-row centroid collect is driver-side like ivfCentroids; the
    // assignment itself is a pure map — centroid matrix as a literal,
    // per-row argmin over a HOF distance array, NO join and NO shuffle, so
    // at 100 TB it is one codegen-friendly scan. Ties break to the
    // smallest label (array_position finds the FIRST minimum; the oracle
    // orders by (dsq, label)).
    "centroid_assign" -> ((s, dir) => {
      val e = emb(s, dir).where(col("embedding").isNotNull)
      assignClusters(e)
        .select(col("vec_id"), col("cluster"),
          round(sqrt(array_min(col("ds"))), 6).as("dist"))
    }),

    // One full Lloyd iteration at scale shape: hash-sampled seeds (the IVF
    // coarse-quantizer sample), codegen'd argmin assignment (no join, the
    // seed matrix is a literal), exact fixed-point per-cell means — one
    // corpus scan plus one (dim+1)-longs-per-cell shuffle; the driver
    // loops this for k-means proper, each iteration identical
    "kmeans_iter" -> ((s, dir) => {
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val seeds = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      Ann.withClusters(e, "embedding", seeds)
        .groupBy(col("cluster"))
        .agg(vector_avg(col("embedding"), Dim).as("c"), count(lit(1)).as("n_members"))
        .select(col("cluster").cast("long").as("cell"), col("n_members"), posexplode(col("c")))
        .select(col("cell"), col("pos").cast("long").as("pos"),
          // q20 binary grid, NOT 6-dp decimal: the fixed-point mean is a
          // RATIONAL that can land exactly on a decimal half, where
          // engines disagree on the rounded double (observed at sf0.001:
          // 0.0313375 -> 0.031338 vs 0.031337); a binary .5 is exact
          (round(col("col") * 1048576.0) / 1048576.0).as("centroid"), col("n_members"))
    }),

    // TWO Lloyd iterations — the driver loop the kmeans_iter docstring
    // promises, gated: iteration 1's exact fixed-point means are rounded
    // to 6 dp and cast to FLOAT (the engine-portable centroid handoff,
    // same convention as the packed-vector gates), re-assigned, and
    // re-averaged; the oracle replays BOTH rounds including the float
    // cast and the survivor-cell re-indexing. Cells that lose every
    // member in round 1 drop out, exactly like a real Lloyd step
    "kmeans_iter2" -> ((s, dir) => {
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val seeds = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      val m1 = Ann.withClusters(e, "embedding", seeds)
        .groupBy(col("cluster"))
        .agg(vector_avg(col("embedding"), Dim).as("c"))
        .collect()
        .sortBy(_.getAs[Int]("cluster"))
      // q20 binary grid (k/2^20), NOT 6-dp decimal: a decimal half is not
      // representable in binary, so engines can disagree on which side a
      // computed double falls (observed once in 1024 lanes); a BINARY .5
      // boundary is exact, so scale-0 round agrees on every double, and
      // k/2^20 with |x|<1 is float-exact for the centroid handoff
      val cents2: Seq[Seq[Float]] = m1.toSeq.map(
        r => r.getSeq[Double](r.fieldIndex("c")).map(x =>
          (graft.kernels.Quantize.roundHalfUp(x * 1048576.0, 0) / 1048576.0).toFloat))
      Ann.withClusters(e, "embedding", cents2)
        .groupBy(col("cluster"))
        .agg(vector_avg(col("embedding"), Dim).as("c"), count(lit(1)).as("n_members"))
        .select(col("cluster").cast("long").as("cell"), col("n_members"), posexplode(col("c")))
        .select(col("cell"), col("pos").cast("long").as("pos"),
          (round(col("col") * 1048576.0) / 1048576.0).as("centroid"), col("n_members"))
    }),

    // SemDeDup end-to-end: exact vector_avg centroids → nearest-centroid
    // clusters → within-cluster prune of rows with a smaller-id ≥0.35
    // cosine neighbor (Dedup.semDeDup). The pair space is quadratic only
    // inside a cluster; the oracle restates clustering AND pruning
    "semdedup_keep" -> ((s, dir) => {
      val e = emb(s, dir).where(col("embedding").isNotNull)
      Dedup.semDeDup(assignClusters(e), "vec_id", "embedding", col("cluster"), 0.35)
    }),

    // the same batch k-NN join in PURE SQL: knn_topk registered as a SQL
    // aggregate (functions.registerSql) next to vector_distance, consumed
    // with GROUP BY + LATERAL VIEW posexplode — the SQL-parity form of
    // knn_batch_probes (identical oracle shape)
    "sql_knn_batch" -> ((s, dir) => {
      emb(s, dir).createOrReplaceTempView("embeddings")
      graft.functions.registerSql(s)
      s.sql(s"""
        |WITH pr AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 8),
        |d AS (SELECT /*+ BROADCAST(pr) */ pr.probe_id, e.vec_id,
        |        round(vector_distance(e.embedding, pr.pv, 'l2'), 6) AS distance
        |      FROM embeddings e CROSS JOIN pr WHERE e.embedding IS NOT NULL),
        |g AS (SELECT probe_id, knn_topk(distance, vec_id, 5) AS tk FROM d GROUP BY probe_id)
        |SELECT probe_id, CAST(pos + 1 AS BIGINT) AS rank, t.col.id AS vec_id, t.col.distance AS distance
        |FROM g LATERAL VIEW posexplode(tk) t AS pos, col""".stripMargin)
    }),

    // Binary-quantized k-NN entirely in SQL: sign_bits + hamming_distance
    // as registered SQL functions — the SQL-only user's path to the 32×
    // compressed scan
    "sql_binary_knn" -> ((s, dir) => {
      emb(s, dir).createOrReplaceTempView("embeddings")
      graft.functions.registerSql(s)
      val pvSql = probe.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ",", ")")
      s.sql(s"""
        |WITH sg AS (SELECT vec_id, sign_bits(embedding, $Dim) AS sig
        |            FROM embeddings WHERE embedding IS NOT NULL),
        |d AS (SELECT vec_id,
        |        hamming_distance(sig, sign_bits(CAST($pvSql AS ARRAY<FLOAT>), $Dim)) AS hamming
        |      FROM sg)
        |SELECT vec_id, hamming FROM d ORDER BY hamming, vec_id LIMIT $K""".stripMargin)
    }),

    // K1 + join-back idiom (reference README.md:96-99): k-NN ids → documents
    "knn_join_docs" -> ((s, dir) => {
      val knn = knnQuery("cosine")(s, dir)
      Knn.joinBack(knn, docs(s, dir), "vec_id", "doc_id")
        .select(col("doc_id"), col("distance"), col("source"))
    }),

    // Q1 pass 1: global quantization parameters (AUTO qtype resolution)
    "quantize_params" -> ((s, dir) => {
      val p = Quantizer.computeParams(emb(s, dir), "embedding")
      s.range(1).select(
        lit(p.qType.name).as("qtype"), lit(p.scale).as("q_scale"),
        lit(p.offset).as("q_offset"), lit(p.rows).as("n_rows"))
    }),

    // Q1 pass 2: per-row quantized codes, verified via exact integer sums
    "quantize_sums" -> ((s, dir) => {
      val (codes, p) = quantCodesDf(s, dir)
      codes.select(col("id").as("vec_id"), code_sum(col("code"), p.qType).as("code_sum"))
    }),

    // K2: approximate k-NN over codes (vector_quantize_scan), integer space
    "quant_knn_l2" -> quantKnn _,

    // CERTIFIED-EXACT quantized k-NN (beyond-reference): code-store
    // shortlist under the quantization-error bound -> exact rerank; the
    // oracle is the EXACT full-precision k-NN — hash-equality here IS the
    // exactness proof carried out end-to-end
    "quant_certified_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      val p = Quantizer.computeParams(e, "embedding")
      val codes = Quantizer.quantizeCodes(e, "vec_id", "embedding", p)
      Quantizer.certifiedTopK(e, "vec_id", "embedding", codes, probe, p, K, "l2")
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // K4: streaming code-space distances, no sort/limit (vector_quantize_scan_stream)
    "quant_stream_sq_l2" -> ((s, dir) => {
      val (codes, p) = quantCodesDf(s, dir)
      Quantizer.quantStream(codes, probe, p, "sq_l2")
        .select(col("id").as("vec_id"), col("distance").as("dist_sq"))
    }),

    // Q1+S3+S4+S2 full disk lifecycle: quantize → persisted parquet store +
    // sidecar (txn-committed dir) → read params and codes BACK FROM DISK →
    // quantized scan. Mirrors vector_quantize → _sqliteai_vector →
    // vector_quantize_scan (sqlite-vector.c:1406-1459, :451-491).
    "quant_lifecycle" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_quant").toString
      val storePath = s"$tmp/vector0_embeddings_embedding"
      val cfg = graft.VectorConfig.fromOptions(s"dimension=$Dim,type=FLOAT32,max_memory=30MB")
      Quantizer.quantize(emb(s, dir), "vec_id", "embedding", storePath, cfg, "embeddings", "embedding")
      val p = graft.catalog.VectorCatalog.readSidecar(s"$storePath/_vector_meta.json")
      val store = s.read.parquet(storePath)
      Quantizer.quantScan(store, probe, p, K, "sq_l2")
        .select(col("id").as("vec_id"), col("distance").as("dist_sq"))
    }),

    // Q1 over a PACKED f16 SOURCE column: grid-exact embeddings packed
    // to f16 blobs, then quantized END-TO-END from the blob (decode →
    // params → codes → store + sidecar → quantized scan over the
    // re-read store) — the reference's rebuild decodes every stored
    // element type (sqlite-vector.c:1199-1255). The 1/256 grid makes the
    // f16 round-trip the identity, so the oracle quantizes the SAME
    // gridded values: a decode bug (byte order, half-precision rounding)
    // shifts params and codes and value-fails
    "quant_lifecycle_f16" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_qf16").toString + "/store"
      val packed = emb(s, dir).select(col("vec_id"),
        pack_vector(grid256(col("embedding")), "f16").as("vecf16"))
      Quantizer.quantizeFrom(packed, "vec_id", "vecf16", graft.ElemType.F16, tmp, dim = Dim)
      val p = graft.catalog.VectorCatalog.readSidecar(s"$tmp/_vector_meta.json")
      Quantizer.quantScan(s.read.parquet(tmp), probe, p, K, "sq_l2")
        .select(col("id").as("vec_id"), col("distance").as("dist_sq"))
    }),

    // Incremental maintenance: quantize the even half (store + sidecar),
    // APPEND the odd half under the frozen sidecar params, scan the
    // combined store. The odd half's extrema may exceed the even half's
    // envelope by a hair (random halves), so this gate consciously opts
    // into onDrift="allow" — the oracle quantizes EVERY row with
    // even-half-only params INCLUDING the saturating clamp, so a
    // rebuild-instead-of-append (params drift) or a lost append
    // value-fails. The default-reject path is gated by quant_append_drift
    "quant_append" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_qa").toString + "/store"
      val e = emb(s, dir)
      Quantizer.quantize(e.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
        tmp, dim = Dim)
      Quantizer.quantizeAppend(e.where(col("vec_id") % 2 === 1), "vec_id", "embedding",
        tmp, dim = Dim, onDrift = "allow")
      val p = graft.catalog.VectorCatalog.readSidecar(s"$tmp/_vector_meta.json")
      Quantizer.quantScan(s.read.parquet(tmp), probe, p, K, "sq_l2")
        .select(col("id").as("vec_id"), col("distance").as("dist_sq"))
    }),

    // The ENFORCED envelope check (the certifiedTopK precondition turned
    // from documentation into a gate): build a store over the HALVED
    // corpus (exact float scaling — halving only shifts the exponent),
    // then attempt to append the unhalved corpus. Its extrema exceed the
    // halved envelope 2×, so the default onDrift="fail" must reject
    // BEFORE writing a byte — store_rows proves the store is untouched,
    // and the envelope/extrema columns restate the decision's inputs.
    // The oracle recomputes halved-corpus params, inverts the envelope,
    // and takes the full corpus's extrema, all independently
    "quant_append_drift" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_qad").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val half = e.select(col("vec_id"),
        transform(col("embedding"), x => (x / lit(2.0f)).cast("float")).as("embedding"))
      val (p, _) = Quantizer.quantize(half, "vec_id", "embedding", tmp, dim = Dim)
      val rejected =
        try { Quantizer.quantizeAppend(e, "vec_id", "embedding", tmp, dim = Dim); 0L }
        catch { case _: IllegalArgumentException => 1L }
      val storeRows = s.read.parquet(tmp).count()
      val (wmn, wmx) = Quantizer.waveExtrema(e, "embedding")
      // raw inverted bounds (without the internal ulp slack) — the
      // display convention both engines can restate exactly
      val (emn, emx) =
        if (p.qType == graft.QType.I8) (-(127.0 / p.scale), 127.0 / p.scale)
        else (p.offset, p.offset + 255.0 / p.scale)
      s.range(1).select(
        lit(rejected).cast("long").as("rejected"),
        lit(storeRows).cast("long").as("store_rows"),
        round(lit(emn), 6).as("env_min"), round(lit(emx), 6).as("env_max"),
        round(lit(wmn), 6).as("wave_min"), round(lit(wmx), 6).as("wave_max"))
    }),

    // S5 vector_quantize_preload: pin the code table in executor memory and
    // scan the cached copy — results must equal the uncached scan
    // (sqlite-vector.c:1338-1404; preload changes locality, never values)
    "quant_preload" -> ((s, dir) => {
      val (codes, p) = quantCodesDf(s, dir)
      val preloaded = Quantizer.preload(codes)
      Knn.topK(
        preloaded.select(col("id").as("vec_id"),
          code_distance(col("code"), lit(Quantizer.quantizeProbe(probe, p)), "sq_l2", p.qType).as("dist_sq")),
        col("dist_sq"), col("vec_id"), K)
    }),

    // Q2: vector_quantize_memory = Σ(8 + len(code)) (sqlite-vector.c:1160-1161)
    "quant_memory" -> ((s, dir) => {
      val (codes, _) = quantCodesDf(s, dir)
      s.range(1).select(lit(Quantizer.memoryBytes(codes)).as("bytes"))
    }),

    // S6 full-drop lifecycle: quantize → cleanup (store dir + sidecar
    // deleted, catalog params dropped — vector_quantize_cleanup parity,
    // sqlite-vector.c:1501-1524) → re-quantize from scratch → scan. The
    // boolean columns are real filesystem/catalog observations, not
    // constants: a cleanup that leaves the store or the params behind
    // flips them and fails the gate.
    "quant_cleanup" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_qclean").toString
      val storePath = s"$tmp/vector0_embeddings_embedding"
      val cfg = graft.VectorConfig.fromOptions(s"dimension=$Dim,type=FLOAT32,max_memory=30MB")
      Quantizer.quantize(emb(s, dir), "vec_id", "embedding", storePath, cfg, "emb_cleanup", "embedding")
      val existed = java.nio.file.Files.exists(java.nio.file.Paths.get(storePath))
      val hadParams = graft.catalog.VectorCatalog.quantParams("emb_cleanup", "embedding").isDefined
      Quantizer.cleanup(s, storePath, "emb_cleanup", "embedding")
      val storeDropped = existed &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(storePath))
      val paramsDropped = hadParams &&
        graft.catalog.VectorCatalog.quantParams("emb_cleanup", "embedding").isEmpty
      Quantizer.quantize(emb(s, dir), "vec_id", "embedding", storePath, cfg, "emb_cleanup", "embedding")
      val p = graft.catalog.VectorCatalog.readSidecar(s"$storePath/_vector_meta.json")
      Quantizer.quantScan(s.read.parquet(storePath), probe, p, K, "sq_l2")
        .select(col("id").as("vec_id"), col("distance").as("dist_sq"),
          lit(storeDropped).as("store_dropped"), lit(paramsDropped).as("params_dropped"))
    }),

    // The reference's primary SQL interface: eponymous table functions
    // (API.md:212-261), here as Catalyst TVFs — the whole query is a SQL
    // string, expanded to Project→Sort→Limit and planned as
    // TakeOrderedAndProject like the DataFrame path
    "sql_tvf_knn" -> ((s, dir) => {
      emb(s, dir).createOrReplaceTempView("embeddings")
      graft.catalog.VectorCatalog.init("embeddings", "embedding",
        VectorConfig(Dim, idCol = "vec_id"))
      graft.sql.GraftTableFunctions.register(s)
      val probeJson = probe.mkString("[", ",", "]")
      s.sql(s"SELECT id, distance FROM vector_full_scan('embeddings', 'embedding', '$probeJson', $K)")
    }),

    "sql_tvf_quant_knn" -> ((s, dir) => {
      emb(s, dir).createOrReplaceTempView("embeddings")
      graft.catalog.VectorCatalog.init("embeddings", "embedding",
        VectorConfig(Dim, idCol = "vec_id"))
      graft.sql.GraftTableFunctions.register(s)
      val (codes, p) = quantCodesDf(s, dir)
      codes.createOrReplaceTempView("vector0_embeddings_embedding")
      graft.catalog.VectorCatalog.putQuantParams("embeddings", "embedding", p)
      val probeJson = probe.mkString("[", ",", "]")
      s.sql(s"SELECT id, distance FROM vector_quantize_scan('embeddings', 'embedding', '$probeJson', $K)")
    }),

    // The dedup pipeline as pure SQL: near_dup_pairs expands to the SAME
    // Catalyst tree as the Scala API (no second implementation), so the
    // all-pairs Jaccard oracle gates the SQL surface end-to-end
    "sql_near_dup_pairs" -> ((s, dir) => {
      docs(s, dir).createOrReplaceTempView("documents")
      graft.sql.GraftTableFunctions.register(s)
      s.sql("""SELECT a, b, jaccard FROM near_dup_pairs('documents', 'doc_id', 'text', 0.9)
              |WHERE jaccard >= 0.9 ORDER BY jaccard DESC, a, b LIMIT 100""".stripMargin)
    }),

    "sql_containment_pairs" -> ((s, dir) => {
      docs(s, dir).createOrReplaceTempView("documents")
      graft.sql.GraftTableFunctions.register(s)
      s.sql("""SELECT a, b, containment FROM containment_pairs('documents', 'doc_id', 'text', 8, 0.8)
              |ORDER BY containment DESC, a, b LIMIT 100""".stripMargin)
    }),

    // The sentence-dedup pipeline as pure SQL: the TVF expands to the
    // same Catalyst tree as Dedup.sentenceDedup (string_hash61 key), so
    // the identical keep-first oracle gates the SQL surface end-to-end
    "sql_sentence_dedup" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(". Subscribe to our newsletter today! Cookies are required.")).as("text"))
        .createOrReplaceTempView("sdocs")
      graft.sql.GraftTableFunctions.register(s)
      s.sql("""SELECT doc_id, text AS text_deduped, n_sentences, n_removed
              |FROM sentence_dedup('sdocs', 'doc_id', 'text') ORDER BY doc_id""".stripMargin)
    }),

    // Automatic index selection in pure SQL: vector_scan expands to the
    // CERTIFIED-EXACT code-store plan when the pair is quantized (this
    // gate's setup quantizes, so the certified path runs) — and the
    // oracle is the EXACT full-precision k-NN, proving the silent plan
    // swap changed nothing
    "sql_auto_scan" -> ((s, dir) => {
      emb(s, dir).createOrReplaceTempView("embeddings")
      graft.catalog.VectorCatalog.init("embeddings", "embedding",
        VectorConfig(Dim, idCol = "vec_id"))
      graft.sql.GraftTableFunctions.register(s)
      val (codes, p) = quantCodesDf(s, dir)
      codes.createOrReplaceTempView("vector0_embeddings_embedding")
      graft.catalog.VectorCatalog.putQuantParams("embeddings", "embedding", p)
      val probeJson = probe.mkString("[", ",", "]")
      s.sql(s"SELECT id, round(distance, 6) AS distance " +
        s"FROM vector_scan('embeddings', 'embedding', '$probeJson', $K)")
    }),

    // The reference's full SQL lifecycle (API.md:53-168,
    // sqlite-vector.c:2581-2597) with ONLY spark.sql strings after
    // registration: view → vector_init → vector_quantize (returns row
    // count) → vector_quantize_preload → a scan joined with
    // vector_quantize_memory, then vector_quantize_cleanup. n_rows and
    // mem_bytes come back from the lifecycle functions themselves; the
    // oracle recomputes both from the base table.
    "sql_lifecycle" -> ((s, dir) => {
      graft.sql.GraftTableFunctions.register(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_sqllife").toString
      val probeJson = probe.mkString("[", ",", "]")
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW emb_sql AS SELECT * FROM parquet.`$dir/embeddings.parquet`")
      s.sql(s"SELECT vector_init('emb_sql', 'embedding', " +
        s"'dimension=$Dim,type=FLOAT32,id_column=vec_id,store_dir=$tmp')").collect()
      // the quantize return value (row count) comes back from the function
      // itself; it is interpolated into the final statement like the probe
      // (re-embedding the CALL would re-quantize at each re-analysis)
      val n = s.sql("SELECT vector_quantize('emb_sql', 'embedding', 'max_memory=30MB')")
        .head().getLong(0)
      s.sql("SELECT vector_quantize_preload('emb_sql', 'embedding')").collect()
      val out = s.sql(
        s"""SELECT q.id, q.distance,
           |  CAST($n AS BIGINT) AS n_rows,
           |  vector_quantize_memory('emb_sql', 'embedding') AS mem_bytes
           |FROM vector_quantize_scan('emb_sql', 'embedding', '$probeJson', $K) q""".stripMargin)
      val rows = out.collect()
      s.sql("SELECT vector_quantize_cleanup('emb_sql', 'embedding')").collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    }),

    // F2: vector_backend
    "vector_backend" -> ((s, _) => s.range(1).select(vector_backend().as("backend"))),

    // ---- packed BLOB columns: the reference's core storage form, all 5
    // element types exercised through PackedVectorDistance (the 25-kernel
    // dispatch, distance-cpu.c:21) with integer/grid-exact oracles ----

    // i8 codes (AUTO→INT8: data has negatives), squared-L2 k-NN in code space
    "packed_knn_i8" -> ((s, dir) => {
      val (codes, p) = quantCodesDf(s, dir)
      val qp = lit(Quantizer.quantizeProbe(probe, p))
      Knn.topK(
        codes.select(col("id").as("vec_id"),
          vector_distance_packed(col("code"), qp, "sq_l2", "i8").cast("long").as("dist_sq")),
        col("dist_sq"), col("vec_id"), K)
    }),

    // u8 codes (forced UINT8 asymmetric), squared-L2 k-NN
    "packed_knn_u8" -> ((s, dir) => {
      val e = emb(s, dir)
      val p = Quantizer.computeParams(e, "embedding", QType.U8)
      val codes = Quantizer.quantizeCodes(e, "vec_id", "embedding", p)
      val qp = lit(Quantizer.quantizeProbe(probe, p))
      Knn.topK(
        codes.select(col("id").as("vec_id"),
          vector_distance_packed(col("code"), qp, "sq_l2", "u8").cast("long").as("dist_sq")),
        col("dist_sq"), col("vec_id"), K)
    }),

    // i8 negated-dot kernel over every row (exact integer accumulation)
    "packed_dot_i8" -> ((s, dir) => {
      val (codes, p) = quantCodesDf(s, dir)
      val qp = lit(Quantizer.quantizeProbe(probe, p))
      codes.select(col("id").as("vec_id"),
        vector_distance_packed(col("code"), qp, "dot", "i8").cast("long").as("neg_dot"))
    }),

    // u8 L1 kernel over every row
    "packed_l1_u8" -> ((s, dir) => {
      val e = emb(s, dir)
      val p = Quantizer.computeParams(e, "embedding", QType.U8)
      val codes = Quantizer.quantizeCodes(e, "vec_id", "embedding", p)
      val qp = lit(Quantizer.quantizeProbe(probe, p))
      codes.select(col("id").as("vec_id"),
        vector_distance_packed(col("code"), qp, "l1", "u8").cast("long").as("l1_dist"))
    }),

    // i8 cosine kernel: integer sums → double → float, bit-exact restated
    "packed_cosine_i8" -> ((s, dir) => {
      val (codes, p) = quantCodesDf(s, dir)
      val qp = lit(Quantizer.quantizeProbe(probe, p))
      codes.select(col("id").as("vec_id"),
        vector_distance_packed(col("code"), qp, "cosine", "i8").cast("double").as("cos_dist"))
    }),

    // ---- packed FLOAT32: the reference's DEFAULT storage type
    // (sqlite-vector.c:1102), float-accumulation kernels
    // (distance-cpu.c:39-159). Over grid256 data every float partial sum is
    // exactly representable (granularity 2^-16, magnitude < 2^8 → ≤ 24-bit
    // mantissa), so float accumulation == the oracle's double restatement ----
    "packed_f32_sq_l2" -> ((s, dir) => {
      val pl = lit(graft.codec.VectorCodec.pack(probe, ElemType.F32))
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"),
          vector_distance_packed(pack_vector(grid256(col("embedding")), "f32"), pl, "sq_l2", "f32")
            .cast("double").as("dist_sq"))
    }),

    "packed_f32_l2" -> ((s, dir) => {
      val pl = lit(graft.codec.VectorCodec.pack(probe, ElemType.F32))
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"),
          vector_distance_packed(pack_vector(grid256(col("embedding")), "f32"), pl, "l2", "f32")
            .cast("double").as("distance"))
    }),

    "packed_f32_dot" -> ((s, dir) => {
      val pl = lit(graft.codec.VectorCodec.pack(probe, ElemType.F32))
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"),
          vector_distance_packed(pack_vector(grid256(col("embedding")), "f32"), pl, "dot", "f32")
            .cast("double").as("neg_dot"))
    }),

    // K1 over a packed f32 BLOB column (the reference's base-table shape)
    "packed_knn_f32" -> ((s, dir) => {
      val packed = emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"), pack_vector(grid256(col("embedding")), "f32").as("blob"))
      Knn.fullScanPacked(packed, "vec_id", "blob", probe, K, "sq_l2", "f32")
        .select(col("vec_id"), col("distance").cast("double").as("dist_sq"))
    }),

    // The 25th kernel-dispatch combo (f32 × cosine), gated by top-k IDS:
    // the f32 division's last-bit rounding is not portably restatable in
    // SQL (knn_cosine gates the cosine semantics in double), but the
    // RANKING it induces is — the oracle recomputes cosine in double over
    // the same grid values and must select the same k ids
    "packed_knn_f32_cosine" -> ((s, dir) => {
      val packed = emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"), pack_vector(grid256(col("embedding")), "f32").as("blob"))
      Knn.fullScanPacked(packed, "vec_id", "blob", probe, K, "cosine", "f32")
        .select(col("vec_id"))
    }),

    // f16: grid-quantize → pack binary16 → L2 kernel (double accumulation,
    // distance-cpu.c:164-197) — float-fidelity path, no rounding in output
    "packed_f16_l2" -> ((s, dir) => {
      val pl = lit(graft.codec.VectorCodec.pack(probe, ElemType.F16))
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"),
          vector_distance_packed(pack_vector(grid256(col("embedding")), "f16"), pl, "l2", "f16")
            .cast("double").as("distance"))
    }),

    // bf16: same through the bfloat16 codec + kernels (distance-cpu.c:318-466)
    "packed_bf16_l2" -> ((s, dir) => {
      val pl = lit(graft.codec.VectorCodec.pack(probe, ElemType.BF16))
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"),
          vector_distance_packed(pack_vector(grid256(col("embedding")), "bf16"), pl, "l2", "bf16")
            .cast("double").as("distance"))
    }),

    // F5 vector_as_f16 on a packed BLOB: pack → decode → exact grid sums
    "as_f16_blob" -> ((s, dir) =>
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"),
          round(aggregate(vector_as_f16(pack_vector(grid256(col("embedding")), "f16")),
            lit(0.0), (acc, x) => acc + x.cast("double")), 6).as("vec_sum"))),

    // F6 vector_as_bf16: pack → decode → exact grid sums (grid values are
    // exact in bf16 since |x| < 1 — see grid256)
    "as_bf16_blob" -> ((s, dir) =>
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"),
          round(aggregate(vector_as_bf16(pack_vector(grid256(col("embedding")), "bf16")),
            lit(0.0), (acc, x) => acc + x.cast("double")), 6).as("vec_sum"))),

    // F7 vector_as_i8 on a packed code BLOB: decode-to-float then exact sum
    "as_i8_blob" -> ((s, dir) => {
      val (codes, _) = quantCodesDf(s, dir)
      codes.select(col("id").as("vec_id"),
        aggregate(vector_as_i8(col("code")), lit(0L), (acc, x) => acc + x.cast("long")).as("code_sum"))
    }),

    // F8 vector_as_u8 (forced-UINT8 codes, & 0xff decode)
    "as_u8_blob" -> ((s, dir) => {
      val e = emb(s, dir)
      val p = Quantizer.computeParams(e, "embedding", QType.U8)
      Quantizer.quantizeCodes(e, "vec_id", "embedding", p)
        .select(col("id").as("vec_id"),
          aggregate(vector_as_u8(col("code")), lit(0L), (acc, x) => acc + x.cast("long")).as("code_sum"))
    }),

    // QUANTIZATION.md:46-72 recall harness: |approx ∩ exact| / k
    "recall_l2" -> ((s, dir) => {
      val exact = knnQuery("l2")(s, dir).select(col("vec_id"))
      val approx = quantKnn(s, dir).select(col("vec_id"))
      val inter = exact.join(approx, "vec_id").count()
      s.range(1).select(lit(K).cast("long").as("k"), lit(inter.toDouble / K).as("recall"))
    }),

    // F1: vector_version
    "vector_version" -> ((s, _) => s.range(1).select(vector_version().as("version"))),

    // Text-format ingest end-to-end: embeddings exported to CSV with
    // JSON-array vector cells, re-read via the CSV source + vector_as_f32
    // (the reference's JSON ingest path), then exact k-NN. Float values
    // survive toString/parse exactly, so the plain k-NN oracle applies.
    "csv_ingest_knn" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/emb"
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"),
          concat(lit("["), concat_ws(",", transform(col("embedding"), x => x.cast("string"))), lit("]")).as("vec_json"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
      val csv = s.read.option("header", "true")
        .schema("vec_id LONG, vec_json STRING").csv(tmp)
        .select(col("vec_id"), vector_as_f32(col("vec_json"), Dim).as("embedding"))
      val scored = Knn.distanceStream(csv, "vec_id", "embedding", probe, "l2")
        .withColumn("distance", round(col("distance"), 6))
      Knn.topK(scored, col("distance"), col("vec_id"), K)
    }),

    // JSON-lines ingest: vectors ride as native JSON arrays through
    // spark.read.json (schema'd array<float>), then straight into exact
    // k-NN — the second text-format source next to CSV; the reference's
    // JSON input path (sqlite-vector.c:1528-1653) without the string hop
    "json_ingest_knn" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString + "/emb"
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding")).write.mode("overwrite").json(tmp)
      val jsonl = s.read.schema("vec_id LONG, embedding ARRAY<FLOAT>").json(tmp)
      val scored = Knn.distanceStream(jsonl, "vec_id", "embedding", probe, "l2")
        .withColumn("distance", round(col("distance"), 6))
      Knn.topK(scored, col("distance"), col("vec_id"), K)
    }),

    // PERMISSIVE corrupt-record ingest: a JSONL delivery where every
    // doc_id%10==0 line is truncated mid-record. The schema'd read routes
    // broken lines to _corrupt_record instead of failing the job (the
    // only sane default when one bad line in a 100 TB delivery must not
    // kill the ingest), and the gate accounts for EVERY line: valid rows
    // aggregate, corrupt rows are counted — so a silently dropped or
    // mis-routed line value-fails against the oracle's replay of the
    // corruption rule
    "json_ingest_corrupt" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_jcorr").toString + "/in"
      docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("line",
          when(col("doc_id") % 10 === 0,
            lit("{\"doc_id\": ")) // truncated mid-record — unparseable
          .otherwise(to_json(struct(col("doc_id"), col("lang"), col("n_chars")))))
        .select("line").write.mode("overwrite").text(tmp)
      val parsed = s.read
        .schema("doc_id LONG, lang STRING, n_chars LONG, _corrupt_record STRING")
        .json(tmp)
      parsed.groupBy(coalesce(col("lang"), lit("_corrupt")).as("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
    }),

    // F4: vector_as_f32 JSON parse round-trip (values survive exactly)
    "as_f32_json" -> ((s, dir) =>
      emb(s, dir).select(col("vec_id"),
          vector_as_f32(concat(lit("["),
            concat_ws(",", transform(col("embedding"), x => x.cast("string"))), lit("]")), Dim).as("v"))
        .select(col("vec_id"),
          round(aggregate(col("v"), lit(0.0), (acc, x) => acc + x.cast("double")), 6).as("vec_sum"))),

    // ---- relational surface the reference delegates to SQLite ----
    "q1_pricing" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("date"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    "q3_revenue" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val li = tbl(s, dir, "lineitem")
      // aggregate BEFORE the join: grouping and join key coincide, so
      // summing first is semantically identical (per-key filter-then-sum ==
      // sum-then-filter) and the join touches one row per order instead of
      // every line item — and the groupBy's partitioning is reused by the
      // join, so the rewrite adds no shuffle
      // exact fixed-point money math: price and discount are 2-decimal
      // values, so cents are exact longs; the per-order product sum stays
      // far under 2^53, and sum/1e4 is the same double on every engine —
      // the long aggregate measures ~40% faster than the decimal one at
      // identical exactness (same trick as the vector_avg aggregate)
      val rev = li.groupBy(col("l_orderkey"))
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))) / lit(10000.0)).as("revenue"))
      rev.join(orders.select(col("o_orderkey")), rev("l_orderkey") === col("o_orderkey"), "left_semi")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "join_region_customers" -> ((s, dir) => {
      val region = tbl(s, dir, "region"); val nation = tbl(s, dir, "nation")
      val cust = tbl(s, dir, "customer")
      cust.join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("num_customers"),
          sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("sum_acctbal"))
    }),

    "window_top_orders" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
    }),

    "semi_join_orders" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val rich = tbl(s, dir, "customer").where(col("c_acctbal") > 5000).select(col("c_custkey"))
      orders.join(rich, orders("o_custkey") === rich("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_orders"))
    }),

    "events_by_type" -> ((s, dir) =>
      tbl(s, dir, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))),

    // ROLLUP hierarchy aggregate (grouping sets): one shuffle produces
    // the (flag, status), (flag) and () grouping levels; NULL group keys
    // are coalesced to a sentinel on both sides so the hash compare sees
    // identical strings, and grouping_id disambiguates data-vs-subtotal
    // rows. Sums ride exact decimals; both engines agree on the
    // first-arg-is-MSB grouping bit order (verified empirically).
    "rollup_pricing" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("gid"), col("n"), col("sum_qty"), col("sum_price"))),

    // Pivot (wide aggregation): one shuffle on the group key with the
    // pivot values folded into conditional aggregates — identical plan to
    // the oracle's FILTER restatement; sums ride exact decimals
    "pivot_returns" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")),

    // Set operations under SQL set semantics (dedup both sides): corpus
    // overlap between the even- and odd-source halves — INTERSECT for the
    // shared texts, EXCEPT for the seen-only remainder. The two scalar
    // counts ride a 2-row union, not a join, so the plan stays inside the
    // no-nested-loop guard.
    "setop_texts" -> ((s, dir) => {
      val d = docs(s, dir)
      val srcNum = substring(col("source"), 4, 10).cast("int")
      val a = d.where(srcNum % 2 === 0).select("text")
      val b = d.where(srcNum % 2 === 1).select("text")
      a.intersect(b).agg(lit("common").as("which"), count(lit(1)).as("n"))
        .unionByName(
          a.except(b).agg(lit("only_even").as("which"), count(lit(1)).as("n")))
    }),

    // t-digest-style approximate median vs the exact percentile, gated by
    // an ok band (the ivf_recall pattern): l_quantity is integer-spaced,
    // and at accuracy 10000 the rank error is ≤ N/10000, so the
    // approximate median must land within one quantity step of truth
    "approx_quantile_ok" -> ((s, dir) =>
      tbl(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("ap"))
        .select(col("l_returnflag"), col("p50"),
          (abs(col("ap") - col("p50")) <= 1.0).as("ok"))),

    // Exact sample variance from decimal power sums: Σx and Σx² are
    // exact integers, the final (sumsq − sum²/n)/(n−1) is the identical
    // double expression tree on both engines, rounded to 6 dp
    "variance_by_lang" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars").cast("decimal(38,0)")).cast("double").as("s1"),
          sum((col("n_chars") * col("n_chars")).cast("decimal(38,0)")).cast("double").as("s2"))
        .select(col("lang"), col("n"),
          round((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1), 6)
            .as("var_chars"))),

    // BPE tokenizer training (Sennrich et al. 2016), 6 merge rounds over
    // the corpus vocabulary: each round = one distributed weighted
    // pair-count + driver argmax + codegen'd greedy merge; the oracle
    // replays all six rounds independently in DuckDB (window-function
    // greedy selection), so count weighting, tie-breaks AND the
    // left-to-right non-overlap merge semantics must all agree
    "bpe_merges" -> ((s, dir) => {
      val vocab = docs(s, dir)
        .select(explode(Curation.cleanTokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
      val ms = graft.ops.Bpe.learn(vocab, "word", "n", 6)
      import s.implicits._
      ms.map { case (r, a, b, c) => (r.toLong, a, b, c) }.toDF("round", "a", "b", "cnt")
    }),

    // byte-level (GPT-2-family) pretokenization + byte→unicode mapping:
    // the appended tail plants contractions, a double-space run (the
    // lookahead rule: run yields its last space to the next token),
    // multi-byte UTF-8 (é = 2 bytes, … = 3 — each byte maps to its own
    // visible char), a digit run and a punctuation run. The oracle
    // replays the injection split and walks the same byte alphabet
    // (generated from the shared bytes_to_unicode formula)
    "bytebpe_pretokenize" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(ByteBpeExtra)).as("text"))
      graft.ops.Bpe.byteLevelPretokens(d, "doc_id", "text")
    }),

    // byte-level BPE ENCODE under a literal merge table (rank order,
    // chained merges Ġ+t → Ġt+h → Ġth+e, and an l+l merge whose "llll"
    // run exercises greedy non-overlap odd-rank selection); the oracle
    // replays pretokenize + mapping + every merge round over the
    // distinct-piece working set and joins back to positions
    "bytebpe_encode" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(ByteBpeExtra)).as("text"))
      graft.ops.Bpe.byteLevelEncode(d, "doc_id", "text", ByteBpeMerges)
    }),

    // unigram-LM (SentencePiece-style) tokenizer training: 2 hard-EM
    // rounds over the corpus word vocabulary (pieces <= 4 chars, 40
    // multi-char candidates kept per round); the oracle replays init +
    // both rounds with the identical packed-integer Viterbi
    "unigram_vocab" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(explode(Curation.cleanTokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
      graft.ops.Unigram.learn(words, "word", "n", maxPieceLen = 4, topKeep = 40, rounds = 2)
        .select(col("tok"), col("c").as("cnt"))
    }),

    // encode every trainable corpus word with the trained vocabulary —
    // the full train-then-apply path; the oracle re-trains AND re-encodes
    "unigram_encode" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(explode(Curation.cleanTokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
      val vocab = graft.ops.Unigram.learn(words, "word", "n", 4, 40, 2)
      graft.ops.Unigram.encode(words, "word", "n", vocab, 4)
    }),

    // WordPiece (BERT-style) vocabulary fixture: every single-char piece
    // (head + ##continuation) plus the top-40 multi-char pieces by
    // weighted positioned-occurrence count; the oracle restates the
    // identical cut (the encoder below is the operator under test —
    // WordPiece vocabs are TRAINED like BPE, so the vocab rule here is a
    // deterministic fixture, not a training algorithm claim)
    "wordpiece_vocab" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(explode(Curation.cleanTokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
      graft.ops.Wordpiece.vocab(words, "word", "n", maxPieceLen = 4, topKeep = 40)
        .orderBy("piece")
    }),

    // greedy longest-match-first WordPiece encode of every corpus word
    // against that vocabulary — whole-word [UNK] on any stall (the
    // HuggingFace semantics); the oracle rebuilds the vocab and replays
    // the greedy walk as a recursive CTE over the per-position longest
    // matches
    "wordpiece_encode" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(explode(Curation.cleanTokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
      val v = graft.ops.Wordpiece.vocab(words, "word", "n", maxPieceLen = 4, topKeep = 40)
      graft.ops.Wordpiece.encode(words, "word", "n", v, maxPieceLen = 4)
    }),

    // BPE encoding with the learned merges: per-doc symbol totals after
    // applying the 6-round merge table (the applyMerges end-to-end path);
    // the oracle re-learns AND re-applies everything independently
    "bpe_encode" -> ((s, dir) => {
      val d = docs(s, dir)
      val vocab = d.select(explode(Curation.cleanTokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
      val ms = graft.ops.Bpe.learn(vocab, "word", "n", 6).map(m => (m._2, m._3))
      val words = d.select(col("doc_id"), explode(Curation.cleanTokens(col("text"))).as("word"))
        .where(length(col("word")) > 0)
        .withColumn("syms", transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))))
      graft.ops.Bpe.applyMerges(words, "syms", ms)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(size(col("syms"))).as("n_symbols"))
    }),

    // Per-group z-score normalization: exact decimal power sums over one
    // window shuffle, per-row (x - mean)/sigma as the identical double
    // tree on both engines (the variance_by_lang contract applied per row)
    "zscore_by_lang" -> ((s, dir) =>
      Curation.zscoreByGroup(
          docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
          "n_chars", "lang")
        .select(col("doc_id"), col("lang"), col("z"))),

    // Edit-distance-1 vocabulary pairs via SymSpell deletion blocking
    // (lossless: lev<=1 <=> shared deletion variant) + exact levenshtein
    // verify; the oracle brute-forces the quadratic pair space with
    // DuckDB's own independent levenshtein implementation. The corpus
    // vocabulary is augmented with INJECTED typos (first char of the
    // first token of every doc_id%11 doc dropped) so the gate's pair set
    // is non-empty by construction, like pii_redact's injected identifiers
    "edit_pairs" -> ((s, dir) => {
      val d = docs(s, dir)
      val toks = d.select(explode(Curation.cleanTokens(col("text"))).as("word"))
      val t1 = element_at(Curation.cleanTokens(col("text")), 1)
      val typos = d.where(col("doc_id") % 11 === 0)
        .select(t1.substr(lit(2), length(t1) - 1).as("word"))
        .where(col("word").isNotNull && length(col("word")) > 0)
      TextAnalysis.editPairs(toks.unionByName(typos), "word")
    }),

    // CUBE: all four grouping levels — (flag,status), (flag), (status),
    // () — from one Expand+shuffle, same exactness contract as ROLLUP
    "cube_pricing" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("gid"), col("n"), col("sum_qty"))),

    // Per-group exact quartiles (counting aggregate, no global sort);
    // 100 TB swaps in approx_percentile with the same plan shape
    "lang_percentiles" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang"))
        .agg(round(expr("percentile(n_chars, 0.25)"), 6).as("p25"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("p50"),
          round(expr("percentile(n_chars, 0.75)"), 6).as("p75"))),

    // Window-frame running aggregates per user: 4-event moving average
    // and running total. Frame sums ride decimal(18,4) so neither
    // engine's frame-evaluation order (sequential vs segment tree) can
    // produce float jitter; the mean divides two exact values in double.
    "moving_avg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val frame = order.rowsBetween(-3, 0)
      val cum = order.rowsBetween(Window.unboundedPreceding, 0)
      tbl(s, dir, "events").select(col("event_id"),
        round(sum(col("value").cast("decimal(18,4)")).over(frame).cast("double") /
          count(lit(1)).over(frame), 6).as("mavg4"),
        sum(col("value").cast("decimal(18,4)")).over(cum).cast("double").as("cum_value"))
    }),

    // Schema'd JSON extraction from the event payload column — the
    // semi-structured hop every clickstream/crawl pipeline starts with
    "props_json" -> ((s, dir) =>
      tbl(s, dir, "events")
        .where(col("event_id") % 20 === 0)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))),

    // Count-min-sketch point frequencies vs exact counts: one-sided-error
    // ok band (est in [exact, exact + 3*eps*N]) — the fixed-size per-key
    // frequency summary next to Misra-Gries (heavy_hitters) and HLL
    // (hll_distinct); seed-deterministic, order-independent
    "cms_counts" -> ((s, dir) =>
      Curation.cmsCounts(tbl(s, dir, "events"), "user_id", (0L until 20L).toSeq)),

    // HLL++ cardinality sketch vs exact distinct: the ok flag asserts the
    // estimate lands within 5% of truth (rsd=0.01), the ivf_recall gate
    // pattern — the sketch path is what replaces COUNT(DISTINCT)'s
    // full shuffle at 100 TB
    "hll_distinct" -> ((s, dir) =>
      tbl(s, dir, "events").groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("est"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("est").cast("double") / col("exact_users") - 1) <= 0.05).as("ok"))),

    // ORC sink/source round-trip: the third storage format next to
    // parquet and the text sources — written column-pruned, read back,
    // aggregated; the oracle reads the ORIGINAL parquet, so any
    // write/read corruption value-fails
    "orc_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/docs"
      docs(s, dir).select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // Event-time tumbling-window aggregation (graft.streaming.Streams):
    // the same declarative plan Structured Streaming runs under a
    // watermark, gated here in batch where it is oracle-restatable
    // (epoch-aligned 1-hour buckets, exact decimal sums)
    "events_windowed" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      graft.streaming.Streams.windowedAgg(
        e, graft.streaming.Streams.eventTime(e),
        "event_type", "1 hour", "value")
    }),

    // Bucketed co-located join: both tables written bucketBy(8, orderkey)
    // through the catalog, joined WITHOUT a shuffle on either side (the
    // fact table pays its shuffle once at write time — zero-Exchange join
    // asserted in SparkOpsSpec); exact cents revenue per priority class
    "bucketed_join" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bkt").toString
      graft.ops.Joins.writeBucketed(tbl(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        "b_orders", s"$tmp/orders", "o_orderkey", 8)
      graft.ops.Joins.writeBucketed(
        tbl(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
        "b_lineitem", s"$tmp/lineitem", "l_orderkey", 8)
      s.table("b_orders")
        .join(s.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))) / lit(10000.0)).as("revenue"))
    }),

    // Hive-partitioned event store: write partitioned by event_type, read
    // back filtered to 2 of 5 types — the filter prunes at FILE-LISTING
    // time (only matching partition dirs are touched; asserted via
    // numFiles in SparkOpsSpec like the LSH store), then exact-decimal
    // aggregate. Oracle filters the ORIGINAL parquet, so a partition
    // write/read corruption or a pruning bug that drops rows value-fails
    "events_partitioned_agg" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_evp").toString + "/events"
      tbl(s, dir, "events").select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      s.read.parquet(tmp)
        .where(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
    }),

    // DYNAMIC partition pruning: the event-type dim table (on storage,
    // so its filter survives to the optimized plan) is filtered to the
    // 'conversion' category, and the surviving keys prune the fact
    // store's partition DIRECTORIES at runtime via the broadcast-reused
    // IN subquery — the join-driven third file-skipping lever after
    // static partition filters and buckets. The spec asserts
    // dynamicpruningexpression in the fact scan + fewer files read than
    // the store holds; this gate proves the pruned plan loses no rows
    // (oracle joins the ORIGINAL parquet against the same derived dim)
    "events_dpp_agg" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_dpp").toString
      tbl(s, dir, "events").select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").partitionBy("event_type").parquet(base + "/events")
      tbl(s, dir, "events").select(col("event_type").as("etype")).distinct()
        .withColumn("category", when(col("etype").isin("purchase", "signup"),
          "conversion").otherwise("engagement"))
        .write.mode("overwrite").parquet(base + "/dim")
      val fact = s.read.parquet(base + "/events")
      val dim = s.read.parquet(base + "/dim").where(col("category") === "conversion")
      graft.ops.Joins.dimPrunedFactJoin(fact, "event_type", dim, "etype")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
    }),

    // Schema evolution across append waves: wave 1 lands without
    // event_type, wave 2 adds the column — the normal life of a 100 TB
    // store whose upstream grows fields. The mergeSchema read unions the
    // footer schemas and back-fills NULL for pre-evolution rows; the
    // aggregate accounts for every row in both waves, so a dropped wave,
    // a misaligned column, or a non-null backfill value-fails
    "schema_evolution_agg" -> ((s, dir) => {
      val store = java.nio.file.Files.createTempDirectory("graft_sev").toString + "/waves"
      val e = tbl(s, dir, "events")
      e.where(col("event_id") % 2 === 0).select("event_id", "user_id", "value")
        .write.mode("overwrite").parquet(store)
      e.where(col("event_id") % 2 === 1)
        .select("event_id", "user_id", "value", "event_type")
        .write.mode("append").parquet(store)
      s.read.option("mergeSchema", "true").parquet(store)
        .groupBy(coalesce(col("event_type"), lit("unknown")).as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
    }),

    // Tombstone delete sidecar on an immutable store: two takedown waves
    // append ids, the merge-on-read scan anti-joins them out (AQE
    // broadcasts the takedown-sized side; the corpus never shuffles or
    // rewrites). Oracle filters the ORIGINAL parquet by the same id
    // rules, so a tombstone dropped/over-applied anywhere value-fails
    "tombstone_scan" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_tomb").toString
      val d = docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      d.write.mode("overwrite").parquet(base + "/store")
      graft.ops.Layout.appendTombstones(
        d.where(col("doc_id") % 7 === 0), "doc_id", base + "/tombs")
      graft.ops.Layout.appendTombstones(
        d.where(col("doc_id") % 11 === 0), "doc_id", base + "/tombs")
      graft.ops.Layout.readWithTombstones(s, base + "/store", base + "/tombs", "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // Upsert sidecar (latest-wins merge-on-read): wave 1 replaces every
    // doc_id%5==0 row (+1000 chars), wave 2 re-replaces the %10==0
    // subset (+2000) — the read must resolve the winner per id inside
    // the recrawl-sized sidecar and never shuffle the base. Oracle
    // replays the wave precedence as one CASE
    "upsert_scan" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_ups").toString
      val d = docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      d.write.mode("overwrite").parquet(base + "/store")
      graft.ops.Layout.appendUpserts(
        d.where(col("doc_id") % 5 === 0)
          .withColumn("n_chars", col("n_chars") + 1000L), base + "/ups", wave = 1)
      graft.ops.Layout.appendUpserts(
        d.where(col("doc_id") % 10 === 0)
          .withColumn("n_chars", col("n_chars") + 2000L), base + "/ups", wave = 2)
      graft.ops.Layout.readWithUpserts(s, base + "/store", base + "/ups", "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // Gap-based sessionization (built-in session_window; diff > gap
    // starts a new session — the close boundary is inclusive — and
    // s_end = last event + gap)
    "event_sessions" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      graft.streaming.Streams.sessionize(
        e, graft.streaming.Streams.eventTime(e),
        "user_id", "30 minutes", "value")
    }),

    // Point-in-time join: each purchase picks up the most recent strictly-
    // earlier click by the same user (NULL payload when none). Oracle is
    // DuckDB's NATIVE ASOF JOIN — an independent engine implementation of
    // the semantics, not a restatement of our window trick. Timestamps are
    // truncated to MICROseconds first (exact integral division): DuckDB
    // reads TIMESTAMP(NANOS) parquet at micro precision, so comparing at
    // nanos would diverge on sub-μs orderings the oracle cannot see (the
    // events tables have no (user, μs) collisions at any SF).
    "asof_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events").withColumn("ts",
        graft.streaming.Streams.eventEpochUs(tbl(s, dir, "events")))
      graft.streaming.Streams.asofJoin(
        e.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        e.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", Seq("event_id", "ts", "value"))
    }),

    // Bucketed range join: every purchase within 7 days at-or-after a
    // signup by the same user, 1-day buckets (signups replicate ~8×; each
    // qualifying pair meets in exactly the purchase's bucket). Oracle is
    // the naive BETWEEN join — DuckDB plans IEJoin, we plan the bucketed
    // equi-join; same answer, different engines' native range strategies.
    "interval_join" -> ((s, dir) => {
      // micro-precision ts for the same DuckDB-TIMESTAMP-precision reason
      // as asof_join
      val e = tbl(s, dir, "events").withColumn("ts",
        graft.streaming.Streams.eventEpochUs(tbl(s, dir, "events")))
      val day = 86400L * 1000000L
      graft.streaming.Streams.intervalJoin(
        e.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        e.where(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id"),
            col("ts").as("start_ts"), (col("ts") + lit(7 * day)).as("end_ts")),
        "user_id", "ts", "start_ts", "end_ts", day,
        Seq("signup_id", "start_ts"))
    }),

    // Skew-salted join: events (hot user keys — ~300 users over 100k rows
    // at sf0.1) pick up a per-user dim on (key, salt) with the dim
    // replicated 16×, so one hot user spreads over 16 shuffle partitions.
    // Oracle is the plain join — same rows, different physical strategy.
    "salted_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val dim = e.groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
      graft.ops.Joins.saltedJoin(
        e.select("event_id", "user_id", "event_type"), "event_id",
        dim, "user_id", 16, Seq("n_user_events"))
    }),

    // Corpus length-distribution percentiles: exact linear-interpolation
    // percentile (Spark's one-pass counting aggregate — no global sort)
    // over the per-doc token count, vs DuckDB quantile_cont. At 100 TB the
    // same query swaps in approx_percentile(…, accuracy) — same plan
    // shape, bounded state; the exact form is the gate because the
    // t-digest sketch is engine-specific.
    "token_percentiles" -> ((s, dir) => {
      val n = TextAnalysis.tokenCount(col("text")).as("n")
      docs(s, dir).select(n).agg(
        round(expr("percentile(n, 0.10)"), 6).as("p10"),
        round(expr("percentile(n, 0.25)"), 6).as("p25"),
        round(expr("percentile(n, 0.50)"), 6).as("p50"),
        round(expr("percentile(n, 0.75)"), 6).as("p75"),
        round(expr("percentile(n, 0.90)"), 6).as("p90"),
        round(expr("percentile(n, 0.99)"), 6).as("p99"))
    }),

    // Incremental exact dedup (continuous-ingest shape): odd-id docs are
    // the arriving batch, even-id docs the accumulated corpus; the
    // anti-join runs on 16-byte content fingerprints while the oracle
    // restates it on raw text equality — a fingerprint collision at gate
    // scale would hash-mismatch
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.dedupAgainst(
        d.where(col("doc_id") % 2 === 1).select("doc_id", "text"),
        d.where(col("doc_id") % 2 === 0), "text")
        .select("doc_id")
    }),

    // Incremental NEAR-dup: odd-id batch screened against the even-id
    // seen corpus's MinHash index — band-bucket candidates, exact-Jaccard
    // verify, anti-join; oracle = exact cross-half NOT EXISTS at the same
    // threshold (pipeline and gate both at 0.9, the LSH guard band)
    "near_dup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val store = Dedup.nearDupStore(d.where(col("doc_id") % 2 === 0),
        "doc_id", "text", numHashes = 128, bands = 16, shingleN = 4)
      Dedup.nearDupAgainst(d.where(col("doc_id") % 2 === 1).select("doc_id", "text"),
        store, "doc_id", "text", numHashes = 128, bands = 16, shingleN = 4,
        threshold = 0.9)
        .select("doc_id")
    }),

    // CCNet-style LM quality signal: per-doc mean unigram logprob under
    // the corpus's own unigram LM; per-token logp rounded to 9 dp and
    // summed as decimal(38,9) so the unordered reduce is exact
    "lm_logprob" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(docs(s, dir), "doc_id", "text")),

    // CCNet-style per-language head/middle/tail thirds over the unigram
    // LM score (train-on-the-head stratification): rank-based equal
    // thirds on the deterministic (mean_logp desc, doc_id) order; the
    // oracle recomputes the LM replay AND the split with DuckDB's own
    // ntile — an independent engine's implementation of the same
    // standard SQL bucketing, the asof_join pattern
    "ccnet_buckets" -> ((s, dir) => {
      val lp = TextAnalysis.unigramLogProb(docs(s, dir), "doc_id", "text")
      graft.ops.Curation.ccnetBuckets(
        lp.join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id"),
        "doc_id", "lang", col("mean_logp"))
        .select(col("doc_id"), col("lang"), col("mean_logp"), col("bucket"))
    }),

    // HTTP redirect-chain resolution over a planted alias web: per host
    // a 4-hop 301/302/308 chain onto a terminal page, a 2-cycle that
    // must stop at maxHops with terminal=false, a 200 WITH a Location
    // header (must contribute no edge — the status filter trap) and a
    // 301 WITHOUT one (dropped). Oracle = the chain decision table from
    // the fixture formulas; neither the parser nor the walk appears
    "redirect_resolve" -> ((s, dir) => {
      val f = s.range(80).select((col("id") / 8).cast("long").as("k"),
        (col("id") % 8).as("j"))
      val kS = col("k").cast("string")
      def u(path: Column) = concat(lit("https://h"), kS, lit(".com/"), path)
      val url = u(when(col("j") <= 4, concat(lit("p"), col("j").cast("string")))
        .when(col("j") === 5, lit("c0"))
        .when(col("j") === 6, lit("c1")).otherwise(lit("n0")))
      val status = when(col("j") === 4, lit("200 OK"))
        .when(col("j") === 3, lit("308 Permanent Redirect"))
        .when(col("j") === 5, lit("303 See Other")) // c0→c1 cycle edge rides a 303
        .when(col("j") % 2 === 0 || col("j") === 7, lit("301 Moved Permanently"))
        .otherwise(lit("302 Found"))
      val dst = u(when(col("j") <= 3, concat(lit("p"), (col("j") + 1).cast("string")))
        .when(col("j") === 4, lit("bogus"))
        .when(col("j") === 5, lit("c1")).otherwise(lit("c0")))
      val payload = concat(lit("HTTP/1.1 "), status, lit("\r\nServer: x\r\n"),
        when(col("j") =!= 7, concat(lit("Location: "), dst, lit("\r\n")))
          .otherwise(lit("")),
        lit("\r\nbody"))
      val edges = graft.ops.Warc.redirectEdges(
        f.select(url.as("url"), payload.as("payload")), "url", "payload")
      graft.ops.Warc.resolveRedirects(edges, "src", "dst", maxHops = 4)
    }),

    // Bloom-prefiltered incremental dedup: same semantics as
    // dedup_incremental on a source-parity split, but the anti-join input
    // is shrunk by a distributed-built Bloom filter (no false negatives →
    // bypassed rows are provably fresh; accepted rows are exactly
    // confirmed). Oracle restates on raw text NOT EXISTS, so both the
    // bypass and the confirm path are value-gated.
    "bloom_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val srcNum = substring(col("source"), 4, 10).cast("int")
      Dedup.dedupAgainstBloom(
        d.where(srcNum % 2 === 1).select("doc_id", "text"),
        d.where(srcNum % 2 === 0), "text",
        // sized for the gate corpus (~10 bits/item); production callers
        // size for their seen-side cardinality — 1 MiB literals in every
        // plan node make plan dumps unwieldy, so don't oversize
        expectedItems = 1L << 10, numBits = 1L << 14)
        .select("doc_id")
    }),

    // PII redaction over deterministically injected identifiers (the
    // synthetic corpus contains none): an email, a phone and an IPv4
    // derived from doc_id are appended to each text, then masked by the
    // same RE2-safe regexp_replace chain both engines evaluate
    "pii_redact" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Curation.redactPii(concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1555000"), col("doc_id").cast("string"),
          lit(" from 10.0.0."), (col("doc_id") % 256).cast("string")))
          .as("clean"))),

    // Context-window chunking: 32-token windows every 24 tokens
    // (8-token overlap), the doc → training-piece explode
    "doc_chunks" -> ((s, dir) =>
      Curation.chunk(docs(s, dir), "doc_id", "text", 32, 24)),

    // Model-based quality scoring: linear classifier over integer-exact
    // features with micro-integer weights — the logit is an exact BIGINT
    // and the accept decision is sign-exact (no exp() on either engine)
    "quality_classifier" -> ((s, dir) =>
      Curation.scoreLinear(docs(s, dir), "doc_id", "text")),

    // distributed logistic-regression TRAINING (3 batch-GD rounds,
    // softsign sigmoid surrogate, 9-dp decimal gradient sums — the
    // pagerank round-replay recipe): the oracle replays every round
    // independently, so a wrong gradient, wrong feature grid, wrong
    // label rule or lost round value-fails on the final weights
    "logreg_train" -> ((s, dir) => {
      val w = Curation.logregTrain(docs(s, dir), "doc_id", "text")
      s.range(1).select(
        lit(w(0).doubleValue).as("w_bias"), lit(w(1).doubleValue).as("w_words"),
        lit(w(2).doubleValue).as("w_stop"), lit(w(3).doubleValue).as("w_symbols"))
    }),

    // inference with the freshly TRAINED model (train + score in one
    // gate): per-doc softsign probability at 6 dp and the sign-exact
    // accept; the oracle replays training then scores independently
    "quality_classifier_learned" -> ((s, dir) => {
      val d = docs(s, dir)
      val w = Curation.logregTrain(d, "doc_id", "text")
      Curation.logregScore(d, "doc_id", "text", w)
    }),

    // Full outer join: both dangling sides preserved — customers without
    // orders and (none in this data) orders without customers — reduced
    // to exact counts and a decimal revenue total
    "outer_join_counts" -> ((s, dir) => {
      val c = tbl(s, dir, "customer").select(col("c_custkey"))
      val o = tbl(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .agg(count(lit(1)).as("n_rows"),
          count(when(o("o_custkey").isNull, 1)).as("n_customers_no_orders"),
          count(when(c("c_custkey").isNull, 1)).as("n_orders_no_customer"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    }),

    // ---- text analysis (documents) ----
    "text_stats" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.distinctTokenCount(col("text")).as("n_distinct"),
        TextAnalysis.stopwordCount(col("text")).as("n_stop"),
        length(col("text")).cast("long").as("n_chars_m"))),

    // BPE-ish subword counting (letter runs + single digits + single
    // punctuation): the pre-tokenization shape merge-based vocabularies
    // use, next to the whitespace word count for the ratio
    "subword_counts" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.subwordTokenCount(col("text")).as("n_subword"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"))),

    "quality_score" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("score"))),

    "lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))),

    // script-gated lang ID over 25 languages: one planted sentence per
    // language (built from that language's function words in its own
    // script), doc_id % 25 selects it. The oracle is the DECISION TABLE
    // from the fixture formula — scriptMix, the marker tables and the
    // argmax never appear in it, so a wrong script split or a
    // cross-language marker collision value-fails
    "lang_id_script" -> ((s, dir) => {
      val sent = element_at(array(LangSentences.map(lit): _*),
        (col("doc_id") % LangSentences.length + 1).cast("int"))
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.langIdScript(sent).as("lang_pred"))
    }),

    "fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))),

    // Char-level Shannon entropy (bits/char): base64-blob / boilerplate
    // detector; per-row fold, no shuffle
    "char_entropy" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.charEntropy(col("text")).as("entropy"))),

    // Top TF-IDF (doc, term) pairs; exact ties (equal tf, df) break on
    // (term, doc_id), both sides rank the rounded score
    // Okapi BM25 against a 3-term query: per-row codegen'd tf folds (the
    // corpus never shuffles), one scalar stats aggregation, 6-dp-rounded
    // scores; top-50 with id tie-break
    "bm25_top" -> ((s, dir) =>
      TextAnalysis.bm25(docs(s, dir), "doc_id", "text",
          Seq("vector", "hash", "scan"))
        .orderBy(col("score").desc, col("doc_id")).limit(50)),

    "tfidf_top" -> ((s, dir) =>
      TextAnalysis.tfIdf(docs(s, dir), "doc_id", "text")
        .orderBy(col("tfidf").desc, col("term"), col("doc_id")).limit(50)),

    // Gopher-style repetition quality filters — per-row sorted-run-length
    // folds (ops/TextAnalysis.scala), zero shuffle; the oracle restates
    // them independently as group-by-multiplicity aggregations
    "rep_signals" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.repetitionSignals(col("text")).as("r"))
        .select(col("doc_id"), col("r.top_word_frac").as("top_word_frac"),
          col("r.dup_word_frac").as("dup_word_frac"),
          col("r.dup_2gram_frac").as("dup_2gram_frac"))),

    // ---- corpus curation (ops/Curation.scala) ----

    // Composite Gopher-style keep/drop: five rules folded to a bitmask in
    // one shuffle-free scan; thresholds tested by integer
    // cross-multiplication so no float rounding can flip a verdict
    "filter_quality" -> ((s, dir) =>
      Curation.qualityFilter(docs(s, dir), "doc_id", "text")),

    // Benchmark decontamination: word-3-gram overlap of every training doc
    // against the benchmark slice (doc_id % 97 == 0) — benchmark set and
    // hit counts both broadcast, the corpus never shuffles
    "decontam_overlap" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.decontaminate(
        d.where(col("doc_id") % 97 =!= 0),
        d.where(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)
    }),

    // Deterministic train/val/test assignment (90/5/5): exact-BIGINT
    // id-hash bucket vs cumulative cut points — pure projection,
    // reproducible under re-runs and incremental appends (no split
    // leakage as the corpus grows)
    "train_split" -> ((s, dir) =>
      Curation.assignSplit(docs(s, dir).select(col("doc_id")), "doc_id")
        .groupBy(col("split")).agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))),

    // Deterministic hash-stratified sampling: en at 50%, others at 25% —
    // a pure filter on the exact-BIGINT id hash (same arithmetic as the
    // IVF centroid sample), zero shuffles, reproducible by construction
    "sample_stratified" -> ((s, dir) =>
      Curation.stratifiedSample(docs(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang", Map("en" -> 500), defaultPermille = 250)),

    // Data-mixing resample: en up-sampled to 2.5× (2 copies + hash-gated
    // third), de down to 40% — explode of a per-row sequence, no shuffle
    "resample_weighted" -> ((s, dir) =>
      Curation.resampleWeighted(docs(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang", Map("en" -> 2500, "de" -> 400), defaultPermille = 1000)),

    // Concat-and-split sequence packing at a 2048-subword-token budget:
    // global token offsets via the two-level prefix sum (chunkSpan=64 so
    // the gate exercises multiple chunks + the broadcast base join)
    "pack_sequences" -> ((s, dir) =>
      Curation.packSequences(docs(s, dir), "doc_id", "text",
        budget = 2048L, chunkSpan = 64L)),

    // No-split histogram FFD packing at a 256-token budget (docs are
    // ≤100 subword tokens, so packs mix 2-5 length classes); the oracle
    // replays the count-space FFD verbatim in a recursive CTE
    "pack_bins_ffd" -> ((s, dir) =>
      Curation.packBinsFfd(docs(s, dir), "doc_id", "text", budget = 256L)),

    // Corpus vocabulary: top-100 cleaned tokens by (count desc, token) —
    // map-side partial counts, TakeOrdered top-N
    "vocab_top" -> ((s, dir) =>
      Curation.vocabTop(docs(s, dir), "text", topN = 100)),

    // OOV rate against the corpus top-100 vocabulary: the ≤100-row vocab
    // rides into a per-row array_contains filter; the corpus never
    // shuffles beyond the (token, count) aggregation
    "oov_rate" -> ((s, dir) =>
      Curation.oovRate(docs(s, dir), "doc_id", "text", topN = 100)),

    // C4-style blocklist filter at the cleaned-token grain: 'dup' occurs
    // in ~5% of docs (the cut fires), 'zzzqqq' in none (absent terms are
    // harmless), 'DUP' exercises the lowercase normalization, and the
    // two-word phrase 'Slow Key' exercises the adjacent-gram match
    "blocklist_filter" -> ((s, dir) =>
      Curation.blocklistFilter(docs(s, dir), "doc_id", "text",
        Seq("DUP", "zzzqqq", "Slow Key"))),

    // HTML markup removal over deterministically injected markup (the
    // synthetic corpus is plain text): each doc is wrapped in a full
    // page — script/style/comment blocks, attributed tags, the entity
    // set incl. a double-escape — and stripped back; both engines run
    // the identical RE2-safe removal chain
    "strip_html" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.stripHtml(concat(
          lit("<html><head><title>t</title><style type=\"text/css\">p { color: red; }</style>"),
          lit("<script>var x = 1 < 2 && \"</p>\";</script></head>"),
          lit("<body><!-- note --><p class=\"a\" id=\"p"), col("doc_id").cast("string"), lit("\">"),
          col("text"),
          lit("</p><div>tail &amp;amp; &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;" +
            "num &#77;&#x6d; nb&#160;sp amp&#38;amp; big&#2000000; " +
            "sur&#xD801; nul&#0; tab&#9;t " +
            "w1&#146;q c1&#129;r tm&#153;s del&#127;d end</div></body></html>")))
          .as("clean"))),

    // the decodeEntities control-byte observability metric: planted raw
    // U+0001/U+0002 bytes (the separator/placeholder collision class the
    // decoder documents stripping) are COUNTED per document, so the
    // data-loss profile is measurable at corpus scale instead of silent.
    // Oracle = the planting formula (the corpus text itself is clean)
    "control_byte_count" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.collisionByteCount(concat(col("text"),
          when(col("doc_id") % 3 === 0, lit("\u0001a\u0002b\u0001"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 2, lit("\u0002")).otherwise(lit(""))))
          .as("n_control"))),

    // main-content extraction over a full boilerplate gauntlet: nav +
    // cookie-banner div + link-farm "Related:" row + share aside + footer
    // all planted around the document text and one legit prose div; only
    // the article text and the prose div must survive (word-count x
    // link-density block rule, semantic/attr-blocklist element drops)
    "extract_main_content" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.extractMainContent(concat(
          lit("<html><head><title>T</title></head><body>"),
          lit("<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/about\">About us</a></li></ul></nav>"),
          lit("<div class=\"cookie-banner\">This site uses cookies to improve your browsing experience on every visit. <a href=\"#\">Accept all</a></div>"),
          lit("<article><p>"), col("text"), lit("</p>"),
          lit("<p>Related: <a href=\"/a\">read this other very long article right now</a> <a href=\"/b\">and then this one too</a></p></article>"),
          lit("<div>He said that the project <a href=\"/x\">summary</a> would ship before the deadline and everyone there agreed.</div>"),
          lit("<aside>Share on <a>Twitter</a> and <a>Facebook</a></aside>"),
          lit("<footer>Copyright 2026 Example Corp. All rights reserved. <a href=\"/privacy\">Privacy</a></footer></body></html>")))
          .as("main_text"))),

    // URL + host extraction over deterministically injected links (the
    // corpus is plain text): two URLs per doc — one ending at whitespace
    // with mixed-case host and path, one parenthesized with trailing
    // sentence punctuation — exercise the boundary class, the trailing
    // strip, and host-only lowercasing
    "url_hosts" -> ((s, dir) =>
      TextAnalysis.urlHosts(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit(" see https://Example"), (col("doc_id") % 10).cast("string"),
            lit(".com/Path/a?q="), col("doc_id").cast("string"),
            lit(" and (http://sub.test"), (col("doc_id") % 7).cast("string"),
            lit(".org/page.html).")).as("text")),
        "doc_id", "text")),

    // HTML hyperlink extraction (the web-graph builder): uppercase <A
    // HREF>, a fragment href, double- AND single-quoted values,
    // attributes before/after href, an anchor with nested <b> markup
    // and an embedded newline, an href-less <a name=> that must yield
    // nothing, and an empty href every 5th doc. The oracle restates the
    // DECISION TABLE from the fixture formulas — the regex never
    // appears in it
    "extract_links" -> ((s, dir) =>
      TextAnalysis.extractLinks(
        docs(s, dir).select(col("doc_id"),
          linkHtmlFixture(col("doc_id")).as("html")), "doc_id", "html")),

    // anchor-text corpus over the same link fixture: per TARGET URL, the
    // incoming-anchor count and sorted distinct anchors — '/' and
    // '/about' aggregate a whole host-class's pages, per-page targets
    // get their single anchor, the k%5=0 empty self-reference lands on
    // the page's own URL. Oracle = the per-target decision table
    "anchor_texts" -> ((s, dir) => {
      val idS = col("doc_id").cast("string")
      val pageUrl = concat(lit("https://h"), (col("doc_id") % 10).cast("string"),
        lit(".com/a/page"), idS, lit(".html"))
      TextAnalysis.anchorTexts(
        docs(s, dir).select(col("doc_id"), pageUrl.as("page_url"),
          linkHtmlFixture(col("doc_id")).as("html")),
        "doc_id", "page_url", "html")
    }),

    // the CAPPED anchor corpus: every doc links one hub target under a
    // per-doc anchor ('tag i') plus a shared one ('common') — ~501
    // distinct anchors on ONE target — and its own per-doc self target.
    // maxAnchorsPerTarget = 5 must (a) keep the hub's 5 smallest by the
    // deterministic (fingerprint-hash, anchor) priority, (b) raise the
    // EXACT anchors_capped flag on the hub only, (c) leave the complete
    // self targets unflagged; the cap sits far under the fixture
    // cardinality so the cut itself is value-gated
    "anchor_texts_capped" -> ((s, dir) => {
      val idS = col("doc_id").cast("string")
      val pageUrl = concat(lit("https://h"), (col("doc_id") % 10).cast("string"),
        lit(".com/p"), idS)
      val html = concat(
        lit("<a href=\"https://hub.example.com/\">tag "), idS, lit("</a>"),
        lit("<a href=\"https://hub.example.com/\">common</a>"),
        lit("<a href=\"/s/"), idS, lit("\">self "), idS, lit("</a>"))
      TextAnalysis.anchorTexts(
        docs(s, dir).select(col("doc_id"), pageUrl.as("page_url"),
          html.as("html")),
        "doc_id", "page_url", "html", maxAnchorsPerTarget = 5)
    }),

    // the session's crawl ops COMPOSED into the web-graph builder:
    // extractLinks → resolveUrl against each page's own URL → host
    // extraction → host-level edge aggregation. Relative hrefs ("/",
    // "/about#f", the empty self-reference) must land on the page's own
    // host, absolute ones on theirs; the oracle is the edge-count
    // decision table from the fixture formulas — extraction, resolution
    // and hosting never appear in it
    "web_link_graph" -> ((s, dir) =>
      TextAnalysis.webLinkGraph(frontierPages(s, dir), "doc_id",
        "page_url", "html")),

    // the SAME graph with the aggregation exchange keyed on the hosts'
    // 8-byte hash pair instead of the strings (the 100 TB exchange-key
    // swap, now a knob): identical oracle — results must match the
    // string-keyed gate byte for byte
    "web_link_graph_hashkeys" -> ((s, dir) =>
      TextAnalysis.webLinkGraph(frontierPages(s, dir), "doc_id",
        "page_url", "html", hashKeys = true)),

    // anchorTexts with the target key hashed (the same swap on the
    // anchor corpus's one aggregation): identical oracle to anchor_texts
    "anchor_texts_hashkeys" -> ((s, dir) =>
      TextAnalysis.anchorTexts(frontierPages(s, dir), "doc_id",
        "page_url", "html", hashKeys = true)),

    // RFC 3986 relative-reference resolution (the extractLinks →
    // frontier bridge): absolute / protocol-relative / root-relative /
    // directory-relative / dot-segment / empty / query-only reference
    // classes over bases with and without paths, queries and fragments.
    // Oracle = the resolution DECISION TABLE from the fixture formulas
    "resolve_url" -> ((s, dir) => {
      val k = col("doc_id") % 10
      val kS = k.cast("string"); val idS = col("doc_id").cast("string")
      val base = concat(lit("https://h"), kS, lit(".com"),
        when(k % 4 === 0, lit("")).otherwise(lit("/a/b/index.html")),
        when(k % 5 === 2, lit("?v=1")).otherwise(lit("")),
        when(k % 3 === 1, lit("#bfrag")).otherwise(lit("")))
      val m = col("doc_id") % 9
      val ref = when(m === 0, concat(lit("https://other.org/x"), idS, lit("?q=1#f")))
        .when(m === 1, concat(lit("//cdn"), kS, lit(".com/lib.js")))
        .when(m === 2, concat(lit("/root/p"), idS))
        .when(m === 3, concat(lit("img"), idS, lit(".png")))
        .when(m === 4, lit("../up.html"))
        .when(m === 5, concat(lit("./same.html?x="), idS, lit("#g")))
        .when(m === 6, lit(""))
        .when(m === 7, lit("?only=q"))
        .otherwise(concat(lit("b/../c/./d"), idS, lit(".html")))
      docs(s, dir).select(col("doc_id"), base.as("base"), ref.as("ref"))
        .withColumn("resolved",
          TextAnalysis.resolveUrl(col("base"), col("ref")))
    }),

    // URL canonicalization over messy injected links: mixed-case scheme +
    // host, default ports, tracking params interleaved with real ones, a
    // fragment, and a bare-slash path whose query dies entirely
    "url_canon" -> ((s, dir) =>
      TextAnalysis.canonicalUrls(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit(" go HTTP://Example"), (col("doc_id") % 10).cast("string"),
            lit(".COM:80/Path/a?utm_source=news&q="), col("doc_id").cast("string"),
            lit("&fbclid=xyz#frag and (https://Sub.Test"), (col("doc_id") % 7).cast("string"),
            lit(".ORG:443/?utm_campaign=c).")).as("text")),
        "doc_id", "text")),

    // keep-first URL-level dedup: 500 crawl rows collapse to 20 canonical
    // pages once case, default port and per-row tracking params normalize
    // away; the min-doc_id row per canonical URL survives
    "url_dedup" -> ((s, dir) =>
      TextAnalysis.dedupByCanonicalUrl(
        docs(s, dir).select(col("doc_id"),
          concat(lit("HTTPS://WWW.Site"), (col("doc_id") % 20).cast("string"),
            lit(".COM:443/page?id="), (col("doc_id") % 5).cast("string"),
            lit("&utm_medium=x"), col("doc_id").cast("string")).as("url")),
        "doc_id", "url")),

    // Rule-based sentence segmentation: a three-sentence tail is appended
    // so every doc splits; separator-injection regex (no lookaround) is
    // replayed verbatim by the oracle
    "split_sentences" -> ((s, dir) =>
      TextAnalysis.splitSentences(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" Tail one. Tail two! Tail three?")).as("text")),
        "doc_id", "text")),

    // Abbreviation-aware segmentation over a planted tail that hits every
    // protection class: titles (Dr/Mrs/Prof/St/No/vs), the two-letter
    // latinisms (e.g./i.e.), and the meridiems (a.m./p.m.). The tail
    // splits into exactly 4 extra boundaries — the abbreviation dots all
    // survive inside their sentences; the oracle replays the identical
    // protect-inject-restore chain in RE2
    "split_sentences_abbrev" -> ((s, dir) =>
      TextAnalysis.splitSentencesAbbrev(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(SentAbbrevTail)).as("text")),
        "doc_id", "text")),

    // Sentence-aligned RAG chunking at a 12-token budget over the same
    // tailed fixture (doc bodies are one long sentence, so chunks mix
    // the oversized body with the short tail sentences); the oracle
    // replays the greedy fold as a per-doc recursive CTE
    "sentence_chunks" -> ((s, dir) =>
      TextAnalysis.sentenceChunks(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" Tail one. Tail two! Tail three?")).as("text")),
        "doc_id", "text", maxTokens = 12)),

    // the same chunking with one sentence of overlap: boundaries are
    // IDENTICAL to the overlap-0 gate (boundary-then-extend semantics);
    // each later chunk gains the previous chunk's trailing sentence
    "sentence_chunks_overlap" -> ((s, dir) =>
      TextAnalysis.sentenceChunks(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" Tail one. Tail two! Tail three?")).as("text")),
        "doc_id", "text", maxTokens = 12, overlapSentences = 1)),

    // Exact top-20 vocabulary through the Misra-Gries sketch: per-
    // partition ≤200-counter summaries, merge, broadcast the candidates,
    // exact recount — no full-vocabulary shuffle anywhere; the oracle is
    // the plain exact top-20, which MUST match because every true top-20
    // token clears the n/(k+1) presence bound
    "heavy_hitters" -> ((s, dir) =>
      Curation.heavyHitters(docs(s, dir), "text", topN = 20, sketchK = 200)),

    // Per-key cap ("≤25 docs per lang"): deterministic smallest-
    // (idHash53, id) selection through the bounded knn_topk heap — one
    // shuffle, O(n) state per key regardless of skew; the oracle restates
    // the full-range priority in exact BIGINT and row_numbers it
    "cap_per_key" -> ((s, dir) =>
      Curation.capPerKey(docs(s, dir).select(col("doc_id"), col("lang")),
        "lang", "doc_id", n = 25)),

    // ---- dedup family ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", Seq("lang", "source"))),

    // C4-style line-level dedup: 5-doc multi-line documents (deterministic
    // roll-up, restated by the oracle), every line keeps only its first
    // (doc, pos) occurrence corpus-wide. Keys are string_hash61 — the
    // SQL-restatable 8-byte line key, so the gate exercises the hashed
    // (scale) path end to end, removal decisions included
    // Exact repeated n-gram spans (token-level exact-substring dedup):
    // per-doc rollup of how many 5-token windows recur corpus-wide
    // ExactSubstr removal spans (Lee et al. 2022's suffix-array half,
    // restated as the linear shared-window union — see the scaladoc's
    // identity argument): maximal (doc, start, len) spans whose every
    // 20-token window occurs >= 2x corpus-wide. The oracle recomputes on
    // RAW window strings (no hash restatement), so a fingerprint
    // collision or off-by-one in the island merge value-fails
    "exact_substr_spans" -> ((s, dir) =>
      Dedup.exactSubstrSpans(docs(s, dir), "doc_id", "text", minTokens = 20)
        .select(col("id").as("doc_id"), col("start"), col("len"))
        .orderBy("doc_id", "start")),

    // the deletion step: spans cut out, remainder stitched, every doc
    // emitted with its removal volume; the oracle rebuilds each clean
    // text from an anti-joined position table
    "exact_substr_removed" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.applyRemovalSpans(d,
          Dedup.exactSubstrSpans(d, "doc_id", "text", minTokens = 20),
          "doc_id", "text")
        .select(col("id").as("doc_id"), col("clean_text"), col("n_removed"))
        .orderBy("doc_id")
    }),

    "repeated_spans" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        greatest(size(Curation.cleanTokens(col("text"))) - 4, lit(0))
          .cast("long").as("n_windows"))
      val rep = Dedup.repeatedSpans(docs(s, dir), "doc_id", "text", 5)
        .groupBy("id").agg(count(lit(1)).as("n_repeated"))
      base.join(rep, base("doc_id") === rep("id"), "left")
        .select(col("doc_id"), col("n_windows"),
          coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
          round(coalesce(col("n_repeated"), lit(0L)).cast("double") /
            greatest(col("n_windows"), lit(1L)), 6).as("rep_frac"))
    }),

    "line_dedup" -> ((s, dir) => {
      val multi = docs(s, dir)
        .groupBy(floor(col("doc_id") / 5).cast("long").as("doc_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("doc_id").as("i"), col("text").as("t")))),
          x => x("t")), "\n").as("text"))
      Dedup.lineDedup(multi, "doc_id", "text", graft.functions.string_hash61)
        .select(col("doc_id"), col("text").as("text_deduped"),
          col("n_lines"), col("n_removed"))
        .orderBy("doc_id")
    }),

    // Sentence-level dedup: a two-sentence boilerplate tail is appended to
    // every doc (the C4 "subscribe"/cookie-notice shape — repeats that
    // don't align to newlines), so keep-first retains it only in the
    // smallest doc and cuts ~2 sentences everywhere else
    "sentence_dedup" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(". Subscribe to our newsletter today! Cookies are required.")).as("text"))
      Dedup.sentenceDedup(d, "doc_id", "text", graft.functions.string_hash61)
        .select(col("doc_id"), col("text").as("text_deduped"),
          col("n_sentences"), col("n_removed"))
        .orderBy("doc_id")
    }),

    // Near-dup PAIRS → duplicate CLUSTERS: alternating large-star/small-star
    // connected components (O(log n) rounds, 8-byte keys only) over the
    // exact SimHash hamming≤3 pair set; the oracle recomputes components
    // independently via recursive min-label reachability
    "dup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
          Dedup.simhashPairs(docs(s, dir), "doc_id", "text", 3), "a", "b")
        .select(col("node").as("doc_id"), col("component"))
        .orderBy("doc_id")),

    // The keep DECISION on top of the clusters: per-component
    // best-quality member (score desc, id tiebreak) — the oracle replays
    // components (recursive reachability), the quality formula, and the
    // window rank independently
    "cluster_keep" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.clusterKeep(Dedup.simhashPairs(d, "doc_id", "text", 3),
          d, "doc_id", TextAnalysis.qualityScore(col("text")))
        .orderBy("doc_id")
    }),

    // Exact 4-gram Jaccard via MinHash-LSH candidates → exact verify (no
    // all-pairs join anywhere in the plan); pipeline and gate both at 0.9
    // (see jaccardAllPairsSql), the run's materialization released after
    // the limit materializes
    "ngram_jaccard_top" -> ((s, dir) =>
      materializedLsh(s, Dedup.minhashLshRun(docs(s, dir), "doc_id", "text",
        numHashes = 128, bands = 16, shingleN = 4, threshold = 0.9))(
        _.where(col("jaccard") >= 0.9)
          .orderBy(col("jaccard").desc, col("a"), col("b")).limit(50))),

    // Bucketed-exact cosine pairs: hyperplane LSH bucket join, never cartesian
    "cosine_top_pairs" -> ((s, dir) =>
      Dedup.cosineNearDup(emb(s, dir), "vec_id", "embedding",
          hyperplane_signature(col("embedding"), CosBits, Dim), 0.0)
        .orderBy(col("cosine_sim").desc, col("a"), col("b")).limit(50)),

    // SoftDeDup: 1/n_copies down-weighting off content fingerprints —
    // 50 cloned docs must land weight 0.5 (or 1/3 for naturally-repeated
    // text), originals keep 1.0; the oracle groups by raw text
    "softdedup_weights" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val clones = d.where(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.softDedupWeights(d.unionByName(clones), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // Unicode NFC normalization (UAX #15): planted decomposed accents,
    // Hangul jamo, and the angstrom sign must land in canonical composed
    // form. The oracle is DuckDB's nfc_normalize — an INDEPENDENT
    // implementation (utf8proc) of the same Unicode algorithm, so this
    // gate cross-checks the JDK's tables against utf8proc's
    "nfc_normalize_text" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.functions.nfc_normalize(concat(substring(col("text"), 1, 20),
          element_at(array(
            lit("é café"), // decomposed: composes to e-acute
            lit("café"),          // already NFC: passes through
            lit("가"),       // Hangul jamo: composes to U+AC00
            lit("Å")),            // angstrom sign: becomes U+00C5
            (col("doc_id") % 4 + 1).cast("int")))).as("norm"))
        .orderBy("doc_id")),

    // PSI drift between two corpus snapshots (even vs odd doc ids) over
    // the quality score: reference-quantile bins, Laplace-smoothed
    // shares, one identical ln tree per bin — the per-dump QA alarm
    "psi_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.psiDrift(
        d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
        TextAnalysis.qualityScore(col("text")),
        TextAnalysis.qualityScore(col("text")), nBins = 8)
    }),

    // Corpus snapshot diff: ref = documents; cur drops every 7th id,
    // appends " v2" to every 11th id's text, and adds a fresh doc per
    // 13th id — added/removed/changed classified on (id, fingerprint)
    "snapshot_diff" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val cur = d.where(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.where(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(lit("added doc "), col("doc_id").cast("string")).as("text")))
      Curation.snapshotDiff(d, cur, "doc_id", "text")
    }),

    // Composed curation decision log: every doc (corpus + a 50-doc clone
    // wave so the exact_dup branch fires) attributed to exactly one
    // outcome in stage-priority order — quality:<lowest-failing-rule>,
    // exact_dup (smallest surviving id keeps), key_cap (beyond the
    // per-lang 200 smallest (h53,id)), kept. The oracle replays all
    // three stages over raw text
    "curation_log" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"), col("text"))
      val clones = d.where(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"), col("text"))
      Curation.curationLog(d.unionByName(clones), "doc_id", "text", "lang",
          capN = 200)
        .select(col("id").as("doc_id"), col("key").as("lang"),
          col("fail_mask"), col("keep"), col("reason"))
        .orderBy("doc_id")
    }),

    // ================= END-TO-END CRAWL → TRAINING-SHARDS PIPELINE =====
    // The product claim as ONE gate: the LIBRARY composition
    // (ops/Pipeline.curateCrawl) run end-to-end over a planted crawl
    // fixture — WARC ingest → robots → main-content
    // extraction → mojibake repair → C4 line cleaning → script/lang
    // gate → URL dedup → doc-level near-dup → sentence-level dedup →
    // decontamination → quality filter → per-site cap → sequence pack →
    // shard write + readback. Per-operator gates cover each stage's
    // SEMANTICS; this gate covers their COMPOSITION (column threading,
    // id identity, text hand-off, null conventions). The fixture plants
    // one drop-class per stage (robots-blocked paths, German pages,
    // URL twins, content clones, shared boilerplate + eval-leak
    // sentences, repetition junk, domain overflow), and the oracle
    // replays every stage DECISION over CTEs — survivor sets, dedup
    // keep-first rules, the idHash53 cap, the token-packing prefix sum
    // and the shard shuffle — then derives the exact surviving text
    // from the fixture formulas. A wrong join key, lost column, or
    // stage-order bug shifts the survivor set or the final text and
    // value-fails.
    "pipeline_e2e" -> ((s, dir) => {
      val (captures, robotsDf, bench) = pipeFixture(s, dir)
      val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString + "/shards"
      graft.ops.Pipeline.curateCrawl(captures, "doc_id", "warc",
          robotsDf, "host", "txt", bench, "text", out, PipeConfig)
        .orderBy("doc_id")
    }),

    // the same pipeline ingesting the format it was built for: captures
    // arrive as per-record-gzip `.warc.gz` BINARIES (the Common Crawl
    // layout) and S1 routes through the byte-exact reader
    // (CurateConfig.warcProfile = "gz"). The fixture mirrors the text
    // profile's formulas exactly, so the oracle is the SAME staged
    // replay — a byte/char framing bug, a broken member chain, or a
    // profile mis-route shifts the survivor text and value-fails.
    "pipeline_e2e_gz" -> ((s, dir) => {
      val gz = udf((i: Long) => pipeGzCapture(i))
      val captures = docs(s, dir).select(col("doc_id"),
        gz(col("doc_id")).as("warc"))
      val out = java.nio.file.Files.createTempDirectory("graft_pipegz").toString + "/shards"
      graft.ops.Pipeline.curateCrawl(captures, "doc_id", "warc",
          pipeRobots(s), "host", "txt",
          s.range(1).select(lit(PipeBench).as("text")), "text", out,
          PipeConfig.copy(warcProfile = "gz"))
        .orderBy("doc_id")
    }),

    // the same pipeline with httpParse = true over HTTP-ENVELOPED
    // payloads (the real crawl shape: status line + Content-Type +
    // blank line + html): S1.5 must strip the envelope byte-exactly
    // (a parser leaving header residue shifts every downstream stage's
    // text) and drop the planted 404s (doc_id%13=6) and JSON media
    // types (doc_id%11=4) — the oracle is the SAME staged replay with
    // the two ingest drop classes applied before robots
    "pipeline_e2e_http" -> ((s, dir) => {
      val captures = pipeCaptures(docs(s, dir).select(col("doc_id")), httpWrap = true)
      val out = java.nio.file.Files.createTempDirectory("graft_pipeh").toString + "/shards"
      graft.ops.Pipeline.curateCrawl(captures, "doc_id", "warc",
          pipeRobots(s), "host", "txt",
          s.range(1).select(lit(PipeBench).as("text")), "text", out,
          PipeConfig.copy(httpParse = true))
        .orderBy("doc_id")
    }),

    // the pipeline with a domain BLOCKLIST (the UT1-class URL filter):
    // site9.com is blocked at the eTLD+1 grain, so every page whose
    // URL-twin-adjusted host lands there (u%10=9) must vanish before
    // robots — the oracle applies the same predicate in the rob CTE
    // (pre-language filters commute, so placement is oracle-exact)
    "pipeline_e2e_blocked" -> ((s, dir) => {
      val (captures, robotsDf, bench) = pipeFixture(s, dir)
      val out = java.nio.file.Files.createTempDirectory("graft_pipeb").toString + "/shards"
      graft.ops.Pipeline.curateCrawl(captures, "doc_id", "warc",
          robotsDf, "host", "txt", bench, "text", out,
          PipeConfig.copy(blockedDomains = Seq("site9.com")))
        .orderBy("doc_id")
    }),

    // the incremental run's audit funnel: ten rows — the seen-screen
    // drop surfaces as its OWN stage between url_dedup and near_dup
    // instead of hiding inside the minhash row
    "pipeline_funnel_incremental" -> ((s, dir) => {
      val (captures, robotsDf, bench) = pipeFixture(s, dir)
      val base = java.nio.file.Files.createTempDirectory("graft_pipefi").toString
      val cfg = PipeConfig.copy(seenDir = base + "/seen")
      graft.ops.Pipeline.curateCrawl(
        captures.where(col("doc_id") % 2 === 0), "doc_id", "warc",
        robotsDf, "host", "txt", bench, "text", base + "/shards1", cfg)
      graft.ops.Pipeline.curateCrawlAudited(
        captures.where(col("doc_id") % 2 === 1), "doc_id", "warc",
        robotsDf, "host", "txt", bench, "text", base + "/shards2", cfg)
        .funnel.select("stage_idx", "stage", "n_docs").orderBy("stage_idx")
    }),

    // the INCREMENTAL pipeline: wave 1 (even doc_ids) runs first and
    // accretes its post-URL-dedup content fingerprints into the seen
    // store; wave 2 (odd doc_ids) must drop every page whose content an
    // earlier wave already carried (the fixture's %31 clones straddle
    // the parity split in both directions) while keeping its own
    // fresh pages. Result = wave 2's shards; the oracle replays BOTH
    // waves' survivor chains and the cross-wave NOT EXISTS screen
    "pipeline_incremental" -> ((s, dir) => {
      val (captures, robotsDf, bench) = pipeFixture(s, dir)
      val base = java.nio.file.Files.createTempDirectory("graft_pipei").toString
      val cfg = PipeConfig.copy(seenDir = base + "/seen")
      graft.ops.Pipeline.curateCrawl(
        captures.where(col("doc_id") % 2 === 0), "doc_id", "warc",
        robotsDf, "host", "txt", bench, "text", base + "/shards1", cfg)
      graft.ops.Pipeline.curateCrawl(
        captures.where(col("doc_id") % 2 === 1), "doc_id", "warc",
        robotsDf, "host", "txt", bench, "text", base + "/shards2", cfg)
        .orderBy("doc_id")
    }),

    // the SAME two waves with the seen screen routed through the Bloom
    // prefilter (the documented 100 TB swap, now a CurateConfig knob):
    // identical oracle — Bloom has no false negatives and might-be-seen
    // rows pay the exact confirm join, so results must hash-match the
    // exact-screen gate byte for byte
    "pipeline_incremental_bloom" -> ((s, dir) => {
      val (captures, robotsDf, bench) = pipeFixture(s, dir)
      val base = java.nio.file.Files.createTempDirectory("graft_pipeib").toString
      val cfg = PipeConfig.copy(seenDir = base + "/seen", seenBloom = true,
        seenBloomItems = 1L << 10, seenBloomBits = 1L << 14)
      graft.ops.Pipeline.curateCrawl(
        captures.where(col("doc_id") % 2 === 0), "doc_id", "warc",
        robotsDf, "host", "txt", bench, "text", base + "/shards1", cfg)
      graft.ops.Pipeline.curateCrawl(
        captures.where(col("doc_id") % 2 === 1), "doc_id", "warc",
        robotsDf, "host", "txt", bench, "text", base + "/shards2", cfg)
        .orderBy("doc_id")
    }),

    // the crawl-frontier COMPOSITION (the crawling half of the product
    // claim, the curateCrawl of fetching): fetched pages → extracted
    // links → resolved → canonicalized → alt3.org blocked at eTLD+1 →
    // already-fetched screen (the every-5th self-reference) → distinct →
    // robots verdicts (odd-k site hosts disallow /page; rule-less hosts
    // fail open) → Crawl-delay annotation → per-site cap of 30 by the
    // deterministic (fingerprint, url) priority with the exact
    // site_capped flag. Oracle = the per-stage decision table + the
    // replayed priority cut — no operator internals appear
    "frontier_e2e" -> ((s, dir) =>
      graft.ops.Pipeline.buildFrontier(frontierPages(s, dir), "doc_id",
        "page_url", "html", frontierRobots(s), "host", "txt", FrontierCfg,
        sitemaps = Some(frontierSitemaps(s)),
        redirects = Some(graft.ops.Warc.redirectEdges(
          frontierRedirectCaptures(s, dir), "url", "payload")))),

    // the hash-keyed frontier (FrontierConfig.hashKeys): every keyed
    // exchange of the composition carries 8-byte xxhash64 keys; gated
    // against the SAME oracle as the string-keyed run
    "frontier_e2e_hashkeys" -> ((s, dir) =>
      graft.ops.Pipeline.buildFrontier(frontierPages(s, dir), "doc_id",
        "page_url", "html", frontierRobots(s), "host", "txt",
        FrontierCfg.copy(hashKeys = true),
        sitemaps = Some(frontierSitemaps(s)),
        redirects = Some(graft.ops.Warc.redirectEdges(
          frontierRedirectCaptures(s, dir), "url", "payload")))),

    // the frontier's audited funnel: stage counts from the same decision
    // chain — the `seeded` row (sitemap union) is the one that may
    // exceed its predecessor; `seconds` is wall-time, projected out
    "frontier_funnel" -> ((s, dir) =>
      graft.ops.Pipeline.buildFrontierAudited(frontierPages(s, dir), "doc_id",
        "page_url", "html", frontierRobots(s), "host", "txt", FrontierCfg,
        sitemaps = Some(frontierSitemaps(s)))
        .funnel.select("stage_idx", "stage", "n_urls").orderBy("stage_idx")),

    // the REDIRECT-composed funnel: the `redirected` discovery row lands
    // between `seeded` and `resolved_http`, the 200-with-Location trap
    // and the cycle contribute nothing, and every downstream count
    // absorbs the redirect terminals' survivors
    "frontier_funnel_redirect" -> ((s, dir) =>
      graft.ops.Pipeline.buildFrontierAudited(frontierPages(s, dir), "doc_id",
        "page_url", "html", frontierRobots(s), "host", "txt", FrontierCfg,
        sitemaps = Some(frontierSitemaps(s)),
        redirects = Some(graft.ops.Warc.redirectEdges(
          frontierRedirectCaptures(s, dir), "url", "payload")))
        .funnel.select("stage_idx", "stage", "n_urls").orderBy("stage_idx")),

    // the INCREMENTAL frontier: wave 1 (doc_id % 4 = 0) fetches and its
    // canonical URLs accrete into the persistent fetchedDir store
    // (two-lane 8-byte hashes, deferred-commit append); wave 2 (odd
    // doc_ids) must drop every candidate wave 1 already fetched (prev
    // links of doc_id % 4 = 1) while keeping candidates nobody fetched
    // (prev links of % 4 = 3, all fresh x{k}.net links). Rule-less
    // robots — the store screen is the ONLY cross-wave dropper, and the
    // oracle replays it as a literal cross-wave NOT EXISTS
    "frontier_incremental" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_fri").toString
      val cfg = graft.ops.Pipeline.FrontierConfig(
        maxPerSite = 1000000, fetchedDir = base + "/fetched")
      val emptyRobots = s.range(0).select(
        lit("h").as("host"), lit("").as("txt"))
      graft.ops.Pipeline.buildFrontier(
        frontierIncPages(docs(s, dir).where(col("doc_id") % 4 === 0)
          .select(col("doc_id"))), "doc_id",
        "page_url", "html", emptyRobots, "host", "txt", cfg)
      graft.ops.Pipeline.buildFrontier(
        frontierIncPages(docs(s, dir).where(col("doc_id") % 2 === 1)
          .select(col("doc_id"))), "doc_id",
        "page_url", "html", emptyRobots, "host", "txt", cfg)
        .orderBy("url")
    }),

    // the incremental frontier's audited funnel: the cross-wave store
    // screen surfaces as its OWN `seen_store` row between `not_fetched`
    // and `distinct_url` instead of hiding inside the distinct fold
    "frontier_funnel_incremental" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_frfi").toString
      val cfg = graft.ops.Pipeline.FrontierConfig(
        maxPerSite = 1000000, fetchedDir = base + "/fetched")
      val emptyRobots = s.range(0).select(
        lit("h").as("host"), lit("").as("txt"))
      graft.ops.Pipeline.buildFrontier(
        frontierIncPages(docs(s, dir).where(col("doc_id") % 4 === 0)
          .select(col("doc_id"))), "doc_id",
        "page_url", "html", emptyRobots, "host", "txt", cfg)
      graft.ops.Pipeline.buildFrontierAudited(
        frontierIncPages(docs(s, dir).where(col("doc_id") % 2 === 1)
          .select(col("doc_id"))), "doc_id",
        "page_url", "html", emptyRobots, "host", "txt", cfg)
        .funnel.select("stage_idx", "stage", "n_urls").orderBy("stage_idx")
    }),

    // the politeness SCHEDULER over the frontier's own output: per-host
    // fetch slots in the deterministic (fingerprint, url) priority
    // order, start offsets = slot × the host's Crawl-delay (2.0 s where
    // the host declared none). Oracle = the replayed per-host
    // ROW_NUMBER assignment over the frontier restatement
    "frontier_schedule" -> ((s, dir) => {
      val f = graft.ops.Pipeline.buildFrontier(frontierPages(s, dir), "doc_id",
        "page_url", "html", frontierRobots(s), "host", "txt", FrontierCfg,
        sitemaps = Some(frontierSitemaps(s)),
        redirects = Some(graft.ops.Warc.redirectEdges(
          frontierRedirectCaptures(s, dir), "url", "payload")))
      graft.ops.Pipeline.scheduleFrontier(f, "url", "host", "crawl_delay",
          defaultDelaySec = 2.0)
        .select("url", "host", "slot", "start_sec")
    }),

    // INTER-WAVE politeness carryover: wave 1's schedule folds to
    // per-host next-fetch offsets (max start + delay), and the second
    // wave's start offsets ride on top of them — a host fetched at the
    // end of wave 1 is not hit at t=0 of wave 2. Oracle = the wave-1
    // ROW_NUMBER replay, the per-host max+delay fold, and the offset
    // join, all restated literally
    "frontier_schedule_carryover" -> ((s, dir) => {
      val f = graft.ops.Pipeline.buildFrontier(frontierPages(s, dir), "doc_id",
        "page_url", "html", frontierRobots(s), "host", "txt", FrontierCfg,
        sitemaps = Some(frontierSitemaps(s)),
        redirects = Some(graft.ops.Warc.redirectEdges(
          frontierRedirectCaptures(s, dir), "url", "payload")))
      val w1 = graft.ops.Pipeline.scheduleFrontier(f, "url", "host",
        "crawl_delay", defaultDelaySec = 2.0)
      val off = graft.ops.Pipeline.nextStartOffsets(w1, "host",
        "crawl_delay", defaultDelaySec = 2.0)
      graft.ops.Pipeline.scheduleFrontier(f, "url", "host", "crawl_delay",
          defaultDelaySec = 2.0, lastStart = Some(off))
        .select("url", "host", "slot", "start_sec")
    }),

    // sitemap PRIORITY threading (FrontierConfig.usePriority): declared
    // <priority> values decide the per-site cap (0.9 survives a 30-cap
    // over 50 default-0.5 candidates, 0.2 is cut) and order the
    // scheduler's slots within each host (hash tie-break within a
    // priority class). Oracle = the composite-key rank replay — the
    // quantized (priority, hash) key is exact integer arithmetic in
    // doubles, so the cut restates literally
    "frontier_priority" -> ((s, dir) => {
      val f = graft.ops.Pipeline.buildFrontier(frontierPages(s, dir), "doc_id",
        "page_url", "html", frontierRobots(s), "host", "txt",
        FrontierCfg.copy(usePriority = true),
        sitemaps = Some(frontierPrioritySitemaps(s)))
      graft.ops.Pipeline.scheduleFrontier(f, "url", "host", "crawl_delay",
          defaultDelaySec = 2.0, priorityCol = "priority")
        .select("url", "host", "source", "priority", "slot", "start_sec")
    }),

    // IN-LINK evidence prioritization (FrontierConfig.useInlinks, the
    // OPIC-lite frontier): every candidate carries n_ref_domains =
    // DISTINCT OFFSITE referring registered domains, and the per-site
    // cap ranks by (evidence DESC, hash, url) — the 3 pop.net/hot URLs
    // (all h-domains vote) must survive an 8-cap over N one-referrer
    // cold URLs regardless of hash rank; onsite /local self-links count
    // zero. Oracle = the count(DISTINCT offsite ref) fold + the
    // integer-exact composite-key rank replay from the fixture formulas
    "frontier_inlinks" -> ((s, dir) =>
      graft.ops.Pipeline.buildFrontier(frontierInlinkPages(s, dir), "doc_id",
        "page_url", "html",
        s.range(0).select(lit("h").as("host"), lit("").as("txt")),
        "host", "txt",
        graft.ops.Pipeline.FrontierConfig(maxPerSite = 8, useInlinks = true))
        .orderBy("url")),

    // the hash-keyed twin: the evidence fold's distinct runs on the
    // referring domain's 8-byte xxhash64 (null-guarded) — gated against
    // the SAME oracle as the string-keyed run
    "frontier_inlinks_hashkeys" -> ((s, dir) =>
      graft.ops.Pipeline.buildFrontier(frontierInlinkPages(s, dir), "doc_id",
        "page_url", "html",
        s.range(0).select(lit("h").as("host"), lit("").as("txt")),
        "host", "txt",
        graft.ops.Pipeline.FrontierConfig(maxPerSite = 8, useInlinks = true,
          hashKeys = true))
        .orderBy("url")),

    // PERMANENT-redirect ALIAS suppression (redirectPermanentCol): a
    // candidate that is a known 301/308 source is an alias the crawl
    // stops paying fetch budget for (its terminal already entered);
    // temporary 302 sources stay canonical fetch targets. Fixture: each
    // h{k}.com/about (link-discovered) 301s to /about2, each h{k}.com
    // (link-discovered) 302s to /tmp — about drops, h{k}.com stays,
    // both targets enter as 'redirect'. Oracle = the decision table
    // with the alias flag restated
    "frontier_redirect_alias" -> ((s, dir) => {
      val ks = col("id").cast("string")
      def resp(status: String, loc: org.apache.spark.sql.Column) = concat(
        lit("HTTP/1.1 " + status + "\r\nLocation: "), loc,
        lit("\r\nContent-Type: text/html\r\n\r\nmoved"))
      val caps = s.range(10).select(
          concat(lit("https://h"), ks, lit(".com/about")).as("url"),
          resp("301 Moved Permanently",
            concat(lit("https://h"), ks, lit(".com/about2"))).as("payload"))
        .unionByName(s.range(10).select(
          concat(lit("https://h"), ks, lit(".com")).as("url"),
          resp("302 Found",
            concat(lit("https://h"), ks, lit(".com/tmp"))).as("payload")))
      graft.ops.Pipeline.buildFrontier(frontierPages(s, dir), "doc_id",
        "page_url", "html", frontierRobots(s), "host", "txt",
        graft.ops.Pipeline.FrontierConfig(maxPerSite = 30),
        redirects = Some(graft.ops.Warc.redirectEdgesWithStatus(
          caps, "url", "payload")),
        redirectPermanentCol = "permanent")
    }),

    // sitemap-driven RECRAWL selection: the lastmod consumer — a leaf is
    // refetched iff it was never fetched ('new') or declares a lastmod
    // STRICTLY later than its recorded fetch time ('modified'); absent /
    // garbage / stale lastmods stay out, and duplicate leaf entries fold
    // to the newest declaration. Oracle = the per-class decision table
    // from the fixture formulas (the W3C datetime parse never appears)
    "sitemap_recrawl" -> ((s, dir) => {
      val i = col("doc_id").cast("string")
      val m = col("doc_id") % 5
      val lastmod1 = when(m === 0, lit("2026-03-01"))
        .when(m === 1, lit("2026-01-01"))
        .when(m === 2, lit(""))
        .when(m === 3, lit("2026-02-15T12:30:00Z"))
        .otherwise(lit("not-a-date"))
      val xml = concat(lit("<urlset>"),
        lit("<url><loc>https://s.com/u"), i, lit("</loc>"),
        when(lastmod1 =!= "",
          concat(lit("<lastmod>"), lastmod1, lit("</lastmod>")))
          .otherwise(lit("")),
        lit("</url>"),
        lit("<url><loc>https://s.com/n"), i,
        lit("</loc><lastmod>2026-01-01</lastmod></url>"),
        // a second sitemap entry for the SAME u{i} with an older lastmod:
        // the fold must keep the newest declaration
        lit("<url><loc>https://s.com/u"), i,
        lit("</loc><lastmod>2026-01-02</lastmod></url>"),
        lit("</urlset>"))
      val leaves = graft.ops.Robots.sitemapUrls(
        docs(s, dir).select(col("doc_id"), xml.as("xml")), "doc_id", "xml")
      val fetchStore = docs(s, dir).select(
        concat(lit("https://s.com/u"), col("doc_id").cast("string")).as("url"),
        lit("2026-02-15 10:00:00").as("fetched_at"))
      graft.ops.Robots.sitemapRecrawl(leaves, "loc", "lastmod",
        fetchStore, "url", "fetched_at").orderBy("url")
    }),

    // the CRAWL LOOP — both halves composed over both persistent stores,
    // two full rounds: wave-1 frontier (fetchedDir accretes the seed
    // URLs) and wave-1 curation (seenDir accretes the seed texts), then
    // the emitted frontier URLs "fetch" into wave-2 pages (every third a
    // content CLONE of a wave-1 seed), and wave 2 re-runs both halves.
    // Output: wave-2's frontier (the fresh b/{i} links survive, the
    // wave-1-fetched s/{i} links die at the STORE screen — the only
    // cross-wave channel) and wave-2's curated doc ids (the clones die
    // at the SEEN screen — again the only cross-wave channel). Oracle =
    // both survivor sets restated from the fixture formulas: the loop's
    // two stores interoperate iff both sets match
    "crawl_loop_e2e" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_loop").toString
      val emptyRobots = s.range(0).select(lit("h").as("host"), lit("").as("txt"))
      val bench = s.range(1)
        .select(lit("completely unrelated benchmark sentence").as("text"))
      val fcfg = graft.ops.Pipeline.FrontierConfig(
        maxPerSite = 1000000, fetchedDir = base + "/fetched")
      val ccfg = graft.ops.Pipeline.CurateConfig(
        capPerDomain = 1000000, seenDir = base + "/seen")
      def seedText(i: org.apache.spark.sql.Column) = concat(
        lit("the quick brown fox number "), i.cast("string"),
        lit(" jumps over one lazy dog. it runs near marker m"), i.cast("string"),
        lit("a and m"), i.cast("string"), lit("b then m"), i.cast("string"),
        lit("c every single day with speed."))
      def waveText(i: org.apache.spark.sql.Column) = when(i % 3 === 1, seedText(i))
        .otherwise(concat(
          lit("the second wave story number "), i.cast("string"),
          lit(" walks across the nine quiet bridges today. it rests near"),
          lit(" the marker x"), i.cast("string"), lit("a and x"),
          i.cast("string"), lit("b then x"), i.cast("string"),
          lit("c in the late evening hours.")))
      // links ride in <nav> — extractLinks sees them, extractMainContent
      // strips them, so the curated TEXT is link-free and clone equality
      // holds across waves despite different out-links
      def htmlOf(text: org.apache.spark.sql.Column,
                 links: org.apache.spark.sql.Column) = concat(
        lit("<html><body><nav>"), links, lit("</nav><article><p>"), text,
        lit("</p></article></body></html>"))
      def warcOf(url: org.apache.spark.sql.Column,
                 html: org.apache.spark.sql.Column) = concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
        lit("\r\nContent-Length: "), length(html).cast("string"),
        lit("\r\n\r\n"), html, lit("\r\n\r\n"))
      def aHref(u: org.apache.spark.sql.Column) =
        concat(lit("<a href=\""), u, lit("\">t</a> "))
      val ids = docs(s, dir).select(col("doc_id"))
      val kS = (col("doc_id") % 10).cast("string")
      val iS = col("doc_id").cast("string")
      val seedUrl = concat(lit("https://h"), kS, lit(".com/s/"), iS)
      val aUrl1 = concat(lit("https://h"), kS, lit(".com/a/"), iS)
      val seedHtml = htmlOf(seedText(col("doc_id")),
        concat(aHref(aUrl1), aHref(seedUrl))) // self-link: in-wave screened
      val pages1 = ids.select(col("doc_id"), seedUrl.as("page_url"),
        seedHtml.as("html"))
      // wave 1, both halves — the stores accrete
      val f1 = graft.ops.Pipeline.buildFrontier(pages1, "doc_id", "page_url",
        "html", emptyRobots, "host", "txt", fcfg)
      graft.ops.Pipeline.curateCrawl(
        ids.select(col("doc_id"), warcOf(seedUrl, seedHtml).as("warc")),
        "doc_id", "warc", emptyRobots, "host", "txt", bench, "text",
        base + "/shards1", ccfg).count()
      // the "fetch": each frontier URL materializes as a page; ids parse
      // back out of the emitted URLs — the composition point
      val i2 = col("i")
      val k2S = (i2 % 10).cast("string")
      val ids2 = f1.select(
        regexp_extract(col("url"), "/a/([0-9]+)$", 1).cast("long").as("i"))
      val aUrl2 = concat(lit("https://h"), k2S, lit(".com/a/"), i2.cast("string"))
      val html2 = htmlOf(waveText(i2), concat(
        aHref(concat(lit("https://h"), k2S, lit(".com/b/"), i2.cast("string"))),
        aHref(concat(lit("https://h"), k2S, lit(".com/s/"), i2.cast("string")))))
      val pages2 = ids2.select((i2 + 1000000L).as("doc_id"),
        aUrl2.as("page_url"), html2.as("html"))
      // wave 2, both halves again
      val f2 = graft.ops.Pipeline.buildFrontier(pages2, "doc_id", "page_url",
        "html", emptyRobots, "host", "txt", fcfg)
      val c2 = graft.ops.Pipeline.curateCrawl(
        ids2.select((i2 + 1000000L).as("doc_id"),
          warcOf(aUrl2, html2).as("warc")),
        "doc_id", "warc", emptyRobots, "host", "txt", bench, "text",
        base + "/shards2", ccfg)
      f2.select(lit("f2").as("part"), col("url").as("key"))
        .unionByName(c2.select(lit("c2").as("part"),
          col("doc_id").cast("string").as("key")))
        .orderBy("part", "key")
    }),

    // the http profile's funnel: pins WHERE the three envelope drop
    // classes (404, wrong mime, unterminated-header NULL body) fall —
    // the ingest row must already exclude all three, so a NULL-body
    // capture that silently rode into extraction and died at the
    // language gate would shift the ingest/lang counts and value-fail
    "pipeline_funnel_http" -> ((s, dir) => {
      val captures = pipeCaptures(docs(s, dir).select(col("doc_id")), httpWrap = true)
      val out = java.nio.file.Files.createTempDirectory("graft_pipefh").toString + "/shards"
      graft.ops.Pipeline.curateCrawlAudited(captures, "doc_id", "warc",
          pipeRobots(s), "host", "txt",
          s.range(1).select(lit(PipeBench).as("text")), "text", out,
          PipeConfig.copy(httpParse = true))
        .funnel.select("stage_idx", "stage", "n_docs").orderBy("stage_idx")
    }),

    // the same pipeline's per-stage audit FUNNEL (the observability
    // artifact a production run logs): one row per drop stage with the
    // surviving count; the oracle re-counts each stage's survivor CTE
    "pipeline_funnel" -> ((s, dir) => {
      val (captures, robotsDf, bench) = pipeFixture(s, dir)
      val out = java.nio.file.Files.createTempDirectory("graft_pipef").toString + "/shards"
      graft.ops.Pipeline.curateCrawlAudited(captures, "doc_id", "warc",
          robotsDf, "host", "txt", bench, "text", out, PipeConfig)
        .funnel.select("stage_idx", "stage", "n_docs").orderBy("stage_idx")
    }),

    // Semantic decontamination: min cosine distance to a 10-vector
    // benchmark set (broadcast literal, shuffle-free scan), flagged on
    // the 6-dp rounded distance — catches paraphrase-level eval leakage
    // that n-gram decontam_overlap misses
    "semantic_decontam" -> ((s, dir) => {
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val bench = e.where(col("vec_id") < 10).orderBy(col("vec_id"))
        .collect().map(_.getSeq[Float](1).toSeq).toSeq
      graft.ops.Embeddings.semanticDecontam(e, "vec_id", "embedding", bench, 0.3)
    }),

    // Exact max-containment pairs via prefix filtering: the blocking has
    // ZERO false negatives (rarest-shingle prefixes must hit the bigger
    // doc), so the oracle is the plain all-pairs containment restatement
    // — the subset/quotation detector Jaccard banding structurally misses
    "containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), "doc_id", "text",
          shingleN = 8, threshold = 0.8)
        .orderBy(col("containment").desc, col("a"), col("b")).limit(100)),

    // Exact 3-gram Jaccard through the banded MinHash pipeline; the oracle
    // restates the full all-pairs exact Jaccard (fine at oracle SF);
    // pipeline and gate both at 0.9 (see jaccardAllPairsSql)
    "minhash_lsh_pairs" -> ((s, dir) =>
      materializedLsh(s, Dedup.minhashLshRun(docs(s, dir), "doc_id", "text",
        numHashes = 128, bands = 16, shingleN = 3, threshold = 0.9))(
        _.where(col("jaccard") >= 0.9)
          .orderBy(col("jaccard").desc, col("a"), col("b")).limit(100))),

    // Degenerate-duplicate hardening, gated: the corpus plus a
    // 1000-identical-doc cluster must still hash-match the exact oracle —
    // identical contents are routed through the content groupBy (ONE LSH
    // row for the whole cluster, jaccard-1.0 pairs expanded at the end),
    // so no band bucket ever sees the cluster's quadratic pair space
    "minhash_dup_cluster" -> ((s, dir) => {
      // fixed 1500-doc window (a no-op at the driver's sf0.01 gate, where
      // doc_ids stop at 499): this gate pins CLUSTER-EXPANSION semantics,
      // and its oracle's exact rep-pair space cannot be blocked losslessly
      // at corpus scale — 3-char shingles at t = 0.8 defeat prefix
      // filtering because the trigram universe is tiny (measured at
      // sf0.1: 1.7M candidates survive K=32 + the length filter, ~2 min
      // to verify) — so the cross-SF sweep runs it on a bounded window
      // while the six string-discriminative pair gates verify full-corpus
      val d = docs(s, dir).where(col("doc_id") < 1500)
        .select(col("doc_id"), col("text"))
      val base = d.orderBy(col("doc_id")).limit(1).select(col("text"))
      val clones = s.range(DupCluster).crossJoin(broadcast(base))
        .select((col("id") + lit(1000000L)).as("doc_id"), col("text"))
      materializedLsh(s, Dedup.minhashLshRun(d.unionByName(clones), "doc_id", "text",
        numHashes = 128, bands = 16, shingleN = 3, threshold = 0.8))(
        _.orderBy(col("jaccard").desc, col("a"), col("b")).limit(150))
    }),

    // SimHash from SQL-restatable polynomial token hashes → full oracle
    "simhash_docs" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Dedup.simhash64(Dedup.simhashTokens(col("text"))).as("simhash"))),

    // SimHash near-dup pairs via pigeonhole chunk blocking — the blocking
    // is EXACT (any pair within hamming k shares one of k+1 chunks), so
    // the all-pairs oracle must agree row for row
    "simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", 3)
        .orderBy(col("a"), col("b"))),

    // ANN over a bucket-PARTITIONED parquet store: the probe's multi-probe
    // IN-list prunes partition directories before any row is read — the
    // 100 TB path (only (nBits+1)/2^nBits of the store is scanned)
    "ann_lsh_topk" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_ann").toString + "/store"
      Ann.writeBucketed(emb(s, dir).where(col("embedding").isNotNull),
        "embedding", path, AnnBits, Dim)
      Ann.lshTopKPruned(s, path, "vec_id", "embedding", probe, K, "cosine", AnnBits)
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // LSH store append: buckets are a pure function of (vector, nBits,
    // seed), so the wave lands byte-equivalent to a rebuild — probing
    // the appended store must equal the full-corpus oracle replay
    "lsh_append" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_lsha").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
      Ann.writeBucketed(e.where(col("vec_id") % 3 =!= 0), "embedding", path, AnnBits, Dim)
      Ann.appendBucketed(e.where(col("vec_id") % 3 === 0), "embedding", path, AnnBits, Dim)
      Ann.lshTopKPruned(s, path, "vec_id", "embedding", probe, K, "cosine", AnnBits)
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // Table-to-table ANN JOIN: 20 probe rows × full corpus, candidates =
    // shared hamming-1 LSH bucket neighborhood, per-probe top-5 through
    // the bounded knn_topk heap — the "every document's neighbors"
    // primitive with one bucket-keyed shuffle per side, nothing quadratic
    "ann_join" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.annJoin(e.where(col("vec_id") < 20), "vec_id", "embedding",
        e, "vec_id", "embedding", k = 5, metric = "cosine", AnnBits, Dim)
        .withColumnRenamed("vec_id_probe", "probe_id")
    }),

    // the same join with the bucket-size cap BITING (maxBucket=4 at ~2
    // mean occupancy): right rows in over-cap buckets are excluded from
    // candidate generation — the skew guard that stops a hot LSH bucket
    // quadratizing the join at 100 TB, exercised end-to-end against the
    // oracle's independent bucket-count exclusion
    "ann_join_capped" -> ((s, dir) => {
      val e = emb(s, dir)
      Ann.annJoin(e.where(col("vec_id") < 20), "vec_id", "embedding",
        e, "vec_id", "embedding", k = 5, metric = "cosine", AnnBits, Dim,
        maxBucket = 4)
        .withColumnRenamed("vec_id_probe", "probe_id")
    }),

    // IVF ANN: deterministic sampled centroids → codegen'd nearest-centroid
    // assignment → cluster-PARTITIONED store → probe scans only the nprobe
    // nearest cells (partition pruning). The second scale path next to LSH.
    "ivf_knn" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val cents = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      Ann.writeIvf(e, "embedding", path, cents)
      Ann.ivfTopK(s, path, "vec_id", "embedding", probe, K, "l2", cents, IvfProbes)
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // Filtered vector search: the doc's lang rides IN the IVF store, the
    // predicate pushes into the probed cells' parquet scan and composes
    // with directory pruning — nearest ENGLISH docs, post-filter
    // semantics (exact within probed cells, oracle replays exactly that)
    "ivf_knn_filtered" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_ivff").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
        .join(docs(s, dir).select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
      val cents = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      Ann.writeIvf(e, "embedding", path, cents)
      Ann.ivfTopKFiltered(s, path, "vec_id", "embedding", probe, K, "l2",
          cents, IvfProbes, col("lang") === "en")
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // IVF append: centroids frozen from the initial 2/3, the 1/3 wave
    // assigned + appended (one wave scan, no rebuild); probing the
    // appended store must equal the oracle's assignment replay over the
    // UNION — a wave row mis-assigned, dropped, or double-written
    // value-fails
    "ivf_append" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_ivfa").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val initial = e.where(col("vec_id") % 3 =!= 0)
      val cents = Ann.ivfCentroids(initial, "vec_id", "embedding", IvfCells)
      Ann.writeIvf(initial, "embedding", path, cents)
      Ann.appendIvf(e.where(col("vec_id") % 3 === 0), "embedding", path, cents)
      Ann.ivfTopK(s, path, "vec_id", "embedding", probe, K, "l2", cents, IvfProbes)
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // IVF recall harness (same shape as recall_l2): |ivf ∩ exact| / k —
    // gates the hash-ordered centroid sample's quality, not just its plan
    "ivf_recall" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_ivfr").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val cents = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      Ann.writeIvf(e, "embedding", path, cents)
      val approx = Ann.ivfTopK(s, path, "vec_id", "embedding", probe, K, "l2", cents, IvfProbes)
        .select(col("vec_id"))
      val exact = knnQuery("l2")(s, dir).select(col("vec_id"))
      val inter = exact.join(approx, "vec_id").count()
      s.range(1).select(lit(K).cast("long").as("k"), lit(inter.toDouble / K).as("recall"))
    }),

    // IVF with a k-means coarse quantizer: one exact Lloyd refinement
    // round over the hash-sampled seeds (Ann.refineCentroids — the
    // kmeans_iter2 machinery wired into writeIvf), recall measured side
    // by side with the sampled-seed baseline from the SAME probe. The
    // oracle replays seed sampling, the fixed-point Lloyd round with the
    // q20 float handoff, BOTH assignments, BOTH probe-cell choices, and
    // both intersections with the exact top-k — nothing is taken from
    // the Spark side
    "ivf_recall_kmeans" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_ivfk").toString
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val seeds = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      val refined = Ann.refineCentroids(e, "embedding", seeds, Dim)
      val exact = knnQuery("l2")(s, dir).select(col("vec_id"))
      def recall(cents: Seq[Seq[Float]], sub: String): Double = {
        val path = s"$base/$sub"
        Ann.writeIvf(e, "embedding", path, cents)
        val approx = Ann.ivfTopK(s, path, "vec_id", "embedding", probe, K, "l2", cents, IvfProbes)
          .select(col("vec_id"))
        exact.join(approx, "vec_id").count().toDouble / K
      }
      s.range(1).select(lit(K).cast("long").as("k"),
        lit(recall(refined, "kmeans")).as("recall_kmeans"),
        lit(recall(seeds, "sampled")).as("recall_sampled"),
        lit(refined.size.toLong).as("n_cells"))
    }),

    // ---- product quantization: 32× compression + code-only ADC scan ----

    // full encoder gate: every (vec, subspace, code) assignment must match
    // the oracle's independent per-subspace argmin over the restated
    // hash-ordered code sample
    "pq_codes" -> ((s, dir) => {
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val cb = Pq.codebook(e, "vec_id", "embedding", Dim, PqM, PqCodes)
      Pq.encode(e, "vec_id", "embedding", cb)
        .select(col("id").as("vec_id"), posexplode(col("codes")))
        .select(col("vec_id"), col("pos").cast("long").as("sub"),
          col("col").cast("long").as("code"))
        .orderBy("vec_id", "sub")
    }),

    // ADC top-k through the code STORE (write + read back + scan of the
    // tinyint codes only — the 100 TB serving path)
    "pq_knn" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_pq").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val cb = Pq.codebook(e, "vec_id", "embedding", Dim, PqM, PqCodes)
      Pq.write(e, "vec_id", "embedding", path, cb)
      val (codes, cb2) = Pq.read(s, path)
      Pq.adcTopK(codes, "id", "codes", probe, K, cb2)
        .select(col("id").as("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // ADC shortlist → exact re-rank (the standard PQ serving pipeline) +
    // the recall harness: |rerank ∩ exact| / k in one gated row
    "pq_recall" -> ((s, dir) => {
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val cb = Pq.codebook(e, "vec_id", "embedding", Dim, PqM, PqCodes)
      val codes = Pq.encode(e, "vec_id", "embedding", cb)
        .withColumnRenamed("id", "vec_id")
      val rerank = Pq.rerankTopK(codes, e, "vec_id", "codes", "embedding",
        probe, K, cb, overscan = 10).select(col("vec_id"))
      val exact = knnQuery("l2")(s, dir).select(col("vec_id"))
      val inter = exact.join(rerank, "vec_id").count()
      s.range(1).select(lit(K).cast("long").as("k"), lit(inter.toDouble / K).as("recall"))
    }),

    // IVF-PQ (IVFADC): coarse cells prune at file-listing time AND the
    // in-cell scan reads only the tinyint codes — both scale levers
    // through one store, written + read back + probed end-to-end
    "ivfpq_knn" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val cents = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      val cb = Pq.codebook(e, "vec_id", "embedding", Dim, PqM, PqCodes)
      Pq.writeIvfPq(e, "vec_id", "embedding", path, cents, cb)
      val (_, cents2, cb2) = Pq.readIvfPq(s, path)
      Pq.ivfPqTopK(s, path, probe, K, cents2, cb2, IvfProbes)
        .select(col("id").as("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // Filtered IVF-PQ: lang rides next to the 8-byte codes in the
    // combined store, so the predicate composes with cell-directory
    // pruning AND the code-column scan in one pass — filtered retrieval
    // over the store you'd actually deploy
    "ivfpq_knn_filtered" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_ivfpqf").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
        .join(docs(s, dir).select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
      val cents = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      val cb = Pq.codebook(e, "vec_id", "embedding", Dim, PqM, PqCodes)
      Pq.writeIvfPq(e, "vec_id", "embedding", path, cents, cb, extraCols = Seq("lang"))
      Pq.ivfPqTopKFiltered(s, path, probe, K, cents, cb, IvfProbes,
          col("lang") === "en")
        .select(col("id").as("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // IVF-PQ append: sidecars frozen from the initial 2/3, the wave
    // assigned + ENCODED under them from the store's own sidecar reads
    // (not caller state) and appended; probing must equal the oracle's
    // union replay under the pre-wave sample
    "ivfpq_append" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_ivfpqa").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val initial = e.where(col("vec_id") % 3 =!= 0)
      val cents = Ann.ivfCentroids(initial, "vec_id", "embedding", IvfCells)
      val cb = Pq.codebook(initial, "vec_id", "embedding", Dim, PqM, PqCodes)
      Pq.writeIvfPq(initial, "vec_id", "embedding", path, cents, cb)
      Pq.appendIvfPq(e.where(col("vec_id") % 3 === 0), "vec_id", "embedding", path)
      val (_, cents2, cb2) = Pq.readIvfPq(s, path)
      Pq.ivfPqTopK(s, path, probe, K, cents2, cb2, IvfProbes)
        .select(col("id").as("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // IVF-PQ shortlist → exact re-rank, scored against brute-force truth
    "ivfpq_recall" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString + "/store"
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val cents = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      val cb = Pq.codebook(e, "vec_id", "embedding", Dim, PqM, PqCodes)
      Pq.writeIvfPq(e, "vec_id", "embedding", path, cents, cb)
      val rerank = Pq.ivfPqRerank(s, path, e, "vec_id", "embedding",
        probe, K, cents, cb, IvfProbes, overscan = 10).select(col("vec_id"))
      val exact = knnQuery("l2")(s, dir).select(col("vec_id"))
      val inter = exact.join(rerank, "vec_id").count()
      s.range(1).select(lit(K).cast("long").as("k"), lit(inter.toDouble / K).as("recall"))
    }),

    // IVF-PQ on the k-means coarse quantizer: the Lloyd-refined centroids
    // (Ann.refineCentroids — the same machinery ivf_recall_kmeans gates)
    // feeding the combined store, recall measured side by side with the
    // hash-sampled baseline from the SAME probe/codebook. The oracle
    // replays seed sampling, the fixed-point Lloyd round with the q20
    // float handoff, BOTH cell assignments and probe-cell choices, the PQ
    // encode + ADC shortlists, both exact re-ranks, and both recalls
    "ivfpq_recall_kmeans" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_ivfpqk").toString
      val e = emb(s, dir).where(col("embedding").isNotNull)
      val seeds = Ann.ivfCentroids(e, "vec_id", "embedding", IvfCells)
      val refined = Ann.refineCentroids(e, "embedding", seeds, Dim)
      val cb = Pq.codebook(e, "vec_id", "embedding", Dim, PqM, PqCodes)
      val exact = knnQuery("l2")(s, dir).select(col("vec_id"))
      def recall(cents: Seq[Seq[Float]], sub: String): Double = {
        val path = s"$base/$sub"
        Pq.writeIvfPq(e, "vec_id", "embedding", path, cents, cb)
        val rerank = Pq.ivfPqRerank(s, path, e, "vec_id", "embedding",
          probe, K, cents, cb, IvfProbes, overscan = 10).select(col("vec_id"))
        exact.join(rerank, "vec_id").count().toDouble / K
      }
      s.range(1).select(lit(K).cast("long").as("k"),
        lit(recall(refined, "kmeans")).as("recall_kmeans"),
        lit(recall(seeds, "sampled")).as("recall_sampled"),
        lit(refined.size.toLong).as("n_cells"))
    }),

    // ---- binary quantization: 32× compression sign-bit signatures ----

    // Hamming top-k over packed sign-bit signatures (one long per 64
    // dims): the oracle recomputes the distance per-dim as a sign
    // comparison, so a mispacked bit or wrong popcount value-fails
    "binary_hamming_topk" -> ((s, dir) => {
      val sigs = graft.ops.BinaryQuant.signatures(emb(s, dir), "vec_id", "embedding", Dim)
      graft.ops.BinaryQuant.hammingTopK(sigs, "vec_id", probe, Dim, K)
        .select(col("vec_id"), col("hamming").cast("long").as("hamming"))
    }),

    // Two-stage binary search: Hamming shortlist (c=50) → exact L2
    // rerank → top-k. Signature scan + broadcast of the 50-row shortlist;
    // the base table is never shuffled
    "binary_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      val sigs = graft.ops.BinaryQuant.signatures(e, "vec_id", "embedding", Dim)
      graft.ops.BinaryQuant.rerankTopK(sigs, e, "vec_id", "embedding",
        probe, Dim, c = 50, k = K, metric = "l2")
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // Matryoshka (MRL) two-stage search: rank on the first 16 dims,
    // shortlist 50, exact full-dim rerank — stage 1 touches 1/4 of the
    // vector bytes; same broadcast-shortlist shape as binary_rerank
    "mrl_topk" -> ((s, dir) =>
      Knn.mrlTopK(emb(s, dir), "vec_id", "embedding", probe,
        coarseDim = 16, c = 50, k = K, metric = "l2")
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))),

    // Same search through the two-column (prefix, vec) STORE: written,
    // read back, stage-1 scan column-pruned to the prefix chunks
    // (requiredSchema-asserted in SparkOpsSpec)
    "mrl_topk_stored" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_mrl").toString + "/store"
      Knn.writeMrl(emb(s, dir), "vec_id", "embedding", path, 16)
      Knn.mrlTopKStored(s.read.parquet(path), "vec_id", "prefix", "embedding",
        probe, coarseDim = 16, c = 50, k = K, metric = "l2")
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    // Sort-on-write + predicate pushdown: the corpus rewritten range-
    // sorted by n_chars, then range-filtered — the filter reaches the
    // parquet scan (PushedFilters, test-asserted) where sorted row-group
    // min/max stats skip non-matching groups; the third pruning lever
    // after partition dirs (events_partitioned_agg) and buckets
    "sorted_scan_range" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_srt").toString + "/docs"
      docs(s, dir).select("doc_id", "lang", "n_chars")
        .repartitionByRange(4, col("n_chars"))
        .sortWithinPartitions("n_chars")
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
        .where(col("n_chars") >= 100 && col("n_chars") <= 200)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sum_chars"))
    }),

    // Z-order (Morton) key: bit-interleave of (l_partkey, l_suppkey) —
    // pure codegen'd bit arithmetic (no UDF, no custom expression),
    // restated bit-for-bit in the oracle; the sort key behind the
    // 2-D-pruned store below
    "zorder_key" -> ((s, dir) =>
      tbl(s, dir, "lineitem").where(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"),
          Layout.zorderValue(col("l_partkey"), col("l_suppkey"), 16).as("z"))),

    // Z-order clustered store + 2-D box scan: lineitem rewritten Morton-
    // clustered on (l_partkey, l_suppkey), then box-filtered on BOTH
    // columns — file/row-group min-max stats prune both dimensions at
    // once (the OPTIMIZE ZORDER layout; pruning quantified in
    // SparkOpsSpec via parquet footer ranges). Oracle reads the ORIGINAL
    // parquet, so any clustering corruption value-fails.
    "zorder_pruned_scan" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_zo").toString + "/li"
      Layout.writeZordered(
        tbl(s, dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity"),
        tmp, "l_partkey", "l_suppkey", 16, 16)
      s.read.parquet(tmp)
        .where(col("l_partkey").between(100, 300) && col("l_suppkey").between(10, 40))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          min(col("l_orderkey")).as("min_order"), max(col("l_orderkey")).as("max_order"))
    }),

    // JL random projection 64 -> 8 dims: deterministic Gaussian planes
    // (same machinery as the hyperplane LSH), exact sequential-double
    // dots restated with the plane matrix as SQL literals; output
    // exploded to (vec_id, d, val) scalars for the hash compare
    "random_projection" -> ((s, dir) =>
      emb(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"),
          posexplode(random_projection(col("embedding"), 8, Dim).as("p")))
        .select(col("vec_id"), col("pos").cast("long").as("d"),
          round(col("col"), 6).as("val"))),

    // the text-cleaning scalar surface in PURE SQL through the
    // registered functions (fix_mojibake / card_redact / script_mix) —
    // same column chains, SQL front door
    "sql_text_clean" -> ((s, dir) => {
      graft.functions.registerSql(s)
      docs(s, dir).createOrReplaceTempView("tdocs")
      s.sql(s"""SELECT doc_id,
               |  fix_mojibake(text || '$MojibakeTail') AS fixed,
               |  (card_redact(text || '$CardTail')).n_cards AS n_cards,
               |  (script_mix(text)).dominant AS dominant
               |FROM tdocs""".stripMargin)
    }),

    // sitemap.xml frontier extraction: a 3-entry sitemap per document
    // (entry 1 full, entry 2 without lastmod/priority, entry 3 malformed
    // empty loc -> dropped); the oracle restates the EXPECTED rows from
    // the fixture formulas, never the extractor
    "sitemap_urls" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc>https://example.com/p/"), id,
        lit("</loc><lastmod>2026-0"), (col("doc_id") % 9 + 1).cast("string"),
        lit("-01</lastmod><priority>0."), (col("doc_id") % 10).cast("string"),
        lit("</priority></url><url><loc>https://example.com/q/"), id,
        lit("</loc></url><url><loc></loc></url></urlset>"))
      graft.ops.Robots.sitemapUrls(
        docs(s, dir).select(col("doc_id"), xml.as("xml")), "doc_id", "xml")
    }),

    // sitemap-INDEX recursion: a two-level tree (root index -> 5 child
    // indexes -> 10 leaf urlsets holding the documents), plus a cycle
    // (child 0 references the root again) and a dangling reference
    // (missing.xml is listed but never fetched) — the frontier walk must
    // terminate on the former and skip the latter. The oracle restates
    // the leaf assignment + per-leaf entry order from the fixture
    // formulas; the walk, the anti-join and the XML never appear.
    "sitemap_index" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
      val leafUrl = concat(lit("https://ex.com/sm/leaf"),
        (col("doc_id") % 5).cast("string"), lit("_"),
        (expr("doc_id div 5") % 2).cast("string"), lit(".xml"))
      val entry = concat(
        lit("<url><loc>https://ex.com/p/"), col("doc_id").cast("string"),
        lit("</loc><lastmod>2026-01-0"), (col("doc_id") % 9 + 1).cast("string"),
        lit("</lastmod><priority>0."), (col("doc_id") % 10).cast("string"),
        lit("</priority></url>"))
      val leaves = d.select(leafUrl.as("url"),
          struct(col("doc_id"), entry.as("e")).as("se"))
        .groupBy("url")
        .agg(concat(lit("<urlset>"),
          array_join(transform(array_sort(collect_list(col("se"))),
            x => x.getField("e")), ""),
          lit("</urlset>")).as("xml"))
      val children = s.range(5).select(
        concat(lit("https://ex.com/sm/idx"), col("id").cast("string"),
          lit(".xml")).as("url"),
        concat(lit("<sitemapindex><sitemap><loc>https://ex.com/sm/leaf"),
          col("id").cast("string"), lit("_0.xml</loc></sitemap>"),
          lit("<sitemap><loc>https://ex.com/sm/leaf"),
          col("id").cast("string"), lit("_1.xml</loc></sitemap>"),
          when(col("id") === 0,
            lit("<sitemap><loc>https://ex.com/sm/root0.xml</loc></sitemap>"))
            .otherwise(lit("")),
          lit("</sitemapindex>")).as("xml"))
      val root = s.range(1).select(
        lit("https://ex.com/sm/root0.xml").as("url"),
        concat(lit("<sitemapindex>"),
          lit((0 until 5).map(k =>
            s"<sitemap><loc>https://ex.com/sm/idx$k.xml</loc></sitemap>").mkString),
          lit("<sitemap><loc>https://ex.com/sm/missing.xml</loc></sitemap>"),
          lit("</sitemapindex>")).as("xml"))
      val fetched = root.unionByName(children).unionByName(leaves)
      // a non-foldable seed, like a real frontier table's: a LITERAL root
      // would constant-fold the depth-0 join key and degrade the store
      // join to a nested loop
      val roots = s.range(1).select(concat(lit("https://ex.com/sm/root"),
        pmod(col("id"), lit(1L)).cast("string"), lit(".xml")).as("r"))
      graft.ops.Robots.sitemapFrontier(fetched, "url", "xml", roots, "r",
          maxDepth = 4)
        .orderBy("sitemap_url", "entry_idx")
    }),

    // Unicode script profile over planted multilingual tails (Cyrillic /
    // Greek / CJK by doc_id class): per-script counts by explicit
    // code-point ranges + the (max count, min name) dominant; both
    // engines interpolate the SAME ScriptClasses ranges
    "script_mix" -> ((s, dir) => {
      val m = col("doc_id") % 4
      val tail = when(m === 0, lit(" привет мир широкий"))
        .when(m === 1, lit(" αλφα βητα γαμμα"))
        .when(m === 2, lit(" 中文处理系统"))
        .otherwise(lit(""))
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.scriptMix(concat(col("text"), tail)).as("r"))
        .select(col("doc_id") +:
          TextAnalysis.ScriptClasses.map { case (nm, _) => col(s"r.n_$nm") } :+
          col("r.dominant").as("dominant"): _*)
    }),

    // The crawl-pipeline composition: registeredDomain -> capPerKey at
    // the eTLD+1 grain — "at most N pages per SITE", the cap every
    // large crawl applies (host-grain caps would treat one site's
    // subdomains as unrelated). Deterministic idHash53 selection, so the
    // oracle replays domain table + priority + rank
    "domain_cap" -> ((s, dir) => {
      val k = (col("doc_id") % 20).cast("string")
      val m = col("doc_id") % 5
      val host = when(m === 0, concat(lit("www.shop"), k, lit(".co.uk")))
        .when(m === 1, concat(lit("blog.example"), k, lit(".com")))
        .when(m === 2, concat(lit("example"), k, lit(".org")))
        .when(m === 3, lit("co.uk"))
        .otherwise(concat(lit("weird"), k, lit(".zz")))
      val withDom = docs(s, dir).select(col("doc_id"),
        TextAnalysis.registeredDomain(host, Seq("com", "org", "net", "co.uk", "uk"))
          .getField("registered_domain").as("domain"))
      Curation.capPerKey(withDom, "domain", "doc_id", n = 10)
    }),

    // Flesch Reading Ease over the tailed fixture (multi-sentence docs):
    // integer word/sentence/syllable counts + one fixed-order double
    // tree snapped to the q20 grid; the oracle replays the vowel-group
    // syllable heuristic and the splitSentences boundary rule
    "flesch_score" -> ((s, dir) =>
      TextAnalysis.fleschScore(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" Tail one. Tail two! Tail three?")).as("text")),
        "doc_id", "text")),

    // Registered-domain (eTLD+1) extraction under a planted PSL
    // snapshot: multi-label suffix, single-label suffixes, a BARE
    // suffix (no registrable domain) and an unlisted TLD (default
    // rule) — the oracle restates the decision table from the host
    // formulas, never the matcher
    "registered_domain" -> ((s, dir) => {
      val k = (col("doc_id") % 20).cast("string")
      val m = col("doc_id") % 5
      val host = when(m === 0, concat(lit("www.shop"), k, lit(".co.uk")))
        .when(m === 1, concat(lit("blog.example"), k, lit(".com")))
        .when(m === 2, concat(lit("example"), k, lit(".org")))
        .when(m === 3, lit("co.uk"))
        .otherwise(concat(lit("weird"), k, lit(".zz")))
      docs(s, dir).select(col("doc_id"), host.as("host"),
          TextAnalysis.registeredDomain(host,
            Seq("com", "org", "net", "co.uk", "uk")).as("r"))
        .select(col("doc_id"), col("host"), col("r.suffix").as("suffix"),
          col("r.registered_domain").as("registered_domain"))
    }),

    // C4 line-wise cleaning over a planted multi-line fixture: nav bar
    // (no terminal punct), short line, JavaScript banner and a code line
    // drop; real sentences survive; page-level brace/lorem signals ride
    // as audit flags on doc_id%7 / doc_id%9 docs. Oracle replays the
    // identical rule chain
    "c4_line_filter" -> ((s, dir) => {
      val lined = concat(col("text"), lit(".\nHOME | ABOUT | CONTACT\nShort line.\n" +
        "Enable JavaScript to view this content.\nThis sentence has six real words here."),
        when(col("doc_id") % 7 === 0, lit("\nfunction f() { return 1; }")).otherwise(lit("")),
        when(col("doc_id") % 9 === 0, lit("\nlorem ipsum dolor sit amet text.")).otherwise(lit("")))
      Curation.c4LineFilter(
        docs(s, dir).select(col("doc_id"), lined.as("text")), "doc_id", "text")
    }),

    // Luhn-validated card redaction: only mod-10-valid 13-19-digit runs
    // mask (card-shaped order numbers survive); planted tail covers
    // valid/invalid/too-short/13-digit classes; the oracle replays the
    // identical candidate + Luhn + in-order replace chain
    "card_redact" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Curation.redactCards(concat(col("text"), lit(CardTail))).as("r"))
        .select(col("doc_id"), col("r.n_cards").as("n_cards"),
          col("r.clean").as("clean"))),

    // one round of UTF-8/CP1252 mojibake repair over a planted tail
    // hitting every table entry; the oracle replays the identical
    // replacement chain generated from the SAME table constant, so the
    // two engines cannot drift
    "fix_mojibake" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.fixMojibake(concat(col("text"), lit(MojibakeTail))).as("fixed"))),

    // robots.txt policy evaluation (RFC 9309 literal-prefix subset):
    // 20 synthetic hosts with planted rule sets covering every decision
    // class — longest-match override (/public/x allow beats /public
    // disallow), plain block, per-host conditional allow, the
    // equal-length tie (Allow wins), no-match default, AND a non-*
    // group that must be ignored. The oracle restates the DECISION
    // TABLE from the fixture formulas — parser or matcher bugs
    // value-fail against it
    "robots_filter" -> ((s, dir) => {
      val d = docs(s, dir)
      val host = concat(lit("h"), (col("doc_id") % 20).cast("string"), lit(".example.com"))
      val m = col("doc_id") % 5
      val path = concat(
        when(m === 0, lit("/public/x/")).when(m === 1, lit("/public/"))
          .when(m === 2, lit("/private/open/")).when(m === 3, lit("/t/a/"))
          .otherwise(lit("/")),
        col("doc_id").cast("string"))
      val urls = d.select(col("doc_id"), host.as("host"), path.as("path"))
      val robotsTxt = concat(
        lit("User-agent: gptbot\nDisallow: /\n\nUser-agent: *\nAllow: /public/x\n" +
          "Disallow: /public\nDisallow: /private\nAllow: /t/a\nDisallow: /t/a\n"),
        when(col("k") % 3 === 0, lit("Allow: /private/open\n")).otherwise(lit("")))
      val hosts = urls.select(col("host"), (col("doc_id") % 20).as("k")).distinct()
      val rules = graft.ops.Robots.parseRules(
        hosts.select(col("host"), robotsTxt.as("txt")), "host", "txt")
      graft.ops.Robots.robotsFilter(urls, "doc_id", "host", "path", rules, "host")
    }),

    // robots.txt RFC 9309 WILDCARD rules: lowercase/mixed-case field
    // names with inline # comments (the RFC-required normalizations),
    // mid-pattern `*` (/*?sessionid=), `$` end anchors (/download/
    // *.html$ overriding /download/; /tmp$ blocking /tmp but not
    // /tmping...), a wildcard-pattern length tie (allow+disallow /t*a
    // -> Allow wins), longest-pattern override (/a*b allow beats /a
    // disallow), and the no-match fail-open default. The oracle
    // restates the DECISION TABLE from the fixture formulas — neither
    // the parser, the regex compiler, nor the matcher appears in it
    "robots_filter_wildcard" -> ((s, dir) => {
      val d = docs(s, dir)
      val host = concat(lit("w"), (col("doc_id") % 10).cast("string"), lit(".example.com"))
      val m = col("doc_id") % 8
      val path = when(m === 0, concat(lit("/page?sessionid="), col("doc_id").cast("string")))
        .when(m === 1, concat(lit("/download/f"), col("doc_id").cast("string"), lit(".html")))
        .when(m === 2, concat(lit("/download/f"), col("doc_id").cast("string"), lit(".pdf")))
        .when(m === 3, lit("/tmp"))
        .when(m === 4, concat(lit("/tmping"), col("doc_id").cast("string")))
        .when(m === 5, concat(lit("/tXa"), col("doc_id").cast("string")))
        .when(m === 6, concat(lit("/axxb/c"), col("doc_id").cast("string")))
        .otherwise(concat(lit("/anything"), col("doc_id").cast("string")))
      val urls = d.select(col("doc_id"), host.as("host"), path.as("path"))
      val robotsTxt = lit(
        "user-agent: gptbot # blocked bot\ndisallow: /\n\n" +
          "user-agent: * # main group\n" +
          "disallow: /*?sessionid=\n" +
          "allow: /download/*.html$\n" +
          "DisAllow: /download/\n" +
          "disallow: /tmp$\n" +
          "allow: /t*a # tie test\n" +
          "disallow: /t*a\n" +
          "allow: /a*b\n" +
          "disallow: /a\n")
      val hosts = urls.select(col("host")).distinct()
      val rules = graft.ops.Robots.parseRules(
        hosts.select(col("host"), robotsTxt.as("txt")), "host", "txt")
      graft.ops.Robots.robotsFilter(urls, "doc_id", "host", "path", rules, "host")
    }),

    // robots.txt non-rule DIRECTIVES (the crawl-scheduler fields):
    // Sitemap: is file-scope — mixed-case spelling, inline comments, a
    // second one inside a group, an empty-value one that must drop;
    // Crawl-delay: is group-scope — a wrong-group 99 that must be
    // ignored, fractional/integer/unparseable star-group values, and a
    // second star group whose larger delay wins (max = politest). The
    // oracle restates the DECISION TABLE from the fixture formulas
    "robots_directives" -> ((s, dir) => {
      val d = docs(s, dir)
      val hosts = d.select((col("doc_id") % 20).as("k")).distinct()
      val kS = col("k").cast("string")
      val txt = concat(
        lit("# corpus robots fixture\n"),
        lit("SiteMAP: https://h"), kS, lit(".example.com/sitemap.xml\n"),
        lit("User-agent: gptbot\nCrawl-delay: 99\nDisallow: /\n\nUser-agent: *\n"),
        when(col("k") % 4 === 1, lit("Crawl-delay: 1.5\n"))
          .when(col("k") % 4 === 2, lit("crawl-delay: 2\n"))
          .when(col("k") % 4 === 3, lit("Crawl-delay: soon\n"))
          .otherwise(lit("")),
        lit("Disallow: /blocked\n"),
        when(col("k") % 3 === 0, lit("\nUser-agent: *\nCrawl-delay: 7\n"))
          .otherwise(lit("")),
        when(col("k") % 5 === 0,
          concat(lit("Sitemap: https://h"), kS, lit(".example.com/s2.xml # weekly\n")))
          .otherwise(lit("")),
        when(col("k") % 7 === 0, lit("Sitemap:\n")).otherwise(lit("")))
      graft.ops.Robots.directives(
        hosts.select(concat(lit("h"), kS, lit(".example.com")).as("host"),
          txt.as("txt")), "host", "txt")
        .select(col("host"), array_join(col("sitemaps"), "|").as("sitemaps"),
          col("crawl_delay"))
    }),

    // WARC capture ingestion: a two-record WARC/1.0 blob per document
    // (response + metadata; every 7th metadata payload embeds the literal
    // record magic) parsed by the Content-Length-honoring record walk.
    // The oracle restates the EXPECTED rows from the fixture formulas —
    // not a second parse — so any framing bug (e.g. splitting on the
    // magic instead of skipping Content-Length chars) value-fails
    "warc_records" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.ops.Warc.warcRecords(
        d.select(col("doc_id"),
          graft.ops.Warc.captureFixture(col("doc_id"), col("text"), col("lang")).as("warc")),
        "doc_id", "warc")
    }),

    // WARC gzip BYTE profile (the Common Crawl .warc.gz layout): each
    // record its own gzip member, Content-Length counting payload BYTES.
    // The response payload repeats multi-byte "café " so byte length
    // (6/repeat) ≠ char length (5/repeat) — a character-offset walk
    // shears and value-fails; every 7th metadata payload embeds the
    // record magic (the split-on-magic trap). Oracle = the fixture
    // formulas; the decompressor and walker never appear in it
    "warc_records_gz" -> ((s, dir) => {
      val d = docs(s, dir)
      val fx = udf((id: Long, lang: String) => graft.ops.Warc.gzCaptureFixture(id, lang))
      graft.ops.Warc.warcRecordsGz(
        d.select(col("doc_id"), fx(col("doc_id"), col("lang")).as("warc")),
        "doc_id", "warc")
    }),

    // HTTP response parsing — what a WARC `response` payload actually
    // holds (status line + header block + blank line + body). The
    // fixture varies status / Content-Type casing / quoted charsets,
    // plants an X-Content-Type trap header (line-start anchoring), a
    // body embedding its own \r\n\r\n (first-blank-line framing), a
    // truncated header block and a non-HTTP payload; the oracle's
    // expected values come from the fixture formulas, never a re-parse
    "http_parse" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.ops.Warc.httpResponses(
        d.select(col("doc_id"),
          graft.ops.Warc.httpPayloadFixture(
            col("doc_id"), col("text"), col("lang")).as("payload")),
        "payload")
        .select(col("doc_id"), col("http_status"), col("mime"),
          col("charset"), col("headers"), col("body"))
    }),

    // ---- multimodal: REAL container fixtures (valid PNG/JPEG/WAV bytes
    // built per doc_id) parsed by the real header codec; the oracle checks
    // the dimension formulas, so a parser reading the wrong offsets fails ----
    "multimodal_meta" -> ((s, dir) => {
      val fixtureUdf = udf((id: Long) => ((id % 4).toInt: @unchecked) match {
        case 0 => MediaCodec.pngFixture((1 + id % 640).toInt, (1 + id % 480).toInt)
        case 1 => MediaCodec.jpegFixture((1 + id % 640).toInt, (1 + id % 480).toInt)
        case 2 => MediaCodec.wavFixture((8000 + (id % 8) * 1000).toInt, (1 + id % 2).toInt, (id % 100).toInt)
        case 3 => MediaCodec.gifFixture((1 + id % 640).toInt, (1 + id % 480).toInt)
      })
      val withPayload = docs(s, dir)
        .withColumn("payload", fixtureUdf(col("doc_id")))
        .withColumn("media_type", lit("unknown"))
      Multimodal.withMetadata(withPayload, "payload", "media_type")
        .select(col("doc_id"),
          col("meta.media_type").as("media_type"),
          col("meta.width").cast("long").as("width"),
          col("meta.height").cast("long").as("height"),
          col("meta.n_frames").cast("long").as("n_frames"),
          col("meta.byte_len").as("byte_len"))
    }),

    // REAL baseline-JPEG luma decode (Huffman + dequant + islow IDCT)
    // adjudicated against the JDK's OWN ImageIO codec: the fixture
    // encodes deterministic 72×64 gray + color images with ImageIO,
    // ImageIO decodes them back for the reference luma, and OUR decoder
    // must agree — dimensions exactly; sums/max/dhash within the
    // documented tolerances (gray: ≤1/px IDCT spread; color: ≤2/px for
    // the RGB→luma round-trip through the writer's 4:2:0 color convert,
    // which also exercises MCU padding + crop since 16 ∤ 72). The
    // oracle is the all-TRUE decision table — the recall_l2 pattern:
    // DuckDB cannot decode JPEG, but the gate still value-fails the
    // moment our decoder drifts from the independent implementation
    "jpeg_luma_decode" -> ((s, dir) => {
      val fx = udf((id: Long) => jpegGateFixture(id))
      val f = docs(s, dir).select(col("doc_id"), fx(col("doc_id")).as("fx"))
      val g = graft.functions.jpeg_luma_stats(col("fx._1"))
      val c = graft.functions.jpeg_luma_stats(col("fx._2"))
      val pg = graft.functions.jpeg_luma_stats(col("fx._8"))
      val area = lit(72L * 64L)
      f.select(col("doc_id"),
        g.getField("width").as("g_w"), g.getField("height").as("g_h"),
        (abs(g.getField("sum_luma") - col("fx._3")) <= area).as("g_sum_ok"),
        (abs(g.getField("max_luma") - col("fx._4")) <= lit(1L)).as("g_max_ok"),
        (bit_count(graft.functions.jpeg_dhash(col("fx._1"))
          .bitwiseXOR(col("fx._5"))) <= lit(2)).as("g_dhash_ok"),
        c.getField("width").as("c_w"), c.getField("height").as("c_h"),
        (abs(c.getField("sum_luma") - col("fx._6")) <= area * 2).as("c_sum_ok"),
        (bit_count(graft.functions.jpeg_dhash(col("fx._2"))
          .bitwiseXOR(col("fx._7"))) <= lit(4)).as("c_dhash_ok"),
        // the progressive (SOF2) twin: the multi-scan accretion path
        // must earn the same grayscale agreement as the baseline scan
        pg.getField("width").as("p_w"), pg.getField("height").as("p_h"),
        (abs(pg.getField("sum_luma") - col("fx._9")) <= area).as("p_sum_ok"),
        (bit_count(graft.functions.jpeg_dhash(col("fx._8"))
          .bitwiseXOR(col("fx._10"))) <= lit(2)).as("p_dhash_ok"))
    }),

    // CROSS-FORMAT perceptual dedup: the same image rendered losslessly
    // (PNG) and lossily (JPEG) must land in the SAME dHash space —
    // png_dhash is value-exact against the formula-restated oracle, and
    // the PNG↔JPEG hamming distance stays within the pool-margin budget
    // (the fixture's ≥24-count margins make the lossy hash provably
    // stable, so cross_ok is a real decision, not a tautology)
    "image_dhash_cross_format" -> ((s, dir) => {
      val fx = udf((id: Long) => crossFormatFixture(id))
      docs(s, dir).select(col("doc_id"), fx(col("doc_id")).as("fx"))
        .select(col("doc_id"),
          graft.functions.png_dhash(col("fx._1")).as("png_dhash"),
          (bit_count(graft.functions.png_dhash(col("fx._1"))
            .bitwiseXOR(graft.functions.jpeg_dhash(col("fx._2")))) <= lit(4))
            .as("cross_ok"))
    }),

    // Frame sampling over real WAV headers: every 7th sample frame of each
    // audio payload becomes a row (the per-frame rows a real decoder slots
    // into); the oracle restates the stride arithmetic from the fixture's
    // frame-count formula. One row per (doc, sampled frame), capped per
    // doc by the fixture's n_frames = doc_id % 100.
    "multimodal_frames" -> ((s, dir) => {
      val fixtureUdf = udf((id: Long) =>
        MediaCodec.wavFixture((8000 + (id % 8) * 1000).toInt, (1 + id % 2).toInt, (id % 100).toInt))
      val withPayload = docs(s, dir)
        .withColumn("payload", fixtureUdf(col("doc_id")))
        .withColumn("media_type", lit("audio"))
      Multimodal.sampleFrames(
          Multimodal.withMetadata(withPayload, "payload", "media_type"), "meta", 7)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
    }),

    // REAL audio sample decode: WAV payloads carry MATERIALIZED 16-bit
    // PCM (s(i) = ((doc_id*31 + i*17) mod 4096) - 2048); the codegen'd
    // pcm_stats expression walks the RIFF chunks and decodes every LE16
    // sample; the oracle recomputes the exact integer statistics from the
    // generator formula — a decoder reading wrong offsets/endianness fails
    // Animation frame accounting via a REAL GIF89a block walk (image
    // descriptors + Graphic Control delays; NETSCAPE extension skipped
    // generically, no LZW decode) — the oracle restates count and total
    // delay from the fixture formulas
    "gif_frames" -> ((s, dir) => {
      val fixtureUdf = udf((id: Long) =>
        MediaCodec.gifAnimFixture(4 + (id % 5).toInt, 3 + (id % 4).toInt,
          frames = 1 + (id % 6).toInt, delayCs = 3 + (id % 7).toInt))
      docs(s, dir).withColumn("payload", fixtureUdf(col("doc_id")))
        .select(col("doc_id"), graft.functions.gif_frames(col("payload")).as("g"))
        .select(col("doc_id"), col("g.n_frames").as("n_frames"),
          col("g.total_delay_cs").as("total_delay_cs"))
    }),

    // Energy-envelope audio fingerprint over REAL decoded PCM16: 8-sample
    // frame energies, interior peak constellation, polynomial fold — the
    // oracle replays samples from the generator formula, frame sums,
    // peak selection, and the interleaved (idx, energy) fold verbatim
    "audio_fingerprint" -> ((s, dir) => {
      val fixtureUdf = udf((id: Long) =>
        MediaCodec.wavPcmFixture(16000, 1, (50 + id % 32).toInt, id))
      docs(s, dir).withColumn("payload", fixtureUdf(col("doc_id")))
        .select(col("doc_id"),
          graft.functions.pcm_fingerprint(col("payload"), 8).as("fp"))
        .select(col("doc_id"), col("fp.n_windows").as("n_windows"),
          col("fp.n_peaks").as("n_peaks"), col("fp.fingerprint").as("fingerprint"))
    }),

    "audio_pcm_stats" -> ((s, dir) => {
      val fixtureUdf = udf((id: Long) =>
        MediaCodec.wavPcmFixture(16000, 1, (50 + id % 32).toInt, id))
      Multimodal.withPcmStats(
          docs(s, dir).withColumn("payload", fixtureUdf(col("doc_id"))), "payload")
        .select(col("doc_id"), col("pcm.n_samples").as("n_samples"),
          col("pcm.sum_abs").as("sum_abs"), col("pcm.max_abs").as("max_abs"),
          col("pcm.zero_cross").as("zero_cross"))
    }),

    // REAL image pixel decode: PNG payloads with zlib-compressed 8-bit RGB
    // pixels (v = (doc_id + 7x + 13y + 29c) mod 256), each doc written
    // under scanline filter doc_id%5 — so all five PNG filter
    // reconstructions (None/Sub/Up/Average/Paeth) are exercised at the
    // gate; the oracle recomputes exact per-channel sums from the formula
    // Perceptual image dedup, stage 1: 63-bit dHash over REAL decoded
    // PNG pixels (18×16 fixtures — filter type cycles doc_id%5, gray and
    // RGB both exercised). The oracle replays generator pixels → integer
    // luma → 2×2 floor-mean pools → comparison bits, fully independently
    "image_dhash" -> ((s, dir) => {
      val fixtureUdf = udf((id: Long) =>
        MediaCodec.pngPixelFixture(18, 16, id, (id % 5).toInt,
          channels = if (id % 4 == 0) 1 else 3))
      docs(s, dir).withColumn("payload", fixtureUdf(col("doc_id")))
        .select(col("doc_id"), graft.functions.png_dhash(col("payload")).as("dhash"))
    }),

    // stage 2: hamming-≤7 near-dup pairs over the dHash column through
    // the generalized pigeonhole blocking (exact — any pair within 7
    // bits shares one of 8 chunks); oracle = all-pairs popcount
    "image_dhash_pairs" -> ((s, dir) => {
      val fixtureUdf = udf((id: Long) =>
        MediaCodec.pngPixelFixture(18, 16, id, (id % 5).toInt,
          channels = if (id % 4 == 0) 1 else 3))
      val hashed = docs(s, dir).withColumn("payload", fixtureUdf(col("doc_id")))
        .select(col("doc_id"), graft.functions.png_dhash(col("payload")).as("dhash"))
      Dedup.hammingPairs(hashed, "doc_id", col("dhash"), maxHamming = 7)
        .orderBy(col("a"), col("b"))
    }),

    "image_pixel_stats" -> ((s, dir) => {
      val fixtureUdf = udf((id: Long) =>
        MediaCodec.pngPixelFixture((1 + id % 8).toInt, (1 + id % 6).toInt, id, (id % 5).toInt))
      Multimodal.withPixelStats(
          docs(s, dir).withColumn("payload", fixtureUdf(col("doc_id"))), "payload")
        .select(col("doc_id"), col("px.width").as("width"),
          col("px.height").as("height"), col("px.channels").as("channels"),
          col("px.sum_r").as("sum_r"), col("px.sum_g").as("sum_g"),
          col("px.sum_b").as("sum_b"), col("px.max_px").as("max_px"))
    }),

    // Byte-feature extraction over the (printable-ASCII) text bytes: 1/256
    // scaling keeps all lane arithmetic exact, so sums and the
    // lane-weighted checksum are restated bit-for-bit by the oracle
    "multimodal_features" -> ((s, dir) => {
      val withPayload = docs(s, dir)
        .withColumn("payload", TextAnalysis.asciiOnly(col("text")).cast("binary"))
      Multimodal.withFeatures(withPayload, "payload", 16)
        .select(col("doc_id"),
          aggregate(col("features"), lit(0.0), (acc, x) => acc + x.cast("double")).as("feat_sum"),
          aggregate(zip_with(col("features"), sequence(lit(1), lit(16)),
            (f, w) => f.cast("double") * w.cast("double")),
            lit(0.0), (acc, x) => acc + x).as("feat_wsum"))
    }),

    // Temperature-flattened language mixture (α = 0.5): minority langs
    // upweighted past rate 1.0 (rows repeat), the majority sampled down —
    // per-lang realized rate and resampled row count, all exact-restatable
    // (9-dp decimal weight sums + exact-BIGINT idHash multiplicities)
    "mixture_temperature" -> ((s, dir) =>
      Curation.temperatureMixture(docs(s, dir), "doc_id", "lang", 0.5)
        .groupBy("lang")
        .agg(max(col("permille")).as("permille"),
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_resampled"))
        .orderBy("lang")),

    // Conjunctive Boolean retrieval over the inverted index: docs holding
    // ALL THREE query terms, ranked by total query-term tf — the plan
    // touches only the query terms' postings, never the corpus text
    "inverted_search" -> ((s, dir) =>
      TextAnalysis.conjunctiveSearch(
        TextAnalysis.invertedIndex(docs(s, dir), "doc_id", "text"),
        Seq("vector", "hash", "join"), 20)),

    // Cross-document repeated 3-grams (Lee et al. 2022's memorized-span
    // signal): grams in ≥ 2 distinct docs, counts exact, shuffle on the
    // gram key only
    "cross_doc_ngrams" -> ((s, dir) =>
      TextAnalysis.crossDocNgrams(docs(s, dir), "doc_id", "text", 3, 2)
        .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("gram"))
        .limit(50)),

    // PageRank over the SimHash near-dup graph, 3 power iterations — the
    // oracle replays every round independently (9-dp decimal contribution
    // sums make the unordered reduce exact, so a fixed iteration count is
    // engine-restatable)
    "pagerank" -> ((s, dir) =>
      Graph.pageRank(Dedup.simhashPairs(docs(s, dir), "doc_id", "text", 3),
          "a", "b", iterations = 3)
        .select(col("node").as("doc_id"), col("pagerank"))
        .orderBy("doc_id")),

    // HITS hubs/authorities on a dense synthetic DIRECTED graph
    // (u = doc_id%17 → v = doc_id%23, self-loops dropped, distinct):
    // two synchronous update cycles, L1-normalized, 9-dp decimal
    // arithmetic — the oracle replays both cycles' decimal sums and
    // double divisions verbatim (the pageRank exactness construction)
    "hits_scores" -> ((s, dir) =>
      graft.ops.Graph.hits(
        docs(s, dir).select((col("doc_id") % 17).as("u"),
          (col("doc_id") % 23).as("v")),
        "u", "v", iterations = 2).orderBy("node")),

    // Deterministic label propagation (min-label tiebreak) on the same
    // near-dup graph, two synchronous rounds — the oracle replays both
    // rounds' neighbor-label majorities with identical window semantics
    "label_propagation" -> ((s, dir) =>
      Graph.labelPropagation(Dedup.simhashPairs(docs(s, dir), "doc_id", "text", 3),
          "a", "b", iterations = 2)
        .select(col("node").as("doc_id"), col("label").as("community"))
        .orderBy("doc_id")),

    // Adjacent-pair PMI collocations: exact BIGINT counts, one ln() tree
    // over them — the count floor keeps the pair table vocabulary-sized
    "pmi_pairs" -> ((s, dir) =>
      TextAnalysis.pmiPairs(docs(s, dir), "doc_id", "text", minCount = 5)
        .orderBy(col("pmi").desc, col("a"), col("b")).limit(40)),

    // Content-defined chunking: rsync/LBFS boundary rule over the repo's
    // polynomial fingerprint — boundaries, offsets and per-chunk
    // fingerprints all exact BIGINT, restated verbatim by the oracle
    "cdc_chunks" -> ((s, dir) =>
      Curation.cdcChunks(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id", "chunk_idx")),

    // Per-node triangle counts (degree-oriented forward algorithm) on the
    // hamming≤7 SimHash graph — wider than dup_clusters' ≤3 so dense
    // pockets actually close; the oracle counts by direct 3-way join
    "triangle_counts" -> ((s, dir) =>
      Graph.triangles(Dedup.simhashPairs(docs(s, dir), "doc_id", "text", 7), "a", "b")
        .select(col("node").as("doc_id"), col("n_triangles"))
        .orderBy("doc_id")),

    // Deterministic pretraining shuffle: stable pseudorandom position per
    // row from a two-level prefix sum — no global sort anywhere
    "shuffle_positions" -> ((s, dir) =>
      Curation.shufflePositions(docs(s, dir), "doc_id", 32)
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy("doc_id")),

    // Training-shard store: the deterministic shuffle sliced into 8
    // contiguous ±1-equal shards, written Hive-partitioned, with the
    // manifest computed from reading the STORE back — doc counts, token
    // (n_chars) volume, position ranges, and the order-independent
    // bit_xor membership fingerprint per shard. The oracle replays the
    // (h53 % 32, h53, id) order, the (pos·8) // N shard cut, and the
    // xor — so a row dropped/duplicated anywhere in the write path, or a
    // shard boundary off by one, value-fails
    "training_shards" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_shards")
        .toString + "/shards"
      Curation.writeTrainingShards(docs(s, dir), "doc_id", col("n_chars"),
          out, 8, nBuckets = 32)
        .orderBy("shard")
    }),

    // Corpus novelty: fraction of each doc's distinct 3-grams appearing
    // in no other doc — boilerplate/contamination collapses it to ~0
    "novelty_score" -> ((s, dir) =>
      TextAnalysis.noveltyScores(docs(s, dir), "doc_id", "text", 3)
        .orderBy("doc_id")),

    // Efraimidis-Spirakis weighted sampling without replacement: top-50
    // by ln(u)/w with the deterministic idHash53 uniform — exact weighted
    // selection as a pure projection + TakeOrdered, no shuffle
    "weighted_sample" -> ((s, dir) =>
      Curation.weightedSample(docs(s, dir), "doc_id", col("n_chars"), 50)
        .select(col("doc_id"), col("n_chars"), col("sample_key"))),

    // Grouped heavy hitters: top-10 tokens per language via per-key
    // Misra-Gries sketches + exact recount, each key certified against
    // its own n/(k+1) bound — the oracle is the plain exact per-key
    // top-10, which certification guarantees the sketch path matches
    "heavy_hitters_by_lang" -> ((s, dir) =>
      Curation.heavyHittersByKey(docs(s, dir), "lang", "text",
          topN = 10, sketchK = 200)
        .orderBy(col("lang"), col("rank"))),

    // Corpus data card: release-summary metrics in one long-format table
    // — sizes, token volume, fingerprint-exact dup rate, decimal-exact
    // mean quality, token quartiles; every number independently restated
    "data_card" -> ((s, dir) =>
      Curation.dataCard(docs(s, dir), "doc_id", "text")),

    // Quality-curriculum quartile bins: exact percentile cuts (rounded
    // 6 dp) + a pure-projection Σ(score > cut) assignment; the oracle
    // recomputes the quality formula, quantile_cont cuts, and bins
    "curriculum_bins" -> ((s, dir) =>
      Curation.curriculumBins(docs(s, dir), "doc_id",
          TextAnalysis.qualityScore(col("text")))
        .orderBy("doc_id")),

    // Per-language quality floor: drop each lang's bottom quartile on the
    // scale-6 integer grid — binary-fraction quantile interpolation is
    // evaluation-order-exact, so Spark percentile and DuckDB
    // quantile_cont agree bit for bit with no rounding step
    "quality_floor_by_lang" -> ((s, dir) =>
      Curation.qualityFloorPerKey(docs(s, dir), "doc_id", "lang",
          TextAnalysis.qualityScore(col("text")), frac = 0.25)
        .select(col("id").as("doc_id"), col("key").as("lang"),
          col("score"), col("cut"))
        .orderBy("doc_id")),

    // Exact token-budget cut: best docs by quality until 15k tokens, no
    // global sort (bucket rollup + driver walk + tie-bucket window). The
    // oracle replays the quality formula, the desc-cumsum bucket walk,
    // the cut/residual scalars, and the (idHash53, id) tie order
    "token_budget_select" -> ((s, dir) =>
      Curation.tokenBudgetSelect(docs(s, dir), "doc_id",
          TextAnalysis.qualityScore(col("text")),
          TextAnalysis.tokenCount(col("text")), budget = 15000L)
        .select(col("id").as("doc_id"), col("score_key"), col("n_tokens"))
        .orderBy("doc_id")),

    // UniMax budget allocation over languages (n_chars as token weight):
    // small domains cap at maxEpochs, the rest split the leftover evenly
    // — the closed-form waterfill with both branches live at these
    // parameters (4 capped languages + english on the even share)
    "unimax_mixture" -> ((s, dir) =>
      Curation.unimaxAllocation(docs(s, dir), "lang", col("n_chars"),
          budget = 250000L, maxEpochs = 2)
        .orderBy(col("domain"))),

    // Per-language weighted cap: keep 5 docs per lang sampled ∝ n_chars
    // via deterministic ES keys through the bounded heap — the oracle
    // replays keys and the per-key (key desc, id) rank cut
    "weighted_cap_per_key" -> ((s, dir) =>
      Curation.weightedCapPerKey(docs(s, dir), "doc_id", "lang", col("n_chars"), 5)
        .orderBy(col("lang"), col("rank"))),

    // DSIR importance scores: per-doc summed log-likelihood ratio of
    // hashed-token bucket distributions, target = the English slice vs
    // the whole corpus; the oracle recomputes bucket hashes from
    // character codes, both Laplace-smoothed distributions, and every
    // 9-dp decimal term independently
    "dsir_scores" -> ((s, dir) =>
      Curation.dsirScores(docs(s, dir), "doc_id", "text",
        col("lang") === "en", buckets = 256)),

    // DSIR resampling: Gumbel top-100 ∝ exp(score) off the deterministic
    // idHash53 uniform — the selection the scores exist to drive
    "dsir_sample" -> ((s, dir) => {
      val sc = Curation.dsirScores(docs(s, dir), "doc_id", "text",
        col("lang") === "en", buckets = 256)
      Curation.dsirSample(sc, "doc_id", col("dsir_score"), 100)
        .select(col("doc_id"), col("dsir_score"), col("sample_key"))
    }),

    // Interpolated bigram LM (Jelinek-Mercer λ=0.7): lm_logprob with
    // context — unseen-in-context pairs degrade to the unigram floor
    // instead of ln(0); same 9-dp decimal exactness contract
    "bigram_logprob" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(docs(s, dir), "doc_id", "text", lambda = 0.7)
        .orderBy("doc_id")),

    // Kneser-Ney bigram LM (D=0.75): absolute discounting + continuation
    // back-off — the oracle replays all five count tables and the
    // explicitly-cast double tree
    "kneser_ney_logprob" -> ((s, dir) =>
      TextAnalysis.kneserNeyLogProb(docs(s, dir), "doc_id", "text", discount = 0.75)
        .orderBy("doc_id")),

    // Sparse more-like-this: per-doc top-5 by TF-IDF cosine over the
    // inverted index — weights/norms/dots all 9-dp decimal-exact, the
    // oracle replays the whole retrieval pipeline including the rank cut
    "similar_docs_sparse" -> ((s, dir) =>
      TextAnalysis.similarDocsSparse(docs(s, dir), "doc_id", "text", k = 5)
        .orderBy("doc_id", "rank")),

    // Hybrid retrieval: BM25 top-50 and cosine k-NN top-50 fused by
    // reciprocal rank (1/(60+rank) per list, 9-dp decimal sums) — rank
    // calibration instead of score calibration, the RAG-stack combiner
    "rrf_hybrid" -> ((s, dir) => {
      val bm = TextAnalysis.bm25(docs(s, dir), "doc_id", "text",
          Seq("vector", "hash", "scan"))
        .orderBy(col("score").desc, col("doc_id")).limit(50)
      // round-BEFORE-cut (the knnQuery convention): the oracle cuts its
      // top-50 on the 6-dp rounded distance with doc_id tiebreak, so the
      // Spark leg must rank on the identical rounded key — cutting on raw
      // distance and rounding after can disagree on shortlist membership
      // when two candidates round to the same value at the 50-boundary
      val kn = Knn.distanceStream(emb(s, dir), "vec_id", "embedding", probe, "cosine")
        .select(col("vec_id").as("doc_id"), fast_round(col("distance"), 6).as("distance"))
        .orderBy(col("distance"), col("doc_id")).limit(50)
      TextAnalysis.rrfFuse(
        Seq((bm, col("score").desc), (kn, col("distance"))), "doc_id", c = 60, topN = 20)
    })
  )

  // ---------------- the oracle SQL ----------------

  private val tokensSql = """regexp_split_to_array(trim(text), '\s+')"""
  private val enStopSql = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")

  /** Curation-side normalization (Curation.cleanText/cleanTokens): text →
    * lowercased printable ASCII `ac`, non-empty space-split tokens `ws`.
    */
  private val cleanAcSql = """lower(regexp_replace(text, '[^ -~]', '', 'g'))"""
  /** DSIR restatement: curation-normalized tokens bucketed by the
    * string_hash61 polynomial recomputed from character codes, both
    * Laplace-smoothed bucket distributions, the four-ln LLR tree with
    * 9-dp decimal terms, per-doc sums re-rounded to 6 dp.
    */
  private lazy val dsirScoresCte: String = {
    val chars = "list_transform(generate_series(1, length(term)), i -> CAST(ascii(term[i]) AS BIGINT))"
    def poly(base: Int, mod: Long) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $chars), (acc, c) -> (acc * $base + c) % $mod)"
    s"""toks AS (SELECT doc_id, lang = 'en' AS tg, unnest(${cleanWsSql(cleanAcSql)}) AS term FROM documents),
       |hb AS (SELECT doc_id, tg,
       |  ((${poly(31, 1000000007L)}) * 2147483648 + (${poly(131, 2147483647L)})) % 256 AS b FROM toks),
       |rawc AS (SELECT b, count(*) AS cr FROM hb GROUP BY b),
       |tgtc AS (SELECT b, count(*) AS ct FROM hb WHERE tg GROUP BY b),
       |totr AS (SELECT count(*) AS nr FROM hb),
       |tott AS (SELECT count(*) AS nt FROM hb WHERE tg),
       |lut AS (SELECT rawc.b, CAST(round(
       |  (ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE)) - ln(CAST(nt + 256 AS DOUBLE)))
       |  - (ln(CAST(cr + 1 AS DOUBLE)) - ln(CAST(nr + 256 AS DOUBLE))), 9) AS DECIMAL(38,9)) AS lr
       |  FROM rawc LEFT JOIN tgtc USING (b) CROSS JOIN totr CROSS JOIN tott),
       |sc AS (SELECT doc_id, round(CAST(sum(lr) AS DOUBLE), 6) AS dsir_score, count(*) AS n_tokens
       |  FROM hb JOIN lut USING (b) GROUP BY doc_id)""".stripMargin
  }

  // all-integer scale-9 restatement (mirrors TextAnalysis.qualityScore):
  // half-up rational terms via (2a+b)//(2b), BIGINT sum, one more
  // half-up // to 6 dp, and only the final <=1e6 integer touches DOUBLE
  private lazy val qualityScoreSql: String = {
    def hdiv(a: String, b: String) = s"((($a) * 2 + ($b)) // (($b) * 2))"
    val nTok = s"CAST(len($tokensSql) AS BIGINT)"
    val nDis = s"CAST(len(list_distinct($tokensSql)) AS BIGINT)"
    val nChr = "CAST(length(text) AS BIGINT)"
    val nStop = s"CAST(len(list_filter($tokensSql, t -> t IN ($enStopSql))) AS BIGINT)"
    val g = s"greatest($nTok, 1)"
    val t1 = s"(CASE WHEN $nTok <= 100 THEN $nTok * 2500000 ELSE 250000000 END)"
    val t2 = hdiv(s"$nDis * 1000000000", s"$g * 4")
    val t3 = s"(CASE WHEN $nChr <= 500 THEN $nChr * 500000 ELSE 250000000 END)"
    val t4 = s"least(${hdiv(s"$nStop * 5000000000", s"$g * 4")}, 250000000)"
    s"(CAST((($t1 + $t2 + $t3 + $t4 + 500) // 1000) AS DOUBLE) / 1000000.0)"
  }

  private def cleanWsSql(ac: String) =
    s"list_filter(regexp_split_to_array(trim($ac), ' +'), w -> w <> '')"

  /** [[TextAnalysis.canonicalUrl]]'s step chain as shared CTEs: expects a
    * CTE `u` with (doc_id, url), exposes `p3` with (doc_id, url, scheme,
    * hostport, host, pth, q).
    */
  private val urlCanonCtes: String =
    s"""p1 AS (SELECT doc_id, url,
       |  lower(regexp_extract(url, '(?i)^(https?)://', 1)) AS scheme,
       |  lower(regexp_extract(url, '(?i)^https?://([^/?#]+)', 1)) AS hostport,
       |  regexp_extract(url, '(?i)^https?://[^/?#]+([^#]*)', 1) AS rest FROM u),
       |p2 AS (SELECT doc_id, url, scheme, hostport,
       |  CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
       |       ELSE regexp_replace(hostport, ':443$$', '') END AS host,
       |  regexp_extract(rest, '^([^?]*)', 1) AS pth,
       |  list_filter(string_split(regexp_extract(rest, '^[^?]*\\?(.*)$$', 1), '&'),
       |    qp -> qp <> '' AND NOT regexp_matches(qp, '^(utm_[a-z0-9]+|gclid|fbclid)=')) AS params FROM p1),
       |p3 AS (SELECT doc_id, url, scheme, hostport, host, pth,
       |  CASE WHEN len(params) = 0 THEN '' ELSE '?' || array_to_string(params, '&') END AS q FROM p2)""".stripMargin

  /** Shared HTML fixture for the extract_links / web_link_graph gates:
    * case-varied tags, both quote styles, nested markup, an href-less
    * anchor, an empty (self-referencing) href every 5th doc, and an
    * anchor carrying numeric + named entities (`alt&#32;&#77;&amp;x` →
    * "alt M&x") — the entity-decode path every anchor inherits from
    * cleanFragment.
    */
  private def linkHtmlFixture(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val idS = idCol.cast("string")
    val k = (idCol % 10).cast("string")
    concat(
      lit("<html><body><nav><A CLASS=\"n\" HREF=\"/\">Home</A> " +
        "<a href=\"/about#f\">About<b>Us</b></a></nav><p>see "),
      lit("<a href=\"https://site"), k, lit(".com/page"), idS,
      lit("?x=1\" rel=\"x\">page "), idS, lit("\n here</a> and "),
      lit("<a href='https://alt"), k, lit(".org/p"), idS,
      lit("'>alt&#32;&#77;&amp;x "), idS,
      lit("</a> <a name=\"n\">not a link</a>"),
      when(idCol % 5 === 0, lit(" <a href=\"\">empty</a>"))
        .otherwise(lit("")),
      lit("</p></body></html>"))
  }

  /** Shared decision-table CTEs for the frontier gates: `ext` = one row
    * per extracted link with its resolved+canonical URL and the
    * blocklist / already-fetched flags (all derived from the fixture
    * formulas), `d` = the distinct candidate set, `alw` = post-robots
    * survivors (odd-k site hosts disallow /page), `sel` = the per-domain
    * (rolling-hash, url) priority ranking for the cap.
    * `withRedirects` adds the redirect-terminal decision rows (the
    * [[frontierRedirectCaptures]] formulas): the 200-with-Location trap
    * and the cycA↔cycB cycle contribute NOTHING, the two-hop chain's
    * terminal appears once per chain source (hop1 and hop2).
    */
  private def frontierCtes(withRedirects: Boolean = false): String = {
    val fp = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(generate_series(1, length(url)), " +
      "j -> CAST(ascii(url[j]) AS BIGINT))), (acc, c) -> (acc * 31 + c) % 1000000007)"
    val redirRows = if (!withRedirects) "" else
      s"""
       |  UNION ALL SELECT 'https://site' || ks || '.com/page-r' || i, k, FALSE, FALSE, 'redirect' FROM b
       |  UNION ALL SELECT 'https://x' || ks || '.net/final' || i, k, FALSE, FALSE, 'redirect' FROM b
       |  UNION ALL SELECT 'https://x' || ks || '.net/final' || i, k, FALSE, FALSE, 'redirect' FROM b
       |  UNION ALL SELECT 'https://alt' || ks || '.org/p' || i, k, k = 3, FALSE, 'redirect' FROM b
       |  UNION ALL SELECT 'https://h' || ks || '.com/a/page' || i || '.html', k, FALSE, TRUE, 'redirect' FROM b
       |  UNION ALL SELECT 'https://h' || ks || '.com/about', k, FALSE, FALSE, 'redirect' FROM b WHERE k <> 7
       |  UNION ALL SELECT 'https://site' || ks || '.com/sm/' || ks, k, FALSE, FALSE, 'redirect' FROM rng""".stripMargin
    s"""b AS (SELECT doc_id, doc_id % 10 AS k, CAST(doc_id % 10 AS VARCHAR) AS ks,
       |    CAST(doc_id AS VARCHAR) AS i FROM documents),
       |rng AS (SELECT CAST(range AS BIGINT) AS k, CAST(range AS VARCHAR) AS ks FROM range(10)),
       |ext AS (
       |  -- '/' canonicalizes to the bare host (the example.com/ = example.com identity)
       |  SELECT 'https://h' || ks || '.com' AS url, k, FALSE AS blocked, FALSE AS fetched, 'link' AS src FROM b
       |  UNION ALL SELECT 'https://h' || ks || '.com/about', k, FALSE, FALSE, 'link' FROM b
       |  UNION ALL SELECT 'https://site' || ks || '.com/page' || i || '?x=1', k, FALSE, FALSE, 'link' FROM b
       |  UNION ALL SELECT 'https://alt' || ks || '.org/p' || i, k, k = 3, FALSE, 'link' FROM b
       |  UNION ALL SELECT 'https://h' || ks || '.com/a/page' || i || '.html', k, FALSE, TRUE, 'link' FROM b
       |    WHERE doc_id % 5 = 0
       |  -- sitemap leaves, one set per k host: the index root and the
       |  -- missing child ref contribute no rows; the tracking param on
       |  -- /page-sm dies at canonicalization (query becomes empty)
       |  UNION ALL SELECT 'https://site' || ks || '.com/page-sm', k, FALSE, FALSE, 'sitemap' FROM rng
       |  UNION ALL SELECT 'https://site' || ks || '.com/sm/' || ks, k, FALSE, FALSE, 'sitemap' FROM rng
       |  UNION ALL SELECT 'https://alt' || ks || '.org/sm', k, k = 3, FALSE, 'sitemap' FROM rng
       |  UNION ALL SELECT 'https://h' || ks || '.com/about', k, FALSE, FALSE, 'sitemap' FROM rng
       |  UNION ALL SELECT 'https://h' || ks || '.com/a/page' || ks || '.html', k, FALSE, TRUE, 'sitemap' FROM rng$redirRows),
       |cand AS (SELECT url, k, src FROM ext WHERE NOT blocked AND NOT fetched),
       |d AS (SELECT url, k, bool_or(src = 'link') AS fl, bool_or(src = 'sitemap') AS fs,
       |    bool_or(src = 'redirect') AS fr
       |  FROM cand GROUP BY url, k),
       |alw AS (SELECT url, k, fl, fs, fr FROM d
       |  WHERE NOT (k % 2 = 1 AND url LIKE 'https://site' || CAST(k AS VARCHAR) || '.com/page%')),
       |pr AS (SELECT url, k, fl, fs, fr,
       |    CASE WHEN url LIKE 'https://site%' THEN 'site' || CAST(k AS VARCHAR) || '.com'
       |         WHEN url LIKE 'https://alt%' THEN 'alt' || CAST(k AS VARCHAR) || '.org'
       |         WHEN url LIKE 'https://x%' THEN 'x' || CAST(k AS VARCHAR) || '.net'
       |         ELSE 'h' || CAST(k AS VARCHAR) || '.com' END AS domain,
       |    $fp AS fp
       |  FROM alw),
       |sel AS (SELECT *, row_number() OVER (PARTITION BY domain ORDER BY fp, url) AS rn,
       |    count(*) OVER (PARTITION BY domain) AS nd FROM pr)""".stripMargin
  }

  /** The provenance restatement: the legacy pair name 'both' for
    * link+sitemap; combinations with redirect name their members.
    */
  private val frontierSourceCase: String =
    """CASE WHEN fl AND fs AND fr THEN 'both+redirect'
      |       WHEN fl AND fs THEN 'both'
      |       WHEN fl AND fr THEN 'link+redirect'
      |       WHEN fs AND fr THEN 'sitemap+redirect'
      |       WHEN fr THEN 'redirect'
      |       WHEN fs THEN 'sitemap' ELSE 'link' END AS source""".stripMargin

  private def frontierE2eSql: String =
    s"""WITH ${frontierCtes(withRedirects = true)}
       |SELECT url, domain AS host, domain,
       |  CASE WHEN url LIKE 'https://site%' THEN CAST(k AS DOUBLE)
       |       ELSE CAST(NULL AS DOUBLE) END AS crawl_delay,
       |  nd > 30 AS site_capped,
       |  $frontierSourceCase
       |FROM sel WHERE rn <= 30""".stripMargin

  /** The in-link-evidence oracle: candidates restated from the
    * [[frontierInlinkPages]] formulas, evidence = count(DISTINCT
    * offsite ref), the cap replayed on the composite integer key.
    * Shared verbatim by the string- and hash-keyed gates.
    */
  private def frontierInlinksSql: String = {
    val fp = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(generate_series(1, length(url)), " +
      "j -> CAST(ascii(url[j]) AS BIGINT))), (acc, c) -> (acc * 31 + c) % 1000000007)"
    s"""WITH b AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS ks,
       |    CAST(doc_id AS VARCHAR) AS i FROM documents),
       |ext AS (
       |  SELECT 'https://pop.net/hot' || CAST(doc_id % 3 AS VARCHAR) AS url,
       |      'pop.net' AS dom, 'h' || ks || '.com' AS ref FROM b
       |  UNION ALL SELECT 'https://pop.net/cold' || i, 'pop.net',
       |      'h' || ks || '.com' FROM b
       |  UNION ALL SELECT 'https://h' || ks || '.com/local' || i,
       |      'h' || ks || '.com', 'h' || ks || '.com' FROM b
       |  UNION ALL SELECT 'https://mid.org/m' || CAST(doc_id % 3 AS VARCHAR),
       |      'mid.org', 'h' || ks || '.com' FROM b WHERE doc_id % 2 = 0),
       |d AS (SELECT url, dom,
       |    count(DISTINCT CASE WHEN ref <> dom THEN ref END) AS nref
       |  FROM ext GROUP BY url, dom),
       |sel AS (SELECT url, dom, nref,
       |    row_number() OVER (PARTITION BY dom
       |      ORDER BY (1023 - least(nref, 1023)) * 2147483648 + $fp, url) AS rn,
       |    count(*) OVER (PARTITION BY dom) AS nd
       |  FROM d)
       |SELECT url, dom AS host, dom AS domain,
       |  CAST(NULL AS DOUBLE) AS crawl_delay, nd > 8 AS site_capped,
       |  'link' AS source, nref AS n_ref_domains
       |FROM sel WHERE rn <= 8""".stripMargin
  }

  private def langHitsSql(words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t IN ($list)))"
  }

  /** The pipeline gates' shared staged-replay CTE chain (see the
    * pipeline_e2e gate comment for the stage ↔ CTE mapping): survivor
    * sets per stage, the fixture-formula text, idHash53 cap, packing
    * prefix sum and shard shuffle. Final per-doc CTE = `sp`; stage
    * survivor CTEs (ids/rob/lng/urld/nd/dec/q/cap) stay in scope for
    * the funnel restatement. `ingWhere` injects the http profile's two
    * S1.5 ingest drop classes ahead of robots (default: keep all).
    */
  /** The ingest-through-URL-dedup CTE prefix (stages S1-S7), wave- and
    * prefix-parameterizable so the incremental oracle can instantiate a
    * second (earlier) wave's survivor set next to the main chain.
    */
  private def pipeIngestCtes(p: String, docWhere: String, ingWhere: String): String =
    s"""${p}ids AS (SELECT doc_id,
       |    CASE WHEN doc_id % 31 = 17 THEN doc_id - 1 ELSE doc_id END AS e,
       |    CASE WHEN doc_id % 17 = 1 THEN doc_id - 1 ELSE doc_id END AS u
       |  FROM documents WHERE $docWhere),
       |${p}rob AS (SELECT * FROM ${p}ids WHERE ($ingWhere) AND u % 7 <> 3),
       |${p}lng AS (SELECT * FROM ${p}rob WHERE e % 29 <> 13),
       |${p}urld AS (SELECT * FROM ${p}lng
       |  WHERE doc_id IN (SELECT min(doc_id) FROM ${p}lng GROUP BY u))""".stripMargin

  private def pipeCtes(ingWhere: String = "TRUE", docWhere: String = "TRUE",
                       seenWave: Option[String] = None): String = {
    // incremental: the screen drops wave docs whose post-clean text an
    // earlier wave's URL-dedup survivor already carried; at the fixture's
    // formulas text equality ⟺ e equality (the snapshot_diff argument)
    val w1 = seenWave.map(w =>
      pipeIngestCtes("w1", w, ingWhere) + ",\n" +
        """inc AS (SELECT * FROM urld t
          |  WHERE NOT EXISTS (SELECT 1 FROM w1urld w WHERE w.e = t.e)),"""
          .stripMargin + "\n").getOrElse("")
    val ndSrc = if (seenWave.isDefined) "inc" else "urld"
    s"""${pipeIngestCtes("", docWhere, ingWhere)},
         |${w1}nd AS (SELECT * FROM $ndSrc t WHERE NOT (t.doc_id % 31 = 17
         |  AND EXISTS (SELECT 1 FROM $ndSrc p WHERE p.doc_id = t.doc_id - 1))),
         |sd AS (SELECT doc_id, e, u,
         |    (doc_id = (SELECT min(doc_id) FROM nd)) AS keep_moji,
         |    (e % 19 = 7 AND doc_id = (SELECT min(doc_id) FROM nd WHERE e % 19 = 7))
         |      AS keep_contam
         |  FROM nd),
         |dec AS (SELECT * FROM sd WHERE NOT keep_contam),
         |q AS (SELECT * FROM dec WHERE e % 23 <> 11),
         |txt AS (SELECT doc_id, e, u,
         |    'site' || CAST(u % 10 AS VARCHAR) || '.com' AS domain,
         |    'the quick brown fox number ' || CAST(e AS VARCHAR)
         |      || ' jumps over one lazy dog.'
         |      || ' it runs near town t' || CAST(e % 7 AS VARCHAR)
         |      || ' beside marker m' || CAST(e AS VARCHAR) || 'a and m'
         |      || CAST(e AS VARCHAR) || 'b then m' || CAST(e AS VARCHAR)
         |      || 'c every single day with speed.'
         |      || (CASE WHEN keep_moji THEN ' we met at the café yesterday.'
         |          ELSE '' END) AS text
         |  FROM q),
         |pri AS (SELECT *,
         |    ((doc_id % 2147483648) * 2654435761
         |      + CAST(doc_id // 2147483648 AS BIGINT) * 40503) % 1000000007 * 8388608
         |    + ((doc_id % 2147483648) * 2246822519
         |      + CAST(doc_id // 2147483648 AS BIGINT) * 69069) % 8388593 AS h53
         |  FROM txt),
         |cap AS (SELECT * FROM (SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY h53, doc_id) AS rn
         |  FROM pri) WHERE rn <= 25),
         |tok AS (SELECT doc_id, domain, text, h53,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^\\sA-Za-z0-9]'))
         |      AS BIGINT) AS n_tokens
         |  FROM cap),
         |pk AS (SELECT *, CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS start_offset FROM tok),
         |sp AS (SELECT *,
         |    ROW_NUMBER() OVER (ORDER BY h53 % 32, h53, doc_id) - 1 AS shuffle_pos,
         |    COUNT(*) OVER () AS n FROM pk)"""
  }

  /** The pipeline gates' shared result restatement (text and gz profiles
    * replay identically — the fixtures share their formulas; the http
    * profile adds its two ingest drop classes via `ingWhere`; the
    * incremental gate restricts to a wave via `docWhere` and screens
    * against `seenWave`'s survivors). */
  private def pipeE2eSql(ingWhere: String = "TRUE", docWhere: String = "TRUE",
                         seenWave: Option[String] = None): String =
    s"""WITH ${pipeCtes(ingWhere, docWhere, seenWave)}
       |SELECT doc_id, domain, text, n_tokens, start_offset,
       |  CAST(start_offset // 512 AS BIGINT) AS pack_id,
       |  (n_tokens > 0 AND (start_offset + n_tokens - 1) // 512 <> start_offset // 512)
       |    AS crosses,
       |  CAST(shuffle_pos AS BIGINT) AS shuffle_pos,
       |  CAST((shuffle_pos * 4) // n AS INT) AS shard
       |FROM sp""".stripMargin

  /** Shared by the string-keyed gates and their `hashKeys` twins — one
    * SQL string, so a value drift between the two variants is impossible
    * to hide in a restatement diff.
    */
  private val AnchorTextsSql: String =
    """WITH b AS (SELECT doc_id, doc_id % 10 AS k,
      |    CAST(doc_id % 10 AS VARCHAR) AS ks, CAST(doc_id AS VARCHAR) AS i
      |  FROM documents),
      |kk AS (SELECT k, CAST(k AS VARCHAR) AS ks, count(*) AS n FROM b GROUP BY 1, 2)
      |SELECT 'https://h' || ks || '.com/' AS dst_url,
      |  CAST(n AS BIGINT) AS n_anchors, 'Home' AS anchors,
      |  FALSE AS anchors_capped FROM kk
      |UNION ALL SELECT 'https://h' || ks || '.com/about',
      |  CAST(n AS BIGINT), 'About Us', FALSE FROM kk
      |UNION ALL SELECT 'https://site' || ks || '.com/page' || i || '?x=1',
      |  CAST(1 AS BIGINT), 'page ' || i || ' here', FALSE FROM b
      |UNION ALL SELECT 'https://alt' || ks || '.org/p' || i,
      |  CAST(1 AS BIGINT), 'alt M&x ' || i, FALSE FROM b
      |UNION ALL SELECT 'https://h' || ks || '.com/a/page' || i || '.html',
      |  CAST(1 AS BIGINT), 'empty', FALSE FROM b WHERE doc_id % 5 = 0""".stripMargin

  private val WebLinkGraphSql: String =
    """WITH k AS (SELECT doc_id % 10 AS k, count(*) AS n FROM documents GROUP BY 1)
      |SELECT 'h' || CAST(k AS VARCHAR) || '.com' AS src_host,
      |  'h' || CAST(k AS VARCHAR) || '.com' AS dst_host,
      |  CAST(2 * n + CASE WHEN k % 5 = 0 THEN n ELSE 0 END AS BIGINT) AS n_links
      |FROM k
      |UNION ALL SELECT 'h' || CAST(k AS VARCHAR) || '.com',
      |  'site' || CAST(k AS VARCHAR) || '.com', CAST(n AS BIGINT) FROM k
      |UNION ALL SELECT 'h' || CAST(k AS VARCHAR) || '.com',
      |  'alt' || CAST(k AS VARCHAR) || '.org', CAST(n AS BIGINT) FROM k""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "knn_l2" -> knnSql("l2"),

    "csv_ingest_knn" -> knnSql("l2"),

    "json_ingest_knn" -> knnSql("l2"),
    "knn_sq_l2" -> knnSql("sq_l2"),
    "knn_cosine" -> knnSql("cosine"),
    "knn_dot" -> knnSql("dot"),
    "knn_l1" -> knnSql("l1"),

    "dist_stream_l2" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv)
         |SELECT vec_id, round(${distSql("l2")}, 6) AS distance FROM embeddings, p WHERE embedding IS NOT NULL""".stripMargin,

    "knn_join_docs" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id, ${distSql("cosine")} AS distance FROM embeddings, p WHERE embedding IS NOT NULL),
         |k AS (SELECT vec_id, round(distance, 6) AS distance FROM d ORDER BY round(distance, 6), vec_id LIMIT $K)
         |SELECT doc_id, k.distance, source FROM documents JOIN k ON doc_id = k.vec_id""".stripMargin,

    // window restatement of the bounded-heap aggregate: same (distance, id)
    // lexicographic order, rn ≤ k
    "knn_batch_probes" ->
      s"""WITH pr AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 8),
         |d AS (SELECT pr.probe_id, e.vec_id,
         |  round(sqrt(list_sum(list_transform(generate_series(1,$Dim),
         |    i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(pr.pv[i] AS DOUBLE))
         |       * (CAST(e.embedding[i] AS DOUBLE) - CAST(pr.pv[i] AS DOUBLE))))), 6) AS distance
         |  FROM embeddings e, pr WHERE e.embedding IS NOT NULL),
         |r AS (SELECT probe_id, vec_id, distance,
         |  row_number() OVER (PARTITION BY probe_id ORDER BY distance, vec_id) AS rn FROM d)
         |SELECT probe_id, CAST(rn AS BIGINT) AS rank, vec_id, distance FROM r WHERE rn <= 5""".stripMargin,

    "hard_negatives" ->
      s"""WITH pr AS (SELECT vec_id AS anchor_id, embedding AS pv, label AS al FROM embeddings
         |  WHERE vec_id % 50 = 0 AND embedding IS NOT NULL),
         |d AS (SELECT pr.anchor_id, e.vec_id,
         |  round(sqrt(list_sum(list_transform(generate_series(1,$Dim),
         |    i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(pr.pv[i] AS DOUBLE))
         |       * (CAST(e.embedding[i] AS DOUBLE) - CAST(pr.pv[i] AS DOUBLE))))), 6) AS distance
         |  FROM embeddings e, pr WHERE e.embedding IS NOT NULL AND e.label <> pr.al),
         |r AS (SELECT anchor_id, vec_id, distance,
         |  row_number() OVER (PARTITION BY anchor_id ORDER BY distance, vec_id) AS rn FROM d)
         |SELECT anchor_id, CAST(rn AS BIGINT) AS rank, vec_id AS neg_id, distance
         |FROM r WHERE rn <= 5""".stripMargin,

    // the pure-SQL form computes the identical result
    "sql_knn_batch" ->
      s"""WITH pr AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 8),
         |d AS (SELECT pr.probe_id, e.vec_id,
         |  round(sqrt(list_sum(list_transform(generate_series(1,$Dim),
         |    i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(pr.pv[i] AS DOUBLE))
         |       * (CAST(e.embedding[i] AS DOUBLE) - CAST(pr.pv[i] AS DOUBLE))))), 6) AS distance
         |  FROM embeddings e, pr WHERE e.embedding IS NOT NULL),
         |r AS (SELECT probe_id, vec_id, distance,
         |  row_number() OVER (PARTITION BY probe_id ORDER BY distance, vec_id) AS rn FROM d)
         |SELECT probe_id, CAST(rn AS BIGINT) AS rank, vec_id, distance FROM r WHERE rn <= 5""".stripMargin,

    // per-lane fixed-point sums: CAST(round(x*1e6) AS BIGINT) is the same
    // half-away-from-zero rounding VectorAvgFixed.fixedPoint applies
    "group_centroids" ->
      s"""WITH u AS (SELECT label, g.i AS i,
         |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS v
         |  FROM embeddings, UNNEST(generate_series(1, $Dim)) AS g(i) WHERE embedding IS NOT NULL)
         |SELECT label, i - 1 AS pos,
         |  round((sum(v) / (count(*) * 1000000.0)) * 1048576.0) / 1048576.0 AS centroid
         |FROM u GROUP BY label, i""".stripMargin,

    // outliers: the same fixed-point centroid, materialized as an ordered
    // list per label, then a sequential per-lane fold — identical
    // accumulation order to the Spark zip_with/aggregate chain
    // two power-iteration rounds fully unrolled: 6-dp fixed-point mean,
    // index-order dots, 9-dp decimal lane sums, norm + 9-dp handoff per
    // round — the kmeans_iter2 replay pattern applied to C·v
    "pca_top_component" -> {
      def dot(vp: String) =
        s"list_sum(list_transform(generate_series(1, $Dim), i -> (CAST(e.embedding[i] AS DOUBLE) - ml.ml[i]) * $vp[i]))"
      s"""WITH lanes AS (SELECT vec_id, g.i AS i,
         |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS fx
         |  FROM embeddings, UNNEST(generate_series(1, $Dim)) AS g(i) WHERE embedding IS NOT NULL),
         |mu AS (SELECT i, round(sum(fx) / (count(*) * 1000000.0), 6) AS m FROM lanes GROUP BY i),
         |ml AS (SELECT list(m ORDER BY i) AS ml FROM mu),
         |nn AS (SELECT count(*) AS n FROM embeddings WHERE embedding IS NOT NULL),
         |v0 AS (SELECT list_transform(generate_series(1, $Dim), i -> round(1.0 / sqrt(CAST($Dim AS DOUBLE)), 9)) AS vl),
         |d1 AS (SELECT e.vec_id, e.embedding, ${dot("vp.vl")} AS d
         |  FROM embeddings e, ml, v0 vp WHERE e.embedding IS NOT NULL),
         |w1 AS (SELECT g.i AS i,
         |  sum(CAST(round((CAST(embedding[g.i] AS DOUBLE) - ml.ml[g.i]) * d, 9) AS DECIMAL(38,9))) AS w
         |  FROM d1, ml, UNNEST(generate_series(1, $Dim)) AS g(i) GROUP BY g.i),
         |raw1 AS (SELECT i, CAST(w AS DOUBLE) / nn.n AS raw FROM w1, nn),
         |rl1 AS (SELECT list(raw ORDER BY i) AS rl FROM raw1),
         |nm1 AS (SELECT sqrt(list_sum(list_transform(rl, y -> y * y))) AS nm FROM rl1),
         |v1 AS (SELECT list_transform(rl, y -> round(y / nm, 9)) AS vl FROM rl1, nm1),
         |d2 AS (SELECT e.vec_id, e.embedding, ${dot("vp.vl")} AS d
         |  FROM embeddings e, ml, v1 vp WHERE e.embedding IS NOT NULL),
         |w2 AS (SELECT g.i AS i,
         |  sum(CAST(round((CAST(embedding[g.i] AS DOUBLE) - ml.ml[g.i]) * d, 9) AS DECIMAL(38,9))) AS w
         |  FROM d2, ml, UNNEST(generate_series(1, $Dim)) AS g(i) GROUP BY g.i),
         |raw2 AS (SELECT i, CAST(w AS DOUBLE) / nn.n AS raw FROM w2, nn),
         |rl2 AS (SELECT list(raw ORDER BY i) AS rl FROM raw2),
         |nm2 AS (SELECT sqrt(list_sum(list_transform(rl, y -> y * y))) AS nm FROM rl2)
         |SELECT CAST(i - 1 AS BIGINT) AS pos, round(raw / nm2.nm, 9) AS loading,
         |  round(nm2.nm, 6) AS eigenvalue
         |FROM raw2, nm2""".stripMargin
    },

    // one power round per component; deflation = dot + subtract + 9-dp
    // re-round, replayed for BOTH the start vector and the iterate
    "pca_top2" -> {
      def dot(vp: String) =
        s"list_sum(list_transform(generate_series(1, $Dim), i -> (CAST(e.embedding[i] AS DOUBLE) - ml.ml[i]) * $vp[i]))"
      def ldot(a: String, b: String) =
        s"list_sum(list_transform(generate_series(1, $Dim), i -> $a[i] * $b[i]))"
      s"""WITH lanes AS (SELECT vec_id, g.i AS i,
         |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS fx
         |  FROM embeddings, UNNEST(generate_series(1, $Dim)) AS g(i) WHERE embedding IS NOT NULL),
         |mu AS (SELECT i, round(sum(fx) / (count(*) * 1000000.0), 6) AS m FROM lanes GROUP BY i),
         |ml AS (SELECT list(m ORDER BY i) AS ml FROM mu),
         |nn AS (SELECT count(*) AS n FROM embeddings WHERE embedding IS NOT NULL),
         |v0 AS (SELECT list_transform(generate_series(1, $Dim), i -> round(1.0 / sqrt(CAST($Dim AS DOUBLE)), 9)) AS vl),
         |d1 AS (SELECT e.vec_id, e.embedding, ${dot("vp.vl")} AS d
         |  FROM embeddings e, ml, v0 vp WHERE e.embedding IS NOT NULL),
         |w1 AS (SELECT g.i AS i,
         |  sum(CAST(round((CAST(embedding[g.i] AS DOUBLE) - ml.ml[g.i]) * d, 9) AS DECIMAL(38,9))) AS w
         |  FROM d1, ml, UNNEST(generate_series(1, $Dim)) AS g(i) GROUP BY g.i),
         |raw1 AS (SELECT i, round(CAST(w AS DOUBLE) / nn.n, 9) AS raw FROM w1, nn),
         |rl1 AS (SELECT list(raw ORDER BY i) AS rl FROM raw1),
         |nm1 AS (SELECT sqrt(list_sum(list_transform(rl, y -> y * y))) AS nm FROM rl1),
         |v1 AS (SELECT list_transform(rl, y -> round(y / nm, 9)) AS vl FROM rl1, nm1),
         |dt0 AS (SELECT ${ldot("v0.vl", "v1.vl")} AS dt FROM v0, v1),
         |vd AS (SELECT list_transform(generate_series(1, $Dim),
         |         i -> round(v0.vl[i] - dt0.dt * v1.vl[i], 9)) AS vl FROM v0, v1, dt0),
         |d2 AS (SELECT e.vec_id, e.embedding, ${dot("vp.vl")} AS d
         |  FROM embeddings e, ml, vd vp WHERE e.embedding IS NOT NULL),
         |w2 AS (SELECT g.i AS i,
         |  sum(CAST(round((CAST(embedding[g.i] AS DOUBLE) - ml.ml[g.i]) * d, 9) AS DECIMAL(38,9))) AS w
         |  FROM d2, ml, UNNEST(generate_series(1, $Dim)) AS g(i) GROUP BY g.i),
         |raw2 AS (SELECT i, CAST(w AS DOUBLE) / nn.n AS raw FROM w2, nn),
         |rl2 AS (SELECT list(raw ORDER BY i) AS rl FROM raw2),
         |dtr AS (SELECT ${ldot("rl2.rl", "v1.vl")} AS dt FROM rl2, v1),
         |df2 AS (SELECT list_transform(generate_series(1, $Dim),
         |         i -> round(rl2.rl[i] - dtr.dt * v1.vl[i], 9)) AS vl FROM rl2, v1, dtr),
         |nm2 AS (SELECT sqrt(list_sum(list_transform(vl, y -> y * y))) AS nm FROM df2),
         |v2 AS (SELECT list_transform(df2.vl, y -> round(y / nm2.nm, 9)) AS vl FROM df2, nm2)
         |SELECT CAST(0 AS BIGINT) AS comp, CAST(g.i - 1 AS BIGINT) AS pos,
         |  v1.vl[g.i] AS loading, round(nm1.nm, 6) AS eigenvalue
         |FROM v1, nm1, UNNEST(generate_series(1, $Dim)) AS g(i)
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), CAST(g.i - 1 AS BIGINT),
         |  v2.vl[g.i], round(nm2.nm, 6)
         |FROM v2, nm2, UNNEST(generate_series(1, $Dim)) AS g(i)""".stripMargin
    },

    // the pca chain re-run, then the centered remove-projection over the
    // 20-doc slice
    "abtt_embeddings" -> {
      def dot(vp: String) =
        s"list_sum(list_transform(generate_series(1, $Dim), i -> (CAST(e.embedding[i] AS DOUBLE) - ml.ml[i]) * $vp[i]))"
      s"""WITH lanes AS (SELECT vec_id, g.i AS i,
         |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS fx
         |  FROM embeddings, UNNEST(generate_series(1, $Dim)) AS g(i) WHERE embedding IS NOT NULL),
         |mu AS (SELECT i, round(sum(fx) / (count(*) * 1000000.0), 6) AS m FROM lanes GROUP BY i),
         |ml AS (SELECT list(m ORDER BY i) AS ml FROM mu),
         |nn AS (SELECT count(*) AS n FROM embeddings WHERE embedding IS NOT NULL),
         |v0 AS (SELECT list_transform(generate_series(1, $Dim), i -> round(1.0 / sqrt(CAST($Dim AS DOUBLE)), 9)) AS vl),
         |d1 AS (SELECT e.vec_id, e.embedding, ${dot("vp.vl")} AS d
         |  FROM embeddings e, ml, v0 vp WHERE e.embedding IS NOT NULL),
         |w1 AS (SELECT g.i AS i,
         |  sum(CAST(round((CAST(embedding[g.i] AS DOUBLE) - ml.ml[g.i]) * d, 9) AS DECIMAL(38,9))) AS w
         |  FROM d1, ml, UNNEST(generate_series(1, $Dim)) AS g(i) GROUP BY g.i),
         |raw1 AS (SELECT i, CAST(w AS DOUBLE) / nn.n AS raw FROM w1, nn),
         |rl1 AS (SELECT list(raw ORDER BY i) AS rl FROM raw1),
         |nm1 AS (SELECT sqrt(list_sum(list_transform(rl, y -> y * y))) AS nm FROM rl1),
         |v1 AS (SELECT list_transform(rl, y -> round(y / nm, 9)) AS vl FROM rl1, nm1),
         |d2 AS (SELECT e.vec_id, e.embedding, ${dot("vp.vl")} AS d
         |  FROM embeddings e, ml, v1 vp WHERE e.embedding IS NOT NULL),
         |w2 AS (SELECT g.i AS i,
         |  sum(CAST(round((CAST(embedding[g.i] AS DOUBLE) - ml.ml[g.i]) * d, 9) AS DECIMAL(38,9))) AS w
         |  FROM d2, ml, UNNEST(generate_series(1, $Dim)) AS g(i) GROUP BY g.i),
         |raw2 AS (SELECT i, CAST(w AS DOUBLE) / nn.n AS raw FROM w2, nn),
         |rl2 AS (SELECT list(raw ORDER BY i) AS rl FROM raw2),
         |nm2 AS (SELECT sqrt(list_sum(list_transform(rl, y -> y * y))) AS nm FROM rl2),
         |vf AS (SELECT list_transform(rl, y -> round(y / nm, 9)) AS vl FROM rl2, nm2),
         |d3 AS (SELECT e.vec_id, e.embedding, ${dot("vp.vl")} AS d
         |  FROM embeddings e, ml, vf vp WHERE e.embedding IS NOT NULL AND e.vec_id < 20)
         |SELECT d3.vec_id, CAST(g.i - 1 AS BIGINT) AS pos,
         |  round((CAST(embedding[g.i] AS DOUBLE) - ml.ml[g.i]) - d * vp.vl[g.i], 6) AS component
         |FROM d3, ml, vf vp, UNNEST(generate_series(1, $Dim)) AS g(i)""".stripMargin
    },

    "embedding_outliers" ->
      s"""WITH u AS (SELECT label, g.i AS i,
         |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS v
         |  FROM embeddings, UNNEST(generate_series(1, $Dim)) AS g(i) WHERE embedding IS NOT NULL),
         |c AS (SELECT label, i, sum(v) / (count(*) * 1000000.0) AS cv FROM u GROUP BY label, i),
         |cl AS (SELECT label, list(cv ORDER BY i) AS cent FROM c GROUP BY label),
         |d AS (SELECT vec_id, e.label,
         |  round(sqrt(list_sum(list_transform(generate_series(1, $Dim),
         |    i -> (CAST(embedding[i] AS DOUBLE) - cent[i]) * (CAST(embedding[i] AS DOUBLE) - cent[i])))), 6) AS dist
         |  FROM embeddings e JOIN cl ON e.label = cl.label WHERE embedding IS NOT NULL)
         |SELECT vec_id, label, dist FROM d ORDER BY dist DESC, vec_id LIMIT 20""".stripMargin,

    // same centroid formula UNROUNDED, then argmin by (squared distance,
    // label) — the double math is sequential on both sides, so the argmin
    // agrees bitwise
    "centroid_assign" ->
      s"""WITH $centroidClusterCte
         |SELECT vec_id, label AS cluster, round(sqrt(dsq), 6) AS dist FROM r WHERE rn = 1""".stripMargin,

    // IVF-style seed sample + double-sequential argmin assignment (the
    // ivf_knn restatement without a probe), then the fixed-point per-cell
    // means of the group_centroids restatement keyed by cell
    "kmeans_iter" -> {
      val hashOrder = "(vec_id % 1000003) * 2654435761 % 1000000007"
      def cdist =
        s"list_sum(list_transform(generate_series(1,$Dim), i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(ct.cv[i] AS DOUBLE)) * (CAST(e.embedding[i] AS DOUBLE) - CAST(ct.cv[i] AS DOUBLE))))"
      s"""WITH ctv AS (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
         |        ORDER BY $hashOrder, vec_id LIMIT $IvfCells),
         |ct AS (SELECT row_number() OVER (ORDER BY $hashOrder, vec_id) - 1 AS cid, embedding AS cv FROM ctv),
         |ad AS (SELECT e.vec_id, e.embedding, ct.cid, $cdist AS d
         |  FROM embeddings e, ct WHERE e.embedding IS NOT NULL),
         |asg AS (SELECT vec_id, embedding, cid FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM ad) WHERE rn = 1),
         |u AS (SELECT cid, g.i AS i,
         |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS v
         |  FROM asg, UNNEST(generate_series(1, $Dim)) AS g(i))
         |SELECT CAST(cid AS BIGINT) AS cell, i - 1 AS pos,
         |  round((sum(v) / (count(*) * 1000000.0)) * 1048576.0) / 1048576.0 AS centroid,
         |  count(*) AS n_members
         |FROM u GROUP BY cid, i""".stripMargin
    },

    // kmeans_iter's pipeline replayed TWICE: round-1 means are 6-dp-rounded,
    // float-cast (CAST ... AS REAL — the same engine-portable handoff the
    // packed gates use), re-indexed over surviving cells, then assignment +
    // fixed-point means run again
    "kmeans_iter2" -> {
      val hashOrder = "(vec_id % 1000003) * 2654435761 % 1000000007"
      def cdist(cv: String) =
        s"list_sum(list_transform(generate_series(1,$Dim), i -> (CAST(e.embedding[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE)) * (CAST(e.embedding[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE))))"
      s"""WITH ctv AS (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
         |        ORDER BY $hashOrder, vec_id LIMIT $IvfCells),
         |ct AS (SELECT row_number() OVER (ORDER BY $hashOrder, vec_id) - 1 AS cid, embedding AS cv FROM ctv),
         |ad AS (SELECT e.vec_id, e.embedding, ct.cid, ${cdist("ct.cv")} AS d
         |  FROM embeddings e, ct WHERE e.embedding IS NOT NULL),
         |asg AS (SELECT vec_id, embedding, cid FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM ad) WHERE rn = 1),
         |u AS (SELECT cid, g.i AS i,
         |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS v
         |  FROM asg, UNNEST(generate_series(1, $Dim)) AS g(i)),
         |m1 AS (SELECT cid, i,
         |       CAST(round((sum(v) / (count(*) * 1000000.0)) * 1048576.0) / 1048576.0 AS REAL) AS cf
         |       FROM u GROUP BY cid, i),
         |c2 AS (SELECT row_number() OVER (ORDER BY cid) - 1 AS cid, list(cf ORDER BY i) AS cv
         |       FROM (SELECT cid, i, cf FROM m1) m GROUP BY cid),
         |ad2 AS (SELECT e.vec_id, e.embedding, c2.cid, ${cdist("c2.cv")} AS d
         |  FROM embeddings e, c2 WHERE e.embedding IS NOT NULL),
         |asg2 AS (SELECT vec_id, embedding, cid FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM ad2) WHERE rn = 1),
         |u2 AS (SELECT cid, g.i AS i,
         |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS v
         |  FROM asg2, UNNEST(generate_series(1, $Dim)) AS g(i))
         |SELECT CAST(cid AS BIGINT) AS cell, i - 1 AS pos,
         |  round((sum(v) / (count(*) * 1000000.0)) * 1048576.0) / 1048576.0 AS centroid,
         |  count(*) AS n_members
         |FROM u2 GROUP BY cid, i""".stripMargin
    },

    // clustering CTE shared with centroid_assign, then the declarative
    // prune: drop any row with a smaller-id within-cluster neighbor whose
    // 6-dp-rounded cosine similarity reaches the threshold
    "semdedup_keep" -> {
      def lsum(va: String, vb: String) =
        s"list_sum(list_transform(generate_series(1,$Dim), i -> CAST($va[i] AS DOUBLE) * CAST($vb[i] AS DOUBLE)))"
      s"""WITH $centroidClusterCte,
         |asg AS (SELECT r.vec_id, e.embedding, r.label AS cluster
         |  FROM r JOIN embeddings e ON r.vec_id = e.vec_id WHERE r.rn = 1),
         |pr AS (SELECT x.vec_id,
         |  ${lsum("x.embedding", "y.embedding")} AS dot,
         |  ${lsum("x.embedding", "x.embedding")} AS na,
         |  ${lsum("y.embedding", "y.embedding")} AS nb
         |  FROM asg x JOIN asg y ON x.cluster = y.cluster AND y.vec_id < x.vec_id),
         |drops AS (SELECT DISTINCT vec_id FROM pr
         |  WHERE round(1.0 - (CASE WHEN na = 0.0 OR nb = 0.0 THEN 1.0
         |    ELSE 1.0 - greatest(-1.0, least(1.0, dot / (sqrt(na) * sqrt(nb)))) END), 6) >= 0.35)
         |SELECT vec_id, cluster FROM asg WHERE vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin
    },

    "quantize_params" ->
      s"""WITH $paramsCte
         |SELECT qtype, q_scale, q_offset,
         |  (SELECT count(*) FROM embeddings WHERE embedding IS NOT NULL) AS n_rows FROM par""".stripMargin,

    "quantize_sums" ->
      s"""WITH $paramsCte
         |SELECT vec_id, CAST(list_sum(list_transform(embedding, x -> $codeSqlExpr)) AS BIGINT) AS code_sum
         |FROM embeddings, par WHERE embedding IS NOT NULL""".stripMargin,

    "quant_knn_l2" -> quantKnnSql,

    // the certified scan's oracle is the EXACT k-NN restatement — not the
    // code-space one — because certification promises exact results
    "quant_certified_knn" -> knnSql("l2"),

    "quant_lifecycle" -> quantKnnSql,

    // the identical AUTO-param + code + knn replay, but over the GRIDDED
    // values (the f16 round-trip is the identity on the 1/256 grid, so
    // the pack/decode under test never appears here)
    "quant_lifecycle_f16" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |ge AS (SELECT vec_id, list_transform(generate_series(1,$Dim),
         |    i -> CAST($gridSql AS DOUBLE)) AS gv
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |mm AS (SELECT min(u.x) AS mn, max(u.x) AS mx
         |  FROM ge, UNNEST(gv) AS u(x) WHERE NOT isnan(u.x)),
         |par AS (SELECT
         |  CASE WHEN mn < 0 THEN (CASE WHEN greatest(abs(mn),abs(mx)) = 0 THEN 1.0 ELSE 127.0/greatest(abs(mn),abs(mx)) END)
         |       ELSE (CASE WHEN mx - mn = 0 THEN 1.0 ELSE 255.0/(mx - mn) END) END AS q_scale,
         |  CASE WHEN mn < 0 THEN 0.0 ELSE mn END AS q_offset,
         |  CASE WHEN mn < 0 THEN -128 ELSE 0 END AS lo,
         |  CASE WHEN mn < 0 THEN 127 ELSE 255 END AS hi
         |  FROM mm),
         |qc AS (SELECT vec_id, list_transform(gv, x -> $codeSqlExpr) AS c FROM ge, par),
         |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p)
         |SELECT vec_id,
         |  CAST(list_sum(list_transform(generate_series(1,$Dim), i -> (qc.c[i] - qp.c[i]) * (qc.c[i] - qp.c[i]))) AS BIGINT) AS dist_sq
         |FROM qc, qp ORDER BY dist_sq, vec_id LIMIT $K""".stripMargin,

    "quant_cleanup" ->
      s"""SELECT vec_id, dist_sq, TRUE AS store_dropped, TRUE AS params_dropped
         |FROM ($quantKnnSql)""".stripMargin,

    "quant_preload" -> quantKnnSql,

    // append gate: same code-space scan, but the quant params come from
    // the EVEN-id half only (the original store's envelope), while codes
    // cover every row — mirrors quantize(even) + quantizeAppend(odd)
    "quant_append" -> quantKnnSql.replace(
      "WHERE NOT isnan(CAST(u.x AS DOUBLE))",
      "WHERE NOT isnan(CAST(u.x AS DOUBLE)) AND vec_id % 2 = 0"),

    // envelope-drift rejection: params over the HALVED corpus (min/2 and
    // max/2 — halving is exact, so extrema commute with the scaling),
    // envelope inverted from scale/offset, wave extrema over the unhalved
    // corpus, and the reject decision + untouched store row count
    "quant_append_drift" ->
      s"""WITH mmh AS (SELECT min(CAST(u.x AS DOUBLE))/2 AS mn, max(CAST(u.x AS DOUBLE))/2 AS mx
         |  FROM embeddings, UNNEST(embedding) AS u(x) WHERE NOT isnan(CAST(u.x AS DOUBLE))),
         |par AS (SELECT
         |  CASE WHEN mn < 0 THEN 'INT8' ELSE 'UINT8' END AS qtype,
         |  CASE WHEN mn < 0 THEN (CASE WHEN greatest(abs(mn),abs(mx)) = 0 THEN 1.0 ELSE 127.0/greatest(abs(mn),abs(mx)) END)
         |       ELSE (CASE WHEN mx - mn = 0 THEN 1.0 ELSE 255.0/(mx - mn) END) END AS q_scale,
         |  CASE WHEN mn < 0 THEN 0.0 ELSE mn END AS q_offset FROM mmh),
         |env AS (SELECT
         |  CASE WHEN qtype = 'INT8' THEN -(127.0/q_scale) ELSE q_offset END AS emn,
         |  CASE WHEN qtype = 'INT8' THEN 127.0/q_scale ELSE q_offset + 255.0/q_scale END AS emx FROM par),
         |wm AS (SELECT min(CAST(u.x AS DOUBLE)) AS wmn, max(CAST(u.x AS DOUBLE)) AS wmx
         |  FROM embeddings, UNNEST(embedding) AS u(x) WHERE NOT isnan(CAST(u.x AS DOUBLE))),
         |n AS (SELECT count(*) AS c FROM embeddings WHERE embedding IS NOT NULL)
         |SELECT CAST(CASE WHEN wmn < emn OR wmx > emx THEN 1 ELSE 0 END AS BIGINT) AS rejected,
         |  n.c AS store_rows,
         |  round(emn, 6) AS env_min, round(emx, 6) AS env_max,
         |  round(wmn, 6) AS wave_min, round(wmx, 6) AS wave_max
         |FROM env, wm, n""".stripMargin,

    "sql_near_dup_pairs" -> jaccardAllPairsSql(3, 0.9, 100),

    "sql_containment_pairs" -> containmentPairsSql,

    "sql_tvf_knn" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id AS id, ${distSql("l2")} AS distance FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT id, distance FROM d ORDER BY distance, id LIMIT $K""".stripMargin,

    // the auto TVF's oracle is EXACT k-NN: certification means the
    // quantized access path must not change results
    "sql_auto_scan" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id AS id, ${distSql("l2")} AS distance FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT id, round(distance, 6) AS distance FROM d ORDER BY round(distance, 6), id LIMIT $K""".stripMargin,

    "sql_tvf_quant_knn" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $paramsCte,
         |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
         |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p)
         |SELECT vec_id AS id,
         |  sqrt(CAST(list_sum(list_transform(generate_series(1,$Dim), i -> (qc.c[i] - qp.c[i]) * (qc.c[i] - qp.c[i]))) AS DOUBLE)) AS distance
         |FROM qc, qp ORDER BY distance, id LIMIT $K""".stripMargin,

    "sql_lifecycle" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $paramsCte,
         |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
         |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p),
         |n AS (SELECT count(*) AS n_rows FROM embeddings WHERE embedding IS NOT NULL)
         |SELECT vec_id AS id,
         |  sqrt(CAST(list_sum(list_transform(generate_series(1,$Dim), i -> (qc.c[i] - qp.c[i]) * (qc.c[i] - qp.c[i]))) AS DOUBLE)) AS distance,
         |  n.n_rows AS n_rows, n.n_rows * (8 + $Dim) AS mem_bytes
         |FROM qc, qp, n ORDER BY distance, id LIMIT $K""".stripMargin,

    "quant_stream_sq_l2" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $paramsCte,
         |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
         |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p)
         |SELECT vec_id,
         |  CAST(list_sum(list_transform(generate_series(1,$Dim), i -> (qc.c[i] - qp.c[i]) * (qc.c[i] - qp.c[i]))) AS BIGINT) AS dist_sq
         |FROM qc, qp""".stripMargin,

    "quant_memory" ->
      "SELECT CAST(sum(8 + len(embedding)) AS BIGINT) AS bytes FROM embeddings WHERE embedding IS NOT NULL",

    "vector_backend" -> s"SELECT '${graft.kernels.Distances.backend()}' AS backend",

    "packed_knn_i8" -> quantKnnSql,

    "packed_knn_u8" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $paramsU8Cte,
         |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
         |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p)
         |SELECT vec_id,
         |  CAST(list_sum(list_transform(generate_series(1,$Dim), i -> (qc.c[i] - qp.c[i]) * (qc.c[i] - qp.c[i]))) AS BIGINT) AS dist_sq
         |FROM qc, qp ORDER BY dist_sq, vec_id LIMIT $K""".stripMargin,

    "packed_dot_i8" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $paramsCte,
         |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
         |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p)
         |SELECT vec_id,
         |  CAST(-list_sum(list_transform(generate_series(1,$Dim), i -> qc.c[i] * qp.c[i])) AS BIGINT) AS neg_dot
         |FROM qc, qp""".stripMargin,

    "packed_l1_u8" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $paramsU8Cte,
         |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
         |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p)
         |SELECT vec_id,
         |  CAST(list_sum(list_transform(generate_series(1,$Dim), i -> abs(qc.c[i] - qp.c[i]))) AS BIGINT) AS l1_dist
         |FROM qc, qp""".stripMargin,

    "packed_cosine_i8" -> {
      val dot = s"list_sum(list_transform(generate_series(1,$Dim), i -> qc.c[i] * qp.c[i]))"
      val na = s"list_sum(list_transform(generate_series(1,$Dim), i -> qc.c[i] * qc.c[i]))"
      val nb = s"list_sum(list_transform(generate_series(1,$Dim), i -> qp.c[i] * qp.c[i]))"
      s"""WITH p AS (SELECT $probeSqlList AS pv), $paramsCte,
         |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
         |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p),
         |cv AS (SELECT vec_id,
         |  CASE WHEN $na = 0 OR $nb = 0 THEN 1.0
         |       ELSE 1.0 - greatest(-1.0, least(1.0,
         |         CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE))))) END AS v
         |  FROM qc, qp)
         |SELECT vec_id, ${clampSql(asF32Sql("v"))} AS cos_dist FROM cv""".stripMargin
    },

    "packed_f32_sq_l2" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id,
         |  list_sum(list_transform(generate_series(1,$Dim), i -> ($gridSql - pv[i]) * ($gridSql - pv[i]))) AS v
         |  FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT vec_id, ${clampSql(asF32Sql("v"))} AS dist_sq FROM d""".stripMargin,

    "packed_f32_l2" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id,
         |  sqrt(list_sum(list_transform(generate_series(1,$Dim), i -> ($gridSql - pv[i]) * ($gridSql - pv[i])))) AS v
         |  FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT vec_id, ${clampSql(asF32Sql("v"))} AS distance FROM d""".stripMargin,

    "packed_f32_dot" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id,
         |  -(list_sum(list_transform(generate_series(1,$Dim), i -> $gridSql * pv[i]))) AS v
         |  FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT vec_id, ${clampSql(asF32Sql("v"))} AS neg_dot FROM d""".stripMargin,

    "packed_knn_f32" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id,
         |  list_sum(list_transform(generate_series(1,$Dim), i -> ($gridSql - pv[i]) * ($gridSql - pv[i]))) AS v
         |  FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT vec_id, dist_sq FROM (SELECT vec_id, ${clampSql(asF32Sql("v"))} AS dist_sq FROM d)
         |ORDER BY dist_sq, vec_id LIMIT $K""".stripMargin,

    "packed_knn_f32_cosine" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id,
         |  list_sum(list_transform(generate_series(1,$Dim), i -> $gridSql * pv[i])) AS dp,
         |  sqrt(list_sum(list_transform(generate_series(1,$Dim), i -> $gridSql * $gridSql))) AS na,
         |  sqrt(list_sum(list_transform(generate_series(1,$Dim), i -> pv[i] * pv[i]))) AS nb
         |  FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT vec_id FROM (
         |  SELECT vec_id,
         |    CASE WHEN na * nb = 0 THEN 1.0 ELSE 1.0 - dp / (na * nb) END AS distance
         |  FROM d)
         |ORDER BY distance, vec_id LIMIT $K""".stripMargin,

    "packed_f16_l2" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id,
         |  sqrt(list_sum(list_transform(generate_series(1,$Dim), i -> ($gridSql - pv[i]) * ($gridSql - pv[i])))) AS v
         |  FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT vec_id, ${clampSql(asF32Sql("v"))} AS distance FROM d""".stripMargin,

    "packed_bf16_l2" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id,
         |  sqrt(list_sum(list_transform(generate_series(1,$Dim), i -> ($gridSql - pv[i]) * ($gridSql - pv[i])))) AS v
         |  FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT vec_id, ${clampSql(asF32Sql("v"))} AS distance FROM d""".stripMargin,

    "as_f16_blob" ->
      s"""SELECT vec_id,
         |  round(list_sum(list_transform(embedding, x -> greatest(-255.0/256, least(255.0/256, floor(CAST(x AS DOUBLE) * 256) / 256)))), 6) AS vec_sum
         |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,

    "as_bf16_blob" ->
      s"""SELECT vec_id,
         |  round(list_sum(list_transform(embedding, x -> greatest(-255.0/256, least(255.0/256, floor(CAST(x AS DOUBLE) * 256) / 256)))), 6) AS vec_sum
         |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,

    "as_i8_blob" ->
      s"""WITH $paramsCte
         |SELECT vec_id, CAST(list_sum(list_transform(embedding, x -> $codeSqlExpr)) AS BIGINT) AS code_sum
         |FROM embeddings, par WHERE embedding IS NOT NULL""".stripMargin,

    "as_u8_blob" ->
      s"""WITH $paramsU8Cte
         |SELECT vec_id, CAST(list_sum(list_transform(embedding, x -> $codeSqlExpr)) AS BIGINT) AS code_sum
         |FROM embeddings, par WHERE embedding IS NOT NULL""".stripMargin,

    "recall_l2" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $paramsCte,
         |ex AS (SELECT vec_id FROM (SELECT vec_id, round(${distSql("l2")}, 6) AS distance
         |       FROM embeddings, p WHERE embedding IS NOT NULL ORDER BY distance, vec_id LIMIT $K) ext),
         |qc AS (SELECT vec_id, list_transform(embedding, x -> $codeSqlExpr) AS c FROM embeddings, par WHERE embedding IS NOT NULL),
         |qp AS (SELECT list_transform(pv, x -> $codeSqlExpr) AS c FROM par, p),
         |ap AS (SELECT vec_id FROM (SELECT vec_id,
         |       list_sum(list_transform(generate_series(1,$Dim), i -> (qc.c[i]-qp.c[i])*(qc.c[i]-qp.c[i]))) AS dist_sq
         |       FROM qc, qp ORDER BY dist_sq, vec_id LIMIT $K) apt)
         |SELECT CAST($K AS BIGINT) AS k,
         |  CAST((SELECT count(*) FROM ex JOIN ap ON ex.vec_id = ap.vec_id) AS DOUBLE) / $K AS recall""".stripMargin,

    "vector_version" -> s"SELECT '${graft.functions.Version}' AS version",

    "as_f32_json" ->
      s"""SELECT vec_id,
         |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_sum
         |FROM embeddings""".stripMargin,

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // same exact-cents fixed point as the Spark side: integer sum, one
    // final division — identical double on both engines
    "q3_revenue" ->
      """SELECT l_orderkey,
        |  SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "join_region_customers" ->
      """SELECT r_name, COUNT(*) AS num_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "window_top_orders" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t WHERE rn <= 2""".stripMargin,

    "semi_join_orders" ->
      """SELECT COUNT(*) AS n_orders FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)""".stripMargin,

    "events_by_type" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events GROUP BY event_type""".stripMargin,

    "rollup_pricing" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "pivot_returns" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |       FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "setop_texts" ->
      """SELECT 'common' AS which, count(*) AS n FROM
        |  (SELECT text FROM documents WHERE CAST(substr(source, 4) AS INT) % 2 = 0
        |   INTERSECT
        |   SELECT text FROM documents WHERE CAST(substr(source, 4) AS INT) % 2 = 1)
        |UNION ALL
        |SELECT 'only_even' AS which, count(*) AS n FROM
        |  (SELECT text FROM documents WHERE CAST(substr(source, 4) AS INT) % 2 = 0
        |   EXCEPT
        |   SELECT text FROM documents WHERE CAST(substr(source, 4) AS INT) % 2 = 1)""".stripMargin,

    "approx_quantile_ok" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50, TRUE AS ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "variance_by_lang" ->
      """SELECT lang, COUNT(*) AS n,
        |  round((CAST(SUM(CAST(n_chars * n_chars AS DECIMAL(38,0))) AS DOUBLE)
        |         - CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE)
        |           * CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*))
        |        / (COUNT(*) - 1), 6) AS var_chars
        |FROM documents GROUP BY lang""".stripMargin,

    "bpe_merges" -> bpeSql(6),

    "bytebpe_pretokenize" ->
      s"""WITH $byteBpePxCtes
         |SELECT doc_id, tok_idx, piece FROM bpx""".stripMargin,

    "bytebpe_encode" -> byteBpeEncodeSql(ByteBpeMerges),

    "bpe_encode" -> bpeEncodeSql(6),

    "unigram_vocab" -> unigramVocabSql(2, 4, 40),

    "unigram_encode" -> unigramEncodeSql(2, 4, 40),

    "wordpiece_vocab" -> wordpieceVocabSql(4, 40),

    "wordpiece_encode" -> wordpieceEncodeSql(4, 40),

    "zscore_by_lang" ->
      """WITH t AS (SELECT doc_id, lang, n_chars,
        |  COUNT(*) OVER w AS n,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) OVER w AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(n_chars * n_chars AS DECIMAL(38,0))) OVER w AS DOUBLE) AS s2
        |  FROM documents WINDOW w AS (PARTITION BY lang))
        |SELECT doc_id, lang,
        |  CASE WHEN n = 1 OR (s2 - s1 * s1 / n) / (n - 1) <= 0 THEN 0.0
        |       ELSE round((n_chars - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) END AS z
        |FROM t""".stripMargin,

    "edit_pairs" ->
      s"""WITH ws AS (SELECT doc_id, ${cleanWsSql(cleanAcSql)} AS ws FROM documents),
         |w AS (SELECT DISTINCT w FROM (
         |  SELECT unnest(ws) AS w FROM ws
         |  UNION ALL
         |  SELECT ws[1][2:] AS w FROM ws
         |  WHERE doc_id % 11 = 0 AND len(ws) >= 1 AND len(ws[1]) > 1)
         |  WHERE w IS NOT NULL AND w <> '')
         |SELECT a.w AS a, b.w AS b FROM w a JOIN w b
         |ON a.w < b.w AND levenshtein(a.w, b.w) <= 1""".stripMargin,

    "cube_pricing" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "lang_percentiles" ->
      """SELECT lang,
        |  round(quantile_cont(n_chars, 0.25), 6) AS p25,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 6) AS p75
        |FROM documents GROUP BY lang""".stripMargin,

    "moving_avg" ->
      """SELECT event_id,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER f AS DOUBLE)
        |        / COUNT(*) OVER f, 6) AS mavg4,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER c AS DOUBLE) AS cum_value
        |FROM events
        |WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        |       c AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "props_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events WHERE event_id % 20 = 0""".stripMargin,

    "cms_counts" ->
      """SELECT user_id, COUNT(*) AS exact_n, TRUE AS ok
        |FROM events WHERE user_id BETWEEN 0 AND 19 GROUP BY user_id""".stripMargin,

    "hll_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS ok
        |FROM events GROUP BY event_type""".stripMargin,

    "orc_roundtrip" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents GROUP BY lang""".stripMargin,

    "events_windowed" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS w_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "events_partitioned_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events WHERE event_type IN ('purchase', 'signup')
        |GROUP BY event_type""".stripMargin,

    "json_ingest_corrupt" ->
      """SELECT CASE WHEN doc_id % 10 = 0 THEN '_corrupt' ELSE lang END AS lang,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN NULL ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,

    "schema_evolution_agg" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN 'unknown' ELSE event_type END AS event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "upsert_scan" ->
      """SELECT lang, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN n_chars + 2000
        |                WHEN doc_id % 5 = 0 THEN n_chars + 1000
        |                ELSE n_chars END) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents GROUP BY lang""".stripMargin,

    "tombstone_scan" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents WHERE NOT (doc_id % 7 = 0 OR doc_id % 11 = 0)
        |GROUP BY lang""".stripMargin,

    "events_dpp_agg" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type AS etype,
        |    CASE WHEN event_type IN ('purchase', 'signup')
        |         THEN 'conversion' ELSE 'engagement' END AS category
        |  FROM events)
        |SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  MIN(e.event_id) AS min_id, MAX(e.event_id) AS max_id
        |FROM events e JOIN dim ON e.event_type = dim.etype
        |WHERE dim.category = 'conversion'
        |GROUP BY e.event_type""".stripMargin,

    "event_sessions" ->
      """WITH b AS (SELECT user_id, event_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b)
        |SELECT user_id,
        |  epoch_us(min(ts)) // 1000000 AS s_start,
        |  epoch_us(max(ts) + INTERVAL '30 minutes') // 1000000 AS s_end,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "asof_join" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts, l.value,
        |  r.event_id AS asof_event_id, epoch_us(r.ts) AS asof_ts,
        |  r.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND l.ts > r.ts""".stripMargin,

    "interval_join" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts, l.value,
        |  r.event_id AS iv_signup_id, epoch_us(r.ts) AS iv_start_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |JOIN (SELECT * FROM events WHERE event_type = 'signup') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        | AND l.ts <= r.ts + INTERVAL 7 DAY""".stripMargin,

    "salted_join" ->
      """SELECT e.event_id, e.user_id, e.event_type, d.n_user_events
        |FROM events e
        |JOIN (SELECT user_id, count(*) AS n_user_events
        |      FROM events GROUP BY 1) d
        |  ON e.user_id = d.user_id""".stripMargin,

    "token_percentiles" ->
      s"""SELECT round(quantile_cont(n, 0.10), 6) AS p10,
         |  round(quantile_cont(n, 0.25), 6) AS p25,
         |  round(quantile_cont(n, 0.50), 6) AS p50,
         |  round(quantile_cont(n, 0.75), 6) AS p75,
         |  round(quantile_cont(n, 0.90), 6) AS p90,
         |  round(quantile_cont(n, 0.99), 6) AS p99
         |FROM (SELECT len($tokensSql) AS n FROM documents)""".stripMargin,

    "dedup_incremental" ->
      """SELECT b.doc_id FROM documents b
        |WHERE b.doc_id % 2 = 1
        |  AND NOT EXISTS (SELECT 1 FROM documents s
        |                  WHERE s.doc_id % 2 = 0 AND s.text = b.text)""".stripMargin,

    // exact 4-gram-Jaccard cross-half restatement of the banded screen
    // incremental screen restated over the prefix-filtered candidates
    // (pairCandCtes, lossless): an odd doc drops iff some cross-parity
    // candidate pair reaches the jaccard threshold
    "near_dup_incremental" ->
      s"""WITH ${pairCandCtes(4, 0.9, lengthFilter = true)},
         |m AS (SELECT DISTINCT CASE WHEN a % 2 = 1 THEN a ELSE b END AS doc_id
         |  FROM ov WHERE (a + b) % 2 = 1 AND $JaccardExpr >= 0.9)
         |SELECT doc_id FROM documents
         |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM m)""".stripMargin,

    "bloom_dedup" ->
      """SELECT b.doc_id FROM documents b
        |WHERE CAST(substr(b.source, 4) AS INT) % 2 = 1
        |  AND NOT EXISTS (SELECT 1 FROM documents s
        |                  WHERE CAST(substr(s.source, 4) AS INT) % 2 = 0
        |                    AND s.text = b.text)""".stripMargin,

    "lm_logprob" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
         |lm AS (SELECT term, count(*) AS tf FROM toks GROUP BY 1),
         |tot AS (SELECT count(*) AS n_total FROM toks),
         |lp AS (SELECT doc_id,
         |         CAST(round(ln(tf) - ln(n_total), 9) AS DECIMAL(38,9)) AS logp
         |       FROM toks JOIN lm USING (term) CROSS JOIN tot)
         |SELECT doc_id, round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS mean_logp,
         |  count(*) AS n_tokens
         |FROM lp GROUP BY doc_id""".stripMargin,

    // the lm_logprob replay + DuckDB's OWN ntile over the same
    // deterministic order — two engines' implementations of standard
    // SQL bucketing must agree row-for-row
    "ccnet_buckets" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
         |lm AS (SELECT term, count(*) AS tf FROM toks GROUP BY 1),
         |tot AS (SELECT count(*) AS n_total FROM toks),
         |lp AS (SELECT doc_id,
         |         CAST(round(ln(tf) - ln(n_total), 9) AS DECIMAL(38,9)) AS logp
         |       FROM toks JOIN lm USING (term) CROSS JOIN tot),
         |ml AS (SELECT doc_id, round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS mean_logp
         |       FROM lp GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, ml.mean_logp,
         |  CASE ntile(3) OVER (PARTITION BY d.lang ORDER BY ml.mean_logp DESC, d.doc_id)
         |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM documents d JOIN ml ON d.doc_id = ml.doc_id""".stripMargin,

    // chain decision table from the redirect fixture formulas: 4-hop
    // chains land on p4 with hops = 4 - j; the 2-cycle walks to
    // maxHops = 4 and reports terminal = false at its start node
    "redirect_resolve" ->
      """WITH f AS (SELECT CAST(id // 8 AS BIGINT) AS k, id % 8 AS j
        |  FROM range(80) t(id) WHERE id % 8 <= 3 OR id % 8 IN (5, 6))
        |SELECT 'https://h' || CAST(k AS VARCHAR) || '.com/' ||
        |    CASE WHEN j <= 3 THEN 'p' || CAST(j AS VARCHAR)
        |         WHEN j = 5 THEN 'c0' ELSE 'c1' END AS src,
        |  'https://h' || CAST(k AS VARCHAR) || '.com/' ||
        |    CASE WHEN j <= 3 THEN 'p4' WHEN j = 5 THEN 'c0' ELSE 'c1' END AS final_url,
        |  CAST(CASE WHEN j <= 3 THEN 4 - j ELSE 4 END AS BIGINT) AS hops,
        |  j <= 3 AS terminal
        |FROM f""".stripMargin,

    "quality_classifier" ->
      s"""WITH t AS (SELECT doc_id, $cleanAcSql AS ac FROM documents),
         |b AS (SELECT doc_id, ac, ${cleanWsSql("ac")} AS ws FROM t),
         |m AS (SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(ac, '[^a-z0-9 ]')) AS BIGINT) AS n_symbols,
         |  CAST(len(list_filter(ws, w -> w IN ($enStopSql))) AS BIGINT) AS n_stop
         |  FROM b)
         |SELECT doc_id,
         |  -3000000 + 40000 * n_words + 300000 * n_stop - 200000 * n_symbols AS logit_micro,
         |  (-3000000 + 40000 * n_words + 300000 * n_stop - 200000 * n_symbols) > 0 AS accept
         |FROM m""".stripMargin,

    // full 3-round GD replay: binary-grid features, softsign surrogate,
    // per-doc 9-dp decimal gradient terms, decimal sums, re-rounded
    // update — Curation.logregTrain's exact arithmetic, restated
    "logreg_train" ->
      s"""WITH ${logregCtes(3)}
         |SELECT CAST(wa AS DOUBLE) AS w_bias, CAST(wb AS DOUBLE) AS w_words,
         |  CAST(wc AS DOUBLE) AS w_stop, CAST(wd AS DOUBLE) AS w_symbols
         |FROM w3""".stripMargin,

    // training replay, then the identical inference tree per document
    "quality_classifier_learned" ->
      s"""WITH ${logregCtes(3)},
         |zf AS (SELECT f.doc_id,
         |    CAST(w.wa AS DOUBLE) * x0 + CAST(w.wb AS DOUBLE) * x1 +
         |    CAST(w.wc AS DOUBLE) * x2 + CAST(w.wd AS DOUBLE) * x3 AS z
         |  FROM f, w3 w)
         |SELECT doc_id, round(0.5 + (0.5 * z) / (1.0 + abs(z)), 6) AS score,
         |  z > 0.0 AS accept
         |FROM zf""".stripMargin,

    "outer_join_counts" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN o.o_custkey IS NULL THEN 1 END) AS n_customers_no_orders,
        |  COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_orders_no_customer,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey""".stripMargin,

    "pii_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact user' || doc_id || '@example.com or +1555000'
        |         || doc_id || ' from 10.0.0.' || (doc_id % 256),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9]{7,15}', '<PHONE>', 'g') AS clean
        |FROM documents""".stripMargin,

    "doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, ${cleanWsSql(cleanAcSql)} AS ws FROM documents),
         |s AS (SELECT doc_id, ws, unnest(range(0, len(ws), 24)) AS start
         |      FROM t WHERE len(ws) > 0)
         |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_idx,
         |  CAST(len(ws[start+1 : start+32]) AS BIGINT) AS n_tokens,
         |  array_to_string(ws[start+1 : start+32], ' ') AS chunk_text
         |FROM s""".stripMargin,

    "text_stats" ->
      s"""SELECT doc_id,
         |  len($tokensSql) AS n_tokens,
         |  len(list_distinct($tokensSql)) AS n_distinct,
         |  len(list_filter($tokensSql, t -> t IN ($enStopSql))) AS n_stop,
         |  CAST(length(text) AS BIGINT) AS n_chars_m
         |FROM documents""".stripMargin,

    "subword_counts" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^\\sA-Za-z0-9]')) AS BIGINT) AS n_subword,
         |  len($tokensSql) AS n_ws
         |FROM documents""".stripMargin,

    "quality_score" ->
      s"""SELECT doc_id, $qualityScoreSql AS score
         |FROM documents""".stripMargin,

    "lang_id" -> {
      val hits = TextAnalysis.LangMarkers.map { case (l, ws) => l -> langHitsSql(ws) }
      val best = hits.map(_._2).mkString("greatest(", ", ", ")")
      val cases = hits.map { case (l, h) => s"WHEN $best > 0 AND $h = $best THEN '$l'" }.mkString(" ")
      s"SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred FROM documents"
    },

    // the index → language decision table from the fixture: the planted
    // sentences, the script profile and the marker vote never appear
    "lang_id_script" -> {
      val cases = LangExpected.zipWithIndex
        .map { case (l, i) => s"WHEN $i THEN '$l'" }.mkString(" ")
      s"SELECT doc_id, CASE doc_id % ${LangExpected.length} $cases END AS lang_pred FROM documents"
    },

    "fingerprint" ->
      """SELECT doc_id, CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT) ELSE
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(generate_series(1, length(t)), i -> CAST(ascii(t[i]) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) END AS fp
        |FROM (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t FROM documents)""".stripMargin,

    "char_entropy" ->
      """SELECT doc_id, CASE WHEN length(t) = 0 THEN 0.0 ELSE round(
        |  list_reduce(list_prepend(0.0, list_transform(list_sort(list_distinct(cs)), c ->
        |    -1.0 * ((CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / length(t)) *
        |      (ln(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / length(t)) / ln(2.0))))),
        |    (acc, v) -> acc + v), 6) END AS entropy
        |FROM (SELECT doc_id, t, list_transform(generate_series(1, length(t)), i -> t[i]) AS cs
        |      FROM (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t FROM documents))""".stripMargin,

    "bm25_top" -> {
      val terms = Seq("vector", "hash", "scan")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(ws, x -> x = '$t')) AS tf$i" }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      // term-by-term the same double expression tree as TextAnalysis.bm25:
      // ((idf * tf) * (k1+1)) / (tf + k1*((1-b) + (b/avgdl)*dl))
      val score = terms.indices.map(i =>
        s"ln(1 + (n - df$i + 0.5) / (df$i + 0.5)) * tf$i * 2.2 / " +
        s"(tf$i + 1.2 * (0.25 + (0.75 / (sumlen / CAST(n AS DOUBLE))) * dl))").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, $tokensSql AS ws FROM documents),
         |tf AS (SELECT doc_id, len(ws) AS dl, $tfs FROM t),
         |st AS (SELECT count(*) AS n, sum(dl) AS sumlen, $dfs FROM tf)
         |SELECT doc_id, round($score, 6) AS score
         |FROM tf, st ORDER BY score DESC, doc_id LIMIT 50""".stripMargin
    },

    "tfidf_top" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM documents)
         |SELECT doc_id, term, tf, df,
         |  round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
         |FROM tf JOIN dfreq USING (term), nn
         |ORDER BY tfidf DESC, term, doc_id LIMIT 50""".stripMargin,

    // independent group-by-multiplicity restatement of the sorted-run-length
    // folds: a word/bigram's run length IS its multiplicity
    "rep_signals" ->
      s"""WITH w AS (SELECT doc_id, unnest($tokensSql) AS word FROM documents),
         |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
         |wa AS (SELECT doc_id, sum(cnt) AS n, max(cnt) AS top,
         |       sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup FROM wc GROUP BY doc_id),
         |t AS (SELECT doc_id, $tokensSql AS ws FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
         |       i -> ws[i] || ' ' || ws[i + 1])) AS bg FROM t),
         |gc AS (SELECT doc_id, bg, count(*) AS cnt FROM g GROUP BY doc_id, bg),
         |ga AS (SELECT doc_id, sum(cnt) AS n,
         |       sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup FROM gc GROUP BY doc_id)
         |SELECT wa.doc_id,
         |  round(CAST(wa.top AS DOUBLE) / wa.n, 6) AS top_word_frac,
         |  round(CAST(wa.dup AS DOUBLE) / wa.n, 6) AS dup_word_frac,
         |  round(coalesce(CAST(ga.dup AS DOUBLE) / ga.n, 0.0), 6) AS dup_2gram_frac
         |FROM wa LEFT JOIN ga ON wa.doc_id = ga.doc_id""".stripMargin,

    // independent multiplicity restatement of the five integer-exact rules
    // (top_word via per-distinct-token filter counts instead of the
    // sorted-run fold)
    "filter_quality" ->
      s"""WITH t AS (SELECT doc_id, $cleanAcSql AS ac FROM documents),
         |b AS (SELECT doc_id, ac, ${cleanWsSql("ac")} AS ws FROM t),
         |m AS (SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(length(replace(ac, ' ', '')) AS BIGINT) AS n_chars,
         |  CAST(len(regexp_extract_all(ac, '[^a-z0-9 ]')) AS BIGINT) AS n_symbols,
         |  CAST(length(ac) AS BIGINT) AS n_total,
         |  CAST(len(list_filter(ws, w -> w IN ($enStopSql))) AS BIGINT) AS n_stop,
         |  CAST(coalesce(list_max(list_transform(list_distinct(ws),
         |    w -> len(list_filter(ws, x -> x = w)))), 0) AS BIGINT) AS top_word
         |  FROM b),
         |k AS (SELECT doc_id, n_words, n_chars, n_symbols, n_total, n_stop, top_word,
         |  CAST((CASE WHEN n_words < 10 OR n_words > 100000 THEN 1 ELSE 0 END)
         |     + (CASE WHEN n_chars < 3 * n_words OR n_chars > 12 * n_words THEN 2 ELSE 0 END)
         |     + (CASE WHEN 4 * n_symbols > n_total THEN 4 ELSE 0 END)
         |     + (CASE WHEN n_stop < 2 THEN 8 ELSE 0 END)
         |     + (CASE WHEN 10 * top_word > 3 * n_words THEN 16 ELSE 0 END) AS BIGINT) AS fail_mask
         |  FROM m)
         |SELECT doc_id, n_words,
         |  round(CAST(n_chars AS DOUBLE) / greatest(n_words, 1), 6) AS mean_wlen,
         |  round(CAST(n_symbols AS DOUBLE) / greatest(n_total, 1), 6) AS symbol_frac,
         |  n_stop,
         |  round(CAST(top_word AS DOUBLE) / greatest(n_words, 1), 6) AS top_word_frac,
         |  fail_mask, (fail_mask = 0) AS keep
         |FROM k""".stripMargin,

    "nfc_normalize_text" ->
      """SELECT doc_id, nfc_normalize(substring(text, 1, 20) ||
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'e' || chr(769) || ' cafe' || chr(769)
        |    WHEN 1 THEN 'caf' || chr(233)
        |    WHEN 2 THEN chr(4352) || chr(4449)
        |    ELSE chr(8491) END) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // reference-quantile bins over the integer s6 grid, Laplace-smoothed
    // shares, identical double ln tree per bin
    // snapshotDiff's fingerprint equality restated as direct text
    // equality (hash-equal ⟺ text-equal at gate scale)
    "snapshot_diff" ->
      """WITH refs AS (SELECT doc_id, text FROM documents),
        |curs AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000,
        |    'added doc ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 13 = 0)
        |SELECT coalesce(r.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN r.doc_id IS NULL THEN 'added'
        |       WHEN c.doc_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status
        |FROM refs r FULL OUTER JOIN curs c ON r.doc_id = c.doc_id
        |WHERE r.doc_id IS NULL OR c.doc_id IS NULL OR r.text <> c.text""".stripMargin,

    "psi_drift" -> {
      val binExpr = "1 + " + (1 to 7).map(i =>
        s"(CASE WHEN CAST(s6 AS DOUBLE) > cuts[$i] THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH r AS (SELECT CAST(round(($qualityScoreSql) * 1000000) AS BIGINT) AS s6
         |           FROM documents WHERE doc_id % 2 = 0),
         |cu AS (SELECT CAST(round(($qualityScoreSql) * 1000000) AS BIGINT) AS s6
         |       FROM documents WHERE doc_id % 2 = 1),
         |ct AS (SELECT quantile_cont(s6, [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS cuts FROM r),
         |rb AS (SELECT bin, count(*) AS n FROM (SELECT $binExpr AS bin FROM r, ct) GROUP BY 1),
         |cb AS (SELECT bin, count(*) AS n FROM (SELECT $binExpr AS bin FROM cu, ct) GROUP BY 1),
         |tot AS (SELECT (SELECT count(*) FROM r) AS nr, (SELECT count(*) FROM cu) AS nc),
         |bins AS (SELECT CAST(unnest(generate_series(1, 8)) AS INT) AS bin)
         |SELECT bins.bin, coalesce(rb.n, 0) AS n_ref, coalesce(cb.n, 0) AS n_cur,
         |  round((CAST(coalesce(cb.n, 0) + 1 AS DOUBLE) / (nc + 8)
         |       - CAST(coalesce(rb.n, 0) + 1 AS DOUBLE) / (nr + 8))
         |    * ln((CAST(coalesce(cb.n, 0) + 1 AS DOUBLE) / (nc + 8))
         |       / (CAST(coalesce(rb.n, 0) + 1 AS DOUBLE) / (nr + 8))), 6) AS psi_term
         |FROM bins LEFT JOIN rb USING (bin) LEFT JOIN cb USING (bin), tot
         |ORDER BY bin""".stripMargin
    },

    // the three curation stages replayed over raw text: the quality
    // bitmask (filter_quality's restatement over the cloned union),
    // smallest-SURVIVING-id keeper election per text, and the per-lang
    // (h53, id) rank cut at 200
    "curation_log" ->
      s"""WITH u AS (SELECT doc_id, lang, text FROM documents
         |           UNION ALL
         |           SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id < 50),
         |t AS (SELECT doc_id, lang, text, $cleanAcSql AS ac FROM u),
         |b AS (SELECT doc_id, lang, text, ac, ${cleanWsSql("ac")} AS ws FROM t),
         |m AS (SELECT doc_id, lang, text,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(length(replace(ac, ' ', '')) AS BIGINT) AS n_chars,
         |  CAST(len(regexp_extract_all(ac, '[^a-z0-9 ]')) AS BIGINT) AS n_symbols,
         |  CAST(length(ac) AS BIGINT) AS n_total,
         |  CAST(len(list_filter(ws, w -> w IN ($enStopSql))) AS BIGINT) AS n_stop,
         |  CAST(coalesce(list_max(list_transform(list_distinct(ws),
         |    w -> len(list_filter(ws, x -> x = w)))), 0) AS BIGINT) AS top_word
         |  FROM b),
         |k AS (SELECT doc_id, lang, text,
         |  CAST((CASE WHEN n_words < 10 OR n_words > 100000 THEN 1 ELSE 0 END)
         |     + (CASE WHEN n_chars < 3 * n_words OR n_chars > 12 * n_words THEN 2 ELSE 0 END)
         |     + (CASE WHEN 4 * n_symbols > n_total THEN 4 ELSE 0 END)
         |     + (CASE WHEN n_stop < 2 THEN 8 ELSE 0 END)
         |     + (CASE WHEN 10 * top_word > 3 * n_words THEN 16 ELSE 0 END) AS BIGINT) AS fail_mask
         |  FROM m),
         |h AS (SELECT k.*,
         |  ((doc_id % 2147483648) * 2654435761 + CAST(doc_id // 2147483648 AS BIGINT) * 40503) % 1000000007 * 8388608
         |    + ((doc_id % 2147483648) * 2246822519 + CAST(doc_id // 2147483648 AS BIGINT) * 69069) % 8388593 AS h53
         |  FROM k),
         |kp AS (SELECT text, MIN(doc_id) AS keeper FROM h WHERE fail_mask = 0 GROUP BY text),
         |cap AS (SELECT doc_id FROM (
         |    SELECT h.doc_id, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h53, h.doc_id) AS rn
         |    FROM h JOIN kp ON h.text = kp.text AND h.doc_id = kp.keeper) WHERE rn <= 200),
         |f AS (SELECT h.doc_id, h.lang, h.fail_mask,
         |  CASE WHEN h.fail_mask != 0 THEN
         |         CASE WHEN (h.fail_mask & 1) != 0 THEN 'quality:words'
         |              WHEN (h.fail_mask & 2) != 0 THEN 'quality:word_length'
         |              WHEN (h.fail_mask & 4) != 0 THEN 'quality:symbols'
         |              WHEN (h.fail_mask & 8) != 0 THEN 'quality:stopwords'
         |              ELSE 'quality:repetition' END
         |       WHEN h.doc_id != kp.keeper THEN 'exact_dup'
         |       WHEN cap.doc_id IS NULL THEN 'key_cap'
         |       ELSE 'kept' END AS reason
         |  FROM h LEFT JOIN kp ON h.text = kp.text
         |         LEFT JOIN cap ON h.doc_id = cap.doc_id)
         |SELECT doc_id, lang, fail_mask, (reason = 'kept') AS keep, reason
         |FROM f ORDER BY doc_id""".stripMargin,

    "decontam_overlap" ->
      s"""WITH t AS (SELECT doc_id, ${cleanWsSql(cleanAcSql)} AS ws FROM documents),
         |s AS (SELECT doc_id,
         |  CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_distinct(list_transform(generate_series(1, len(ws) - 2),
         |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS ngs
         |  FROM t),
         |bset AS (SELECT DISTINCT unnest(ngs) AS ng FROM s WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, ngs FROM s WHERE doc_id % 97 <> 0),
         |e AS (SELECT doc_id, unnest(ngs) AS ng FROM tr),
         |h AS (SELECT e.doc_id, count(*) AS n_overlap FROM e JOIN bset USING (ng) GROUP BY e.doc_id)
         |SELECT tr.doc_id, CAST(len(tr.ngs) AS BIGINT) AS n_ngrams,
         |  CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  round(CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / greatest(len(tr.ngs), 1), 6) AS contam_frac,
         |  (coalesce(h.n_overlap, 0) > 0) AS contaminated
         |FROM tr LEFT JOIN h ON tr.doc_id = h.doc_id""".stripMargin,

    "sample_stratified" ->
      """WITH t AS (SELECT doc_id, lang,
        |  ((doc_id % 1000003) * 2654435761 % 1000000007) % 1000 AS sample_bucket
        |  FROM documents)
        |SELECT doc_id, lang, sample_bucket FROM t
        |WHERE sample_bucket < (CASE WHEN lang = 'en' THEN 500 ELSE 250 END)""".stripMargin,

    "resample_weighted" ->
      """WITH t AS (SELECT doc_id, lang,
        |  (CASE WHEN lang = 'en' THEN 2500 WHEN lang = 'de' THEN 400 ELSE 1000 END) AS w,
        |  ((doc_id % 1000003) * 2654435761 % 1000000007) % 1000 AS bucket
        |  FROM documents),
        |n AS (SELECT doc_id, lang,
        |  (w // 1000) + (CASE WHEN bucket < (w % 1000) THEN 1 ELSE 0 END) AS n_copies
        |  FROM t)
        |SELECT doc_id, lang, CAST(g.c AS BIGINT) AS copy
        |FROM n, UNNEST(generate_series(0, CAST(n_copies - 1 AS BIGINT))) AS g(c)
        |WHERE n_copies > 0""".stripMargin,

    // single-window restatement of the two-level prefix sum
    "pack_sequences" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^\\sA-Za-z0-9]')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM t)
         |SELECT doc_id, n_tokens, start_offset,
         |  CAST(start_offset // 2048 AS BIGINT) AS pack_id,
         |  (n_tokens > 0 AND (start_offset + n_tokens - 1) // 2048 <> start_offset // 2048) AS crosses
         |FROM c""".stripMargin,

    // packBinsFfd's count-space best-fit-decreasing replayed VERBATIM in
    // a recursive CTE: state = (histogram index, remaining count, next
    // ord, strategy list); each step is one while-iteration of the
    // driver loop (best fit = lexicographic min of (rem, ord), full-bin
    // and partial-bin splits, donor decrement, n=0 eviction). The final
    // strategies unnest into the same (rank_base, n_slots, occurrences,
    // pack_base, slot_base) slot table, and the per-length id-ranked
    // join reproduces (pack_id, slot) by the same arithmetic.
    "pack_bins_ffd" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |hist AS (SELECT list(struct_pack(ln := ln, cnt := cnt) ORDER BY ln DESC) AS h
        |  FROM (SELECT n_tokens AS ln, count(*) AS cnt FROM t WHERE n_tokens > 0 GROUP BY 1)),
        |st AS (
        |  SELECT 0 AS step, 1 AS hi,
        |    CASE WHEN len(h) >= 1 THEN h[1].cnt ELSE 0 END AS c,
        |    CAST(0 AS BIGINT) AS nord,
        |    CAST([] AS STRUCT(r BIGINT, o BIGINT, n BIGINT, cont STRUCT(ln BIGINT, sl BIGINT)[])[]) AS strats,
        |    len(h) = 0 AS done
        |  FROM hist
        |  UNION ALL
        |  SELECT step + 1,
        |    hi + CASE WHEN new_c = 0 THEN 1 ELSE 0 END AS new_hi,
        |    CASE WHEN new_c <> 0 THEN new_c
        |         WHEN hi + 1 <= len(h) THEN h[hi + 1].cnt ELSE 0 END,
        |    new_nord,
        |    new_strats,
        |    new_c = 0 AND hi + 1 > len(h)
        |  FROM (
        |    SELECT step, hi, c, h,
        |      CASE WHEN fit IS NULL THEN 0
        |           WHEN partial_fires THEN 0 ELSE c1 END AS new_c,
        |      nord + CASE WHEN fb > 0 THEN 1 ELSE 0 END
        |           + CASE WHEN (fit IS NULL AND c1 > 0) OR (fit IS NOT NULL AND partial_fires) THEN 1 ELSE 0 END AS new_nord,
        |      list_filter(
        |        CASE WHEN fit IS NULL THEN strats ELSE
        |          list_transform(strats, s -> CASE WHEN s.o = fit.o
        |            THEN struct_pack(r := s.r, o := s.o,
        |                   n := s.n - greatest(fb, least(use0, fb + 1)), cont := s.cont)
        |            ELSE s END) END
        |        || CASE WHEN fb > 0 THEN
        |             [struct_pack(r := CASE WHEN fit IS NULL THEN 256 ELSE fit.r END - m * L,
        |                          o := nord, n := fb,
        |                          cont := CASE WHEN fit IS NULL THEN [struct_pack(ln := L, sl := m)]
        |                            WHEN len(list_filter(fit.cont, e -> e.ln = L)) > 0
        |                              THEN list_transform(fit.cont, e -> CASE WHEN e.ln = L
        |                                THEN struct_pack(ln := e.ln, sl := e.sl + m) ELSE e END)
        |                            ELSE list_append(fit.cont, struct_pack(ln := L, sl := m)) END)]
        |           ELSE CAST([] AS STRUCT(r BIGINT, o BIGINT, n BIGINT, cont STRUCT(ln BIGINT, sl BIGINT)[])[]) END
        |        || CASE WHEN (fit IS NULL AND c1 > 0) OR (fit IS NOT NULL AND partial_fires) THEN
        |             [struct_pack(r := CASE WHEN fit IS NULL THEN 256 ELSE fit.r END - c1 * L,
        |                          o := nord + CASE WHEN fb > 0 THEN 1 ELSE 0 END, n := CAST(1 AS BIGINT),
        |                          cont := CASE WHEN fit IS NULL THEN [struct_pack(ln := L, sl := c1)]
        |                            WHEN len(list_filter(fit.cont, e -> e.ln = L)) > 0
        |                              THEN list_transform(fit.cont, e -> CASE WHEN e.ln = L
        |                                THEN struct_pack(ln := e.ln, sl := e.sl + c1) ELSE e END)
        |                            ELSE list_append(fit.cont, struct_pack(ln := L, sl := c1)) END)]
        |           ELSE CAST([] AS STRUCT(r BIGINT, o BIGINT, n BIGINT, cont STRUCT(ln BIGINT, sl BIGINT)[])[]) END,
        |        s -> s.n > 0) AS new_strats
        |    FROM (
        |      SELECT *,
        |        least(coalesce(fit.n, c), c // m) * m AS placed_full,
        |        least(coalesce(fit.n, c), c // m) AS fb,
        |        c - least(coalesce(fit.n, c), c // m) * m AS c1,
        |        CASE WHEN fit IS NULL THEN NULL ELSE least(fit.n, (c + m - 1) // m) END AS use0,
        |        CASE WHEN fit IS NULL THEN FALSE
        |             ELSE least(fit.n, (c + m - 1) // m) > least(fit.n, c // m)
        |                  AND c - least(fit.n, c // m) * m > 0 END AS partial_fires
        |      FROM (
        |        SELECT st.step, st.hi, st.c, st.nord, st.strats, hist.h,
        |          h[st.hi].ln AS L,
        |          (list_sort(list_filter(st.strats, s -> s.r >= h[st.hi].ln)))[1] AS fit,
        |          CASE WHEN (list_sort(list_filter(st.strats, s -> s.r >= h[st.hi].ln)))[1] IS NULL
        |               THEN 256 // h[st.hi].ln
        |               ELSE (list_sort(list_filter(st.strats, s -> s.r >= h[st.hi].ln)))[1].r // h[st.hi].ln END AS m
        |        FROM st, hist WHERE NOT st.done
        |      ) a
        |    ) b
        |  ) d
        |),
        |fin AS (SELECT unnest(strats) AS s FROM st WHERE done),
        |fs AS (SELECT s.r AS r, s.o AS o, s.n AS n, s.cont AS cont FROM fin),
        |pb AS (SELECT *, coalesce(sum(n) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pack_base FROM fs),
        |ce AS (SELECT o, n, pack_base, unnest(cont) AS e FROM pb),
        |ce2 AS (SELECT o, n, pack_base, e.ln AS ln, e.sl AS sl FROM ce),
        |slt AS (SELECT *,
        |    coalesce(sum(sl) OVER (PARTITION BY o ORDER BY ln ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS slot_base,
        |    coalesce(sum(sl * n) OVER (PARTITION BY ln ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rank_base
        |  FROM ce2),
        |rk AS (SELECT doc_id, n_tokens,
        |    row_number() OVER (PARTITION BY n_tokens ORDER BY doc_id) - 1 AS rnk
        |  FROM t WHERE n_tokens > 0)
        |SELECT r.doc_id, r.n_tokens,
        |  CAST(s.pack_base + (r.rnk - s.rank_base) // s.sl AS BIGINT) AS pack_id,
        |  CAST(s.slot_base + (r.rnk - s.rank_base) % s.sl AS BIGINT) AS slot
        |FROM rk r JOIN slt s ON r.n_tokens = s.ln
        |  AND r.rnk >= s.rank_base AND r.rnk < s.rank_base + s.sl * s.n
        |ORDER BY doc_id""".stripMargin,

    "vocab_top" ->
      s"""WITH w AS (SELECT unnest(${cleanWsSql(cleanAcSql)}) AS token FROM documents)
         |SELECT token, count(*) AS n FROM w GROUP BY token
         |ORDER BY n DESC, token LIMIT 100""".stripMargin,

    // oovRate: the vocab_top CTE feeds a list_contains filter; the q20
    // rounding of the double ratio is the identical IEEE op on both sides
    "oov_rate" ->
      s"""WITH w AS (SELECT unnest(${cleanWsSql(cleanAcSql)}) AS token FROM documents),
         |v AS (SELECT token FROM w GROUP BY token ORDER BY count(*) DESC, token LIMIT 100),
         |vl AS (SELECT list(token) AS vs FROM v),
         |t AS (SELECT doc_id, ${cleanWsSql(cleanAcSql)} AS ws FROM documents),
         |o AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(ws, x -> NOT list_contains(vs, x))) AS BIGINT) AS n_oov
         |  FROM t, vl)
         |SELECT doc_id, n_tokens, n_oov,
         |  round(CAST(n_oov AS DOUBLE) / greatest(n_tokens, 1) * 1048576.0) / 1048576.0 AS oov_frac
         |FROM o""".stripMargin,

    // blocklistFilter: token-grain membership replay (lowered terms) plus
    // the adjacent-bigram stream for the phrase entry
    "blocklist_filter" ->
      s"""WITH t AS (SELECT doc_id, ${cleanWsSql(cleanAcSql)} AS ws FROM documents),
         |g AS (SELECT doc_id, ws,
         |  list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1]) AS bgs FROM t),
         |c AS (SELECT doc_id,
         |  len(list_filter(ws, x -> x IN ('dup', 'zzzqqq')))
         |    + len(list_filter(bgs, x -> x = 'slow key')) AS nb FROM g)
         |SELECT doc_id, CAST(nb AS BIGINT) AS n_blocked, nb = 0 AS kept FROM c""".stripMargin,

    // the control-byte metric's planting formula restated directly (the
    // corpus text is clean, so the count is pure doc_id arithmetic)
    "control_byte_count" ->
      """SELECT doc_id,
        |  CAST((CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 0 END)
        |     + (CASE WHEN doc_id % 7 = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_control
        |FROM documents""".stripMargin,

    // stripHtml's removal chain replayed step for step: the same RE2-safe
    // patterns (non-greedy dot-all, no lookaround), the same literal
    // entity replaces in the same order (&amp; last), the same collapse
    "strip_html" -> {
      val wrapped = """'<html><head><title>t</title><style type="text/css">p { color: red; }</style>' ||
        |  '<script>var x = 1 < 2 && "</p>";</script></head>' ||
        |  '<body><!-- note --><p class="a" id="p' || CAST(doc_id AS VARCHAR) || '">' ||
        |  text ||
        |  '</p><div>tail &amp;amp; &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;' ||
        |  'num &#77;&#x6d; nb&#160;sp amp&#38;amp; big&#2000000; ' ||
        |  'sur&#xD801; nul&#0; tab&#9;t ' ||
        |  'w1&#146;q c1&#129;r tm&#153;s del&#127;d end</div></body></html>'""".stripMargin
      // numeric-reference decode replay: the injected-separator split,
      // the decimal/hex code-point fold, the BMP profile guard, the
      // chr(2) ampersand placeholder — TextAnalysis.decodeEntities
      // restated verbatim (chr(cp) in DuckDB = the UTF-16BE byte path)
      val hexd = "(regexp_extract(s, '^&#[xX]([0-9a-fA-F]+);$', 1))"
      // the shared windows-1252 C1 remap, generated from the SAME table
      // the Spark expression uses (TextAnalysis.Win1252Refs)
      val w1252Keys = graft.ops.TextAnalysis.Win1252Refs.map(_._1).mkString(", ")
      val cp = "(CASE WHEN regexp_matches(s, '^&#[0-9]+;$') THEN CAST(s[3:-2] AS BIGINT) " +
        "ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(generate_series(1, length($hexd)), " +
        s"j -> CAST(strpos('0123456789abcdef', lower($hexd[j])) - 1 AS BIGINT))), " +
        "(acc, d) -> acc * 16 + d) END)"
      val w1252Case = graft.ops.TextAnalysis.Win1252Refs
        .map { case (k, u) => s"WHEN $k THEN chr($u)" }
        .mkString(s"(CASE $cp ", " ", " END)")
      s"""WITH h AS (SELECT doc_id, $wrapped AS h FROM documents),
         |s1 AS (SELECT doc_id, regexp_replace(h, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS h FROM h),
         |s2 AS (SELECT doc_id, regexp_replace(h, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS h FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g') AS h FROM s2),
         |s4 AS (SELECT doc_id, regexp_replace(h, '(?s)<[A-Za-z!/][^>]*>', ' ', 'g') AS h FROM s3),
         |s4n AS (SELECT doc_id, array_to_string(list_transform(string_split(
         |    regexp_replace(regexp_replace(h, chr(1) || '|' || chr(2), '', 'g'),
         |      '(&#([0-9]{1,7}|[xX][0-9a-fA-F]{1,6});)', chr(1) || '\\1' || chr(1), 'g'),
         |    chr(1)),
         |  s -> CASE WHEN NOT regexp_matches(s, '^&#([0-9]{1,7}|[xX][0-9a-fA-F]{1,6});$$') THEN s
         |       WHEN $cp = 38 THEN chr(2)
         |       WHEN $cp = 160 THEN ' '
         |       WHEN $cp IN ($w1252Keys) THEN $w1252Case
         |       WHEN $cp IN (9, 10, 13) OR ($cp BETWEEN 32 AND 126)
         |           OR ($cp BETWEEN 160 AND 65533
         |               AND $cp NOT BETWEEN 55296 AND 57343)
         |         THEN chr(CAST($cp AS INTEGER))
         |       ELSE s END), '') AS h FROM s4),
         |s5 AS (SELECT doc_id,
         |  replace(replace(replace(replace(replace(replace(h,
         |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |    '&apos;', chr(39)), '&amp;', '&') AS h FROM s4n),
         |s6 AS (SELECT doc_id, replace(h, chr(2), '&') AS h FROM s5)
         |SELECT doc_id, trim(regexp_replace(h, '\\s+', ' ', 'g')) AS clean FROM s6""".stripMargin
    },

    // extractMainContent: the identical rule chain replayed — semantic +
    // attr-blocklisted element drops, block split at block-tag boundaries,
    // per-block clean, word-count x link-density filter, ordered join
    "extract_main_content" -> {
      def clean(x: String): String =
        "trim(regexp_replace(replace(replace(replace(replace(replace(replace(replace(" +
          s"regexp_replace($x, '(?s)<[A-Za-z!/][^>]*>', ' ', 'g'), " +
          "'&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
          "'&#39;', chr(39)), '&apos;', chr(39)), '&amp;', '&'), '\\s+', ' ', 'g'))"
      val fixture = """'<html><head><title>T</title></head><body>' ||
        |  '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About us</a></li></ul></nav>' ||
        |  '<div class="cookie-banner">This site uses cookies to improve your browsing experience on every visit. <a href="#">Accept all</a></div>' ||
        |  '<article><p>' || text || '</p>' ||
        |  '<p>Related: <a href="/a">read this other very long article right now</a> <a href="/b">and then this one too</a></p></article>' ||
        |  '<div>He said that the project <a href="/x">summary</a> would ship before the deadline and everyone there agreed.</div>' ||
        |  '<aside>Share on <a>Twitter</a> and <a>Facebook</a></aside>' ||
        |  '<footer>Copyright 2026 Example Corp. All rights reserved. <a href="/privacy">Privacy</a></footer></body></html>'""".stripMargin
      val blockTags = "p|div|section|article|main|ul|ol|li|table|thead|tbody|tr|td|th" +
        "|h1|h2|h3|h4|h5|h6|blockquote|pre|br|hr"
      val attrWords = "(cookie|consent|banner|breadcrumb|sidebar|menu|social)"
      s"""WITH h AS (SELECT doc_id, $fixture AS h FROM documents),
         |s1 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(replace(h, chr(1), ''),
         |  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |  '(?s)<!--.*?-->', ' ', 'g') AS h FROM h),
         |s2 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(h,
         |  '(?is)<nav(\\s[^>]*)?>.*?</nav\\s*>', ' ', 'g'),
         |  '(?is)<footer(\\s[^>]*)?>.*?</footer\\s*>', ' ', 'g'),
         |  '(?is)<aside(\\s[^>]*)?>.*?</aside\\s*>', ' ', 'g'),
         |  '(?is)<header(\\s[^>]*)?>.*?</header\\s*>', ' ', 'g'),
         |  '(?is)<head(\\s[^>]*)?>.*?</head\\s*>', ' ', 'g'),
         |  '(?is)<form(\\s[^>]*)?>.*?</form\\s*>', ' ', 'g') AS h FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(h,
         |  '(?is)<div\\s[^>]*$attrWords[^>]*>.*?</div\\s*>', ' ', 'g'),
         |  '(?is)<section\\s[^>]*$attrWords[^>]*>.*?</section\\s*>', ' ', 'g'),
         |  '(?is)<ul\\s[^>]*$attrWords[^>]*>.*?</ul\\s*>', ' ', 'g') AS h FROM s2),
         |s4 AS (SELECT doc_id, string_split(
         |  regexp_replace(h, '(?is)</?($blockTags)(\\s[^>]*)?>', chr(1), 'g'), chr(1)) AS bl FROM s3),
         |s5 AS (SELECT doc_id, list_transform(bl, b -> {
         |  'txt': ${clean("b")},
         |  'link_len': coalesce(list_aggregate(list_transform(
         |    regexp_extract_all(b, '(?is)<a(\\s[^>]*)?>(.*?)</a\\s*>', 2),
         |    a -> len(${clean("a")})), 'sum'), 0)}) AS st FROM s4)
         |SELECT doc_id, array_to_string(list_transform(list_filter(st,
         |  s -> (CASE WHEN struct_extract(s, 'txt') = '' THEN 0
         |        ELSE len(string_split(struct_extract(s, 'txt'), ' ')) END) >= 5
         |    AND struct_extract(s, 'link_len') <= 0.5 * len(struct_extract(s, 'txt'))),
         |  s -> struct_extract(s, 'txt')), ' ') AS main_text FROM s5""".stripMargin
    },

    // sentenceChunks: the same sentence list, the greedy fold replayed as
    // a per-doc recursive CTE (state = running tokens + chunk ordinal)
    "sentence_chunks" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  list_filter(list_transform(
        |    string_split(regexp_replace(replace(trim(text || ' Tail one. Tail two! Tail three?'), chr(1), ''),
        |      '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)),
        |    s -> trim(s)), s -> s <> '') AS ss FROM documents),
        |sn AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ss)),
        |  i -> struct_pack(pos := i, s := ss[i]))) AS u FROM t),
        |s2 AS (SELECT doc_id, u.pos AS pos, u.s AS s,
        |  len(list_filter(regexp_split_to_array(u.s, '\s+'), x -> x <> '')) AS n FROM sn),
        |rec AS (
        |  SELECT doc_id, pos, s, n, n AS cur, 0 AS chunk FROM s2 WHERE pos = 1
        |  UNION ALL
        |  SELECT s2.doc_id, s2.pos, s2.s, s2.n,
        |    CASE WHEN rec.cur + s2.n > 12 THEN s2.n ELSE rec.cur + s2.n END,
        |    CASE WHEN rec.cur + s2.n > 12 THEN rec.chunk + 1 ELSE rec.chunk END
        |  FROM rec JOIN s2 ON s2.doc_id = rec.doc_id AND s2.pos = rec.pos + 1)
        |SELECT doc_id, CAST(chunk AS BIGINT) AS chunk_id,
        |  string_agg(s, ' ' ORDER BY pos) AS chunk_text,
        |  CAST(sum(n) AS BIGINT) AS n_tokens
        |FROM rec GROUP BY doc_id, chunk ORDER BY doc_id, chunk_id""".stripMargin,

    // overlap variant: the SAME recursion finds the boundaries; chunk j's
    // range extends one sentence back (clamped), then text/tokens
    // re-aggregate over the range
    "sentence_chunks_overlap" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  list_filter(list_transform(
        |    string_split(regexp_replace(replace(trim(text || ' Tail one. Tail two! Tail three?'), chr(1), ''),
        |      '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)),
        |    s -> trim(s)), s -> s <> '') AS ss FROM documents),
        |sn AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ss)),
        |  i -> struct_pack(pos := i, s := ss[i]))) AS u FROM t),
        |s2 AS (SELECT doc_id, u.pos AS pos, u.s AS s,
        |  len(list_filter(regexp_split_to_array(u.s, '\s+'), x -> x <> '')) AS n FROM sn),
        |rec AS (
        |  SELECT doc_id, pos, s, n, n AS cur, 0 AS chunk FROM s2 WHERE pos = 1
        |  UNION ALL
        |  SELECT s2.doc_id, s2.pos, s2.s, s2.n,
        |    CASE WHEN rec.cur + s2.n > 12 THEN s2.n ELSE rec.cur + s2.n END,
        |    CASE WHEN rec.cur + s2.n > 12 THEN rec.chunk + 1 ELSE rec.chunk END
        |  FROM rec JOIN s2 ON s2.doc_id = rec.doc_id AND s2.pos = rec.pos + 1),
        |b AS (SELECT doc_id, chunk, min(pos) AS sp FROM rec GROUP BY doc_id, chunk),
        |b2 AS (SELECT doc_id, chunk, greatest(sp - 1, 1) AS f,
        |  coalesce(lead(sp) OVER (PARTITION BY doc_id ORDER BY chunk), 1000000000) - 1 AS l FROM b)
        |SELECT b2.doc_id, CAST(b2.chunk AS BIGINT) AS chunk_id,
        |  string_agg(s2.s, ' ' ORDER BY s2.pos) AS chunk_text,
        |  CAST(sum(s2.n) AS BIGINT) AS n_tokens
        |FROM b2 JOIN s2 ON s2.doc_id = b2.doc_id AND s2.pos BETWEEN b2.f AND b2.l
        |GROUP BY b2.doc_id, b2.chunk ORDER BY b2.doc_id, chunk_id""".stripMargin,

    // urlHosts: the same extract-all + trailing-strip + host-group chain
    "url_hosts" ->
      s"""WITH d AS (SELECT doc_id, text || ' see https://Example' || CAST(doc_id % 10 AS VARCHAR) ||
         |  '.com/Path/a?q=' || CAST(doc_id AS VARCHAR) || ' and (http://sub.test' ||
         |  CAST(doc_id % 7 AS VARCHAR) || '.org/page.html).' AS text FROM documents),
         |u AS (SELECT doc_id, unnest(list_transform(
         |  regexp_extract_all(text, '(?i)https?://[^\\s"<>]+'),
         |  x -> regexp_replace(x, '[.,;:!?)]+$$', ''))) AS url FROM d)
         |SELECT doc_id, url,
         |  lower(regexp_extract(url, '(?i)https?://([^/?#]+)', 1)) AS host FROM u""".stripMargin,

    // canonicalUrl replayed step by step: lowercase scheme/host, default
    // port strip, fragment drop, tracking-param filter on the split
    // parameter list, bare-path collapse
    "url_canon" -> {
      s"""WITH d AS (SELECT doc_id, text || ' go HTTP://Example' || CAST(doc_id % 10 AS VARCHAR) ||
         |  '.COM:80/Path/a?utm_source=news&q=' || CAST(doc_id AS VARCHAR) ||
         |  '&fbclid=xyz#frag and (https://Sub.Test' || CAST(doc_id % 7 AS VARCHAR) ||
         |  '.ORG:443/?utm_campaign=c).' AS text FROM documents),
         |u AS (SELECT doc_id, unnest(list_transform(
         |  regexp_extract_all(text, '(?i)https?://[^\\s"<>]+'),
         |  x -> regexp_replace(x, '[.,;:!?)]+$$', ''))) AS url FROM d),
         |$urlCanonCtes
         |SELECT doc_id, url,
         |  CASE WHEN pth IN ('', '/') AND q = '' THEN scheme || '://' || host
         |       ELSE scheme || '://' || host || pth || q END AS canon_url,
         |  hostport AS host FROM p3""".stripMargin
    },

    // dedupByCanonicalUrl: same chain, keep-first (min doc_id) per
    // canonical URL string
    "url_dedup" -> {
      s"""WITH u AS (SELECT doc_id, 'HTTPS://WWW.Site' || CAST(doc_id % 20 AS VARCHAR) ||
         |  '.COM:443/page?id=' || CAST(doc_id % 5 AS VARCHAR) ||
         |  '&utm_medium=x' || CAST(doc_id AS VARCHAR) AS url FROM documents),
         |$urlCanonCtes,
         |c AS (SELECT doc_id, url,
         |  CASE WHEN pth IN ('', '/') AND q = '' THEN scheme || '://' || host
         |       ELSE scheme || '://' || host || pth || q END AS canon_url FROM p3)
         |SELECT doc_id, url, canon_url FROM c
         |WHERE doc_id IN (SELECT min(doc_id) FROM c GROUP BY canon_url)""".stripMargin
    },

    // splitSentences: the same separator-injection replace (backref \\1,
    // chr(1) separator), split, trim, empty-drop, dense ordinals
    "split_sentences" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(list_transform(
        |    string_split(regexp_replace(replace(trim(text || ' Tail one. Tail two! Tail three?'), chr(1), ''),
        |      '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)),
        |    s -> trim(s)), s -> s <> '') AS ss FROM documents),
        |e AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ss)),
        |  i -> struct_pack(sent_id := CAST(i - 1 AS BIGINT), sentence := ss[i]))) AS u FROM t)
        |SELECT doc_id, u.sent_id AS sent_id, u.sentence AS sentence FROM e""".stripMargin,

    // identical protect-inject-restore chain, same regex order, RE2
    // syntax for the group refs; the alternation comes from the shared
    // SentenceAbbrevs list so the two engines cannot drift
    "split_sentences_abbrev" ->
      s"""WITH t AS (SELECT doc_id,
         |  regexp_replace(
         |  regexp_replace(
         |  regexp_replace(
         |  regexp_replace(
         |  regexp_replace(
         |    replace(replace(trim(text || '$SentAbbrevTail'), chr(1), ''), chr(2), ''),
         |    '\\b([eE])\\.([gG])\\.', '\\1' || chr(2) || '\\2' || chr(2), 'g'),
         |    '\\b([iI])\\.([eE])\\.', '\\1' || chr(2) || '\\2' || chr(2), 'g'),
         |    '\\b([apAP])\\.([mM])\\.', '\\1' || chr(2) || '\\2' || chr(2), 'g'),
         |    '\\b(${graft.ops.TextAnalysis.SentenceAbbrevs.mkString("|")})\\.', '\\1' || chr(2), 'g'),
         |    '([.!?])\\s+', '\\1' || chr(1), 'g') AS m FROM documents),
         |s AS (SELECT doc_id, list_filter(list_transform(string_split(m, chr(1)),
         |  x -> replace(trim(x), chr(2), '.')), x -> x <> '') AS ss FROM t),
         |e AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ss)),
         |  i -> struct_pack(sent_id := CAST(i - 1 AS BIGINT), sentence := ss[i]))) AS u FROM s)
         |SELECT doc_id, u.sent_id AS sent_id, u.sentence AS sentence FROM e""".stripMargin,

    "heavy_hitters" ->
      s"""WITH w AS (SELECT unnest(${cleanWsSql(cleanAcSql)}) AS token FROM documents)
         |SELECT token, count(*) AS n FROM w GROUP BY token
         |ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // capPerKey's idHash53 priority restated in exact BIGINT: lo/hi are
    // the 31-bit halves of doc_id, two independent multiplicative mixes
    // combine into a < 2^53 priority (lossless under Spark's double cast)
    "cap_per_key" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |    doc_id % 2147483648 AS lo,
        |    CAST(doc_id // 2147483648 AS BIGINT) AS hi
        |  FROM documents),
        |p AS (
        |  SELECT lang, doc_id,
        |    ((lo * 2654435761 + hi * 40503) % 1000000007) * 8388608
        |      + ((lo * 2246822519 + hi * 69069) % 8388593) AS priority
        |  FROM h),
        |r AS (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rn
        |  FROM p)
        |SELECT lang, doc_id FROM r WHERE rn <= 25""".stripMargin,

    "dedup_exact" ->
      """SELECT lang, source, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY lang, source""".stripMargin,

    // the whole pipeline on raw window strings: 20-token windows, corpus
    // occurrence counts, per-doc COVERAGE-island merge of shared starts
    // (a start within L of the previous continues the island — overlap
    // or touch — so emitted spans are disjoint maximal covered runs)
    "exact_substr_spans" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS tk FROM documents),
         |g AS (SELECT doc_id, i AS pos, array_to_string(tk[i:i+19], ' ') AS gram
         |  FROM t, UNNEST(generate_series(1, len(tk) - 19)) AS u(i) WHERE len(tk) >= 20),
         |c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |s AS (SELECT doc_id, pos FROM g JOIN c USING (gram)),
         |r0 AS (SELECT doc_id, pos,
         |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
         |       THEN 0 ELSE 1 END AS nw FROM s),
         |r AS (SELECT doc_id, pos, sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
         |  ROWS UNBOUNDED PRECEDING) AS grp FROM r0)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start,
         |  CAST(max(pos) - min(pos) + 20 AS BIGINT) AS len
         |FROM r GROUP BY doc_id, grp ORDER BY doc_id, start""".stripMargin,

    // span chain + position anti-join + ordered stitch; every doc row
    // survives via the left join (no-span docs pass through verbatim
    // modulo whitespace normalization)
    "exact_substr_removed" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS tk FROM documents),
         |g AS (SELECT doc_id, i AS pos, array_to_string(tk[i:i+19], ' ') AS gram
         |  FROM t, UNNEST(generate_series(1, len(tk) - 19)) AS u(i) WHERE len(tk) >= 20),
         |c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |s AS (SELECT doc_id, pos FROM g JOIN c USING (gram)),
         |r0 AS (SELECT doc_id, pos,
         |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
         |       THEN 0 ELSE 1 END AS nw FROM s),
         |r AS (SELECT doc_id, pos, sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
         |  ROWS UNBOUNDED PRECEDING) AS grp FROM r0),
         |sp AS (SELECT doc_id, min(pos) AS sstart, max(pos) - min(pos) + 20 AS slen
         |  FROM r GROUP BY doc_id, grp),
         |tok AS (SELECT doc_id, i AS pos, tk[i] AS tok
         |  FROM t, UNNEST(generate_series(1, len(tk))) AS u(i)),
         |kept AS (SELECT tok.doc_id, pos, tok FROM tok WHERE NOT EXISTS (
         |  SELECT 1 FROM sp WHERE sp.doc_id = tok.doc_id
         |    AND pos >= sp.sstart AND pos < sp.sstart + sp.slen)),
         |st AS (SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS clean_text,
         |  count(*) AS n_kept FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(st.clean_text, '') AS clean_text,
         |  CAST(len(tk) - coalesce(st.n_kept, 0) AS BIGINT) AS n_removed
         |FROM t LEFT JOIN st ON t.doc_id = st.doc_id ORDER BY t.doc_id""".stripMargin,

    // line-level dedup: same 5-doc roll-up, line keys restated with the
    // string_hash61 polynomial (the Spark side's exact key), keep = first
    // (doc, pos) occurrence per key, reassembly ordered by pos
    "repeated_spans" ->
      s"""WITH t AS (SELECT doc_id, ${cleanWsSql(cleanAcSql)} AS ws FROM documents),
         |g AS (SELECT doc_id, unnest(
         |  CASE WHEN len(ws) < 5 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(generate_series(1, len(ws) - 4),
         |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]) END) AS gram
         |  FROM t),
         |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
         |r AS (SELECT doc_id, count(*) AS n_repeated FROM g JOIN d USING (gram) GROUP BY doc_id)
         |SELECT t.doc_id, CAST(greatest(len(ws) - 4, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(r.n_repeated, 0) AS BIGINT) AS n_repeated,
         |  round(CAST(coalesce(r.n_repeated, 0) AS DOUBLE) /
         |    greatest(greatest(len(ws) - 4, 0), 1), 6) AS rep_frac
         |FROM t LEFT JOIN r USING (doc_id)""".stripMargin,

    "line_dedup" -> {
      val chars = "list_transform(generate_series(1, length(line)), i -> CAST(ascii(line[i]) AS BIGINT))"
      def poly(base: Int, mod: Long) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), $chars), (acc, c) -> (acc * $base + c) % $mod)"
      s"""WITH md AS (SELECT doc_id // 5 AS doc_id, string_agg(text, chr(10) ORDER BY doc_id) AS text
         |            FROM documents GROUP BY (doc_id // 5)),
         |parts AS (SELECT doc_id, string_split(text, chr(10)) AS p FROM md),
         |z AS (SELECT doc_id, unnest(list_zip(p, generate_series(1, len(p)))) AS s FROM parts),
         |ln AS (SELECT doc_id, CAST(s[2] AS BIGINT) - 1 AS pos, CAST(s[1] AS VARCHAR) AS line FROM z),
         |hk AS (SELECT doc_id, pos, line,
         |  (${poly(31, 1000000007L)} * 2147483648) + ${poly(131, 2147483647L)} AS k FROM ln),
         |mk AS (SELECT doc_id, pos, line,
         |  row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) = 1 AS keep FROM hk)
         |SELECT doc_id,
         |  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS text_deduped,
         |  count(*) AS n_lines, count(*) FILTER (WHERE NOT keep) AS n_removed
         |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // the line_dedup keep-first replay at the SENTENCE grain: the
    // separator-injection split, the same string_hash61 key, keep =
    // first (doc, pos) per key, survivors rejoined with single spaces
    "sentence_dedup" -> sentenceDedupOracleSql,

    // the TVF expands to the SAME Catalyst tree as the Scala API, so the
    // identical keep-first oracle gates the SQL surface end-to-end
    "sql_sentence_dedup" -> sentenceDedupOracleSql,

    // components via recursive min-label reachability — independent of the
    // star-contraction algorithm the Spark side runs
    "dup_clusters" ->
      s"""WITH RECURSIVE $simhashSelect,
         |pr AS (SELECT a.doc_id AS a, b.doc_id AS b FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |ed AS (SELECT a AS u, b AS v FROM pr UNION SELECT b AS u, a AS v FROM pr),
         |reach(node, r) AS (SELECT u, u FROM (SELECT DISTINCT u FROM ed) t
         |  UNION SELECT reach.node, e.v FROM reach JOIN ed e ON e.u = reach.r)
         |SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,

    // components (recursive reachability) x quality formula x window rank
    "cluster_keep" ->
      s"""WITH RECURSIVE $simhashSelect,
         |pr AS (SELECT a.doc_id AS a, b.doc_id AS b FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |ed AS (SELECT a AS u, b AS v FROM pr UNION SELECT b AS u, a AS v FROM pr),
         |reach(node, r) AS (SELECT u, u FROM (SELECT DISTINCT u FROM ed) t
         |  UNION SELECT reach.node, e.v FROM reach JOIN ed e ON e.u = reach.r),
         |cc AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
         |qs AS (SELECT doc_id, $qualityScoreSql AS score FROM documents),
         |rk AS (SELECT cc.node AS doc_id, cc.component, qs.score,
         |  row_number() OVER (PARTITION BY cc.component ORDER BY qs.score DESC, cc.node) AS rn
         |  FROM cc JOIN qs ON qs.doc_id = cc.node)
         |SELECT doc_id, component, score, rn = 1 AS is_keep FROM rk ORDER BY doc_id""".stripMargin,

    "ngram_jaccard_top" -> jaccardAllPairsSql(4, 0.9, 50),

    "minhash_lsh_pairs" -> jaccardAllPairsSql(3, 0.9, 100),

    "softdedup_weights" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |           UNION ALL
        |           SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
        |c AS (SELECT text, count(*) AS n_copies FROM u GROUP BY text)
        |SELECT u.doc_id, c.n_copies, round(1.0 / c.n_copies, 6) AS weight
        |FROM u JOIN c USING (text)""".stripMargin,

    "semantic_decontam" -> {
      def lsum(term: String) =
        s"list_sum(list_transform(generate_series(1,$Dim), i -> $term))"
      val dt = lsum("CAST(e.embedding[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE)")
      val na = lsum("CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)")
      val nb = lsum("CAST(bv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE)")
      s"""WITH b AS (SELECT embedding AS bv FROM embeddings WHERE vec_id < 10 AND embedding IS NOT NULL),
         |d AS (SELECT vec_id,
         |  (CASE WHEN na = 0.0 OR nb = 0.0 THEN 1.0
         |        ELSE 1.0 - greatest(-1.0, least(1.0, dt / (sqrt(na) * sqrt(nb)))) END) AS cd
         |  FROM (SELECT e.vec_id, $dt AS dt, $na AS na, $nb AS nb
         |        FROM embeddings e, b WHERE e.embedding IS NOT NULL) t),
         |m AS (SELECT vec_id, round(min(cd), 6) AS min_dist FROM d GROUP BY vec_id)
         |SELECT vec_id, min_dist, min_dist <= 0.3 AS contaminated FROM m""".stripMargin
    },

    // all-pairs max-containment — legitimate as the oracle for the
    // prefix-filtered join precisely because that blocking is exact
    "containment_pairs" -> containmentPairsSql,

    "minhash_dup_cluster" -> dupClusterSql(3, 0.8, DupCluster, 150),

    "cosine_top_pairs" -> {
      def lsum(va: String, vb: String) =
        s"list_sum(list_transform(generate_series(1,$Dim), i -> CAST($va[i] AS DOUBLE) * CAST($vb[i] AS DOUBLE)))"
      s"""WITH ${planesCte(CosBits)}, $bucketSigCte,
         |pr AS (SELECT a.vec_id AS a, b.vec_id AS b,
         |  ${lsum("a.embedding", "b.embedding")} AS dot,
         |  ${lsum("a.embedding", "a.embedding")} AS na,
         |  ${lsum("b.embedding", "b.embedding")} AS nb
         |  FROM sg a JOIN sg b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT a, b, cosine_sim FROM (
         |  SELECT a, b, round(1.0 - (CASE WHEN na = 0.0 OR nb = 0.0 THEN 1.0
         |    ELSE 1.0 - greatest(-1.0, least(1.0, dot / (sqrt(na) * sqrt(nb)))) END), 6) AS cosine_sim
         |  FROM pr) WHERE cosine_sim >= 0.0
         |ORDER BY cosine_sim DESC, a, b LIMIT 50""".stripMargin
    },

    "ann_lsh_topk" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), ${planesCte(AnnBits)}, $bucketSigCte, $probeBucketsCte,
         |d AS (SELECT vec_id, ${distSql("cosine")} AS distance
         |      FROM sg, p WHERE bucket IN (SELECT bkt FROM pb))
         |SELECT vec_id, round(distance, 6) AS distance FROM d
         |ORDER BY distance, vec_id LIMIT $K""".stripMargin,

    "lsh_append" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), ${planesCte(AnnBits)}, $bucketSigCte, $probeBucketsCte,
         |d AS (SELECT vec_id, ${distSql("cosine")} AS distance
         |      FROM sg, p WHERE bucket IN (SELECT bkt FROM pb))
         |SELECT vec_id, round(distance, 6) AS distance FROM d
         |ORDER BY distance, vec_id LIMIT $K""".stripMargin,

    // binary quantization: Hamming restated per-dim as a sign comparison
    // (bit i of the packed signature is embedding[i] > 0; popcount of the
    // XOR = count of dims whose signs differ from the probe's)
    "binary_hamming_topk" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id, CAST(list_sum(list_transform(generate_series(1,$Dim),
         |    i -> CASE WHEN (CAST(embedding[i] AS DOUBLE) > 0 AND NOT isnan(CAST(embedding[i] AS DOUBLE))) <> (pv[i] > 0) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
         |  FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT vec_id, hamming FROM d ORDER BY hamming, vec_id LIMIT $K""".stripMargin,

    "train_split" ->
      """WITH b AS (SELECT doc_id,
        |  ((doc_id % 1000003) * 2654435761 % 1000000007) % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 90 THEN 'train'
        |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM b GROUP BY 1""".stripMargin,

    "sorted_scan_range" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars BETWEEN 100 AND 200
        |GROUP BY lang""".stripMargin,

    "zorder_key" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        |  CAST(list_sum(list_transform(generate_series(0,15),
        |    i -> (((l_partkey >> i) & 1) << (2*i)) + (((l_suppkey >> i) & 1) << (2*i+1)))) AS BIGINT) AS z
        |FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin,

    "zorder_pruned_scan" ->
      """SELECT l_suppkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  MIN(l_orderkey) AS min_order, MAX(l_orderkey) AS max_order
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 40
        |GROUP BY l_suppkey""".stripMargin,

    "random_projection" ->
      s"""WITH ${planesCte(8)},
         |pr AS (SELECT vec_id, b, list_sum(list_transform(generate_series(1,$Dim),
         |    i -> CAST(embedding[i] AS DOUBLE) * plv[i])) * ${1.0 / math.sqrt(8.0)} AS v
         |  FROM embeddings, pl WHERE embedding IS NOT NULL)
         |SELECT vec_id, CAST(b AS BIGINT) AS d, round(v, 6) AS val FROM pr""".stripMargin,

    "sql_binary_knn" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |d AS (SELECT vec_id, CAST(list_sum(list_transform(generate_series(1,$Dim),
         |    i -> CASE WHEN (CAST(embedding[i] AS DOUBLE) > 0 AND NOT isnan(CAST(embedding[i] AS DOUBLE))) <> (pv[i] > 0) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
         |  FROM embeddings, p WHERE embedding IS NOT NULL)
         |SELECT vec_id, hamming FROM d ORDER BY hamming, vec_id LIMIT $K""".stripMargin,

    "binary_rerank" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |h AS (SELECT vec_id, list_sum(list_transform(generate_series(1,$Dim),
         |    i -> CASE WHEN (CAST(embedding[i] AS DOUBLE) > 0 AND NOT isnan(CAST(embedding[i] AS DOUBLE))) <> (pv[i] > 0) THEN 1 ELSE 0 END)) AS hd
         |  FROM embeddings, p WHERE embedding IS NOT NULL),
         |sl AS (SELECT vec_id FROM h ORDER BY hd, vec_id LIMIT 50),
         |d AS (SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM embeddings, p WHERE embedding IS NOT NULL AND vec_id IN (SELECT vec_id FROM sl))
         |SELECT vec_id, round(distance, 6) AS distance FROM d
         |ORDER BY round(distance, 6), vec_id LIMIT $K""".stripMargin,

    // MRL: stage-1 coarse distance over the 16-dim prefix (same
    // sequential double accumulation, just a shorter series), then exact
    // full-dim rerank of the 50-row shortlist
    "mrl_topk" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |cd AS (SELECT vec_id, sqrt(list_sum(list_transform(generate_series(1,16),
         |    i -> (CAST(embedding[i] AS DOUBLE) - pv[i]) * (CAST(embedding[i] AS DOUBLE) - pv[i])))) AS coarse
         |  FROM embeddings, p WHERE embedding IS NOT NULL),
         |sl AS (SELECT vec_id FROM cd ORDER BY coarse, vec_id LIMIT 50),
         |d AS (SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM embeddings, p WHERE embedding IS NOT NULL AND vec_id IN (SELECT vec_id FROM sl))
         |SELECT vec_id, round(distance, 6) AS distance FROM d
         |ORDER BY round(distance, 6), vec_id LIMIT $K""".stripMargin,

    // identical semantics through the store — same restatement
    "mrl_topk_stored" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |cd AS (SELECT vec_id, sqrt(list_sum(list_transform(generate_series(1,16),
         |    i -> (CAST(embedding[i] AS DOUBLE) - pv[i]) * (CAST(embedding[i] AS DOUBLE) - pv[i])))) AS coarse
         |  FROM embeddings, p WHERE embedding IS NOT NULL),
         |sl AS (SELECT vec_id FROM cd ORDER BY coarse, vec_id LIMIT 50),
         |d AS (SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM embeddings, p WHERE embedding IS NOT NULL AND vec_id IN (SELECT vec_id FROM sl))
         |SELECT vec_id, round(distance, 6) AS distance FROM d
         |ORDER BY round(distance, 6), vec_id LIMIT $K""".stripMargin,

    "ann_join" -> {
      def lsum(term: String) = s"list_sum(list_transform(generate_series(1,$Dim), i -> $term))"
      val dot = lsum("CAST(lv[i] AS DOUBLE) * CAST(rv[i] AS DOUBLE)")
      val na = lsum("CAST(lv[i] AS DOUBLE) * CAST(lv[i] AS DOUBLE)")
      val nb = lsum("CAST(rv[i] AS DOUBLE) * CAST(rv[i] AS DOUBLE)")
      s"""WITH ${planesCte(AnnBits)}, $bucketSigCte,
         |l AS (SELECT vec_id AS probe_id, embedding AS lv, bucket AS lb FROM sg WHERE vec_id < 20),
         |r AS (SELECT vec_id, embedding AS rv, bucket AS rb FROM sg),
         |d AS (SELECT probe_id, r.vec_id,
         |  round((CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 1.0
         |    ELSE 1.0 - greatest(-1.0, least(1.0, $dot / (sqrt($na) * sqrt($nb)))) END), 6) AS distance
         |  FROM l JOIN r ON bit_count(xor(lb, rb)) <= 1),
         |rk AS (SELECT probe_id, vec_id, distance,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY distance, vec_id) AS rn FROM d)
         |SELECT probe_id, CAST(rn AS BIGINT) AS rank, vec_id, distance FROM rk WHERE rn <= 5""".stripMargin
    },

    // ann_join plus the independently-restated bucket cap: right rows in
    // buckets holding > 4 members are excluded before the join
    "ann_join_capped" -> {
      def lsum(term: String) = s"list_sum(list_transform(generate_series(1,$Dim), i -> $term))"
      val dot = lsum("CAST(lv[i] AS DOUBLE) * CAST(rv[i] AS DOUBLE)")
      val na = lsum("CAST(lv[i] AS DOUBLE) * CAST(lv[i] AS DOUBLE)")
      val nb = lsum("CAST(rv[i] AS DOUBLE) * CAST(rv[i] AS DOUBLE)")
      s"""WITH ${planesCte(AnnBits)}, $bucketSigCte,
         |l AS (SELECT vec_id AS probe_id, embedding AS lv, bucket AS lb FROM sg WHERE vec_id < 20),
         |r0 AS (SELECT vec_id, embedding AS rv, bucket AS rb FROM sg),
         |bc AS (SELECT rb, count(*) AS n FROM r0 GROUP BY 1),
         |r AS (SELECT r0.* FROM r0 JOIN bc USING (rb) WHERE bc.n <= 4),
         |d AS (SELECT probe_id, r.vec_id,
         |  round((CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 1.0
         |    ELSE 1.0 - greatest(-1.0, least(1.0, $dot / (sqrt($na) * sqrt($nb)))) END), 6) AS distance
         |  FROM l JOIN r ON bit_count(xor(lb, rb)) <= 1),
         |rk AS (SELECT probe_id, vec_id, distance,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY distance, vec_id) AS rn FROM d)
         |SELECT probe_id, CAST(rn AS BIGINT) AS rank, vec_id, distance FROM rk WHERE rn <= 5""".stripMargin
    },

    "ivf_knn" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $ivfCte,
         |d2 AS (SELECT vec_id, ${distSql("l2")} AS distance
         |       FROM asg AS embeddings, p WHERE cid IN (SELECT cid FROM pc))
         |SELECT vec_id, round(distance, 6) AS distance FROM d2
         |ORDER BY distance, vec_id LIMIT $K""".stripMargin,

    "ivf_knn_filtered" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $ivfCte,
         |d2 AS (SELECT vec_id, ${distSql("l2")} AS distance
         |       FROM asg AS embeddings, p, documents
         |       WHERE cid IN (SELECT cid FROM pc)
         |         AND documents.doc_id = embeddings.vec_id
         |         AND documents.lang = 'en')
         |SELECT vec_id, round(distance, 6) AS distance FROM d2
         |ORDER BY distance, vec_id LIMIT $K""".stripMargin,

    "ivf_append" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), ${ivfCteSampledFrom("vec_id % 3 <> 0")},
         |d2 AS (SELECT vec_id, ${distSql("l2")} AS distance
         |       FROM asg AS embeddings, p WHERE cid IN (SELECT cid FROM pc))
         |SELECT vec_id, round(distance, 6) AS distance FROM d2
         |ORDER BY distance, vec_id LIMIT $K""".stripMargin,

    "ivf_recall" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $ivfCte,
         |iv AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM asg AS embeddings, p WHERE cid IN (SELECT cid FROM pc)
         |  ORDER BY round(distance, 6), vec_id LIMIT $K) ivt),
         |ex AS (SELECT vec_id FROM (
         |  SELECT vec_id, round(${distSql("l2")}, 6) AS distance
         |  FROM embeddings, p WHERE embedding IS NOT NULL
         |  ORDER BY distance, vec_id LIMIT $K) ext)
         |SELECT CAST($K AS BIGINT) AS k,
         |  CAST((SELECT count(*) FROM ex JOIN iv ON ex.vec_id = iv.vec_id) AS DOUBLE) / $K AS recall""".stripMargin,

    // full independent replay: seed sample → one fixed-point Lloyd round
    // with the q20 REAL handoff (the kmeans_iter2 CTE chain) → both
    // assignments → both probe-cell choices → both recalls vs exact
    "ivf_recall_kmeans" -> {
      val hashOrder = "(vec_id % 1000003) * 2654435761 % 1000000007"
      def cdist(cv: String) =
        s"list_sum(list_transform(generate_series(1,$Dim), i -> (CAST(e.embedding[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE)) * (CAST(e.embedding[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE))))"
      def pdist(cv: String) =
        s"list_sum(list_transform(generate_series(1,$Dim), i -> (pv[i] - CAST($cv[i] AS DOUBLE)) * (pv[i] - CAST($cv[i] AS DOUBLE))))"
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |ctv AS (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
         |        ORDER BY $hashOrder, vec_id LIMIT $IvfCells),
         |ct AS (SELECT row_number() OVER (ORDER BY $hashOrder, vec_id) - 1 AS cid, embedding AS cv FROM ctv),
         |ad AS (SELECT e.vec_id, e.embedding, ct.cid, ${cdist("ct.cv")} AS d
         |  FROM embeddings e, ct WHERE e.embedding IS NOT NULL),
         |asg AS (SELECT vec_id, embedding, cid FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM ad) WHERE rn = 1),
         |u AS (SELECT cid, g.i AS i,
         |  CASE WHEN embedding[g.i] IS NULL OR isnan(CAST(embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS v
         |  FROM asg, UNNEST(generate_series(1, $Dim)) AS g(i)),
         |m1 AS (SELECT cid, i,
         |       CAST(round((sum(v) / (count(*) * 1000000.0)) * 1048576.0) / 1048576.0 AS REAL) AS cf
         |       FROM u GROUP BY cid, i),
         |c2 AS (SELECT row_number() OVER (ORDER BY cid) - 1 AS cid, list(cf ORDER BY i) AS cv
         |       FROM (SELECT cid, i, cf FROM m1) m GROUP BY cid),
         |ad2 AS (SELECT e.vec_id, e.embedding, c2.cid, ${cdist("c2.cv")} AS d
         |  FROM embeddings e, c2 WHERE e.embedding IS NOT NULL),
         |asg2 AS (SELECT vec_id, embedding, cid FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM ad2) WHERE rn = 1),
         |pd AS (SELECT ct.cid, ${pdist("ct.cv")} AS d FROM ct, p),
         |pc AS (SELECT cid FROM pd ORDER BY d, cid LIMIT $IvfProbes),
         |pd2 AS (SELECT c2.cid, ${pdist("c2.cv")} AS d FROM c2, p),
         |pc2 AS (SELECT cid FROM pd2 ORDER BY d, cid LIMIT $IvfProbes),
         |iv AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM asg AS embeddings, p WHERE cid IN (SELECT cid FROM pc)
         |  ORDER BY round(distance, 6), vec_id LIMIT $K) ivt),
         |iv2 AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM asg2 AS embeddings, p WHERE cid IN (SELECT cid FROM pc2)
         |  ORDER BY round(distance, 6), vec_id LIMIT $K) ivt2),
         |ex AS (SELECT vec_id FROM (
         |  SELECT vec_id, round(${distSql("l2")}, 6) AS distance
         |  FROM embeddings, p WHERE embedding IS NOT NULL
         |  ORDER BY distance, vec_id LIMIT $K) ext)
         |SELECT CAST($K AS BIGINT) AS k,
         |  CAST((SELECT count(*) FROM ex JOIN iv2 ON ex.vec_id = iv2.vec_id) AS DOUBLE) / $K AS recall_kmeans,
         |  CAST((SELECT count(*) FROM ex JOIN iv ON ex.vec_id = iv.vec_id) AS DOUBLE) / $K AS recall_sampled,
         |  (SELECT count(*) FROM c2) AS n_cells""".stripMargin
    },

    "pq_codes" ->
      s"""WITH $pqCte
         |SELECT vec_id, s AS sub, code FROM enc ORDER BY vec_id, sub""".stripMargin,

    "pq_knn" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $pqCte, $pqAdcCte
         |SELECT vec_id, round(adc, 6) AS distance FROM ad
         |ORDER BY adc, vec_id LIMIT $K""".stripMargin,

    "pq_recall" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $pqCte, $pqAdcCte,
         |short AS (SELECT vec_id FROM ad ORDER BY adc, vec_id LIMIT ${K * 10}),
         |rr AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM (SELECT * FROM embeddings WHERE vec_id IN (SELECT vec_id FROM short)) AS embeddings, p
         |  WHERE embedding IS NOT NULL
         |  ORDER BY distance, vec_id LIMIT $K) t),
         |ex AS (SELECT vec_id FROM (
         |  SELECT vec_id, round(${distSql("l2")}, 6) AS distance
         |  FROM embeddings, p WHERE embedding IS NOT NULL
         |  ORDER BY distance, vec_id LIMIT $K) t2)
         |SELECT CAST($K AS BIGINT) AS k,
         |  CAST((SELECT count(*) FROM ex JOIN rr ON ex.vec_id = rr.vec_id) AS DOUBLE) / $K AS recall""".stripMargin,

    "ivfpq_knn" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $ivfCellFilterCte, $pqCte, $pqAdcCte
         |SELECT vec_id, round(adc, 6) AS distance FROM ad
         |WHERE vec_id IN (SELECT vec_id FROM iasg WHERE cid IN (SELECT cid FROM ipc))
         |ORDER BY adc, vec_id LIMIT $K""".stripMargin,

    "ivfpq_knn_filtered" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $ivfCellFilterCte, $pqCte, $pqAdcCte
         |SELECT vec_id, round(adc, 6) AS distance FROM ad
         |WHERE vec_id IN (SELECT vec_id FROM iasg WHERE cid IN (SELECT cid FROM ipc))
         |  AND vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
         |ORDER BY adc, vec_id LIMIT $K""".stripMargin,

    "ivfpq_append" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv),
         |${ivfCellFilterCteSampledFrom("vec_id % 3 <> 0")},
         |${pqCteSampledFrom("vec_id % 3 <> 0")}, $pqAdcCte
         |SELECT vec_id, round(adc, 6) AS distance FROM ad
         |WHERE vec_id IN (SELECT vec_id FROM iasg WHERE cid IN (SELECT cid FROM ipc))
         |ORDER BY adc, vec_id LIMIT $K""".stripMargin,

    "ivfpq_recall" ->
      s"""WITH p AS (SELECT $probeSqlList AS pv), $ivfCellFilterCte, $pqCte, $pqAdcCte,
         |short AS (SELECT vec_id FROM ad
         |  WHERE vec_id IN (SELECT vec_id FROM iasg WHERE cid IN (SELECT cid FROM ipc))
         |  ORDER BY adc, vec_id LIMIT ${K * 10}),
         |rr AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM (SELECT * FROM embeddings WHERE vec_id IN (SELECT vec_id FROM short)) AS embeddings, p
         |  WHERE embedding IS NOT NULL
         |  ORDER BY distance, vec_id LIMIT $K) t),
         |ex AS (SELECT vec_id FROM (
         |  SELECT vec_id, round(${distSql("l2")}, 6) AS distance
         |  FROM embeddings, p WHERE embedding IS NOT NULL
         |  ORDER BY distance, vec_id LIMIT $K) t2)
         |SELECT CAST($K AS BIGINT) AS k,
         |  CAST((SELECT count(*) FROM ex JOIN rr ON ex.vec_id = rr.vec_id) AS DOUBLE) / $K AS recall""".stripMargin,

    // ivfpq_recall's machinery × ivf_recall_kmeans' Lloyd replay: the
    // refined-centroid chain re-derives the fixed-point means + q20
    // handoff from the sampled assignment, then both coarse quantizers
    // drive the SAME ADC shortlist → exact re-rank → recall-vs-truth
    "ivfpq_recall_kmeans" -> {
      def c2dist(cv: String) =
        s"list_sum(list_transform(generate_series(1,$Dim), i -> (CAST(e.embedding[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE)) * (CAST(e.embedding[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE))))"
      def p2dist(cv: String) =
        s"list_sum(list_transform(generate_series(1,$Dim), i -> (pv[i] - CAST($cv[i] AS DOUBLE)) * (pv[i] - CAST($cv[i] AS DOUBLE))))"
      s"""WITH p AS (SELECT $probeSqlList AS pv), $ivfCellFilterCte,
         |iu AS (SELECT iasg.cid, g.i AS i,
         |  CASE WHEN e.embedding[g.i] IS NULL OR isnan(CAST(e.embedding[g.i] AS DOUBLE)) THEN 0
         |       ELSE CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) END AS v
         |  FROM iasg JOIN embeddings e USING (vec_id), UNNEST(generate_series(1, $Dim)) AS g(i)),
         |im1 AS (SELECT cid, i,
         |       CAST(round((sum(v) / (count(*) * 1000000.0)) * 1048576.0) / 1048576.0 AS REAL) AS cf
         |       FROM iu GROUP BY cid, i),
         |ic2 AS (SELECT row_number() OVER (ORDER BY cid) - 1 AS cid, list(cf ORDER BY i) AS cv
         |       FROM (SELECT cid, i, cf FROM im1) m GROUP BY cid),
         |icd2 AS (SELECT e.vec_id, ic2.cid, ${c2dist("ic2.cv")} AS d
         |  FROM embeddings e, ic2 WHERE e.embedding IS NOT NULL),
         |iasg2 AS (SELECT vec_id, cid FROM
         |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM icd2) WHERE rn = 1),
         |ipd2 AS (SELECT ic2.cid, ${p2dist("ic2.cv")} AS d FROM ic2, p),
         |ipc2 AS (SELECT cid FROM ipd2 ORDER BY d, cid LIMIT $IvfProbes),
         |$pqCte, $pqAdcCte,
         |short_s AS (SELECT vec_id FROM ad
         |  WHERE vec_id IN (SELECT vec_id FROM iasg WHERE cid IN (SELECT cid FROM ipc))
         |  ORDER BY adc, vec_id LIMIT ${K * 10}),
         |rr_s AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM (SELECT * FROM embeddings WHERE vec_id IN (SELECT vec_id FROM short_s)) AS embeddings, p
         |  WHERE embedding IS NOT NULL
         |  ORDER BY distance, vec_id LIMIT $K) t),
         |short_k AS (SELECT vec_id FROM ad
         |  WHERE vec_id IN (SELECT vec_id FROM iasg2 WHERE cid IN (SELECT cid FROM ipc2))
         |  ORDER BY adc, vec_id LIMIT ${K * 10}),
         |rr_k AS (SELECT vec_id FROM (
         |  SELECT vec_id, ${distSql("l2")} AS distance
         |  FROM (SELECT * FROM embeddings WHERE vec_id IN (SELECT vec_id FROM short_k)) AS embeddings, p
         |  WHERE embedding IS NOT NULL
         |  ORDER BY distance, vec_id LIMIT $K) t2),
         |ex AS (SELECT vec_id FROM (
         |  SELECT vec_id, round(${distSql("l2")}, 6) AS distance
         |  FROM embeddings, p WHERE embedding IS NOT NULL
         |  ORDER BY distance, vec_id LIMIT $K) t3)
         |SELECT CAST($K AS BIGINT) AS k,
         |  CAST((SELECT count(*) FROM ex JOIN rr_k ON ex.vec_id = rr_k.vec_id) AS DOUBLE) / $K AS recall_kmeans,
         |  CAST((SELECT count(*) FROM ex JOIN rr_s ON ex.vec_id = rr_s.vec_id) AS DOUBLE) / $K AS recall_sampled,
         |  (SELECT count(*) FROM ic2) AS n_cells""".stripMargin
    },

    "simhash_docs" ->
      s"""WITH $simhashSelect
         |SELECT doc_id, simhash FROM sh""".stripMargin,

    "simhash_pairs" ->
      s"""WITH $simhashSelect
         |SELECT a.doc_id AS a, b.doc_id AS b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY a, b""".stripMargin,

    // expected rows from the sitemap fixture formulas (dropped-entry
    // reindexing included): the extractor never appears here
    "sitemap_urls" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS entry_idx,
        |  'https://example.com/p/' || CAST(doc_id AS VARCHAR) AS loc,
        |  '2026-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || '-01' AS lastmod,
        |  '0.' || CAST(doc_id % 10 AS VARCHAR) AS priority
        |FROM documents
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT) AS entry_idx,
        |  'https://example.com/q/' || CAST(doc_id AS VARCHAR) AS loc,
        |  '' AS lastmod, '' AS priority
        |FROM documents""".stripMargin,

    // the two-level tree's leaf assignment + per-leaf entry order from
    // the fixture formulas: every document surfaces exactly once, at
    // depth 2, from its leaf file — the walk itself never appears
    "sitemap_index" ->
      """WITH e AS (SELECT doc_id,
        |  'https://ex.com/sm/leaf' || CAST(doc_id % 5 AS VARCHAR) || '_'
        |    || CAST((doc_id // 5) % 2 AS VARCHAR) || '.xml' AS sitemap_url,
        |  'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS loc,
        |  '2026-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) AS lastmod,
        |  '0.' || CAST(doc_id % 10 AS VARCHAR) AS priority
        |FROM documents)
        |SELECT sitemap_url, CAST(2 AS BIGINT) AS depth,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY sitemap_url ORDER BY doc_id) - 1
        |    AS BIGINT) AS entry_idx,
        |  loc, lastmod, priority
        |FROM e""".stripMargin,

    // counts from the SAME ScriptClasses ranges; dominant replayed as the
    // identical seedless list_reduce argmax
    "script_mix" -> {
      val names = graft.ops.TextAnalysis.ScriptClasses.map { case (nm, _) => s"n_$nm" }
      s"""WITH t AS (SELECT doc_id,
         |  text || (CASE doc_id % 4 WHEN 0 THEN ' привет мир широкий'
         |    WHEN 1 THEN ' αλφα βητα γαμμα' WHEN 2 THEN ' 中文处理系统'
         |    ELSE '' END) AS tx FROM documents),
         |c AS (SELECT doc_id,
         |  $scriptCountsSql FROM t)
         |SELECT doc_id, ${names.mkString(", ")},
         |  $scriptDominantSql AS dominant
         |FROM c""".stripMargin
    },

    // eTLD+1 decision table + the idHash53 priority replay + rank cut
    "domain_cap" ->
      """WITH t AS (SELECT doc_id, CAST(doc_id % 20 AS VARCHAR) AS k, doc_id % 5 AS m FROM documents),
        |d AS (SELECT doc_id,
        |  CASE m WHEN 0 THEN 'shop' || k || '.co.uk' WHEN 1 THEN 'example' || k || '.com'
        |         WHEN 2 THEN 'example' || k || '.org' WHEN 3 THEN ''
        |         ELSE 'weird' || k || '.zz' END AS domain FROM t),
        |h AS (SELECT domain, doc_id,
        |  doc_id % 2147483648 AS lo, CAST(doc_id // 2147483648 AS BIGINT) AS hi FROM d),
        |p AS (SELECT domain, doc_id,
        |  ((lo * 2654435761 + hi * 40503) % 1000000007) * 8388608
        |    + ((lo * 2246822519 + hi * 69069) % 8388593) AS priority FROM h),
        |r AS (SELECT domain, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY domain ORDER BY priority, doc_id) AS rn FROM p)
        |SELECT domain, doc_id FROM r WHERE rn <= 10""".stripMargin,

    // syllable heuristic + boundary rule + the identical double tree
    "flesch_score" ->
      s"""WITH t AS (SELECT doc_id, text || ' Tail one. Tail two! Tail three?' AS tx FROM documents),
         |c AS (SELECT doc_id,
         |  CAST(len(${cleanWsSql("lower(regexp_replace(tx, '[^ -~]', '', 'g'))")}) AS BIGINT) AS n_words,
         |  CAST(greatest(len(list_filter(
         |    string_split(regexp_replace(trim(tx), '([.!?])\\s+', '\\1' || chr(1), 'g'), chr(1)),
         |    x -> trim(x) <> '')), 1) AS BIGINT) AS n_sentences,
         |  CAST(list_sum(list_transform(${cleanWsSql("lower(regexp_replace(tx, '[^ -~]', '', 'g'))")},
         |    w -> greatest(1, CASE WHEN w LIKE '%e' AND NOT w LIKE '%le'
         |           AND len(regexp_extract_all(w, '[aeiouy]+')) > 1
         |         THEN len(regexp_extract_all(w, '[aeiouy]+')) - 1
         |         ELSE len(regexp_extract_all(w, '[aeiouy]+')) END))) AS BIGINT) AS n_syllables
         |  FROM t)
         |SELECT doc_id, n_words, n_sentences, coalesce(n_syllables, 0) AS n_syllables,
         |  round((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         |    - 84.6 * (CAST(coalesce(n_syllables, 0) AS DOUBLE)
         |        / CAST(greatest(n_words, 1) AS DOUBLE))) * 1048576.0) / 1048576.0 AS flesch
         |FROM c""".stripMargin,

    // the eTLD+1 decision table from the host formulas
    "registered_domain" ->
      """WITH t AS (SELECT doc_id, CAST(doc_id % 20 AS VARCHAR) AS k, doc_id % 5 AS m FROM documents)
        |SELECT doc_id,
        |  CASE m WHEN 0 THEN 'www.shop' || k || '.co.uk'
        |         WHEN 1 THEN 'blog.example' || k || '.com'
        |         WHEN 2 THEN 'example' || k || '.org'
        |         WHEN 3 THEN 'co.uk'
        |         ELSE 'weird' || k || '.zz' END AS host,
        |  CASE m WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com' WHEN 2 THEN 'org'
        |         WHEN 3 THEN 'co.uk' ELSE 'zz' END AS suffix,
        |  CASE m WHEN 0 THEN 'shop' || k || '.co.uk'
        |         WHEN 1 THEN 'example' || k || '.com'
        |         WHEN 2 THEN 'example' || k || '.org'
        |         WHEN 3 THEN ''
        |         ELSE 'weird' || k || '.zz' END AS registered_domain
        |FROM t""".stripMargin,

    // the identical line-rule chain in RE2/DuckDB list ops
    "c4_line_filter" ->
      """WITH t AS (SELECT doc_id,
        |  text || '.' || chr(10) || 'HOME | ABOUT | CONTACT' || chr(10) || 'Short line.'
        |    || chr(10) || 'Enable JavaScript to view this content.'
        |    || chr(10) || 'This sentence has six real words here.'
        |    || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'function f() { return 1; }' ELSE '' END)
        |    || (CASE WHEN doc_id % 9 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet text.' ELSE '' END)
        |    AS tx FROM documents),
        |k AS (SELECT doc_id, tx, string_split(tx, chr(10)) AS ls,
        |  list_filter(string_split(tx, chr(10)), l ->
        |    regexp_matches(trim(l), '[.!?"]$')
        |    AND len(string_split_regex(trim(l), '\s+')) >= 5
        |    AND NOT contains(lower(trim(l)), 'javascript')) AS kept FROM t)
        |SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
        |  CAST(len(ls) AS BIGINT) AS n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
        |  contains(tx, '{') AS has_brace,
        |  contains(lower(tx), 'lorem ipsum') AS has_lorem
        |FROM k""".stripMargin,

    // full-chain replay: candidates, per-candidate Luhn fold, in-order
    // string-level replacement (list_reduce seeded with the text)
    "card_redact" ->
      s"""WITH t AS (SELECT doc_id, text || '$CardTail' AS tx FROM documents),
         |cc AS (SELECT doc_id, tx, $cardCandsSql AS cands FROM t),
         |vv AS (SELECT doc_id, tx, $cardValidSql AS valid FROM cc)
         |SELECT doc_id, CAST(len(valid) AS BIGINT) AS n_cards,
         |  list_reduce(list_prepend(tx, valid),
         |    (acc, x) -> replace(acc, x, '<CARD>')) AS clean FROM vv""".stripMargin,

    // the replacement chain generated from the shared MojibakeTable
    "fix_mojibake" ->
      s"SELECT doc_id, ${mojibakeChainSql(s"text || '$MojibakeTail'")} AS fixed FROM documents",

    // the same three scalar chains through the registered SQL functions —
    // one implementation, two front doors; the oracle reuses the same
    // generated fragments as the Scala-API gates
    "sql_text_clean" ->
      s"""WITH t AS (SELECT doc_id, text || '$CardTail' AS tx FROM documents),
         |cc AS (SELECT doc_id, tx, $cardCandsSql AS cands FROM t),
         |vv AS (SELECT doc_id, $cardValidSql AS valid FROM cc),
         |sc AS (SELECT doc_id, $scriptCountsSql FROM (
         |  SELECT doc_id, text AS tx FROM documents) s0)
         |SELECT d.doc_id,
         |  ${mojibakeChainSql(s"d.text || '$MojibakeTail'")} AS fixed,
         |  CAST(len(vv.valid) AS BIGINT) AS n_cards,
         |  $scriptDominantSql AS dominant
         |FROM documents d JOIN vv ON d.doc_id = vv.doc_id
         |JOIN sc ON d.doc_id = sc.doc_id""".stripMargin,

    // the decision table derived from the fixture formulas (see the gate
    // comment): neither the parser nor the matcher appears here
    "robots_filter" ->
      """SELECT doc_id,
        |  'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS host,
        |  (CASE doc_id % 5 WHEN 0 THEN '/public/x/' WHEN 1 THEN '/public/'
        |    WHEN 2 THEN '/private/open/' WHEN 3 THEN '/t/a/' ELSE '/' END)
        |    || CAST(doc_id AS VARCHAR) AS path,
        |  CASE doc_id % 5 WHEN 0 THEN TRUE WHEN 1 THEN FALSE
        |    WHEN 2 THEN (doc_id % 20) % 3 = 0 WHEN 3 THEN TRUE
        |    ELSE TRUE END AS allowed
        |FROM documents""".stripMargin,

    // staged replay of every pipeline decision over CTEs: the robots,
    // lang, dedup, decontam, quality, cap, pack and shard stages each
    // re-decide the survivor set independently; the surviving text comes
    // from the fixture formulas (the parsers/extractors under test never
    // appear). See the gate comment for the stage ↔ CTE mapping.
    "pipeline_e2e" -> pipeE2eSql(),

    // byte-identical fixture formulas -> the identical staged replay
    "pipeline_e2e_gz" -> pipeE2eSql(),

    // http profile: the staged replay with the two S1.5 ingest drop
    // classes (404 status, JSON media type) applied before robots
    "pipeline_e2e_http" -> pipeE2eSql(
      "doc_id % 13 <> 6 AND doc_id % 11 <> 4 AND doc_id % 23 <> 15"),

    // incremental: wave 2 (odd ids) replayed with the cross-wave screen
    // against wave 1's (even ids) URL-dedup survivors
    "pipeline_incremental" ->
      pipeE2eSql(docWhere = "doc_id % 2 = 1", seenWave = Some("doc_id % 2 = 0")),

    // Bloom-routed screen: the oracle is IDENTICAL to the exact-screen
    // gate's — the prefilter may only change join input size, never the
    // result set
    "pipeline_incremental_bloom" ->
      pipeE2eSql(docWhere = "doc_id % 2 = 1", seenWave = Some("doc_id % 2 = 0")),

    // blocklist: site9.com blocked at eTLD+1 ⟺ the fixture's u%10=9 hosts
    "pipeline_e2e_blocked" -> pipeE2eSql("u % 10 <> 9"),

    // the incremental funnel: wave-2 stage counts with the seen-screen
    // row re-counted from the cross-wave NOT EXISTS CTE
    "pipeline_funnel_incremental" ->
      s"""WITH ${pipeCtes(docWhere = "doc_id % 2 = 1", seenWave = Some("doc_id % 2 = 0"))}
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'ingest' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM ids
         |  UNION ALL SELECT 1, 'robots', count(*) FROM rob
         |  UNION ALL SELECT 2, 'lang', count(*) FROM lng
         |  UNION ALL SELECT 3, 'url_dedup', count(*) FROM urld
         |  UNION ALL SELECT 4, 'seen_screen', count(*) FROM inc
         |  UNION ALL SELECT 5, 'near_dup', count(*) FROM nd
         |  UNION ALL SELECT 6, 'decontam', count(*) FROM dec
         |  UNION ALL SELECT 7, 'quality', count(*) FROM q
         |  UNION ALL SELECT 8, 'domain_cap', count(*) FROM cap
         |  UNION ALL SELECT 9, 'written', count(*) FROM sp)
         |ORDER BY stage_idx""".stripMargin,

    // frontier decision table: each stage's survivor set restated from
    // the fixture formulas (extraction, resolution, canonicalization,
    // the PSL walk, the robots matcher and the heap never appear); the
    // cap replays the (rolling-hash, url) priority cut
    "frontier_e2e" -> frontierE2eSql,

    // the hash-keyed frontier (FrontierConfig.hashKeys): same oracle —
    // the exchange-key swap must not change a single row
    "frontier_e2e_hashkeys" -> frontierE2eSql,

    // the frontier funnel: stage counts off the same CTE chain (seeded =
    // links ∪ sitemap leaves, the one count that may exceed its
    // predecessor)
    "frontier_funnel" ->
      s"""WITH ${frontierCtes()}
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'extracted' AS stage, CAST(count(*) AS BIGINT) AS n_urls FROM ext WHERE src = 'link'
         |  UNION ALL SELECT 1, 'seeded', count(*) FROM ext
         |  UNION ALL SELECT 2, 'resolved_http', count(*) FROM ext
         |  UNION ALL SELECT 3, 'blocklist', count(*) FROM ext WHERE NOT blocked
         |  UNION ALL SELECT 4, 'not_fetched', count(*) FROM ext WHERE NOT blocked AND NOT fetched
         |  UNION ALL SELECT 5, 'distinct_url', count(*) FROM d
         |  UNION ALL SELECT 6, 'robots_allowed', count(*) FROM alw
         |  UNION ALL SELECT 7, 'site_cap', count(*) FROM sel WHERE rn <= 30)
         |ORDER BY stage_idx""".stripMargin,

    // the redirect-composed funnel: `redirected` is the second discovery
    // row (ext gains one terminal per chain source — the trap and the
    // cycle contribute nothing); downstream counts absorb the survivors
    "frontier_funnel_redirect" ->
      s"""WITH ${frontierCtes(withRedirects = true)}
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'extracted' AS stage, CAST(count(*) AS BIGINT) AS n_urls FROM ext WHERE src = 'link'
         |  UNION ALL SELECT 1, 'seeded', count(*) FROM ext WHERE src <> 'redirect'
         |  UNION ALL SELECT 2, 'redirected', count(*) FROM ext
         |  UNION ALL SELECT 3, 'resolved_http', count(*) FROM ext
         |  UNION ALL SELECT 4, 'blocklist', count(*) FROM ext WHERE NOT blocked
         |  UNION ALL SELECT 5, 'not_fetched', count(*) FROM ext WHERE NOT blocked AND NOT fetched
         |  UNION ALL SELECT 6, 'distinct_url', count(*) FROM d
         |  UNION ALL SELECT 7, 'robots_allowed', count(*) FROM alw
         |  UNION ALL SELECT 8, 'site_cap', count(*) FROM sel WHERE rn <= 30)
         |ORDER BY stage_idx""".stripMargin,

    // the incremental frontier: wave-2 candidates minus the literal
    // cross-wave NOT EXISTS over wave-1's fetched page URLs — the prev
    // link of doc_id % 4 = 1 dies (its target doc_id - 1 % 4 = 0 was
    // wave-1-fetched), the % 4 = 3 prev link and every fresh x{k}.net
    // link survive; rule-less robots, cap never binds
    "frontier_incremental" ->
      """WITH w2 AS (SELECT doc_id, doc_id % 10 AS k FROM documents WHERE doc_id % 2 = 1),
        |out AS (
        |  SELECT 'https://x' || CAST(k AS VARCHAR) || '.net/f' || CAST(doc_id AS VARCHAR) AS url,
        |    'x' || CAST(k AS VARCHAR) || '.net' AS hd FROM w2
        |  UNION ALL
        |  SELECT 'https://h' || CAST((doc_id - 1) % 10 AS VARCHAR) || '.com/a/page'
        |      || CAST(doc_id - 1 AS VARCHAR) || '.html',
        |    'h' || CAST((doc_id - 1) % 10 AS VARCHAR) || '.com' FROM w2 t
        |  WHERE NOT EXISTS (SELECT 1 FROM documents w
        |    WHERE w.doc_id % 4 = 0 AND w.doc_id = t.doc_id - 1))
        |SELECT url, hd AS host, hd AS domain, CAST(NULL AS DOUBLE) AS crawl_delay,
        |  FALSE AS site_capped, 'link' AS source
        |FROM out ORDER BY url""".stripMargin,

    // the incremental frontier's funnel: nine rows, the store screen's
    // drop pinned to its own seen_store stage
    "frontier_funnel_incremental" ->
      """WITH w2 AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
        |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w2),
        |surv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w2 t
        |  WHERE NOT EXISTS (SELECT 1 FROM documents w
        |    WHERE w.doc_id % 4 = 0 AND w.doc_id = t.doc_id - 1))
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'extracted' AS stage, 2 * n AS n_urls FROM n2
        |  UNION ALL SELECT 1, 'seeded', 2 * n FROM n2
        |  UNION ALL SELECT 2, 'resolved_http', 2 * n FROM n2
        |  UNION ALL SELECT 3, 'blocklist', 2 * n FROM n2
        |  UNION ALL SELECT 4, 'not_fetched', 2 * n FROM n2
        |  UNION ALL SELECT 5, 'seen_store', n2.n + surv.n FROM n2, surv
        |  UNION ALL SELECT 6, 'distinct_url', n2.n + surv.n FROM n2, surv
        |  UNION ALL SELECT 7, 'robots_allowed', n2.n + surv.n FROM n2, surv
        |  UNION ALL SELECT 8, 'site_cap', n2.n + surv.n FROM n2, surv)
        |ORDER BY stage_idx""".stripMargin,

    // the politeness scheduler: the frontier restatement re-windowed per
    // HOST in the same (fingerprint, url) priority order; start offsets
    // replay slot × coalesce(Crawl-delay, 2.0)
    "frontier_schedule" ->
      s"""WITH ${frontierCtes(withRedirects = true)},
         |fr AS (SELECT url, domain AS host,
         |    CASE WHEN url LIKE 'https://site%' THEN CAST(k AS DOUBLE)
         |         ELSE CAST(NULL AS DOUBLE) END AS crawl_delay, fp
         |  FROM sel WHERE rn <= 30),
         |sch AS (SELECT url, host, crawl_delay,
         |    CAST(row_number() OVER (PARTITION BY host ORDER BY fp, url) - 1 AS BIGINT) AS slot
         |  FROM fr)
         |SELECT url, host, slot,
         |  slot * coalesce(crawl_delay, 2.0) AS start_sec
         |FROM sch""".stripMargin,

    // inter-wave carryover: wave 1's per-host max(start + delay) becomes
    // wave 2's per-host base offset; the window replay is identical
    "frontier_schedule_carryover" ->
      s"""WITH ${frontierCtes(withRedirects = true)},
         |fr AS (SELECT url, domain AS host,
         |    CASE WHEN url LIKE 'https://site%' THEN CAST(k AS DOUBLE)
         |         ELSE CAST(NULL AS DOUBLE) END AS crawl_delay, fp
         |  FROM sel WHERE rn <= 30),
         |sch AS (SELECT url, host, crawl_delay,
         |    CAST(row_number() OVER (PARTITION BY host ORDER BY fp, url) - 1 AS BIGINT) AS slot
         |  FROM fr),
         |off AS (SELECT host,
         |    max(slot * coalesce(crawl_delay, 2.0) + coalesce(crawl_delay, 2.0)) AS base
         |  FROM sch GROUP BY host)
         |SELECT s.url, s.host, s.slot,
         |  o.base + s.slot * coalesce(s.crawl_delay, 2.0) AS start_sec
         |FROM sch s JOIN off o ON s.host = o.host""".stripMargin,

    // sitemap priority threading: the decision table carries declared
    // priorities, the cap replays the quantized composite (priority,
    // hash) key, the schedule re-windows per host on (priority DESC,
    // hash, url)
    "frontier_priority" -> {
      val fp = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(url)), " +
        "j -> CAST(ascii(url[j]) AS BIGINT))), (acc, c) -> (acc * 31 + c) % 1000000007)"
      s"""WITH b AS (SELECT doc_id, doc_id % 10 AS k,
         |    CAST(doc_id % 10 AS VARCHAR) AS ks, CAST(doc_id AS VARCHAR) AS i
         |  FROM documents),
         |rng AS (SELECT CAST(range AS BIGINT) AS k, CAST(range AS VARCHAR) AS ks FROM range(10)),
         |ext AS (
         |  SELECT 'https://h' || ks || '.com' AS url, k, FALSE AS blocked, FALSE AS fetched,
         |      'link' AS src, CAST(NULL AS DOUBLE) AS prio FROM b
         |  UNION ALL SELECT 'https://h' || ks || '.com/about', k, FALSE, FALSE, 'link', NULL FROM b
         |  UNION ALL SELECT 'https://site' || ks || '.com/page' || i || '?x=1', k, FALSE, FALSE, 'link', NULL FROM b
         |  UNION ALL SELECT 'https://alt' || ks || '.org/p' || i, k, k = 3, FALSE, 'link', NULL FROM b
         |  UNION ALL SELECT 'https://h' || ks || '.com/a/page' || i || '.html', k, FALSE, TRUE, 'link', NULL FROM b
         |    WHERE doc_id % 5 = 0
         |  UNION ALL SELECT 'https://site' || ks || '.com/sm/' || ks, k, FALSE, FALSE, 'sitemap', 0.9 FROM rng
         |  UNION ALL SELECT 'https://site' || ks || '.com/pg/' || ks, k, FALSE, FALSE, 'sitemap', 0.2 FROM rng
         |  UNION ALL SELECT 'https://h' || ks || '.com/about', k, FALSE, FALSE, 'sitemap', NULL FROM rng),
         |cand AS (SELECT url, k, src, prio FROM ext WHERE NOT blocked AND NOT fetched),
         |d AS (SELECT url, k, bool_or(src = 'link') AS fl, bool_or(src = 'sitemap') AS fs,
         |    max(prio) AS prio
         |  FROM cand GROUP BY url, k),
         |alw AS (SELECT * FROM d
         |  WHERE NOT (k % 2 = 1 AND url LIKE 'https://site' || CAST(k AS VARCHAR) || '.com/page%')),
         |pr AS (SELECT url, k, fl, fs, prio,
         |    CASE WHEN url LIKE 'https://site%' THEN 'site' || CAST(k AS VARCHAR) || '.com'
         |         WHEN url LIKE 'https://alt%' THEN 'alt' || CAST(k AS VARCHAR) || '.org'
         |         ELSE 'h' || CAST(k AS VARCHAR) || '.com' END AS domain,
         |    $fp AS fp
         |  FROM alw),
         |qk AS (SELECT *,
         |    (1000 - round(coalesce(prio, 0.5) * 1000)) * 2147483648 + fp AS ck
         |  FROM pr),
         |sel AS (SELECT *, row_number() OVER (PARTITION BY domain ORDER BY ck, url) AS rn FROM qk),
         |fr2 AS (SELECT url, domain AS host,
         |    CASE WHEN url LIKE 'https://site%' THEN CAST(k AS DOUBLE)
         |         ELSE CAST(NULL AS DOUBLE) END AS crawl_delay,
         |    CASE WHEN fl AND fs THEN 'both' WHEN fs THEN 'sitemap'
         |         ELSE 'link' END AS source,
         |    coalesce(prio, 0.5) AS priority, fp
         |  FROM sel WHERE rn <= 30),
         |sch AS (SELECT url, host, source, priority, crawl_delay,
         |    CAST(row_number() OVER (PARTITION BY host
         |      ORDER BY (1000 - round(priority * 1000)) ASC, fp, url) - 1 AS BIGINT) AS slot
         |  FROM fr2)
         |SELECT url, host, source, priority, slot,
         |  slot * coalesce(crawl_delay, 2.0) AS start_sec
         |FROM sch""".stripMargin
    },

    // in-link evidence: the decision table from the frontierInlinkPages
    // formulas — evidence = count(DISTINCT offsite referring domain),
    // cap rank = the integer-exact (1023 − min(n,1023))·2³¹ + hash
    // composite (every term an integer < 2⁴¹, bit-identical in DuckDB's
    // BIGINT and Spark's double)
    "frontier_inlinks" -> frontierInlinksSql,
    "frontier_inlinks_hashkeys" -> frontierInlinksSql,

    // alias suppression: the decision table with the alias flag — the
    // permanent sources (/about per k) drop at the screen, the temporary
    // source (h{k}.com) stays, both terminals enter as 'redirect'
    "frontier_redirect_alias" -> {
      val fp = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(url)), " +
        "j -> CAST(ascii(url[j]) AS BIGINT))), (acc, c) -> (acc * 31 + c) % 1000000007)"
      s"""WITH b AS (SELECT doc_id, doc_id % 10 AS k,
         |    CAST(doc_id % 10 AS VARCHAR) AS ks, CAST(doc_id AS VARCHAR) AS i
         |  FROM documents),
         |rng AS (SELECT CAST(range AS BIGINT) AS k, CAST(range AS VARCHAR) AS ks FROM range(10)),
         |ext AS (
         |  SELECT 'https://h' || ks || '.com' AS url, k, FALSE AS fetched, FALSE AS alias, 'link' AS src FROM b
         |  UNION ALL SELECT 'https://h' || ks || '.com/about', k, FALSE, TRUE, 'link' FROM b
         |  UNION ALL SELECT 'https://site' || ks || '.com/page' || i || '?x=1', k, FALSE, FALSE, 'link' FROM b
         |  UNION ALL SELECT 'https://alt' || ks || '.org/p' || i, k, FALSE, FALSE, 'link' FROM b
         |  UNION ALL SELECT 'https://h' || ks || '.com/a/page' || i || '.html', k, TRUE, FALSE, 'link' FROM b
         |    WHERE doc_id % 5 = 0
         |  UNION ALL SELECT 'https://h' || ks || '.com/about2', k, FALSE, FALSE, 'redirect' FROM rng
         |  UNION ALL SELECT 'https://h' || ks || '.com/tmp', k, FALSE, FALSE, 'redirect' FROM rng),
         |cand AS (SELECT url, k, src FROM ext WHERE NOT fetched AND NOT alias),
         |d AS (SELECT url, k, bool_or(src = 'link') AS fl, bool_or(src = 'sitemap') AS fs,
         |    bool_or(src = 'redirect') AS fr FROM cand GROUP BY url, k),
         |alw AS (SELECT * FROM d
         |  WHERE NOT (k % 2 = 1 AND url LIKE 'https://site' || CAST(k AS VARCHAR) || '.com/page%')),
         |pr AS (SELECT url, k, fl, fs, fr,
         |    CASE WHEN url LIKE 'https://site%' THEN 'site' || CAST(k AS VARCHAR) || '.com'
         |         WHEN url LIKE 'https://alt%' THEN 'alt' || CAST(k AS VARCHAR) || '.org'
         |         ELSE 'h' || CAST(k AS VARCHAR) || '.com' END AS domain,
         |    $fp AS fp FROM alw),
         |sel AS (SELECT *, row_number() OVER (PARTITION BY domain ORDER BY fp, url) AS rn,
         |    count(*) OVER (PARTITION BY domain) AS nd FROM pr)
         |SELECT url, domain AS host, domain,
         |  CASE WHEN url LIKE 'https://site%' THEN CAST(k AS DOUBLE)
         |       ELSE CAST(NULL AS DOUBLE) END AS crawl_delay,
         |  nd > 30 AS site_capped,
         |  $frontierSourceCase
         |FROM sel WHERE rn <= 30""".stripMargin
    },

    // sitemap recrawl: the decision table per lastmod class — modified
    // iff the declared (newest-folded) lastmod strictly exceeds the
    // 2026-02-15 10:00 fetch time; never-fetched n{i} rows are 'new'
    "sitemap_recrawl" ->
      """WITH b AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS i, doc_id % 5 AS m FROM documents)
        |SELECT * FROM (
        |  SELECT 'https://s.com/u' || i AS url, 'modified' AS reason FROM b WHERE m IN (0, 3)
        |  UNION ALL SELECT 'https://s.com/n' || i, 'new' FROM b)
        |ORDER BY url""".stripMargin,

    // the crawl loop: both survivor sets restated from the fixture
    // formulas — wave 2's frontier keeps exactly the fresh b/{i} links
    // (the s/{i} links were wave-1-fetched: the store screen), and wave
    // 2's curation keeps exactly the non-clone ids (i % 3 = 1 pages
    // carry wave-1 seed TEXT verbatim: the seen screen). Every id flows
    // wave1-frontier → fetch → wave2, so both sets span all of documents
    "crawl_loop_e2e" ->
      """WITH ids AS (SELECT doc_id, doc_id % 10 AS k FROM documents)
        |SELECT * FROM (
        |  SELECT 'f2' AS part,
        |    'https://h' || CAST(k AS VARCHAR) || '.com/b/' || CAST(doc_id AS VARCHAR) AS key
        |  FROM ids
        |  UNION ALL
        |  SELECT 'c2', CAST(doc_id + 1000000 AS VARCHAR) FROM ids
        |  WHERE doc_id % 3 <> 1)
        |ORDER BY part, key""".stripMargin,

    // http-profile funnel: the ingest row applies all three envelope
    // drop classes (the NULL-body class included), pinning the drops to
    // S1.5 rather than a later stage
    "pipeline_funnel_http" ->
      s"""WITH ${pipeCtes(ingWhere =
             "doc_id % 13 <> 6 AND doc_id % 11 <> 4 AND doc_id % 23 <> 15")}
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'ingest' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM ids
         |    WHERE doc_id % 13 <> 6 AND doc_id % 11 <> 4 AND doc_id % 23 <> 15
         |  UNION ALL SELECT 1, 'robots', count(*) FROM rob
         |  UNION ALL SELECT 2, 'lang', count(*) FROM lng
         |  UNION ALL SELECT 3, 'url_dedup', count(*) FROM urld
         |  UNION ALL SELECT 4, 'near_dup', count(*) FROM nd
         |  UNION ALL SELECT 5, 'decontam', count(*) FROM dec
         |  UNION ALL SELECT 6, 'quality', count(*) FROM q
         |  UNION ALL SELECT 7, 'domain_cap', count(*) FROM cap
         |  UNION ALL SELECT 8, 'written', count(*) FROM sp)
         |ORDER BY stage_idx""".stripMargin,

    // per-stage survivor counts over the SAME replay chain; `domain_cap`
    // counts the cap stage itself and `written` the on-disk readback, so
    // a row lost between cap and shard store would show as a cliff
    // between the two instead of hiding inside either
    "pipeline_funnel" ->
      s"""WITH ${pipeCtes()}
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'ingest' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM ids
         |  UNION ALL SELECT 1, 'robots', count(*) FROM rob
         |  UNION ALL SELECT 2, 'lang', count(*) FROM lng
         |  UNION ALL SELECT 3, 'url_dedup', count(*) FROM urld
         |  UNION ALL SELECT 4, 'near_dup', count(*) FROM nd
         |  UNION ALL SELECT 5, 'decontam', count(*) FROM dec
         |  UNION ALL SELECT 6, 'quality', count(*) FROM q
         |  UNION ALL SELECT 7, 'domain_cap', count(*) FROM cap
         |  UNION ALL SELECT 8, 'written', count(*) FROM sp)
         |ORDER BY stage_idx""".stripMargin,

    // the wildcard decision table from the fixture formulas (see the
    // gate comment): parser, regex compilation and matcher never appear
    "robots_filter_wildcard" ->
      """SELECT doc_id,
        |  'w' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' AS host,
        |  CASE doc_id % 8
        |    WHEN 0 THEN '/page?sessionid=' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN '/download/f' || CAST(doc_id AS VARCHAR) || '.html'
        |    WHEN 2 THEN '/download/f' || CAST(doc_id AS VARCHAR) || '.pdf'
        |    WHEN 3 THEN '/tmp'
        |    WHEN 4 THEN '/tmping' || CAST(doc_id AS VARCHAR)
        |    WHEN 5 THEN '/tXa' || CAST(doc_id AS VARCHAR)
        |    WHEN 6 THEN '/axxb/c' || CAST(doc_id AS VARCHAR)
        |    ELSE '/anything' || CAST(doc_id AS VARCHAR) END AS path,
        |  CASE doc_id % 8 WHEN 0 THEN FALSE WHEN 1 THEN TRUE
        |    WHEN 2 THEN FALSE WHEN 3 THEN FALSE WHEN 4 THEN TRUE
        |    WHEN 5 THEN TRUE WHEN 6 THEN TRUE ELSE FALSE END AS allowed
        |FROM documents""".stripMargin,

    // expected rows derived from the capture-fixture formulas (see the
    // gate comment): the parser under test never appears here
    // resolution decision table from the resolve_url fixture formulas:
    // neither the merge, the dot-segment fold nor the branch logic
    // appears — each (base-class, ref-class) pair's expected absolute
    // URL is written out from the RFC by hand
    "resolve_url" ->
      """WITH b AS (SELECT doc_id,
        |    doc_id % 10 AS k, doc_id % 9 AS m,
        |    CAST(doc_id % 10 AS VARCHAR) AS ks, CAST(doc_id AS VARCHAR) AS i
        |  FROM documents),
        |c AS (SELECT doc_id, k, m, ks, i,
        |    'https://h' || ks || '.com' AS hostp,
        |    k % 4 <> 0 AS haspath,
        |    CASE WHEN k % 4 <> 0 THEN '/a/b/index.html' ELSE '/' END AS basepath,
        |    CASE WHEN k % 4 <> 0 THEN '/a/b/' ELSE '/' END AS dirp,
        |    CASE WHEN k % 5 = 2 THEN '?v=1' ELSE '' END AS bq
        |  FROM b)
        |SELECT doc_id,
        |  hostp || CASE WHEN haspath THEN '/a/b/index.html' ELSE '' END
        |    || bq || CASE WHEN k % 3 = 1 THEN '#bfrag' ELSE '' END AS base,
        |  CASE m WHEN 0 THEN 'https://other.org/x' || i || '?q=1#f'
        |    WHEN 1 THEN '//cdn' || ks || '.com/lib.js'
        |    WHEN 2 THEN '/root/p' || i
        |    WHEN 3 THEN 'img' || i || '.png'
        |    WHEN 4 THEN '../up.html'
        |    WHEN 5 THEN './same.html?x=' || i || '#g'
        |    WHEN 6 THEN ''
        |    WHEN 7 THEN '?only=q'
        |    ELSE 'b/../c/./d' || i || '.html' END AS ref,
        |  CASE m WHEN 0 THEN 'https://other.org/x' || i || '?q=1'
        |    WHEN 1 THEN 'https://cdn' || ks || '.com/lib.js'
        |    WHEN 2 THEN hostp || '/root/p' || i
        |    WHEN 3 THEN hostp || dirp || 'img' || i || '.png'
        |    WHEN 4 THEN hostp || CASE WHEN haspath THEN '/a/up.html' ELSE '/up.html' END
        |    WHEN 5 THEN hostp || dirp || 'same.html?x=' || i
        |    WHEN 6 THEN hostp || basepath || bq
        |    WHEN 7 THEN hostp || basepath || '?only=q'
        |    ELSE hostp || dirp || 'c/d' || i || '.html' END AS resolved
        |FROM c""".stripMargin,

    // link decision table from the extract_links fixture formulas: the
    // regex chain never appears; anchors arrive markup-stripped and
    // whitespace-collapsed
    "extract_links" ->
      """WITH b AS (SELECT doc_id, CAST(doc_id % 10 AS VARCHAR) AS k,
        |    CAST(doc_id AS VARCHAR) AS i FROM documents)
        |SELECT doc_id, CAST(0 AS BIGINT) AS link_idx, '/' AS href, 'Home' AS anchor FROM b
        |UNION ALL SELECT doc_id, 1, '/about#f', 'About Us' FROM b
        |UNION ALL SELECT doc_id, 2,
        |  'https://site' || k || '.com/page' || i || '?x=1', 'page ' || i || ' here' FROM b
        |UNION ALL SELECT doc_id, 3, 'https://alt' || k || '.org/p' || i, 'alt M&x ' || i FROM b
        |UNION ALL SELECT doc_id, 4, '', 'empty' FROM b WHERE doc_id % 5 = 0""".stripMargin,

    // per-target decision table from the link fixture formulas: '/' and
    // '/about' collect one host-class's pages (anchors 'Home' /
    // 'About Us'), per-page site/alt targets carry their one anchor,
    // empty self-references land on the page's own URL
    "anchor_texts" -> AnchorTextsSql,

    // capped anchor corpus: the hub target's ~501 distinct anchors cut to
    // the 5 smallest by (rolling-hash, anchor) with the EXACT over-cap
    // flag; the per-doc self targets stay complete and unflagged. The
    // oracle replays the identical priority cut over the distinct pairs —
    // the heap never appears
    "anchor_texts_capped" ->
      """WITH b AS (SELECT doc_id, doc_id % 10 AS k, CAST(doc_id AS VARCHAR) AS i
        |  FROM documents),
        |pairs AS (
        |  SELECT doc_id, 'https://hub.example.com/' AS dst_url, 'tag ' || i AS anchor FROM b
        |  UNION ALL SELECT doc_id, 'https://hub.example.com/', 'common' FROM b
        |  UNION ALL SELECT doc_id,
        |    'https://h' || CAST(k AS VARCHAR) || '.com/s/' || i, 'self ' || i FROM b),
        |cnt AS (SELECT dst_url, count(*) AS n_anchors FROM pairs GROUP BY 1),
        |d AS (SELECT DISTINCT dst_url, anchor FROM pairs),
        |pr AS (SELECT dst_url, anchor,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, length(anchor)),
        |        j -> CAST(ascii(anchor[j]) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
        |  FROM d),
        |sel AS (SELECT dst_url, anchor,
        |    row_number() OVER (PARTITION BY dst_url ORDER BY fp, anchor) AS rn,
        |    count(*) OVER (PARTITION BY dst_url) AS nd
        |  FROM pr)
        |SELECT c.dst_url, CAST(c.n_anchors AS BIGINT) AS n_anchors,
        |  string_agg(s.anchor, '|' ORDER BY s.anchor) AS anchors,
        |  max(s.nd) > 5 AS anchors_capped
        |FROM cnt c JOIN sel s ON c.dst_url = s.dst_url AND s.rn <= 5
        |GROUP BY c.dst_url, c.n_anchors""".stripMargin,

    // edge-count decision table from the link fixture formulas: each
    // page contributes two self-host edges ("/", "/about#f"), one to
    // site{k}.com, one to alt{k}.org, plus the empty self-reference on
    // every-5th docs (doc ≡ k mod 10 ⇒ the whole k-class when k%5=0)
    "web_link_graph" -> WebLinkGraphSql,

    // the hash-keyed exchange variants: same oracles as their
    // string-keyed twins — the knob must not change a single value
    "web_link_graph_hashkeys" -> WebLinkGraphSql,
    "anchor_texts_hashkeys" -> AnchorTextsSql,

    // decision table from the robots-directives fixture formulas: the
    // parser/segment walk never appears. Second star group's 7 beats
    // every base delay (max rule); k%4∈{0,3} without it stays NULL
    "robots_directives" ->
      """WITH k AS (SELECT DISTINCT doc_id % 20 AS k FROM documents)
        |SELECT 'h' || CAST(k AS VARCHAR) || '.example.com' AS host,
        |  'https://h' || CAST(k AS VARCHAR) || '.example.com/sitemap.xml'
        |    || CASE WHEN k % 5 = 0
        |         THEN '|https://h' || CAST(k AS VARCHAR) || '.example.com/s2.xml'
        |         ELSE '' END AS sitemaps,
        |  CASE WHEN k % 3 = 0 THEN 7.0
        |       WHEN k % 4 = 1 THEN 1.5
        |       WHEN k % 4 = 2 THEN 2.0
        |       ELSE NULL END AS crawl_delay
        |FROM k""".stripMargin,

    "warc_records" ->
      """WITH t AS (SELECT doc_id, text, lang,
        |  'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS uri,
        |  (CASE WHEN doc_id % 7 = 0 THEN 'seen: WARC/1.0' || chr(13) || chr(10)
        |        ELSE '' END) || 'lang: ' || lang AS mp
        |  FROM documents)
        |SELECT doc_id, CAST(0 AS BIGINT) AS rec_idx, 'response' AS warc_type,
        |  uri AS target_uri, CAST(len(text) AS BIGINT) AS content_length,
        |  text AS payload FROM t
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT) AS rec_idx, 'metadata' AS warc_type,
        |  '' AS target_uri, CAST(len(mp) AS BIGINT) AS content_length,
        |  mp AS payload FROM t""".stripMargin,

    // expected rows from the gz-fixture formulas: content_length is the
    // BYTE count (6 per 'café ' repeat — é is two bytes; 16 bytes for
    // the embedded-magic prefix), payload the decoded string
    "warc_records_gz" ->
      """WITH t AS (SELECT doc_id, lang,
        |  'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS uri,
        |  (CASE WHEN doc_id % 7 = 0 THEN 'seen: WARC/1.0' || chr(13) || chr(10)
        |        ELSE '' END) || 'lang: ' || lang AS mp,
        |  repeat('café ', CAST(1 + doc_id % 5 AS INTEGER)) AS rp
        |  FROM documents)
        |SELECT doc_id, CAST(0 AS BIGINT) AS rec_idx, 'response' AS warc_type,
        |  uri AS target_uri, CAST(6 * (1 + doc_id % 5) AS BIGINT) AS content_length,
        |  rp AS payload FROM t
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT) AS rec_idx, 'metadata' AS warc_type,
        |  '' AS target_uri,
        |  CAST((CASE WHEN doc_id % 7 = 0 THEN 16 ELSE 0 END) + 6 + len(lang) AS BIGINT)
        |    AS content_length,
        |  mp AS payload FROM t""".stripMargin,

    // expected rows from the http-fixture formulas: the decision table
    // per doc_id (status precedence 404 > 301 > 200, mime/charset per
    // the Content-Type variant, headers = the constructed block — plus
    // its dangling CRLF in the truncated case, body = text + the
    // embedded-blank tail). The parse chain never appears here.
    "http_parse" ->
      """WITH t AS (SELECT doc_id, text,
        |  doc_id % 19 = 6 AS non_http,
        |  doc_id % 29 = 9 AS trunc,
        |  doc_id % 23 <> 3 AS has_ct,
        |  CASE WHEN doc_id % 13 = 5 THEN '404 Not Found'
        |       WHEN doc_id % 17 = 2 THEN '301 Moved Permanently'
        |       ELSE '200 OK' END AS codephrase,
        |  CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 'Content-Type: text/html; charset=UTF-8'
        |    WHEN 1 THEN 'content-type: TEXT/HTML;charset="utf-8"'
        |    WHEN 2 THEN 'Content-Type: application/json'
        |    ELSE 'Content-Type: text/plain; charset=ISO-8859-1' END AS ctline
        |  FROM documents),
        |h AS (SELECT *,
        |  'HTTP/1.1 ' || codephrase || chr(13) || chr(10)
        |    || 'X-Content-Type: evil/mime; charset=evil-x' || chr(13) || chr(10)
        |    || 'Server: srv' || CAST(doc_id % 5 AS VARCHAR)
        |    || CASE WHEN has_ct THEN chr(13) || chr(10) || ctline ELSE '' END
        |    AS hdrblock,
        |  text || CASE WHEN doc_id % 7 = 1
        |    THEN ' tail' || chr(13) || chr(10) || chr(13) || chr(10) || 'after blank'
        |    ELSE '' END AS fullbody
        |  FROM t)
        |SELECT doc_id,
        |  CAST(CASE WHEN non_http THEN NULL
        |       WHEN doc_id % 13 = 5 THEN 404
        |       WHEN doc_id % 17 = 2 THEN 301 ELSE 200 END AS INT) AS http_status,
        |  CASE WHEN non_http OR NOT has_ct THEN NULL
        |       WHEN doc_id % 4 = 2 THEN 'application/json'
        |       WHEN doc_id % 4 = 3 THEN 'text/plain'
        |       ELSE 'text/html' END AS mime,
        |  CASE WHEN non_http OR NOT has_ct OR doc_id % 4 = 2 THEN NULL
        |       WHEN doc_id % 4 = 3 THEN 'iso-8859-1'
        |       ELSE 'utf-8' END AS charset,
        |  CASE WHEN non_http THEN NULL
        |       ELSE hdrblock || CASE WHEN trunc THEN chr(13) || chr(10) ELSE '' END
        |       END AS headers,
        |  CASE WHEN non_http OR trunc THEN NULL ELSE fullbody END AS body
        |FROM h""".stripMargin,

    // the recall_l2 oracle pattern: the expected DECISION table is
    // all-TRUE with the exact fixture dimensions — the JDK codec the
    // booleans compare against cannot be restated in SQL, but any drift
    // of our decoder past the tolerances flips a boolean and hash-fails
    "jpeg_luma_decode" ->
      """SELECT doc_id,
        |  CAST(72 AS BIGINT) AS g_w, CAST(64 AS BIGINT) AS g_h,
        |  TRUE AS g_sum_ok, TRUE AS g_max_ok, TRUE AS g_dhash_ok,
        |  CAST(72 AS BIGINT) AS c_w, CAST(64 AS BIGINT) AS c_h,
        |  TRUE AS c_sum_ok, TRUE AS c_dhash_ok,
        |  CAST(72 AS BIGINT) AS p_w, CAST(64 AS BIGINT) AS p_h,
        |  TRUE AS p_sum_ok, TRUE AS p_dhash_ok
        |FROM documents""".stripMargin,

    // png_dhash restated exactly from the fixture formula (72×64 grid,
    // 8×8 pools, bit 63 dropped); cross_ok is the all-TRUE column the
    // JPEG side must earn at decode time
    "image_dhash_cross_format" ->
      """WITH cells AS (SELECT doc_id, gx.x AS x, gy.y AS y,
        |    x + y + CASE WHEN ((x // 8) + (y // 8)) % 2 = 0 THEN 0 ELSE 32 END
        |      + doc_id % 64 AS l
        |  FROM documents,
        |    UNNEST(generate_series(0, 71)) gx(x),
        |    UNNEST(generate_series(0, 63)) gy(y)),
        |pool AS (SELECT doc_id, x // 8 AS px, y // 8 AS py, sum(l) // 64 AS pv
        |  FROM cells GROUP BY 1, 2, 3),
        |hb AS (SELECT pa.doc_id,
        |  CAST(sum(CASE WHEN pa.pv < pb.pv AND (pa.py * 8 + pa.px) < 63
        |       THEN (CAST(1 AS BIGINT) << (pa.py * 8 + pa.px)) ELSE 0 END) AS BIGINT) AS png_dhash
        |  FROM pool pa JOIN pool pb
        |    ON pa.doc_id = pb.doc_id AND pa.py = pb.py AND pb.px = pa.px + 1
        |  GROUP BY pa.doc_id)
        |SELECT doc_id, png_dhash, TRUE AS cross_ok FROM hb""".stripMargin,

    "multimodal_meta" -> {
      val pngLen = MediaCodec.pngFixture(1, 1).length
      val jpegLen = MediaCodec.jpegFixture(1, 1).length
      val wavLen = MediaCodec.wavFixture(8000, 1, 0).length
      val gifLen = MediaCodec.gifFixture(1, 1).length
      s"""SELECT doc_id,
         |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'wav' ELSE 'gif' END AS media_type,
         |  CAST(CASE doc_id % 4 WHEN 2 THEN 8000 + (doc_id % 8) * 1000 ELSE 1 + doc_id % 640 END AS BIGINT) AS width,
         |  CAST(CASE doc_id % 4 WHEN 2 THEN 1 + doc_id % 2 ELSE 1 + doc_id % 480 END AS BIGINT) AS height,
         |  CAST(CASE doc_id % 4 WHEN 2 THEN doc_id % 100 ELSE 1 END AS BIGINT) AS n_frames,
         |  CAST(CASE doc_id % 4 WHEN 0 THEN $pngLen WHEN 1 THEN $jpegLen WHEN 2 THEN $wavLen ELSE $gifLen END AS BIGINT) AS byte_len
         |FROM documents""".stripMargin
    },

    // zero-frame payloads (doc_id % 100 == 0) contribute zero rows — the
    // oracle filter restates sampleFrames' when(n_frames > 0, ...) guard
    // independently instead of mirroring a greatest(...,0) clamp
    "multimodal_frames" ->
      """SELECT doc_id,
        |  CAST(unnest(generate_series(0, doc_id % 100 - 1, 7)) AS BIGINT) AS frame_idx
        |FROM documents WHERE doc_id % 100 > 0""".stripMargin,

    // exact restatement of the PCM generator the fixture materializes:
    // the Spark side DECODES bytes, the oracle recomputes from the formula
    "gif_frames" ->
      """SELECT doc_id, CAST(1 + doc_id % 6 AS BIGINT) AS n_frames,
        |  CAST((1 + doc_id % 6) * (3 + doc_id % 7) AS BIGINT) AS total_delay_cs
        |FROM documents""".stripMargin,

    // formula samples -> 8-sample frame energies -> whole-envelope
    // (h*31 + e%2^16) % 1e9+7 fold + strict-interior-peak count
    "audio_fingerprint" ->
      """WITH t AS (SELECT doc_id, 50 + doc_id % 32 AS n FROM documents),
        |s AS (SELECT doc_id, n, list_transform(generate_series(0, n - 1),
        |    i -> ((doc_id * 31 + i * 17) % 4096) - 2048) AS sm FROM t),
        |e AS (SELECT doc_id, n // 8 AS k, list_transform(generate_series(0, n // 8 - 1),
        |    w -> CAST(list_sum(list_transform(generate_series(1, 8),
        |      j -> CAST(sm[w * 8 + j] AS BIGINT) * sm[w * 8 + j])) AS BIGINT)) AS el FROM s),
        |p AS (SELECT doc_id, k, el,
        |    len(list_filter(generate_series(2, k - 1),
        |      w -> el[w] > el[w - 1] AND el[w] > el[w + 1])) AS n_peaks FROM e)
        |SELECT doc_id, CAST(k AS BIGINT) AS n_windows, CAST(n_peaks AS BIGINT) AS n_peaks,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(el, x -> x % 65536)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS fingerprint
        |FROM p""".stripMargin,

    "audio_pcm_stats" ->
      """WITH t AS (SELECT doc_id, 50 + doc_id % 32 AS n FROM documents),
        |s AS (SELECT doc_id, n, list_transform(generate_series(0, n - 1),
        |    i -> ((doc_id * 31 + i * 17) % 4096) - 2048) AS sm FROM t)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(list_sum(list_transform(sm, x -> abs(x))) AS BIGINT) AS sum_abs,
        |  CAST(list_max(list_transform(sm, x -> abs(x))) AS BIGINT) AS max_abs,
        |  CAST(coalesce(list_sum(list_transform(generate_series(2, n),
        |    i -> CASE WHEN (sm[i] < 0) <> (sm[i-1] < 0) THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_cross
        |FROM s""".stripMargin,

    // exact restatement of the pixel generator: per-channel sums over the
    // w x h grid; the Spark side inflates + unfilters real PNG bytes
    // generator pixels -> luma -> 2x2 floor-mean pools -> comparison bits;
    // bit index y*8+x, bit 63 dropped (BIGINT-restatable convention)
    "image_dhash" -> {
      val luma =
        """CASE WHEN ch = 1 THEN (doc_id + 7*x + 13*y) % 256
          |     ELSE (299*((doc_id + 7*x + 13*y) % 256)
          |         + 587*((doc_id + 7*x + 13*y + 29) % 256)
          |         + 114*((doc_id + 7*x + 13*y + 58) % 256)) // 1000 END""".stripMargin
      s"""WITH t AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS ch FROM documents),
         |cells AS (SELECT doc_id, gx.x AS x, gy.y AS y, $luma AS l
         |  FROM t, UNNEST(generate_series(0, 17)) AS gx(x), UNNEST(generate_series(0, 15)) AS gy(y)),
         |pool AS (SELECT doc_id, x // 2 AS px, y // 2 AS py, sum(l) // 4 AS pv
         |  FROM cells GROUP BY doc_id, x // 2, y // 2),
         |hb AS (SELECT pa.doc_id,
         |  CAST(sum(CASE WHEN pa.pv < pb.pv AND (pa.py * 8 + pa.px) < 63
         |           THEN (CAST(1 AS BIGINT) << (pa.py * 8 + pa.px)) ELSE 0 END) AS BIGINT) AS dhash
         |  FROM pool pa JOIN pool pb
         |    ON pa.doc_id = pb.doc_id AND pa.py = pb.py AND pb.px = pa.px + 1
         |  GROUP BY pa.doc_id)
         |SELECT doc_id, dhash FROM hb""".stripMargin
    },

    "image_dhash_pairs" -> {
      val luma =
        """CASE WHEN ch = 1 THEN (doc_id + 7*x + 13*y) % 256
          |     ELSE (299*((doc_id + 7*x + 13*y) % 256)
          |         + 587*((doc_id + 7*x + 13*y + 29) % 256)
          |         + 114*((doc_id + 7*x + 13*y + 58) % 256)) // 1000 END""".stripMargin
      s"""WITH t AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS ch FROM documents),
         |cells AS (SELECT doc_id, gx.x AS x, gy.y AS y, $luma AS l
         |  FROM t, UNNEST(generate_series(0, 17)) AS gx(x), UNNEST(generate_series(0, 15)) AS gy(y)),
         |pool AS (SELECT doc_id, x // 2 AS px, y // 2 AS py, sum(l) // 4 AS pv
         |  FROM cells GROUP BY doc_id, x // 2, y // 2),
         |hb AS (SELECT pa.doc_id,
         |  CAST(sum(CASE WHEN pa.pv < pb.pv AND (pa.py * 8 + pa.px) < 63
         |           THEN (CAST(1 AS BIGINT) << (pa.py * 8 + pa.px)) ELSE 0 END) AS BIGINT) AS dhash
         |  FROM pool pa JOIN pool pb
         |    ON pa.doc_id = pb.doc_id AND pa.py = pb.py AND pb.px = pa.px + 1
         |  GROUP BY pa.doc_id)
         |SELECT a.doc_id AS a, b.doc_id AS b,
         |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
         |FROM hb a JOIN hb b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
         |ORDER BY a, b""".stripMargin
    },

    "image_pixel_stats" ->
      """WITH t AS (SELECT doc_id, 1 + doc_id % 8 AS w, 1 + doc_id % 6 AS h FROM documents),
        |cells AS (SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS k FROM t),
        |v AS (SELECT doc_id, k % w AS x, k // w AS y FROM cells),
        |s AS (SELECT v.doc_id,
        |    SUM((v.doc_id + 7*x + 13*y) % 256) AS sum_r,
        |    SUM((v.doc_id + 7*x + 13*y + 29) % 256) AS sum_g,
        |    SUM((v.doc_id + 7*x + 13*y + 58) % 256) AS sum_b,
        |    MAX(greatest((v.doc_id + 7*x + 13*y) % 256,
        |      (v.doc_id + 7*x + 13*y + 29) % 256,
        |      (v.doc_id + 7*x + 13*y + 58) % 256)) AS max_px
        |  FROM v GROUP BY v.doc_id)
        |SELECT t.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels, CAST(sum_r AS BIGINT) AS sum_r,
        |  CAST(sum_g AS BIGINT) AS sum_g, CAST(sum_b AS BIGINT) AS sum_b,
        |  CAST(max_px AS BIGINT) AS max_px
        |FROM t JOIN s ON t.doc_id = s.doc_id""".stripMargin,

    "multimodal_features" ->
      """WITH ch AS (SELECT doc_id, t,
        |  list_transform(generate_series(1, length(t)), i -> CAST(ascii(t[i]) AS BIGINT)) AS cs
        |  FROM (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t FROM documents))
        |SELECT doc_id,
        |  CASE WHEN t IS NULL THEN NULL
        |       ELSE CAST(coalesce(list_sum(cs), 0) AS DOUBLE) / 256 END AS feat_sum,
        |  CASE WHEN t IS NULL THEN NULL
        |       ELSE CAST(coalesce(list_sum(list_transform(generate_series(1, len(cs)),
        |    i -> ((i - 1) % 16 + 1) * cs[i])), 0) AS DOUBLE) / 256 END AS feat_wsum
        |FROM ch""".stripMargin,

    // temperatureMixture replayed end-to-end: counts → 9-dp decimal
    // α-weights → exact decimal sum → double rate tree → idHash copies
    "mixture_temperature" ->
      """WITH sz AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n,
        |  CAST(round(POWER(CAST(n AS DOUBLE), 0.5), 9) AS DECIMAL(38,9)) AS p FROM sz),
        |tot AS (SELECT CAST(SUM(p) AS DECIMAL(38,9)) AS s, CAST(SUM(n) AS BIGINT) AS t FROM w),
        |perm AS (SELECT lang, n,
        |  CAST(FLOOR(1000.0 * (CAST(p AS DOUBLE) / CAST(s AS DOUBLE)) * t / n + 0.5) AS BIGINT) AS permille
        |  FROM w, tot),
        |cp AS (SELECT d.doc_id, d.lang, permille,
        |  permille // 1000 + (CASE WHEN ((d.doc_id % 1000003) * 2654435761 % 1000000007) % 1000 < permille % 1000
        |    THEN 1 ELSE 0 END) AS n_copies
        |  FROM documents d JOIN perm USING (lang))
        |SELECT lang, max(permille) AS permille,
        |  count(CASE WHEN n_copies > 0 THEN 1 END) AS n_docs,
        |  CAST(SUM(n_copies) AS BIGINT) AS n_resampled
        |FROM cp GROUP BY lang
        |HAVING SUM(n_copies) > 0""".stripMargin,

    "inverted_search" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
         |post AS (SELECT term, doc_id, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_sum
         |FROM post WHERE term IN ('vector', 'hash', 'join')
         |GROUP BY doc_id HAVING count(*) = 3
         |ORDER BY tf_sum DESC, doc_id LIMIT 20""".stripMargin,

    "pagerank" -> pageRankSql(3),

    "hits_scores" -> hitsSql(2),

    // two synchronous LPA rounds over the same simhash graph: neighbor
    // label majorities, row_number tiebreak (count desc, label asc)
    "label_propagation" -> {
      def round(i: Int) =
        s"""m$i AS (SELECT e.v AS node, l.label, count(*) AS cnt
           |  FROM ed e JOIN l${i - 1} l ON l.node = e.u GROUP BY e.v, l.label),
           |l$i AS (SELECT node, label FROM (
           |  SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
           |  FROM m$i) WHERE rn = 1)""".stripMargin
      s"""WITH $simhashSelect,
         |pr AS (SELECT a.doc_id AS a, b.doc_id AS b FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |ed AS (SELECT a AS u, b AS v FROM pr UNION SELECT b AS u, a AS v FROM pr),
         |l0 AS (SELECT DISTINCT u AS node, u AS label FROM ed),
         |${round(1)},
         |${round(2)}
         |SELECT node AS doc_id, label AS community FROM l2 ORDER BY doc_id""".stripMargin
    },

    "novelty_score" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |g AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(toks) - 2 > 0
         |    THEN list_transform(generate_series(1, len(toks) - 2), i -> array_to_string(toks[i:i+2], ' '))
         |    ELSE [] END) AS gram FROM t),
         |dfq AS (SELECT gram, count(*) AS gdf FROM g GROUP BY 1)
         |SELECT doc_id, count(*) AS n_distinct_grams,
         |  CAST(SUM(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  round(CAST(SUM(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
         |FROM g JOIN dfq USING (gram) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    ((doc_id % 2147483648) * 2654435761 + CAST(doc_id // 2147483648 AS BIGINT) * 40503) % 1000000007 * 8388608
        |      + ((doc_id % 2147483648) * 2246822519 + CAST(doc_id // 2147483648 AS BIGINT) * 69069) % 8388593 AS h53
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        |SELECT doc_id, n_chars,
        |  round(ln(CAST(h53 + 1 AS DOUBLE) / 9007199254740992.0) / CAST(n_chars AS DOUBLE), 9) AS sample_key
        |FROM h ORDER BY sample_key DESC, doc_id LIMIT 50""".stripMargin,

    "heavy_hitters_by_lang" ->
      s"""WITH toks AS (SELECT lang AS key, unnest(${cleanWsSql(cleanAcSql)}) AS token FROM documents),
         |c AS (SELECT key, token, count(*) AS n FROM toks GROUP BY 1, 2),
         |r AS (SELECT key, token, n,
         |    row_number() OVER (PARTITION BY key ORDER BY n DESC, token) AS rk FROM c)
         |SELECT key AS lang, CAST(rk AS BIGINT) AS rank, token, n
         |FROM r WHERE rk <= 10 ORDER BY lang, rank""".stripMargin,

    "data_card" ->
      s"""WITH qs AS (SELECT doc_id, text, len($tokensSql) AS n_tok, length(text) AS n_chr,
         |  $qualityScoreSql AS q FROM documents),
         |agg AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |  CAST(sum(n_tok) AS DOUBLE) AS n_tokens,
         |  round(CAST(sum(n_chr) AS DOUBLE) / count(*), 6) AS mean_chars,
         |  round(CAST(sum(CAST(q AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS mean_quality,
         |  round(quantile_cont(n_tok, 0.25), 6) AS p25,
         |  round(quantile_cont(n_tok, 0.5), 6) AS p50,
         |  round(quantile_cont(n_tok, 0.75), 6) AS p75
         |  FROM qs),
         |dd AS (SELECT CAST(count(DISTINCT text) AS DOUBLE) AS n_distinct FROM documents)
         |SELECT 'n_docs' AS metric, n_docs AS value FROM agg
         |UNION ALL SELECT 'n_tokens', n_tokens FROM agg
         |UNION ALL SELECT 'mean_chars', mean_chars FROM agg
         |UNION ALL SELECT 'mean_quality', mean_quality FROM agg
         |UNION ALL SELECT 'exact_dup_rate', round((n_docs - n_distinct) / n_docs, 6) FROM agg, dd
         |UNION ALL SELECT 'tokens_p25', p25 FROM agg
         |UNION ALL SELECT 'tokens_p50', p50 FROM agg
         |UNION ALL SELECT 'tokens_p75', p75 FROM agg""".stripMargin,

    // quality formula -> q20-binary-grid quantile_cont cuts -> sum-of-
    // compares bin (binary grid: decimal 6-dp halves round differently
    // across engines; k/2^20 halves are exact doubles and round the same)
    "curriculum_bins" ->
      s"""WITH qs AS (SELECT doc_id, $qualityScoreSql AS score FROM documents),
         |c AS (SELECT round(quantile_cont(score, 0.25) * 1048576) / 1048576 AS c1,
         |             round(quantile_cont(score, 0.5) * 1048576) / 1048576 AS c2,
         |             round(quantile_cont(score, 0.75) * 1048576) / 1048576 AS c3 FROM qs)
         |SELECT doc_id, score,
         |  CAST(CASE WHEN score > c1 THEN 1 ELSE 0 END
         |     + CASE WHEN score > c2 THEN 1 ELSE 0 END
         |     + CASE WHEN score > c3 THEN 1 ELSE 0 END AS BIGINT) AS bin
         |FROM qs, c ORDER BY doc_id""".stripMargin,

    // integer scale-6 scores -> per-lang exact quartile (interpolation
    // exact for binary-fraction quantiles over integer endpoints) ->
    // strict floor filter; both outputs leave the grid by the same /1e6
    "quality_floor_by_lang" ->
      s"""WITH qs AS (SELECT doc_id, lang,
         |  CAST(round(($qualityScoreSql) * 1000000) AS BIGINT) AS s6 FROM documents),
         |c AS (SELECT lang, quantile_cont(s6, 0.25) AS q6 FROM qs GROUP BY lang)
         |SELECT doc_id, qs.lang, CAST(s6 AS DOUBLE) / 1000000.0 AS score,
         |  q6 / 1000000.0 AS cut
         |FROM qs JOIN c ON qs.lang = c.lang
         |WHERE CAST(s6 AS DOUBLE) > q6 ORDER BY doc_id""".stripMargin,

    // quality formula -> desc-cumsum bucket walk -> cut/residual scalars
    // -> (h53, id)-ordered tie window; full buckets reduce to skey > cut
    "token_budget_select" ->
      s"""WITH qs AS (SELECT doc_id, $qualityScoreSql AS skey,
         |  CAST(len($tokensSql) AS BIGINT) AS n_tok FROM documents),
         |b AS (SELECT skey, sum(n_tok) AS bt FROM qs GROUP BY skey),
         |cb AS (SELECT skey, bt,
         |  sum(bt) OVER (ORDER BY skey DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM b),
         |ct AS (SELECT skey AS cutkey, 15000 - (cum - bt) AS tieb FROM cb
         |  WHERE cum > 15000 ORDER BY skey DESC LIMIT 1),
         |h AS (SELECT doc_id, skey, n_tok, tieb,
         |  ((doc_id % 2147483648) * 2654435761 + CAST(doc_id // 2147483648 AS BIGINT) * 40503) % 1000000007 * 8388608
         |    + ((doc_id % 2147483648) * 2246822519 + CAST(doc_id // 2147483648 AS BIGINT) * 69069) % 8388593 AS h53
         |  FROM qs JOIN ct ON qs.skey = ct.cutkey),
         |tie AS (SELECT doc_id, skey, n_tok FROM (
         |  SELECT doc_id, skey, n_tok, tieb,
         |    sum(n_tok) OVER (ORDER BY h53, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
         |  FROM h) WHERE cum2 <= tieb)
         |SELECT doc_id, skey AS score_key, n_tok AS n_tokens FROM qs
         |  WHERE skey > (SELECT cutkey FROM ct)
         |UNION ALL SELECT doc_id, skey AS score_key, n_tok AS n_tokens FROM tie
         |ORDER BY doc_id""".stripMargin,

    // closed-form UniMax waterfill: prefix-sum cappedness + even share
    "unimax_mixture" ->
      """WITH sz AS (SELECT lang AS domain, CAST(sum(n_chars) AS BIGINT) AS n_tokens
        |            FROM documents GROUP BY lang HAVING sum(n_chars) > 0),
        |st AS (SELECT count(*) AS n FROM sz),
        |rkd AS (SELECT domain, n_tokens,
        |  row_number() OVER (ORDER BY n_tokens, domain) AS rk,
        |  sum(n_tokens) OVER (ORDER BY n_tokens, domain ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
        |  FROM sz),
        |cp AS (SELECT rkd.*, st.n,
        |  (2 * n_tokens * (st.n - rk + 1) + 2 * (pfx - n_tokens) <= 250000) AS capped FROM rkd, st),
        |cs AS (SELECT count(*) FILTER (WHERE capped) AS m,
        |       coalesce(sum(n_tokens) FILTER (WHERE capped), 0) AS s_cap FROM cp)
        |SELECT domain, n_tokens,
        |  round(CASE WHEN capped THEN CAST(2 * n_tokens AS DOUBLE)
        |        ELSE CAST(250000 - 2 * s_cap AS DOUBLE) / CAST(n - m AS DOUBLE) END, 6) AS allocation,
        |  round(round(CASE WHEN capped THEN CAST(2 * n_tokens AS DOUBLE)
        |        ELSE CAST(250000 - 2 * s_cap AS DOUBLE) / CAST(n - m AS DOUBLE) END, 6)
        |    / CAST(n_tokens AS DOUBLE), 6) AS epochs
        |FROM cp, cs ORDER BY domain""".stripMargin,

    "weighted_cap_per_key" ->
      """WITH h AS (
        |  SELECT lang, doc_id, n_chars,
        |    ((doc_id % 2147483648) * 2654435761 + CAST(doc_id // 2147483648 AS BIGINT) * 40503) % 1000000007 * 8388608
        |      + ((doc_id % 2147483648) * 2246822519 + CAST(doc_id // 2147483648 AS BIGINT) * 69069) % 8388593 AS h53
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |sk AS (SELECT lang, doc_id,
        |  round(ln(CAST(h53 + 1 AS DOUBLE) / 9007199254740992.0) / CAST(n_chars AS DOUBLE), 9) AS sample_key
        |  FROM h),
        |r AS (SELECT lang, doc_id, sample_key,
        |  row_number() OVER (PARTITION BY lang ORDER BY sample_key DESC, doc_id) AS rk FROM sk)
        |SELECT lang, CAST(rk AS BIGINT) AS rank, doc_id, sample_key
        |FROM r WHERE rk <= 5 ORDER BY lang, rank""".stripMargin,

    "dsir_scores" ->
      s"""WITH $dsirScoresCte
         |SELECT doc_id, dsir_score, n_tokens FROM sc""".stripMargin,

    "dsir_sample" ->
      s"""WITH $dsirScoresCte,
         |h AS (SELECT doc_id, dsir_score,
         |  ((doc_id % 2147483648) * 2654435761 + CAST(doc_id // 2147483648 AS BIGINT) * 40503) % 1000000007 * 8388608
         |    + ((doc_id % 2147483648) * 2246822519 + CAST(doc_id // 2147483648 AS BIGINT) * 69069) % 8388593 AS h53
         |  FROM sc)
         |SELECT doc_id, dsir_score,
         |  round(dsir_score + (-ln(-ln(CAST(h53 + 1 AS DOUBLE) / 9007199254740992.0))), 9) AS sample_key
         |FROM h ORDER BY sample_key DESC, doc_id LIMIT 100""".stripMargin,

    "bigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |pr AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
         |    THEN list_transform(generate_series(2, len(toks)), i ->
         |      {'prev': toks[i-1], 'cur': toks[i]})
         |    ELSE [] END) AS p FROM t),
         |pp AS (SELECT doc_id, p.prev AS prev, p.cur AS cur FROM pr),
         |bg AS (SELECT prev, cur, count(*) AS cb FROM pp GROUP BY 1, 2),
         |cx AS (SELECT prev, count(*) AS ca FROM pp GROUP BY 1),
         |un AS (SELECT tk AS cur, count(*) AS cu
         |       FROM (SELECT unnest(toks) AS tk FROM t) u GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_total FROM un),
         |lp AS (SELECT doc_id,
         |  CAST(round(ln(0.7 * cb / ca + (1.0 - 0.7) * cu / n_total), 9) AS DECIMAL(38,9)) AS logp
         |  FROM pp JOIN bg USING (prev, cur) JOIN cx USING (prev) JOIN un USING (cur), tot)
         |SELECT doc_id, round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS mean_logp,
         |  count(*) AS n_pairs
         |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // tf/df -> 9-dp weights -> decimal norms and dots -> cosine -> per-doc
    // (d, other) rank cut, all independently restated
    "similar_docs_sparse" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokensSql) AS term FROM documents),
         |tfx AS (SELECT term, doc_id, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS tdf FROM tfx GROUP BY 1),
         |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
         |wts AS (SELECT term, tfx.doc_id, round(CAST(tf AS DOUBLE)
         |    * ln(CAST(n + 1 AS DOUBLE) / CAST(tdf + 1 AS DOUBLE)), 9) AS w
         |  FROM tfx JOIN dfq USING (term), nn),
         |nrm AS (SELECT doc_id,
         |    sqrt(CAST(sum(CAST(round(w * w, 9) AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
         |  FROM wts GROUP BY doc_id),
         |dots AS (SELECT a.doc_id AS a, b.doc_id AS b,
         |    CAST(sum(CAST(round(a.w * b.w, 9) AS DECIMAL(38,9))) AS DOUBLE) AS dot
         |  FROM wts a JOIN wts b ON a.term = b.term AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2),
         |sc AS (SELECT a, b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
         |  FROM dots JOIN nrm na ON na.doc_id = a JOIN nrm nb ON nb.doc_id = b
         |  WHERE na.nrm > 0 AND nb.nrm > 0),
         |rk AS (SELECT a AS doc_id, b AS other, round(1.0 - cosine, 6) AS d FROM sc),
         |r2 AS (SELECT doc_id, other, d,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY d, other) AS rn FROM rk)
         |SELECT doc_id, CAST(rn AS BIGINT) AS rank, other, round(1.0 - d, 6) AS cosine
         |FROM r2 WHERE rn <= 5 ORDER BY doc_id, rank""".stripMargin,

    "kneser_ney_logprob" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |pr AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
         |    THEN list_transform(generate_series(2, len(toks)), i ->
         |      {'prev': toks[i-1], 'cur': toks[i]})
         |    ELSE [] END) AS p FROM t),
         |pp AS (SELECT doc_id, p.prev AS prev, p.cur AS cur FROM pr),
         |bg AS (SELECT prev, cur, count(*) AS cb FROM pp GROUP BY 1, 2),
         |cx AS (SELECT prev, count(*) AS ca FROM pp GROUP BY 1),
         |fo AS (SELECT prev, count(*) AS n1f FROM bg GROUP BY 1),
         |cn AS (SELECT cur, count(*) AS n1b FROM bg GROUP BY 1),
         |nb AS (SELECT count(*) AS nbg FROM bg),
         |lp AS (SELECT doc_id,
         |  CAST(round(ln(
         |    greatest(CAST(cb AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0.0 AS DOUBLE)) / CAST(ca AS DOUBLE)
         |      + CAST(0.75 AS DOUBLE) * CAST(n1f AS DOUBLE) / CAST(ca AS DOUBLE)
         |        * (CAST(n1b AS DOUBLE) / CAST(nbg AS DOUBLE))), 9) AS DECIMAL(38,9)) AS logp
         |  FROM pp JOIN bg USING (prev, cur) JOIN cx USING (prev)
         |       JOIN fo USING (prev) JOIN cn USING (cur), nb)
         |SELECT doc_id, round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS mean_logp,
         |  count(*) AS n_pairs
         |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "rrf_hybrid" -> {
      val terms = Seq("vector", "hash", "scan")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(ws, x -> x = '$t')) AS tf$i" }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      val score = terms.indices.map(i =>
        s"ln(1 + (n - df$i + 0.5) / (df$i + 0.5)) * tf$i * 2.2 / " +
        s"(tf$i + 1.2 * (0.25 + (0.75 / (sumlen / CAST(n AS DOUBLE))) * dl))").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, $tokensSql AS ws FROM documents),
         |tf AS (SELECT doc_id, len(ws) AS dl, $tfs FROM t),
         |st AS (SELECT count(*) AS n, sum(dl) AS sumlen, $dfs FROM tf),
         |bm AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank FROM (
         |  SELECT doc_id, round($score, 6) AS score FROM tf, st
         |  ORDER BY score DESC, doc_id LIMIT 50) bx),
         |p AS (SELECT $probeSqlList AS pv),
         |kd AS (SELECT vec_id AS doc_id, round(${distSql("cosine")}, 6) AS rd
         |       FROM embeddings, p WHERE embedding IS NOT NULL),
         |kn AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY rd, doc_id) AS rank FROM (
         |  SELECT doc_id, rd FROM kd ORDER BY rd, doc_id LIMIT 50) kx),
         |u AS (SELECT doc_id, rank FROM bm UNION ALL SELECT doc_id, rank FROM kn),
         |f AS (SELECT doc_id,
         |  CAST(SUM(CAST(round(1.0 / (60.0 + rank), 9) AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS s,
         |  count(*) AS n_lists FROM u GROUP BY 1)
         |SELECT doc_id, CAST(s AS DOUBLE) AS rrf_score, CAST(n_lists AS BIGINT) AS n_lists
         |FROM f ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin
    },

    "triangle_counts" ->
      s"""WITH $simhashSelect,
         |pr AS (SELECT a.doc_id AS a, b.doc_id AS b FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |       WHERE bit_count(xor(a.simhash, b.simhash)) <= 7),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |        FROM pr e1 JOIN pr e2 ON e2.a = e1.b
         |        JOIN pr e3 ON e3.a = e1.a AND e3.b = e2.b),
         |nd AS (SELECT x AS node FROM tri
         |       UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
         |SELECT node AS doc_id, count(*) AS n_triangles FROM nd GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // shufflePositions' (bucket, idHash53, id) total order restated as one
    // ROW_NUMBER — the oracle needs no two-level machinery, just the order
    "shuffle_positions" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483648) * 2654435761 + CAST(doc_id // 2147483648 AS BIGINT) * 40503) % 1000000007 * 8388608
        |      + ((doc_id % 2147483648) * 2246822519 + CAST(doc_id // 2147483648 AS BIGINT) * 69069) % 8388593 AS h53
        |  FROM documents)
        |SELECT doc_id,
        |  ROW_NUMBER() OVER (ORDER BY h53 % 32, h53, doc_id) - 1 AS shuffle_pos
        |FROM h ORDER BY doc_id""".stripMargin,

    // shard = (pos * 8) // N over the shuffle_positions order; xor of the
    // same h53 hash is the order-independent membership fingerprint
    "training_shards" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    ((doc_id % 2147483648) * 2654435761 + CAST(doc_id // 2147483648 AS BIGINT) * 40503) % 1000000007 * 8388608
        |      + ((doc_id % 2147483648) * 2246822519 + CAST(doc_id // 2147483648 AS BIGINT) * 69069) % 8388593 AS h53
        |  FROM documents),
        |p AS (SELECT doc_id, n_chars, h53,
        |    ROW_NUMBER() OVER (ORDER BY h53 % 32, h53, doc_id) - 1 AS pos,
        |    COUNT(*) OVER () AS n
        |  FROM h)
        |SELECT CAST((pos * 8) // n AS INT) AS shard,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_tokens,
        |  MIN(pos) AS first_pos, MAX(pos) AS last_pos,
        |  bit_xor(h53) AS id_xor
        |FROM p GROUP BY 1 ORDER BY shard""".stripMargin,

    "pmi_pairs" ->
      s"""WITH t AS (SELECT $tokensSql AS toks FROM documents),
         |pe AS (SELECT unnest(CASE WHEN len(toks) >= 2
         |    THEN list_transform(generate_series(1, len(toks) - 1), i ->
         |      {'a': least(toks[i], toks[i+1]), 'b': greatest(toks[i], toks[i+1])})
         |    ELSE [] END) AS p FROM t),
         |pc AS (SELECT p.a AS a, p.b AS b, count(*) AS n_pair FROM pe
         |       WHERE p.a <> '' AND p.b <> '' GROUP BY 1, 2),
         |flt AS (SELECT * FROM pc WHERE n_pair >= 5),
         |un AS (SELECT tk AS tok, count(*) AS n_uni
         |       FROM (SELECT unnest(toks) AS tk FROM t) u WHERE tk <> '' GROUP BY 1),
         |tot AS (SELECT (SELECT CAST(SUM(n_uni) AS BIGINT) FROM un) AS n_total,
         |               (SELECT CAST(SUM(greatest(len(toks) - 1, 0)) AS BIGINT) FROM t) AS p_total)
         |SELECT f.a, f.b, f.n_pair,
         |  round(ln(CAST(f.n_pair AS DOUBLE) * n_total * n_total
         |    / (CAST(p_total AS DOUBLE) * ua.n_uni * ub.n_uni)), 6) AS pmi
         |FROM flt f JOIN un ua ON ua.tok = f.a JOIN un ub ON ub.tok = f.b, tot
         |ORDER BY pmi DESC, a, b LIMIT 40""".stripMargin,

    "cdc_chunks" ->
      """WITH t AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
        |           FROM documents WHERE text IS NOT NULL),
        |lb AS (SELECT doc_id, t, length(t) AS len FROM t),
        |bd AS (SELECT doc_id, t, len,
        |  list_concat(list_concat([0],
        |    CASE WHEN len > 8 THEN list_filter(generate_series(8, len - 1), i ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(generate_series(i - 7, i), j -> CAST(ascii(t[j]) AS BIGINT))),
        |        (acc, c) -> (acc * 31 + c) % 1000000007) % 64 = 0)
        |    ELSE [] END), [len]) AS b FROM lb),
        |ch AS (SELECT doc_id, t, unnest(CASE WHEN len > 0
        |    THEN list_transform(generate_series(1, len(b) - 1), k ->
        |      {'chunk_idx': CAST(k - 1 AS BIGINT), 'start_off': CAST(b[k] AS BIGINT),
        |       'chunk_len': CAST(b[k+1] - b[k] AS BIGINT)})
        |    ELSE [] END) AS c FROM bd),
        |cs AS (SELECT doc_id, c.chunk_idx AS chunk_idx, c.start_off AS start_off,
        |  c.chunk_len AS chunk_len,
        |  substr(t, CAST(c.start_off + 1 AS INTEGER), CAST(c.chunk_len AS INTEGER)) AS s FROM ch)
        |SELECT doc_id, chunk_idx, start_off, chunk_len,
        |  CASE WHEN length(s) = 0 THEN CAST(0 AS BIGINT) ELSE
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, length(s)), i -> CAST(ascii(s[i]) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 1000000007) END AS fp
        |FROM cs""".stripMargin,

    "cross_doc_ngrams" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |g AS (SELECT doc_id, unnest(CASE WHEN len(toks) - 2 > 0
         |    THEN list_transform(generate_series(1, len(toks) - 2), i -> array_to_string(toks[i:i+2], ' '))
         |    ELSE [] END) AS gram FROM t)
         |SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
         |FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, n_occurrences DESC, gram LIMIT 50""".stripMargin
  ) ++
    packedGridCombos.map { case (m, et) =>
      s"packed_${et}_$m" -> packedGridSql(m, "dist")
    }.toMap ++
    packedCodeCombos.map { case (m, qt) =>
      val n = if (qt == QType.I8) "i8" else "u8"
      s"packed_${n}_$m" -> packedCodeSql(m, qt, "dist")
    }.toMap
}
