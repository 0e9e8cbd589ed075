package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt crawl-policy evaluation (RFC 9309, the Robots Exclusion
  * Protocol) — the first gate every compliant crawl pipeline applies
  * before a URL is fetched at all, and the cheapest corpus-level audit
  * after the fact ("which of these captured URLs were actually
  * crawlable?").
  *
  * Coverage: the merged `User-agent: *` group(s), `Allow:` /
  * `Disallow:` rules with literal path prefixes AND the RFC's two
  * wildcard forms — `*` matching any character run mid-pattern and a
  * trailing `$` anchoring the end of the path. Field names are
  * case-insensitive and `#` comments strip before parsing, per the RFC.
  * Literal rules (the overwhelming majority in the wild) stay on the
  * codegen'd `startsWith` fast path; only rules that actually carry a
  * wildcard compile to an RE2-safe anchored regex (escape the literal
  * part, `*` -> `.*`, trailing `$` -> end anchor).
  *
  * Decision rule (RFC 9309 §2.2.2): among the group's rules that match
  * the URL path, the one with the LONGEST pattern (most-specific =
  * longest octet count, wildcards counting as written) wins; on a
  * length tie `Allow` wins; no matching rule (or no rules at all for the
  * host) means allowed — the protocol's documented FAIL-OPEN default,
  * which also means a host whose robots.txt failed to fetch or parse
  * admits everything (callers wanting fail-closed should left-anti-join
  * the no-rules hosts instead). An empty-path rule (`Disallow:` with
  * nothing after it) matches nothing and is dropped at parse time, per
  * the RFC.
  *
  * Scale shape: rule parsing is one in-row pass over each robots.txt
  * (split + filter + transform, zero shuffle); evaluation is ONE
  * equi-join on the 8-byte-hashable host key — URLs never meet rules of
  * other hosts, and the per-URL candidate set is bounded by that host's
  * rule count. The verdict aggregation is a partial max over a packed
  * (prefix-length, allow) pair, so nothing wider than the URL row ever
  * shuffles.
  */
object Robots {

  /** Parse the merged `User-agent: *` group(s) of each robots.txt into
    * rule rows: (hostCol, allow: boolean, prefix: string). Group
    * extraction follows the grammar without lookaround: split on
    * `User-agent:`, keep segments whose first line names `*`, then keep
    * that segment's lines up to the segment end (the next `User-agent:`
    * began the next split segment by construction). Multiple `*` groups
    * merge, per the RFC. Line endings tolerate `\r\n`; field names are
    * case-normalized and `#` comments strip (both RFC-required) before
    * the split. One documented subset: a group that STACKS several
    * `User-agent:` lines before its rules attributes the rules to the
    * last-listed agent only.
    */
  /** RFC 9309 line canonicalization shared by [[parseRules]] and
    * [[directives]]: field names are case-insensitive and `#` starts a
    * comment running to end-of-line — normalize both up front so the
    * structural walks see one canonical spelling per field.
    */
  private def canonText(textCol: String): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(col(textCol), "\r", ""),
      "#[^\n]*", ""),
      "(?im)^[ \t]*user-agent[ \t]*:", "User-agent:"),
      "(?im)^[ \t]*disallow[ \t]*:", "Disallow:"),
      "(?im)^[ \t]*allow[ \t]*:", "Allow:"),
      "(?im)^[ \t]*crawl-delay[ \t]*:", "Crawl-delay:"),
      "(?im)^[ \t]*sitemap[ \t]*:", "Sitemap:")

  def parseRules(robots: DataFrame, hostCol: String, textCol: String): DataFrame = {
    val canon = canonText(textCol)
    val segs = split(canon, "User-agent:")
    // a segment applies iff its first line is exactly "*"
    val starSegs = filter(segs, seg => trim(element_at(split(seg, "\n"), 1)) === "*")
    val ruleLines = flatten(transform(starSegs, seg =>
      filter(transform(slice(split(seg, "\n"), 2, 100000), l => trim(l)),
        l => l.startsWith("Allow:") || l.startsWith("Disallow:"))))
    val rules = filter(
      transform(ruleLines, l => struct(
        l.startsWith("Allow:").as("allow"),
        trim(when(l.startsWith("Allow:"), l.substr(lit(7), length(l) - 6))
          .otherwise(l.substr(lit(10), length(l) - 9))).as("prefix"))),
      r => r.getField("prefix") =!= "")
    robots.select(col(hostCol), explode(rules).as("r"))
      .select(col(hostCol), col("r.allow").as("allow"), col("r.prefix").as("prefix"))
  }

  /** Non-rule robots.txt directives — the two fields a crawl SCHEDULER
    * needs beyond allow/deny verdicts: `Sitemap:` (a file-scope field
    * per sitemaps.org — valid anywhere, independent of agent groups;
    * these seed [[sitemapFrontier]]'s roots) and `Crawl-delay:` (a
    * de-facto field honored per agent GROUP; only the merged
    * `User-agent: *` groups' values apply here, an agent-specific
    * group's delay is correctly ignored). One row per host:
    * (hostCol, sitemaps: array of URLs in file order, crawl_delay:
    * double — the MAX across the `*` groups' parseable values, the
    * politest reading when a file disagrees with itself; null when
    * absent or unparseable). Same normalization as [[parseRules]]
    * (case-insensitive fields, `#` comments), one in-row pass per
    * robots.txt, zero shuffle.
    */
  def directives(robots: DataFrame, hostCol: String, textCol: String): DataFrame = {
    val canon = canonText(textCol)
    val sitemaps = filter(
      transform(regexp_extract_all(canon, lit("(?m)^Sitemap:[ \t]*([^\n]*)"), lit(1)),
        v => trim(v)),
      v => v =!= "")
    // Crawl-delay lines of the merged `User-agent: *` group(s) — the
    // same segment walk as parseRules' rule extraction.
    val segs = split(canon, "User-agent:")
    val starSegs = filter(segs, seg => trim(element_at(split(seg, "\n"), 1)) === "*")
    val delayLines = flatten(transform(starSegs, seg =>
      filter(transform(slice(split(seg, "\n"), 2, 100000), l => trim(l)),
        l => l.startsWith("Crawl-delay:"))))
    val delays = filter(
      transform(delayLines, l =>
        when(trim(l.substr(lit(13), length(l) - 12)).rlike("^[0-9]+(\\.[0-9]+)?$"),
          trim(l.substr(lit(13), length(l) - 12)).cast("double"))
          .otherwise(lit(null).cast("double"))),
      d => d.isNotNull)
    robots.select(col(hostCol), sitemaps.as("sitemaps"),
      when(size(delays) > 0, array_max(delays))
        .otherwise(lit(null).cast("double")).as("crawl_delay"))
  }

  /** Compile one RFC 9309 path pattern to an RE2-safe anchored regex:
    * a trailing `$` becomes an end anchor, every other regex
    * metacharacter in the pattern escapes to its literal self, and `*`
    * becomes `.*`. `^` is prepended — RFC patterns always match from the
    * start of the path. Pure column expressions, so an independent SQL
    * engine can restate the identical compilation.
    */
  def compiledPattern(p: Column): Column = {
    val hasEnd = p.endsWith("$")
    val body = when(hasEnd, p.substr(lit(1), length(p) - 1)).otherwise(p)
    val escaped = regexp_replace(body, "([.^+?(){}\\[\\]\\\\|$])", "\\\\$1")
    val starred = regexp_replace(escaped, "\\*", ".*")
    concat(lit("^"), starred, when(hasEnd, lit("$")).otherwise(lit("")))
  }

  /** Evaluate URLs against parsed rules (the output of [[parseRules]]):
    * one row per input URL with the longest-match verdict. Output:
    * (idCol, hostCol, pathCol, allowed). URLs of hosts with no rules —
    * or matching no rule — are allowed (the RFC's fail-open default).
    * Literal rules match on the codegen'd `startsWith` fast path;
    * wildcard rules (`*` / trailing `$`) match their compiled regex.
    */
  def robotsFilter(urls: DataFrame, idCol: String, hostCol: String, pathCol: String,
                   rules: DataFrame, ruleHostCol: String): DataFrame = {
    val isLiteral = !col("prefix").contains("*") && !col("prefix").endsWith("$")
    val matched = urls
      .join(rules.select(col(ruleHostCol).as(hostCol), col("allow"), col("prefix")),
        Seq(hostCol))
      .where(when(isLiteral, col(pathCol).startsWith(col("prefix")))
        .otherwise(regexp_like(col(pathCol), compiledPattern(col("prefix")))))
      // longest pattern wins; tie -> Allow: exactly max over (len, allow)
      .groupBy(col(idCol))
      .agg(max(struct(length(col("prefix")).as("plen"),
        col("allow").cast("int").as("a"))).as("best"))
      .select(col(idCol), (col("best.a") === 1).as("_match_allowed"))
    urls.join(matched, Seq(idCol), "left")
      .select(col(idCol), col(hostCol), col(pathCol),
        coalesce(col("_match_allowed"), lit(true)).as("allowed"))
  }

  /** Sitemap (sitemaps.org XML) URL extraction — the crawl-frontier
    * seeding companion to [[parseRules]]: one row per `<url>` entry with
    * its `<loc>`, optional `<lastmod>` and optional `<priority>` (kept
    * as the raw string — a priority is a protocol token, not a number
    * to re-float). The walk is structural-lite, the right tool for a
    * machine-generated format: split on `<url>`, one RE2-safe
    * `regexp_extract` per field within the entry (`[^<]*` bodies, so a
    * malformed entry yields empty fields rather than crossing entry
    * boundaries). Entries with an empty `<loc>` are dropped, per the
    * protocol. Sitemap-INDEX files (`<sitemap>` entries pointing at
    * child sitemaps) are handled by [[sitemapIndexRefs]] +
    * [[sitemapFrontier]] — frontier recursion over this row extractor.
    * One codegen'd per-row pass, zero shuffle. Output: (idCol,
    * entry_idx, loc, lastmod, priority).
    */
  def sitemapUrls(sitemaps: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val entries = filter(
      transform(slice(split(col(xmlCol), "<url>"), 2, 1000000), seg => struct(
        regexp_extract(seg, "<loc>([^<]*)</loc>", 1).as("loc"),
        regexp_extract(seg, "<lastmod>([^<]*)</lastmod>", 1).as("lastmod"),
        regexp_extract(seg, "<priority>([^<]*)</priority>", 1).as("priority"))),
      e => e.getField("loc") =!= "")
    sitemaps.select(col(idCol), posexplode(entries).as(Seq("entry_idx", "e")))
      .select(col(idCol), col("entry_idx").cast("long").as("entry_idx"),
        col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
        col("e.priority").as("priority"))
  }

  /** Sitemap-INDEX reference extraction — [[sitemapUrls]]' recursion
    * companion: one row per `<sitemap><loc>` child reference of an index
    * file (sitemaps.org `<sitemapindex>`), same structural-lite walk
    * (entries with an empty `<loc>` drop; a plain urlset yields no rows
    * because it has no `<sitemap>` entries, and the `</sitemap>` closer
    * never matches the split token). Output: (idCol, ref_idx, loc).
    */
  def sitemapIndexRefs(sitemaps: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val refs = filter(
      transform(slice(split(col(xmlCol), "<sitemap>"), 2, 1000000),
        seg => regexp_extract(seg, "<loc>([^<]*)</loc>", 1)),
      l => l =!= "")
    sitemaps.select(col(idCol), posexplode(refs).as(Seq("ref_idx", "loc")))
      .select(col(idCol), col("ref_idx").cast("long").as("ref_idx"), col("loc"))
  }

  /** Full crawl-frontier seeding over NESTED sitemaps — real frontiers
    * are mostly index files pointing at child sitemaps, often two levels
    * deep. `fetched` is the caller's fetch store (sitemap URL → XML
    * body); `roots` seeds the walk. Each level joins the frontier to the
    * store, emits that level's `<url>` entries, and derives the next
    * frontier from `<sitemap><loc>` references anti-joined against the
    * visited set — cycles terminate, references missing from the store
    * contribute nothing (fetch-what-you-have semantics). Bounded-depth
    * driver loop (the pageRank pattern): ≤ `maxDepth` levels (require
    * ≤ 8 — live trees are 2-3), one narrow URL-keyed join + anti-join
    * per level, XML bodies never shuffle beyond their frontier join.
    * Output: (sitemap_url = the file the entry came from, depth,
    * entry_idx, loc, lastmod, priority).
    */
  def sitemapFrontier(fetched: DataFrame, urlCol: String, xmlCol: String,
                      roots: DataFrame, rootUrlCol: String,
                      maxDepth: Int = 4): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 8,
      s"maxDepth must be in [1, 8], got $maxDepth")
    val fx = fetched.select(col(urlCol).as("sitemap_url"), col(xmlCol).as("_xml"))
    var frontier = roots.select(col(rootUrlCol).as("sitemap_url")).distinct()
    var visited = frontier
    var out: DataFrame = null
    var depth = 0
    var exhausted = false
    while (!exhausted && depth < maxDepth) {
      val level = frontier.join(fx, "sitemap_url")
      val entries = sitemapUrls(level, "sitemap_url", "_xml")
        .withColumn("depth", lit(depth.toLong))
        .select(col("sitemap_url"), col("depth"), col("entry_idx"),
          col("loc"), col("lastmod"), col("priority"))
      out = if (out == null) entries else out.unionByName(entries)
      depth += 1
      if (depth < maxDepth) {
        // next frontier: unvisited child references (visited and frontier
        // are disjoint by construction, so the union stays a set)
        frontier = sitemapIndexRefs(level, "sitemap_url", "_xml")
          .select(col("loc").as("sitemap_url")).distinct()
          .join(visited, Seq("sitemap_url"), "left_anti")
        visited = visited.unionByName(frontier)
        exhausted = frontier.isEmpty
      }
    }
    out
  }

  /** Sitemap-driven RECRAWL selection — the consumer of the `lastmod`
    * field [[sitemapUrls]]/[[sitemapFrontier]] extract: given sitemap
    * leaves and the crawl's per-URL last-fetch times, emit the URLs
    * worth fetching again. A leaf is selected when it was NEVER fetched
    * (reason `new`) or when its declared lastmod is STRICTLY LATER than
    * the recorded fetch time (reason `modified`); a fetched URL whose
    * lastmod is absent, unparseable (try_cast — garbage is protocol
    * noise, never an error) or not newer stays out — the site gave no
    * evidence of change, and refetching it anyway is the politeness
    * budget's biggest waste at recrawl scale. Duplicate leaf entries
    * (several sitemaps listing one URL) fold to the NEWEST lastmod
    * first. Both sides key on the canonical URL.
    *
    * Scale shape: one URL-keyed distinct fold over the leaves + ONE
    * left join against the fetch-time store (at 100 TB both sides carry
    * (8-byte-hashable url, timestamp) only); the W3C datetime parse is a
    * per-row cast. Output: (url, reason ∈ 'new' | 'modified').
    */
  def sitemapRecrawl(leaves: DataFrame, locCol: String, lastmodCol: String,
                     fetched: DataFrame, fetchUrlCol: String,
                     fetchTimeCol: String): DataFrame = {
    val lm = leaves.select(
        TextAnalysis.canonicalUrl(col(locCol)).as("url"),
        expr(s"try_cast(`$lastmodCol` AS TIMESTAMP)").as("_lm"))
      .groupBy("url").agg(max(col("_lm")).as("_lm"))
    val ft = fetched.select(
      TextAnalysis.canonicalUrl(col(fetchUrlCol)).as("url"),
      col(fetchTimeCol).cast("timestamp").as("_ft"))
    lm.join(ft, Seq("url"), "left")
      .withColumn("reason",
        when(col("_ft").isNull, "new")
          .when(col("_lm").isNotNull && col("_lm") > col("_ft"), "modified"))
      .where(col("reason").isNotNull)
      .select(col("url"), col("reason"))
  }
}
