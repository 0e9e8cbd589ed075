package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt crawl-policy evaluation (RFC 9309, the Robots Exclusion
  * Protocol) — the first gate every compliant crawl pipeline applies
  * before a URL is fetched at all, and the cheapest corpus-level audit
  * after the fact ("which of these captured URLs were actually
  * crawlable?").
  *
  * Supported subset, documented rather than hidden: the merged
  * `User-agent: *` group(s), `Allow:` / `Disallow:` rules with LITERAL
  * path prefixes. RFC wildcards (`*` mid-pattern, `$` anchor) are out of
  * scope — they are a regex engine on the match path; the literal-prefix
  * rule covers the overwhelming majority of real robots.txt lines and
  * keeps every step a codegen'd string op an independent SQL engine
  * restates verbatim.
  *
  * Decision rule (RFC 9309 §2.2.2): among the group's rules whose prefix
  * is a prefix of the URL path, the LONGEST prefix wins; on a
  * length tie `Allow` wins; no matching rule (or no rules at all for the
  * host) means allowed. An empty-path rule (`Disallow:` with nothing
  * after it) matches nothing and is dropped at parse time, per the RFC.
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
    * merge, per the RFC. Line endings tolerate `\r\n`. One further
    * documented subset: a group that STACKS several `User-agent:` lines
    * before its rules attributes the rules to the last-listed agent only.
    */
  def parseRules(robots: DataFrame, hostCol: String, textCol: String): DataFrame = {
    val segs = split(regexp_replace(col(textCol), "\r", ""), "User-agent:")
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

  /** Evaluate URLs against parsed rules (the output of [[parseRules]]):
    * one row per input URL with the longest-match verdict. Output:
    * (idCol, hostCol, pathCol, allowed). URLs of hosts with no rules —
    * or matching no rule — are allowed.
    */
  def robotsFilter(urls: DataFrame, idCol: String, hostCol: String, pathCol: String,
                   rules: DataFrame, ruleHostCol: String): DataFrame = {
    val matched = urls
      .join(rules.select(col(ruleHostCol).as(hostCol), col("allow"), col("prefix")),
        Seq(hostCol))
      .where(col(pathCol).startsWith(col("prefix")))
      // longest prefix wins; tie -> Allow: exactly max over (len, allow)
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
    * child sitemaps) are out of scope here — they are frontier
    * recursion, not row extraction. One codegen'd per-row pass, zero
    * shuffle. Output: (idCol, entry_idx, loc, lastmod, priority).
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
}
