package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-corpus deduplication — the "same page,
  * many spellings" normalizer every web-scale pipeline runs before
  * URL-level dedup (tracking params, fragments, default ports and case
  * drift otherwise fan one page out into dozens of keys).
  *
  * Pure column expressions (regexp chain, codegen'd, no UDF): at 100 TB
  * canonicalization is a map-only pass and the dedup after it is a plain
  * hash groupBy on the canonical key.
  *
  * Canonical form, applied in order:
  *  1. strip the `#fragment`;
  *  2. lowercase the scheme://host[:port] prefix (path/query case kept —
  *     paths are case-sensitive on most origins);
  *  3. drop default ports `:80` / `:443`;
  *  4. remove tracking parameters (`utm_*`, `gclid`, `fbclid`) wherever
  *     they sit in the query string, then collapse the separators they
  *     leave behind;
  *  5. drop a trailing `/` before the query or end (`/a/?x` → `/a?x`,
  *     `/a/` → `/a`) and any dangling `?`/`&`.
  */
object UrlOps {

  /** The canonical key for `url`. Null-safe (null in → null out). */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // scheme://authority prefix, lowercased; rest untouched
    val prefix = lower(regexp_extract(noFrag, "^([^/?#]*//[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[^/?#]*//[^/?#]*", "")
    // default ports are SCHEME-SPECIFIC: http://h:443 is a real
    // non-default port and must survive
    val noPort = regexp_replace(
      regexp_replace(prefix, "^(https://[^/?#:]*):443$", "$1"),
      "^(http://[^/?#:]*):80$", "$1")
    // tracking params: each match is replaced by its leading separator,
    // then ?&…/&&… runs collapse and trailing separators drop
    val noTrack = regexp_replace(rest, "([?&])(utm_[^&=]*|gclid|fbclid)=[^&]*", "$1")
    val collapsed = regexp_replace(regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&")
    // trailing-slash normalization is a PATH rule: fold `/?` into `?`,
    // and strip a trailing slash only when no query follows (a slash at
    // the end of a query VALUE is part of the value)
    val slashQ = regexp_replace(collapsed, "/+\\?", "?")
    val noSlash = when(instr(slashQ, "?") > 0, slashQ)
      .otherwise(regexp_replace(slashQ, "/+$", ""))
    val clean = regexp_replace(noSlash, "[?&]+$", "")
    concat(noPort, clean)
  }

  /** Host of a canonical (or raw) URL — grouping key for per-site caps. */
  def host(url: Column): Column =
    regexp_extract(lower(url), "^[^/?#]*//([^/?#:]*)", 1)
}
