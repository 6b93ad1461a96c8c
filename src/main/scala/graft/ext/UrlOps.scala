package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization + registered-domain extraction for web-corpus
 * curation — the step every published crawl pipeline (CCNet,
 * RefinedWeb, Gopher's massiveweb) runs before URL-level dedup and
 * per-domain caps/blocklists. Everything here is a pure `Column`
 * expression chain (regexp over codegen'd string ops — zero UDFs), so
 * the work stays inside WholeStageCodegen and scales as a per-row map
 * with no shuffle; the shuffles belong to whatever aggregation the
 * caller composes on top.
 *
 * The canonical form is a fixed, documented rule set (each rule one
 * regex, replayable in any engine):
 *  1. drop the fragment (`#…`);
 *  2. lowercase scheme + authority (path/query case is preserved —
 *     paths are case-sensitive);
 *  3. strip one leading `www.` label;
 *  4. strip an explicit default port (`:80`/`:443`) — non-default
 *     ports are kept;
 *  5. drop `utm_*` tracking parameters (the separator-repair order:
 *     mid-list `&utm_…`, then leading `?utm_…&` → `?`, then a lone
 *     `?utm_…`);
 *  6. strip a single trailing `/` at the very end of the URL.
 */
object UrlOps {

  private val MaxLen = lit(1 << 24)

  /** Rules 1–6 above, applied in order. */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val auth = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(auth), noFrag.substr(length(auth) + 1, MaxLen))
    val noWww = regexp_replace(lowered, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    val noPort = regexp_replace(noWww,
      "^([a-z]+://[^/:?#]+):(?:80|443)([/?#]|$)", "$1$2")
    val utm1 = regexp_replace(noPort, "&utm_[^&#]*", "")
    val utm2 = regexp_replace(utm1, "\\?utm_[^&#]*&", "?")
    val utm3 = regexp_replace(utm2, "\\?utm_[^&#]*$", "")
    regexp_replace(utm3, "/$", "")
  }

  /** Hostname of a normalized URL — port (if any) excluded. */
  def hostOf(normUrl: Column): Column =
    regexp_extract(normUrl, "^[a-z]+://([^/:?#]+)", 1)

  /** Registered (pay-level) domain: the public-suffix rule collapsed to
    * the suffix list the caller provides — a host under a TWO-label
    * suffix (`co.uk`-style) keeps its last three labels, anything else
    * its last two. The list is tiny and ships as literals into the
    * expression (broadcast-free); a production run swaps in the full
    * public-suffix snapshot the same way. */
  def registeredDomainOf(host: Column, twoLabelSuffixes: Seq[String]): Column = {
    require(twoLabelSuffixes.nonEmpty, "suffix list must not be empty")
    val isTwoLabel = twoLabelSuffixes
      .map(sfx => host.endsWith("." + sfx)).reduce(_ || _)
    when(isTwoLabel, regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .otherwise(regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
  }
}
