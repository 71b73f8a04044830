package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for crawl pipelines: host/domain/path
 * extraction, tracking-parameter stripping, percent-encoding
 * normalization and public-suffix-list domain extraction — the
 * key-preparation step before URL-level dedup, per-domain caps
 * ([[graft.operators.Sampling.capPerGroup]]) and robots/blocklist
 * joins. Codegen'd regexp expressions (RE2-portable — no lookahead,
 * no backreferences in patterns) plus single-pass native expressions
 * where no portable SQL form exists
 * ([[graft.plans.PctNormalizeExpr]],
 * [[graft.plans.RegistrableDomainExpr]],
 * [[graft.plans.IdnHostExpr]] — IDN/punycode via the JDK's RFC 3490
 * codec); zero shuffle throughout.
 * The reference has no string surface at all (SURVEY §2.8).
 */
object Urls {

  private val schemeAuth = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"

  /** Lowercased host of an absolute URL: authority minus userinfo and
    * port; empty string when the input has no scheme://authority. */
  def urlHost(u: Column): Column =
    lower(regexp_replace(regexp_replace(
      regexp_extract(u, schemeAuth, 1), "^[^@]*@", ""), ":[0-9]*$", ""))

  /** Last-two-labels registrable-domain heuristic over [[urlHost]]
    * (`a.b.example.com` → `example.com`) — kept as the dependency-free
    * SQL-replayable form, but WRONG for multi-label public suffixes
    * (`co.uk`, `com.au`): use `urlDomain(u, psl = true)` for dedup /
    * per-domain-cap keys on real crawl data. */
  def urlDomain(u: Column): Column =
    regexp_extract(urlHost(u), "([^.]+\\.[^.]+)$", 1)

  /** Registrable domain over [[urlHost]]. `psl = true` matches against
    * the public-suffix-list snapshot (longest prevailing rule,
    * wildcards, exceptions — [[graft.plans.PublicSuffixes]]), so
    * `shop.example.co.uk` keys as `example.co.uk`, not `co.uk`;
    * `psl = false` is the last-two-labels heuristic. */
  def urlDomain(u: Column, psl: Boolean): Column =
    if (psl) graft.plans.NativeFunctions.registrableDomainNative(urlHost(u))
    else urlDomain(u)

  /** RFC 3986 percent-encoding normalization: decode `%XX` escapes of
    * UNRESERVED characters (`%41` ≡ `A` — the same URL must dedup
    * together), uppercase the hex of every other escape (`%2f` →
    * `%2F`), pass malformed escapes through verbatim. Safe on a full
    * URL: decoding the unreserved set can never create a delimiter. */
  def urlPctNormalize(u: Column): Column =
    graft.plans.NativeFunctions.pctNormalizeNative(u)

  /** IDN-normalized host: `xn--` ACE labels decoded to their Unicode
    * form (`ascii = false`, default — the human-readable dedup key) or
    * non-ASCII labels encoded to ACE (`ascii = true` — the
    * on-the-wire crawl form), lowercased either way; hosts the codec
    * rejects pass through lowercased-verbatim
    * ([[graft.plans.IdnHostExpr]]). Compose over [[urlHost]] for
    * URL-level dedup keys: `xn--mnchen-3ya.de` and `münchen.de` are
    * the same site and must key together. */
  def urlIdnHost(u: Column, ascii: Boolean = false): Column =
    graft.plans.NativeFunctions.idnHostNative(urlHost(u), ascii)

  /** Path component (leading `/...`), empty for bare-host URLs. */
  def urlPath(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Tracking parameters every crawl canonicalizer drops. */
  private val trackingParam =
    "(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref_src)"

  /**
   * Canonicalize for URL-level dedup: normalize percent-encoding
   * ([[urlPctNormalize]] — decode unreserved escapes, uppercase the
   * rest), drop the fragment, strip tracking parameters wherever they
   * sit in the query string (the `?`/`&` seams are repaired, so a
   * leading tracking param doesn't orphan the rest), drop an emptied
   * `?`, strip default ports (:80/:443), and lowercase scheme +
   * authority (path/query case is preserved — it is significant on
   * most servers). Percent-normalization runs FIRST: decoded
   * unreserved characters can never form a delimiter, so the later
   * regex passes see the canonical spelling.
   */
  def urlCanonicalize(u: Column): Column = {
    val noFrag = regexp_replace(urlPctNormalize(u), "#.*", "")
    // each tracking param is replaced by its own leading separator;
    // the seam passes then collapse '?&&' runs and drop emptied
    // query strings — so a LEADING tracking param can't orphan the
    // rest of the query behind a bare '&'
    val noTrack = regexp_replace(noFrag,
      s"([?&])$trackingParam=[^&]*", "$1")
    val seam = regexp_replace(regexp_replace(regexp_replace(noTrack,
      "\\?&+", "?"), "&&+", "&"), "[?&]+$", "")
    // optional userinfo before the host — it may itself contain ':'
    val noPort = regexp_replace(seam,
      "^([A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?[^/:?#]*):(?:80|443)([/?#]|$)",
      "$1$2")
    // lowercase scheme://authority, leave path/query untouched
    val prefix = regexp_extract(noPort,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    concat(lower(prefix), noPort.substr(length(prefix) + 1, lit(1 << 30)))
  }
}
