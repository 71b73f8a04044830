package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for crawl pipelines: host/domain/path
 * extraction and tracking-parameter stripping — the key-preparation
 * step before URL-level dedup, per-domain caps ([[graft.operators
 * .Sampling.capPerGroup]]) and robots/blocklist joins. Pure codegen'd
 * regexp expressions (RE2-portable — no lookahead, no backreferences
 * in patterns), zero shuffle; the reference has no string surface at
 * all (SURVEY §2.8).
 *
 * Scope, explicitly: syntactic canonicalization (case of host,
 * fragment, tracking params, default ports). Public-suffix-list
 * domain extraction ([[urlDomain]] is a last-two-labels heuristic —
 * wrong for co.uk-style suffixes), IDN/punycode, and percent-encoding
 * normalization are documented boundaries.
 */
object Urls {

  private val schemeAuth = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"

  /** Lowercased host of an absolute URL: authority minus userinfo and
    * port; empty string when the input has no scheme://authority. */
  def urlHost(u: Column): Column =
    lower(regexp_replace(regexp_replace(
      regexp_extract(u, schemeAuth, 1), "^[^@]*@", ""), ":[0-9]*$", ""))

  /** Last-two-labels registrable-domain heuristic over [[urlHost]]
    * (`a.b.example.com` → `example.com`); the full answer needs the
    * public-suffix list — documented boundary. */
  def urlDomain(u: Column): Column =
    regexp_extract(urlHost(u), "([^.]+\\.[^.]+)$", 1)

  /** Path component (leading `/...`), empty for bare-host URLs. */
  def urlPath(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Tracking parameters every crawl canonicalizer drops. */
  private val trackingParam =
    "(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref_src)"

  /**
   * Canonicalize for URL-level dedup: drop the fragment, strip
   * tracking parameters wherever they sit in the query string (the
   * `?`/`&` seams are repaired, so a leading tracking param doesn't
   * orphan the rest), drop an emptied `?`, strip default ports
   * (:80/:443), and lowercase scheme + authority (path/query case is
   * preserved — it is significant on most servers).
   */
  def urlCanonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
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
