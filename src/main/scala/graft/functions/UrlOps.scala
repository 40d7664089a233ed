package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Relational URL canonicalization for web-corpus curation — the
  * normalization step upstream of exact/near dedup in any crawl-derived
  * training-data pipeline (beyond the reference, which ingests curated
  * catalogues; a 100 TB crawl corpus dedups by canonical URL before
  * content hashing).
  *
  * Everything is built from codegen string primitives (regexp_extract /
  * split / filter / array_sort) — no UDF, whole-stage codegen, scan
  * speed. The canonical form:
  *   - scheme and host lowercased, a leading `www.` stripped;
  *   - default ports dropped (http:80, https:443), explicit others kept;
  *   - duplicate slashes in the path collapsed, trailing slash stripped,
  *     empty path → "/";
  *   - query parameters with tracking names dropped (`utm_*`, fbclid,
  *     gclid, msclkid), the rest sorted for order-insensitivity; an empty
  *     residue drops the `?`;
  *   - the fragment always dropped.
  */
object UrlOps {

  /** Anchored URL splitter: scheme://host[:port][path][?query][#fragment].
    * regexp_extract returns "" for absent optional groups and for
    * non-URL input (no match) — callers gate on nonEmpty scheme/host.
    */
  val UrlRegex: String =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(?::(\\d+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  def scheme(url: Column): Column = lower(regexp_extract(url, UrlRegex, 1))

  /** Lowercased host with a leading `www.` stripped. */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, UrlRegex, 2)), "^www\\.", "")

  /** The explicit port digits, "" when absent. */
  def port(url: Column): Column = regexp_extract(url, UrlRegex, 3)

  def rawPath(url: Column): Column = regexp_extract(url, UrlRegex, 4)

  def rawQuery(url: Column): Column = regexp_extract(url, UrlRegex, 5)

  /** `:port` unless absent or the scheme default. */
  def portPart(url: Column): Column = {
    val p = port(url)
    val s = scheme(url)
    when(
      p === "" || (s === "http" && p === "80") || (s === "https" && p === "443"),
      lit("")
    ).otherwise(concat(lit(":"), p))
  }

  /** Duplicate slashes collapsed, trailing slash stripped, "" → "/". */
  def normalizedPath(url: Column): Column = {
    val collapsed =
      regexp_replace(regexp_replace(rawPath(url), "/{2,}", "/"), "/$", "")
    when(collapsed === "", lit("/")).otherwise(collapsed)
  }

  private val TrackingExact = Seq("fbclid", "gclid", "msclkid")

  /** Tracking params dropped, the rest sorted; "" when nothing is left. */
  def canonicalQuery(url: Column): Column = {
    val kept = filter(
      split(rawQuery(url), "&"),
      p => {
        val name = element_at(split(p, "="), 1)
        p =!= "" && !name.startsWith("utm_") &&
        !TrackingExact.map(t => name === t).reduce(_ || _)
      })
    array_join(array_sort(kept), "&")
  }

  /** The full canonical form; NULL for input the splitter rejects
    * (no scheme://host), so malformed rows are visible, not silently
    * passed through.
    */
  def canonicalize(url: Column): Column = {
    val q = canonicalQuery(url)
    when(
      scheme(url) === "" || host(url) === "",
      lit(null).cast("string")
    ).otherwise(
      concat(
        scheme(url), lit("://"), host(url), portPart(url), normalizedPath(url),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }
}
