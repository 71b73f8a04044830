package graft

import graft.functions.Robots

/** robots.txt parsing + verdict semantics (RFC 9309 subset documented
  * on the object): group formation, comment stripping, specific-group
  * precedence, longest-match with allow tie-break, wildcard-prefix
  * boundary, and the no-rules/no-robots defaults. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val bodyA =
    """User-agent: *
      |Disallow: /private
      |Allow: /private/ok  # curated subtree
      |
      |User-agent: special
      |Disallow: /only-special
      |""".stripMargin

  private def ruleTable = Robots.rules(
    Seq(("a.com", bodyA)).toDF("domain", "body"), "domain", "body")

  test("rules: groups, comments, and priorities parse per the RFC") {
    val rows = ruleTable
      .select("domain", "agent", "allow", "prefix", "priority")
      .as[(String, String, Boolean, String, Int)].collect().toSet
    assert(rows == Set(
      ("a.com", "*", false, "/private", 8),
      ("a.com", "*", true, "/private/ok", 11),
      ("a.com", "special", false, "/only-special", 13)))
  }

  test("verdict: longest match wins, allow breaks ties, default allow") {
    val urls = Seq(
      (1L, "a.com", "/private/ok/page"), // allow (11) beats disallow (8)
      (2L, "a.com", "/private/no"),      // disallow /private
      (3L, "a.com", "/public"),          // no match -> allowed
      (4L, "nosuch.com", "/x")           // no robots -> allowed
    ).toDF("id", "domain", "path")
    val out = Robots.verdict(urls, ruleTable, "anybot", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }

  test("verdict: an agent with its own group ignores the * group") {
    val urls = Seq((1L, "a.com", "/private/no"),
      (2L, "a.com", "/only-special/x")).toDF("id", "domain", "path")
    val out = Robots.verdict(urls, ruleTable, "SPECIAL",
        "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    // /private rules live in the * group — invisible to 'special'
    assert(out == Map(1L -> true, 2L -> false))
  }

  test("wildcard and end-anchor rules match per the RFC") {
    val rt = Robots.rules(
      Seq(("b.com", "User-agent: *\nDisallow: /tmp*\nDisallow: /x$\n" +
        "Disallow: /dl/*.zip\nAllow: /dl/free\n"))
        .toDF("domain", "body"), "domain", "body")
    val urls = Seq(
      (1L, "b.com", "/tmpanything"),   // /tmp* matches mid-run
      (2L, "b.com", "/x"),             // /x$ matches the exact path
      (3L, "b.com", "/xy"),            // ...but not a longer one
      (4L, "b.com", "/dl/a.zip"),      // /dl/*.zip (wildcard, len 9)
      (5L, "b.com", "/dl/readme.txt"), // no rule matches
      (6L, "b.com", "/dl/free/a.zip")  // disallow (9) beats allow (8)
    ).toDF("id", "domain", "path")
    val out = Robots.verdict(urls, rt, "anybot", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> true,
      4L -> false, 5L -> true, 6L -> false))
  }

  test("empty Disallow is the RFC allow-all, and still shades *") {
    // the canonical permissive robots.txt must not block the domain
    val rt = Robots.rules(Seq(
      ("open.com", "User-agent: *\nDisallow:\n"),
      ("shade.com", "User-agent: *\nDisallow: /\n" +
        "\nUser-agent: nice\nDisallow:\n"))
      .toDF("domain", "body"), "domain", "body")
    val urls = Seq((1L, "open.com", "/anything"),
      (2L, "shade.com", "/anything")).toDF("id", "domain", "path")
    val out = Robots.verdict(urls, rt, "nice", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    // open.com: allow-all; shade.com: nice's own (empty) group shades
    // the * group's Disallow / — both allowed
    assert(out == Map(1L -> true, 2L -> true))
    val star = Robots.verdict(urls, rt, "otherbot", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(star == Map(1L -> true, 2L -> false))
  }

  test("tab whitespace and mid-rule '$' parse per the RFC") {
    val rt = Robots.rules(Seq(
      ("t.com", "User-agent:\tspecial\nDisallow:\t/private\n" +
        "Disallow: /price$usd\n")).toDF("domain", "body"),
      "domain", "body")
    val urls = Seq(
      (1L, "t.com", "/private/x"), // tabbed agent + tabbed path rule
      (2L, "t.com", "/price$usd"), // mid-$ is literal, matches exactly
      (3L, "t.com", "/pricelist")  // must NOT be caught by a truncated
    ).toDF("id", "domain", "path") // '/price' prefix
    val out = Robots.verdict(urls, rt, "special", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("null domain/path rows surface with default-allow, not dropped") {
    val urls = Seq((1L, "a.com", "/private/no"),
      (2L, null, "/x"), (3L, "a.com", null))
      .toDF("id", "domain", "path")
    val out = Robots.verdict(urls, ruleTable, "anybot", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("CRLF bodies and a leading BOM parse identically to LF bodies") {
    // the common wire form: UTF-8 BOM + CRLF line endings. Every value
    // must come out \r-free or agent names and prefixes silently match
    // nothing (default-allow for paths the site disallowed).
    val crlf = "\uFEFFUser-agent: graftbot\r\nDisallow: /private\r\n" +
      "Allow: /private/ok\r\n"
    val rt = Robots.rules(Seq(("c.com", crlf)).toDF("domain", "body"),
      "domain", "body")
    val rows = rt.select("agent", "allow", "prefix", "priority")
      .as[(String, Boolean, String, Int)].collect().toSet
    assert(rows == Set(("graftbot", false, "/private", 8),
      ("graftbot", true, "/private/ok", 11)))
    val urls = Seq((1L, "c.com", "/private/no"),
      (2L, "c.com", "/private/ok/x")).toDF("id", "domain", "path")
    val out = Robots.verdict(urls, rt, "GraftBot", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true))
  }

  test("non-rule records neither split a group nor erase it (RFC 2.2.4)") {
    val body = "User-agent: a\nCrawl-delay: 10\nUser-agent: b\n" +
      "Disallow: /x\n\nUser-agent: *\nDisallow: /\n\n" +
      "User-agent: quiet\nCrawl-delay: 5\n"
    val rt = Robots.rules(Seq(("d.com", body)).toDF("domain", "body"),
      "domain", "body")
    val urls = Seq((1L, "d.com", "/x"), (2L, "d.com", "/y"))
      .toDF("id", "domain", "path")
    // the crawl-delay between the two user-agent lines must not orphan
    // agent b's rules: a and b share one group
    val outA = Robots.verdict(urls, rt, "a", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(outA == Map(1L -> false, 2L -> true))
    // quiet's group has no allow/disallow lines: its own (empty =
    // allow-all) group still wins over the '*' Disallow-/ group
    val outQ = Robots.verdict(urls, rt, "quiet", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(outQ == Map(1L -> true, 2L -> true))
    // an unnamed agent still gets the '*' group
    val outS = Robots.verdict(urls, rt, "other", "domain", "path")
      .select("id", "robots_allowed").as[(Long, Boolean)].collect().toMap
    assert(outS == Map(1L -> false, 2L -> false))
  }

  test("crawlDelays: agent shades *, fallback, invalid, min, CRLF") {
    val robots = Seq(
      // agent's own delay shades the '*' one
      ("a.com", "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n\n" +
        "User-agent: graftbot\nCrawl-delay: 2.5\n"),
      // no agent group -> '*' fallback
      ("b.com", "User-agent: *\nCrawl-delay: 5\n"),
      // unparsable agent delay -> falls back; no '*' here -> absent
      ("c.com", "User-agent: graftbot\nCrawl-delay: oops\n"),
      // several delays in one group -> minimum; delay AFTER rules
      // still belongs to the group
      ("d.com", "User-agent: graftbot\nDisallow: /q\n" +
        "Crawl-delay: 7\nCrawl-delay: 3\n"),
      // CRLF body parses identically
      ("e.com", "User-agent: graftbot\r\nCrawl-delay: 4\r\n"),
      // delay before any user-agent line attaches to no group
      ("f.com", "Crawl-delay: 9\nUser-agent: graftbot\nDisallow: /z\n"),
      // hostile values: a negative delay must NOT win minimum-wins
      // (negative fetch offsets = a burst), NaN must not poison it,
      // and "Infinity" (which try_cast parses!) must not make the
      // domain unschedulable via 0 x Inf = NaN offsets
      ("g.com", "User-agent: graftbot\nCrawl-delay: -100\n" +
        "Crawl-delay: NaN\nCrawl-delay: Infinity\nCrawl-delay: 6\n"))
      .toDF("domain", "body")
    val out = Robots.crawlDelays(robots, "domain", "body", "GraftBot")
      .as[(String, Double)].collect().toMap
    assert(out == Map("a.com" -> 2.5, "b.com" -> 5.0, "d.com" -> 3.0,
      "e.com" -> 4.0, "g.com" -> 6.0))
  }

  test("sitemaps: domain-global, case-preserved, deduped") {
    val robots = Seq(
      ("a.com", "Sitemap: https://a.com/sm1.xml\nUser-agent: *\n" +
        "Disallow: /x\nSitemap: https://a.com/sm2.xml\n"),
      ("b.com", "User-agent: *\nDisallow: /\n"),
      ("d.com", "Sitemap: https://d.com/SM.xml\n" +
        "Sitemap: https://d.com/SM.xml\n"))
      .toDF("domain", "body")
    val out = Robots.sitemaps(robots, "domain", "body")
      .as[(String, String)].collect().toSet
    assert(out == Set(("a.com", "https://a.com/sm1.xml"),
      ("a.com", "https://a.com/sm2.xml"),
      ("d.com", "https://d.com/SM.xml")))
  }

  test("scheduleFrontier: per-domain slots, default delay, guards") {
    val urls = Seq(("a.com", "https://a.com/1"),
      ("a.com", "https://a.com/2"), ("a.com", "https://a.com/3"),
      ("z.com", "https://z.com/1")).toDF("domain", "url")
    val delays = Seq(("a.com", 2.0)).toDF("domain", "crawl_delay")
    val out = Robots.scheduleFrontier(urls, delays, "domain", "url")
      .select("domain", "fetch_seq", "fetch_offset_s")
      .as[(String, Int, Double)].collect()
    // a.com: three slots at 0/2/4s in SOME deterministic order;
    // z.com: one slot at 0 under the 1s default
    assert(out.filter(_._1 == "a.com").map(r => (r._2, r._3)).toSet ==
      Set((0, 0.0), (1, 2.0), (2, 4.0)))
    assert(out.filter(_._1 == "z.com").toSeq ==
      Seq(("z.com", 0, 0.0)))
    // determinism across partitionings
    val again = Robots.scheduleFrontier(urls.repartition(7),
        delays, "domain", "url")
      .select("url", "fetch_seq").as[(String, Int)].collect().toMap
    val first = Robots.scheduleFrontier(urls, delays, "domain", "url")
      .select("url", "fetch_seq").as[(String, Int)].collect().toMap
    assert(again == first)
    intercept[IllegalArgumentException] {
      Robots.scheduleFrontier(
        urls.withColumn("fetch_seq",
          org.apache.spark.sql.functions.lit(1)),
        delays, "domain", "url")
    }
  }

  test("duplicate url rows keep their multiplicity through the verdict") {
    val urls = Seq((1L, "a.com", "/public"), (2L, "a.com", "/public"))
      .toDF("id", "domain", "path")
    val out = Robots.verdict(urls, ruleTable, "anybot", "domain", "path")
    assert(out.count() == 2)
  }
}
