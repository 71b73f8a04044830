package graft

import graft.sources.Wiki

/**
 * MediaWiki dump ingestion + wikitext extraction: the strip chain
 * (templates/tables/links/refs/comments/quotes/headings/lists/
 * entities), the StAX page parse with named errors, brace-bomb and
 * nesting caps, and the splittable `</page>`-delimited Spark surface
 * over plain and bzip2 dumps.
 */
class WikiSpec extends SparkSpec {

  test("wikitext strip chain: every markup form unwraps or drops to " +
      "exactly the display text") {
    val w =
      """== Heading ==
        |<!-- hidden -->
        |{| class="wikitable"
        ||-
        || a || b
        ||}
        |Body with {{tmpl|x={{inner}}}}glued and [[Target|label]] and [[Plain link]].<ref name="n">cite</ref>
        |''italic'' '''bold''' '''''both''''' [http://e.test ext label] [http://bare.test]
        |[[File:x.png|thumb|caption with [[Nested|link]]]]
        |[[Category:Stuff]]
        |* item one
        |# item two
        |----
        |M&uuml;ller &amp; S&oslash;n &#8212; &#x41; &unknown;
        |""".stripMargin
    assert(Wiki.extractWikitext(w) == Seq(
      "Heading",
      "Body with glued and label and Plain link.",
      "italic bold both ext label",
      "item one",
      "item two",
      "Müller & Søn — A &unknown;").mkString("\n"))
  }

  test("wikitext edges: {{{params}}}, visible-category escape, pipe " +
      "inside nested link, <references/> survives to the tag strip, " +
      "nowiki unwraps") {
    assert(Wiki.extractWikitext("a {{{param|default}}} b") == "a  b")
    assert(Wiki.extractWikitext("[[:Category:Music]]") ==
      "Category:Music")
    assert(Wiki.extractWikitext("see [[a|x [[b|y]] z]]") ==
      "see x y z")
    assert(Wiki.extractWikitext("end<references/>") == "end")
    assert(Wiki.extractWikitext("<nowiki>kept **raw**</nowiki>") ==
      "kept **raw**")
    // unterminated structures drop the remainder, never hang
    assert(Wiki.extractWikitext("pre {{never closed") == "pre")
    assert(Wiki.extractWikitext("pre [[never closed") == "pre")
    assert(Wiki.extractWikitext("pre <!-- never closed") == "pre")
  }

  test("brace bomb errs NAMED at the nesting cap; a deep-but-legal " +
      "page stays linear") {
    val bomb = "{{" * 200 + "x" + "}}" * 200
    val e = intercept[IllegalArgumentException](
      Wiki.extractWikitext(bomb))
    assert(e.getMessage.contains("nesting"))
    // 90-deep is under the cap and must resolve to empty, fast
    val legal = "{{" * 90 + "x" + "}}" * 90
    assert(Wiki.extractWikitext(legal) == "")
    // link-label recursion past its cap degrades to raw, no overflow
    val deepLinks = "[[a|" * 40 + "x" + "]]" * 40
    assert(Wiki.extractWikitext(deepLinks).contains("x"))
  }

  test("page parse: title/ns/redirect/text round-trip; missing " +
      "title and bad ns err NAMED; XML escapes decode") {
    val p = Wiki.parsePage(Wiki.buildPage(
      "A & B", 0, "body <text> & more"))
    assert(p == Wiki.Page("A & B", 0, None, "body <text> & more"))
    val r = Wiki.parsePage(Wiki.buildPage(
      "Gamma", 0, "#REDIRECT [[Alpha]]", redirect = Some("Alpha")))
    assert(r.redirect.contains("Alpha"))
    val e1 = intercept[IllegalArgumentException](Wiki.parsePage(
      "<page><ns>0</ns><revision><text>t</text></revision></page>"))
    assert(e1.getMessage.contains("title"))
    val e2 = intercept[IllegalArgumentException](Wiki.parsePage(
      "<page><title>T</title><ns>zero</ns></page>"))
    assert(e2.getMessage.contains("ns"))
    val e3 = intercept[IllegalArgumentException](Wiki.parsePage(
      "<page><title>T</title><ns>0"))
    assert(e3.getMessage.contains("malformed"))
  }

  private def writeDump(dir: String, name: String, dump: String,
                        bz2: Boolean = false): String = {
    val path = java.nio.file.Paths.get(dir, name)
    if (!bz2)
      java.nio.file.Files.write(path, dump.getBytes("UTF-8"))
    else {
      val codec = new org.apache.hadoop.io.compress.BZip2Codec()
      codec.setConf(spark.sparkContext.hadoopConfiguration)
      val os = codec.createOutputStream(
        new java.io.FileOutputStream(path.toFile))
      os.write(dump.getBytes("UTF-8")); os.close()
    }
    path.toString
  }

  test("dump surface: siteinfo header skipped, redirects and " +
      "namespaces surfaced, malformed pages quarantined per-ROW, " +
      "plain and bz2 dumps read identically") {
    val dir = tmpDir()
    val dump = Wiki.buildDump(Seq(
      Wiki.buildPage("Alpha", 0, "== H ==\nalpha '''body'''"),
      Wiki.buildPage("Talk:Beta", 1, "talk body"),
      Wiki.buildPage("Gamma", 0, "#REDIRECT [[Alpha]]",
        redirect = Some("Alpha")),
      // malformed: unbalanced element inside the page
      "  <page>\n    <title>Delta</title>\n    <ns>0</ns>\n" +
        "    <revision><text>broken\n  </page>\n",
      Wiki.buildPage("Edge", 0, "edge body")))
    val xml = writeDump(dir, "dump.xml", dump)
    val bz2 = writeDump(dir, "dump.xml.bz2", dump, bz2 = true)
    for (path <- Seq(xml, bz2)) {
      val rows = Wiki.pages(spark, path).collect()
      assert(rows.length == 5, s"$path")
      val byTitle = rows.filter(_.getString(0) != null)
        .map(r => r.getString(0) ->
          ((r.getInt(1), r.getString(2)))).toMap
      assert(byTitle("Alpha") == ((0, null)))
      assert(byTitle("Talk:Beta") == ((1, null)))
      assert(byTitle("Gamma") == ((0, "Alpha")))
      val bad = rows.filter(_.getString(0) == null)
      assert(bad.length == 1 && bad(0).getString(4) != null,
        "malformed page must quarantine with a named error")
      val docs = Wiki.documents(spark, path).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(docs == Set(("Alpha", "H\nalpha body"),
        ("Edge", "edge body")),
        "ns filter + redirect skip + extraction")
    }
  }

  test("dump splitting survives many pages across input splits") {
    val dir = tmpDir()
    val n = 300
    val dump = Wiki.buildDump((0 until n).map(i =>
      Wiki.buildPage(s"Page $i", 0,
        s"document number $i " + ("word " * 40))))
    val path = writeDump(dir, "big.xml", dump)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      val titles = Wiki.pages(spark, path)
        .where("wiki_error IS NULL").select("title")
        .collect().map(_.getString(0)).sorted
      assert(titles.length == n)
      assert(titles.toSet == (0 until n).map(i => s"Page $i").toSet)
    } finally
      spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
