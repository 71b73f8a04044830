package graft

import graft.sources.StackExchange

class StackExchangeSpec extends SparkSpec {

  test("parseRow: XML attribute decode inverts the double encoding " +
      "(Body arrives as HTML), attribute order free") {
    val a = StackExchange.parseRow(
      """<row Body="&lt;p&gt;x &amp;amp; y&lt;/p&gt;" Id="3" """ +
        """Title="A &quot;B&quot;&#xA;C" />""")
    assert(a("Id") == "3")
    assert(a("Body") == "<p>x &amp; y</p>")
    assert(a("Title") == "A \"B\"\nC")
  }

  test("parseRow: non-row elements, malformed XML, and DOCTYPE (XXE " +
      "kill switch) err NAMED") {
    for (bad <- Seq("<post Id=\"1\" />", "<row Id=\"1\"",
        "<!DOCTYPE posts [<!ENTITY x SYSTEM \"file:///etc/passwd\">]>" +
          "<row Id=\"&x;\" />")) {
      val e = intercept[IllegalArgumentException] {
        StackExchange.parseRow(bad)
      }
      assert(e.getMessage.startsWith("STACKEXCHANGE:"))
    }
  }

  test("parseTags: both live shapes and edge cases") {
    assert(StackExchange.parseTags("<python><pandas>") ==
      Seq("python", "pandas"))
    assert(StackExchange.parseTags("|python|pandas|") ==
      Seq("python", "pandas"))
    assert(StackExchange.parseTags("<one>") == Seq("one"))
    assert(StackExchange.parseTags(null) == Seq.empty)
    assert(StackExchange.parseTags("") == Seq.empty)
  }

  test("posts(): dump file reads row-per-line, header/footer skipped, " +
      "malformed rows quarantine per-ROW with the named error") {
    val dir = tmpDir()
    val xml = StackExchange.buildPostsXml(Seq(
      Map("Id" -> "1", "PostTypeId" -> "1", "Score" -> "5",
        "Title" -> "Q?", "Body" -> "<p>body</p>",
        "Tags" -> "<a><b>"))) +
      "  <row Id=\"7\" PostTypeId=\"2\" ParentId=\"1\" unterminated\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "Posts.xml"),
      xml.getBytes("UTF-8"))
    val rows = StackExchange.posts(spark, s"$dir/Posts.xml").collect()
    assert(rows.length == 2)
    val good = rows.find(_.getAs[String]("se_error") == null).get
    assert(good.getAs[Long]("id") == 1L &&
      good.getAs[String]("body_html") == "<p>body</p>" &&
      good.getAs[scala.collection.Seq[String]]("tags").toSeq ==
        Seq("a", "b"))
    val bad = rows.find(_.getAs[String]("se_error") != null).get
    assert(bad.getAs[String]("se_error").startsWith("STACKEXCHANGE:"))
  }

  test("qaPairs: keyed join + per-question rank — accepted answer " +
      "outranks a higher-scored one, bodies flatten to text, " +
      "questions without answers drop") {
    import spark.implicits._
    val posts = Seq(
      // question 10: accepted answer 21 (score 1) vs answer 22 (score 9)
      (10L, 1L, null: java.lang.Long, 21L: java.lang.Long, 3L, "Q10",
        "<p>how?</p>", Seq("t"), null: String),
      (21L, 2L, 10L: java.lang.Long, null: java.lang.Long, 1L,
        null: String, "<p>acc</p>", Seq.empty[String], null: String),
      (22L, 2L, 10L: java.lang.Long, null: java.lang.Long, 9L,
        null: String, "<p>top</p>", Seq.empty[String], null: String),
      // question 11: no answers
      (11L, 1L, null: java.lang.Long, null: java.lang.Long, 0L, "Q11",
        "<p>alone</p>", Seq.empty[String], null: String))
      .toDF("id", "post_type_id", "parent_id", "accepted_answer_id",
        "score", "title", "body_html", "tags", "se_error")
    val qa = StackExchange.qaPairs(posts)
      .orderBy("question_id", "answer_rank").collect()
      .map(r => (r.getLong(0), r.getString(3), r.getString(4),
        r.getLong(5), r.getBoolean(6), r.getInt(7)))
    assert(qa.toSeq == Seq(
      (10L, "how?", "acc", 1L, true, 1),
      (10L, "how?", "top", 9L, false, 2)))
  }
}
