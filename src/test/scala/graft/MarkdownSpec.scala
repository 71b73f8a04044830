package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/**
 * Markdown → text: the codegen'd chain strips the CommonMark-core
 * syntax docs corpora carry (headers, emphasis, links/images, lists,
 * quotes, fences, breaks) while keeping display text — including code
 * content, which IS text in a documentation corpus.
 */
class MarkdownSpec extends SparkSpec {
  import spark.implicits._

  private def x(md: String): String =
    Seq(md).toDF("md")
      .select(TextAnalysis.extractMarkdownText(col("md")).as("t"))
      .collect()(0).getString(0)

  test("headers, emphasis, links, images, lists, quotes unwrap") {
    assert(x("# Title\n\nsome **bold** and *ital* and __strong__ text")
      == "Title\nsome bold and ital and strong text")
    assert(x("see [the docs](http://x.test/d) and ![a chart](img.png)")
      == "see the docs and a chart")
    assert(x("- item one\n- item two\n1. numbered\n> quoted line")
      == "item one\nitem two\nnumbered\nquoted line")
  }

  test("fenced code keeps content, fences and info strings drop; " +
      "setext underlines and thematic breaks drop as lines") {
    assert(x("intro\n\n```scala\nval x = 1\n```\n\noutro")
      == "intro\nval x = 1\noutro")
    assert(x("Title\n=====\nbody\n\n---\n\nmore") == "Title\nbody\nmore")
  }

  test("inline code spans keep content; snake_case inside a word is " +
      "safe because emphasis requires a same-line closing marker") {
    assert(x("run `make test` then stop") == "run make test then stop")
    assert(x("the var snake_case stays\nand other_name too")
      == "the var snake_case stays\nand other_name too")
  }

  test("paragraph breaks collapse to single newlines; ends trim") {
    assert(x("\n\na\n\n\n\nb\n\n") == "a\nb")
  }
}
