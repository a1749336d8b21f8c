package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class StripHtmlSpec extends SparkSpec {
  import spark.implicits._

  def clean(s: String): String =
    Seq(s).toDF("t").select(TextOps.stripHtml(col("t")).as("c"))
      .collect().head.getString(0)

  test("tags stripped, text kept") {
    assert(clean("<p>hello <b>world</b></p>") === "hello world")
  }

  test("script and style elements drop WITH their payload") {
    assert(clean("a<script type=\"x\">var y = 1;</script>b") === "a b")
    assert(clean("a<style>.c { color: red }</style>b") === "a b")
  }

  test("the five XML entities decode, &amp; last") {
    assert(clean("&lt;tag&gt; &quot;q&quot; &#39;s&#39; a &amp; b")
      === "<tag> \"q\" 's' a & b")
    // &amp;lt; must yield the LITERAL &lt; (not <)
    assert(clean("x &amp;lt; y") === "x &lt; y")
  }

  test("whitespace runs collapse and ends trim") {
    assert(clean("  a\n\n\tb   c  ") === "a b c")
  }

  test("already-clean prose is a fixpoint") {
    assert(clean("plain words stay put") === "plain words stay put")
  }
}
