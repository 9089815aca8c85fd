package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlFunctions.canonicalizeUrl(col("url"))).as[String]
      .collect().toSeq

  test("canonicalizeUrl: case folds, drops default port / fragment / tracking, sorts params") {
    assert(canon("HTTP://Www.Ex.COM:80/a/b?utm_source=f&z=2&a=1#sec") ==
      Seq("http://www.ex.com/a/b?a=1&z=2"))
    // explicit non-default port stays; duplicate keys sort, not collapse
    assert(canon("https://cdn.ex.net:8443/X%20y?a=1&a=0") ==
      Seq("https://cdn.ex.net:8443/X%20y?a=0&a=1"))
    // empty path -> '/'; https default port drops
    assert(canon("https://EX.com:443") == Seq("https://ex.com/"))
    // all params tracking -> no '?' at all
    assert(canon("http://ex.com/p?utm_a=1&ref=x&gclid=9") ==
      Seq("http://ex.com/p"))
    // case-sensitive param policy: UTM_X is NOT utm_* as emitted by trackers
    assert(canon("https://ex.com/a?ref=tw&UTM_X=1&z=9") ==
      Seq("https://ex.com/a?UTM_X=1&z=9"))
    // http on 443 is non-default for http: port stays
    assert(canon("http://ex.com:443/a") == Seq("http://ex.com:443/a"))
    // fragment-only suffix drops, '?#' yields no query
    assert(canon("https://ex.com/a#frag", "https://ex.com/a?#f") ==
      Seq("https://ex.com/a", "https://ex.com/a"))
  }

  test("urlHost / urlScheme: port stripped, case folded, scheme-less degrades to ''-scheme") {
    val row = Seq("HTTPS://A.B.C:8080/x?q=1").toDF("url")
      .select(UrlFunctions.urlHost(col("url")),
        UrlFunctions.urlScheme(col("url")))
      .as[(String, String)].collect().head
    assert(row == (("a.b.c", "https")))
    // scheme-less input: documented invalid shape, must not throw
    val bad = Seq("no-scheme/just/path").toDF("url")
      .select(UrlFunctions.urlScheme(col("url"))).as[String].collect().head
    assert(bad == "")
  }
}
