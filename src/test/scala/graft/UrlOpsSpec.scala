package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalize($"url")).as[String].collect().toSeq

  private def regDomain(hosts: String*): Seq[String] =
    hosts.toDF("h").select(UrlOps.registeredDomain($"h")).as[String].collect().toSeq

  test("canonicalize lowers scheme+host, strips default port, fragment, trackers; sorts params") {
    assert(canon("HTTP://WWW.Example.COM:80/Path/X?z=9&utm_source=f&a=1#frag") ==
      Seq("http://www.example.com/Path/X?a=1&z=9"))
    // path and query case are semantic — preserved
    assert(canon("https://A.B:443/UP?Q=V") == Seq("https://a.b/UP?Q=V"))
  }

  test("canonicalize keeps non-default and cross-scheme ports") {
    assert(canon("https://ex.com:80/x") == Seq("https://ex.com:80/x"))
    assert(canon("http://ex.com:8080/x") == Seq("http://ex.com:8080/x"))
  }

  test("canonicalize normalizes an empty path to / and drops empty queries") {
    assert(canon("http://ex.com") == Seq("http://ex.com/"))
    assert(canon("http://ex.com?utm_campaign=x") == Seq("http://ex.com/"))
  }

  test("registered domain honors two-level public suffixes") {
    assert(regDomain("www.example.co.uk", "a.b.shop.com.cn", "deep.sub.example.com",
      "example.de", "localhost") ==
      Seq("example.co.uk", "shop.com.cn", "example.com", "example.de", "localhost"))
  }

  test("syntactic URL variants of one resource canonicalize together") {
    val variants = Seq(
      "HTTP://Ex.COM:80/doc?b=2&a=1",
      "http://ex.com/doc?a=1&b=2&utm_source=mail",
      "http://EX.com/doc?b=2&a=1#section-3")
    assert(canon(variants: _*).distinct == Seq("http://ex.com/doc?a=1&b=2"))
  }

  test("nfc_normalize folds decomposed onto composed; strip_accents removes all marks") {
    val df = Seq(("Café", "Café")).toDF("composed", "decomposed")
    val r = df.select(
      call_function("nfc_normalize", $"composed").as("nc"),
      call_function("nfc_normalize", $"decomposed").as("nd"),
      call_function("strip_accents", $"composed").as("sc"),
      lower(call_function("strip_accents",
        call_function("nfc_normalize", $"decomposed"))).as("key"))
      .as[(String, String, String, String)].head()
    assert(r._1 == r._2, "NFC must fold spellings together")
    assert(r._3 == "Cafe")
    assert(r._4 == "cafe", "the dedup key is spelling- and case-invariant")
  }

  test("normalization expressions are idempotent and pass ASCII through") {
    val df = Seq("plain ascii text 123").toDF("t")
    val r = df.select(
      call_function("nfc_normalize", $"t").as("a"),
      call_function("strip_accents", $"t").as("b")).as[(String, String)].head()
    assert(r._1 == "plain ascii text 123" && r._2 == "plain ascii text 123")
  }
}
