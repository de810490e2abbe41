package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlOpsSpec extends SparkTestBase {

  private def canon(urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("already-canonical URLs pass through unchanged") {
    assert(canon("http://example.com/a/b?a=1&b=2") ==
      Seq("http://example.com/a/b?a=1&b=2"))
  }

  test("scheme/host casing, www, and default ports normalize; path case survives") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/Docs/X",
      "https://api.example.com:443/v1",
      "https://api.example.com:8443/v1") == Seq(
      "http://example.com/Docs/X",      // path case preserved
      "https://api.example.com/v1",     // 443 is https default
      "https://api.example.com:8443/v1")) // non-default port kept
  }

  test("slash runs collapse, trailing slashes drop, root path becomes bare authority") {
    assert(canon(
      "http://x.com//a///b//",
      "http://x.com/",
      "http://x.com") == Seq(
      "http://x.com/a/b", "http://x.com", "http://x.com"))
  }

  test("fragments drop; tracking params drop; remaining params sort; empty query loses ?") {
    assert(canon(
      "http://x.com/p?b=2&a=1#frag",
      "http://x.com/p?utm_source=f&utm_campaign=c&a=1&fbclid=Z&gclid=Q&ref=r",
      "http://x.com/p?utm_source=f#s",
      "http://x.com/p?") == Seq(
      "http://x.com/p?a=1&b=2",
      "http://x.com/p?a=1",
      "http://x.com/p",
      "http://x.com/p"))
  }

  test("a param merely PREFIXED by a tracking name is kept") {
    // the regex anchors on the full name before '=': 'reference=' is not
    // 'ref=' and 'myutm=' is not 'utm_*' (but 'utm_anything=' IS)
    assert(canon("http://x.com/p?reference=1&myutm=2&utm_custom=3") ==
      Seq("http://x.com/p?myutm=2&reference=1"))
  }

  test("urlDomain takes the last two labels; urlHost strips www and port") {
    val s = spark
    import s.implicits._
    val got = Seq("HTTP://WWW.a.b.Example.COM:80/x").toDF("u")
      .select(UrlOps.urlHost(col("u")), UrlOps.urlDomain(col("u"))).head
    assert(got.getString(0) == "a.b.example.com")
    assert(got.getString(1) == "example.com")
  }

  test("dedupByUrl collapses all spellings of one logical URL to the min id") {
    val s = spark
    import s.implicits._
    val df = Seq(
      10L -> "http://example.com/docs/1?a=1&b=2",
      11L -> "HTTP://WWW.EXAMPLE.COM:80/docs/1/?b=2&a=1",
      12L -> "http://example.com//docs//1?a=1&utm_source=feed&b=2",
      13L -> "http://example.com/docs/2?a=1&b=2" // different logical URL
    ).toDF("doc_id", "url")
    val got = UrlOps.dedupByUrl(df, "doc_id", "url")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._3)
    assert(got.toSeq == Seq(
      ("http://example.com/docs/1?a=1&b=2", "example.com", 10L, 3L),
      ("http://example.com/docs/2?a=1&b=2", "example.com", 13L, 1L)))
  }

  test("canonicalizeUrl is idempotent over adversarial URL soup") {
    // same production property as normalizeText: re-canonicalizing an
    // already-canonical URL must be a no-op, or every pipeline re-run
    // would churn the dedup keys. Seeded soup of schemes, WWW/case
    // variants, ports, duplicate slashes, tracking params, fragments.
    val schemes = Seq("http://", "HTTPS://", "ftp://", "")
    val hosts = Seq("example.com", "WWW.Example.COM", "a.b.co:8080",
      "EXAMPLE.com:80")
    val paths = Seq("", "/", "//x//y/", "/p/q", "/p//", "/%7Euser")
    val queries = Seq("", "?", "?b=2&a=1", "?utm_source=f&a=1",
      "?a=1&a=1&", "?utm_campaign=x", "?z=%20&y=+")
    val frags = Seq("", "#f", "#a?b=1")
    val rnd = new scala.util.Random(20260814L)
    val samples = Seq.tabulate(300) { i =>
      (i.toLong,
        schemes(rnd.nextInt(schemes.length)) +
        hosts(rnd.nextInt(hosts.length)) +
        paths(rnd.nextInt(paths.length)) +
        queries(rnd.nextInt(queries.length)) +
        frags(rnd.nextInt(frags.length)))
    }
    val s2 = spark
    import s2.implicits._
    val df = samples.toDF("id", "u")
    val bad = df.select(col("id"), col("u"),
        UrlOps.canonicalizeUrl(col("u")).as("once"),
        UrlOps.canonicalizeUrl(UrlOps.canonicalizeUrl(col("u"))).as("twice"))
      .filter(col("once") =!= col("twice"))
      .collect()
    assert(bad.isEmpty,
      s"canonicalizeUrl not idempotent on: ${bad.take(3).mkString("; ")}")
  }
}
