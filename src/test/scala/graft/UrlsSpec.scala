package graft

import org.apache.spark.sql.functions._

/** [[graft.operators.Urls]] — canonical forms must collapse transport
  * noise (case, default ports, tracking params, param order, fragments)
  * and NOTHING else; non-URLs must yield null, never raise. */
class UrlsSpec extends TestBase {
  import graft.operators.Urls

  private def canon(s: String): Option[String] = {
    import spark.implicits._
    Seq(Option(s)).toDF("u")
      .select(Urls.canonicalizeUrl(col("u"))).collect().head match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getString(0))
    }
  }

  test("canonical form: case, userinfo, default port, tracking params, " +
      "param order, fragment") {
    assert(canon("HTTPS://User:Pw@WWW.Site.COM:443/Path/To" +
      "?utm_source=x&b=2&a=1#frag") ==
      Some("https://www.site.com/Path/To?a=1&b=2"))
    // path case is preserved (paths are case-sensitive)
    assert(canon("http://A.com/CaseSensitive") ==
      Some("http://a.com/CaseSensitive"))
    // non-default ports address different servers: kept
    assert(canon("http://site.com:8080") == Some("http://site.com:8080/"))
    assert(canon("http://site.com:80/x") == Some("http://site.com/x"))
    // a default port is only default FOR ITS SCHEME: http://host:443
    // and https://host:80 are genuinely non-default and keep the port
    assert(canon("http://site.com:443/x") ==
      Some("http://site.com:443/x"))
    assert(canon("https://site.com:80/x") ==
      Some("https://site.com:80/x"))
    assert(canon("ftp://site.com:80/f") == Some("ftp://site.com:80/f"))
    // tracking-only query → no '?' at all
    assert(canon("https://a.com/p?utm_source=x&gclid=g&fbclid=f&ref=r") ==
      Some("https://a.com/p"))
    assert(canon("https://a.com/p?ref=abc&q=1") == Some("https://a.com/p?q=1"))
    // empty path normalizes to /
    assert(canon("https://a.com") == Some("https://a.com/"))
    assert(canon("ftp://Host/File") == Some("ftp://host/File"))
    // a '?' that appears only INSIDE the fragment is fragment text,
    // not a query — the whole fragment drops
    assert(canon("https://a.com/p#x?y=1") == Some("https://a.com/p"))
    assert(canon("https://a.com/p?q=1#x?y=2") ==
      Some("https://a.com/p?q=1"))
  }

  test("non-URLs and null yield null, never raise; domain strips one " +
      "www label only") {
    import spark.implicits._
    assert(canon("not a url") == None)
    assert(canon("") == None)
    assert(canon(null) == None)
    assert(canon("://missing.scheme/x") == None)
    val d = Seq("https://WWW.News.Site.co.uk/a", "https://www.www.x.com/b",
      "not a url").toDF("u")
    val doms = d.select(Urls.domainOf(col("u"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(doms == Seq("news.site.co.uk", "www.x.com", null), doms)
  }

  test("property sweep: canonicalization is IDEMPOTENT over 300 seeded " +
      "random URLs — canon(canon(u)) == canon(u)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val schemes = Seq("http", "HTTPS", "ftp")
    val hosts = Seq("WWW.Site.com", "a.B.co", "x.io:8080", "y.z:443",
      "user:pw@Host.net")
    val paths = Seq("", "/", "/A/b", "/p%20q", "/x/y/z")
    val queries = Seq("", "?b=2&a=1", "?utm_source=t", "?a=1&utm_x=2&Z=9",
      "?ref=r&q=+s")
    val frags = Seq("", "#f", "#a b")
    val urls = (1 to 300).map { _ =>
      schemes(rnd.nextInt(schemes.size)) + "://" +
        hosts(rnd.nextInt(hosts.size)) + paths(rnd.nextInt(paths.size)) +
        queries(rnd.nextInt(queries.size)) + frags(rnd.nextInt(frags.size))
    }
    val once = urls.toDF("u")
      .select(Urls.canonicalizeUrl(col("u")).as("c")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(once.forall(_ != null), "every generated URL must canonicalize")
    val twice = once.toDF("u")
      .select(Urls.canonicalizeUrl(col("u")).as("c")).collect()
      .map(_.getString(0)).toSeq
    assert(twice == once,
      s"non-idempotent at: ${once.zip(twice).find(p => p._1 != p._2)}")
  }

  test("withCanonicalUrl feeds URL-level dedup: transport variants of " +
      "one page collapse to one key") {
    import spark.implicits._
    val variants = Seq(
      "https://www.shop.com/item/9?a=1&b=2",
      "HTTPS://WWW.Shop.COM:443/item/9?b=2&a=1#reviews",
      "https://www.shop.com/item/9?a=1&utm_campaign=sale&b=2",
      "https://www.shop.com/item/8").zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val out = Urls.withCanonicalUrl(variants, "url")
    assert(out.select("url_canonical").distinct().count() == 2)
    val deduped = graft.operators.Dedup.exactKeepMinId(
      out.select(col("id"), col("url_canonical").as("text")), "id", "text")
    assert(deduped.count() == 2)
  }

  test("extractUrls: every occurrence yields a row with its domain, " +
      "url-free and null texts yield none, repeats vote twice") {
    import spark.implicits._
    val docs = Seq(
      (1L, "visit https://www.Ex.com/page and http://sub.org/x ok"),
      (2L, "no links here"),
      (3L, null.asInstanceOf[String]),
      (4L, "twice https://a.io/1 twice https://a.io/1"))
      .toDF("id", "text")
    val got = Urls.extractUrls(docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.length == 4, got.mkString(";"))
    val byId = got.groupBy(_._1)
    assert(byId(1L).map(_._3).toSet == Set("ex.com", "sub.org"))
    assert(byId(1L).map(_._2).toSet ==
      Set("https://www.Ex.com/page", "http://sub.org/x"))
    assert(byId(4L).length == 2 &&
      byId(4L).forall(_._3 == "a.io"), byId(4L).mkString(";"))
    assert(!byId.contains(2L) && !byId.contains(3L))
  }
}
