package graft.tools

/** Round-11 probe: cross-engine check of the full-PSL registrable-
  * domain resolution. Dumps (url, kernel domain, kernel canon) rows as
  * TSV plus the DuckDB dialect expressions, so the driver-side duckdb
  * can replay the declarative twin over the same urls and diff —
  * the in-repo analog of the oracle compare, runnable before a round
  * lands.
  */
object ProbeRound11 {
  def main(args: Array[String]): Unit = {
    val urls = Seq(
      "https://WWW.Example.com:443/Path/A/?b=2&a=1#frag",
      "http://example.com:80/Path/A?a=1&b=2",
      "http://example.com:443/x",
      "https://shop.Example.CO.UK/x",
      "https://portal.district.k12.ca.us/x",
      "https://example.com/pa%74h/%7Edoc?q=%2Fv%3a1",
      "https://example.com/%6%43",
      "https://shop.biz.ck/x",
      "https://a.shop.biz.ck/x",
      "https://biz.ck/x",
      "https://a.www.ck/x",
      "https://deep.a.www.ck/x",
      "https://city.kawasaki.jp/x",
      "https://ward.kawasaki.jp/x",
      "https://site.ward.kawasaki.jp/x",
      "https://x.city.kawasaki.jp/x",
      "https://school.k12.ca.us/x",
      "https://x..co.uk/x",
      "https://example.er",
      "https://co.uk",
      "https://a.example.ca.us/x",
      "https://example.msk.ru/x",
      "https://foo.blogspot.com/x",
      "https://x.foo.blogspot.com/x",
      "https://b.s3.amazonaws.com/x",
      "https://example.com:8080/x",
      "example.com/no-scheme",
      "")
    val out = new java.io.PrintWriter("/tmp/probe_r11_kernel.tsv", "UTF-8")
    urls.foreach { u =>
      val d = graft.functions.UrlOps.domain(
        org.apache.spark.unsafe.types.UTF8String.fromString(u))
      val c = graft.functions.UrlOps.canon(
        org.apache.spark.unsafe.types.UTF8String.fromString(u))
      out.println(s"$u\t$d\t$c")
    }
    out.close()
    val sql = new java.io.PrintWriter("/tmp/probe_r11_duck.sql", "UTF-8")
    sql.println(graft.ops.Url.duckDomainExpr("url"))
    sql.println("-----CANON-----")
    sql.println(graft.ops.Url.duckCanonExpr("url"))
    sql.close()
    println(s"wrote /tmp/probe_r11_kernel.tsv (${urls.size} urls) and /tmp/probe_r11_duck.sql")
  }
}
