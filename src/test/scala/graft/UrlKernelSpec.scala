package graft

import org.apache.spark.sql.functions._

/** Bit-parity of the compiled url kernels (`graft_url_canon` /
  * `graft_url_domain`, [[graft.functions.UrlOps]]) against the
  * declarative chain ([[graft.ops.Url.sparkCanonExpr]] /
  * `sparkDomainExpr`) — the DuckDB oracle only ever sees the
  * declarative dialect, so this equivalence is what carries the
  * kernel's correctness. The fixture list deliberately includes the
  * MALFORMED-percent shapes where a single-pass decoder would diverge
  * from the chain's sequential-replace artifacts ('%6%43' → 'l':
  * decoding '%43'→'C' first creates '%6C', which the chain's
  * earlier-ordered 'l' pass no longer sees but a rescanning decoder
  * would decode).
  */
class UrlKernelSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    "https://WWW.Example.com:443/Path/A/?b=2&a=1#frag",
    "http://example.com:80/Path/A?a=1&b=2",
    "http://example.com:443/x",                  // mismatched default port
    "HTTPS://UPPER.example.COM:443/X",           // uppercase scheme+host
    "https://shop.Example.CO.UK/x",              // public suffix
    "https://portal.district.k12.ca.us/x",       // 3-label suffix
    "https://example.com/pa%74h/%7Edoc?q=%2Fv%3a1", // unreserved decode + hex upper
    "https://example.com/%41%42%43",             // full decode run
    "https://example.com/a%2Fb",                 // reserved stays
    "https://example.com/%6%43",                 // MALFORMED: sequential artifact
    "https://example.com/100%able",              // MALFORMED: bare % + hex-ish
    "https://example.com/%zz%4",                 // MALFORMED: non-hex
    "https://example.com/%2541",                 // double-encoded: %25 stays
    "https://example.com/x?b=&a&c=2&a=1",        // empty params, dup keys
    "https://example.com/x?",                    // empty query
    "https://example.com/x?&&",                  // only separators
    "https://example.com:8080/x",                // non-default port kept
    "http://example.com:8080?z=1",               // port + query, no path
    "https://10.0.0.1:443/x",                    // IP host
    "https://www.example.com",                   // bare www host
    "example.com/no-scheme",                     // schemeless
    "",                                          // empty
    "https://example.com/ünïcode/pä?k=ü&a=ß",    // non-ASCII path+query
    "https://example.com/x#frag1#frag2",         // multiple #
    "https://example.com/x?a=1#f?b=2",           // ? after #
    "https://example.com////",                   // all slashes
    "https://co.uk",                             // bare suffix host
    "https://example.com/x?a=😀&b=z",  // supplementary-plane query
    "https://example.com/x?a=%3a&b=%3a%3a",  // repeated lowercase-hex triplets (global rewrite)
    // PSL wildcard (*.ck) and exception (!www.ck) rule forms
    "https://shop.biz.ck/x",                     // *.ck: biz.ck is the suffix
    "https://a.shop.biz.ck/x",                   // deeper under the wildcard
    "https://biz.ck/x",                          // host IS a wildcard suffix
    "https://a.www.ck/x",                        // !www.ck exception
    "https://deep.a.www.ck/x",                   // exception from further down
    "https://city.kawasaki.jp/x",                // !city.kawasaki.jp itself
    "https://ward.kawasaki.jp/x",                // *.kawasaki.jp: ward is suffix
    "https://site.ward.kawasaki.jp/x",           // registrable under the ward
    "https://x.city.kawasaki.jp/x",              // under the jp exception
    "https://school.k12.ca.us/x",                // 3-label exact rule
    "https://x..co.uk/x",                        // empty label above the suffix
    "https://example.er"                         // bare *.er tail (1 label)
  )

  test("graft_url_canon / graft_url_domain are bit-equal to the declarative chain") {
    val df = graft.functions.VectorFunctions.attach(
      fixtures.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url"))
    val rows = df.select(col("id"),
        expr("graft_url_canon(url)").as("kc"),
        expr(graft.ops.Url.sparkCanonExpr("url")).as("dc"),
        expr("graft_url_domain(url)").as("kd"),
        expr(graft.ops.Url.sparkDomainExpr("url")).as("dd"))
      .collect()
    val bad = rows.filter(r => r.getString(1) != r.getString(2) ||
      r.getString(3) != r.getString(4))
    assert(bad.isEmpty, bad.map(r =>
      s"url=${fixtures(r.getLong(0).toInt)}\n  canon  kernel=${r.getString(1)} declarative=${r.getString(2)}" +
        s"\n  domain kernel=${r.getString(3)} declarative=${r.getString(4)}").mkString("\n"))
  }

  test("PSL rule-form semantics: exact, wildcard, exception, fallback") {
    // expected REGISTRABLE domains under full PSL semantics (the values
    // themselves, not just kernel≡declarative parity): wildcard *.ck
    // makes every child of ck a suffix; exception !www.ck carves
    // www.ck back out as a registrable domain; bare suffixes fall back
    // to last-two-labels (documented approximation)
    val cases = Seq(
      "https://shop.biz.ck/x" -> "shop.biz.ck",       // suffix = biz.ck (wildcard)
      "https://a.shop.biz.ck/x" -> "shop.biz.ck",
      "https://biz.ck/x" -> "biz.ck",                 // host IS suffix -> fallback
      "https://a.www.ck/x" -> "www.ck",               // exception
      "https://deep.a.www.ck/x" -> "www.ck",
      "https://city.kawasaki.jp/x" -> "city.kawasaki.jp",
      "https://x.city.kawasaki.jp/x" -> "city.kawasaki.jp",
      "https://ward.kawasaki.jp/x" -> "kawasaki.jp", // host IS a wildcard suffix -> last-two fallback
      "https://site.ward.kawasaki.jp/x" -> "site.ward.kawasaki.jp", // suffix = ward.kawasaki.jp
      "https://shop.example.co.uk/x" -> "example.co.uk", // exact rule
      "https://school.k12.ca.us/x" -> "school.k12.ca.us", // 3-label exact
      "https://a.school.k12.ca.us/x" -> "school.k12.ca.us",
      "https://example.com/x" -> "example.com",       // implicit * fallback
      "https://example.er" -> "example.er",           // bare 1-label tail -> fallback
      // round-13 table growth: one value row per new family
      "https://shop.sakai.osaka.jp/x" -> "sakai.osaka.jp",   // jp prefecture
      "https://www.firm.adv.br/x" -> "firm.adv.br",          // br category
      "https://cafe.gangnam.seoul.kr/x" -> "gangnam.seoul.kr", // kr geographic
      "https://news.portal.kharkiv.ua/x" -> "portal.kharkiv.ua", // ua geographic
      "https://sklep.firma.krakow.pl/x" -> "firma.krakow.pl",  // pl geographic
      "https://cabinet.dupont.avocat.fr/x" -> "dupont.avocat.fr", // fr profession
      "https://okul.ornek.k12.tr/x" -> "ornek.k12.tr",       // tr k12
      // round-14 table growth: one value row per new family
      "https://shop.example.a.bg/x" -> "example.a.bg",       // bg [0-9a-z] second levels
      "https://www.shop.com.mt/x" -> "shop.com.mt",          // mt
      "https://site.ministere.gouv.sn/x" -> "ministere.gouv.sn", // sn
      "https://a.biz.example.jm/x" -> "biz.example.jm",      // *.jm wildcard
      "https://www.store.myshopify.com/x" -> "store.myshopify.com", // private-section operator
      "https://app.team.surge.sh/x" -> "team.surge.sh",      // private-section operator
      "https://portal.firm.co.tt/x" -> "firm.co.tt",         // tt
      "https://x.y.gov.mn/x" -> "y.gov.mn",                  // mn
      // round-15 table growth: one value row per new family
      "https://www.comune.firenze.it/x" -> "comune.firenze.it", // it province
      "https://turismo.shop.toscana.it/x" -> "shop.toscana.it", // it region
      "https://posts.myblog.blogspot.de/x" -> "myblog.blogspot.de", // blogspot ccTLD
      "https://cam.home.duckdns.org/x" -> "home.duckdns.org", // dynamic-DNS operator
      "https://api.myapp.up.railway.app/x" -> "myapp.up.railway.app", // 3-label private rule
      "https://svc.team.eu.org/x" -> "team.eu.org",          // eu.org registry
      // round-15 table growth, band 2: one value row per new family
      "https://www.hotelroyal.hotel.hu/x" -> "hotelroyal.hotel.hu", // hu thematic
      "https://etat.kommune.oslo.no/x" -> "kommune.oslo.no",  // no municipality
      "https://sklep.gory.podhale.pl/x" -> "gory.podhale.pl", // pl region band 2
      "https://blog.mysite.carrd.co/x" -> "mysite.carrd.co",  // site-builder operator
      "https://a.bucket.r2.dev/x" -> "bucket.r2.dev",         // object-store buckets
      // .ye corrected r16 (upstream dropped the wildcard for explicit
      // second-levels): real hosts under net.ye root at depth 3; a
      // name outside the six explicit rules falls through to the
      // implicit-* TLD fallback
      "https://www.y.net.ye/x" -> "y.net.ye",
      "https://x.shop.example.ye/x" -> "example.ye",
      // *.sch.uk (corrected from exact r15): the LA level is the
      // suffix, the school registers one deeper
      "https://www.stjohns.havering.sch.uk/x" -> "stjohns.havering.sch.uk",
      // AWS wildcards: every EC2 public hostname / ELB is its own
      // registrable site (depth-5 suffixes — the table's deepest)
      "https://x.ec2-1-2-3-4.us-east-1.compute.amazonaws.com/x" ->
        "ec2-1-2-3-4.us-east-1.compute.amazonaws.com",
      "https://svc.mylb.us-west-2.elb.amazonaws.com/x" ->
        "mylb.us-west-2.elb.amazonaws.com",
      // the CN load-balancer wildcard (r16 ADVICE fix) — depth-6 suffix
      "https://svc.mylb.cn-north-1.elb.amazonaws.com.cn/x" ->
        "mylb.cn-north-1.elb.amazonaws.com.cn",
      // round-16 table growth: one value row per new family
      "https://dom.mojsklep.sklep.pl/x" -> "mojsklep.sklep.pl",   // pl thematic
      "https://www.kino.larvik.no/x" -> "kino.larvik.no",         // no municipality band 3
      "https://api.myapp.eu.pythonanywhere.com/x" ->
        "myapp.eu.pythonanywhere.com",                            // regional PaaS operator
      "https://x.happy-tunnel-1234.trycloudflare.com/x" ->
        "happy-tunnel-1234.trycloudflare.com",                    // tunnel operator
      // round-17 table growth, band 4: one value row per new family
      "https://www.pref.hokkaido.jp/x" -> "pref.hokkaido.jp",     // jp prefecture (full 47)
      "https://lib.city.nagano.jp/x" -> "city.nagano.jp",
      "https://portal.startup.ai.in/x" -> "startup.ai.in",        // NIXI .in expansion
      "https://www.shop.delhi.in/x" -> "shop.delhi.in",
      "https://cdn.assets.global.ssl.fastly.net/x" ->
        "assets.global.ssl.fastly.net",                           // fastly edge family
      "https://x.mysite.fastlylb.net/x" -> "mysite.fastlylb.net",
      "https://cam.myhome.bounceme.net/x" -> "myhome.bounceme.net", // no-ip family
      "https://ftp.files.serveftp.com/x" -> "files.serveftp.com",
      "https://raw.user123.githubusercontent.com/x" ->
        "user123.githubusercontent.com",                          // github user content
      "https://x.myapp.scm.azurewebsites.net/x" ->
        "myapp.scm.azurewebsites.net",                            // azure kudu endpoints
      "https://www.myvm.cloudapp.net/x" -> "myvm.cloudapp.net",   // classic azure VMs
      "https://docs.team.codeberg.page/x" -> "team.codeberg.page", // codeberg pages
      "https://x.tunnel42.loca.lt/x" -> "tunnel42.loca.lt",       // localtunnel
      "https://api.myapp.ngrok-free.app/x" -> "myapp.ngrok-free.app", // ngrok bands
      "https://me.handle.is-a.dev/x" -> "handle.is-a.dev",        // is-a.dev registry
      "https://cdn.mysite.b-cdn.net/x" -> "mysite.b-cdn.net",     // bunny CDN
      // round-17 table growth, band 5: one value row per new family
      "https://www.camara.leg.br/x" -> "camara.leg.br",           // registro.br thematic remainder
      "https://loja.empresa.rio.br/x" -> "empresa.rio.br",        // registro.br city second-levels
      "https://www.coop.agric.za/x" -> "coop.agric.za",           // ZADNA charter remainder
      "https://posta.firma.kep.tr/x" -> "firma.kep.tr",           // .tr registered e-mail
      "https://www.site.zhytomyr.ua/x" -> "site.zhytomyr.ua",     // .ua transliteration twins
      "https://app.my.pp.ua/x" -> "my.pp.ua",                     // .ua generic second-levels
      "https://www.etude.huissier-justice.fr/x" ->
        "etude.huissier-justice.fr",                              // AFNIC sector registries
      "https://bip.um.gdynia.pl/x" -> "um.gdynia.pl")             // NASK geographic band 3
    val df = graft.functions.VectorFunctions.attach(
      cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }.toDF("id", "url"))
    val got = df.select(col("id"), expr("graft_url_domain(url)").as("d"))
      .collect().map(r => r.getLong(0).toInt -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i) == want, s"url=$u expected=$want got=${got(i)}")
    }
  }

  test("coexisting exact + wildcard rules for the SAME name resolve longest-match-first (upstream PSL)") {
    // upstream allows `foo.example` (exact) alongside `*.foo.example`
    // (wildcard) — legal and meaningful, NOT redundant. The resolver's
    // per-depth descending probe realizes upstream's prevailing-rule
    // order: hosts deep enough for the wildcard child resolve there;
    // shallower hosts fall through to the exact rule. Exercised on a
    // synthetic probe table since the committed list has no such pair.
    val (exc, suf) = graft.functions.UrlOps.buildLevels(
      exact = Seq("foo.example", "co.test"),
      tails = Seq("foo.example"),
      exceptions = Nil)
    def d(h: String) = graft.functions.UrlOps.registrableWith(h, exc, suf)
    // deep host: wildcard child b.foo.example is the suffix (depth 3)
    assert(d("a.b.foo.example") == "a.b.foo.example")
    assert(d("x.a.b.foo.example") == "a.b.foo.example")
    // shallow host: falls through to the exact rule (suffix depth 2)
    assert(d("b.foo.example") == "b.foo.example")
    // unrelated exact rule unaffected
    assert(d("shop.site.co.test") == "site.co.test")
  }

  test("null url: kernel and declarative agree (both null)") {
    val df = graft.functions.VectorFunctions.attach(
      Seq((1L, Option.empty[String])).toDF("id", "url"))
    val r = df.select(expr("graft_url_canon(url)"),
      expr(graft.ops.Url.sparkCanonExpr("url"))).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("deterministic fuzz: generated percent/port/query soup stays bit-equal") {
    // fixed-seed generator: random-ish strings over a URL-ish alphabet
    // heavy in '%', hex digits, separators — the shapes where sequential
    // replace semantics bite
    val alphabet = "abcdfATZ019%?&#/=.:~_-"
    def gen(seed: Long, len: Int): String = {
      var x = seed; val sb = new StringBuilder("http://h")
      for (_ <- 0 until len) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb.append(alphabet(((x >>> 33) % alphabet.length).toInt))
      }
      sb.toString
    }
    val urls = (1 to 200).map(i => (i.toLong, gen(i.toLong, 24)))
    val df = graft.functions.VectorFunctions.attach(urls.toDF("id", "url"))
    val bad = df.select(col("id"),
        expr("graft_url_canon(url)").as("kc"),
        expr(graft.ops.Url.sparkCanonExpr("url")).as("dc"),
        expr("graft_url_domain(url)").as("kd"),
        expr(graft.ops.Url.sparkDomainExpr("url")).as("dd"))
      .collect()
      .filter(r => r.getString(1) != r.getString(2) || r.getString(3) != r.getString(4))
    assert(bad.isEmpty, bad.take(5).map(r =>
      s"url=${urls(r.getLong(0).toInt - 1)._2}\n  canon  kernel=${r.getString(1)} declarative=${r.getString(2)}" +
        s"\n  domain kernel=${r.getString(3)} declarative=${r.getString(4)}").mkString("\n"))
  }
}
