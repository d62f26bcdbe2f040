package graft.ops

/** Committed multi-label public-suffix table — the data file behind
  * registrable-domain resolution (same committed-constant pattern as
  * [[QualityClassifierWeights.table]] and [[Bpe.merges]]: one Scala
  * constant rendered identically into both engine dialects, so the
  * DuckDB oracle replays the exact rule set).
  *
  * A bounded subset of the Mozilla Public Suffix List
  * (publicsuffix.org, MPL 2.0): the multi-label ccTLD registries a web
  * corpus actually hits. Single-label suffixes (`com`, `org`, `de`, …)
  * need no entry — the implicit `*` rule makes the fallback
  * "last two labels" exactly right for them. Entries are lowercase,
  * dot-separated, most of them 2-label; a few 3-label US K-12 style
  * entries exercise depth > 2. The full PSL is ~9k rules; extending is
  * adding lines here (both dialects pick them up), which is the point
  * of committing it as data.
  */
object PublicSuffixes {
  val multiLabel: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "net.uk", "ac.uk", "gov.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br", "blog.br",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    // South Africa
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    // India
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in", "nic.in",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    // South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr", "mil.kr",
    // Mexico / Argentina / Colombia
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    // Singapore / Hong Kong / Malaysia / Indonesia / Thailand / Vietnam
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "co.id", "or.id", "net.id", "web.id", "ac.id", "sch.id", "go.id", "mil.id",
    "co.th", "in.th", "ac.th", "go.th", "mi.th", "net.th", "or.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    // Turkey / Israel / Egypt / Saudi Arabia / Nigeria / Kenya
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "web.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "idf.il",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke", "info.ke",
    // Russia / Ukraine / Poland
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl", "info.pl", "biz.pl",
    // 3-label entries (depth > 2 must resolve by LONGEST suffix)
    "k12.ca.us", "cc.ca.us", "lib.ca.us",
    "k12.ma.us", "cc.ma.us", "lib.ma.us",
    "k12.ny.us", "cc.ny.us", "lib.ny.us",
    // generic second-level operators
    "blogspot.com", "github.io", "gitlab.io", "herokuapp.com",
    "appspot.com", "netlify.app", "vercel.app", "web.app", "pages.dev",
    "windows.net", "cloudfront.net", "amazonaws.com", "azurewebsites.net",
    "wordpress.com", "tumblr.com", "weebly.com", "wixsite.com")

  require(multiLabel.forall(s => s.contains('.') && s == s.toLowerCase &&
    s.split('.').forall(l => l.nonEmpty && l.forall(c => c.isLetterOrDigit || c == '-'))),
    "suffix entries must be lowercase multi-label dotted names")
}
