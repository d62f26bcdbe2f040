package graft.ops

/** Committed public-suffix table — the data file behind registrable-
  * domain resolution (same committed-constant pattern as
  * [[QualityClassifierWeights.table]] and [[Bpe.merges]]: one Scala
  * constant rendered identically into both engine dialects, so the
  * DuckDB oracle replays the exact rule set).
  *
  * A knowledge-bounded rendering of the Mozilla Public Suffix List
  * (publicsuffix.org, MPL 2.0, attributed) covering all THREE of the
  * PSL's rule forms, which is what the lookup mechanism
  * ([[Url.domainFromHost]] / [[graft.functions.UrlOps.domain]]) is
  * built around:
  *
  *   - '''exact''' rules (`co.uk`): the named suffix is a public
  *     suffix; registrable domain = suffix + one label.
  *   - '''wildcard''' rules (`*.ck`, stored here as the tail `ck`):
  *     EVERY child of the tail is a public suffix — `foo.ck` is a
  *     suffix, so `bar.foo.ck` is the registrable domain.
  *   - '''exception''' rules (`!www.ck`, stored without the `!`):
  *     carve-outs from a wildcard — `www.ck` is NOT a suffix despite
  *     `*.ck`; it is itself the registrable domain for any host
  *     under it. Object init enforces that every exception's parent
  *     tail is a committed wildcard (the PSL invariant).
  *
  * Single-label suffixes (`com`, `org`, `de`, …) need no entry — the
  * implicit `*` rule makes the "last two labels" fallback exactly
  * right for them. Entries are lowercase dotted names. The full PSL
  * is ~9k rules and refreshes continuously; this environment has no
  * network egress, so the table is the stable, well-known core (all
  * rule FORMS represented, the mechanism sized for the full list —
  * per-depth sorted-array probes, not a regex alternation, so
  * extending is appending lines here and both dialects pick them up).
  */
object PublicSuffixes {

  /** US state second-levels: the PSL registers `<st>.us` plus the
    * `k12./cc./lib.` third-levels per state; rendered by comprehension
    * from the literal state list (still committed data — the codes ARE
    * the table).
    */
  private val usStates: Seq[String] = Seq(
    "al", "ak", "az", "ar", "ca", "co", "ct", "de", "dc", "fl", "ga",
    "hi", "id", "il", "in", "ia", "ks", "ky", "la", "me", "md", "ma",
    "mi", "mn", "ms", "mo", "mt", "ne", "nv", "nh", "nj", "nm", "ny",
    "nc", "nd", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "vt", "va", "wa", "wv", "wi", "wy")

  /** Exact rules (multi-label only — see the implicit-`*` note above). */
  val exact: Seq[String] = Seq(
    // United Kingdom
    // (sch.uk is a WILDCARD rule upstream — `*.sch.uk`, schools
    // register at <school>.<la>.sch.uk — moved to wildcardTails r15)
    "co.uk", "org.uk", "me.uk", "net.uk", "ac.uk", "gov.uk", "ltd.uk",
    "plc.uk", "nhs.uk",
    // Australia (incl. state second-levels)
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au", "wa.au",
    // Japan (organizational + the 47 prefecture geographic names)
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "aichi.jp", "akita.jp", "aomori.jp", "chiba.jp", "ehime.jp", "fukui.jp",
    "fukuoka.jp", "fukushima.jp", "gifu.jp", "gunma.jp", "hiroshima.jp",
    "hokkaido.jp", "hyogo.jp", "ibaraki.jp", "ishikawa.jp", "iwate.jp",
    "kagawa.jp", "kagoshima.jp", "kanagawa.jp", "kochi.jp", "kumamoto.jp",
    "kyoto.jp", "mie.jp", "miyagi.jp", "miyazaki.jp", "nagano.jp",
    "nagasaki.jp", "nara.jp", "niigata.jp", "oita.jp", "okayama.jp",
    "okinawa.jp", "osaka.jp", "saga.jp", "saitama.jp", "shiga.jp",
    "shimane.jp", "shizuoka.jp", "tochigi.jp", "tokushima.jp", "tokyo.jp",
    "tottori.jp", "toyama.jp", "wakayama.jp", "yamagata.jp", "yamaguchi.jp",
    "yamanashi.jp",
    // Brazil (registro.br organizational/professional categories)
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br", "blog.br",
    "adv.br", "agr.br", "am.br", "arq.br", "bio.br", "cim.br", "cng.br",
    "cnt.br", "coop.br", "ecn.br", "eco.br", "emp.br", "eng.br", "esp.br",
    "etc.br", "eti.br", "far.br", "flog.br", "fm.br", "fnd.br", "fot.br",
    "fst.br", "g12.br", "ggf.br", "imb.br", "ind.br", "inf.br", "jor.br",
    "jus.br", "lel.br", "mat.br", "med.br", "mus.br", "not.br", "ntr.br",
    "odo.br", "ppg.br", "pro.br", "psc.br", "psi.br", "qsl.br", "radio.br",
    "rec.br", "slg.br", "srv.br", "taxi.br", "teo.br", "tmp.br", "trd.br",
    "tur.br", "tv.br", "vet.br", "vlog.br", "wiki.br", "zlg.br",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    "maori.nz", "iwi.nz", "mil.nz", "parliament.nz", "health.nz", "cri.nz",
    // South Africa
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za", "edu.za",
    "law.za", "mil.za", "nom.za", "school.za", "tm.za",
    // India
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in", "nic.in", "mil.in",
    // China (incl. province second-levels)
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "bj.cn", "sh.cn", "tj.cn", "cq.cn", "he.cn", "sx.cn", "nm.cn", "ln.cn",
    "jl.cn", "hl.cn", "js.cn", "zj.cn", "ah.cn", "fj.cn", "jx.cn", "sd.cn",
    "ha.cn", "hb.cn", "hn.cn", "gd.cn", "gx.cn", "hi.cn", "sc.cn", "gz.cn",
    "yn.cn", "xz.cn", "sn.cn", "gs.cn", "qh.cn", "nx.cn", "xj.cn",
    // Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    // South Korea (organizational, school levels, and the 16 regional
    // geographic names)
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr", "mil.kr",
    "es.kr", "ms.kr", "hs.kr", "kg.kr", "sc.kr",
    "seoul.kr", "busan.kr", "daegu.kr", "incheon.kr", "gwangju.kr",
    "daejeon.kr", "ulsan.kr", "gyeonggi.kr", "gangwon.kr", "chungbuk.kr",
    "chungnam.kr", "jeonbuk.kr", "jeonnam.kr", "gyeongbuk.kr",
    "gyeongnam.kr", "jeju.kr",
    // Mexico / Argentina / Colombia
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    // the rest of Latin America
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "gov.cl", "gob.cl", "co.cl", "mil.cl",
    "com.ve", "edu.ve", "gob.ve", "mil.ve", "net.ve", "org.ve", "info.ve", "web.ve",
    "com.ec", "info.ec", "net.ec", "fin.ec", "med.ec", "pro.ec", "org.ec",
    "edu.ec", "gov.ec", "gob.ec", "mil.ec",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "org.bo", "net.bo", "mil.bo", "tv.bo", "web.bo",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.do", "edu.do", "gob.do", "gov.do", "mil.do", "net.do", "org.do", "sld.do", "web.do", "art.do",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "ac.pa", "gob.pa", "com.pa", "org.pa", "sld.pa", "edu.pa", "net.pa",
    "ing.pa", "abo.pa", "med.pa", "nom.pa",
    // Singapore / Hong Kong / Malaysia / Indonesia / Thailand / Vietnam /
    // Philippines / Pakistan / Sri Lanka
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "co.id", "or.id", "net.id", "web.id", "ac.id", "sch.id", "go.id", "mil.id",
    "biz.id", "my.id", "desa.id",
    "co.th", "in.th", "ac.th", "go.th", "mi.th", "net.th", "or.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "health.vn", "info.vn", "name.vn", "pro.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph", "i.ph",
    "com.pk", "net.pk", "edu.pk", "org.pk", "fam.pk", "biz.pk", "web.pk",
    "gov.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk", "gos.pk",
    "gov.lk", "sch.lk", "net.lk", "int.lk", "com.lk", "org.lk", "edu.lk",
    "ngo.lk", "soc.lk", "web.lk", "ltd.lk", "assn.lk", "grp.lk", "hotel.lk", "ac.lk",
    // Middle East / Central Asia
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "web.tr",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr",
    "k12.tr", "name.tr", "pol.tr", "tel.tr", "tv.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "idf.il",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    "gov.iq", "edu.iq", "mil.iq", "com.iq", "org.iq", "net.iq",
    "com.jo", "org.jo", "net.jo", "edu.jo", "sch.jo", "gov.jo", "mil.jo", "name.jo",
    "com.kw", "edu.kw", "emb.kw", "gov.kw", "ind.kw", "net.kw", "org.kw",
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    "co.om", "com.om", "edu.om", "gov.om", "med.om", "net.om", "org.om", "pro.om",
    "com.qa", "edu.qa", "gov.qa", "mil.qa", "name.qa", "net.qa", "org.qa", "sch.qa",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    "com.bh", "edu.bh", "net.bh", "org.bh", "gov.bh",
    "com.az", "net.az", "int.az", "gov.az", "org.az", "edu.az", "info.az",
    "pp.az", "mil.az", "name.az", "pro.az", "biz.az",
    "com.ge", "edu.ge", "gov.ge", "org.ge", "mil.ge", "net.ge", "pvt.ge",
    "co.am", "com.am", "commune.am", "net.am", "org.am",
    "org.kz", "edu.kz", "net.kz", "gov.kz", "mil.kz", "com.kz",
    "co.uz", "com.uz", "net.uz", "org.uz",
    // Africa
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke", "info.ke",
    "co.ma", "net.ma", "gov.ma", "org.ma", "ac.ma", "press.ma",
    "com.tn", "ens.tn", "fin.tn", "gov.tn", "ind.tn", "info.tn", "intl.tn",
    "nat.tn", "net.tn", "org.tn", "perso.tn", "tourism.tn",
    "com.dz", "org.dz", "net.dz", "gov.dz", "edu.dz", "asso.dz", "pol.dz", "art.dz",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.tz", "ac.tz", "go.tz", "hotel.tz", "info.tz", "me.tz", "mil.tz",
    "mobi.tz", "ne.tz", "or.tz", "sc.tz", "tv.tz",
    "co.ug", "or.ug", "ac.ug", "sc.ug", "go.ug", "ne.ug", "com.ug", "org.ug",
    "ac.zm", "biz.zm", "co.zm", "com.zm", "edu.zm", "gov.zm", "info.zm",
    "mil.zm", "net.zm", "org.zm", "sch.zm",
    "ac.zw", "co.zw", "gov.zw", "mil.zw", "org.zw",
    "com.et", "gov.et", "org.et", "edu.et", "biz.et", "name.et", "info.et", "net.et",
    // Russia / Ukraine / Belarus / Eastern Europe
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru", "ac.ru", "edu.ru",
    "gov.ru", "int.ru", "mil.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "kyiv.ua", "lviv.ua",
    "cherkasy.ua", "chernihiv.ua", "chernivtsi.ua", "crimea.ua",
    "dnipropetrovsk.ua", "donetsk.ua", "ivano-frankivsk.ua", "kharkiv.ua",
    "kharkov.ua", "kherson.ua", "kirovograd.ua", "lugansk.ua", "lutsk.ua",
    "mykolaiv.ua", "odesa.ua", "odessa.ua", "poltava.ua", "rivne.ua",
    "sumy.ua", "ternopil.ua", "uzhgorod.ua", "vinnica.ua", "zaporizhzhe.ua",
    "zhitomir.ua", "cv.ua", "dp.ua", "if.ua", "kh.ua", "km.ua", "kr.ua",
    "lg.ua", "mk.ua", "od.ua", "pl.ua", "rv.ua", "te.ua", "vn.ua", "zp.ua",
    "zt.ua",
    "com.by", "gov.by", "mil.by", "of.by",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl", "info.pl", "biz.pl",
    "bialystok.pl", "bydgoszcz.pl", "gda.pl", "gdansk.pl", "katowice.pl",
    "krakow.pl", "lodz.pl", "lublin.pl", "olsztyn.pl", "opole.pl",
    "poznan.pl", "radom.pl", "rzeszow.pl", "slupsk.pl", "szczecin.pl",
    "torun.pl", "warszawa.pl", "wroc.pl", "wroclaw.pl",
    "arts.ro", "com.ro", "firm.ro", "info.ro", "nom.ro", "nt.ro", "org.ro",
    "rec.ro", "store.ro", "tm.ro", "www.ro",
    "ac.rs", "co.rs", "edu.rs", "gov.rs", "in.rs", "org.rs",
    "com.ba", "edu.ba", "gov.ba", "mil.ba", "net.ba", "org.ba",
    "com.mk", "org.mk", "net.mk", "edu.mk", "gov.mk", "inf.mk", "name.mk",
    "co.hu", "info.hu", "org.hu", "priv.hu", "tm.hu",
    "com.lv", "edu.lv", "gov.lv", "org.lv", "mil.lv", "id.lv", "net.lv",
    "asn.lv", "conf.lv",
    "gov.lt",
    "com.ee", "org.ee", "edu.ee", "gov.ee", "riik.ee", "lib.ee", "med.ee",
    "pri.ee", "aip.ee", "fie.ee",
    // Western Europe second-levels
    "ac.at", "co.at", "gv.at", "or.at",
    "ac.be",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "aeroport.fr", "avocat.fr", "chambagri.fr", "chirurgiens-dentistes.fr",
    "experts-comptables.fr", "medecin.fr", "notaires.fr", "pharmacien.fr",
    "port.fr", "veterinaire.fr",
    "edu.it", "gov.it",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt", "org.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.se", "org.se", "pp.se", "tm.se", "parti.se", "press.se",
    // Canada
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca", "nt.ca",
    "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yt.ca", "gc.ca",
    // generic second-level operators (PSL private section)
    "blogspot.com", "github.io", "gitlab.io", "herokuapp.com",
    "appspot.com", "netlify.app", "vercel.app", "web.app", "pages.dev",
    "windows.net", "cloudfront.net", "amazonaws.com", "azurewebsites.net",
    "wordpress.com", "tumblr.com", "weebly.com", "wixsite.com",
    "firebaseapp.com", "cloudapp.net", "readthedocs.io", "neocities.org",
    "fly.dev", "onrender.com", "workers.dev", "repl.co", "glitch.me",
    "s3.amazonaws.com", "global.ssl.fastly.net",
    "surge.sh", "bitbucket.io", "myshopify.com", "notion.site", "webflow.io",
    // round 14 growth — Europe (remaining ccTLD second-level families)
    "police.uk", "mod.uk",
    "gov.ie",
    "com.is", "net.is", "edu.is", "gov.is", "org.is", "int.is",
    "priv.no", "mil.no", "stat.no", "dep.no", "kommune.no", "herad.no",
    "idrett.no", "museum.no", "folkebibl.no", "fylkesbibl.no",
    "aland.fi",
    "com.hr", "iz.hr", "from.hr", "name.hr",
    "com.mt", "edu.mt", "net.mt", "org.mt", "gov.mt",
    "ac.cy", "biz.cy", "com.cy", "gov.cy", "ltd.cy", "net.cy", "org.cy",
    "press.cy", "pro.cy", "tm.cy", "name.cy", "parliament.cy",
    "com.al", "edu.al", "gov.al", "mil.al", "net.al", "org.al",
    "ac.me", "co.me", "edu.me", "gov.me", "its.me", "net.me", "org.me",
    "priv.me",
    // Central Asia / Caucasus / Mongolia
    "com.kg", "edu.kg", "gov.kg", "mil.kg", "net.kg", "org.kg",
    "ac.tj", "biz.tj", "co.tj", "com.tj", "edu.tj", "go.tj", "gov.tj",
    "int.tj", "mil.tj", "name.tj", "net.tj", "nic.tj", "org.tj", "web.tj",
    "gov.mn", "edu.mn", "org.mn",
    // Southeast Asia remainder
    "com.la", "edu.la", "gov.la", "info.la", "int.la", "net.la", "org.la",
    "per.la",
    "com.bn", "edu.bn", "gov.bn", "net.bn", "org.bn",
    "com.mo", "edu.mo", "gov.mo", "net.mo", "org.mo",
    // Africa remainder
    "art.sn", "com.sn", "edu.sn", "gouv.sn", "org.sn", "perso.sn", "univ.sn",
    "co.cm", "com.cm", "gov.cm", "net.cm",
    "ac.ci", "asso.ci", "co.ci", "com.ci", "ed.ci", "edu.ci", "go.ci",
    "gouv.ci", "int.ci", "md.ci", "net.ci", "or.ci", "org.ci", "presse.ci",
    "ac.rw", "co.rw", "coop.rw", "gov.rw", "mil.rw", "net.rw", "org.rw",
    "co.bw", "org.bw",
    "co.na", "com.na", "org.na",
    "ac.mz", "adv.mz", "co.mz", "edu.mz", "gov.mz", "mil.mz", "net.mz",
    "org.mz",
    "ac.mw", "biz.mw", "co.mw", "com.mw", "coop.mw", "edu.mw", "gov.mw",
    "int.mw", "net.mw", "org.mw",
    "com.sd", "net.sd", "org.sd", "edu.sd", "med.sd", "tv.sd", "gov.sd",
    "info.sd",
    "com.ly", "net.ly", "gov.ly", "plc.ly", "edu.ly", "sch.ly", "med.ly",
    "org.ly", "id.ly",
    "ed.ao", "gv.ao", "og.ao", "co.ao", "pb.ao", "it.ao",
    // Latin America / Caribbean remainder
    "co.tt", "com.tt", "org.tt", "net.tt", "biz.tt", "info.tt", "pro.tt",
    "name.tt", "edu.tt", "gov.tt",
    "biz.bb", "co.bb", "com.bb", "edu.bb", "gov.bb", "info.bb", "net.bb",
    "org.bb", "store.bb", "tv.bb",
    "com.bs", "net.bs", "org.bs", "edu.bs", "gov.bs",
    "com.cu", "edu.cu", "org.cu", "net.cu", "gov.cu", "inf.cu",
    "ac.ni", "biz.ni", "co.ni", "com.ni", "edu.ni", "gob.ni", "in.ni",
    "info.ni", "int.ni", "mil.ni", "net.ni", "nom.ni", "org.ni", "web.ni",
    "com.hn", "edu.hn", "org.hn", "net.hn", "mil.hn", "gob.hn",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.bz", "net.bz", "org.bz", "edu.bz", "gov.bz",
    "co.gy", "com.gy", "edu.gy", "gov.gy", "net.gy", "org.gy",
    "com.ht", "shop.ht", "firm.ht", "info.ht", "adult.ht", "net.ht",
    "pro.ht", "org.ht", "med.ht", "art.ht", "coop.ht", "pol.ht", "asso.ht",
    "edu.ht", "rel.ht", "gouv.ht", "perso.ht",
    // Pacific
    "com.sb", "edu.sb", "gov.sb", "net.sb", "org.sb",
    "com.vu", "edu.vu", "net.vu", "org.vu",
    "com.ws", "net.ws", "org.ws", "gov.ws", "edu.ws",
    "com.to", "gov.to", "net.to", "org.to", "edu.to", "mil.to",
    // round 15 growth — Italy geographic second-levels: the PSL
    // registers every region (Italian + English renderings) and every
    // province as a registry under .it — the largest well-known exact
    // family this table was still missing
    "abruzzo.it", "basilicata.it", "calabria.it", "campania.it",
    "emilia-romagna.it", "friuli-venezia-giulia.it", "lazio.it",
    "liguria.it", "lombardia.it", "lombardy.it", "marche.it", "molise.it",
    "piemonte.it", "piedmont.it", "puglia.it", "apulia.it",
    "sardegna.it", "sardinia.it", "sicilia.it", "sicily.it",
    "toscana.it", "tuscany.it", "trentino.it", "umbria.it", "veneto.it",
    "roma.it", "rome.it", "milano.it", "milan.it", "napoli.it",
    "naples.it", "torino.it", "turin.it", "firenze.it", "florence.it",
    "genova.it", "genoa.it", "venezia.it", "venice.it", "bologna.it",
    "palermo.it", "bari.it", "catania.it", "cagliari.it", "verona.it",
    "padova.it", "padua.it", "trieste.it", "brescia.it", "bergamo.it",
    "modena.it", "parma.it", "pisa.it", "siena.it", "trento.it",
    "bolzano.it", "ancona.it", "perugia.it", "pescara.it", "lecce.it",
    "salerno.it", "messina.it", "rimini.it", "ravenna.it", "ferrara.it",
    "pavia.it", "como.it", "cremona.it", "mantova.it", "livorno.it",
    "lucca.it", "pistoia.it", "prato.it", "arezzo.it", "grosseto.it",
    "latina.it", "frosinone.it", "viterbo.it", "rieti.it", "terni.it",
    "macerata.it", "taranto.it", "brindisi.it", "foggia.it", "matera.it",
    "potenza.it", "cosenza.it", "catanzaro.it", "crotone.it",
    "trapani.it", "agrigento.it", "caltanissetta.it", "enna.it",
    "ragusa.it", "siracusa.it", "sassari.it", "nuoro.it", "oristano.it",
    "novara.it", "alessandria.it", "asti.it", "cuneo.it", "vercelli.it",
    "biella.it", "imperia.it", "savona.it", "caserta.it", "benevento.it",
    "avellino.it", "campobasso.it", "isernia.it", "chieti.it",
    "teramo.it", "udine.it", "pordenone.it", "gorizia.it", "rovigo.it",
    "vicenza.it", "treviso.it", "belluno.it", "varese.it", "lecco.it",
    "lodi.it", "sondrio.it", "piacenza.it", "verbania.it", "fermo.it",
    "monza.it", "vibo-valentia.it", "reggio-calabria.it",
    "reggio-emilia.it", "la-spezia.it", "ascoli-piceno.it",
    "pesaro-urbino.it", "forli-cesena.it", "massa-carrara.it",
    // round 15 growth — the blogspot ccTLD family (PSL private
    // section: each country mirror is its own registry)
    "blogspot.co.uk", "blogspot.com.au", "blogspot.ca", "blogspot.de",
    "blogspot.fr", "blogspot.it", "blogspot.es", "blogspot.pt",
    "blogspot.nl", "blogspot.be", "blogspot.ch", "blogspot.se",
    "blogspot.dk", "blogspot.fi", "blogspot.no", "blogspot.ie",
    "blogspot.in", "blogspot.jp", "blogspot.kr", "blogspot.sg",
    "blogspot.hk", "blogspot.tw", "blogspot.com.br", "blogspot.mx",
    "blogspot.com.ar", "blogspot.cl", "blogspot.ru", "blogspot.cz",
    "blogspot.sk", "blogspot.hu", "blogspot.ro", "blogspot.gr",
    "blogspot.co.at", "blogspot.co.nz", "blogspot.co.il", "blogspot.ae",
    // round 15 growth — private-section operators (hosting / dynamic
    // DNS registries whose children are independent sites)
    "eu.org", "duckdns.org", "dyndns.org", "ddns.net", "no-ip.biz",
    "no-ip.info", "no-ip.org", "hopto.org", "zapto.org", "sytes.net",
    "ngrok.io", "gitbook.io", "hashnode.dev", "shinyapps.io",
    "pythonanywhere.com", "deno.dev", "streamlit.app", "hf.space",
    "azurestaticapps.net", "trafficmanager.net", "elasticbeanstalk.com",
    "now.sh", "keybase.pub", "js.org", "translate.goog",
    "cloudfunctions.net", "run.app", "codeberg.page",
    "000webhostapp.com", "up.railway.app",
    // round 15 growth, band 2 — Hungary's thematic second-levels (the
    // .hu registry's well-known subject-matter registries)
    "2000.hu", "agrar.hu", "bolt.hu", "casino.hu", "city.hu",
    "erotica.hu", "erotika.hu", "film.hu", "forum.hu", "games.hu",
    "hotel.hu", "ingatlan.hu", "jogasz.hu", "konyvelo.hu", "lakas.hu",
    "media.hu", "news.hu", "reklam.hu", "sex.hu", "shop.hu", "sport.hu",
    "suli.hu", "szex.hu", "tozsde.hu", "utazas.hu", "video.hu",
    // Norway's geographic registries — the ASCII-rendered municipality
    // names (Norid registers under every kommune; the IDN renderings
    // of ø/å names are omitted — this table is ASCII-only by the
    // wellFormed invariant)
    "oslo.no", "bergen.no", "trondheim.no", "stavanger.no", "drammen.no",
    "kristiansand.no", "fredrikstad.no", "sandnes.no", "sarpsborg.no",
    "skien.no", "lillehammer.no", "hamar.no", "halden.no", "moss.no",
    "molde.no", "narvik.no", "arendal.no", "haugesund.no", "alesund.no",
    "bodo.no", "tromso.no",
    // Poland geographic, band 2 — regions and remaining well-known
    // city registries
    "mazury.pl", "mazowsze.pl", "malopolska.pl", "slask.pl",
    "pomorze.pl", "podlasie.pl", "warmia.pl", "kaszuby.pl", "podhale.pl",
    "beskidy.pl", "gliwice.pl", "kalisz.pl", "konin.pl", "legnica.pl",
    "pila.pl", "plock.pl", "sopot.pl", "zakopane.pl",
    // private-section operators, band 2 (site builders / object-store
    // public buckets whose children are independent sites)
    "r2.dev", "carrd.co", "crd.co", "mystrikingly.com", "square.site",
    "godaddysites.com", "jimdosite.com", "bubbleapps.io", "cargo.site",
    "super.site", "framer.app", "framer.website", "wpcomstaging.com",
    "co.nl", "co.no",
    // Yemen (round 16, ADVICE fix): upstream replaced the historical
    // *.ye wildcard with explicit second-levels — as a wildcard, ANY
    // <name>.ye became a public suffix and real hosts (y.net.ye)
    // mis-rooted one level too deep
    "com.ye", "edu.ye", "gov.ye", "mil.ye", "net.ye", "org.ye",
    // Poland thematic second-levels (round 16 band 3): the classic
    // NASK functional registries next to the geographic ones
    "agro.pl", "aid.pl", "atm.pl", "auto.pl", "gmina.pl", "gsm.pl",
    "irc.pl", "mail.pl", "media.pl", "miasta.pl", "ngo.pl",
    "nieruchomosci.pl", "nom.pl", "pc.pl", "powiat.pl", "priv.pl",
    "realestate.pl", "rel.pl", "sex.pl", "shop.pl", "sklep.pl",
    "sos.pl", "szkola.pl", "targi.pl", "tm.pl", "tourism.pl",
    "turystyka.pl",
    // Norway municipality registries, band 3 (round 16) — natively
    // ASCII kommune names only (the å/ø names ship as punycode
    // upstream; this table is ASCII-only by the wellFormed invariant),
    // restricted to municipalities that SURVIVED the 2020 reform
    // under their own name (merged names like askim/mandal are
    // deliberately out; eigersund.no is IN — Eigersund kommune
    // survived the reform — while the town form egersund stays out,
    // the upstream list registers the kommune name)
    "sandefjord.no", "larvik.no", "kongsberg.no", "horten.no",
    "porsgrunn.no", "harstad.no", "steinkjer.no", "kristiansund.no",
    "eigersund.no", "grimstad.no", "elverum.no", "kongsvinger.no",
    "notodden.no", "stange.no", "flekkefjord.no", "ringerike.no",
    "lillesand.no", "farsund.no", "ringsaker.no", "rana.no",
    // private-section operators, band 3 (round 16): the two still
    // missing from the committed PaaS/tunnel set
    "eu.pythonanywhere.com", "trycloudflare.com",
    // .nz second-levels missing from the committed set (round 16)
    "gen.nz", "kiwi.nz",
    // round 17, band 4 — the 2021 NIXI .in second-level expansion
    // (ICANN section; the classic co/net/org/gov/ac set is committed)
    "5g.in", "6g.in", "ai.in", "am.in", "bihar.in", "biz.in",
    "business.in", "ca.in", "cn.in", "com.in", "coop.in", "cs.in",
    "delhi.in", "dr.in", "er.in", "gujarat.in", "info.in", "int.in",
    "internet.in", "io.in", "me.in", "pg.in", "post.in", "pro.in",
    "travel.in", "tv.in", "uk.in", "up.in", "us.in",
    // round 17, band 4 — the Fastly edge families (private section):
    // customer-assigned hostnames on shared TLS/LB infrastructure
    "fastlylb.net", "map.fastlylb.net", "freetls.fastly.net",
    "map.fastly.net", "a.prod.fastly.net", "global.prod.fastly.net",
    "a.ssl.fastly.net", "b.ssl.fastly.net",
    // round 17, band 4 — the No-IP free-hostname families (private
    // section): each registrant gets an independent site
    "myftp.org", "myftp.biz", "bounceme.net",
    "redirectme.net", "servebeer.com", "serveftp.com", "servegame.com",
    "servehttp.com", "serveirc.com", "serveminecraft.net",
    "servemp3.com", "servepics.com", "servequake.com",
    "servecounterstrike.com", "servehalflife.com", "serveblog.net",
    "myvnc.com", "onthewifi.com", "ddnsking.com", "3utilities.com",
    "gotdns.ch", "webhop.me",
    // round 17, band 4 — PaaS/CDN/tunnel operators still missing from
    // the committed private-section set
    "githubusercontent.com", "scm.azurewebsites.net",
    "nfshost.com", "is-a.dev",
    "b-cdn.net", "loca.lt", "ngrok.app", "ngrok.dev",
    "ngrok-free.app", "ngrok-free.dev", "members.linode.com",
    "ip.linodeusercontent.com",
    // round 17, band 5 — registro.br remainder: the thematic
    // categories still missing from the committed set plus the 2017-18
    // city second-levels (each city a registry)
    "ato.br", "bib.br", "bmd.br", "def.br", "dev.br", "enf.br",
    "geo.br", "leg.br", "log.br", "ong.br", "rep.br", "tec.br",
    "rio.br", "salvador.br", "bsb.br", "sampa.br", "poa.br", "bhz.br",
    "recife.br", "fortal.br", "floripa.br", "natal.br", "manaus.br",
    "curitiba.br", "goiania.br", "campinas.br", "joinville.br",
    "londrina.br", "maceio.br", "cuiaba.br", "palmas.br", "niteroi.br",
    // round 17, band 5 — .za second-levels missing from the committed
    // dozen (the ZADNA charter set)
    "agric.za", "alt.za", "ngo.za",
    // round 17, band 5 — .tr registered-email second level
    "kep.tr",
    // round 17, band 5 — .ua remainder: the oblast/city registries'
    // other transliteration forms + the generic second-levels
    "nikolaev.ua", "rovno.ua", "sebastopol.ua", "sevastopol.ua",
    "sm.ua", "uz.ua", "vinnytsia.ua", "volyn.ua", "yalta.ua",
    "zaporizhzhia.ua", "zhytomyr.ua", "biz.ua", "co.ua", "pp.ua",
    // round 17, band 5 — AFNIC sector registries missing from the
    // committed .fr set (professions + chambers)
    "avoues.fr", "cci.fr", "geometre-expert.fr", "greta.fr",
    "huissier-justice.fr",
    // round 17, band 5 — NASK geographic registries, band 3 (city
    // names still missing from bands 1-2)
    "czest.pl", "elblag.pl", "gdynia.pl", "gorzow.pl", "zgora.pl",
    "lomza.pl", "tarnow.pl", "bielawa.pl",
    // round 18, band 6 — ccTLD second-levels still missing from the
    // committed set: Fiji's explicit list (upstream retired the *.fj
    // wildcard for named registries), plus stragglers in the committed
    // .ke/.ng/.cy families
    "ac.fj", "biz.fj", "com.fj", "gov.fj", "info.fj", "mil.fj",
    "name.fj", "net.fj", "org.fj", "pro.fj",
    "mobi.ke", "name.ng", "mobi.ng", "i.ng", "mil.cy",
    // round 18, band 6 — private-section operators: PaaS families that
    // joined the list after the committed bands (Replit's post-repl.co
    // domains, DigitalOcean App Platform, AWS Amplify/App Runner/
    // Global Accelerator, Firebase dynamic links, Google Cloud
    // customer domains) and the dynamic-DNS registries still missing
    "replit.app", "replit.dev", "ondigitalocean.app", "amplifyapp.com",
    "awsapprunner.com", "awsglobalaccelerator.com", "page.link",
    "cloud.goog",
    "dynv6.net", "mooo.com", "freemyip.com", "nsupdate.info",
    "spdns.de", "spdns.org") ++
    // Bulgaria: the PSL registers every single alphanumeric label as a
    // second level — [0-9a-z].bg (rendered by comprehension; the
    // characters ARE the table)
    (('a' to 'z') ++ ('0' to '9')).map(c => s"$c.bg") ++
    // United States: <st>.us plus the k12/cc/lib third-levels per state
    usStates.flatMap(st => Seq(s"$st.us", s"k12.$st.us", s"cc.$st.us", s"lib.$st.us"))

  /** Wildcard rules, stored as the TAIL after `*.` — `*.ck` is "ck",
    * `*.kawasaki.jp` is "kawasaki.jp". Every child of a tail is a
    * public suffix.
    */
  val wildcardTails: Seq[String] = Seq(
    "ck", "er", "fk", "np", "pg", "bd", "kh", "mm", "jm",
    // Japanese city wildcards (the PSL's canonical wildcard+exception
    // cluster: every ward of these cities is a registry, but the city
    // government itself sits at city.<city>.jp)
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
    // round 15 growth, band 2 — `*.sch.uk` (UK schools register one
    // level deeper, at <school>.<la>.sch.uk) and the AWS compute /
    // load-balancer families (every EC2 public hostname / ELB is an
    // independent site — the PSL's deepest well-known wildcards,
    // which push maxSuffixDepth to 5)
    "sch.uk", "compute.amazonaws.com", "compute-1.amazonaws.com",
    "compute.amazonaws.com.cn", "elb.amazonaws.com",
    // round 16 (ADVICE fix): upstream carries the CN load-balancer
    // wildcard next to the global one
    "elb.amazonaws.com.cn")

  /** Exception rules, stored without the `!` — `!www.ck` is "www.ck":
    * NOT a public suffix despite the parent wildcard; it is itself the
    * registrable domain for any host at or under it.
    */
  val exceptions: Seq[String] = Seq(
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  /** Label count of a dotted rule. */
  def depth(s: String): Int = s.count(_ == '.') + 1

  /** Deepest public suffix any rule can name (wildcards add one label
    * over their tail) — bounds the lookup walk in both dialects.
    */
  val maxSuffixDepth: Int =
    (exact.map(depth) ++ wildcardTails.map(depth(_) + 1)).max

  private def wellFormed(s: String): Boolean = s == s.toLowerCase &&
    s.split('.').forall(l => l.nonEmpty && l.forall(c => c.isLetterOrDigit || c == '-'))

  require(exact.forall(s => s.contains('.') && wellFormed(s)),
    "exact entries must be lowercase multi-label dotted names")
  require(exact.distinct.size == exact.size, "duplicate exact entries")
  require(wildcardTails.forall(wellFormed), "malformed wildcard tail")
  require(wildcardTails.distinct.size == wildcardTails.size,
    "duplicate wildcard tails")
  require(exceptions.forall(e => wellFormed(e) &&
    wildcardTails.contains(e.split('.').drop(1).mkString("."))),
    "every exception must carve out a committed wildcard (PSL invariant)")
  require(exceptions.distinct.size == exceptions.size, "duplicate exceptions")
  // a name listed as BOTH an exception and an exact rule would be
  // resolved as the exception (the resolvers probe exceptions first —
  // which is also upstream's prevailing-rule order: exception beats
  // everything), making the exact entry dead data; reject it at init
  // as table hygiene, not as a PSL-semantics claim
  require(exact.toSet.intersect(exceptions.toSet).isEmpty,
    "an exception must not also be an exact rule (the exact entry would be dead)")
  // NOTE deliberately NO disjointness require between `exact` and
  // `wildcardTails`: upstream PSL semantics allow `foo.example` and
  // `*.foo.example` to coexist (the wildcard does NOT imply its tail
  // is a suffix, and listing both is legal and meaningful). Both
  // resolvers handle the coexistence by construction — the per-depth
  // probe is longest-match descending, so a host deep enough to match
  // the wildcard child (suffix depth d+1) resolves there, and a
  // shallower host falls through to the exact rule (suffix depth d) —
  // exactly upstream's prevailing-rule ordering. UrlKernelSpec pins it.
}
