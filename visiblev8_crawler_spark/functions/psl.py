"""Public-suffix eTLD+1 (the ``url_etld1`` column contract,
vv8_backend_database/init/2_mega_vv8_postgres_schema.sql:24).

The reference derives url_etld1 with a public-suffix-list library; round 1
shipped a last-2-labels approximation that is wrong for multi-label
suffixes (``example.co.uk`` -> ``co.uk``). This module implements the PSL
algorithm proper over a bundled, curated snapshot of the list
(publicsuffix.org — only multi-label rules matter: the PSL default rule
``*`` already makes any unknown single-label TLD a suffix).

Spark-first design: NO join and NO Python UDF — the host's last-k label
strings are tested for membership in literal sets, which Catalyst compiles
to InSet (O(1) hash probe inside whole-stage codegen). A broadcast-join
variant would also work but would turn every canonicalization projection
into a join; a few hundred InSet entries are cheaper and keep
``with_canonical`` map-only. The pure-Python mirror below implements the
identical decision tree so the reference simulator agrees bit-for-bit.

PSL semantics implemented (longest matching rule wins):
- exact rules  (``co.uk``)        -> suffix = the rule
- wildcard rules (``*.ck``)       -> suffix = one label + base
- exception rules (``!www.ck``)   -> suffix = rule minus its leftmost label
- default rule (``*``)            -> suffix = last label
eTLD+1 = suffix plus one preceding label; '' when the host IS a suffix
(no registrable domain).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Curated snapshot of multi-label PSL rules (ICANN section + high-traffic
# private-section entries). 1-label exact rules are omitted on purpose:
# they coincide with the default rule. Round 3 grew the snapshot ~3x
# (Latin America, Africa, Middle East, Central Asia, the 47 Japanese
# prefecture suffixes, the US state hierarchy) and added 4-label-rule
# support; it remains a curated subset of the ~9k-rule published list —
# the coverage limit is documented at the url_etld1 contract site
# (functions/urls.py) and in README.
_JP_PREFECTURES = """
aichi akita aomori chiba ehime fukui fukuoka fukushima gifu gunma hiroshima
hokkaido hyogo ibaraki ishikawa iwate kagawa kagoshima kanagawa kochi
kumamoto kyoto mie miyagi miyazaki nagano nagasaki nara niigata oita okayama
okinawa osaka saga saitama shiga shimane shizuoka tochigi tokushima tokyo
tottori toyama wakayama yamagata yamaguchi yamanashi
""".split()

_US_STATES = """
ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me mi mn mo
ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx ut va vt wa wi wv wy
""".split()

_EXACT = """
ac.uk co.uk gov.uk ltd.uk me.uk net.uk nhs.uk org.uk plc.uk police.uk
com.au net.au org.au edu.au gov.au asn.au id.au act.au nsw.au nt.au qld.au sa.au tas.au vic.au wa.au
act.edu.au nsw.edu.au nt.edu.au qld.edu.au sa.edu.au tas.edu.au vic.edu.au wa.edu.au
co.jp or.jp ne.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
ide.kyoto.jp
com.br net.br org.br gov.br edu.br mil.br art.br blog.br eco.br
co.in net.in org.in firm.in gen.in ind.in ac.in edu.in res.in gov.in mil.in nic.in
com.cn net.cn org.cn gov.cn edu.cn ac.cn mil.cn
com.mx net.mx org.mx gob.mx edu.mx
co.za net.za org.za gov.za ac.za web.za
com.ar net.ar org.ar gob.ar edu.ar int.ar mil.ar musica.ar tur.ar
co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz kiwi.nz maori.nz iwi.nz mil.nz
com.sg net.sg org.sg edu.sg gov.sg
com.hk net.hk org.hk edu.hk gov.hk idv.hk
com.tw net.tw org.tw edu.tw gov.tw idv.tw ebiz.tw club.tw
co.kr ne.kr or.kr re.kr pe.kr go.kr mil.kr ac.kr hs.kr ms.kr es.kr sc.kr kg.kr seoul.kr busan.kr
com.tr net.tr org.tr edu.tr gov.tr gen.tr web.tr av.tr bbs.tr bel.tr biz.tr dr.tr info.tr k12.tr name.tr pol.tr tel.tr tv.tr
co.il net.il org.il ac.il gov.il muni.il idf.il k12.il
com.ua net.ua org.ua edu.ua gov.ua in.ua co.ua biz.ua kiev.ua kharkov.ua odessa.ua lviv.ua
com.ru net.ru org.ru pp.ru msk.ru spb.ru
co.id net.id org.id web.id ac.id sch.id go.id mil.id biz.id my.id or.id ponpes.id desa.id
com.my net.my org.my edu.my gov.my mil.my name.my
com.ph net.ph org.ph edu.ph gov.ph mil.ph ngo.ph i.ph
com.vn net.vn org.vn edu.vn gov.vn int.vn ac.vn biz.vn info.vn name.vn pro.vn health.vn
co.th net.th org.th ac.th go.th in.th mi.th or.th
com.eg net.eg org.eg edu.eg gov.eg sci.eg eun.eg mil.eg name.eg
com.sa net.sa org.sa edu.sa gov.sa med.sa pub.sa sch.sa
com.pk net.pk org.pk edu.pk gov.pk fam.pk biz.pk web.pk gok.pk gon.pk gop.pk gos.pk
com.bd net.bd org.bd edu.bd gov.bd ac.bd mil.bd
com.ng net.ng org.ng edu.ng gov.ng name.ng sch.ng mobi.ng i.ng
co.ke or.ke ne.ke go.ke ac.ke sc.ke me.ke mobi.ke info.ke
co.us dni.us fed.us isa.us kids.us nsn.us
co.ca gc.ca
co.at or.at ac.at gv.at
co.it
co.cz
co.pl com.pl net.pl org.pl edu.pl gov.pl info.pl waw.pl
co.hu org.hu
com.gr net.gr org.gr edu.gr gov.gr
com.pt net.pt org.pt edu.pt gov.pt publ.pt
com.es nom.es org.es gob.es edu.es
co.ro com.ro org.ro nt.ro arts.ro firm.ro info.ro rec.ro store.ro tm.ro www.ro
com.co net.co org.co edu.co gov.co mil.co nom.co
co.cr ac.cr ed.cr fi.cr go.cr or.cr sa.cr
com.pe net.pe org.pe edu.pe gob.pe mil.pe nom.pe
com.ve net.ve org.ve co.ve edu.ve gob.ve mil.ve info.ve web.ve
com.ec net.ec org.ec edu.ec gob.ec gov.ec mil.ec fin.ec med.ec pro.ec info.ec
com.bo net.bo org.bo edu.bo gob.bo mil.bo int.bo tv.bo web.bo
com.py net.py org.py edu.py gov.py mil.py coop.py
com.uy net.uy org.uy edu.uy gub.uy mil.uy
com.gt net.gt org.gt edu.gt gob.gt mil.gt ind.gt
com.sv org.sv edu.sv gob.sv red.sv
com.ni net.ni org.ni edu.ni gob.ni mil.ni co.ni ac.ni biz.ni info.ni in.ni int.ni nom.ni web.ni
com.hn net.hn org.hn edu.hn gob.hn mil.hn
com.pa net.pa org.pa edu.pa gob.pa ac.pa sld.pa abo.pa ing.pa med.pa nom.pa
com.do net.do org.do edu.do gob.do gov.do mil.do sld.do web.do art.do
com.pr net.pr org.pr edu.pr gov.pr isla.pr pro.pr biz.pr info.pr name.pr est.pr prof.pr ac.pr
com.cu net.cu org.cu edu.cu gov.cu inf.cu
co.cl gob.cl gov.cl mil.cl
com.lk org.lk edu.lk ngo.lk soc.lk web.lk ltd.lk assn.lk grp.lk hotel.lk ac.lk gov.lk sch.lk net.lk int.lk
com.kz org.kz edu.kz gov.kz mil.kz net.kz
com.uz co.uz net.uz org.uz
com.kg org.kg net.kg edu.kg gov.kg mil.kg
com.af gov.af edu.af net.af org.af
com.qa edu.qa gov.qa mil.qa name.qa net.qa org.qa sch.qa
com.kw edu.kw emb.kw gov.kw ind.kw net.kw org.kw
com.om co.om edu.om gov.om med.om museum.om net.om org.om pro.om
com.bh edu.bh gov.bh net.bh org.bh
com.jo edu.jo gov.jo mil.jo name.jo net.jo org.jo sch.jo
com.lb edu.lb gov.lb net.lb org.lb
com.sy edu.sy gov.sy mil.sy net.sy org.sy
ac.ir co.ir gov.ir id.ir net.ir org.ir sch.ir
com.iq edu.iq gov.iq mil.iq net.iq org.iq
com.la net.la org.la edu.la gov.la int.la info.la per.la
edu.mn gov.mn org.mn
com.bt edu.bt gov.bt net.bt org.bt
co.tz ac.tz go.tz or.tz ne.tz sc.tz mil.tz hotel.tz info.tz me.tz mobi.tz tv.tz
co.ug ac.ug sc.ug go.ug ne.ug or.ug org.ug com.ug
co.zw ac.zw gov.zw mil.zw org.zw
com.zm co.zm edu.zm gov.zm org.zm ac.zm biz.zm info.zm mil.zm net.zm sch.zm
co.bw org.bw
co.na com.na org.na
com.gh edu.gh gov.gh org.gh mil.gh
com.ci org.ci or.ci co.ci edu.ci ed.ci ac.ci net.ci go.ci asso.ci int.ci md.ci gouv.ci
com.sn art.sn edu.sn gouv.sn org.sn perso.sn univ.sn
co.mz ac.mz gov.mz edu.mz org.mz
com.et gov.et org.et edu.et net.et biz.et name.et info.et
com.ly edu.ly gov.ly net.ly org.ly plc.ly sch.ly med.ly id.ly
com.ma net.ma org.ma ac.ma co.ma gov.ma press.ma
com.tn ens.tn fin.tn gov.tn ind.tn intl.tn nat.tn net.tn org.tn info.tn perso.tn tourism.tn
com.dz gov.dz org.dz edu.dz asso.dz pol.dz art.dz net.dz soc.dz
co.rs org.rs edu.rs in.rs gov.rs ac.rs
co.me net.me org.me edu.me ac.me gov.me its.me priv.me
com.mk org.mk net.mk edu.mk gov.mk inf.mk name.mk
com.ba edu.ba gov.ba mil.ba net.ba org.ba
com.al edu.al gov.al mil.al net.al org.al
com.mt org.mt net.mt edu.mt gov.mt
com.cy org.cy net.cy ac.cy biz.cy ltd.cy pro.cy tm.cy
com.lv edu.lv gov.lv org.lv mil.lv id.lv net.lv asn.lv conf.lv
com.ee org.ee fie.ee pri.ee
com.by gov.by mil.by of.by
com.ge edu.ge gov.ge org.ge mil.ge net.ge pvt.ge
com.am net.am org.am
com.az net.az int.az gov.az org.az edu.az info.az pp.az mil.az name.az pro.az biz.az co.az
co.gg net.gg org.gg
co.je net.je org.je
co.im com.im net.im org.im ac.im
ac.gn com.gn gov.gn net.gn org.gn
com.lc co.lc org.lc edu.lc gov.lc net.lc
com.ag org.ag net.ag co.ag nom.ag
com.bz net.bz org.bz edu.bz gov.bz
com.gi ltd.gi gov.gi mod.gi edu.gi org.gi
com.fj net.fj org.fj ac.fj gov.fj mil.fj school.fj biz.fj info.fj name.fj pro.fj
com.sb net.sb org.sb edu.sb gov.sb
com.vu net.vu org.vu edu.vu
com.ws net.ws org.ws gov.ws edu.ws
com.bn edu.bn gov.bn net.bn org.bn
com.gu edu.gu gov.gu guam.gu net.gu org.gu web.gu
uk.com us.com eu.com gb.net uk.net se.net br.com cn.com de.com jpn.com
ru.com sa.com se.com za.com hu.com no.com qc.com uy.com ar.com kr.com
jp.net in.net gr.com mex.com
github.io gitlab.io blogspot.com herokuapp.com web.app firebaseapp.com
netlify.app vercel.app pages.dev cloudfront.net azurewebsites.net
wordpress.com appspot.com s3.amazonaws.com
workers.dev repl.co glitch.me onrender.com fly.dev deno.dev surge.sh
neocities.org readthedocs.io ngrok.io trycloudflare.com
""".split() + [
    f"{p}.jp" for p in _JP_PREFECTURES
] + [
    f"{s}.us" for s in _US_STATES
] + [
    f"{tier}.{s}.us" for s in _US_STATES for tier in ("k12", "cc", "lib")
]

# wildcard rules "*.base": suffix = <any one label> + base. (fj/gu/bn were
# wildcards in old list revisions; the current list enumerates them, so the
# snapshot does too — round 2 had fj/bn wildcarded.)
_WILDCARD_BASES = [
    "ck", "er", "jm", "kh", "mm", "np", "pg",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
    "sch.uk",  # *.sch.uk (round-2 snapshot mislisted sch.uk as exact)
    "compute.amazonaws.com", "compute-1.amazonaws.com", "elb.amazonaws.com",
]

# exception rules "!name": the name IS registrable (suffix = name minus its
# leftmost label)
_EXCEPTIONS = [
    "www.ck",
    "city.kawasaki.jp",
    "city.kitakyushu.jp",
    "city.kobe.jp",
    "city.nagoya.jp",
    "city.sapporo.jp",
    "city.sendai.jp",
    "city.yokohama.jp",
]

EXACT2 = frozenset(s for s in _EXACT if s.count(".") == 1)
EXACT3 = frozenset(s for s in _EXACT if s.count(".") == 2)
WILD1 = frozenset(b for b in _WILDCARD_BASES if "." not in b)  # *.b, b = 1 label
WILD2 = frozenset(b for b in _WILDCARD_BASES if b.count(".") == 1)  # *.b, b = 2 labels
WILD3 = frozenset(b for b in _WILDCARD_BASES if b.count(".") == 2)  # *.b, b = 3 labels
EXC2 = frozenset(e for e in _EXCEPTIONS if e.count(".") == 1)
EXC3 = frozenset(e for e in _EXCEPTIONS if e.count(".") == 2)
assert all(s.count(".") in (1, 2) for s in _EXACT), "exact rules beyond 3 labels unsupported"
assert all(b.count(".") in (0, 1, 2) for b in _WILDCARD_BASES), "wildcard bases beyond 3 labels unsupported"


def etld1_col(host: Column) -> Column:
    """eTLD+1 as a pure JVM expression tree (InSet membership + slice).

    Decision order = decreasing suffix length, exceptions first — the PSL
    longest-match rule. Returns '' when the host has no registrable domain
    (the host is itself a public suffix) — same contract as the Python
    mirror and the reference library's error case.
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def last(k: int) -> Column:
        return F.concat_ws(".", F.slice(labels, -k, k))

    # suffix length in labels
    slen = (
        F.when((n >= 3) & last(3).isin(*sorted(EXC3)), F.lit(2))
        .when((n >= 2) & last(2).isin(*sorted(EXC2)), F.lit(1))
        .when((n >= 4) & last(3).isin(*sorted(WILD3)), F.lit(4))
        .when((n >= 3) & last(3).isin(*sorted(EXACT3)), F.lit(3))
        .when((n >= 3) & last(2).isin(*sorted(WILD2)), F.lit(3))
        .when((n >= 2) & last(2).isin(*sorted(EXACT2)), F.lit(2))
        .when((n >= 2) & F.element_at(labels, -1).isin(*sorted(WILD1)), F.lit(2))
        .otherwise(F.lit(1))
    )
    k1 = slen + F.lit(1)
    return F.when(
        (n > slen) & (F.length(host) > 0),
        F.concat_ws(".", F.slice(labels, -F.lit(1) * k1, k1)),
    ).otherwise(F.lit(""))


def public_suffix_py(host: str) -> str:
    labels = host.split(".")
    n = len(labels)

    def last(k: int) -> str:
        return ".".join(labels[-k:])

    if n >= 3 and last(3) in EXC3:
        return last(2)
    if n >= 2 and last(2) in EXC2:
        return last(1)
    if n >= 4 and last(3) in WILD3:
        return last(4)
    if n >= 3 and last(3) in EXACT3:
        return last(3)
    if n >= 3 and last(2) in WILD2:
        return last(3)
    if n >= 2 and last(2) in EXACT2:
        return last(2)
    if n >= 2 and labels[-1] in WILD1:
        return last(2)
    return last(1)


def etld1_py(host: str) -> str:
    """Pure-Python mirror of :func:`etld1_col` — identical decision tree."""
    if not host:
        return ""
    labels = host.split(".")
    suffix = public_suffix_py(host)
    slen = suffix.count(".") + 1
    if len(labels) <= slen:
        return ""
    return ".".join(labels[-(slen + 1):])
