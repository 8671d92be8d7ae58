"""Public Suffix List support for registered-domain extraction.

``PSL_RULES`` is a vendored snapshot SUBSET of the Public Suffix List
(https://publicsuffix.org/list/ — public content, MPL-2.0), covering the
multi-label ccTLD registries, the US locality scheme (``k12.<state>.us``
etc.), and the wildcard/exception rule families, in the list's own rule
syntax (``co.uk``, ``*.ck``, ``!www.ck``). Single-label TLDs need no
entry: the PSL's implicit default rule ``*`` (public suffix = the last
label) is built into the algorithm. A full current snapshot can be
swapped in by passing its rule lines to any ``rules=`` parameter — the
machinery is rule-set-agnostic.

The matching algorithm is the published one (publicsuffix.org/list/):
among all rules matching a host, the EXCEPTION rule wins if any, else
the rule with the most labels; a wildcard ``*.X`` matches one extra
label beyond ``X``; the registered (registrable) domain is the public
suffix plus one more label. A host that IS a public suffix has no
registered domain — we return the host itself (documented choice: it
keeps the column total and groups such rows under the suffix).

Three faces, one rule set:

- :func:`registered_domain_py` — driver-side scalar reference (blocklist
  normalization, unit oracles);
- :func:`psl_rule_rows` — (key, nk, plen, exc) rows for the Spark
  broadcast map join in ``sources.warc.registered_domain_psl``;
- :func:`psl_rules_values_sql` — the same rows as a DuckDB VALUES CTE
  for driver-row oracles.

Citation: the reference engine has no URL/domain surface at all
(SURVEY.md §2.2) — this is a scale-pipeline extension.
"""

from __future__ import annotations

import re
from functools import lru_cache

_US_STATES = (
    "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me "
    "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx "
    "ut va vt wa wi wv wy"
).split()

PSL_RULES: tuple[str, ...] = tuple(
    # --- multi-label ccTLD registries (PSL snapshot subset) ---
    "co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk nhs.uk "
    "police.uk "
    "ac.jp ad.jp co.jp ed.jp go.jp gr.jp lg.jp ne.jp or.jp "
    "com.au net.au org.au edu.au gov.au asn.au id.au "
    "ac.nz co.nz geek.nz gen.nz govt.nz iwi.nz maori.nz net.nz org.nz "
    "school.nz "
    "com.br net.br org.br gov.br edu.br mil.br art.br blog.br "
    "co.in firm.in net.in org.in gen.in ind.in ac.in edu.in res.in "
    "gov.in mil.in nic.in "
    "ac.za co.za edu.za gov.za law.za mil.za net.za org.za school.za "
    "web.za "
    "ac.cn com.cn edu.cn gov.cn net.cn org.cn mil.cn "
    "ac.kr co.kr es.kr go.kr hs.kr kg.kr mil.kr ms.kr ne.kr or.kr pe.kr "
    "re.kr sc.kr "
    "com.tw edu.tw gov.tw idv.tw mil.tw net.tw org.tw "
    "com.mx net.mx org.mx edu.mx gob.mx "
    "com.ar edu.ar gob.ar gov.ar int.ar mil.ar net.ar org.ar "
    "av.tr bbs.tr bel.tr biz.tr com.tr dr.tr edu.tr gen.tr gov.tr "
    "info.tr k12.tr net.tr org.tr web.tr "
    "ac.il co.il gov.il idf.il k12.il muni.il net.il org.il "
    "com.sg edu.sg gov.sg net.sg org.sg "
    "com.hk edu.hk gov.hk idv.hk net.hk org.hk "
    "ac.id biz.id co.id desa.id go.id mil.id my.id net.id or.id sch.id "
    "web.id "
    "ac.th co.th go.th in.th mi.th net.th or.th "
    "com.my net.my org.my gov.my edu.my mil.my name.my "
    "com.ph net.ph org.ph gov.ph edu.ph ngo.ph mil.ph i.ph "
    "com.vn net.vn org.vn edu.vn gov.vn int.vn ac.vn biz.vn info.vn "
    "name.vn pro.vn health.vn "
    "com.pl net.pl org.pl edu.pl gov.pl "
    "asso.fr com.fr gouv.fr nom.fr prd.fr tm.fr "
    "gov.it edu.it "
    "co.at or.at ac.at gv.at "
    "co.ve com.ve edu.ve gob.ve net.ve org.ve "
    "com.co edu.co gov.co net.co org.co "
    "com.pe edu.pe gob.pe net.pe org.pe "
    "com.eg edu.eg gov.eg net.eg org.eg "
    "com.sa edu.sa gov.sa net.sa org.sa med.sa pub.sa "
    "co.ke or.ke ne.ke go.ke ac.ke sc.ke "
    "com.ng edu.ng gov.ng net.ng org.ng "
    # --- US locality scheme ---
    "dc.us fed.us isa.us kids.us nsn.us "
    "pvt.k12.ma.us chtr.k12.ma.us paroch.k12.ma.us".split()
) + tuple(
    f"{p}.{s}.us" if p else f"{s}.us"
    for s in _US_STATES
    for p in ("", "k12", "cc", "lib")
) + (
    # --- wildcard rules and their exceptions ---
    "*.ck", "!www.ck",
    "*.bd", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg",
    "*.ye",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kitakyushu.jp", "!city.kitakyushu.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.nagoya.jp", "!city.nagoya.jp",
    "*.sapporo.jp", "!city.sapporo.jp",
    "*.sendai.jp", "!city.sendai.jp",
    "*.yokohama.jp", "!city.yokohama.jp",
)

# deepest rule key in the snapshot (pvt.k12.ma.us = 4 labels); the join
# machinery probes host suffixes of 1..PSL_MAX_KEY_LABELS labels
PSL_MAX_KEY_LABELS = 4

_IPV4 = re.compile(r"\d+\.\d+\.\d+\.\d+")


def psl_rule_rows(rules=None) -> list[tuple[str, int, int, bool]]:
    """Rule table for equality-join matching: EXACTLY one row per key as
    (key, nk, plen, exc) where ``key`` is the literal label suffix to
    equality-match (wildcard ``*.X`` keys on X), ``nk`` = len(key
    labels), ``plen`` = the public-suffix length this rule declares
    (rule labels; +1 for wildcard; -1 for exception per the PSL
    algorithm), ``exc`` = exception flag.

    Key uniqueness is what makes the per-depth LEFT JOINs in
    ``sources.warc.registered_domain_psl`` (and its SQL twin) row-count
    preserving. Same-key collisions fold per the published algorithm:
    an exception rule beats any normal rule with the same key (whenever
    the normal rule matches a host, the exception matches too, and the
    PSL algorithm lets any exception win), and within a kind the max
    plen wins. The real PSL never collides an exception key with a
    normal key — the fold only defends caller-supplied ``rules=`` sets.

    The table build (parse + fold + sort) is cached per rule set —
    driver-side scalar paths like ``registered_domain_py`` call this
    once per blocklist ENTRY, so an uncached build would cost
    O(entries x rules) on a ~1M-entry UT1 list."""
    key = tuple(rules) if rules is not None else None
    return list(_psl_rule_rows_cached(key))


@lru_cache(maxsize=32)
def _psl_rule_rows_cached(
    rules_key: tuple[str, ...] | None,
) -> tuple[tuple[str, int, int, bool], ...]:
    out: dict[str, tuple[str, int, int, bool]] = {}
    for rule in rules_key if rules_key is not None else PSL_RULES:
        rule = rule.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        exc = rule.startswith("!")
        wild = rule.startswith("*.")
        key = rule.lstrip("!")
        if wild:
            key = key[2:]
        nlab = key.count(".") + 1
        plen = nlab - 1 if exc else (nlab + 1 if wild else nlab)
        prev = out.get(key)
        if prev is None or (exc, plen) > (prev[3], prev[2]):
            out[key] = (key, nlab, plen, exc)
    return tuple(sorted(out.values()))


def public_suffix_len(host: str, rules=None) -> int:
    """Length in labels of the host's public suffix under the rule set
    (the PSL algorithm: exception wins, else most-labels match, else the
    implicit ``*`` default of 1)."""
    labels = host.split(".")
    n = len(labels)
    best, best_exc = 1, None
    for key, nk, plen, exc in psl_rule_rows(rules):
        if nk > n:
            continue
        if ".".join(labels[n - nk :]) != key:
            continue
        if exc:
            if best_exc is None or plen > best_exc:
                best_exc = plen
        elif plen > best:
            best = plen
    return best_exc if best_exc is not None else best


def registered_domain_py(host_or_url: str, rules=None) -> str:
    """Driver-side scalar reference of the PSL registered domain —
    mirrors ``sources.warc.registered_domain_psl`` exactly (blocklist
    normalization and unit oracles use this). Accepts a bare host or a
    full URL (scheme/userinfo/path/port tolerated, host-first like
    ``url_host``)."""
    host = host_or_url.strip().lower()
    host = host.split("://", 1)[-1]
    host = host.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    host = host.rsplit("@", 1)[-1]
    host = re.sub(r"^(\[[^\]]*\]|[^:]*):\d+$", r"\1", host)
    if _IPV4.fullmatch(host):
        return host
    labels = host.split(".")
    n = len(labels)
    plen = public_suffix_len(host, rules)
    if n <= plen:
        return host
    return ".".join(labels[n - plen - 1 :])


def psl_rules_values_sql(rules=None) -> str:
    """The rule table as a DuckDB VALUES body (key, nk, plen, exc) —
    splice into a CTE: ``psl(key, nk, plen, exc) AS (VALUES {this})`` so
    driver-row oracles match against the IDENTICAL vendored rule set."""
    rows = psl_rule_rows(rules)
    return ", ".join(
        f"('{k}', {nk}, {plen}, {'true' if exc else 'false'})"
        for k, nk, plen, exc in rows
    )
