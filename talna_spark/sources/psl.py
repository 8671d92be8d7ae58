"""Public Suffix List support for registered-domain extraction.

``PSL_RULES`` is the FULL vendored snapshot of the Public Suffix List
(https://publicsuffix.org/list/ — public content, MPL-2.0; the
complete ~9.5k-rule file ships alongside this module as
``public_suffix_list.dat`` with its license header intact), both the
ICANN and PRIVATE sections, in the list's own rule syntax (``co.uk``,
``*.ck``, ``!www.ck``). The list stores IDN rules in Unicode; the
loader adds a PUNYCODE TWIN (``xn--`` labels via IDNA) for every
non-ASCII rule so that hosts in either form match (r9 — previously a
~480-rule subset, and punycode hosts fell back to the naive
last-two-labels rule). Single-label TLDs need no entry: the PSL's
implicit default rule ``*`` (public suffix = the last label) is built
into the algorithm. A different snapshot can be swapped in by passing
its rule lines to any ``rules=`` parameter — the machinery is
rule-set-agnostic.

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

import os
import re
from functools import lru_cache

_SNAPSHOT = os.path.join(os.path.dirname(__file__), "public_suffix_list.dat")


def _load_rules() -> tuple[str, ...]:
    """Parse the vendored snapshot (comments/blanks dropped, lowered)
    and append punycode twins for Unicode rules.

    Twin encoding uses the stdlib ``idna`` codec (IDNA2003). Zero
    IDNA2003-vs-UTS46 drift on the current snapshot (verified against
    the uts46 library in r9); a FUTURE snapshot could contain labels the
    2003 codec rejects (sharp-s, final sigma, joiners), so a rule that
    fails to encode raises at import — loud, not a silently missing
    twin. If that fires on a snapshot swap, vendor the UTS46 mapping or
    pre-encode the offending twins into the .dat file."""
    rules: list[str] = []
    with open(_SNAPSHOT, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            rules.append(line.lower())
    out = list(rules)
    for r in rules:
        if r.isascii():
            continue
        prefix = ""
        key = r
        if key.startswith("!"):
            prefix, key = "!", key[1:]
        if key.startswith("*."):
            prefix, key = prefix + "*.", key[2:]
        try:
            puny = ".".join(
                lab if lab.isascii() else lab.encode("idna").decode("ascii")
                for lab in key.split(".")
            )
        except UnicodeError as e:
            raise RuntimeError(
                f"PSL rule {r!r} has no IDNA2003 punycode twin — "
                "snapshot needs a pre-encoded twin or a UTS46 mapper"
            ) from e
        if puny != key:
            out.append(prefix + puny)
    return tuple(out)

PSL_RULES: tuple[str, ...] = _load_rules()

# deepest rule key in the snapshot (5 labels in the current full list);
# the join machinery probes host suffixes of 1..PSL_MAX_KEY_LABELS labels
PSL_MAX_KEY_LABELS = max(
    r.lstrip("!").removeprefix("*.").count(".") + 1 for r in PSL_RULES
)

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


@lru_cache(maxsize=32)
def _psl_rule_map(
    rules_key: tuple[str, ...] | None,
) -> tuple[dict, int]:
    """(key -> (plen, exc) map, max key depth) for O(depth) host
    lookups — with the full ~10k-rule snapshot, the linear rule scan
    the subset era could afford would cost O(entries x rules) on a
    ~1M-entry blocklist (r9)."""
    rows = _psl_rule_rows_cached(rules_key)
    return (
        {key: (plen, exc) for key, _nk, plen, exc in rows},
        max((nk for _k, nk, _p, _e in rows), default=1),
    )


def public_suffix_len(host: str, rules=None) -> int:
    """Length in labels of the host's public suffix under the rule set
    (the PSL algorithm: exception wins, else most-labels match, else the
    implicit ``*`` default of 1). Probes the host's 1..max-depth label
    suffixes against a cached hash map — the scalar twin of the
    broadcast equality-joins in ``registered_domain_psl``."""
    rmap, maxk = _psl_rule_map(tuple(rules) if rules is not None else None)
    labels = host.split(".")
    n = len(labels)
    best, best_exc = 1, None
    for nk in range(1, min(n, maxk) + 1):
        hit = rmap.get(".".join(labels[n - nk :]))
        if hit is None:
            continue
        plen, exc = hit
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
