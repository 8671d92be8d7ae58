"""Distributed BPE tokenizer training + encoding over the ``documents``
table — the "train a tokenizer on the corpus you just curated" step of an
LLM data pipeline (Sennrich et al. 2016 word-internal BPE: symbols are
characters plus an end-of-word marker, merges never cross word
boundaries).

Scale design:
- The corpus is scanned ONCE, into a word-frequency table (groupBy word —
  vocab-sized, stays distributed). Every training round then runs on that
  table, never on the corpus: explode adjacent symbol pairs weighted by
  word count, one hash aggregate per round (shuffle ∝ distinct pairs),
  argmax collected as a single row (the merge decision IS the model —
  driver-side by nature, like the connected-components convergence
  count). The winning merge is applied map-side with a JVM aggregate()
  fold over the symbol arrays — no Python in the loop.
- Lineage is truncated with a lazy localCheckpoint EVERY round (the
  dedup_clusters pattern): round i's pair scan otherwise re-evaluates
  every merge fold stacked since the last truncation — sum-of-depths
  fold passes instead of one per round (the r11 cadence fix: 13.6 s ->
  7.1 s for 30 byte-mode merges at sf0.1, identical merge list).
- Encoding (:func:`bpe_encode`) broadcasts the learned merge ranks and
  runs the classic greedy lowest-rank-pair loop inside Arrow-batched
  mapInPandas: map-only, bounded memory, the shape tokenizer inference
  always takes at 100 TB. (Training is NOT SQL-expressible — iterative
  argmax — so this module is oracle'd by unit tests against an
  independent pure-Python reference implementation instead of a DuckDB
  twin; see tests/test_bpe.py.)
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talna_spark.pipeline.portable import tokens

EOW = "</w>"  # end-of-word marker, per the original BPE formulation

# ---------------------------------------------------- byte-level (GPT-2)
# r8 (VERDICT r7 item 3): the second training mode — GPT-2-style
# byte-level BPE (Radford et al. 2019, public gpt-2/src/encoder.py
# algorithm): pretokens come from a regex split that keeps the leading
# space attached to the word, the initial alphabet is the 256 bytes of
# the pretoken's UTF-8 encoding (each byte mapped to a printable unicode
# char so symbols stay plain strings), and there is NO end-of-word
# marker. This is the tokenization real training runs pay, so
# `tokenize_pack(mode="byte")` measures the packing length that matters.
#
# GPT-2's pretokenizer regex uses \p{L}/\p{N}; Python's stdlib `re` has
# no \p, so the classes are GENERATED from unicodedata (the same
# codepoint-table trick text.py uses for script classes): \p{L} =
# categories Lu/Ll/Lt/Lm/Lo, \p{N} = Nd/Nl/No, per the running CPython's
# Unicode tables. This is EXACT \p semantics — the r8-r11 approximation
# (\p{L} -> [^\W\d_], \p{N} -> \d) misclassified \p{N}'s non-decimal
# forms (roman numerals, superscripts, fractions) as letters, so
# 'abcⅫ' stayed one pretoken where GPT-2 splits it. The classes are
# precomputed into _gpt2_classes.py (scripts/gen_gpt2_classes.py) so
# import pays a dict lookup, not two 0x110000-codepoint scans (VERDICT
# r12 #3); a runtime whose unicodedata version differs from the
# generated file regenerates in-process — exactness always wins over
# the cache. Closures capture the finished ~15 KB pattern string,
# executors only re.compile it (~12 ms).


def _unicode_class(*prefixes: str) -> str:
    """Regex character-class body covering every codepoint whose
    unicodedata category starts with one of ``prefixes``, as compressed
    \\UXXXXXXXX ranges (escape form is class-metachar-safe). Fallback
    builder — normal imports read the generated constants instead."""
    import sys
    import unicodedata

    cps = [
        cp
        for cp in range(sys.maxunicode + 1)
        if unicodedata.category(chr(cp)).startswith(prefixes)
    ]
    parts: list[str] = []
    s = p = cps[0]
    for c in cps[1:]:
        if c == p + 1:
            p = c
            continue
        parts.append(
            f"\\U{s:08X}" if s == p else f"\\U{s:08X}-\\U{p:08X}"
        )
        s = p = c
    parts.append(f"\\U{s:08X}" if s == p else f"\\U{s:08X}-\\U{p:08X}")
    return "".join(parts)


def _load_classes() -> tuple[str, str]:
    import unicodedata

    from talna_spark.pipeline import _gpt2_classes as g

    if g.UNIDATA_VERSION == unicodedata.unidata_version:
        return g.P_L, g.P_N
    # Unicode tables moved under this interpreter: regenerate so the
    # classes stay exact \p semantics for the RUNNING runtime (and its
    # unicodedata-derived PRETOKENIZER_VERSION below stays honest).
    return _unicode_class("L"), _unicode_class("N")


_P_L, _P_N = _load_classes()  # \p{L}, \p{N}
GPT2_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    rf"| ?[{_P_L}]+| ?[{_P_N}]+| ?[^\s{_P_L}{_P_N}]+"
    r"|\s+(?!\S)|\s+"
)


def _pretokenizer_version() -> str:
    """Identity of the byte-mode pretokenization in effect, stamped into
    persisted merge tables (ADVICE r12: merges trained under a different
    pretokenizer silently re-tokenize differently when loaded — e.g. the
    pre-r12 \\d approximation vs the exact classes, or a CPython with
    newer Unicode tables). ``gpt2-exact/<unidata version>`` — the exact
    \\p classes ARE a function of the Unicode version, so the stamp
    carries it."""
    import unicodedata

    return f"gpt2-exact/{unicodedata.unidata_version}"


PRETOKENIZER_VERSION = _pretokenizer_version()


def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte -> printable-unicode-char table: printable
    latin bytes map to themselves, the rest shift into U+0100.. so every
    byte has a visible, non-whitespace char and symbol strings survive
    any string plumbing unmangled. Bijective — invertible for the id
    scheme."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def pretokenize(text: str) -> list[str]:
    """GPT-2 pretoken split (leading space stays on the word). One source
    of truth for BOTH the training corpus scan and the encoder — the two
    sides cannot drift."""
    import re

    return re.findall(GPT2_PRETOKEN_RE, text)


def _word_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, n, syms): corpus word frequencies with each word split into
    its initial symbol array (characters + EOW). One corpus scan; the
    result is vocab-sized."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = d.select(F.explode(tokens(F.col("text"))).alias("word")).filter(
        F.length("word") > 0
    )
    wt = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    syms = F.concat(
        F.split(F.col("word"), ""),  # one element per character
        F.array(F.lit(EOW)),
    )
    return wt.select("word", "n", syms.alias("syms"))


def _byte_word_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-mode twin of :func:`_word_table`: (word, n, syms) where word
    is a GPT-2 pretoken (space-attached) and syms is its UTF-8 byte
    sequence under the :func:`bytes_to_unicode` alphabet. The corpus is
    scanned once through an Arrow-batched pretokenizer; the byte split
    runs on the vocab-sized distinct table AFTER the groupBy, so the
    Python cost is per distinct pretoken, not per occurrence."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")

    def _pre(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        pat = re.compile(GPT2_PRETOKEN_RE)
        for pdf in batches:
            words: list[str] = []
            for t in pdf["text"]:
                if t:  # NULL text -> empty document
                    words.extend(pat.findall(t))
            yield pd.DataFrame({"word": words})

    wt = (
        d.mapInPandas(_pre, schema="word string")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def _syms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b2u = bytes_to_unicode()
        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = [
                [b2u[b] for b in w.encode("utf-8")] for w in pdf["word"]
            ]
            yield pdf

    return wt.mapInPandas(
        _syms, schema="word string, n long, syms array<string>"
    )


def _init_syms_fn(mode: str):
    """word -> initial symbol list, per mode — shared by the encoders."""
    if mode == "word":
        return lambda w: list(w) + [EOW]
    if mode == "byte":
        b2u = bytes_to_unicode()
        return lambda w: [b2u[b] for b in w.encode("utf-8")]
    raise ValueError(f"unknown BPE mode: {mode!r} (want 'word' or 'byte')")


def _pair_counts(wt: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies weighted by word count — one
    explode + hash aggregate over the vocab-sized table."""
    # guard the fully-merged case (one symbol left): Spark's
    # sequence(1, 0) counts DOWN, so an unguarded transform would index
    # past the array (the portable.shingles pitfall)
    pairs = F.expr(
        "CASE WHEN size(syms) >= 2 THEN "
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(syms[i-1] AS a, syms[i] AS b)) "
        "ELSE CAST(array() AS array<struct<a: string, b: string>>) END"
    )
    return (
        wt.select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(
    wt: DataFrame, a: str, b: str, merged: "str | None" = None
) -> DataFrame:
    """Replace every adjacent (a, b) in the symbol arrays with the merged
    symbol, greedily left-to-right (standard BPE: 'aaa' + (a,a) ->
    [aa, a]) — a JVM aggregate() fold with a (out, carry) accumulator,
    no Python. ``merged`` overrides the merged-symbol name (BPE
    concatenates verbatim; WordPiece strips the right side's '##'
    continuation prefix — pipeline.wordpiece reuses this fold)."""
    if merged is None:
        merged = a + b
    fold = F.aggregate(
        F.col("syms"),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("carry"),
        ),
        lambda acc, s: F.when(
            acc["carry"].isNull(),
            F.struct(acc["out"].alias("out"), s.alias("carry")),
        )
        .when(
            (acc["carry"] == F.lit(a)) & (s == F.lit(b)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                s.alias("carry"),
            )
        ),
        lambda acc: F.when(
            acc["carry"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["carry"]))),
    )
    return wt.select("word", "n", fold.alias("syms"))


# r17 optimization (guide §1.2 "the distributed algorithm" + §5 "the
# driver should do almost no data work" — EXCEPT model-sized work, which
# is driver work by nature): the per-round training jobs run over the
# VOCAB-SIZED word table, so when that table fits comfortably on the
# driver the whole merge loop is a model-sized computation — collect it
# once and run the loop in-process, replacing 30 rounds x (checkpoint +
# pair hash-agg + 1-row argmax collect) of fixed per-job latency with
# ONE job. Above the cap the distributed rounds remain (the 100 TB
# path: a web-scale pretoken table can exceed driver memory). Both
# paths are exact-identical: integer pair counts in any order, the
# same (count DESC, (a, b) ASC) tie-break — Spark compares strings as
# UTF-8 bytes, which is code-point order, which is Python str order —
# and the same greedy left-to-right merge application. Pinned by
# tests/test_bpe.py (the pure-python reference) plus an explicit
# local-vs-distributed equality test.
DRIVER_TRAIN_MAX_WORDS = 65_536


def _merge_word_syms(syms: list, a: str, b: str, merged: str) -> list:
    """Greedy left-to-right (a, b) -> merged over one symbol list — the
    local twin of the JVM ``_apply_merge`` fold ('aaa' + (a,a) -> [aa, a])."""
    out: list = []
    i, n = 0, len(syms)
    while i < n:
        if syms[i] == a and i + 1 < n and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _local_train_loop(
    words: list, n_merges: int, pick, merge_name
) -> list[tuple[str, str]]:
    """Shared in-process trainer core over a collected word table.

    ``words``: list of [syms_list, n]. ``pick(pair_counts, sym_counts)``
    returns the winning (a, b) or None (early stop). ``merge_name(a, b)``
    names the merged symbol (BPE concatenates; WordPiece strips '##').
    Incremental index (the classic fast-BPE-trainer shape): pair counts,
    per-symbol counts and a pair -> word-index occurrence index are
    maintained under each merge, so a round touches only the words that
    contain the winning pair — counts stay exact integers, so the
    result is independent of update order."""
    pair_counts: dict = {}
    sym_counts: dict = {}
    where: dict = {}
    for wi, (syms, n) in enumerate(words):
        for s in syms:
            sym_counts[s] = sym_counts.get(s, 0) + n
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + n
            where.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        best = pick(pair_counts, sym_counts)
        if best is None:
            break
        a, b = best
        merges.append((a, b))
        merged = merge_name(a, b)
        # the occurrence set may hold stale indices (the word was since
        # rewritten by another merge and no longer contains (a, b)) —
        # reprocessing such a word is a no-op net change
        for wi in where.pop((a, b), ()):
            syms, n = words[wi]
            new = _merge_word_syms(syms, a, b, merged)
            if len(new) == len(syms):
                continue  # stale index
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] -= n
            for s in syms:
                sym_counts[s] -= n
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
                where.setdefault(p, set()).add(wi)
            for s in new:
                sym_counts[s] = sym_counts.get(s, 0) + n
            words[wi][0] = new
    return merges


def _local_bpe_merges(words: list, n_merges: int) -> list[tuple[str, str]]:
    """BPE argmax: max count (>= 2), ties lexicographic on (a, b) —
    the in-process twin of the distributed orderBy(cnt DESC, a, b)."""

    def pick(pair_counts, _sym_counts):
        best = None
        for p, c in pair_counts.items():
            if c >= 2:
                k = (-c, p)
                if best is None or k < best:
                    best = k
        return None if best is None else best[1]

    return _local_train_loop(words, n_merges, pick, lambda a, b: a + b)


# r18 (VERDICT r17 item 4): two job-count levers on the above-cap
# (distributed) path. (1) _no_aqe: the per-round query is a fixed
# join-free shape (vocab-table explode -> hash-agg -> TakeOrdered K);
# AQE cannot re-plan anything here, but it materializes the one
# exchange as a separate query-stage JOB, doubling the scheduled jobs
# of an N-round loop (measured 61 -> 32 jobs for 30 byte merges,
# identical list). The toggle is scoped to the loop and restored in
# finally; it is a property of the QUERY SHAPE, not of any data or
# core count, so it holds at 100 TB (the reduce side is a per-partition
# top-K; AQE's only possible action is coalescing that cheap stage).
# (2) batched merges, below: certified top-K prefixes apply several
# merges under one round when provable (data-dependent — on natural
# text the top pairs usually share symbols, so most rounds stay
# single-merge; the lever pays on the skewed/gappy count tables of
# late training and synthetic corpora). Combined measurement in
# scripts/probe_bpe_jobs.py: 63 -> 32 jobs for 30 byte merges at
# sf0.01 (2.1 -> 1.07 jobs/merge), identical merge list.
@contextmanager
def _no_aqe(spark):
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


# r18 (VERDICT r17 item 4): on the above-cap (distributed) path, apply
# SEVERAL merges per scheduled round when greedy order is provable from
# one pair-count collect. The per-round action is the same TakeOrdered
# collect, just K rows instead of 1; a driver-side certification then
# accepts the longest prefix of the ranked pairs that greedy BPE would
# provably pick in exactly that order, and all accepted merges are
# applied as stacked JVM folds under ONE lineage checkpoint, so jobs
# per merge drop by the average batch size. The certification is
# conservative — when in doubt the batch ends and the next round
# re-counts — so the merge list is bit-identical by construction, and
# on natural text most rounds stay single-merge (the top pairs share
# symbols); see the combined probe numbers above.
BPE_BATCH_TOP_K = 64


def _safe_merge_batch(
    rows: list, n_left: int, k_requested: int
) -> list[tuple[str, str]]:
    """The longest prefix of ``rows`` (the top pair counts, already in
    greedy order: cnt DESC, (a, b) ASC) that greedy BPE provably picks
    in exactly that order without recounting. Exactness argument:

    Applying a merge (a, b) -> ab only (1) leaves pairs disjoint from
    {a, b} untouched, (2) DECREASES pairs overlapping {a, b}, and
    (3) CREATES occurrences of pairs with the merged name as a symbol —
    each created occurrence of (x, ab) consumed an old (x, a) adjacency
    and each (ab, y) an old (b, y), so a created pair's count is
    bounded by some OLD pair's count that overlaps the merged pair's
    symbols. After a certified prefix p_1..p_{i-1} (pairwise disjoint,
    so every overlapping old pair ranks BELOW i):

    - unchanged pairs ranked > i lose to p_i even on count ties (the
      (a, b) ASC sort already encodes the lexicographic tie-break);
    - decreased pairs only fall further;
    - created (or created-augmented, when a merged NAME collides with
      an existing symbol string) pairs are bounded by
      old part + created part <= 2 * max(boundary, overlap), where
      ``boundary`` is the largest count a pair OUTSIDE the collected
      top-K can have (cnt of row K, or 1 when the collect was
      exhaustive — every pair below the cnt>=2 filter) and ``overlap``
      is the largest collected count at ranks > i sharing a symbol —
      including merged names — with the accepted prefix.

    So p_i is certified iff it is symbol-disjoint from the prefix
    (merged names included) and cnt(p_i) > 2 * max(boundary, overlap).
    A SELF-pair (a, a) breaks the created-pair bound (its created
    occurrences are bounded only by its own count), so it may be
    accepted but always terminates the batch. The prefix must stay
    CONSECUTIVE — a skipped overlapping pair could still outrank later
    rows after its unknown decrease. Row 0 is the exact argmax and is
    always accepted. Pinned against the in-process trainer on
    adversarial corpora (runs, ties, merged-name collisions) in
    tests/test_bpe.py."""
    boundary = rows[-1][2] if len(rows) >= int(k_requested) else 1
    a0, b0 = rows[0][0], rows[0][1]
    accepted = [(a0, b0)]
    if a0 == b0 or n_left <= 1:
        return accepted
    syms = {a0, b0, a0 + b0}
    for i in range(1, len(rows)):
        a, b, cnt = rows[i]
        if a in syms or b in syms or (a + b) in syms:
            break
        overlap = max(
            (c for (x, y, c) in rows[i + 1:] if x in syms or y in syms),
            default=0,
        )
        if cnt <= 2 * max(boundary, overlap):
            break
        accepted.append((a, b))
        if len(accepted) >= int(n_left) or a == b:
            break
        syms.update((a, b, a + b))
    return accepted


def _collect_word_table(wt: DataFrame, cap: int):
    """Materialize the word table and return its rows as [[syms, n]]
    when it holds at most ``cap`` distinct words, else None (the
    distributed rounds take over). One job either way: head(cap+1)
    runs the full aggregation but ships at most cap+1 rows. Callers
    pass ``wt`` already behind a lazy localCheckpoint (r18, ADVICE r17):
    the probe's corpus scan + aggregation then materializes the
    checkpoint the distributed rounds reuse, instead of being discarded
    and re-run by round 1 on the above-cap path."""
    rows = wt.select("n", "syms").head(cap + 1)
    if len(rows) > cap:
        return None
    return [[list(r["syms"]), int(r["n"])] for r in rows]


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 50, mode: str = "word"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Deterministic:
    ties on pair count break lexicographically on (a, b), independent of
    partitioning. Stops early when no pair occurs twice (merging
    singletons would just memorize words). Returns the ordered merge
    list — the tokenizer model.

    ``mode="word"`` is Sennrich word-internal BPE (chars + EOW marker);
    ``mode="byte"`` is GPT-2 byte-level BPE (space-attached pretokens,
    UTF-8 byte alphabet, no marker). The training loop — pair explode,
    one hash aggregate per round, JVM merge fold — is identical; only
    the initial word table differs.

    Physical path (r17): the corpus scan + word-table aggregate always
    run distributed; when the resulting table holds at most
    :data:`DRIVER_TRAIN_MAX_WORDS` distinct words it is collected once
    and the merge loop runs in-process (model-sized driver work — one
    Spark job total instead of one per round); larger tables take the
    per-round distributed loop below. Identical merges either way
    (tested)."""
    builder = _word_table if mode == "word" else _byte_word_table
    _init_syms_fn(mode)  # validate the mode before any Spark work
    # checkpoint BEFORE the size probe (r18): the probe materializes it,
    # so the above-cap path's first round reuses the aggregation instead
    # of re-running the corpus scan (ADVICE r17 / VERDICT item 8)
    wt = builder(spark, sf_dir).localCheckpoint(eager=False)
    words = _collect_word_table(wt, DRIVER_TRAIN_MAX_WORDS)
    if words is not None:
        return _local_bpe_merges(words, n_merges)
    merges: list[tuple[str, str]] = []
    # AQE off for the loop (restored after): the round query is a fixed
    # join-free agg+TakeOrdered shape where AQE's only effect is one
    # extra scheduled job per round materializing the exchange as a
    # query stage — 61 -> 32 jobs for 30 byte merges, identical list
    # (scripts/probe_bpe_jobs.py)
    with _no_aqe(spark):
        while len(merges) < int(n_merges):
            # one TakeOrdered action per ROUND (K rows instead of 1 —
            # same exchange, same collect); the driver certifies the
            # longest greedy-provable prefix and applies it all at once
            # (r18, _safe_merge_batch — jobs per merge drop by the
            # batch size)
            top = (
                _pair_counts(wt)
                .filter(F.col("cnt") >= 2)
                .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
                .limit(BPE_BATCH_TOP_K)
                .collect()
            )
            if not top:
                break
            batch = _safe_merge_batch(
                [(r["a"], r["b"], int(r["cnt"])) for r in top],
                int(n_merges) - len(merges),
                BPE_BATCH_TOP_K,
            )
            for a, b in batch:
                merges.append((a, b))
                wt = _apply_merge(wt, a, b)
            # truncate lineage EVERY round: the next round's pair scan
            # otherwise re-evaluates every merge fold since the last
            # checkpoint (sum-of-depths fold passes) — measured 13.6 s
            # -> 7.1 s for 30 byte-mode merges at sf0.1, identical
            # merge list; the checkpoint write is of the vocab-sized
            # table. The in-round fold stack is at most the batch size
            # deep.
            wt = wt.localCheckpoint(eager=False)
    return merges


def bpe_encode(
    spark: SparkSession,
    sf_dir: str,
    merges: list[tuple[str, str]],
    mode: str = "word",
) -> DataFrame:
    """Encode every document with a learned merge list: per word, apply
    the classic greedy algorithm (repeatedly merge the present pair with
    the LOWEST merge rank until none applies). Arrow-batched mapInPandas
    with the rank table in the closure — map-only, no shuffle. Returns
    (doc_id, n_words, n_bpe_tokens, compression) where compression =
    round(chars-per-bpe-token, 6).

    ``mode`` must match the mode the merges were trained with: "word"
    splits on whitespace and seeds chars+EOW; "byte" pretokenizes
    GPT-2-style and seeds the UTF-8 byte alphabet (n_words then counts
    pretokens, compression counts pretoken chars per token)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    init_syms = _init_syms_fn(mode)
    pre_re = GPT2_PRETOKEN_RE if mode == "byte" else None
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if mode == "byte":
        d = d.select("doc_id", F.col("text"))
    else:
        d = d.select("doc_id", tokens(F.col("text")).alias("words"))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        pat = re.compile(pre_re) if pre_re else None
        cache: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            got = cache.get(w)
            if got is not None:
                return got
            syms = init_syms(w)
            while len(syms) > 1:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            cache[w] = len(syms)
            return len(syms)

        for pdf in batches:
            n_words, n_tok, n_chars = [], [], []
            src = pdf["text"] if pat is not None else pdf["words"]
            for cell in src:
                # NULL text -> NULL words array / None text cell: treat
                # as the empty document, don't crash
                if pat is not None:
                    ws = pat.findall(cell) if cell else []
                else:
                    ws = [w for w in cell if w] if cell is not None else []
                n_words.append(len(ws))
                n_tok.append(sum(word_tokens(w) for w in ws))
                n_chars.append(sum(len(w) for w in ws))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_words": n_words,
                    "n_bpe_tokens": n_tok,
                }
            )
            out["compression"] = [
                round(c / t, 6) if t else 0.0 for c, t in zip(n_chars, n_tok)
            ]
            yield out

    return d.mapInPandas(
        _enc,
        schema="doc_id long, n_words long, n_bpe_tokens long, compression double",
    )


# ------------------------------------------------------- token-id encode
# Closed-form vocabulary: a symbol's id is a pure function of (symbol,
# merge list), so no vocab table object exists anywhere —
#   0                       -> reserved (padding)
#   1                       -> bare end-of-word symbol
#   plain char c            -> 2 + 2 * codepoint(c)
#   k-th merge's new symbol -> MERGE_ID_BASE + k
# Emitted streams contain ONLY those classes: any char+EOW or longer
# symbol was by construction produced by a merge and takes the
# merge-rank id (the 3 + 2*codepoint char+EOW range exists only as a
# defensive guard in sym_id and never appears under this encoder).
# MERGE_ID_BASE sits above 3 + 2 * 0x10FFFF (the max char id), so the
# ranges cannot collide and ids are invertible given the merges. Two
# merges producing the SAME symbol string (different splits, e.g.
# a+bc and ab+c -> 'abc') share the later merge's id — same vocab item,
# one id, deterministic.
MERGE_ID_BASE = 4_194_304  # 2^22 > 3 + 2 * U+10FFFF


def bpe_encode_ids(
    spark: SparkSession,
    sf_dir: str,
    merges: list[tuple[str, str]],
    mode: str = "word",
) -> DataFrame:
    """(doc_id, n_bpe_tokens, ids array<long>): the actual token-id
    sequence per document — what a training loader consumes — under the
    closed-form vocabulary above. Same greedy lowest-rank merge loop as
    :func:`bpe_encode` (whose n_bpe_tokens this agrees with by
    construction — tested), same Arrow map-only shape: the rank table
    and the id scheme live in the closure, no shuffle, no vocab
    broadcast.

    Byte mode ids are closed-form too (and even denser): an unmerged
    single-symbol token is ``2 + byte_value`` (0-255 under the GPT-2
    byte alphabet, inverted locally), a merged symbol keeps
    ``MERGE_ID_BASE + rank``. A multi-char symbol not in the merge
    table cannot exist under this encoder; a foreign merge list that
    smuggles one in raises loudly rather than mis-encoding."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    merged_id = {a + b: MERGE_ID_BASE + i for i, (a, b) in enumerate(merges)}
    eow = EOW
    init_syms = _init_syms_fn(mode)
    pre_re = GPT2_PRETOKEN_RE if mode == "byte" else None
    u2b = (
        {c: b for b, c in bytes_to_unicode().items()}
        if mode == "byte"
        else None
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if mode == "byte":
        d = d.select("doc_id", F.col("text"))
    else:
        d = d.select("doc_id", tokens(F.col("text")).alias("words"))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        pat = re.compile(pre_re) if pre_re else None
        cache: dict[str, list[int]] = {}

        def sym_id(s: str) -> int:
            got = merged_id.get(s)
            if got is not None:
                return got
            if u2b is not None:  # byte mode
                if len(s) == 1 and s in u2b:
                    return 2 + u2b[s]
                raise ValueError(
                    f"symbol {s!r} is neither a merge product nor a "
                    "byte-alphabet char — wrong mode for this merge list?"
                )
            if s == eow:
                return 1  # bare EOW symbol (no merge touched it)
            if s.endswith(eow) and len(s) == 1 + len(eow):
                # defensive: unreachable under this encoder (any
                # char+EOW symbol came from a merge and hit merged_id
                # above), kept so a foreign merge table cannot crash
                return 3 + 2 * ord(s[0])
            return 2 + 2 * ord(s)

        def word_ids(w: str) -> list[int]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = init_syms(w)
            # merge the trailing char with EOW representation: the train
            # table stores words as char sequence + EOW symbol, and
            # merges may produce 'char</w>' symbols — keep syms as the
            # same alphabet: last char and EOW stay separate symbols
            # until a merge joins them (exactly bpe_encode's loop)
            while len(syms) > 1:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            out = [sym_id(s) for s in syms]
            cache[w] = out
            return out

        for pdf in batches:
            rows = []
            src = pdf["text"] if pat is not None else pdf["words"]
            for did, cell in zip(pdf["doc_id"], src):
                ids: list[int] = []
                # NULL text -> None words array / None cell: the empty
                # document
                if pat is not None:
                    ws = pat.findall(cell) if cell else []
                else:
                    ws = [w for w in cell if w] if cell is not None else []
                for w in ws:
                    ids.extend(word_ids(w))
                rows.append((int(did), len(ids), ids))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bpe_tokens", "ids"]
            )

    return d.mapInPandas(
        _enc, schema="doc_id long, n_bpe_tokens long, ids array<long>"
    )


# ------------------------------------------------ model persistence (r10)
def save_merges(
    spark: SparkSession,
    merges: list,
    path: str,
    pretokenizer: str | None = None,
) -> None:
    """Persist a trained merge list as one parquet table of
    (rank, a, b[, pretok]) rows — readable by any engine, no pickle (the
    classifier-persistence convention): train once in batch, load in
    the job that encodes or packs.

    Byte-mode merges depend on the pretokenization the corpus scan used,
    so pass ``pretokenizer=PRETOKENIZER_VERSION`` when saving them: the
    stamp is stored on every row and :func:`load_merges` with
    ``expect_pretokenizer=`` fails loudly on a mismatch instead of
    silently re-tokenizing differently (ADVICE r12 — e.g. the pre-r12
    \\d-approximation classes, or merges trained under a CPython with
    different Unicode tables). Word-mode merges (whitespace ``tokens``)
    have no pretokenizer dependency — omit the stamp."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    df = spark.createDataFrame(rows, "rank long, a string, b string")
    if pretokenizer is not None:
        df = df.withColumn("pretok", F.lit(pretokenizer))
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(
    spark: SparkSession,
    path: str,
    expect_pretokenizer: str | None = None,
) -> list[tuple[str, str]]:
    """Inverse of :func:`save_merges`: the ordered merge list. Rank
    gaps fail loudly — a truncated table must not silently train-time
    reorder the greedy encoder. With ``expect_pretokenizer=`` (byte
    mode), an artifact saved without a stamp or under a different
    pretokenizer version raises instead of decoding into a silently
    different id stream."""
    table = spark.read.parquet(path)
    rows = table.collect()
    if expect_pretokenizer is not None:
        if "pretok" not in table.columns:
            raise ValueError(
                f"merge table at {path} has no pretokenizer stamp but "
                f"{expect_pretokenizer!r} was required — it predates the "
                "stamp (pre-r13) or was saved without pretokenizer=; "
                "retrain or re-save with the current pretokenizer"
            )
        got = {r["pretok"] for r in rows}
        if got != {expect_pretokenizer}:
            raise ValueError(
                f"merge table at {path} was trained under pretokenizer "
                f"{sorted(got)} but this runtime is "
                f"{expect_pretokenizer!r} — encodings would differ; "
                "retrain under the current pretokenizer"
            )
    by_rank = {int(r["rank"]): (r["a"], r["b"]) for r in rows}
    if len(rows) != len(by_rank):
        # Two rows at the same rank would collapse in the dict above,
        # keeping a collect-order-dependent winner and dropping a merge.
        raise ValueError(f"merge table at {path} has duplicate ranks")
    n = len(by_rank)
    if set(by_rank) != set(range(n)):
        raise ValueError(f"merge table at {path} has rank gaps")
    return [by_rank[i] for i in range(n)]
