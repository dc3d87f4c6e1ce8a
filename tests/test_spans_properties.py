"""Property test: distributed substring-span dedup ≡ naive reference.

duplicate_spans finds maximal cross-doc duplicated k-gram spans via
gram postings + an island window; the reference model below recomputes
the same thing with plain Python sets and a linear merge.  Random small
corpora over a 3-letter alphabet make cross-doc gram collisions common,
exercising overlap merging, adjacency merging, multi-span docs, and
the min_doc_freq gate.  remove_duplicate_spans is checked against the
same model's keep-first-owner replay, including the reassembled text.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pretalx_hub_etl_spark.llm.spans import (
    duplicate_spans,
    remove_duplicate_spans,
)

K = 3

doc_strategy = st.lists(
    st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12
)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=5)


def _grams(tokens: list[str]) -> list[tuple[int, str]]:
    return [
        (i + 1, " ".join(tokens[i : i + K]))
        for i in range(len(tokens) - K + 1)
    ]


def _dup_grams(corpus: list[list[str]]) -> set[str]:
    owners: dict[str, set[int]] = {}
    for doc_id, toks in enumerate(corpus):
        for _, g in _grams(toks):
            owners.setdefault(g, set()).add(doc_id)
    return {g for g, ds in owners.items() if len(ds) >= 2}


def _merge(windows: list[int]) -> list[tuple[int, int, int]]:
    """[(start, end, n_windows)] after merging overlapping/adjacent
    k-windows given their sorted 1-based start positions."""
    spans = []
    for s in sorted(windows):
        e = s + K - 1
        if spans and s <= spans[-1][1] + 1:
            ps, pe, nw = spans[-1]
            spans[-1] = (ps, max(pe, e), nw + 1)
        else:
            spans.append((s, e, 1))
    return spans


def reference_spans(corpus):
    dup = _dup_grams(corpus)
    out = {}
    for doc_id, toks in enumerate(corpus):
        wins = [p for p, g in _grams(toks) if g in dup]
        if wins:
            out[doc_id] = _merge(wins)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_duplicate_spans_matches_reference(spark, corpus):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got: dict[int, list] = {}
    for r in duplicate_spans(df, k=K).collect():
        got.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.n_windows)
        )
    got = {d: sorted(v) for d, v in got.items()}
    assert got == reference_spans(corpus)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_remove_duplicate_spans_matches_reference(spark, corpus):
    # keep-first-owner reference: a window is removed iff its gram has
    # >= 2 distinct owners and this doc is not the min owner
    owners: dict[str, set[int]] = {}
    for doc_id, toks in enumerate(corpus):
        for _, g in _grams(toks):
            owners.setdefault(g, set()).add(doc_id)
    expected = {}
    for doc_id, toks in enumerate(corpus):
        cut = set()
        for p, g in _grams(toks):
            ds = owners[g]
            if len(ds) >= 2 and doc_id != min(ds):
                cut.update(range(p, p + K))
        kept = [t for i, t in enumerate(toks, start=1) if i not in cut]
        expected[doc_id] = (" ".join(kept), len(toks), len(toks) - len(kept))

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in remove_duplicate_spans(df, k=K).collect()
    }
    assert got == expected
