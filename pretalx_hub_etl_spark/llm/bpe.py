"""BPE (byte-pair-encoding) tokenizer training and encoding.

The tokenizer-prep step of an LLM data pipeline (Sennrich, Haddow &
Birch, "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016 — the algorithm behind GPT-2/RoBERTa-style vocabularies).

The scale decomposition is the one every production trainer
(subword-nmt, HuggingFace tokenizers) uses, and it maps cleanly onto
Spark:

1. **word counting is corpus-sized → distributed.** One explode +
   map-side-combined groupBy over the documents table, with a
   ``min_count`` tail cut. This is the only pass that touches the
   corpus.
2. **merge learning is vocab-sized → driver.** BPE's pair statistics
   depend only on (word, count) pairs, not on word positions, so the
   merge loop runs on the aggregated vocabulary — bounded by the
   min-count cut (and in practice by Heaps' law), NOT by corpus bytes.
   Deterministic: ties on pair frequency break lexicographically.
3. **encoding is corpus-sized → distributed.** The learned merge ranks
   broadcast in the UDF closure; each word is encoded once per batch
   (memoized), Arrow-batched.

The reference counts nothing (its "text processing" is string form
fields, `main.py:219-228`); this operator family exists for the 100 TB
training-data mandate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out

END = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """``(word, n)``: whitespace-token counts with a tail cut — the one
    corpus-sized pass (map-side combined single shuffle)."""
    out = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def bpe_train(
    wc: DataFrame, n_merges: int = 200
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a ``(word, n)`` count table.

    Driver-side by design: the input is the aggregated vocabulary
    (bounded by min_count / Heaps' law, never corpus-sized), and each
    iteration is O(|changed words|). Deterministic: the most frequent
    pair wins, ties broken by lexicographic pair order.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for row in wc.collect():
        vocab[tuple(row[0]) + (END,)] = int(row[1])

    merges: list[tuple[str, str]] = []
    # pair counts + reverse index, maintained incrementally: rebuilding
    # them per merge would make training O(n_merges * vocab * len)
    pair_n: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for w, n in vocab.items():
        for p in zip(w, w[1:]):
            pair_n[p] = pair_n.get(p, 0) + n
            where.setdefault(p, set()).add(w)
    for _ in range(n_merges):
        if not pair_n:
            break
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_n[best] < 1:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for w in list(where.get(best, ())):
            n = vocab.pop(w)
            out = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            for p in zip(w, w[1:]):
                pair_n[p] -= n
                if pair_n[p] <= 0:
                    pair_n.pop(p, None)
                s = where.get(p)
                if s is not None:
                    s.discard(w)
                    if not s:
                        where.pop(p, None)
            vocab[nw] = vocab.get(nw, 0) + n
            for p in zip(nw, nw[1:]):
                pair_n[p] = pair_n.get(p, 0) + n
                where.setdefault(p, set()).add(nw)
    return merges


def merge_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merges as ``(rank, left, right, merged)`` — the
    artifact a downstream encoder (or this module's) consumes."""
    rows = [
        (i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)
    ]
    from ..operators.partitioning import local_rows

    return local_rows(
        spark, rows, "rank long, left string, right string, merged string"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, tokens array<string>)``: greedy rank-order BPE encoding.

    The merge ranks ship in the UDF closure (vocab-sized broadcast);
    each distinct word in a batch is encoded once (memoized) — the
    Zipfian repeat rate makes that the dominant saving. Arrow-batched;
    one scan, no shuffle.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        sym = list(word) + [END]
        while len(sym) > 1:
            pairs = [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]
            ranked = [
                (ranks[p], i) for i, p in enumerate(pairs) if p in ranks
            ]
            if not ranked:
                break
            r, i = min(ranked)
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        cache[word] = sym
        return sym

    @pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for text in col:
            toks: list[str] = []
            for w in (text or "").lower().split():
                toks.extend(encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return fan_out(docs).select(
        F.col(id_col), encode(F.col(text_col)).alias("tokens")
    )
