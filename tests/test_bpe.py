"""BPE trainer/encoder unit tests (llm/bpe.py)."""

from __future__ import annotations

from pretalx_hub_etl_spark.llm.bpe import (
    END,
    bpe_encode,
    bpe_train,
    merge_table,
    word_counts,
)


def _wc(spark, pairs):
    return spark.createDataFrame(pairs, "word string, n long")


def test_train_matches_hand_derivation(spark):
    # the classic subword-nmt example family: 'low' x5, 'lowest' x2.
    # chars: l o w </w>. Pair counts: (l,o)=7, (o,w)=7, (w,</w>)=5,
    # (w,e)=2, (e,s)=2, (s,t)=2, (t,</w>)=2.
    # merge 1: (l,o) wins ties? (l,o) and (o,w) both 7 -> lexicographic
    # ('l','o') < ('o','w') -> (l,o). Then (lo,w)=7 wins. Then
    # (low,</w>)=5. Then 2-count pairs, lexicographic: (e,s) first.
    wc = _wc(spark, [("low", 5), ("lowest", 2)])
    merges = bpe_train(wc, n_merges=4)
    assert merges == [("l", "o"), ("lo", "w"), ("low", END), ("e", "s")]


def test_train_is_deterministic(spark):
    wc = _wc(spark, [("abab", 3), ("abba", 2), ("baba", 2)])
    a = bpe_train(wc, n_merges=10)
    b = bpe_train(wc, n_merges=10)
    assert a == b and len(a) > 0


def test_merge_table_shape(spark):
    t = merge_table(spark, [("a", "b"), ("ab", "c")])
    rows = t.collect()
    assert [(r.rank, r.merged) for r in rows] == [(1, "ab"), (2, "abc")]


def test_encode_roundtrip_and_compression(spark):
    docs = spark.createDataFrame(
        [
            (1, "low low low lowest"),
            (2, "lower lowest low"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    wc = word_counts(docs)
    merges = bpe_train(wc, n_merges=6)
    out = {r.doc_id: r.tokens for r in bpe_encode(docs, merges).collect()}
    # concatenating a word's tokens restores word + END marker(s)
    for did, text in [(1, "low low low lowest"), (2, "lower lowest low")]:
        joined = "".join(out[did])
        assert joined == "".join(w + END for w in text.split())
    assert out[3] == []
    # frequent word 'low' must compress to a single token
    assert out[1].count("low" + END) == 3


def test_word_counts_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b")], "doc_id long, text string"
    )
    got = {
        r.word: r.n for r in word_counts(docs, min_count=2).collect()
    }
    assert got == {"a": 3}
