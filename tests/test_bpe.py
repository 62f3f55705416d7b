"""BPE merge induction (operators/bpe.py): greedy left-to-right
non-overlap, tie-breaking, and frequency weighting."""

from __future__ import annotations

from dynamodb_stream_processor_2_0_spark.operators.bpe import (
    bpe_induction,
    bpe_round,
    words_with_freq,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_nonoverlapping_left_to_right_merge(spark):
    # 'aaaa' with top pair (a,a) must merge positions 1-2 and 3-4
    # (2 merges), never 2-3: syms become [aa, aa]
    words = words_with_freq(_docs(spark, ["aaaa aaaa ab"]))
    merged, (a, b, cnt) = bpe_round(words)
    assert (a, b) == ("a", "a")
    syms = {r["word"]: r["syms"] for r in merged.collect()}
    assert syms["aaaa"] == ["aa", "aa"]
    assert syms["ab"] == ["a", "b"]


def test_odd_run_keeps_trailing_symbol(spark):
    # 'aaa': runs of 2 matching positions -> merge first only: [aa, a]
    words = words_with_freq(_docs(spark, ["aaa aaa aaa xy"]))
    merged, (a, b, _) = bpe_round(words)
    assert (a, b) == ("a", "a")
    syms = {r["word"]: r["syms"] for r in merged.collect()}
    assert syms["aaa"] == ["aa", "a"]


def test_frequency_weighting_and_tiebreak(spark):
    # pair (b,c) appears once in a word occurring 3 times; pair (x,y)
    # once in a word occurring twice -> (b,c) wins on weight
    words = words_with_freq(_docs(spark, ["bc bc bc xy xy"]))
    _, (a, b, cnt) = bpe_round(words)
    assert (a, b, cnt) == ("b", "c", 3)


def test_induction_rounds_shrink_total_symbols(spark):
    docs = _docs(spark, ["the the the then there here zz"])
    df = bpe_induction(spark, docs, rounds=2)
    rows = {r["round"]: r for r in df.collect()}
    assert rows[1]["n_symbols_total_after"] > rows[2]["n_symbols_total_after"]
    # round 1 must merge (h,e) or (t,h) (both appear 5x); tie-break
    # lexicographic on the pair -> (h,e)
    assert (rows[1]["merged_left"], rows[1]["merged_right"]) == ("h", "e")
