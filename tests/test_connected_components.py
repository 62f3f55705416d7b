"""Both connected-components paths (driver union-find fast path and the
iterative min-label-propagation loop) must label identically: min
reachable id per component."""

from __future__ import annotations

from dynamodb_stream_processor_2_0_spark.operators.dedup import connected_components


def _labels(df):
    return {r.doc_id: r.cluster_id for r in df.collect()}


def test_small_and_iterative_paths_agree(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), isolate pair
    # 20-21, and a star 30-{31,32,33}; ids deliberately non-contiguous
    edges = [
        (2, 1),
        (2, 3),
        (3, 4),
        (10, 11),
        (11, 12),
        (10, 12),
        (20, 21),
        (31, 30),
        (32, 30),
        (30, 33),
    ]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }
    fast = _labels(connected_components(pairs))
    iterative = _labels(connected_components(pairs, small_graph_threshold=0))
    assert fast == want
    assert iterative == want


def test_long_path_converges_on_iterative_route(spark):
    # a 12-node path stresses multi-round propagation (diameter 11)
    edges = [(i, i + 1) for i in range(100, 111)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = _labels(connected_components(pairs, small_graph_threshold=0))
    assert got == {i: 100 for i in range(100, 112)}
