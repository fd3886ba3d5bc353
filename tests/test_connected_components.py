"""Distributed connected components (duplicate-cluster labeling).

Reference semantics: cluster_id = min node id of the component; only nodes
that appear in the edge list are labeled (singleton docs have no cluster).
Checked against a driver-side union-find on the same edges.
"""

import numpy as np
import pandas as pd
import ray.data

from scylla_cdc_source_connector_ray.functions.dedup import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def _run_cc(edges, **kw):
    df = pd.DataFrame(edges, columns=["a", "b"])
    out = connected_components(ray.data.from_pandas(df), **kw).to_pandas()
    assert str(out["doc_id"].dtype) == "int64"
    assert str(out["cluster_id"].dtype) == "int64"
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert len(got) == len(out), "duplicate doc_id labels"
    return got


def test_cc_two_components_and_duplicate_edges():
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (2, 1), (1, 3)]
    assert _run_cc(edges) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_chain_converges():
    # path graph: worst case for naive propagation; star rounds are O(log n)
    edges = [(i, i + 1) for i in range(200)]
    got = _run_cc(edges, num_partitions=8)
    assert got == {i: 0 for i in range(201)}


def test_cc_matches_union_find_on_random_graphs():
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 300
        m = int(rng.integers(50, 400))
        a = rng.integers(0, n, size=m)
        b = rng.integers(0, n, size=m)
        keep = a != b
        edges = list(zip(a[keep].tolist(), b[keep].tolist()))
        want = _union_find(edges)
        got = _run_cc(edges, num_partitions=4)
        assert got == want, f"trial {trial}"


def test_cc_skewed_mega_star():
    # one node connected to everything: degenerate star is the fixpoint
    edges = [(0, i) for i in range(1, 500)] + [(400 + i, 900 + i) for i in range(5)]
    got = _run_cc(edges, num_partitions=8)
    # 900+i hangs off 400+i which hangs off 0: one big component, plus nothing else
    assert got == {i: 0 for i in range(500)} | {900 + i: 0 for i in range(5)}


def test_cc_empty_edge_list_keeps_typed_schema():
    out = connected_components(
        ray.data.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                           "b": pd.Series([], dtype="int64")}))
    )
    # note: Ray's to_pandas() drops columns for ANY empty dataset; the
    # Dataset-level schema is the contract here
    sch = out.schema()
    assert sch.names == ["doc_id", "cluster_id"]
    assert [str(t) for t in sch.types] == ["int64", "int64"]
    assert out.count() == 0


def test_near_dedup_keep_canonical_with_explicit_pairs():
    from scylla_cdc_source_connector_ray.functions.dedup import (
        near_dedup_keep_canonical,
    )

    docs = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                         "text": [f"t{i}" for i in range(10)]})
    pairs = pd.DataFrame({"a": [1, 2, 7], "b": [2, 3, 8]}).astype(np.int64)
    kept = near_dedup_keep_canonical(
        ray.data.from_pandas(docs), pairs=ray.data.from_pandas(pairs)
    ).to_pandas()
    # clusters {1,2,3} -> keep 1, {7,8} -> keep 7; singletons pass through
    assert sorted(kept["doc_id"]) == [0, 1, 4, 5, 6, 7, 9]
    assert list(kept.columns) == ["doc_id", "text"]
