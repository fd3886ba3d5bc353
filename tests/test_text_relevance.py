"""doc_term_relevance and gram_matrix vs DuckDB reference SQL."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from scylla_cdc_source_connector_ray import oracles
from scylla_cdc_source_connector_ray.functions.similarity import gram_matrix
from scylla_cdc_source_connector_ray.functions.textops import doc_term_relevance


def test_doc_term_relevance_matches_sql():
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "the cat sat on the mat",
                "the dog sat on the log",
                "cat cat cat dog",
                "",  # no tokens -> absent from output
                None,  # NULL text behaves like ''
                "unique singleton tokens only",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    got = (
        doc_term_relevance(ds, k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.sql(oracles.DOC_TERM_RELEVANCE)
        .df()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "token", "tf", "df", "rel_micro", "rank"]],
        want[["doc_id", "token", "tf", "df", "rel_micro", "rank"]],
    )
    assert 3 not in got["doc_id"].values and 4 not in got["doc_id"].values


def test_doc_term_relevance_prunes_exchange():
    """Per-doc top-k must go through the map-side prune (rank column is the
    contract) and TF must be doc-local: a token's df counts documents, not
    instances."""
    docs = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a a a b", "a c"]}
    )
    out = doc_term_relevance(ray.data.from_pandas(docs), k=3).to_pandas()
    a_rows = out[out["token"] == "a"]
    assert set(a_rows["df"]) == {2}  # 2 docs contain 'a', not 4 instances
    assert a_rows[a_rows["doc_id"] == 1]["tf"].iloc[0] == 3


def test_gram_matrix_matches_sql():
    rng = np.random.default_rng(9)
    n, d = 400, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(emb)}
    )
    t = pa.table(
        {
            "vec_id": pa.array(df["vec_id"]),
            "embedding": pa.array([list(map(float, e)) for e in emb],
                                  pa.list_(pa.float32())),
        }
    )
    got = (
        gram_matrix(ray.data.from_arrow(t).repartition(5), dims=d)
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", t)
    want = (
        con.sql(oracles._gram_matrix_sql(d))
        .df()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["i", "j", "s", "n"]].astype("int64"),
        want[["i", "j", "s", "n"]].astype("int64"),
    )
    assert (got["n"] == n).all()
    assert len(got) == d * (d + 1) // 2


def test_gram_matrix_subchunking_exact():
    """The memory-capped sub-chunk loop must not change the integer sums
    (floor happens per row, before any summation)."""
    rng = np.random.default_rng(4)
    emb = rng.normal(size=(50, 4)).astype(np.float32)
    t = pa.table({"embedding": pa.array([list(map(float, e)) for e in emb],
                                        pa.list_(pa.float32()))})
    got = gram_matrix(ray.data.from_arrow(t), dims=4).to_pandas()
    M = emb.astype(np.float64)
    P = np.floor(M[:, :, None] * M[:, None, :] * 1e6).astype(np.int64).sum(axis=0)
    for _, r in got.iterrows():
        assert P[int(r["i"]), int(r["j"])] == r["s"]
