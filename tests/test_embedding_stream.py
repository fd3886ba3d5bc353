"""Streaming SRP-LSH embedding filter: twin equality, batch-size
invariance, kill-resume, pin guard."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scylla_cdc_source_connector_ray.pipelines.embedding_stream import (
    EmbeddingLshStreamRunner,
)


def _vectors(n=60, dim=64, dups=8, seed=5) -> pa.Table:
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, dim)).astype(np.float32)
    for j in range(dups):  # planted exact duplicates -> guaranteed collisions
        M[n - 1 - j] = M[j]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in M], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )


def _write_log(tmp, t: pa.Table, nf=4):
    log = os.path.join(tmp, "log")
    os.makedirs(log, exist_ok=True)
    n = t.num_rows
    for i in range(nf):
        lo, hi = i * n // nf, (i + 1) * n // nf
        pq.write_table(t.slice(lo, hi - lo), os.path.join(log, f"window-{i:05d}.parquet"))
    return log


def _runner(tmp, log, name="r", **kw):
    return EmbeddingLshStreamRunner(
        log,
        num_shards=4,
        sink_dir=os.path.join(tmp, name, "out"),
        checkpoint_dir=os.path.join(tmp, name, "ckpt"),
        **kw,
    )


def _kept(r) -> list[int]:
    return sorted(r.read_output()["vec_id"].to_pylist())


def test_stream_matches_sql_anti_join_twin(tmp_path):
    from scylla_cdc_source_connector_ray.oracles import EMBEDDING_LSH_STREAM

    tmp = str(tmp_path)
    t = _vectors()
    log = _write_log(tmp, t)
    path = os.path.join(tmp, "embeddings.parquet")
    pq.write_table(t, path)
    r = _runner(tmp, log)
    res = r.run(files_per_batch=2)
    got = _kept(r)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    want = sorted(con.sql(EMBEDDING_LSH_STREAM).df()["vec_id"].tolist())
    assert got == want
    # planted duplicates collided: their replicas are not all kept
    assert res["dups"] > 0


def test_batch_size_invariance(tmp_path):
    tmp = str(tmp_path)
    log = _write_log(tmp, _vectors())
    a = _runner(tmp, log, name="a")
    a.run(files_per_batch=1)
    b = _runner(tmp, log, name="b")
    b.run(files_per_batch=4)
    assert _kept(a) == _kept(b)


def test_kill_resume_byte_stable(tmp_path):
    tmp = str(tmp_path)
    log = _write_log(tmp, _vectors())
    clean = _runner(tmp, log, name="clean")
    clean.run(files_per_batch=1)
    cr = _runner(tmp, log, name="cr")
    res = cr.run(files_per_batch=1, crash_before_commit_at=2)
    assert res["crashed"] is True
    resumed = _runner(tmp, log, name="cr")
    resumed.run(files_per_batch=1)
    assert _kept(resumed) == _kept(clean)


def test_resume_pin_guard(tmp_path):
    tmp = str(tmp_path)
    log = _write_log(tmp, _vectors())
    r = _runner(tmp, log, name="p")
    r.run(files_per_batch=2, max_batches=1)
    with pytest.raises(ValueError, match="srp_impl"):
        _runner(tmp, log, name="p", n_planes=12).run(files_per_batch=2)
