"""SegmentDedupStreamRunner: streaming segment dedup must equal the batch
operator on a doc-ordered stream, survive kill-resume byte-identically, and
fail loudly on pin drift."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from scylla_cdc_source_connector_ray.functions.dedup import segment_dedup
from scylla_cdc_source_connector_ray.pipelines.segment_stream import (
    SegmentDedupStreamRunner,
)


def _corpus(seed: int, n: int = 60) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 50))) for _ in range(n)]
    texts = (
        docs
        + [d + " xx" + str(i) for i, d in enumerate(docs)]  # partial dups
        + docs[: n // 4]  # exact dups -> NULL text_dedup
        + ["", "   "]
    )
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )


def _write_log(df: pd.DataFrame, base: str, nf: int = 4) -> str:
    log = os.path.join(base, "log")
    os.makedirs(log)
    t = pa.Table.from_pandas(df.sort_values("doc_id"), preserve_index=False)
    n = t.num_rows
    for i in range(nf):
        lo, hi = i * n // nf, (i + 1) * n // nf
        pq.write_table(t.slice(lo, hi - lo), os.path.join(log, f"window-{i:05d}.parquet"))
    return log


def _runner(base: str, log: str, tag: str = "a", **kw) -> SegmentDedupStreamRunner:
    return SegmentDedupStreamRunner(
        log,
        num_shards=4,
        sink_dir=os.path.join(base, f"out-{tag}"),
        checkpoint_dir=os.path.join(base, f"ckpt-{tag}"),
        seg_words=kw.pop("seg_words", 5),
        num_parts=kw.pop("num_parts", 4),
        **kw,
    )


def _sorted_pd(t) -> pd.DataFrame:
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    return df.sort_values("doc_id").reset_index(drop=True)


def test_stream_equals_batch_across_microbatches(tmp_path):
    df = _corpus(21)
    base = str(tmp_path)
    log = _write_log(df, base)
    r = _runner(base, log)
    res = r.run(files_per_batch=2)
    assert res["batches"] >= 2  # state must actually cross a batch boundary
    got = _sorted_pd(r.read_output())
    want = _sorted_pd(segment_dedup(ray.data.from_pandas(df), seg_words=5))
    pd.testing.assert_frame_equal(got, want)
    assert (got["n_segs_kept"] == 0).any(), "cross-batch full-drop unexercised"


def test_stream_batch_size_invariance(tmp_path):
    df = _corpus(5, n=40)
    base = str(tmp_path)
    log = _write_log(df, base)
    outs = []
    for tag, fpb in (("one", 1), ("four", 4)):
        r = _runner(base, log, tag=tag)
        r.run(files_per_batch=fpb)
        outs.append(_sorted_pd(r.read_output()))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_kill_resume_byte_identical(tmp_path):
    df = _corpus(9, n=40)
    base = str(tmp_path)
    log = _write_log(df, base)
    r = _runner(base, log)
    res = r.run(files_per_batch=1, crash_before_commit_at=2)
    assert res["crashed"] and res["batches"] == 2  # 2 committed, then crash
    committed = r.read_output()
    r2 = _runner(base, log)
    r2.run(files_per_batch=1)
    full = _sorted_pd(r2.read_output())
    want = _sorted_pd(segment_dedup(ray.data.from_pandas(df), seg_words=5))
    pd.testing.assert_frame_equal(full, want)
    # the pre-crash committed prefix is a prefix of the final output
    pre = _sorted_pd(committed)
    pd.testing.assert_frame_equal(
        pre, full[full["doc_id"].isin(pre["doc_id"])].reset_index(drop=True)
    )


def test_pin_drift_fails_loudly(tmp_path):
    df = _corpus(3, n=20)
    base = str(tmp_path)
    log = _write_log(df, base)
    r = _runner(base, log)
    r.run(files_per_batch=3, max_batches=1)
    drifted = _runner(base, log, seg_words=7)  # same checkpoint dir ("a")
    with pytest.raises(Exception, match="pin|manifest|seg_impl"):
        drifted.run(files_per_batch=3)


def test_zero_word_docs_absent_and_within_doc_dups(tmp_path):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a b a b", "", "a b", "c d"],
        }
    )
    base = str(tmp_path)
    log = _write_log(df, base, nf=2)
    r = _runner(base, log, seg_words=2)
    r.run(files_per_batch=1)
    got = _sorted_pd(r.read_output())
    # doc 1 (empty) absent; doc 0 keeps one "a b"; doc 2's "a b" fully seen
    assert got["doc_id"].tolist() == [0, 2, 3]
    assert got.iloc[0]["text_dedup"] == "a b"
    assert pd.isna(got.iloc[1]["text_dedup"]) and got.iloc[1]["n_segs_kept"] == 0
    assert got.iloc[2]["text_dedup"] == "c d"


def test_precommit_pin_change_fails_loudly(tmp_path):
    # a run that crashed before its FIRST commit left shard state but no
    # manifest; restarting with a different files_per_batch would re-cut
    # batch 0 and misread that state — the pre-commit pins file must refuse
    df = _corpus(13, n=20)
    base = str(tmp_path)
    log = _write_log(df, base)
    r = _runner(base, log)
    res = r.run(files_per_batch=4, crash_before_commit_at=0)
    assert res["crashed"] and res["batches"] == 0
    r2 = _runner(base, log)
    with pytest.raises(ValueError, match="uncommitted run pinned"):
        r2.run(files_per_batch=1)
    # same pins resume is fine and completes
    r3 = _runner(base, log)
    r3.run(files_per_batch=4)
    want = _sorted_pd(segment_dedup(ray.data.from_pandas(df), seg_words=5))
    pd.testing.assert_frame_equal(_sorted_pd(r3.read_output()), want)


def test_non_monotone_ids_fail_loudly(tmp_path):
    # window 1 re-uses window 0's ids: the batch operator raises on the
    # concatenated input; the stream must not silently emit duplicate rows
    base = str(tmp_path)
    log = os.path.join(base, "log")
    os.makedirs(log)
    a = pd.DataFrame({"doc_id": np.array([0, 1], np.int64), "text": ["a b", "c d"]})
    b = pd.DataFrame({"doc_id": np.array([1, 2], np.int64), "text": ["e f", "g h"]})
    for i, df in enumerate((a, b)):
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(log, f"window-{i:05d}.parquet"),
        )
    r = _runner(base, log)
    with pytest.raises(ValueError, match="monotonically increasing"):
        r.run(files_per_batch=1)
