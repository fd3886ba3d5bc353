"""SubstringDedupStreamRunner: streaming substring dedup must equal the
batch operator on a doc-ordered stream, survive kill-resume byte-identically,
and fail loudly on pin drift / non-monotone ids."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from scylla_cdc_source_connector_ray.functions.dedup import substring_dedup
from scylla_cdc_source_connector_ray.pipelines.substring_stream import (
    SubstringDedupStreamRunner,
)

K = 3


def _corpus(seed: int, n: int = 50) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> real gram repeats
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 30))) for _ in range(n)]
    texts = (
        docs
        + [d + " yy" + str(i) for i, d in enumerate(docs)]  # prefix repeats
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
        pq.write_table(
            t.slice(lo, hi - lo), os.path.join(log, f"window-{i:05d}.parquet")
        )
    return log


def _runner(base, log, tag="a", **kw) -> SubstringDedupStreamRunner:
    return SubstringDedupStreamRunner(
        log,
        num_shards=4,
        sink_dir=os.path.join(base, f"out-{tag}"),
        checkpoint_dir=os.path.join(base, f"ckpt-{tag}"),
        k=kw.pop("k", K),
        num_parts=kw.pop("num_parts", 4),
        **kw,
    )


def _sorted_pd(t) -> pd.DataFrame:
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    return df.sort_values("doc_id").reset_index(drop=True)


def _batch_ref(df: pd.DataFrame) -> pd.DataFrame:
    return _sorted_pd(
        substring_dedup(ray.data.from_pandas(df).repartition(3), k=K).to_pandas()
    )


def test_stream_equals_batch_and_batch_size_invariance(tmp_path):
    df = _corpus(5)
    log = _write_log(df, str(tmp_path))
    want = _batch_ref(df)
    r1 = _runner(str(tmp_path), log, "a")
    r1.run(files_per_batch=1)
    got1 = _sorted_pd(r1.read_output())
    pd.testing.assert_frame_equal(got1, want)
    r2 = _runner(str(tmp_path), log, "b")
    r2.run(files_per_batch=4)  # one big batch
    got2 = _sorted_pd(r2.read_output())
    pd.testing.assert_frame_equal(got2, want)


def test_kill_resume_byte_identical(tmp_path):
    df = _corpus(7)
    log = _write_log(df, str(tmp_path))
    r = _runner(str(tmp_path), log, "a")
    res = r.run(files_per_batch=1, crash_before_commit_at=2)
    assert res["crashed"] and res["batches"] == 2
    committed = _sorted_pd(r.read_output())
    r2 = _runner(str(tmp_path), log, "a")  # same ckpt/sink dirs
    r2.run(files_per_batch=1)
    got = _sorted_pd(r2.read_output())
    pd.testing.assert_frame_equal(got, _batch_ref(df))
    # pre-crash committed prefix is a prefix of the final output
    pd.testing.assert_frame_equal(
        committed,
        got[got["doc_id"].isin(committed["doc_id"])].reset_index(drop=True),
    )


def test_pin_drift_fails_loudly(tmp_path):
    df = _corpus(9)
    log = _write_log(df, str(tmp_path))
    r = _runner(str(tmp_path), log, "a")
    r.run(files_per_batch=2, max_batches=1)
    with pytest.raises(Exception, match="pin|manifest|gram_impl"):
        _runner(str(tmp_path), log, "a", k=4).run(files_per_batch=2)


def test_non_monotone_ids_fail_loudly(tmp_path):
    df = _corpus(11, n=20)
    log = os.path.join(str(tmp_path), "log")
    os.makedirs(log)
    t = pa.Table.from_pandas(df.sort_values("doc_id"), preserve_index=False)
    # second window REPEATS the first window's ids
    pq.write_table(t.slice(0, 20), os.path.join(log, "window-00000.parquet"))
    pq.write_table(t.slice(0, 20), os.path.join(log, "window-00001.parquet"))
    r = _runner(str(tmp_path), log, "a")
    with pytest.raises(ValueError, match="monoton"):
        r.run(files_per_batch=1)


def test_randomized_split_invariance_and_brute_force(tmp_path):
    """Random corpora: batch op == brute force, and the STREAM result is
    invariant to window fan-out (1-file vs 4-file logs)."""
    from scylla_cdc_source_connector_ray.functions.dedup import (
        _GRAM_B,
        _MERSENNE,
        _word_hash,
        _ws_split,
    )

    for seed in (21, 22):
        df = _corpus(seed, n=25)
        want = _batch_ref(df)

        # brute force vs the batch operator
        tok = [_ws_split((t or "").lower()) for t in df["text"]]
        occ = {}
        for d, ws in enumerate(tok):
            for p in range(len(ws) - K + 1):
                h = 0
                for w in ws[p : p + K]:
                    h = (h * int(_GRAM_B) + _word_hash(w)) % _MERSENNE
                occ.setdefault(h, []).append((d, p))
        cuts = {}
        for lst in occ.values():
            for d, p in sorted(lst)[1:]:
                cuts.setdefault(d, []).append(p)
        for _, row in want.iterrows():
            d = int(row["doc_id"])
            ws0 = _ws_split(df.loc[d, "text"] or "")
            covered = np.zeros(len(ws0), bool)
            for p in cuts.get(d, []):
                covered[p : p + K] = True
            assert row["n_words_kept"] == int((~covered).sum())

        # stream over different window fan-outs
        for nf, tag in ((1, f"s{seed}a"), (4, f"s{seed}b")):
            base = os.path.join(str(tmp_path), tag)
            os.makedirs(base)
            log = _write_log(df, base, nf=nf)
            r = _runner(base, log, tag)
            r.run(files_per_batch=2)
            pd.testing.assert_frame_equal(_sorted_pd(r.read_output()), want)
