"""Schema evolution at a batch boundary (reference ST4,
``ScyllaSchema.java:467-472`` / ``ScyllaInconsistentSchemaHandler.java``): a
new value column appearing mid-log re-derives the envelope schema, old events
read as NULL, resume/replay stay byte-stable."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from scylla_cdc_source_connector_ray.config import EngineConfig
from scylla_cdc_source_connector_ray.pipelines.runner import CaptureRunner
from scylla_cdc_source_connector_ray.stages.envelope import flatten_envelope

US = 1_000_000


def _rows(specs):
    """specs: (conv, turn, text, ts_s, seq[, lang])"""
    t = pa.table(
        {
            "conv_id": pa.array([s[0] for s in specs], pa.string()),
            "turn_idx": pa.array([s[1] for s in specs], pa.int32()),
            "role": pa.array(["user"] * len(specs), pa.string()),
            "text": pa.array([s[2] for s in specs], pa.string()),
            "tool": pa.array([None] * len(specs), pa.string()),
            "ts": pa.array([s[3] * US for s in specs], pa.timestamp("us")),
            "seq": pa.array([s[4] for s in specs], pa.int64()),
        }
    )
    if len(specs) and len(specs[0]) > 5:
        t = t.append_column("lang", pa.array([s[5] for s in specs], pa.string()))
    return t


def _cfg(tmp_path, sub=""):
    return EngineConfig(
        num_shards=4,
        sink_dir=str(tmp_path / f"out{sub}"),
        checkpoint_dir=str(tmp_path / f"ckpt{sub}"),
    )


def _write(log, name, tbl):
    os.makedirs(log, exist_ok=True)
    pq.write_table(tbl, os.path.join(log, name))


def _flat(runner) -> pd.DataFrame:
    df = flatten_envelope(runner.read_output()).to_pandas()
    return df.sort_values(["conv_id", "turn_idx", "seq"]).reset_index(drop=True)


def test_new_column_mid_log(tmp_path):
    log = str(tmp_path / "log")
    # batch 0: base schema
    _write(log, "window-00000.parquet", _rows([
        ("c1", 0, "a", 10, 1),
        ("c2", 0, "x", 11, 2),
    ]))
    # batch 1: evolved schema (lang appears)
    _write(log, "window-00001.parquet", _rows([
        ("c1", 0, "a2", 20, 3, "en"),   # update: before from pre-evolution state
        ("c3", 0, "new", 21, 4, "fr"),  # create under the new schema
    ]))
    r = CaptureRunner(log, _cfg(tmp_path))
    assert r.run(files_per_batch=1)["batches"] == 2

    out = _flat(r)
    assert "after_lang" in out.columns and "before_lang" in out.columns
    by_seq = {row.seq: row for row in out.itertuples()}
    # pre-evolution rows read as NULL under the evolved schema
    assert pd.isna(by_seq[1].after_lang) and pd.isna(by_seq[2].after_lang)
    # the update sees a pre-evolution before image: lang NULL
    assert by_seq[3].op == "u" and by_seq[3].after_lang == "en"
    assert pd.isna(by_seq[3].before_lang)
    assert by_seq[4].op == "c" and by_seq[4].after_lang == "fr"
    # the manifest records the evolved set for replay stability
    assert r.ckpt.last_committed()["value_cols_extra"] == {"lang": "string"}


def test_evolved_state_carries_and_resume_is_stable(tmp_path):
    log = str(tmp_path / "log")
    _write(log, "window-00000.parquet", _rows([("c1", 0, "a", 10, 1)]))
    _write(log, "window-00001.parquet", _rows([("c1", 0, "b", 20, 2, "en")]))
    cfg = _cfg(tmp_path)
    r1 = CaptureRunner(log, cfg)
    r1.run(files_per_batch=1)

    # a third window arrives: update again — before image must carry the
    # evolved state (lang='en') across the resume
    _write(log, "window-00002.parquet", _rows([("c1", 0, "c", 30, 3, "de")]))
    r2 = CaptureRunner(log, cfg)
    r2.run(files_per_batch=1)
    out = _flat(r2)
    row = out[out.seq == 3].iloc[0]
    assert row.before_lang == "en" and row.after_lang == "de"
    assert row.before_text == "b"

    # replay from scratch over the same 3 windows: byte-stable output
    cfg_b = _cfg(tmp_path, sub="_replay")
    rb = CaptureRunner(log, cfg_b)
    rb.run(files_per_batch=1)
    pd.testing.assert_frame_equal(_flat(rb), out)


def test_column_sticky_after_it_disappears(tmp_path):
    """A window written without the evolved column AFTER evolution still
    emits the column (NULL) — the set is sticky, values live in state."""
    log = str(tmp_path / "log")
    _write(log, "window-00000.parquet", _rows([("c1", 0, "a", 10, 1, "en")]))
    _write(log, "window-00001.parquet", _rows([("c1", 0, "b", 20, 2)]))
    r = CaptureRunner(log, _cfg(tmp_path))
    r.run(files_per_batch=1)
    out = _flat(r)
    row = out[out.seq == 2].iloc[0]
    assert row.op == "u" and pd.isna(row.after_lang) and row.before_lang == "en"


def test_unbucketed_multifile_batch_mixed_schemas(tmp_path):
    """Both file generations inside ONE batch: the shuffle still sees a
    single block schema."""
    log = str(tmp_path / "log")
    _write(log, "window-00000.parquet", _rows([("c1", 0, "a", 10, 1)]))
    _write(log, "window-00001.parquet", _rows([("c1", 0, "b", 20, 2, "en")]))
    r = CaptureRunner(log, _cfg(tmp_path))
    assert r.run(files_per_batch=2)["batches"] == 1
    out = _flat(r)
    assert out[out.seq == 2].iloc[0].after_lang == "en"
    assert pd.isna(out[out.seq == 1].iloc[0].after_lang)


def test_allowlist_blocks_stray_column(tmp_path):
    """A stray metadata column in a log file must NOT be adopted when an
    allowlist is configured (ADVICE: adoption is sticky and irreversible)."""
    log = str(tmp_path / "log")
    _write(log, "window-00000.parquet",
           _rows([("c1", 0, "a", 10, 1)]).append_column(
               "ingest_id", pa.array(["x"], pa.string())))
    cfg = _cfg(tmp_path)
    cfg.evolved_col_allowlist = ("lang",)
    r = CaptureRunner(log, cfg)
    r.run(files_per_batch=1)
    out = _flat(r)
    assert "after_ingest_id" not in out.columns
    assert r.ckpt.last_committed()["value_cols_extra"] == {}
    # an allowlisted column still evolves normally
    _write(log, "window-00001.parquet", _rows([("c1", 0, "b", 20, 2, "en")]))
    r2 = CaptureRunner(log, cfg)
    r2.run(files_per_batch=1)
    assert r2.ckpt.last_committed()["value_cols_extra"] == {"lang": "string"}


def test_max_evolved_cols_raises(tmp_path):
    """Adopting beyond max_evolved_cols fails loudly instead of silently
    growing the envelope (and the 2^k modified-cols table)."""
    log = str(tmp_path / "log")
    t = _rows([("c1", 0, "a", 10, 1)])
    for i in range(3):
        t = t.append_column(f"extra{i}", pa.array(["x"], pa.string()))
    _write(log, "window-00000.parquet", t)
    cfg = _cfg(tmp_path)
    cfg.max_evolved_cols = 2
    r = CaptureRunner(log, cfg)
    import pytest

    with pytest.raises(ValueError, match="max_evolved_cols"):
        r.run(files_per_batch=1)
