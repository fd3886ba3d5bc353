"""Config validation, retry policy, confidence-window holdback, PK placement,
CLI validate (reference surfaces: ScyllaConnectorConfig validation, worker
retry envelope §4, confidence window S1, PK placement M9, connector validate)."""

import json

import pyarrow as pa
import pytest

from scylla_cdc_source_connector_ray.config import EngineConfig, PkPlacement
from scylla_cdc_source_connector_ray.sources.windowed import LogFile, plan_batches
from scylla_cdc_source_connector_ray.state.retry import RetryPolicy


def test_config_validation():
    with pytest.raises(ValueError):
        EngineConfig(num_shards=0)
    with pytest.raises(ValueError):
        EngineConfig(window_size_us=0)
    with pytest.raises(ValueError):
        EngineConfig(include_before="bogus")
    cfg = EngineConfig(include_before="only-updated")
    assert cfg.include_before.value == "only-updated"


def test_retry_policy_envelope():
    sleeps = []
    p = RetryPolicy(max_attempts=5, sleep=sleeps.append)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise OSError("transient")
        return "ok"

    assert p.call(flaky) == "ok"
    assert calls["n"] == 4 and len(sleeps) == 3
    # exponential with 20% jitter around 50ms * 2^k, capped
    for k, s in enumerate(sleeps):
        raw = 0.05 * 2**k
        assert raw * 0.8 <= s <= raw * 1.2

    # fatal errors propagate immediately
    def fatal():
        raise ValueError("fatal")

    with pytest.raises(ValueError):
        p.call(fatal)

    # exhaustion re-raises the transient error
    p2 = RetryPolicy(max_attempts=3, sleep=lambda s: None)
    with pytest.raises(OSError):
        p2.call(lambda: (_ for _ in ()).throw(OSError("always")))


def test_confidence_window_holdback():
    """Live-tail mode never consumes files newer than frontier − confidence
    (reference ScyllaConnectorConfig.java:171-184)."""
    files = [
        LogFile("f0", 0, 10_000_000, 10),
        LogFile("f1", 10_000_000, 20_000_000, 10),
        LogFile("f2", 20_000_000, 30_000_000, 10),  # inside confidence window
    ]
    batches = plan_batches(files, consumed=0, confidence_window_us=10_000_000, log_complete=False)
    consumed_paths = [f.path for b in batches for f in b]
    assert consumed_paths == ["f0", "f1"]
    # batch mode (log complete) consumes everything
    batches = plan_batches(files, consumed=0, confidence_window_us=10_000_000, log_complete=True)
    assert [f.path for b in batches for f in b] == ["f0", "f1", "f2"]


def test_pk_placement_payload_key():
    from scylla_cdc_source_connector_ray.sources.synthetic import generate
    from scylla_cdc_source_connector_ray.stages.envelope import build_envelope
    from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops

    t = generate(num_convs=3, turns_per_conv=3)
    cfg = EngineConfig(pk_placements=(PkPlacement.KAFKA_KEY, PkPlacement.PAYLOAD_KEY))
    env = build_envelope(derive_ops(t), cfg)
    assert "payload_key" in env.column_names
    pk = env["payload_key"].combine_chunks()
    assert pa.compute.struct_field(pk, "conv_id").to_pylist() == pa.compute.struct_field(
        env["key"].combine_chunks(), "conv_id"
    ).to_pylist()


def test_cli_validate(tmp_path):
    from scylla_cdc_source_connector_ray.__main__ import main
    from scylla_cdc_source_connector_ray.sources.synthetic import generate, write_windowed

    t = generate(num_convs=3, turns_per_conv=3)
    write_windowed(t, str(tmp_path / "log"), num_files=1)
    assert main(["validate", "--log-dir", str(tmp_path / "log")]) == 0
    assert main(["validate", "--log-dir", str(tmp_path / "missing")]) == 1
    # schema check: a parquet file without the transcript columns
    import pyarrow.parquet as pq

    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(pa.table({"x": [1]}), str(bad / "f.parquet"))
    assert main(["validate", "--log-dir", str(bad)]) == 1
