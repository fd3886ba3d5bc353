"""Multi-table consumption with topic-per-table routing (reference
``ScyllaTopicSelector.java:7-24``): independent per-table offsets, state,
and output namespaces."""

import os

import pyarrow.parquet as pq

from scylla_cdc_source_connector_ray.config import EngineConfig
from scylla_cdc_source_connector_ray.pipelines.multi import MultiTableRunner
from scylla_cdc_source_connector_ray.sources.synthetic import generate, write_windowed
from scylla_cdc_source_connector_ray.stages.envelope import flatten_envelope


def _cfg(tmp_path):
    return EngineConfig(
        num_shards=4,
        sink_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


def test_multi_table_routing_and_resume(tmp_path):
    log = tmp_path / "log"
    t_a = generate(num_convs=10, turns_per_conv=6, update_pct=30, delete_pct=10)
    t_b = generate(num_convs=8, turns_per_conv=5, update_pct=20, delete_pct=5, text_pad=4)
    write_windowed(t_a, str(log / "alpha"), num_files=2)
    write_windowed(t_b, str(log / "beta"), num_files=2)

    m = MultiTableRunner(str(log), _cfg(tmp_path), topic_prefix="cdc")
    assert m.tables == ["alpha", "beta"]
    assert m.topic_for("alpha") == "cdc.alpha"

    tot = m.run(files_per_batch=1)
    assert tot["tables"]["alpha"]["events"] == t_a.num_rows
    assert tot["tables"]["beta"]["events"] == t_b.num_rows

    # routed outputs: separate namespaces, source.table stamped per table
    for name, t in (("alpha", t_a), ("beta", t_b)):
        out = m.read_output(name)
        assert out.num_rows == t.num_rows
        src = out["source"].combine_chunks()
        import pyarrow.compute as pc

        tables = pc.struct_field(src, "table")
        assert pc.all(pc.equal(tables, name)).as_py()
        assert os.path.isdir(tmp_path / "out" / name)
        assert os.path.isdir(tmp_path / "ckpt" / name)

    # per-table offsets are independent: new file for alpha only → only
    # alpha advances on resume
    extra = generate(num_convs=3, turns_per_conv=4, update_pct=0, delete_pct=0)
    pq.write_table(extra, str(log / "alpha" / "window-00099.parquet"))
    m2 = MultiTableRunner(str(log), _cfg(tmp_path))
    tot2 = m2.run(files_per_batch=1)
    assert tot2["tables"]["alpha"]["events"] == extra.num_rows
    assert tot2["tables"]["beta"]["events"] == 0
    assert m2.read_output("alpha").num_rows == t_a.num_rows + extra.num_rows

    # content parity: flattened alpha output matches the single-table oracle
    from tests.oracle import cdc_oracle

    flat = flatten_envelope(m2.read_output("beta")).to_pandas()
    golden = cdc_oracle(t_b.to_pandas())
    assert len(flat) == len(golden)
