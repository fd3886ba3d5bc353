"""Stream-state join (fixture T8) and hot-key salting (fixture T5)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from scylla_cdc_source_connector_ray.config import EngineConfig
from scylla_cdc_source_connector_ray.pipelines import capture as cap
from scylla_cdc_source_connector_ray.sources.synthetic import generate
from scylla_cdc_source_connector_ray.stages.join import (
    broadcast_join,
    conv_state_prefix,
    enrich_with_conv_state,
)
from scylla_cdc_source_connector_ray.stages.salt import detect_hot_convs
from tests.oracle import cdc_oracle


def test_conv_state_join_matches_sql():
    t = generate(num_convs=12, turns_per_conv=15, update_pct=25, delete_pct=10)
    ds = ray.data.from_arrow(t).repartition(4)
    out = enrich_with_conv_state(ds, num_shards=4).to_pandas()
    con = duckdb.connect()
    con.register("transcripts", t)
    sql = con.sql(
        """
        SELECT conv_id, turn_idx, seq,
               count(*) OVER w_prior                       AS prior_turns,
               coalesce(sum(length(coalesce(text,''))) OVER w_prior, 0) AS prior_chars,
               lag(role) OVER w                            AS prev_role,
               lag(epoch_us(ts)) OVER w                    AS prev_ts_us
        FROM transcripts
        WINDOW w AS (PARTITION BY conv_id ORDER BY ts, seq),
               w_prior AS (PARTITION BY conv_id ORDER BY ts, seq
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        """
    ).df()
    cols = ["conv_id", "turn_idx", "seq", "prior_turns", "prior_chars", "prev_role", "prev_ts_us"]
    a = out[cols].sort_values(["conv_id", "seq"]).reset_index(drop=True)
    b = sql[cols].sort_values(["conv_id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_conv_state_seed_continuity():
    """Splitting the stream into two micro-batches and carrying the state
    table forward must equal the single-batch result."""
    t = generate(num_convs=6, turns_per_conv=10, update_pct=30, delete_pct=10)
    t = t.append_column("shard", pa.array(np.zeros(t.num_rows, dtype=np.int32)))
    whole, _ = conv_state_prefix(t)
    half = t.num_rows // 2
    t_sorted = t.sort_by([("ts", "ascending"), ("seq", "ascending")])
    first, state1 = conv_state_prefix(t_sorted.slice(0, half))
    second, _ = conv_state_prefix(t_sorted.slice(half), seed=state1)
    merged = (
        pa.concat_tables([first, second])
        .to_pandas()
        .sort_values(["conv_id", "seq"])
        .reset_index(drop=True)
    )
    whole_df = whole.to_pandas().sort_values(["conv_id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        merged[["conv_id", "seq", "prior_turns", "prior_chars", "prev_role"]],
        whole_df[["conv_id", "seq", "prior_turns", "prior_chars", "prev_role"]],
    )


def test_broadcast_join_enrichment():
    t = generate(num_convs=5, turns_per_conv=4)
    dim = pd.DataFrame(
        {"conv_id": [f"conv{i}" for i in range(5)], "owner": [f"user{i % 2}" for i in range(5)]}
    )
    ds = ray.data.from_arrow(t)
    out = broadcast_join(ds, dim, "conv_id", "conv_id", ["owner"]).to_pandas()
    assert len(out) == t.num_rows
    assert (out[out["conv_id"] == "conv3"]["owner"] == "user1").all()


def test_salted_capture_equals_plain(ray_session=None):
    """T5: one hot conv with many turns + many small convs. Salted capture
    must produce identical events to plain capture (after the keyed sort)."""
    hot = generate(num_convs=1, turns_per_conv=3000, update_pct=20, delete_pct=5)
    cold = generate(num_convs=80, turns_per_conv=8, update_pct=20, delete_pct=5)
    # cold convs get distinct ids after the hot one
    import pyarrow.compute as pc

    cold = cold.set_column(
        cold.column_names.index("conv_id"),
        "conv_id",
        pc.binary_join_element_wise(pa.array(["z"] * cold.num_rows), cold["conv_id"].combine_chunks(), ""),
    )
    t = pa.concat_tables([hot, cold])
    cfg = EngineConfig(num_shards=8, hot_key_threshold=1000, salt_factor=4)
    ds = ray.data.from_arrow(t).repartition(6)

    hot_found = detect_hot_convs(ds, cfg.hot_key_threshold)
    assert hot_found == ["conv0"]

    salted = cap.capture_salted(ds, cfg).to_pandas()
    golden = cdc_oracle(t.to_pandas())
    a = salted.assign(
        conv_id=lambda d: d["key"].map(lambda k: k["conv_id"]),
        turn_idx=lambda d: d["key"].map(lambda k: k["turn_idx"]),
    )
    a_flat = (
        a[["conv_id", "turn_idx", "op"]]
        .assign(seq=salted["seq"])
        .sort_values(["conv_id", "turn_idx", "seq"])
        .reset_index(drop=True)
    )
    g = golden[["conv_id", "turn_idx", "op", "seq"]].sort_values(
        ["conv_id", "turn_idx", "seq"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a_flat[["conv_id", "turn_idx", "op", "seq"]], g, check_dtype=False)
    # the hot conv really was spread over >1 sub-shard
    shards = a[a["conv_id"] == "conv0"]["source"].map(lambda s: s["shard"]).nunique()
    assert shards > 1
