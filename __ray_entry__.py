"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself; nothing here (or in the library)
initialises or shuts down Ray. See SURVEY.md §2 for the operator inventory
each ``queries()`` entry maps to.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from scylla_cdc_source_connector_ray.config import EngineConfig
from scylla_cdc_source_connector_ray.pipelines import capture as cap
from scylla_cdc_source_connector_ray import oracles

_CFG = EngineConfig(num_shards=32)


def entry() -> Any:
    """Flagship pipeline: CDC capture over the sf0.001 transcript log
    (derived from events), returning the change-event Dataset flattened."""
    ds = cap.read_transcripts_from_events("/root/testdata/sf0.001")
    return cap.capture_flat(ds, _CFG)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_cdc_capture_flat(sf_dir: str):
    ds = cap.read_transcripts_from_events(sf_dir)
    return cap.capture_flat(ds, _CFG)


def _q_cdc_op_counts(sf_dir: str):
    ds = cap.read_transcripts_from_events(sf_dir)
    flat = cap.capture_flat(ds, _CFG)
    from ray.data.aggregate import Count

    return flat.groupby("op").aggregate(Count(alias_name="n"))


def _q_cdc_modified_cols(sf_dir: str):
    ds = cap.read_transcripts_from_events(sf_dir)
    flat = cap.derive_stage(ds, _CFG)
    return flat.select_columns(["conv_id", "turn_idx", "seq", "modified_cols"])


def _q_win_tumbling_role(sf_dir: str):
    from scylla_cdc_source_connector_ray.stages import windows as W

    ds = cap.read_transcripts_from_events(sf_dir)
    return W.tumbling(ds, oracles.HOUR_US, keys=["role"])


def _q_win_sliding(sf_dir: str):
    from scylla_cdc_source_connector_ray.stages import windows as W

    ds = cap.read_transcripts_from_events(sf_dir)
    return W.sliding(ds, oracles.HOUR_US, oracles.MIN15_US)


def _q_win_session(sf_dir: str):
    from scylla_cdc_source_connector_ray.stages import windows as W

    ds = cap.read_transcripts_from_events(sf_dir)
    return W.session(ds, gap_us=oracles.GAP30M_US, num_shards=_CFG.num_shards)


def _q_join_conv_state(sf_dir: str):
    from scylla_cdc_source_connector_ray.stages.join import enrich_with_conv_state

    ds = cap.read_transcripts_from_events(sf_dir)
    out = enrich_with_conv_state(ds, num_shards=_CFG.num_shards)
    return out.select_columns(
        ["conv_id", "turn_idx", "seq", "prior_turns", "prior_chars", "prev_role", "prev_ts_us"]
    )


def _q_join_enrich_customer(sf_dir: str):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from scylla_cdc_source_connector_ray.stages.join import broadcast_join

    ds = cap.read_transcripts_from_events(sf_dir)

    def add_custkey(t):
        ck = pc.utf8_slice_codeunits(t["conv_id"].combine_chunks(), 4, 2**31).cast("int64")
        return t.append_column("custkey", ck)

    ds = ds.map_batches(add_custkey, batch_format="pyarrow")
    dim = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    out = broadcast_join(ds, dim, "custkey", "c_custkey", ["c_name", "c_mktsegment"])
    return out.select_columns(["conv_id", "turn_idx", "seq", "c_name", "c_mktsegment"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "cdc_capture_flat": _q_cdc_capture_flat,
        "cdc_op_counts": _q_cdc_op_counts,
        "cdc_modified_cols": _q_cdc_modified_cols,
        "win_tumbling_role": _q_win_tumbling_role,
        "win_sliding": _q_win_sliding,
        "win_session": _q_win_session,
        "join_conv_state": _q_join_conv_state,
        "join_enrich_customer": _q_join_enrich_customer,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_capture_flat": oracles.CDC_CAPTURE_FLAT,
        "cdc_op_counts": oracles.CDC_OP_COUNTS,
        "cdc_modified_cols": oracles.CDC_MODIFIED_COLS,
        "win_tumbling_role": oracles.WIN_TUMBLING_ROLE,
        "win_sliding": oracles.WIN_SLIDING,
        "win_session": oracles.WIN_SESSION,
        "join_conv_state": oracles.JOIN_CONV_STATE,
        "join_enrich_customer": oracles.JOIN_ENRICH_CUSTOMER,
    }
