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


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "cdc_capture_flat": _q_cdc_capture_flat,
        "cdc_op_counts": _q_cdc_op_counts,
        "cdc_modified_cols": _q_cdc_modified_cols,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_capture_flat": oracles.CDC_CAPTURE_FLAT,
        "cdc_op_counts": oracles.CDC_OP_COUNTS,
        "cdc_modified_cols": oracles.CDC_MODIFIED_COLS,
    }
