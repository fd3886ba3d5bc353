"""Print ``ds.stats()`` per-stage breakdowns for the main pipelines — the
"wall-time dominated by useful compute" evidence loop.

Usage: python tools/profile_stats.py [sf_dir] [pipeline ...]
Pipelines: capture windows session
"""

from __future__ import annotations

import sys

import ray


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")

    from scylla_cdc_source_connector_ray.config import EngineConfig
    from scylla_cdc_source_connector_ray.pipelines import capture as cap
    from scylla_cdc_source_connector_ray.stages import windows as W

    cfg = EngineConfig(num_shards=32)

    def show(name, ds):
        if only and name not in only:
            return
        ds = ds.materialize()
        print(f"\n===== {name} =====")
        print(ds.stats())

    show("capture", cap.capture(cap.read_transcripts_from_events(sf_dir), cfg))
    show("windows", W.tumbling(cap.read_transcripts_from_events(sf_dir), 3_600_000_000, keys=["role"]))
    show(
        "session",
        W.session(
            cap.read_transcripts_from_events(sf_dir, columns=["conv_id", "ts"]),
            gap_us=1_800_000_000,
            num_shards=cfg.num_shards,
        ),
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
