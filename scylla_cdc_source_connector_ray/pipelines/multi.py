"""Multi-table consumption with topic-per-table routing.

The reference consumes ``table.name.list`` and routes each table's change
records to its own topic ``<prefix>.<keyspace>.<table>``
(``ScyllaTopicSelector.java:7-24``, ``ScyllaConnectorConfig.java``). The
engine analogue: a multi-table log is a directory of per-table logs
(``log_dir/<table>/``); each table gets its own namespaced sink and
checkpoint (``sink/<table>``, ``ckpt/<table>``) and stamps its name into the
envelope's ``source.table`` — offsets, watermarks, state, and exactly-once
commits are all per table, exactly like the reference's per-topic offsets.
"""

from __future__ import annotations

import dataclasses
import os

import pyarrow as pa

from ..config import EngineConfig
from .runner import CaptureRunner


class MultiTableRunner:
    """One checkpointed capture runner per table under ``log_dir``.

    Tables run sequentially per ``run()`` call (each already parallelizes
    across its shards); a table with no new files commits nothing, the others
    advance — matching the reference's independent per-table source tasks.
    """

    def __init__(self, log_dir: str, cfg: EngineConfig, topic_prefix: str = "cdc"):
        self.log_dir = log_dir
        self.topic_prefix = topic_prefix
        self.tables = sorted(
            d for d in os.listdir(log_dir) if os.path.isdir(os.path.join(log_dir, d))
        )
        if not self.tables:
            raise ValueError(f"no per-table subdirectories under {log_dir}")
        self.runners: dict[str, CaptureRunner] = {}
        for t in self.tables:
            tcfg = dataclasses.replace(
                cfg,
                table_name=t,
                sink_dir=os.path.join(cfg.sink_dir, t),
                checkpoint_dir=os.path.join(cfg.checkpoint_dir, t),
            )
            self.runners[t] = CaptureRunner(os.path.join(log_dir, t), tcfg)

    def topic_for(self, table: str) -> str:
        """``<prefix>.<table>`` — the reference's topic naming
        (``ScyllaTopicSelector.java:7-24``; no keyspace level here)."""
        return f"{self.topic_prefix}.{table}"

    def run(self, **kw) -> dict:
        totals: dict = {"batches": 0, "events": 0, "late": 0, "tables": {}}
        for t in self.tables:
            tot = self.runners[t].run(**kw)
            totals["tables"][t] = tot
            for k in ("batches", "events", "late"):
                totals[k] += tot.get(k, 0)
        return totals

    def flush_windows(self) -> None:
        for t in self.tables:
            self.runners[t].flush_windows()

    def read_output(self, table: str) -> pa.Table:
        return self.runners[table].read_output()
