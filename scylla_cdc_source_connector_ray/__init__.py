"""Ray-Data-native CDC capture-and-stream engine over Parquet transcript logs.

A from-scratch rebuild of the capabilities of
``scylladb/scylla-cdc-source-connector`` (see /root/repo/SURVEY.md) expressed
as ``ray.data.Dataset`` pipelines: zero-copy Arrow ``map_batches`` stages,
actor pools for keyed state, groupby/sort shuffles for ordering, and an
exactly-once idempotent Parquet sink.
"""

from .config import EngineConfig, IncludeMode, PkPlacement  # noqa: F401
from .schema import EVENTS, TRANSCRIPTS  # noqa: F401
