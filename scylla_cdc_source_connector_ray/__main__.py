"""CLI entry point: ``python -m scylla_cdc_source_connector_ray``.

The user-facing analogue of deploying the reference connector: point it at a
CDC log directory, get change events (+ optional windows / enrichment /
scoring) in the sink directory, resumable from the checkpoint. Owns its Ray
session (the library never calls ``ray.init``).

    python -m scylla_cdc_source_connector_ray run \
        --log-dir /tmp/log --out /tmp/out --checkpoint /tmp/ckpt \
        --num-shards 64 --windows --enrich --score

    python -m scylla_cdc_source_connector_ray validate --log-dir /tmp/log
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_cfg(args) -> "EngineConfig":
    from .config import EngineConfig

    return EngineConfig(
        num_shards=args.num_shards,
        epoch=args.epoch,
        window_size_us=args.window_size_ms * 1000,
        confidence_window_us=args.confidence_window_ms * 1000,
        allowed_lateness_us=args.allowed_lateness_ms * 1000,
        score_text=args.score,
        window_agg=args.windows,
        sliding_window_us=(
            tuple(int(x) * 1000 for x in args.sliding.split(":")) if args.sliding else None
        ),
        session_gap_us=args.session_gap_ms * 1000 if args.session_gap_ms else None,
        enrich_conv_state=args.enrich,
        partition_deletes=args.partition_deletes,
        min_batch_interval_s=args.min_batch_interval_ms / 1000.0,
        initial_lookback_us=(
            args.initial_lookback_ms * 1000 if args.initial_lookback_ms is not None else None
        ),
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
    )


def cmd_validate(args) -> int:
    """Dry-run validation (≙ ``ScyllaConnector.validate``,
    ``ScyllaConnector.java:136-259``): config field validation + log dir
    probe + schema check of the first file. No Ray needed."""
    import pyarrow.parquet as pq

    try:
        cfg = _build_cfg(args)
    except ValueError as ex:
        print(json.dumps({"ok": False, "error": f"config: {ex}"}))
        return 2
    problems = []
    if not os.path.isdir(args.log_dir):
        problems.append(f"log dir does not exist: {args.log_dir}")
    else:
        from .sources.windowed import discover, discover_bucketed, is_bucketed

        files = (
            [p for _w, m in discover_bucketed(args.log_dir) for p in m.values()]
            if is_bucketed(args.log_dir)
            else [f.path for f in discover(args.log_dir)]
        )
        if not files:
            problems.append("log dir contains no parquet files (connector will wait)")
        else:
            schema = pq.read_schema(files[0])
            missing = [c for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts") if c not in schema.names]
            if missing:
                problems.append(f"first log file missing columns: {missing}")
    checkpoint_info = None
    manifest_dir = os.path.join(args.checkpoint, "manifest")
    if os.path.isdir(manifest_dir):
        from .state.checkpoint import Checkpoint

        last = Checkpoint(args.checkpoint).last_committed()
        if last:
            checkpoint_info = {
                "batch_id": last["batch_id"],
                "consumed_files": last["consumed_files"],
                "num_shards": last.get("num_shards"),
                "epoch": last.get("epoch"),
                "hot_convs": last.get("hot_convs", []),
                "hash_impl": last.get("hash_impl"),
                "value_cols_extra": last.get("value_cols_extra", {}),
            }
            if last.get("num_shards") != cfg.num_shards or last.get("epoch") != cfg.epoch:
                problems.append(
                    f"checkpoint has num_shards={last.get('num_shards')} "
                    f"epoch={last.get('epoch')} but config asks "
                    f"num_shards={cfg.num_shards} epoch={cfg.epoch} (epoch bump required)"
                )
            try:
                from .state.checkpoint import current_hash_impl

                here = current_hash_impl()
                if last.get("hash_impl", here) != here:
                    problems.append(
                        f"checkpoint shard hash is {last.get('hash_impl')} but this "
                        f"environment has {here} (keys would remap; epoch bump required)"
                    )
            except ImportError:
                problems.append("polars unavailable: cannot verify checkpoint shard hash")
    print(
        json.dumps(
            {
                "ok": not problems,
                "problems": problems,
                "num_shards": cfg.num_shards,
                "epoch": cfg.epoch,
                "checkpoint": checkpoint_info,
                "bucketed": os.path.isdir(args.log_dir)
                and any(f.startswith("shard=") for f in os.listdir(args.log_dir)),
            }
        )
    )
    return 0 if not problems else 1


def cmd_metrics(args) -> int:
    """Summarize a checkpoint's per-batch lineage metrics (the JSON records
    every runner commits next to the manifest): totals, batch timings, and
    the last committed batch. No Ray needed."""
    mdir = os.path.join(args.checkpoint, "metrics")
    if not os.path.isdir(mdir):
        print(json.dumps({"ok": False, "error": f"no metrics dir: {mdir}"}))
        return 1
    names = [
        f for f in os.listdir(mdir) if f.startswith("batch-") and f.endswith(".json")
    ]
    # numeric order: 'batch-1000000.json' sorts lexicographically BEFORE
    # 'batch-999999.json' past the 6-digit padding (checkpoint.py's rule)
    names.sort(key=lambda f: int(f[len("batch-") : -len(".json")]))
    batches = []
    for f in names:
        with open(os.path.join(mdir, f)) as fh:
            batches.append(json.load(fh))
    if not batches:
        print(json.dumps({"ok": False, "error": "no batch metrics"}))
        return 1
    secs = sorted(b.get("sec", 0.0) for b in batches)
    totals: dict = {}
    for b in batches:
        for k, v in b.items():
            if k not in ("batch_id", "sec") and isinstance(v, (int, float)):
                totals[k] = totals.get(k, 0) + v
    out = {
        "ok": True,
        "batches": len(batches),
        "last_batch_id": batches[-1]["batch_id"],
        "sec_total": round(sum(secs), 3),
        "sec_p50": round(secs[len(secs) // 2], 3),
        "sec_max": round(secs[-1], 3),
        **{f"total_{k}": v for k, v in sorted(totals.items())},
    }
    from .state.checkpoint import Checkpoint

    last = Checkpoint(args.checkpoint).last_committed()
    if last is not None:
        out["committed_batch_id"] = last["batch_id"]
        out["consumed_files"] = last["consumed_files"]
    print(json.dumps(out))
    return 0


def _init_ray(args) -> None:
    """One definition of the CLI Ray-session setup (the init tweaks must not
    drift between subcommands — they did once: use_polars_sort)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().use_polars_sort = True


def cmd_run(args) -> int:
    import ray

    _init_ray(args)
    from .pipelines.runner import CaptureRunner

    cfg = _build_cfg(args)
    runner = CaptureRunner(args.log_dir, cfg)
    if args.tail:
        totals = runner.follow(
            poll_interval_s=args.poll_ms / 1000.0,
            idle_polls=args.idle_polls,
            files_per_batch=args.files_per_batch,
        )
    else:
        totals = runner.run(
            max_batches=args.max_batches,
            files_per_batch=args.files_per_batch,
        )
    # flush only when the complete log is fully consumed (flush = watermark→∞)
    fully_consumed = args.max_batches is None and not args.tail
    if (args.windows or args.sliding or args.session_gap_ms) and fully_consumed:
        runner.flush_windows()
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def cmd_ingest(args) -> int:
    """Repartition an unpartitioned log into the shard=K layout (one
    distributed keyed exchange; afterwards every run is shuffle-free)."""
    import ray

    _init_ray(args)
    from .sources.ingest import bucketize

    counts = bucketize(args.log_dir, args.out, args.num_shards)
    print(json.dumps({"ok": True, "shards": len(counts), "rows": sum(counts.values()), "out": args.out}))
    ray.shutdown()
    return 0


def cmd_dedup_stream(args) -> int:
    """Streaming first-occurrence dedup over a windowed document log
    (checkpointed seen-set, exactly-once; see pipelines/dedup_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.dedup_stream import DedupStreamRunner

    runner = DedupStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
        text_col=args.text_col,
        order_col=args.order_col,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def cmd_segdedup_stream(args) -> int:
    """Streaming segment-level (sub-document) dedup over a windowed document
    log (checkpointed seen-segment state, exactly-once;
    pipelines/segment_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.segment_stream import SegmentDedupStreamRunner

    runner = SegmentDedupStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
        seg_words=args.seg_words,
        text_col=args.text_col,
        id_col=args.id_col,
        num_parts=args.num_parts,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def cmd_subdedup_stream(args) -> int:
    """Streaming repeated-substring span removal over a windowed document
    log (checkpointed seen-gram state, exactly-once;
    pipelines/substring_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.substring_stream import SubstringDedupStreamRunner

    runner = SubstringDedupStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
        k=args.k,
        text_col=args.text_col,
        id_col=args.id_col,
        num_parts=args.num_parts,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def cmd_session_stream(args) -> int:
    """Streaming per-event session-id assignment over a ts-windowed event
    log (checkpointed per-user (last_ts, session_count) state, exactly-once;
    pipelines/session_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.session_stream import SessionStreamRunner

    runner = SessionStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
        gap_us=args.gap_us,
        user_col=args.user_col,
        ts_col=args.ts_col,
        id_col=args.id_col,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def cmd_cap_stream(args) -> int:
    """Streaming per-key admission cap over a windowed document log
    (checkpointed per-key admitted counts, exactly-once;
    pipelines/cap_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.cap_stream import SourceCapRunner

    runner = SourceCapRunner(
        args.log_dir,
        num_shards=args.num_shards,
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
        k=args.cap,
        key_col=args.key_col,
        order_col=args.order_col,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def cmd_curation_stream(args) -> int:
    """Streaming curation chain (repetition -> decontamination -> exact
    dedup -> per-source cap) as ONE checkpointed exactly-once runner
    (pipelines/curation_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.curation_stream import CurationStreamRunner

    runner = CurationStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
        max_dup_micro=args.max_dup_micro,
        cap_k=args.cap,
        text_col=args.text_col,
        id_col=args.id_col,
        source_col=args.source_col,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def cmd_emb_stream(args) -> int:
    """Streaming arrival-order SRP-LSH embedding near-dup filter
    (pipelines/embedding_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.embedding_stream import EmbeddingLshStreamRunner

    runner = EmbeddingLshStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
        vec_col=args.vec_col,
        order_col=args.order_col,
        n_tables=args.n_tables,
        n_planes=args.n_planes,
        dim=args.dim,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def cmd_hh_stream(args) -> int:
    """Streaming SpaceSaving heavy hitters over a windowed document log
    (one checkpointed m-counter summary; pipelines/hh_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.hh_stream import HeavyHittersStreamRunner

    runner = HeavyHittersStreamRunner(
        args.log_dir,
        checkpoint_dir=args.checkpoint,
        m=args.m,
        text_col=args.text_col,
    )
    totals = _run_or_tail(runner, args)
    top = runner.read_topk(args.k).to_pylist()
    print(
        json.dumps(
            {"ok": True, **totals, "topk": top, "checkpoint": args.checkpoint}
        )
    )
    ray.shutdown()
    return 0


def cmd_distinct_stream(args) -> int:
    """Streaming exact distinct-per-window counter (checkpointed seen-set
    state; pipelines/distinct_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.distinct_stream import DistinctStreamRunner

    runner = DistinctStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        checkpoint_dir=args.checkpoint,
        window_us=args.window_ms * 1000,
        key_col=args.key_col,
        ts_col=args.ts_col,
        mode="approx" if args.approx else "exact",
        hll_p=args.hll_p,
    )
    totals = _run_or_tail(runner, args)
    counts = runner.read_counts()
    print(
        json.dumps(
            {
                "ok": True,
                **totals,
                "windows": counts.num_rows,
                "checkpoint": args.checkpoint,
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_element_stream(args) -> int:
    """Streaming element-level collection capture (list/set/map element-op
    folds with cross-batch live-cell carry; pipelines/element_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.element_stream import ElementStreamRunner

    runner = ElementStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
        collection=args.collection,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def _run_or_tail(runner, args) -> dict:
    """Shared lean-runner dispatch: one-shot drain or live tail."""
    if getattr(args, "tail", False):
        return runner.follow(
            files_per_batch=args.files_per_batch,
            poll_interval_s=args.poll_ms / 1000.0,
            idle_polls=args.idle_polls,
        )
    return runner.run(
        files_per_batch=args.files_per_batch, max_batches=args.max_batches
    )


def cmd_minhash_stream(args) -> int:
    """Streaming arrival-order LSH near-dup filter
    (pipelines/minhash_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.minhash_stream import MinHashStreamRunner

    runner = MinHashStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        sink_dir=args.out,
        checkpoint_dir=args.checkpoint,
        text_col=args.text_col,
        order_col=args.order_col,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "out": args.out, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def cmd_cep_stream(args) -> int:
    """Streaming CEP literal-pattern counting (per-conversation counts with
    cross-batch carry; pipelines/cep_stream.py)."""
    import ray

    _init_ray(args)
    from .pipelines.cep_stream import CepStreamRunner

    mode = {"pattern": args.pattern} if args.regex else {"literal": args.pattern}
    runner = CepStreamRunner(
        args.log_dir,
        num_shards=args.num_shards,
        checkpoint_dir=args.checkpoint,
        key_col=args.key_col,
        role_col=args.role_col,
        **mode,
    )
    totals = _run_or_tail(runner, args)
    print(json.dumps({"ok": True, **totals, "checkpoint": args.checkpoint}))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="scylla_cdc_source_connector_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    mx = sub.add_parser("metrics", help="summarize a checkpoint's per-batch lineage metrics")
    mx.add_argument("--checkpoint", required=True)
    mx.set_defaults(fn=cmd_metrics)
    ep = sub.add_parser("element-stream", help="streaming element-level collection capture")
    ep.add_argument("--log-dir", required=True)
    ep.add_argument("--out", default="/tmp/scylla_cdc_ray/element_out")
    ep.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/element_ckpt")
    ep.add_argument("--num-shards", type=int, default=64)
    ep.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ep.add_argument("--files-per-batch", type=int, default=4)
    ep.add_argument("--max-batches", type=int, default=None)
    ep.add_argument("--collection", choices=("list", "set", "map"), default="list")
    ep.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    ep.add_argument("--poll-ms", type=int, default=1000)
    ep.add_argument("--idle-polls", type=int, default=3)
    ep.set_defaults(fn=cmd_element_stream)
    dp = sub.add_parser("dedup-stream", help="streaming first-occurrence text dedup")
    dp.add_argument("--log-dir", required=True)
    dp.add_argument("--out", default="/tmp/scylla_cdc_ray/dedup_out")
    dp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/dedup_ckpt")
    dp.add_argument("--num-shards", type=int, default=64)
    dp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    dp.add_argument("--files-per-batch", type=int, default=4)
    dp.add_argument("--max-batches", type=int, default=None)
    dp.add_argument("--text-col", default="text")
    dp.add_argument("--order-col", default="doc_id")
    dp.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    dp.add_argument("--poll-ms", type=int, default=1000)
    dp.add_argument("--idle-polls", type=int, default=3)
    dp.set_defaults(fn=cmd_dedup_stream)
    sgp = sub.add_parser("segdedup-stream", help="streaming segment-level (sub-document) exact dedup")
    sgp.add_argument("--log-dir", required=True)
    sgp.add_argument("--out", default="/tmp/scylla_cdc_ray/segdedup_out")
    sgp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/segdedup_ckpt")
    sgp.add_argument("--num-shards", type=int, default=64)
    sgp.add_argument("--num-parts", type=int, default=16)
    sgp.add_argument("--seg-words", type=int, default=20)
    sgp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    sgp.add_argument("--files-per-batch", type=int, default=4)
    sgp.add_argument("--max-batches", type=int, default=None)
    sgp.add_argument("--text-col", default="text")
    sgp.add_argument("--id-col", default="doc_id")
    sgp.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    sgp.add_argument("--poll-ms", type=int, default=1000)
    sgp.add_argument("--idle-polls", type=int, default=3)
    sgp.set_defaults(fn=cmd_segdedup_stream)
    sbp = sub.add_parser("subdedup-stream", help="streaming repeated-substring span removal (word k-grams)")
    sbp.add_argument("--log-dir", required=True)
    sbp.add_argument("--out", default="/tmp/scylla_cdc_ray/subdedup_out")
    sbp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/subdedup_ckpt")
    sbp.add_argument("--num-shards", type=int, default=64)
    sbp.add_argument("--num-parts", type=int, default=16)
    sbp.add_argument("--k", type=int, default=8)
    sbp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    sbp.add_argument("--files-per-batch", type=int, default=4)
    sbp.add_argument("--max-batches", type=int, default=None)
    sbp.add_argument("--text-col", default="text")
    sbp.add_argument("--id-col", default="doc_id")
    sbp.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    sbp.add_argument("--poll-ms", type=int, default=1000)
    sbp.add_argument("--idle-polls", type=int, default=3)
    sbp.set_defaults(fn=cmd_subdedup_stream)
    ssp = sub.add_parser("session-stream", help="streaming per-event session-id assignment (gap rule)")
    ssp.add_argument("--log-dir", required=True)
    ssp.add_argument("--out", default="/tmp/scylla_cdc_ray/session_out")
    ssp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/session_ckpt")
    ssp.add_argument("--num-shards", type=int, default=64)
    ssp.add_argument("--gap-us", type=int, default=3_600_000_000)
    ssp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ssp.add_argument("--files-per-batch", type=int, default=4)
    ssp.add_argument("--max-batches", type=int, default=None)
    ssp.add_argument("--user-col", default="user_id")
    ssp.add_argument("--ts-col", default="ts")
    ssp.add_argument("--id-col", default="event_id")
    ssp.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    ssp.add_argument("--poll-ms", type=int, default=1000)
    ssp.add_argument("--idle-polls", type=int, default=3)
    ssp.set_defaults(fn=cmd_session_stream)
    dsp = sub.add_parser("distinct-stream", help="streaming exact distinct-per-window counter")
    dsp.add_argument("--log-dir", required=True)
    dsp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/dist_ckpt")
    dsp.add_argument("--window-ms", type=int, default=3_600_000)
    dsp.add_argument("--key-col", default="conv_id")
    dsp.add_argument("--ts-col", default="ts_us")
    dsp.add_argument("--num-shards", type=int, default=64)
    dsp.add_argument(
        "--approx",
        action="store_true",
        help="bounded state: one HLL per (shard, window) instead of the exact seen-set",
    )
    dsp.add_argument("--hll-p", type=int, default=12, help="HLL precision (2^p registers)")
    dsp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    dsp.add_argument("--files-per-batch", type=int, default=4)
    dsp.add_argument("--max-batches", type=int, default=None)
    dsp.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    dsp.add_argument("--poll-ms", type=int, default=1000)
    dsp.add_argument("--idle-polls", type=int, default=3)
    dsp.set_defaults(fn=cmd_distinct_stream)
    kp = sub.add_parser("cap-stream", help="streaming per-key admission cap (per-domain quota)")
    kp.add_argument("--log-dir", required=True)
    kp.add_argument("--out", default="/tmp/scylla_cdc_ray/cap_out")
    kp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/cap_ckpt")
    kp.add_argument("--cap", type=int, required=True, help="max admitted rows per key")
    kp.add_argument("--key-col", default="source")
    kp.add_argument("--order-col", default="doc_id")
    kp.add_argument("--num-shards", type=int, default=64)
    kp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    kp.add_argument("--files-per-batch", type=int, default=4)
    kp.add_argument("--max-batches", type=int, default=None)
    kp.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    kp.add_argument("--poll-ms", type=int, default=1000)
    kp.add_argument("--idle-polls", type=int, default=3)
    kp.set_defaults(fn=cmd_cap_stream)
    cu = sub.add_parser("curation-stream", help="streaming curation chain (filter+decontam+dedup+cap), exactly-once")
    cu.add_argument("--log-dir", required=True)
    cu.add_argument("--out", default="/tmp/scylla_cdc_ray/cur_out")
    cu.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/cur_ckpt")
    cu.add_argument("--cap", type=int, default=10, help="max admitted docs per source")
    cu.add_argument("--max-dup-micro", type=int, default=60000)
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--source-col", default="source")
    cu.add_argument("--num-shards", type=int, default=64)
    cu.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    cu.add_argument("--files-per-batch", type=int, default=4)
    cu.add_argument("--max-batches", type=int, default=None)
    cu.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    cu.add_argument("--poll-ms", type=int, default=1000)
    cu.add_argument("--idle-polls", type=int, default=3)
    cu.set_defaults(fn=cmd_curation_stream)
    ep = sub.add_parser("emb-stream", help="streaming SRP-LSH embedding near-dup filter")
    ep.add_argument("--log-dir", required=True)
    ep.add_argument("--out", default="/tmp/scylla_cdc_ray/emb_out")
    ep.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/emb_ckpt")
    ep.add_argument("--vec-col", default="embedding")
    ep.add_argument("--order-col", default="vec_id")
    ep.add_argument("--n-tables", type=int, default=4)
    ep.add_argument("--n-planes", type=int, default=8)
    ep.add_argument("--dim", type=int, default=64)
    ep.add_argument("--num-shards", type=int, default=64)
    ep.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ep.add_argument("--files-per-batch", type=int, default=4)
    ep.add_argument("--max-batches", type=int, default=None)
    ep.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    ep.add_argument("--poll-ms", type=int, default=1000)
    ep.add_argument("--idle-polls", type=int, default=3)
    ep.set_defaults(fn=cmd_emb_stream)
    hp = sub.add_parser("hh-stream", help="streaming SpaceSaving heavy-hitter tokens")
    hp.add_argument("--log-dir", required=True)
    hp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/hh_ckpt")
    hp.add_argument("--m", type=int, default=4096, help="SpaceSaving counters")
    hp.add_argument("--k", type=int, default=20, help="top-k to print")
    hp.add_argument("--text-col", default="text")
    hp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    hp.add_argument("--files-per-batch", type=int, default=4)
    hp.add_argument("--max-batches", type=int, default=None)
    hp.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    hp.add_argument("--poll-ms", type=int, default=1000)
    hp.add_argument("--idle-polls", type=int, default=3)
    hp.set_defaults(fn=cmd_hh_stream)
    mp = sub.add_parser("minhash-stream", help="streaming arrival-order LSH near-dup filter")
    mp.add_argument("--log-dir", required=True)
    mp.add_argument("--out", default="/tmp/scylla_cdc_ray/mh_out")
    mp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/mh_ckpt")
    mp.add_argument("--num-shards", type=int, default=64)
    mp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    mp.add_argument("--files-per-batch", type=int, default=4)
    mp.add_argument("--max-batches", type=int, default=None)
    mp.add_argument("--text-col", default="text")
    mp.add_argument("--order-col", default="doc_id")
    mp.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    mp.add_argument("--poll-ms", type=int, default=1000)
    mp.add_argument("--idle-polls", type=int, default=3)
    mp.set_defaults(fn=cmd_minhash_stream)
    cp = sub.add_parser("cep-stream", help="streaming per-conversation pattern counting (literal or regex)")
    cp.add_argument("--log-dir", required=True)
    cp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/cep_ckpt")
    cp.add_argument("--num-shards", type=int, default=64)
    cp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    cp.add_argument("--files-per-batch", type=int, default=4)
    cp.add_argument("--max-batches", type=int, default=None)
    cp.add_argument("--pattern", default="uta", help="role-symbol sequence (u/a/t/s/d); regex with --regex")
    cp.add_argument("--regex", action="store_true", help="treat --pattern as an RE2 regex (DFA-pruned carry)")
    cp.add_argument("--key-col", default="conv_id")
    cp.add_argument("--role-col", default="role")
    cp.add_argument("--tail", action="store_true", help="live tail: poll for new files")
    cp.add_argument("--poll-ms", type=int, default=1000)
    cp.add_argument("--idle-polls", type=int, default=3)
    cp.set_defaults(fn=cmd_cep_stream)
    for name, fn in (("run", cmd_run), ("validate", cmd_validate), ("ingest", cmd_ingest)):
        sp = sub.add_parser(name)
        sp.add_argument("--log-dir", required=True)
        sp.add_argument("--out", default="/tmp/scylla_cdc_ray/out")
        sp.add_argument("--checkpoint", default="/tmp/scylla_cdc_ray/checkpoint")
        sp.add_argument("--num-shards", type=int, default=64)
        sp.add_argument("--epoch", type=int, default=0)
        sp.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
        sp.add_argument("--window-size-ms", type=int, default=30_000)
        sp.add_argument("--confidence-window-ms", type=int, default=30_000)
        sp.add_argument("--allowed-lateness-ms", type=int, default=30_000)
        sp.add_argument("--files-per-batch", type=int, default=1)
        sp.add_argument("--max-batches", type=int, default=None)
        sp.add_argument("--windows", action="store_true", help="tumbling window panes")
        sp.add_argument("--sliding", type=str, default=None, metavar="SIZE_MS:SLIDE_MS",
                        help="streaming sliding windows, e.g. 3600000:900000")
        sp.add_argument("--session-gap-ms", type=int, default=None,
                        help="streaming session windows with this gap")
        sp.add_argument("--enrich", action="store_true", help="conv-state join")
        sp.add_argument("--score", action="store_true", help="text quality scoring")
        sp.add_argument("--partition-deletes", action="store_true",
                        help="consume conversation tombstones (turn_idx NULL) mid-stream")
        sp.add_argument("--initial-lookback-ms", type=int, default=None,
                        help="fresh start: skip history older than (log frontier - lookback)"
                             " (reference scylla.initial.lookback.ms)")
        sp.add_argument("--min-batch-interval-ms", type=int, default=0,
                        help="reader throttle (reference scylla.minimal.wait.for.window.size.ms)")
        sp.add_argument("--tail", action="store_true",
                        help="live tailing: poll for new files, hold back the confidence window")
        sp.add_argument("--poll-ms", type=int, default=500, help="tail poll interval (reference poll.interval.ms)")
        sp.add_argument("--idle-polls", type=int, default=10, help="stop tailing after this many empty polls")
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
