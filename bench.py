"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the streaming CDC capture pipeline (micro-batch runner with
checkpointing + exactly-once sink) over a deterministic synthetic transcript
CDC log sized by $GRAFT_SF_DIR's scale factor, plus per-operator timings for
the window/join/dedup pipelines over the same log and testdata tables.

``--scaling``: run the headline twice in fresh processes at num_cpus=4 and 16 (4x)
on the same input and report both throughputs + scaling efficiency
(sandbox stand-in for the N vs 4N cluster-size criterion in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


BENCH_SHARDS = 64  # fixed across CPU levels so both run the same job


def ensure_log(sf: float) -> tuple[str, str]:
    """Generate (once) the synthetic CDC log for this scale under /tmp.
    Returns (bucketed_dir, flat_dir): the bucketed layout feeds the
    shuffle-free runner fast path (the production layout — CDC logs are
    per-stream partitioned at the source); the flat layout feeds the
    shuffle-path comparison."""
    from scylla_cdc_source_connector_ray.sources.synthetic import (
        generate,
        scale_for_sf,
        write_bucketed,
        write_windowed,
    )

    params = scale_for_sf(sf)
    base = f"/tmp/scylla_cdc_bench/sf{sf}"
    stamp = os.path.join(base, "_PARAMS.json")
    want = json.dumps({**params, "shards": BENCH_SHARDS}, sort_keys=True)
    if not (os.path.exists(stamp) and open(stamp).read() == want):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        t = generate(**params)
        write_bucketed(t, f"{base}/blog", num_shards=BENCH_SHARDS, num_files=8)
        write_windowed(t, f"{base}/log", num_files=8)
        with open(stamp, "w") as f:
            f.write(want)
    return f"{base}/blog", f"{base}/log"


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2.0


def calibration_probe(repeats: int = 3) -> dict:
    """Fixed-work host-speed probe, run before Ray starts: constant CPU
    (matmul), memory-bandwidth (large-array sweep — the component that
    drifted 1.5-1.6x intra-day in round 3), and parquet write+read legs.
    The SAME work every run, so ``probe_sec`` ratios between two bench runs
    estimate host drift and let cross-round deltas be normalized
    mechanically (BASELINE.md §6). Median of ``repeats``."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    a = rng.standard_normal((1024, 1024))
    big = rng.standard_normal(32 * 1024 * 1024)  # 256 MB
    tbl = pa.table(
        {
            "x": np.arange(2_000_000, dtype=np.int64),
            "y": rng.standard_normal(2_000_000),
        }
    )
    cpu_t, mem_t, io_t = [], [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(4):
            a @ a
        cpu_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(4):
            s += float(big.sum())
            big *= 1.0
        mem_t.append(time.perf_counter() - t0)
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            p = os.path.join(d, "probe.parquet")
            t0 = time.perf_counter()
            pq.write_table(tbl, p)
            pq.read_table(p)
            io_t.append(time.perf_counter() - t0)
    probe = {
        "probe_cpu_sec": round(_median(cpu_t), 3),
        "probe_mem_sec": round(_median(mem_t), 3),
        "probe_io_sec": round(_median(io_t), 3),
    }
    probe["probe_sec"] = round(sum(probe.values()), 3)
    return probe


#: repeats per timed query; median reported (run-to-run object-store variance
#: made round-1 driver numbers drift ~1.7x from single-shot builder numbers)
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    probe = calibration_probe()

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.use_polars_sort = True  # 36% faster sort-shuffle measured on this workload

    import ray.data

    from scylla_cdc_source_connector_ray.config import EngineConfig
    from scylla_cdc_source_connector_ray.pipelines import capture as cap
    from scylla_cdc_source_connector_ray.pipelines.runner import CaptureRunner
    from scylla_cdc_source_connector_ray.stages import windows as W
    from scylla_cdc_source_connector_ray.stages.join import conv_state_features

    sf = sf_from_dir(sf_dir)
    blog_dir, log_dir = ensure_log(sf)
    scratch = f"/tmp/scylla_cdc_bench/sf{sf}/run_{num_cpus}"
    shutil.rmtree(scratch, ignore_errors=True)

    queries: dict[str, float] = {}
    num_shards = BENCH_SHARDS  # fixed: same job at every CPU level

    def timed(name: str, fn) -> None:
        """Median wall time of ``fn`` over REPEATS runs. ``os.sync()`` before
        each sample (untimed) so one repeat's dirty writeback doesn't throttle
        the next — the dominant cross-repeat interference on this disk."""
        times = []
        for _ in range(REPEATS):
            os.sync()
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        queries[name] = round(_median(times), 3)

    # warm page cache (untimed) — count() alone is a metadata fast path and
    # reads NO data; force a real scan of every block
    import pyarrow as _pa

    def _warm(path):
        ray.data.read_parquet(path).map_batches(
            lambda t: _pa.table({"n": [t.num_rows]}), batch_format="pyarrow"
        ).count()

    _warm(log_dir)
    _warm(blog_dir)

    # --- headline: streaming capture+score runner over the pre-partitioned
    # log (shuffle-free fast path; the production CDC layout) ---------------
    headline_times: list[float] = []
    totals: dict = {}
    for rep in range(REPEATS):
        rep_scratch = f"{scratch}/rep{rep}"  # fresh ckpt/sink per repeat
        cfg = EngineConfig(
            num_shards=num_shards,
            score_text=True,
            window_agg=True,
            enrich_conv_state=True,
            window_size_us=3_600_000_000,
            sink_dir=f"{rep_scratch}/out",
            checkpoint_dir=f"{rep_scratch}/ckpt",
        )
        os.sync()  # flush the previous repeat's writeback, untimed
        t0 = time.perf_counter()
        runner = CaptureRunner(blog_dir, cfg)
        totals = runner.run(files_per_batch=4)
        runner.flush_windows()
        headline_times.append(time.perf_counter() - t0)
        if rep:  # keep rep0 output for inspection, drop the rest
            shutil.rmtree(rep_scratch, ignore_errors=True)
    headline = _median(headline_times)
    queries["capture_stream"] = round(headline, 3)
    events = totals["events"]

    if os.environ.get("BENCH_HEADLINE_ONLY"):  # --scaling measures only the headline
        ray.shutdown()
        return {
            "metric": "cdc_capture_stream_sec",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": num_cpus,
            "events": events,
            "events_per_sec": round(events / headline, 1),
            "repeats": REPEATS,
            **probe,
        }

    # --- batch-mode capture over the UNpartitioned log (includes the one
    # keyed shuffle) --------------------------------------------------------
    cfg_batch = EngineConfig(num_shards=num_shards)

    def _batch_capture():
        n = cap.capture(
            ray.data.read_parquet(log_dir, override_num_blocks=2 * num_cpus), cfg_batch
        ).count()
        assert n == events, (n, events)

    timed("capture_batch_shuffle", _batch_capture)

    # --- windows / join over the log --------------------------------------
    HOUR, MIN15 = 3_600_000_000, 900_000_000
    timed(
        "win_tumbling",
        lambda: W.tumbling(
            ray.data.read_parquet(log_dir, override_num_blocks=2 * num_cpus), HOUR, keys=["role"]
        ).count(),
    )
    timed(
        "win_sliding",
        lambda: W.sliding(
            ray.data.read_parquet(log_dir, override_num_blocks=2 * num_cpus), HOUR, MIN15
        ).count(),
    )
    timed(
        "win_session",
        lambda: W.session(
            ray.data.read_parquet(log_dir, columns=["conv_id", "ts"], override_num_blocks=2 * num_cpus),
            gap_us=60_000_000,
            num_shards=num_shards,
        ).count(),
    )
    timed(
        "join_conv_state",
        lambda: conv_state_features(
            ray.data.read_parquet(log_dir, override_num_blocks=2 * num_cpus), num_shards=num_shards
        ).count(),
    )

    # --- CEP pattern matching over the log ---------------------------------
    from scylla_cdc_source_connector_ray.stages import cep as CEP

    def _cep():
        ds = ray.data.read_parquet(
            log_dir, columns=["conv_id", "role", "ts", "seq"], override_num_blocks=2 * num_cpus
        ).map_batches(
            lambda t: t.append_column("sym", CEP.role_symbols(t["role"])).drop_columns(["role"]),
            batch_format="pyarrow",
        )
        CEP.match_pattern(ds, "ut+a", keys=["conv_id"], num_shards=num_shards).count()

    timed("cep_pattern_match", _cep)

    # --- training-data ops over the testdata tables at this sf -------------
    import numpy as np

    from scylla_cdc_source_connector_ray.functions.dedup import (
        exact_dedup_hashed,
        minhash_lsh_dedup,
    )
    from scylla_cdc_source_connector_ray.functions.similarity import ann_bruteforce
    from scylla_cdc_source_connector_ray.functions.textops import quality_score

    docs_path = os.path.join(sf_dir, "documents.parquet")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(docs_path):
        timed(
            "quality_score",
            lambda: ray.data.read_parquet(docs_path)
            .map_batches(quality_score, batch_format="pyarrow")
            .count(),
        )
        timed(
            "dedup_exact_hashed",
            lambda: exact_dedup_hashed(ray.data.read_parquet(docs_path)).count(),
        )
        timed(
            "dedup_minhash_lsh",
            lambda: minhash_lsh_dedup(ray.data.read_parquet(docs_path), threshold=0.7).count(),
        )

        from scylla_cdc_source_connector_ray.functions.dedup import ngram_jaccard_dedup

        timed(
            "dedup_ngram_jaccard",
            lambda: ngram_jaccard_dedup(
                ray.data.read_parquet(docs_path), threshold=0.7
            ).count(),
        )

        from scylla_cdc_source_connector_ray.functions.corpus import corpus_prep

        timed(
            "corpus_prep",
            lambda: corpus_prep(ray.data.read_parquet(docs_path)).count(),
        )

    # streaming first-occurrence dedup over 2 transcript-log windows (~1/4 of
    # the corpus): exercises the checkpointed seen-set runner at real volume
    # (the documents table is tiny at every sf)
    from scylla_cdc_source_connector_ray.pipelines.dedup_stream import (
        DedupStreamRunner,
    )

    dstream_files = sorted(
        f for f in os.listdir(log_dir) if f.endswith(".parquet")
    )[:2]
    if dstream_files:
        dlog = f"{scratch}/dstream_log"
        os.makedirs(dlog, exist_ok=True)
        for f in dstream_files:
            dst = os.path.join(dlog, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(log_dir, f), dst)

        def _dedup_stream():
            base = f"{scratch}/dstream_run"
            shutil.rmtree(base, ignore_errors=True)
            DedupStreamRunner(
                dlog,
                num_shards=num_shards,
                sink_dir=f"{base}/out",
                checkpoint_dir=f"{base}/ckpt",
                text_col="text",
                order_col="seq",
            ).run(files_per_batch=1)

        timed("dedup_stream_transcripts", _dedup_stream)

        # the COMPOSED streaming curation chain over the same 2 windows:
        # repetition filter + decontam + dedup + per-role cap through one
        # exactly-once runner — measures the whole-chain state machinery at
        # transcript volume (added round 5; keys are additive, older BENCH
        # files simply lack it)
        from scylla_cdc_source_connector_ray.pipelines.curation_stream import (
            CurationStreamRunner,
        )

        def _curation_stream():
            base = f"{scratch}/custream_run"
            shutil.rmtree(base, ignore_errors=True)
            CurationStreamRunner(
                dlog,
                num_shards=num_shards,
                sink_dir=f"{base}/out",
                checkpoint_dir=f"{base}/ckpt",
                text_col="text",
                id_col="seq",
                source_col="role",
                cap_k=100_000,
            ).run(files_per_batch=1)

        timed("curation_stream_transcripts", _curation_stream)

        # segment-level dedup over the same 2 windows: decision plane +
        # reassembly at transcript volume (documents is tiny at every sf)
        from scylla_cdc_source_connector_ray.functions.dedup import segment_dedup

        seg_files = [os.path.join(dlog, f) for f in sorted(os.listdir(dlog))]
        timed(
            "segment_dedup_transcripts",
            lambda: segment_dedup(
                ray.data.read_parquet(seg_files, columns=["seq", "text"]),
                seg_words=10,
                id_col="seq",
            ).count(),
        )

        # repeated-substring span removal over the same 2 windows: the
        # heaviest dedup shape (one decision row per word-gram INSTANCE —
        # ~word count — through the gram exchange; added round 5, additive)
        from scylla_cdc_source_connector_ray.functions.dedup import substring_dedup

        timed(
            "substring_dedup_transcripts",
            lambda: substring_dedup(
                ray.data.read_parquet(seg_files, columns=["seq", "text"]),
                k=8,
                id_col="seq",
            ).count(),
        )

    if os.path.exists(emb_path):
        qdf = ray.data.read_parquet(emb_path).limit(16).to_pandas()
        timed(
            "ann_bruteforce",
            lambda: ann_bruteforce(
                ray.data.read_parquet(emb_path),
                np.stack(qdf["embedding"].values),
                qdf["vec_id"].values,
                k=10,
            ),
        )

        from scylla_cdc_source_connector_ray.functions.similarity import (
            IVFIndex,
            _stack,
            grouped_centroid_sums,
        )

        ivf = IVFIndex(n_centroids=8).fit(
            _stack(ray.data.read_parquet(emb_path).limit(1024).to_pandas()["embedding"].values)
        )
        timed(
            "embedding_centroids",
            lambda: grouped_centroid_sums(ray.data.read_parquet(emb_path), ivf).count(),
        )

    result = {
        "metric": "cdc_capture_stream_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "events": events,
        "events_per_sec": round(events / headline, 1),
        "repeats": REPEATS,
        **probe,
    }
    ray.shutdown()
    return result


def run_scaling(sf_dir: str, lo: int = 4, hi: int = 16) -> dict:
    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=sf_dir,
            BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo, r_hi = one(lo), one(hi)
    thr_lo, thr_hi = r_lo["events_per_sec"], r_hi["events_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    # a hi leg slower wall-for-wall than the lo leg is physically
    # implausible for this workload — flag the pair as contaminated
    # (probe-invisible host regimes were observed swinging 2-4x intra-day;
    # re-run rather than conclude from a flagged pair)
    anomaly = "hi_leg_slower_than_lo" if r_hi["value"] > r_lo["value"] else None
    return {
        **({"anomaly": anomaly} if anomaly else {}),
        "sf_dir": sf_dir,
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"events_per_sec_{lo}": thr_lo,
        f"events_per_sec_{hi}": thr_hi,
        "scaling_efficiency": round(eff, 3),
        # per-leg host-speed probes: a drifting ratio between legs flags a
        # contaminated pair (round-3 lesson) — re-run rather than conclude
        f"probe_sec_{lo}": r_lo.get("probe_sec"),
        f"probe_sec_{hi}": r_hi.get("probe_sec"),
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        # optional pair after --scaling, e.g. `--scaling 8:32` (default 4:16)
        lo, hi = 4, 16
        i = sys.argv.index("--scaling")
        if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("-"):
            arg = sys.argv[i + 1]
            try:
                lo, hi = (int(x) for x in arg.split(":"))
            except ValueError:
                sys.exit(f"--scaling expects LO:HI (two integers), got {arg!r}")
            if not (0 < lo < hi):
                sys.exit(f"--scaling expects 0 < LO < HI, got {arg!r}")
        print(json.dumps(run_scaling(sf_dir, lo, hi)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, num_cpus)))
