"""Deterministic synthetic transcript CDC-log generator (FIXTURES.md).

Seeded, wall-clock-free (fixed ``EPOCH0``), fully vectorized (numpy) so the
bench harness can generate millions of rows in seconds. The generated table is
the *CDC log*: per ``(conv_id, turn_idx)`` key the first occurrence is the
insert, later re-emissions (bumped ``version`` text) are updates, and a final
``text = NULL`` row is the delete tombstone — mirroring the reference's
ROW_INSERT/ROW_UPDATE/ROW_DELETE ops (``ScyllaChangesConsumer.java:200-219``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import SEQ_COL, TRANSCRIPTS

#: Fixed epoch origin (FIXTURES.md §2) — never ``now()``.
EPOCH0_US = np.int64(pd.Timestamp("2026-01-01T00:00:00Z").value // 1000)

ROLES = np.array(["user", "assistant", "tool", "system"])
TOOLS = np.array([None, "search", "python", "browser"], dtype=object)
VOCAB = np.array(
    [
        "alpha beta gamma",
        "delta epsilon zeta eta",
        "theta iota kappa",
        "lambda mu nu xi omicron",
        "pi rho sigma",
        "tau upsilon phi chi psi omega",
    ]
)


def generate(
    num_convs: int = 20,
    turns_per_conv: int = 10,
    update_pct: int = 30,
    delete_pct: int = 10,
    hot_convs: int = 0,
    hot_turns: int = 0,
    step_us: int = 1_000_000,
    conv_stagger_us: int = 137_000,
    text_pad: int = 0,
) -> pa.Table:
    """Build the transcript CDC log as one Arrow table sorted by arrival.

    Selection of updated/deleted keys is arithmetic (no RNG) so any scale of
    the same parameters nests deterministically. ``hot_convs`` of the convs get
    ``hot_turns`` turns instead, to model long-conversation skew (fixture T5).
    """
    # --- turns per conv ----------------------------------------------------
    tpc = np.full(num_convs, turns_per_conv, dtype=np.int64)
    if hot_convs:
        tpc[:hot_convs] = hot_turns
    conv = np.repeat(np.arange(num_convs, dtype=np.int64), tpc)
    offs = np.concatenate([np.arange(n, dtype=np.int64) for n in tpc]) if len(tpc) else np.array([], dtype=np.int64)
    turn = offs.astype(np.int32)

    ins_ts = EPOCH0_US + conv * conv_stagger_us + offs * step_us

    key_mix = conv * 31 + offs * 7
    upd_mask = (key_mix % 100) < update_pct
    del_mask = ((conv * 17 + offs * 13) % 100) < delete_pct

    # --- assemble insert / update / delete event blocks --------------------
    blocks = []

    def block(c, t, ts, version):
        n = len(c)
        blocks.append(
            {
                "conv": c,
                "turn": t,
                "ts": ts,
                "version": np.full(n, version, dtype=np.int64),
            }
        )

    block(conv, turn, ins_ts, 0)
    block(conv[upd_mask], turn[upd_mask], ins_ts[upd_mask] + np.int64(90 * step_us), 1)
    block(conv[del_mask], turn[del_mask], ins_ts[del_mask] + np.int64(180 * step_us), -1)

    c = np.concatenate([b["conv"] for b in blocks])
    t = np.concatenate([b["turn"] for b in blocks])
    ts = np.concatenate([b["ts"] for b in blocks])
    version = np.concatenate([b["version"] for b in blocks])

    # --- arrival order = ts, tie-broken by (conv, turn) --------------------
    order = np.lexsort((t, c, ts))
    c, t, ts, version = c[order], t[order], ts[order], version[order]
    seq = np.arange(len(c), dtype=np.int64)

    # --- value columns (vectorized, Arrow-native, CHUNKED) ------------------
    # Two sf1-scale constraints shape this: (a) pandas object-string
    # concatenation held ~3 copies of ~88M Python strings and OOM'd a
    # 128 GB host; Arrow string buffers carry the same bytes at ~1/3 the
    # footprint. (b) a single pa.string() array overflows its int32 offsets
    # past 2 GB of text, so the string columns are built in row slices and
    # assembled as ChunkedArrays (every downstream writer slices/filters,
    # which preserves chunking). Output bytes are identical to the original
    # pandas construction (decimal int casts, same vocab/pad lookups).
    import pyarrow.compute as pc

    filler = " lorem ipsum dolor sit amet and the rest of it is padding" * (
        text_pad // 16 + 1
    )
    vocab_arr = pa.array(VOCAB.tolist(), pa.string())
    tools_arr = pa.array(TOOLS.tolist(), pa.string())

    n = len(c)
    CH = 4_000_000
    conv_chunks, role_chunks, text_chunks, tool_chunks = [], [], [], []
    for lo in range(0, max(n, 1), CH):
        sl = slice(lo, min(lo + CH, n))
        cc, tt, vv = c[sl], t[sl], version[sl]
        valid = vv >= 0
        role_np = ROLES[(tt % 4)]
        tool_idx = np.where(role_np == "tool", 1 + (tt % 3), 0).astype(np.int64)
        tool_chunks.append(pc.take(tools_arr, pa.array(tool_idx)))

        c_str = pc.cast(pa.array(cc), pa.string())
        t_str = pc.cast(pa.array(tt.astype(np.int64)), pa.string())
        v_str = pc.cast(pa.array(vv), pa.string())
        base = pc.take(
            vocab_arr, pa.array((cc * 13 + tt * 5 + vv * 3) % len(VOCAB))
        )
        parts = [
            pa.scalar("c"), c_str, pa.scalar(".t"), t_str,
            pa.scalar(".v"), v_str, pa.scalar(" "), base,
        ]
        if text_pad:
            # deterministic width by index so skew fixtures also exercise
            # wide rows; vectorized via take-from-unique-prefixes
            pad_len = (np.abs(np.sin(cc * 0.7 + tt * 0.3)) * text_pad).astype(
                np.int64
            )
            uniq, inv = np.unique(pad_len, return_inverse=True)
            parts.append(
                pc.take(
                    pa.array([filler[:k] for k in uniq], pa.string()),
                    pa.array(inv.astype(np.int64)),
                )
            )
        text = pc.binary_join_element_wise(*parts, pa.scalar(""))
        text_chunks.append(
            pc.if_else(pa.array(valid), text, pa.scalar(None, pa.string()))
        )
        role_chunks.append(
            pa.array(np.where(valid, role_np, "__tombstone__"), pa.string())
        )
        conv_chunks.append(
            pc.binary_join_element_wise(pa.scalar("conv"), c_str, pa.scalar(""))
        )

    tbl = pa.table(
        {
            "conv_id": pa.chunked_array(conv_chunks),
            "turn_idx": pa.array(t, type=pa.int32()),
            "role": pa.chunked_array(role_chunks),
            "text": pa.chunked_array(text_chunks),
            "tool": pa.chunked_array(tool_chunks),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            SEQ_COL: pa.array(seq, type=pa.int64()),
        }
    )
    return tbl


def write_windowed(
    tbl: pa.Table,
    out_dir: str,
    num_files: int = 4,
) -> list[str]:
    """Write the log as ``num_files`` Parquet files split on arrival ``seq``.

    One file per micro-batch window (FIXTURES.md §2) so the windowed reader
    (SURVEY.md §2.1 S1) has natural "new data" boundaries.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    paths = []
    bounds = [round(i * n / num_files) for i in range(num_files + 1)]
    for i in range(num_files):
        lo, hi = bounds[i], bounds[i + 1]
        path = os.path.join(out_dir, f"window-{i:05d}.parquet")
        pq.write_table(tbl.slice(lo, hi - lo), path)
        paths.append(path)
    return paths


def to_image_log(tbl: pa.Table, shuffle_seed: int | None = None) -> pa.Table:
    """Row-level CDC log → image-mode log: each event becomes up to three rows
    (PRE_IMAGE / delta / POST_IMAGE) sharing the event's ``ts``
    (fixture for the reference's pre/postimage pipelines; the misalignment
    regression shuffles rows within the log with ``shuffle_seed``)."""
    from ..stages.op_derive import derive_ops

    ev = derive_ops(tbl)
    parts = []

    def img(mask_tbl, op_kind, prefix):
        cols = {
            "conv_id": mask_tbl["conv_id"],
            "turn_idx": mask_tbl["turn_idx"],
            "op_kind": pa.array([op_kind] * mask_tbl.num_rows, pa.string()),
            "role": mask_tbl[prefix + "role"],
            "text": mask_tbl[prefix + "text"],
            "tool": mask_tbl[prefix + "tool"],
            # correlation/ordering key (≙ cdc$time): the event's ts, shared by
            # all images of one change; the image's own row-state ts
            # (≙ writetime) travels separately as row_ts
            "ts": mask_tbl["ts"],
            "row_ts": mask_tbl[prefix + "ts"],
            # change identity shared by this change's pre/delta/post rows —
            # disambiguates distinct changes that collide on (conv,turn,ts)
            "change_id": mask_tbl[SEQ_COL],
            SEQ_COL: mask_tbl[SEQ_COL],
        }
        return pa.table(cols)

    import pyarrow.compute as pc

    ins = ev.filter(pc.equal(ev["op"], "c"))
    upd = ev.filter(pc.equal(ev["op"], "u"))
    dele = ev.filter(pc.equal(ev["op"], "d"))
    parts += [img(ins, "INSERT", "after_"), img(ins, "POST_IMAGE", "after_")]
    parts += [img(upd, "PRE_IMAGE", "before_"), img(upd, "UPDATE", "after_"), img(upd, "POST_IMAGE", "after_")]
    parts += [img(dele, "PRE_IMAGE", "before_"), img(dele, "DELETE", "before_")]
    out = pa.concat_tables(parts)
    # delta DELETE rows carry the pre values only as placeholders; blank text
    # is irrelevant — correlation nulls after for deletes
    n = out.num_rows
    if shuffle_seed is not None:
        rng = np.random.RandomState(shuffle_seed)
        order = rng.permutation(n)
        out = out.take(pa.array(order, pa.int64()))
    else:
        out = out.sort_by([("ts", "ascending"), (SEQ_COL, "ascending")])
    # unique per-row arrival id
    return out.set_column(
        out.column_names.index(SEQ_COL), SEQ_COL, pa.array(np.arange(n), pa.int64())
    )


def write_bucketed(
    tbl: pa.Table,
    out_dir: str,
    num_shards: int,
    num_files: int = 4,
) -> list[str]:
    """Write the log pre-partitioned by stream shard:
    ``out_dir/shard=K/window-NNNNN.parquet`` — the layout a production CDC
    log already has (Scylla partitions its CDC log by stream-id; the
    reference's tasks each read only their own streams, `README.md:7`).
    The shuffle-free runner fast path consumes this layout."""
    import os

    import pyarrow.parquet as pq

    from ..schema import shard_of

    shard = shard_of(tbl["conv_id"], num_shards)
    tbl = tbl.append_column("shard", shard)
    n = tbl.num_rows
    bounds = [round(i * n / num_files) for i in range(num_files + 1)]
    paths = []
    # NEVER sort_by/take the whole window: those concatenate each column into
    # ONE contiguous array, and a window whose string bytes exceed int32
    # offsets (sf1: ~4.7 GB of text per window) overflows. filter() works
    # chunk-wise (output stays chunked, input is never concatenated), each
    # per-shard slice is small, and rows keep arrival order within the shard
    # — the same output a stable shard sort produced.
    for i in range(num_files):
        window = tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        sh = window["shard"].to_numpy(zero_copy_only=False)
        for k in np.unique(sh):
            part = window.filter(pa.array(sh == k))
            d = os.path.join(out_dir, f"shard={int(k)}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"window-{i:05d}.parquet")
            pq.write_table(part, path)
            paths.append(path)
    return paths


def scale_for_sf(sf: float) -> dict:
    """Generator parameters proportional to a testdata scale factor.

    sf=0.1 → ~8.7M CDC events with ~400-char texts (≈2.6 GB raw) so the
    bench run is compute-dominated (tens of seconds at the low CPU level).
    """
    num_convs = max(20, int(12000 * sf))
    return {
        "num_convs": num_convs,
        "turns_per_conv": 5000 if sf >= 0.1 else 100,
        "update_pct": 30,
        "delete_pct": 10,
        "hot_convs": max(1, num_convs // 200),
        "hot_turns": 50000 if sf >= 0.1 else 2000,
        "text_pad": 400,
    }
