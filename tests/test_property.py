"""Property-based tests (hypothesis): the vectorized CDC state machine must
agree with the single-threaded oracle on arbitrary logs, and micro-batch
splitting must never change the result (split-invariance = the essence of
correct streaming state)."""

import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops
from tests.oracle import cdc_oracle

ROLES = ["user", "assistant", "tool"]


@st.composite
def logs(draw):
    n = draw(st.integers(1, 40))
    rows = []
    for i in range(n):
        conv = draw(st.sampled_from(["a", "b", "c"]))
        turn = draw(st.integers(0, 3))
        tomb = draw(st.booleans()) and draw(st.booleans())  # ~25% deletes
        text = None if tomb else draw(st.sampled_from(["x", "y", "z", ""]))
        role = "__tombstone__" if tomb else draw(st.sampled_from(ROLES))
        tool = draw(st.sampled_from([None, "search"]))
        ts = draw(st.integers(0, 10)) * 1_000_000
        rows.append((conv, turn, role, text, tool, ts, i))
    return rows


def _table(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
            "seq": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


def _norm(df: pd.DataFrame) -> list:
    cols = ["conv_id", "turn_idx", "seq", "op", "before_text", "after_text", "before_role", "after_role"]
    df = df[cols].sort_values(["conv_id", "turn_idx", "seq"]).reset_index(drop=True)
    return df.fillna("~").values.tolist()


@settings(max_examples=60, deadline=None)
@given(logs())
def test_derive_matches_oracle_on_random_logs(rows):
    t = _table(rows)
    assert _norm(derive_ops(t).to_pandas()) == _norm(cdc_oracle(t.to_pandas()))


@settings(max_examples=40, deadline=None)
@given(logs(), st.integers(0, 39))
def test_split_invariance_via_seeded_state(rows, cut_raw):
    """Processing [0:cut] then [cut:] with the carried last-row-per-key state
    must equal processing the whole log — for ANY cut point — provided the
    log is per-key ordered across the cut (we sort rows by (ts, seq) first,
    the arrival-order contract of the runner)."""
    rows = sorted(rows, key=lambda r: (r[5], r[6]))
    cut = min(cut_raw, len(rows))
    whole = derive_ops(_table(rows)).to_pandas()

    first = derive_ops(_table(rows[:cut]))
    # carry state exactly like the runner: last row per key, tombstone-marked
    import numpy as np
    import pyarrow.compute as pc

    n = first.num_rows
    if n:
        conv = first["conv_id"].combine_chunks()
        turn = first["turn_idx"].combine_chunks()
        nxt = pc.and_(
            pc.equal(conv.slice(0, n - 1), conv.slice(1)),
            pc.equal(turn.slice(0, n - 1), turn.slice(1)),
        ).to_numpy(zero_copy_only=False)
        is_last = np.ones(n, dtype=bool)
        is_last[:-1] = ~nxt
        last = first.filter(pa.array(is_last))
        seed = pa.table(
            {
                "conv_id": last["conv_id"],
                "turn_idx": last["turn_idx"],
                "role": pc.if_else(
                    pc.equal(last["op"], "d"), pa.scalar("__tombstone__"), last["after_role"].combine_chunks()
                ),
                "text": last["after_text"],
                "tool": last["after_tool"],
                "ts": last["ts"],
                "seq": pa.array(np.full(last.num_rows, -1, dtype=np.int64)),
            }
        )
    else:
        seed = None
    second_in = _table(rows[cut:])
    log2 = pa.concat_tables([seed, second_in]) if seed is not None else second_in
    second = derive_ops(log2)
    second = second.filter(pa.compute.greater_equal(second["seq"], 0))
    merged = pd.concat(
        [first.to_pandas(), second.to_pandas()], ignore_index=True
    )
    assert _norm(merged) == _norm(whole)


@st.composite
def image_logs(draw):
    """Random image-mode logs: changes with optional pre/post, shuffled."""
    n_changes = draw(st.integers(1, 15))
    rows = []
    seq = 0
    truth = []
    for i in range(n_changes):
        conv = draw(st.sampled_from(["a", "b"]))
        turn = draw(st.integers(0, 2))
        ts = (i + 1) * 1_000_000  # unique per change
        kind = draw(st.sampled_from(["INSERT", "UPDATE", "DELETE"]))
        text = draw(st.sampled_from(["p", "q", "r"]))
        pre_text = draw(st.sampled_from(["o1", "o2"]))
        if kind in ("UPDATE", "DELETE"):
            rows.append((conv, turn, "PRE_IMAGE", pre_text, ts, seq)); seq += 1
        rows.append((conv, turn, kind, text, ts, seq)); seq += 1
        if kind in ("INSERT", "UPDATE"):
            rows.append((conv, turn, "POST_IMAGE", text, ts, seq)); seq += 1
        truth.append((conv, turn, ts, {"INSERT": "c", "UPDATE": "u", "DELETE": "d"}[kind],
                      pre_text if kind in ("UPDATE", "DELETE") else None,
                      None if kind == "DELETE" else text))
    perm = draw(st.permutations(range(len(rows))))
    rows = [rows[i] for i in perm]
    return rows, truth


@settings(max_examples=50, deadline=None)
@given(image_logs())
def test_correlate_random_interleavings(data):
    """Arbitrary interleavings of complete pre/delta/post sets always
    correlate to exactly the intended events (ST1 under chaos)."""
    from scylla_cdc_source_connector_ray.stages.correlate import correlate_images

    rows, truth = data
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "op_kind": pa.array([r[2] for r in rows], pa.string()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "seq": pa.array([r[5] for r in rows], pa.int64()),
        }
    )
    events, residual, dropped = correlate_images(tbl, straggler_timeout_us=10**15)
    assert residual.num_rows == 0 and dropped == 0
    got = sorted(
        zip(
            events["conv_id"].to_pylist(),
            events["turn_idx"].to_pylist(),
            [t.timestamp() for t in events["ts"].to_pylist()],
            events["op"].to_pylist(),
            events["before_text"].to_pylist(),
            events["after_text"].to_pylist(),
        )
    )
    want = sorted((c, t, ts / 1e6, op, bt, at) for c, t, ts, op, bt, at in truth)
    assert got == want


@settings(max_examples=25, deadline=None)
@given(logs(), st.sampled_from([1, 2, 4]))
def test_windows_match_duckdb_on_random_logs(rows, slide_div):
    """Tumbling + sliding over arbitrary logs match an independent DuckDB
    computation, for several size/slide ratios."""
    import duckdb

    import ray.data

    from scylla_cdc_source_connector_ray.stages import windows as W

    t = _table(rows)
    SIZE = 4_000_000
    SLIDE = SIZE // slide_div
    ds = ray.data.from_arrow(t)
    got_t = (
        W.tumbling(ds, SIZE)
        .to_pandas()
        .sort_values("window_start_us")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("tr", t)
    want_t = con.sql(
        f"""SELECT epoch_us(ts) - epoch_us(ts) % {SIZE} AS window_start_us,
                  count(*) AS n_events, sum(coalesce(length(text),0)) AS n_chars,
                  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
           FROM tr GROUP BY 1 ORDER BY 1"""
    ).df().reset_index(drop=True)
    cols = ["window_start_us", "n_events", "n_chars", "min_ts_us", "max_ts_us"]
    assert got_t[cols].astype("int64").values.tolist() == want_t[cols].astype("int64").values.tolist()

    got_s = (
        W.sliding(ray.data.from_arrow(t), SIZE, SLIDE)
        .to_pandas()
        .sort_values("window_start_us")
        .reset_index(drop=True)
    )
    want_s = con.sql(
        f"""SELECT epoch_us(ts) - epoch_us(ts) % {SLIDE} - {SLIDE} * i AS window_start_us,
                  count(*) AS n_events
           FROM tr CROSS JOIN (SELECT unnest(generate_series(0, {slide_div - 1})) AS i) s
           GROUP BY 1 ORDER BY 1"""
    ).df().reset_index(drop=True)
    assert got_s[["window_start_us", "n_events"]].astype("int64").values.tolist() == want_s[
        ["window_start_us", "n_events"]
    ].astype("int64").values.tolist()


# ---------------------------------------------------------------------------
# CEP literal-carry fold: split invariance at arbitrary cut points
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="uatsd", max_size=60),
    st.sampled_from(["uta", "ua", "ttt", "u", "dd"]),
    st.lists(st.integers(0, 60), max_size=6),
)
def test_cep_fold_literal_split_invariant(s, literal, cuts):
    """Folding a symbol stream chunk-by-chunk with the ≤len-1 suffix carry
    must count exactly the global non-overlapping occurrences, for ANY cut
    points (including empty chunks and cuts inside an occurrence)."""
    import pyarrow as pa

    from scylla_cdc_source_connector_ray.pipelines.cep_stream import fold_literal

    bounds = sorted(min(c, len(s)) for c in cuts)
    chunks, prev = [], 0
    for b in [*bounds, len(s)]:
        chunks.append(s[prev:b])
        prev = b
    count, tail = 0, ""
    for ch in chunks:
        delta, tails = fold_literal(pa.array([tail + ch], pa.string()), literal)
        count += int(delta[0])
        tail = tails[0].as_py()
    assert count == len(s.split(literal)) - 1


# ---------------------------------------------------------------------------
# CEP regex-carry fold: split invariance at arbitrary cut points
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="uatsd", max_size=60),
    st.sampled_from(
        [
            "ut+a", "u(t|a)*s", "ua?t", "t{2,3}", "(ua|ut)+",
            # length-asymmetric alternations: a live low-priority attempt can
            # span positions the prefix scan consumed (frontier regression)
            "utta|t", "uta|ta", "u|ua", "ut{2}a|t+",
        ]
    ),
    st.lists(st.integers(0, 60), max_size=6),
)
def test_cep_fold_regex_split_invariant(s, pattern, cuts):
    """The general-regex fold (RE2 sentinel consumption + DFA-pruned carry +
    the boundary-flush un-consume rule) must count exactly the global
    non-overlapping RE2 matches for ANY cut points — including cuts inside a
    match and inside a greedy quantifier run. The streamed total is
    ``sum(deltas) + count(final tail)`` (a boundary-deferred match sits in
    the carry until it provably cannot extend — the same finalization
    ``read_counts`` applies)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from scylla_cdc_source_connector_ray.pipelines.cep_stream import fold_regex
    from scylla_cdc_source_connector_ray.stages.redfa import SymbolDFA

    dfa = SymbolDFA.compile(pattern)
    bounds = sorted(min(c, len(s)) for c in cuts)
    chunks, prev = [], 0
    for b in [*bounds, len(s)]:
        chunks.append(s[prev:b])
        prev = b
    count, tail = 0, ""
    for ch in chunks:
        delta, tails = fold_regex(pa.array([tail + ch], pa.string()), pattern, dfa)
        count += int(delta[0])
        tail = tails[0].as_py()
    count += pc.count_substring_regex(pa.array([tail]), pattern)[0].as_py()
    want = pc.count_substring_regex(pa.array([s]), pattern)[0].as_py()
    assert count == want


def test_cep_fold_regex_boundary_flush_cases():
    """Deterministic regressions for the scan frontier: a match ending
    exactly at the batch end must be deferred when it could greedily extend
    ('t+' on 't'|'t' streamed 2 vs global 1 pre-fix), and a consumed match
    must be un-consumed when an EARLIER position's attempt is still live at
    the boundary ('utta|t' on 'utt'|'a' streamed 2 vs global 1 pre-fix: the
    high-priority 'utta' branch spans both consumed 't's)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from scylla_cdc_source_connector_ray.pipelines.cep_stream import fold_regex
    from scylla_cdc_source_connector_ray.stages.redfa import SymbolDFA

    for pattern, stream in [
        ("t+", ["t", "t"]),
        ("(ua|ut)+", ["ua", "ut"]),
        ("(ua|ut)+", ["u", "aut"]),
        ("ut+a", ["ut", "ta"]),
        ("ua", ["ua", "ua"]),
        ("utta|t", ["utt", "a"]),
        ("utta|t", ["u", "t", "t", "a"]),
        ("utta|t", ["ut", "tat", "t"]),
        ("uta|ta", ["ut", "a", "ta"]),
        ("u|ua", ["u", "a"]),
    ]:
        dfa = SymbolDFA.compile(pattern)
        count, tail = 0, ""
        for ch in stream:
            delta, tails = fold_regex(pa.array([tail + ch], pa.string()), pattern, dfa)
            count += int(delta[0])
            tail = tails[0].as_py()
        count += pc.count_substring_regex(pa.array([tail]), pattern)[0].as_py()
        want = pc.count_substring_regex(pa.array(["".join(stream)]), pattern)[0].as_py()
        assert count == want, (pattern, stream, count, want)


def test_redfa_rejects_re2_metachars():
    """RE2 class/anchor syntax the DFA subset does not implement must fail
    at construction, not silently compile as literal characters."""
    import pytest

    from scylla_cdc_source_connector_ray.stages.redfa import SymbolDFA

    for bad in [r"u\wa", r"\d+", r"\su", r"^uta", r"uta$", r"[\d]", r"[a\w]"]:
        with pytest.raises(ValueError):
            SymbolDFA.compile(bad)
    # escaped punctuation stays supported
    SymbolDFA.compile(r"u\.a")
    SymbolDFA.compile(r"u\+")
