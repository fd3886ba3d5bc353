"""Round-5 relational additions: RANGE-frame peers, mode ties, exact-moment
corr — edge cases the sf fixture may not contain, vs inline DuckDB twins."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from scylla_cdc_source_connector_ray.pipelines import relational as R


@pytest.fixture()
def sf_dir(tmp_path):
    """Tiny synthetic sf dir with crafted ties."""
    d = str(tmp_path)
    ts = pd.to_datetime(
        [
            "2026-01-01 00:00:00",
            "2026-01-01 00:30:00",
            "2026-01-01 00:30:00",  # ts TIE: RANGE frame must include peers
            "2026-01-01 01:15:00",
            "2026-01-01 02:59:00",
            "2026-01-01 03:00:00",
        ]
    )
    events = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": ts,
            "user_id": np.array([1, 1, 1, 1, 2, 2], np.int64),
            "event_type": ["a", "a", "b", "b", "a", "a"],
            "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
            "props": [""] * 6,
        }
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["x"] * 6,
            # lang "en": tie web/wiki at 1 each -> smallest source wins
            "lang": ["en", "en", "de", "de", "de", None],
            "source": ["web", "wiki", "wiki", "wiki", "web", "web"],
            "n_chars": np.ones(6, np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), os.path.join(d, "documents.parquet"))
    return d


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "documents"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.sql(sql).df()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_moving_sum_range_frame_includes_ts_peers(sf_dir):
    from scylla_cdc_source_connector_ray.oracles import EVENT_MOVING_SUM

    got = _norm(R.event_moving_sum(sf_dir).to_pandas())
    want = _norm(_oracle(sf_dir, EVENT_MOVING_SUM))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the tie rows (event 1 and 2, same ts) must BOTH see both peers
    g = got.set_index("event_id")["moving_sum_c"]
    assert g[1] == g[2] == 100 + 200 + 400


def test_lang_mode_deterministic_tie_and_null_lang(sf_dir):
    from scylla_cdc_source_connector_ray.oracles import LANG_MODE_SOURCE

    got = _norm(R.lang_mode_source(sf_dir).to_pandas())
    want = _norm(_oracle(sf_dir, LANG_MODE_SOURCE))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    m = got.set_index("lang")
    assert m.loc["en", "mode_source"] == "web"  # tie -> smallest source
    assert m.loc["de", "mode_source"] == "wiki"


def test_event_type_corr_matches_exact_moments(sf_dir):
    from scylla_cdc_source_connector_ray.oracles import EVENT_TYPE_CORR

    got = _norm(R.event_type_corr(sf_dir))
    want = _norm(_oracle(sf_dir, EVENT_TYPE_CORR))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_event_type_corr_drops_zero_variance(tmp_path):
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": pd.to_datetime(["2026-01-01"] * 4),
            "user_id": np.array([5, 5, 5, 5], np.int64),  # zero y-variance
            "event_type": ["z"] * 4,
            "value": [1.0, 2.0, 3.0, 4.0],
            "props": [""] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    out = R.event_type_corr(d)
    assert len(out) == 0  # SQL corr would be NULL -> excluded on both sides


def test_event_props_extract_null_and_missing_fields(tmp_path):
    # missing field, malformed JSON, NULL props: NULL k drops from sum/count
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": pd.to_datetime(["2026-01-01"] * 5),
            "user_id": np.zeros(5, np.int64),
            "event_type": ["a", "a", "a", "b", "b"],
            "value": [1.0] * 5,
            "props": ['{"k": 7}', '{"j": 1}', None, '{"k": -2}', "{bad"],
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    from scylla_cdc_source_connector_ray.oracles import EVENT_PROPS_EXTRACT

    got = _norm(R.event_props_extract(d).to_pandas())
    want = _norm(_oracle(d, EVENT_PROPS_EXTRACT))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    m = got.set_index("event_type")
    assert m.loc["a", "sum_k"] == 7 and m.loc["a", "n_with_k"] == 1
    assert m.loc["b", "sum_k"] == -2 and m.loc["b", "n_with_k"] == 1


def test_text_redact_masks_and_counts(tmp_path):
    d = str(tmp_path)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["spark and spark again", "sparkling not a hit", None],
            "lang": ["en"] * 3,
            "source": ["w"] * 3,
            "n_chars": np.ones(3, np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), os.path.join(d, "documents.parquet"))
    from scylla_cdc_source_connector_ray.oracles import TEXT_REDACT

    got = _norm(R.text_redact(d).to_pandas())
    want = _norm(_oracle(d, TEXT_REDACT))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by = got.set_index("doc_id")
    assert by.loc[0, "text"] == "[MASK] and [MASK] again" and by.loc[0, "n_hits"] == 2
    assert by.loc[1, "n_hits"] == 0  # \b guard: 'sparkling' untouched
    assert by.loc[2, "text"] is None and by.loc[2, "n_hits"] == 0


def test_event_type_corr_limbed_sums_survive_int64_overflow(tmp_path):
    # two squared-cents products sum past int64 max: a naive int64 co-moment
    # Sum wraps silently; the limbed partials + Python-int driver fold must
    # still match the HUGEINT SQL twin bit-for-bit
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": pd.to_datetime(["2026-01-01"] * 4),
            "user_id": np.array([1, 2, 3, 4], np.int64),
            "event_type": ["a"] * 4,
            # x up to 2.9e9 cents: each x*x fits int64, two of them do not
            "value": [29_000_000.0, 28_999_999.5, 29_000_000.0, 1.25],
            "props": [""] * 4,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(events, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )
    from scylla_cdc_source_connector_ray.oracles import EVENT_TYPE_CORR

    got = _norm(R.event_type_corr(d))
    want = _norm(_oracle(d, EVENT_TYPE_CORR))
    assert len(got) == 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_event_type_corr_guards_single_product_overflow(tmp_path):
    # |x| beyond 3e9 cents would overflow a SINGLE int64 product: fail loud
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(2, dtype=np.int64),
            "ts": pd.to_datetime(["2026-01-01"] * 2),
            "user_id": np.array([1, 2], np.int64),
            "event_type": ["a"] * 2,
            "value": [40_000_000.0, 1.0],  # 4e9 cents > 3e9 guard
            "props": [""] * 2,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(events, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )
    with pytest.raises(Exception, match="limb split"):
        R.event_type_corr(d)


def test_event_props_extract_try_cast_overflow_parity(tmp_path):
    # literals past int64 range: Arrow's strict cast would crash the query;
    # the SQL twin's TRY_CAST yields NULL. 19-digit in-range values must
    # still be kept exactly.
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": pd.to_datetime(["2026-01-01"] * 5),
            "user_id": np.zeros(5, np.int64),
            "event_type": ["a", "a", "b", "b", "b"],
            "value": [1.0] * 5,
            "props": [
                '{"k": 99999999999999999999}',  # 20 digits -> NULL
                '{"k": 5}',
                '{"k": 1234567890123456789}',  # 19 digits, fits -> kept
                '{"k": -9223372036854775808}',  # int64 min -> kept
                '{"k": 9223372036854775808}',  # int64 max + 1 -> NULL
            ],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(events, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )
    from scylla_cdc_source_connector_ray.oracles import EVENT_PROPS_EXTRACT

    got = _norm(R.event_props_extract(d).to_pandas())
    want = _norm(_oracle(d, EVENT_PROPS_EXTRACT))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    m = got.set_index("event_type")
    assert m.loc["a", "sum_k"] == 5 and m.loc["a", "n_with_k"] == 1
    assert (
        m.loc["b", "sum_k"] == 1234567890123456789 - 9223372036854775808
        and m.loc["b", "n_with_k"] == 2
    )


def test_event_type_regression_matches_exact_moments(sf_dir):
    from scylla_cdc_source_connector_ray.oracles import EVENT_TYPE_REGRESSION

    got = _norm(R.event_type_regression(sf_dir))
    want = _norm(_oracle(sf_dir, EVENT_TYPE_REGRESSION))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_event_type_regression_drops_zero_y_variance(tmp_path):
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": pd.to_datetime(["2026-01-01"] * 3),
            "user_id": np.array([7, 7, 7], np.int64),  # constant regressor
            "event_type": ["z"] * 3,
            "value": [1.0, 2.0, 3.0],
            "props": [""] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    assert len(R.event_type_regression(d)) == 0


def test_cohort_retention_dedups_within_day(tmp_path):
    # user 1: 3 events on day 0 (one pair), 1 on day 2; user 2 first on day 2
    d = str(tmp_path)
    DAY = 86_400_000_000
    us = np.array([10, 20, 30, 2 * DAY + 5, 2 * DAY + 6, 2 * DAY + 7], np.int64)
    events = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": pd.to_datetime(us, unit="us"),
            "user_id": np.array([1, 1, 1, 1, 2, 2], np.int64),
            "event_type": ["a"] * 6,
            "value": [1.0] * 6,
            "props": [""] * 6,
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    from scylla_cdc_source_connector_ray.oracles import COHORT_RETENTION

    got = _norm(R.cohort_retention(d).to_pandas())
    want = _norm(_oracle(d, COHORT_RETENTION))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    m = {(r.cohort_day, r.offset_days): r.n_users for r in got.itertuples()}
    # repeated same-day events never inflate a cell
    assert m[(0, 0)] == 1 and m[(0, 2)] == 1 and m[(2, 0)] == 1


def test_user_gap_stats_tie_and_cross_user_boundaries(tmp_path):
    d = str(tmp_path)
    us = np.array([100, 100, 300, 50, 60], np.int64)  # u1 has a ts TIE
    events = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": pd.to_datetime(us, unit="us"),
            "user_id": np.array([1, 1, 1, 2, 2], np.int64),
            "event_type": ["a", "a", "b", "a", "b"],
            "value": [1.0] * 5,
            "props": [""] * 5,
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    from scylla_cdc_source_connector_ray.oracles import USER_GAP_STATS

    got = _norm(R.user_gap_stats(d).to_pandas())
    want = _norm(_oracle(d, USER_GAP_STATS))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    m = got.set_index("event_type")
    # gaps: type a -> [0 (tie)], type b -> [200, 10]; no cross-user gap.
    # With n=2 the shared floor convention (n-1)*q//100 indexes element 0
    # for BOTH p50 and p95 — the sorted multiset is [10, 200].
    assert m.loc["a", "n"] == 1 and m.loc["a", "p50"] == 0
    assert m.loc["b", "n"] == 2 and m.loc["b", "p50"] == 10 and m.loc["b", "p95"] == 10


def test_doc_column_profile_nulls_and_dups(tmp_path):
    d = str(tmp_path)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["same", "same", None, "other"],
            "lang": ["en", None, None, "de"],
            "source": ["w"] * 4,
            "n_chars": np.ones(4, np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), os.path.join(d, "documents.parquet"))
    from scylla_cdc_source_connector_ray.oracles import DOC_COLUMN_PROFILE

    got = _norm(R.doc_column_profile(d))
    want = _norm(_oracle(d, DOC_COLUMN_PROFILE))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    m = got.set_index("col")
    assert m.loc["text", "n_distinct"] == 2 and m.loc["text", "n_null"] == 1
    assert m.loc["lang", "n_distinct"] == 2 and m.loc["lang", "n_null"] == 2
    assert m.loc["source", "n_distinct"] == 1 and m.loc["source", "len_sum"] == 4


def test_funnel_conversion_strict_tie_chaining(tmp_path):
    d = str(tmp_path)
    # u1: view@100, click@100 (TIE -> not chained), purchase@200 -> step 1 only
    # u2: view@100, click@150, purchase@150 (tie at step3 -> blocked) -> steps 1,2
    # u3: click@50 (before view: ignored), view@100, click@200, purchase@300 -> 1,2,3
    # u4: purchase only -> nothing
    us = np.array([100, 100, 200, 100, 150, 150, 50, 100, 200, 300, 10], np.int64)
    uid = np.array([1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 4], np.int64)
    et = ["view", "click", "purchase", "view", "click", "purchase",
          "click", "view", "click", "purchase", "purchase"]
    events = pd.DataFrame(
        {
            "event_id": np.arange(len(us), dtype=np.int64),
            "ts": pd.to_datetime(us, unit="us"),
            "user_id": uid,
            "event_type": et,
            "value": [1.0] * len(us),
            "props": [""] * len(us),
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    from scylla_cdc_source_connector_ray.oracles import FUNNEL_CONVERSION

    got = _norm(R.funnel_conversion(d))
    want = _norm(_oracle(d, FUNNEL_CONVERSION))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    m = got.set_index("step")["n_users"]
    assert m[1] == 3 and m[2] == 2 and m[3] == 1


def test_q5_local_supplier_and_window_filters(tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({"r_regionkey": pa.array([0, 1], pa.int64()),
                             "r_name": ["ASIA", "EUROPE"]}), os.path.join(d, "region.parquet"))
    pq.write_table(pa.table({"n_nationkey": pa.array([0, 1, 2], pa.int64()),
                             "n_name": ["JAPAN", "CHINA", "FRANCE"],
                             "n_regionkey": pa.array([0, 0, 1], pa.int64())}),
                   os.path.join(d, "nation.parquet"))
    pq.write_table(pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64()),
                             "c_nationkey": pa.array([0, 2, 1], pa.int64())}),
                   os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({"s_suppkey": pa.array([1, 2], pa.int64()),
                             "s_nationkey": pa.array([0, 1], pa.int64())}),
                   os.path.join(d, "supplier.parquet"))
    pq.write_table(pa.table({"o_orderkey": pa.array([1, 2, 3], pa.int64()),
                             "o_custkey": pa.array([1, 1, 3], pa.int64()),
                             "o_orderdate": pa.array(
                                 pd.to_datetime(["1996-06-01", "1995-06-01", "1996-07-01"]),
                                 pa.timestamp("us"))}),
                   os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({"l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
                             "l_suppkey": pa.array([1, 2, 1, 2], pa.int64()),
                             "l_extendedprice": [100.0, 50.0, 70.0, 30.0],
                             "l_discount": [0.1, 0.0, 0.0, 0.5]}),
                   os.path.join(d, "lineitem.parquet"))
    got = _norm(R.q5_local_supplier_volume(d).to_pandas())
    # JAPAN: order 1 line via s1 (local): 100*0.9*10000 = 900000; the s2 line
    # is non-local (cust n0 vs supp n1). Order 2 is out of window.
    # CHINA: order 3 via s2 (local): 30*0.5*10000 = 150000.
    want = _norm(pd.DataFrame({"n_name": ["JAPAN", "CHINA"],
                               "revenue_dm": np.array([900000, 150000], np.int64)}))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _write_empty_tables(d):
    pq.write_table(pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "props": pa.array([], pa.string()),
    }), os.path.join(d, "events.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    }), os.path.join(d, "documents.parquet"))


def test_doc_column_profile_empty_table_matches_oracle(tmp_path):
    d = str(tmp_path)
    _write_empty_tables(d)
    from scylla_cdc_source_connector_ray.oracles import DOC_COLUMN_PROFILE

    got = _norm(R.doc_column_profile(d))
    want = _norm(_oracle(d, DOC_COLUMN_PROFILE))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 3 and (got["n_rows"] == 0).all()


def test_funnel_conversion_no_step_events_emits_zero_ladder(tmp_path):
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(2, dtype=np.int64),
            "ts": pd.to_datetime([1, 2], unit="us"),
            "user_id": np.array([1, 2], np.int64),
            "event_type": ["error", "signup"],  # no funnel step at all
            "value": [1.0] * 2,
            "props": [""] * 2,
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    from scylla_cdc_source_connector_ray.oracles import FUNNEL_CONVERSION

    got = _norm(R.funnel_conversion(d))
    want = _norm(_oracle(d, FUNNEL_CONVERSION))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 3 and (got["n_users"] == 0).all()


def test_cohort_retention_pre_epoch_days_floor(tmp_path):
    # a pre-1970 timestamp must land on the FLOORED calendar day on both
    # sides (bare SQL // would truncate toward zero and disagree)
    d = str(tmp_path)
    DAY = 86_400_000_000
    us = np.array([-5, 2 * DAY + 5], np.int64)
    events = pd.DataFrame(
        {
            "event_id": np.arange(2, dtype=np.int64),
            "ts": pd.to_datetime(us, unit="us"),
            "user_id": np.array([1, 1], np.int64),
            "event_type": ["a"] * 2,
            "value": [1.0] * 2,
            "props": [""] * 2,
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    from scylla_cdc_source_connector_ray.oracles import COHORT_RETENTION

    got = _norm(R.cohort_retention(d).to_pandas())
    want = _norm(_oracle(d, COHORT_RETENTION))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(map(tuple, got[["cohort_day", "offset_days"]].to_numpy())) == {(-1, 0), (-1, 3)}


def test_event_moments_half_away_rounding_parity(tmp_path):
    # 0.125 * 100 == 12.5 exactly in binary: DuckDB round() -> 13 (half away
    # from zero), np.round would give 12 (half to even) and split the twins
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": pd.to_datetime(["2026-01-01"] * 3),
            "user_id": np.array([1, 2, 3], np.int64),
            "event_type": ["a"] * 3,
            "value": [0.125, -0.125, 2.0],
            "props": [""] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    from scylla_cdc_source_connector_ray.oracles import EVENT_TYPE_CORR, EVENT_TYPE_REGRESSION

    pd.testing.assert_frame_equal(
        _norm(R.event_type_corr(d)), _norm(_oracle(d, EVENT_TYPE_CORR)), check_dtype=False
    )
    pd.testing.assert_frame_equal(
        _norm(R.event_type_regression(d)),
        _norm(_oracle(d, EVENT_TYPE_REGRESSION)),
        check_dtype=False,
    )


def test_percentiles_cont_bit_exact_interpolation(tmp_path):
    # values chosen so interpolation produces non-representable doubles
    # (e.g. DuckDB's 85.59999999999997 pattern); compare EXACT, no rounding
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(7, dtype=np.int64),
            "ts": pd.to_datetime(["2026-01-01"] * 7),
            "user_id": np.zeros(7, np.int64),
            "event_type": ["a", "a", "a", "a", "b", "b", "c"],
            "value": [0.01, 0.02, 0.04, 1.00, -0.33, 0.07, 0.125],
            "props": [""] * 7,
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    from scylla_cdc_source_connector_ray.oracles import EVENT_VALUE_PERCENTILES_CONT

    got = R.event_value_percentiles_cont(d).to_pandas()
    want = _oracle(d, EVENT_VALUE_PERCENTILES_CONT)
    got = got.sort_values("event_type").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("event_type").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_exact=True, check_dtype=False)
    # group 'a' p95: pos=2.85 over [1,2,4,100] -> the fp-error pattern
    assert got.set_index("event_type").loc["a", "p95"] == 85.59999999999997


def test_moving_sum_and_moments_skip_null_rows(tmp_path):
    # NULL value / user_id rows are excluded on BOTH sides; previously a
    # NULL value wrapped to INT64_MIN inside the prefix sums (moving sum)
    # or crashed the int cast (moments)
    d = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": pd.to_datetime([10, 20, 30, 40, 50, 60], unit="us"),
            "user_id": pd.array([1, 1, None, 1, 2, 2], dtype="Int64"),
            "event_type": ["a"] * 6,
            "value": [1.0, None, 3.0, 4.0, 5.0, 6.0],
            "props": [""] * 6,
        }
    )
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    from scylla_cdc_source_connector_ray.oracles import (
        EVENT_MOVING_SUM,
        EVENT_TYPE_CORR,
        EVENT_TYPE_REGRESSION,
    )

    got = _norm(R.event_moving_sum(d).to_pandas())
    want = _norm(_oracle(d, EVENT_MOVING_SUM))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 4  # NULL-value and NULL-user rows gone
    assert (got["moving_sum_c"] > 0).all()  # no INT64_MIN poisoning
    pd.testing.assert_frame_equal(
        _norm(R.event_type_corr(d)), _norm(_oracle(d, EVENT_TYPE_CORR)), check_dtype=False
    )
    pd.testing.assert_frame_equal(
        _norm(R.event_type_regression(d)),
        _norm(_oracle(d, EVENT_TYPE_REGRESSION)),
        check_dtype=False,
    )


def test_moving_sum_shift_kernel_equals_per_run_fallback():
    # the run-shifted vectorized kernel and the per-run fallback are the
    # same math; verify on adversarial data (ties, window-straddling gaps,
    # many interleaved users) without Ray
    import numpy as np

    rng = np.random.default_rng(7)
    n, W = 500, 100
    uid = np.sort(rng.integers(0, 23, n))
    ts = rng.integers(0, 1000, n)
    order = np.lexsort((np.arange(n), ts, uid))
    uid, ts = uid[order], ts[order]
    v = rng.integers(-50, 50, n)

    def window_sums(ts_, v_):
        cum = np.zeros(len(v_) + 1, dtype=np.int64)
        np.cumsum(v_, out=cum[1:])
        hi = np.searchsorted(ts_, ts_, side="right")
        lo = np.searchsorted(ts_, ts_ - W, side="left")
        return cum[hi] - cum[lo]

    boundary = np.ones(n, bool)
    boundary[1:] = uid[1:] != uid[:-1]
    run_id = np.cumsum(boundary) - 1
    K = (ts.max() - ts.min()) + W + 1
    shifted = (ts - ts.min()) + run_id * K
    fast = window_sums(shifted, v)
    slow = np.empty(n, np.int64)
    starts = np.flatnonzero(boundary).tolist() + [n]
    for a, b in zip(starts[:-1], starts[1:]):
        slow[a:b] = window_sums(ts[a:b], v[a:b])
    assert (fast == slow).all()


def test_redact_honours_text_col_name(tmp_path):
    from scylla_cdc_source_connector_ray.functions.textops import redact

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "body": ["spark here"]})
    out = redact(t, pattern=r"\bspark\b", text_col="body")
    assert out.column_names == ["doc_id", "body", "n_hits"]
    assert out["body"][0].as_py() == "[MASK] here"


def test_event_transitions_null_types_ties_and_single_event_users(tmp_path):
    from scylla_cdc_source_connector_ray.oracles import EVENT_TRANSITIONS

    d = str(tmp_path)
    rng = np.random.default_rng(17)
    n = 400
    events = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            # coarse ts -> many within-user ties; (ts, event_id) breaks them
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 40, n), unit="m"),
            "user_id": pd.array(
                [None if i % 37 == 0 else int(rng.integers(0, 25)) for i in range(n)],
                dtype="Int64",
            ),
            "event_type": pd.array(
                [None if i % 11 == 0 else f"t{rng.integers(0, 4)}" for i in range(n)],
                dtype=object,
            ),
            "value": rng.normal(size=n),
            "props": [""] * n,
        }
    )
    # a user with exactly one event: no pair emitted
    events.loc[n - 1, "user_id"] = 999
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False), os.path.join(d, "events.parquet"))
    got = _norm(R.event_transitions(d))
    want = _norm(_oracle(d, EVENT_TRANSITIONS))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["next_type"].isna().any(), "NULL next_type group unexercised"


def test_q4_order_priority_semi_join(tmp_path):
    from scylla_cdc_source_connector_ray.oracles import Q4_ORDER_PRIORITY

    d = str(tmp_path)
    rng = np.random.default_rng(5)
    n_o = 300
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_o, dtype=np.int64),
            "o_custkey": np.zeros(n_o, np.int64),
            "o_orderstatus": ["O"] * n_o,
            "o_totalprice": np.ones(n_o),
            # half in-window, half out
            "o_orderdate": pd.to_datetime("1996-01-01")
            + pd.to_timedelta(rng.integers(0, 180, n_o), unit="D"),
            "o_orderpriority": [f"{rng.integers(1, 4)}-P" for _ in range(n_o)],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_o, 900).astype(np.int64),
            "l_returnflag": rng.choice(["A", "N", "R"], 900),
        }
    )
    for c in (
        "l_partkey l_suppkey l_linenumber l_quantity l_extendedprice "
        "l_discount l_tax l_linestatus l_shipdate"
    ).split():
        li[c] = 0
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False), os.path.join(d, "lineitem.parquet"))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(d, t + '.parquet')}'")
    got = _norm(R.q4_order_priority(d).to_pandas())
    want = _norm(con.sql(Q4_ORDER_PRIORITY).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --- round-5 continuation: full-outer join, winsorized mean, model filter ---


def _write_events(d, events: pd.DataFrame):
    pq.write_table(
        pa.Table.from_pandas(events, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )


def test_purchase_error_full_outer_orphans(tmp_path):
    """Both outer directions: purchase-only (user 1), error-only (user 2),
    matched (user 3), and a same-user different-day orphan pair (user 4)."""
    from scylla_cdc_source_connector_ray.oracles import PURCHASE_ERROR_DAILY_JOIN

    d = str(tmp_path)
    base = pd.Timestamp("2026-01-01")
    ev = pd.DataFrame(
        {
            "event_id": np.arange(7, dtype=np.int64),
            "ts": [base, base, base, base, base,
                   base + pd.Timedelta(days=3), base + pd.Timedelta(days=4)],
            "user_id": np.array([1, 2, 3, 3, 3, 4, 4], np.int64),
            "event_type": ["purchase", "error", "purchase", "purchase",
                           "error", "purchase", "error"],
            # 0.125*100 = 12.5: the half-away rounding tie
            "value": [0.125, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
            "props": [""] * 7,
        }
    )
    _write_events(d, ev)
    got = _norm(R.purchase_error_daily_join(d, num_partitions=2).to_pandas())
    want = _norm(_oracle(d, PURCHASE_ERROR_DAILY_JOIN))
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    by_user = got.set_index(["user_id", "day"])
    day0 = (base - pd.Timestamp(0)).days
    assert by_user.loc[(1, day0), "n_error"] == 0  # left orphan
    assert by_user.loc[(2, day0), "n_purchase"] == 0  # right orphan
    assert by_user.loc[(1, day0), "purchase_cents"] == 13  # 12.5 away from 0
    assert by_user.loc[(3, day0), "n_purchase"] == 2
    assert len(by_user.loc[4]) == 2  # same user, disjoint days -> two rows


def test_event_value_winsorized_clamps_outliers(tmp_path):
    from scylla_cdc_source_connector_ray.oracles import EVENT_VALUE_WINSORIZED

    d = str(tmp_path)
    rng = np.random.default_rng(7)
    n = 400
    vals = np.round(rng.uniform(1, 10, n), 2)
    vals[:4] = [1e5, -1e5, 9e4, 8e4]  # outliers the clamp must absorb
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(n), "s"),
            "user_id": (np.arange(n) % 5).astype(np.int64),
            "event_type": np.where(np.arange(n) % 2 == 0, "a", "b"),
            "value": vals,
            "props": [""] * n,
        }
    )
    ev.loc[10, "value"] = None  # NULL dropped like the SQL aggregate
    _write_events(d, ev)
    got = _norm(R.event_value_winsorized(d).to_pandas())
    want = _norm(_oracle(d, EVENT_VALUE_WINSORIZED))
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # the winsorized mean must sit inside the clamp interval
    assert (got["winsor_mean_vm"] >= got["lo_vm"]).all()
    assert (got["winsor_mean_vm"] <= got["hi_vm"]).all()


def test_model_quality_filter_matches_generated_twin(tmp_path):
    """Engine score (broadcast int64 weights, one matmul per batch) vs the
    SQL twin GENERATED from the same weight constants; the crafted corpus
    straddles the threshold so the filter actually splits."""
    from scylla_cdc_source_connector_ray.functions.inference import (
        DEFAULT_THRESHOLD,
        model_quality_filter,
    )
    from scylla_cdc_source_connector_ray.oracles import MODEL_QUALITY_FILTER

    d = str(tmp_path)
    rich = "the cat and the dog, of course, went to the house in the garden! " * 12
    poor = "zzz " * 5
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [rich, poor, rich + poor, poor, rich, None],
            "lang": ["en"] * 6,
            "source": ["web", "web", "web", "wiki", "wiki", "wiki"],
            "n_chars": np.ones(6, np.int64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        os.path.join(d, "documents.parquet"),
    )
    ds = ray.data.read_parquet(os.path.join(d, "documents.parquet"), columns=["source", "text"])
    got = _norm(model_quality_filter(ds, threshold=DEFAULT_THRESHOLD))
    want = _norm(_oracle(d, MODEL_QUALITY_FILTER))
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    web = got.set_index("source").loc["web"]
    assert 0 < web["n_kept"] < web["n_total"]  # the threshold splits


def test_score_documents_appends_exact_score(tmp_path):
    """The non-aggregated inference API: score column equals the explicit
    weight formula over the text_stats counts."""
    from scylla_cdc_source_connector_ray.functions.inference import (
        CHAR_CAP,
        DEFAULT_WEIGHTS,
        score_documents,
    )
    from scylla_cdc_source_connector_ray.functions.textops import text_stats

    d = str(tmp_path)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["the cat and the dog!", "zz", None, "a " * 600],
            "lang": ["en"] * 4,
            "source": ["w"] * 4,
            "n_chars": np.ones(4, np.int64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        os.path.join(d, "documents.parquet"),
    )
    ds = ray.data.read_parquet(os.path.join(d, "documents.parquet"))
    got = score_documents(ds).to_pandas().sort_values("doc_id")
    stats = text_stats(pa.Table.from_pandas(docs, preserve_index=False)).to_pandas()
    want = (
        DEFAULT_WEIGHTS["stat_words"] * stats["stat_words"]
        + DEFAULT_WEIGHTS["stat_punct"] * stats["stat_punct"]
        + DEFAULT_WEIGHTS["stat_stop"] * stats["stat_stop"]
        + DEFAULT_WEIGHTS["stat_chars"] * np.minimum(stats["stat_chars"], CHAR_CAP)
    )
    assert got["score"].tolist() == want.tolist()
    assert got["score"].dtype == np.int64


def test_sessionize_brute_force(tmp_path):
    # synthetic events with known session structure + ties + NULLs
    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",  # u1 s1
            "2024-01-01 00:30:00",  # u1 s1 (gap 30m <= 1h)
            "2024-01-01 02:00:00",  # u1 s2 (gap 1.5h)
            "2024-01-01 02:00:00",  # u1 s2 tie -> event_id order
            "2024-01-01 00:00:00",  # u2 s1
            "2024-01-02 00:00:00",  # u2 s2
            None,  # dropped (NULL ts)
            "2024-01-01 00:00:00",  # dropped (NULL user)
        ]
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(8, dtype=np.int64),
            "user_id": pd.array([1, 1, 1, 1, 2, 2, 1, None], dtype="Int64"),
            "ts": ts,
            "event_type": ["x"] * 8,
            "value": [0.0] * 8,
            "props": ["{}"] * 8,
        }
    )
    d = os.path.join(str(tmp_path), "events.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d)
    got = (
        R.sessionize(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got["event_id"]) == [0, 1, 2, 3, 4, 5]
    assert list(got["session_id"]) == [1, 1, 2, 2, 1, 2]
    assert list(got["is_session_start"]) == [1, 0, 1, 0, 1, 1]
