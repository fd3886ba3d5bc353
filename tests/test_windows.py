"""Tumbling / sliding / session window aggregation (fixture T7), cross-checked
against an independent DuckDB SQL implementation on the same data."""

import duckdb
import pandas as pd

import ray.data

from scylla_cdc_source_connector_ray.sources.synthetic import generate
from scylla_cdc_source_connector_ray.stages import windows as W

HOUR = 3_600_000_000
MIN15 = 900_000_000


def _data():
    # conv_stagger spreads convs; big step creates >30s gaps inside convs
    return generate(
        num_convs=8, turns_per_conv=40, update_pct=20, delete_pct=10, step_us=40_000_000
    )


def _con(t):
    con = duckdb.connect()
    con.register("transcripts", t)
    return con


def _cmp(ray_df: pd.DataFrame, sql_df: pd.DataFrame, keys):
    a = ray_df.sort_values(keys).reset_index(drop=True)
    b = sql_df.sort_values(keys).reset_index(drop=True)
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_tumbling_by_role():
    t = _data()
    ds = ray.data.from_arrow(t).repartition(5)
    out = W.tumbling(ds, HOUR, keys=["role"]).to_pandas()
    con = _con(t)
    sql = con.sql(
        f"""
        SELECT role, epoch_us(ts) - epoch_us(ts) % {HOUR} AS window_start_us,
               count(*) AS n_events,
               sum(coalesce(length(text), 0)) AS n_chars,
               min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
        FROM transcripts GROUP BY 1, 2
        """
    ).df()
    _cmp(out, sql, ["role", "window_start_us"])


def test_sliding_global():
    t = _data()
    ds = ray.data.from_arrow(t).repartition(4)
    out = W.sliding(ds, HOUR, MIN15).to_pandas()
    con = _con(t)
    sql = con.sql(
        f"""
        SELECT epoch_us(ts) - epoch_us(ts) % {MIN15} - {MIN15} * i AS window_start_us,
               count(*) AS n_events,
               sum(coalesce(length(text), 0)) AS n_chars,
               min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
        FROM transcripts CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) s
        GROUP BY 1
        """
    ).df()
    _cmp(out, sql, ["window_start_us"])


def test_sliding_covers_each_row_n_times():
    t = _data()
    ds = ray.data.from_arrow(t)
    out = W.sliding(ds, HOUR, MIN15).to_pandas()
    assert out["n_events"].sum() == 4 * t.num_rows


def test_session_windows():
    t = _data()
    ds = ray.data.from_arrow(t).repartition(3)
    out = W.session(ds, gap_us=30_000_000, num_shards=4).to_pandas()
    con = _con(t)
    sql = con.sql(
        """
        WITH marks AS (
            SELECT conv_id, epoch_us(ts) AS ts_us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30000000
                        THEN 1 ELSE 0 END AS is_start
            FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY ts)
        ),
        sess AS (
            SELECT conv_id, ts_us,
                   sum(is_start) OVER (PARTITION BY conv_id ORDER BY ts_us
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM marks
        )
        SELECT conv_id, min(ts_us) AS session_start_us,
               max(ts_us) AS session_end_us, count(*) AS n_turns
        FROM sess GROUP BY conv_id, sid
        """
    ).df()
    _cmp(out, sql, ["conv_id", "session_start_us"])
    # sanity: gaps inside a conv really split sessions
    assert len(out) > out["conv_id"].nunique()
