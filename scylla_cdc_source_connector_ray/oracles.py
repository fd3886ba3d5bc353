"""DuckDB oracle SQL for every SQL-expressible pipeline in ``queries()``.

Each string runs against the driver's pre-registered testdata views. The CDC
oracles re-derive the transcript log from ``events`` via
:data:`..sources.events_adapter.TRANSCRIPTS_SQL` (the exact mapping the Ray
side computes) and express the CDC state machine with window functions —
independently re-implementing the spec in ``stages/op_derive.py``.
"""

from __future__ import annotations

from .sources.events_adapter import TRANSCRIPTS_SQL

#: shared prelude: transcripts CTE + the per-key CDC fold
CDC_EVENTS_CTE = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL}),
cdc_events AS (
    SELECT
        conv_id,
        turn_idx,
        CASE WHEN text IS NULL THEN 'd'
             WHEN row_number() OVER w = 1 THEN 'c'
             ELSE 'u' END                                          AS op,
        CASE WHEN text IS NULL THEN NULL ELSE role END             AS after_role,
        text                                                       AS after_text,
        CASE WHEN text IS NULL THEN NULL ELSE tool END             AS after_tool,
        CASE WHEN text IS NULL THEN NULL ELSE ts END               AS after_ts,
        lag(CASE WHEN text IS NULL THEN NULL ELSE role END) OVER w AS before_role,
        lag(text) OVER w                                           AS before_text,
        lag(CASE WHEN text IS NULL THEN NULL ELSE tool END) OVER w AS before_tool,
        lag(CASE WHEN text IS NULL THEN NULL ELSE ts END) OVER w   AS before_ts,
        ts,
        seq
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY ts, seq)
)
"""

CDC_CAPTURE_FLAT = (
    CDC_EVENTS_CTE
    + """
SELECT conv_id, turn_idx, op,
       before_role, before_text, before_tool, before_ts,
       after_role, after_text, after_tool, after_ts,
       seq
FROM cdc_events
"""
)

CDC_OP_COUNTS = (
    CDC_EVENTS_CTE
    + """
SELECT op, count(*) AS n
FROM cdc_events
GROUP BY op
"""
)

HOUR_US = 3_600_000_000
MIN15_US = 900_000_000
GAP30M_US = 1_800_000_000

WIN_TUMBLING_ROLE = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL})
SELECT role, epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS window_start_us,
       count(*) AS n_events,
       sum(coalesce(length(text), 0)) AS n_chars,
       min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
FROM transcripts GROUP BY 1, 2
"""

WIN_SLIDING = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL})
SELECT epoch_us(ts) - epoch_us(ts) % {MIN15_US} - {MIN15_US} * i AS window_start_us,
       count(*) AS n_events,
       sum(coalesce(length(text), 0)) AS n_chars,
       min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
FROM transcripts CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) s
GROUP BY 1
"""

WIN_SESSION = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL}),
marks AS (
    SELECT conv_id, epoch_us(ts) AS ts_us,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP30M_US}
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

JOIN_CONV_STATE = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL})
SELECT conv_id, turn_idx, seq,
       count(*) OVER w_prior AS prior_turns,
       coalesce(sum(length(coalesce(text, ''))) OVER w_prior, 0) AS prior_chars,
       lag(role) OVER w AS prev_role,
       lag(epoch_us(ts)) OVER w AS prev_ts_us
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY ts, seq),
       w_prior AS (PARTITION BY conv_id ORDER BY ts, seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""

JOIN_ENRICH_CUSTOMER = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL})
SELECT t.conv_id, t.turn_idx, t.seq, c.c_name, c.c_mktsegment
FROM transcripts t
LEFT JOIN customer c ON c.c_custkey = CAST(substr(t.conv_id, 5) AS BIGINT)
"""

CDC_MODIFIED_COLS = (
    CDC_EVENTS_CTE
    + """
SELECT conv_id, turn_idx, seq,
       ltrim(
           concat(
               CASE WHEN (after_role IS DISTINCT FROM before_role) THEN ',role' ELSE '' END,
               CASE WHEN (after_text IS DISTINCT FROM before_text) THEN ',text' ELSE '' END,
               CASE WHEN (after_tool IS DISTINCT FROM before_tool) THEN ',tool' ELSE '' END
           ), ',') AS modified_cols
FROM cdc_events
"""
)
