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
