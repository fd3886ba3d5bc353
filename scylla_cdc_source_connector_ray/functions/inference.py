"""Batched model inference over a Dataset — the broadcast-weights pattern.

A trained model (here: a linear quality classifier over the integer text
features of :mod:`.textops`) is shipped to the cluster ONCE via ``ray.put``;
each scoring actor pulls the weights in ``__init__`` and scores whole
batches vectorized in ``__call__``. This is the shape every model-scoring
stage of a training-data pipeline takes (fastText-style quality filters,
toxicity/perplexity scorers, learned dedup): the model never rides inside
the task closure (re-pickled per task) and never crosses a shuffle.

The default model is integer-exact on purpose — weights and features are
int64, so the distributed score is bit-identical to the SQL twin and the
per-source aggregates are exact under any partitioning. A real float model
drops in unchanged (the kernel is one dot product either way); only the
oracle's equality guarantee would soften to a tolerance.

Scale shape (100 TB): pure map emitting |sources|-row partial sums per
batch, merged driver-side — the corpus never shuffles and nothing crosses
an exchange; weights move once per actor, not per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .textops import text_stats

#: The "trained" linear quality model: score = w·features (int64). Feature
#: order matches :func:`feature_matrix`. chars is capped at ``CHAR_CAP`` —
#: length should saturate, not dominate (C4-style heuristic).
DEFAULT_WEIGHTS = {"stat_words": 3, "stat_punct": -2, "stat_stop": 5, "stat_chars": 1}
CHAR_CAP = 500
DEFAULT_THRESHOLD = 500  # ~median score on the synthetic corpus


def feature_matrix(t: pa.Table) -> np.ndarray:
    """(n, 4) int64 feature matrix in DEFAULT_WEIGHTS key order from a
    :func:`textops.text_stats`-augmented table."""
    cols = []
    for name in DEFAULT_WEIGHTS:
        v = t[name].to_numpy(zero_copy_only=False).astype(np.int64)
        if name == "stat_chars":
            v = np.minimum(v, CHAR_CAP)
        cols.append(v)
    return np.stack(cols, axis=1)


class LinearScorer:
    """Actor-pool scoring stage: weights fetched from the broadcast ref once
    per actor, one matmul per batch. Appends an int64 ``score`` column."""

    def __init__(self, weights_ref):
        w = ray.get(weights_ref)
        self.w = np.array([w[k] for k in DEFAULT_WEIGHTS], dtype=np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        t = text_stats(t)
        score = feature_matrix(t) @ self.w
        return t.append_column("score", pa.array(score, pa.int64()))


def score_documents(
    ds: ray.data.Dataset,
    weights: dict[str, int] | None = None,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Append the model ``score`` to every document (broadcast-weights
    inference; no shuffle)."""
    ref = ray.put(dict(weights or DEFAULT_WEIGHTS))
    return ds.map_batches(
        LinearScorer,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def model_quality_filter(
    ds: ray.data.Dataset,
    weights: dict[str, int] | None = None,
    threshold: int = DEFAULT_THRESHOLD,
) -> pd.DataFrame:
    """Per-source acceptance stats of the model filter ``score >= threshold``:
    ``(source, n_total, n_kept, kept_score_sum)``. The scoring stage emits
    per-batch partial sums; the |sources|-per-batch partials are merged
    driver-side (the event_transitions precedent — a Ray sort-aggregate over
    64 twenty-row blocks costs more than the whole scoring pass)."""
    ref = ray.put(dict(weights or DEFAULT_WEIGHTS))

    class ScoreAndFold(LinearScorer):
        def __init__(self):
            super().__init__(ref)

        def __call__(self, t: pa.Table) -> pd.DataFrame:  # type: ignore[override]
            t = super().__call__(t)
            df = pd.DataFrame(
                {
                    "source": t["source"].to_pandas().astype(object),
                    "score": t["score"].to_numpy(zero_copy_only=False),
                }
            )
            kept = df["score"] >= threshold
            g = df.groupby("source", dropna=False, sort=False)
            out = pd.DataFrame(
                {
                    "n_total": g.size(),
                    "n_kept": kept.groupby(df["source"], dropna=False, sort=False).sum(),
                    "kept_score_sum": df["score"]
                    .where(kept, 0)
                    .groupby(df["source"], dropna=False, sort=False)
                    .sum(),
                }
            ).reset_index()
            out["n_total"] = out["n_total"].astype("int64")
            out["n_kept"] = out["n_kept"].astype("int64")
            out["kept_score_sum"] = out["kept_score_sum"].astype("int64")
            return out

    partials = ds.map_batches(
        # regex counting dominates — let the pool scale wider than the
        # light enrichment stages' (1, 8) default
        ScoreAndFold,
        batch_format="pyarrow",
        concurrency=(1, 16),
    ).to_pandas()  # |sources| rows per batch — a true small result
    if not len(partials):
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "n_total": pd.Series([], dtype="int64"),
                "n_kept": pd.Series([], dtype="int64"),
                "kept_score_sum": pd.Series([], dtype="int64"),
            }
        )
    out = (
        partials.groupby("source", dropna=False)[
            ["n_total", "n_kept", "kept_score_sum"]
        ]
        .sum()
        .reset_index()
    )
    for c in ("n_total", "n_kept", "kept_score_sum"):
        out[c] = out[c].astype("int64")
    return out
