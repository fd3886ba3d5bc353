"""Similarity search over an embedding column (``list<float>``).

* :func:`ann_bruteforce` — exact top-k cosine: numpy matmul per batch against
  a broadcast query matrix (``ray.put`` once), partial top-k per batch, merge
  on the tiny (query × k × batches) result. The baseline every ANN variant is
  measured against.
* :class:`IVFIndex` / :func:`ann_ivf` — the scale path: coarse k-means
  centroids (deterministic seeded Lloyd on a sample), vectors bucketed by
  nearest centroid (one ``map_batches`` pass), queries probe only the
  ``nprobe`` nearest buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def ann_bruteforce(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
) -> pd.DataFrame:
    """Exact top-k cosine neighbours for each query row.

    Per batch: (B×d) @ (d×Q) matmul → per-batch top-k partials (B rows never
    leave the task; only Q×k partial rows do) → final merge on the driver
    over Q×k×num_batches rows (tiny).
    Returns (query_id, vec_id, cosine, rank) with rank 1..k, deterministic
    ties broken by vec_id.
    """
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), Q))

    class PartialTopK:
        def __init__(self):
            self.qids, self.Q = ray.get(qref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            M = _normalize(_stack(batch["embedding"].values))
            sims = self.Q @ M.T  # (Q, B)
            ids = batch["vec_id"].values.astype(np.int64)
            kk = min(k, sims.shape[1])
            # per query: DETERMINISTIC batch-local top-k — full tie-break by
            # (-cosine, vec_id) so equal-cosine candidates at the k boundary
            # never drop arbitrarily (duplicate docs have exactly-equal sims)
            rows = []
            for qi in range(sims.shape[0]):
                order = np.lexsort((ids, -sims[qi]))
                sel = order[:kk]
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": self.qids[qi],
                            "vec_id": ids[sel],
                            "cosine": sims[qi, sel],
                        }
                    )
                )
            return pd.concat(rows, ignore_index=True)

    partials = ds.map_batches(
        PartialTopK, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    ).to_pandas()
    # final exact top-k per query (tiny)
    partials = partials.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


class IVFIndex:
    """Coarse quantizer: deterministic seeded k-means on a driver-side sample
    (sample stays small; assignment is distributed)."""

    def __init__(self, n_centroids: int = 16, iters: int = 10, seed: int = 42):
        self.n_centroids = n_centroids
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        X = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.RandomState(self.seed)
        C = X[rng.choice(len(X), size=min(self.n_centroids, len(X)), replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(X @ C.T, axis=1)
            for c in range(len(C)):
                members = X[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
            C = _normalize(C)
        self.centroids = C
        return self

    def assign_batches(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        cref = ray.put(self.centroids)

        class Assign:
            def __init__(self):
                self.C = ray.get(cref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                M = _normalize(_stack(batch["embedding"].values))
                batch = batch.copy()
                batch["bucket"] = np.argmax(M @ self.C.T, axis=1).astype(np.int64)
                return batch

        return ds.map_batches(Assign, batch_format="pandas", concurrency=(1, 8))


def ann_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    index: IVFIndex | None = None,
) -> pd.DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest IVF buckets per
    query. Same output schema as :func:`ann_bruteforce`; recall measured in
    tests against the brute-force baseline. Pass a pre-fitted ``index`` to
    skip the sample/Lloyd step (e.g. fixed data-derived centroids — the
    SQL-gateable configuration)."""
    if index is None:
        sample = _stack(ds.limit(sample_size).to_pandas()["embedding"].values)
        index = IVFIndex(n_centroids=n_centroids).fit(sample)
    assigned = index.assign_batches(ds)

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    # stable argsort: equal-cosine probes break by centroid POSITION, the
    # same order np.argmax uses for assignment (and the SQL twin's cpos)
    probes = np.argsort(-(Q @ index.centroids.T), axis=1, kind="stable")[:, :nprobe]
    # queries grouped per bucket they probe
    bucket_to_queries: dict[int, list[int]] = {}
    for qi, bs in enumerate(probes):
        for b in bs:
            bucket_to_queries.setdefault(int(b), []).append(qi)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), Q, bucket_to_queries))

    class ProbeTopK:
        def __init__(self):
            self.qids, self.Q, self.b2q = ray.get(qref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = []
            for b, g in batch.groupby("bucket"):
                qis = self.b2q.get(int(b))
                if not qis:
                    continue
                M = _normalize(_stack(g["embedding"].values))
                sims = self.Q[qis] @ M.T
                ids = g["vec_id"].values.astype(np.int64)
                kk = min(k, sims.shape[1])
                for row, qi in enumerate(qis):
                    order = np.lexsort((ids, -sims[row]))
                    sel = order[:kk]
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": self.qids[qi],
                                "vec_id": ids[sel],
                                "cosine": sims[row, sel],
                            }
                        )
                    )
            if not out:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series(dtype="int64"),
                        "vec_id": pd.Series(dtype="int64"),
                        "cosine": pd.Series(dtype="float64"),
                    }
                )
            return pd.concat(out, ignore_index=True)

    partials = assigned.map_batches(
        ProbeTopK, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    ).to_pandas()
    partials = partials.drop_duplicates(["query_id", "vec_id"]).sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def grouped_centroid_sums(
    ds: ray.data.Dataset,
    index: IVFIndex,
    scale: int = 1_000_000,
    normalized: bool = False,
) -> ray.data.Dataset:
    """Grouped VECTOR aggregation: per-bucket dimension-wise sums + counts of
    the raw embeddings — the k-means update step (new centroid = sum/n) and
    the per-cluster "prototype vector" primitive, run as a distributed
    partial aggregate.

    Exactness: each value is floored to an integer grid (``floor(v * scale)``
    in float64) BEFORE summing, so distributed sum order cannot change the
    result and the DuckDB twin matches hash-exactly (floor, not round —
    round-half semantics differ between numpy and SQL).

    Scale shape: vectors never cross the exchange — each batch emits at most
    ``buckets_present × dims`` partial rows (a matmul-free ``np.add.at``
    fold), and the final groupby reduces ``batches × k × d`` tiny rows.
    """

    assigned = index.assign_batches(ds)
    n_buckets = len(index.centroids)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # raw values by default (the SQL-gated mode); ``normalized=True``
        # sums unit vectors instead — the spherical k-means update step
        # (:func:`kmeans_fit`), same integer-grid order-free exactness
        M = _stack(b["embedding"].values)
        if normalized:
            M = _normalize(M)
        Q = np.floor(M * float(scale)).astype(np.int64)
        buckets = b["bucket"].to_numpy(dtype=np.int64)
        d = Q.shape[1]
        sums = np.zeros((n_buckets, d), dtype=np.int64)
        np.add.at(sums, buckets, Q)
        counts = np.bincount(buckets, minlength=n_buckets).astype(np.int64)
        present = np.flatnonzero(counts)
        return pd.DataFrame(
            {
                "bucket": np.repeat(present, d),
                "dim": np.tile(np.arange(d, dtype=np.int64), len(present)),
                "sum_q": sums[present].reshape(-1),
                "n": np.repeat(counts[present], d),
            }
        )

    import pyarrow as pa

    def sum_partials(t: pa.Table) -> pa.Table:
        """In-memory (bucket, dim) re-sum — integer addition is order-free,
        so a shuffle-free merge tree is exact."""
        if t.num_rows == 0:
            return t
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        dm = t["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
        sq = t["sum_q"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-block dense re-key: (bucket, dim) -> bucket*d + dm is injective
        # for ANY d > max(dm) and decoded with the SAME per-block d, so this
        # is correct even when repartition splits a partial's rows across
        # blocks (do NOT hoist d to a global constant derived elsewhere)
        d = int(dm.max()) + 1
        uk, inv = np.unique(b * d + dm, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, sq)
        cnt = np.zeros(len(uk), np.int64)
        np.add.at(cnt, inv, nn)
        return pa.table(
            {"bucket": uk // d, "dim": uk % d, "sum_q": s, "n": cnt}
        )

    # two-level shuffle-FREE merge tree instead of a groupby aggregate: the
    # partials are k×d rows per batch, but Ray's sort-based aggregate costs
    # ~1s per output block on tiny groups (measured 63s for 512 groups);
    # coalesce + re-sum is exact for integer sums and O(partial rows).
    partials = assigned.map_batches(partial, batch_format="pandas")
    level1 = partials.repartition(8, shuffle=False).map_batches(
        sum_partials, batch_format="pyarrow", batch_size=None
    )
    return level1.repartition(1, shuffle=False).map_batches(
        sum_partials, batch_format="pyarrow", batch_size=None
    )


def gram_matrix(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    dims: int | None = None,
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Distributed Gram matrix of the embedding column — Σ xᵀx over all
    rows, the single-pass sufficient statistic for covariance / PCA
    (cov = G/n − mean·meanᵀ) and the building block of linear probes over
    embedding corpora. Output: one row per upper-triangle entry
    (``i``, ``j``, ``s`` = Σ floor(x_i·x_j·scale), ``n`` = row count).

    Exactness: each per-row product is computed in float64 (float32 →
    float64 is exact) and floored to the integer grid BEFORE summing, so
    distributed order cannot change the result and the DuckDB twin matches
    hash-exactly (same convention as :func:`grouped_centroid_sums`).

    Scale shape: vectors never cross an exchange — each block folds to one
    d×d int64 partial (d(d+1)/2 rows), merged by the same shuffle-free
    coalesce tree as ``grouped_centroid_sums`` (a Ray sort-aggregate over
    d² tiny groups costs ~1s per output block; the tree is O(partial
    rows)). ``dims`` restricts to a leading slice of the vector (the gate
    uses 8 of 64 — a 36-term SQL twin; the full matrix has no practical
    SQL form)."""
    import pyarrow as pa

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:  # np.stack raises on an empty block
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("i", "j", "s", "n")}
            )
        M = _stack(b[emb_col].values).astype(np.float64)
        if dims is not None:
            M = M[:, :dims]
        n, d = M.shape
        S = np.zeros((d, d), dtype=np.int64)
        # sub-chunk the (rows × d × d) product tensor to cap memory at
        # ~32 MB regardless of the incoming block size
        step = max(1, (4 << 20) // (d * d))
        for lo in range(0, n, step):
            P = M[lo : lo + step, :, None] * M[lo : lo + step, None, :]
            S += np.floor(P * float(scale)).astype(np.int64).sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pd.DataFrame(
            {
                "i": iu.astype(np.int64),
                "j": ju.astype(np.int64),
                "s": S[iu, ju],
                "n": np.full(len(iu), n, dtype=np.int64),
            }
        )

    def sum_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        i = t["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = t["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        sv = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = int(j.max()) + 1  # per-block re-key, same caveat as centroids
        uk, inv = np.unique(i * d + j, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, sv)
        cnt = np.zeros(len(uk), np.int64)
        np.add.at(cnt, inv, nv)
        return pa.table({"i": uk // d, "j": uk % d, "s": s, "n": cnt})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=1024)
    level1 = partials.repartition(8, shuffle=False).map_batches(
        sum_partials, batch_format="pyarrow", batch_size=None
    )
    return level1.repartition(1, shuffle=False).map_batches(
        sum_partials, batch_format="pyarrow", batch_size=None
    )


def embedding_quantize(ds: ray.data.Dataset, levels: int = 127) -> ray.data.Dataset:
    """Per-vector max-abs scalar quantization — the int8 compression pass a
    100 TB vector corpus runs before ANN indexing (4x smaller than float32,
    dot products in integer SIMD). ``q_i = round(levels * x_i / maxabs)``
    (half-away, the SQL round), all-zero vectors quantize to all zeros.

    Emits per-vector summary columns instead of the (huge) code list so the
    result is exactly SQL-twin-comparable: ``n_dims``, ``maxabs`` (the
    scale), ``q_sum`` / ``q_norm`` (sum and sum-of-squares of the int codes
    — integer-exact under any partitioning). The codes themselves are a
    `.cast(int8)` away in a real pipeline; the summaries pin the math.

    Zero shuffles: a vector lives in one row, one vectorized pass per batch
    (arrow list flatten + ``np.maximum.reduceat`` segment max — no per-row
    Python)."""

    def quantize(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        if emb.null_count:
            raise ValueError(
                "embedding_quantize: NULL embedding rows are not supported "
                "(filter or fill upstream)"
            )
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]  # sliced list arrays start at a nonzero offset
        n = len(emb)
        lens = offs[1:] - offs[:-1]
        # per-vector max |x|: float32 reduce exactly as the SQL max(abs(x))
        absf = np.abs(flat.astype(np.float32, copy=False))
        maxabs = np.zeros(n, dtype=np.float32)
        nonempty = lens > 0
        if nonempty.any():
            seg = np.maximum.reduceat(absf, offs[:-1][nonempty])
            maxabs[nonempty] = seg
        scale = maxabs.astype(np.float64)
        denom = np.repeat(np.where(scale == 0.0, 1.0, scale), lens)
        import pyarrow.compute as pc

        ratio = float(levels) * (flat.astype(np.float64) / denom)
        # the repo-wide SQL-parity rounding (ties half-away, like round())
        rounded = pc.round(
            pa.array(ratio, pa.float64()), round_mode="half_towards_infinity"
        ).to_numpy(zero_copy_only=False)
        q = np.where(np.repeat(scale == 0.0, lens), 0.0, rounded).astype(np.int64)
        grp = np.repeat(np.arange(n, dtype=np.int64), lens)
        q_sum = np.bincount(grp, weights=q, minlength=n).astype(np.int64)
        q_norm = np.bincount(grp, weights=q * q, minlength=n).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "n_dims": pa.array(lens, pa.int64()),
                "maxabs": pa.array(scale, pa.float64()),
                "q_sum": pa.array(q_sum, pa.int64()),
                "q_norm": pa.array(q_norm, pa.int64()),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow")


def kmeans_fit(
    ds: ray.data.Dataset, k: int = 8, iters: int = 5, scale: int = 1_000_000
) -> IVFIndex:
    """Distributed FULL-CORPUS Lloyd's k-means (spherical/cosine, the IVF
    convention) — the iterative-algorithm pattern the Dataset API cannot
    express in one lineage: the driver holds only the k×d centroid matrix;
    each iteration broadcasts it (``ray.put`` inside ``assign_batches``),
    assigns every vector distributed, and reduces the update step through
    :func:`grouped_centroid_sums`'s shuffle-free integer-grid merge tree.

    Determinism: member vectors are floored to the ``scale`` integer grid
    before summing, so the per-cluster sums are independent of block
    boundaries and summation order — re-running with ANY repartitioning
    yields bit-identical centroids (property-tested). Empty clusters keep
    their previous centroid. Init = the corpus's first ``k`` vectors
    (deterministic given file order), normalized.

    Scale shape (100 TB): per iteration the corpus streams once; only
    ``blocks × k × d`` integer partial rows move (vectors never cross an
    exchange), and the driver state is k×d floats. iters is a fixed small
    constant — total cost is iters corpus scans, each embarrassingly
    parallel."""
    head = ds.limit(k).to_pandas()
    if len(head) < k:
        raise ValueError(f"k={k} but the dataset has only {len(head)} vectors")
    idx = IVFIndex(n_centroids=k)
    idx.centroids = _normalize(_stack(head["embedding"].values))
    d = idx.centroids.shape[1]
    for _ in range(iters):
        g = grouped_centroid_sums(ds, idx, scale=scale, normalized=True).to_pandas()
        S = np.zeros((k, d), dtype=np.float64)
        n = np.zeros(k, dtype=np.int64)
        b = g["bucket"].to_numpy()
        dm = g["dim"].to_numpy()
        S[b, dm] = g["sum_q"].to_numpy() / float(scale)
        n[b] = g["n"].to_numpy()  # n repeats per dim; last write wins, equal
        newC = idx.centroids.copy()
        nz = n > 0
        newC[nz] = S[nz] / n[nz, None]
        idx.centroids = _normalize(newC)
    return idx
