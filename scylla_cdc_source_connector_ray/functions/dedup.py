"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup — the standard large-corpus dedup toolbox
(Broder resemblance / Charikar simhash / MinHashLSH banding; PAPERS.md).

Scale shapes (ray_guide "Aggregation at scale"):

* exact: content-key groupby, keep min doc_id — ONE shuffle of (key, doc_id)
  pairs, not of documents.
* MinHash-LSH: signatures per batch (vectorized universal hashing) → explode
  to (band, band_hash, doc_id) rows → groupby buckets → candidate pairs →
  Jaccard verify. Only bucket rows shuffle.
* SimHash: 64-bit signature per batch; near-dup candidates via 4×16-bit
  chunk banding (Hamming ≤ 3 guarantees one identical chunk).
* embedding near-dup / ANN verify: numpy matmul per batch against a
  broadcast matrix.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, key_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the minimum ``id_col`` per distinct ``key_col`` value.

    groupby(key).min(id) shuffles only (key, id) — at 100 TB, hash the key
    first (``exact_dedup_hashed``) so the shuffled key is 16 bytes, not the
    document."""
    from ray.data.aggregate import Count, Min

    return (
        ds.select_columns([key_col, id_col])
        .groupby(key_col)
        .aggregate(Min(id_col, alias_name="keep_id"), Count(alias_name="n_copies"))
    )


def with_content_hash(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """md5 of the normalized text — the 16-byte shuffle key for exact dedup.
    Shares the oracle-critical normalization with ``textops.fingerprint``."""
    from .textops import md5_normalized

    batch = batch.copy()
    batch["content_hash"] = md5_normalized(batch[text_col])
    return batch


def exact_dedup_hashed(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact dedup shuffling only (hash, id) pairs — the 100 TB shape."""
    hashed = ds.map_batches(with_content_hash, batch_format="pandas")
    return exact_dedup(hashed, key_col="content_hash", id_col=id_col)


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _word_ngram_hashes(text: str, n: int) -> np.ndarray:
    """Stable 64-bit hashes of word n-gram shingles."""
    words = text.lower().split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    raw = b"".join(hashlib.md5(g.encode()).digest()[:8] for g in grams)
    return np.unique(np.frombuffer(raw, dtype=np.uint64))


class MinHasher:
    """Actor-pool stage: num_perm universal hash params built once per actor.

    __call__: docs batch → one signature row per doc
    (vectorized (a*x+b) mod p over the doc's shingle set per permutation)."""

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (P, S) universal hashing in uint128-safe arithmetic via object-free trick:
        # (a*x+b) mod p with p = 2^61-1 using float-free numpy on uint64 (overflow-safe
        # because we reduce with the Mersenne-prime fold).
        x = shingles.astype(np.uint64)
        out = np.empty(self.num_perm, dtype=np.uint64)
        for i in range(self.num_perm):  # small loop over perms; inner op vectorized
            v = (int(self.a[i]) * x.astype(object) + int(self.b[i])) % _MERSENNE
            out[i] = np.uint64(min(v))
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for text in batch["text"].fillna(""):
            sigs.append(self.signature(_word_ngram_hashes(text, self.ngram)))
        out = pd.DataFrame({"doc_id": batch["doc_id"].values})
        out["sig"] = [s.astype("int64") for s in sigs]
        return out


class FastMinHasher(MinHasher):
    """Vectorized variant: processes the whole batch's shingles as one flat
    array per permutation (no Python bigints) using the split multiply-mod
    trick on uint64."""

    def signature_matrix(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """flat: all shingle hashes concatenated; offsets: doc boundaries
        (len D+1). Returns (D, num_perm) signature matrix."""
        D = len(offsets) - 1
        sigs = np.full((D, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(flat) == 0:
            return sigs
        x = flat % _MERSENNE
        nonempty = offsets[:-1] < offsets[1:]
        red_idx = offsets[:-1][nonempty]
        for i in range(self.num_perm):
            hv = _mulmod_mersenne(x, self.a[i]) + self.b[i]
            hv = (hv & _MERSENNE) + (hv >> np.uint64(61))
            hv = np.where(hv >= _MERSENNE, hv - _MERSENNE, hv)
            if len(red_idx):
                # segment-min via reduceat over non-empty doc ranges
                sigs[nonempty, i] = np.minimum.reduceat(hv, red_idx)
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "doc_id" not in batch.columns:
            out = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
            out["sig"] = pd.Series(dtype=object)
            return out
        hashes = [_word_ngram_hashes(t, self.ngram) for t in batch["text"].fillna("")]
        offsets = np.zeros(len(hashes) + 1, dtype=np.int64)
        np.cumsum([len(h) for h in hashes], out=offsets[1:])
        flat = np.concatenate(hashes) if hashes else np.zeros(0, dtype=np.uint64)
        sigs = self.signature_matrix(flat, offsets)
        out = pd.DataFrame({"doc_id": batch["doc_id"].values})
        out["sig"] = [s.astype("int64") for s in sigs]
        return out


def _mulmod_mersenne(x: np.ndarray, a: np.uint64) -> np.ndarray:
    """(a * x) mod (2^61-1) without 128-bit ints: split a into hi/lo 32-bit
    halves, reduce each partial product with the Mersenne fold."""
    a = np.uint64(a)
    x = x.astype(np.uint64)
    a_lo = a & np.uint64(0xFFFFFFFF)
    a_hi = a >> np.uint64(32)
    x_lo = x & np.uint64(0xFFFFFFFF)
    x_hi = x >> np.uint64(32)

    def fold(v):
        return (v & np.uint64(_MERSENNE)) + (v >> np.uint64(61))

    # x*a = (x_hi*a_hi)<<64 + (x_hi*a_lo + x_lo*a_hi)<<32 + x_lo*a_lo (mod p)
    # 2^64 mod p = 8 ; 2^32 mod p = 2^32
    hh = fold(x_hi * a_hi * np.uint64(8))
    mid = x_hi * a_lo + x_lo * a_hi  # < 2^63, no overflow
    mid = fold(_shift32_mod(mid))
    ll = fold(x_lo * a_lo)
    s = fold(hh + mid + ll)
    s = np.where(s >= _MERSENNE, s - _MERSENNE, s)
    return s


def _shift32_mod(v: np.ndarray) -> np.ndarray:
    """(v << 32) mod 2^64 folded — helper for _mulmod_mersenne."""
    lo = (v << np.uint64(32)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    hi = v >> np.uint64(32)
    return (lo & np.uint64(_MERSENNE)) + (lo >> np.uint64(61)) + hi * np.uint64(8)


def lsh_bucket_rows(sig_batch: pd.DataFrame, bands: int = 16) -> pd.DataFrame:
    """Explode signatures into (band, band_hash, doc_id) bucket rows."""
    if len(sig_batch) == 0:
        return pd.DataFrame(
            {
                "band": pd.Series(dtype="int64"),
                "band_hash": pd.Series(dtype="int64"),
                "doc_id": pd.Series(dtype="int64"),
            }
        )
    sigs = np.stack(sig_batch["sig"].values).astype(np.uint64)
    D, P = sigs.shape
    rows_per_band = P // bands
    recs = []
    for b in range(bands):
        chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
        bh = np.zeros(D, dtype=np.uint64)
        for c in range(rows_per_band):
            bh = bh * np.uint64(1099511628211) + chunk[:, c]
        recs.append(
            pd.DataFrame(
                {"band": b, "band_hash": bh.astype("int64"), "doc_id": sig_batch["doc_id"].values}
            )
        )
    return pd.concat(recs, ignore_index=True)


def candidate_pairs_from_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """One LSH bucket → all doc pairs (a<b). Buckets are small by design."""
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[ia], "b": ids[ib]})


def jaccard(text_a: str, text_b: str, ngram: int = 3) -> float:
    ha = _word_ngram_hashes(text_a, ngram)
    hb = _word_ngram_hashes(text_b, ngram)
    if len(ha) == 0 and len(hb) == 0:
        return 1.0
    inter = len(np.intersect1d(ha, hb, assume_unique=True))
    return inter / (len(ha) + len(hb) - inter)


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.7,
) -> ray.data.Dataset:
    """Full MinHash-LSH near-dup pipeline → verified duplicate pairs
    (a < b, jaccard ≥ threshold). Documents are broadcast for verification
    only when pairs are emitted (small-side lookup)."""
    import ray

    sigs = ds.map_batches(
        FastMinHasher,
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 8),
        fn_constructor_kwargs={"num_perm": num_perm, "ngram": ngram},
    )
    buckets = sigs.map_batches(
        lambda b: lsh_bucket_rows(b, bands=bands), batch_format="pandas"
    )
    pairs = buckets.groupby(["band", "band_hash"]).map_groups(
        candidate_pairs_from_bucket, batch_format="pandas"
    )
    # dedup candidate pairs (same pair can fire in several bands): a plain
    # aggregate (no per-group Python) — one row per (a, b)
    from ray.data.aggregate import Count

    pairs = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))
    # verify with true ngram-Jaccard; text lookup via broadcast (documents
    # table is the small side at test scale; at 100 TB verify via a
    # co-partitioned join on doc_id instead)
    texts = ds.select_columns(["doc_id", "text"]).to_pandas()
    if "doc_id" not in texts.columns:  # empty input loses its schema
        texts = pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype=object)})
    ref = ray.put(dict(zip(texts["doc_id"], texts["text"].fillna(""))))

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            jac = [
                jaccard(self.texts.get(a, ""), self.texts.get(b, ""), ngram)
                for a, b in zip(batch["a"], batch["b"])
            ]
            batch = batch.copy()
            batch["jaccard"] = jac
            return batch[batch["jaccard"] >= threshold]

    return pairs.map_batches(Verify, batch_format="pandas", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per doc (Charikar): sign-sum of shingle-hash bit
    vectors, vectorized with numpy bit unpacking."""

    def __init__(self, ngram: int = 3):
        self.ngram = ngram

    def simhash(self, hashes: np.ndarray) -> np.uint64:
        if len(hashes) == 0:
            return np.uint64(0)
        bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        score = bits.sum(axis=0) * 2 - len(hashes)  # (+1/-1 sums)
        out = np.packbits((score > 0).astype(np.uint8), bitorder="little")
        return out.view(np.uint64)[0]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "doc_id" not in batch.columns:
            out = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
            out["simhash"] = pd.Series(dtype="int64")
            return out
        out = pd.DataFrame({"doc_id": batch["doc_id"].values})
        out["simhash"] = [
            np.int64(self.simhash(_word_ngram_hashes(t, self.ngram)).astype(np.int64))
            for t in batch["text"].fillna("")
        ]
        return out


def simhash_near_dups(ds: ray.data.Dataset, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit chunk
    banding (pigeonhole: ≤3 differing bits ⇒ ≥1 identical 16-bit chunk)."""
    sigs = ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 8))

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].values.astype(np.uint64)
        recs = []
        for c in range(4):
            recs.append(
                pd.DataFrame(
                    {
                        "chunk": c,
                        "chunk_val": ((h >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype("int64"),
                        "doc_id": batch["doc_id"].values,
                        "simhash": batch["simhash"].values,
                    }
                )
            )
        return pd.concat(recs, ignore_index=True)

    buckets = sigs.map_batches(chunks, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")}
            )
        ids = g["doc_id"].values
        hs = g["simhash"].values.astype(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = np.array(
            [bin(int(hs[x]) ^ int(hs[y])).count("1") for x, y in zip(ia, ib)], dtype=np.int64
        )
        return pd.DataFrame({"a": ids[ia], "b": ids[ib], "hamming": ham})

    cand = buckets.groupby(["chunk", "chunk_val"]).map_groups(pairs, batch_format="pandas")
    from ray.data.aggregate import Min

    dedup = cand.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))
    return dedup.map_batches(
        lambda b: b[b["hamming"] <= max_hamming], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds: ray.data.Dataset, threshold: float = 0.95, id_limit: int | None = None
) -> ray.data.Dataset:
    """Pairs (a<b) with cosine ≥ threshold: brute-force blocked matmul of each
    batch against the broadcast normalized matrix (the O(n²/B) scale path is
    IVF bucketing in functions/similarity.py)."""
    import ray

    all_df = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    if id_limit is not None:
        all_df = all_df[all_df["vec_id"] < id_limit]
    M = np.stack(all_df["embedding"].values).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ids = all_df["vec_id"].values.astype(np.int64)
    ref = ray.put((ids, M))

    class Block:
        def __init__(self):
            self.ids, self.M = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if id_limit is not None:
                batch = batch[batch["vec_id"] < id_limit]
            if len(batch) == 0:
                return pd.DataFrame(
                    {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "cosine": pd.Series(dtype="float64")}
                )
            Q = np.stack(batch["embedding"].values).astype(np.float64)
            Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
            sims = Q @ self.M.T
            qa = batch["vec_id"].values.astype(np.int64)
            ra, rb = np.nonzero(sims >= threshold)
            a, b = qa[ra], self.ids[rb]
            keep = a < b
            return pd.DataFrame({"a": a[keep], "b": b[keep], "cosine": sims[ra, rb][keep]})

    return ds.map_batches(Block, batch_format="pandas", batch_size=1024, concurrency=(1, 8))
