"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages. The actual codec libraries (Pillow, ffmpeg, torchaudio) are NOT in
this container, so the decode kernel is STUBBED: ``decoder="real"`` raises
``NotImplementedError`` at actor construction; ``decoder="fake"`` produces a
deterministic pseudo-decode (seeded from the payload bytes) so the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is real and
tested end-to-end.

Memory note (ray_guide): binary payloads dominate block size — use small
``batch_size`` (e.g. 32–256) and let actor ``concurrency × num_cpus`` match
the node rather than splitting blocks absurdly small.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),  # metadata as known at ingest (nullable)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media(n: int = 64, kind: str = "image", payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (seeded payload bytes) for tests."""
    rng = np.random.RandomState(42)
    payloads = [rng.randint(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([48] * n, pa.int32()),
            "duration_ms": pa.array([1000] * n, pa.int32()),
        }
    )


def media_from_documents(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic media table derived from the ``documents`` table so the
    driver's SQL oracle can recompute the metadata side: media_id = doc_id,
    dims/duration are closed-form integer functions of doc_id, payload is the
    md5 digest of the text (only its bytes seed the fake decode).

    width = 16 + (doc_id % 7) * 8, height = 16 + (doc_id % 5) * 8,
    duration_ms = (doc_id % 40) * 230.
    """
    import hashlib

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        texts = t["text"].combine_chunks().fill_null("").to_pylist()
        payloads = [hashlib.md5(s.encode()).digest() for s in texts]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["video"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(16 + (ids % 7) * 8, pa.int32()),
                "height": pa.array(16 + (ids % 5) * 8, pa.int32()),
                "duration_ms": pa.array((ids % 40) * 230, pa.int32()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


def _probe_codec():
    """Import-probe for a real image codec (Pillow first, imageio fallback).
    Returns ``("pil", module)`` / ``("imageio", module)`` or ``None`` — called
    once per actor in ``Decoder.__init__``, never per batch."""
    try:
        from PIL import Image  # noqa: PLC0415

        return ("pil", Image)
    except ImportError:
        pass
    try:
        import imageio.v3 as iio  # noqa: PLC0415

        return ("imageio", iio)
    except ImportError:
        return None


def _normalize_to_uint8_rgb(img: np.ndarray) -> np.ndarray:
    """Bring an imageio-native array to HxWx3 uint8 range.

    imageio returns the file's native dtype; rescale every non-uint8 dtype
    instead of letting a plain cast wrap values mod 256. Integer dtypes
    normalize by the OBSERVED max (like the float max<=1 heuristic), not the
    dtype's full range — 8/12-bit sensor content stored in wide dtypes
    (uint16/int32 TIFFs) would otherwise collapse to near-zero; observed
    max <= 255 means the content already lives in uint8 range and is kept
    verbatim."""
    if np.issubdtype(img.dtype, np.floating):
        img = np.clip(img * 255.0 if img.max() <= 1.0 else img, 0, 255)
    elif img.dtype != np.uint8 and np.issubdtype(img.dtype, np.integer):
        mx = int(img.max()) if img.size else 0
        if mx > 255:
            img = np.clip(img.astype(np.float64) * (255.0 / mx), 0, 255)
        else:
            img = np.clip(img, 0, 255)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] < 3:  # grayscale / luminance+alpha → 3-channel
        img = np.repeat(img[:, :, :1], 3, axis=2)
    img = img[:, :, :3]  # RGBA → drop alpha
    return img


class Decoder:
    """Actor-pool decode stage.

    ``decoder="fake"`` — deterministic pseudo-decode (payload-seeded pixels);
    the gated/oracle path. ``decoder="real"`` — decode payload bytes with
    Pillow/imageio, failing fast at actor construction when neither library
    exists (this container has neither). ``decoder="auto"`` — probe once per
    actor and use the real codec when present, else fall back to fake, so the
    same pipeline runs real work the moment the environment provides a codec.
    """

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real", "auto"):
            raise ValueError(f"decoder must be fake|real|auto, got {decoder!r}")
        self._codec = None
        if decoder in ("real", "auto"):
            self._codec = _probe_codec()
            if decoder == "real" and self._codec is None:
                raise NotImplementedError(
                    "real decode needs Pillow or imageio, not present in this "
                    "container; install one or use decoder='auto'/'fake' — "
                    "the Ray plumbing is identical"
                )
        self.decoder = "real" if self._codec is not None else "fake"

    def _real_pixels(self, payload: bytes) -> np.ndarray:
        import io  # noqa: PLC0415

        kind, mod = self._codec
        if kind == "pil":
            img = np.asarray(mod.open(io.BytesIO(payload)).convert("RGB"))
        else:
            img = _normalize_to_uint8_rgb(np.asarray(mod.imread(payload)))
        return np.ascontiguousarray(img, dtype=np.uint8)

    def _fake_pixels(self, payload: bytes, w: int, h: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "little")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # variable per-row dimensions are legal (MEDIA_SCHEMA carries w/h per
        # row) → a variable-length list column, never np.stack
        pixels = []
        offsets = [0]
        dims: list[tuple[int, int]] = []  # decoded (w, h), authoritative on real path
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            if self.decoder == "real":
                px = self._real_pixels(payload)
                dims.append((px.shape[1], px.shape[0]))
            else:
                px = self._fake_pixels(payload, w or 64, h or 48)
                # echo the ORIGINAL metadata (incl. NULL/0 = "dims
                # unknown") — only the real path may overwrite it with
                # decoded truth; downstream consumers apply the same
                # `or 64 / or 48` fallback the synthesis used
                dims.append((w, h))
            pixels.append(px.ravel())
            offsets.append(offsets[-1] + px.size)
        values = (
            pa.array(np.concatenate(pixels), pa.uint8())
            if pixels
            else pa.array([], pa.uint8())
        )
        flat = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
        out = batch.drop_columns(["payload"]).append_column("pixels", flat)
        # decoded dims replace ingest metadata so Resizer/FeatureExtractor
        # reshape correctly even when the metadata lied (real codecs only;
        # the fake path echoes the metadata, keeping oracles byte-stable)
        out = out.set_column(
            out.column_names.index("width"), "width", pa.array([d[0] for d in dims], pa.int32())
        )
        return out.set_column(
            out.column_names.index("height"), "height", pa.array([d[1] for d in dims], pa.int32())
        )


class Resizer:
    """Nearest-neighbour resize on decoded pixel tensors (pure numpy —
    real and vectorized; works on fake or real decodes alike)."""

    def __init__(self, out_w: int = 32, out_h: int = 24):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = batch["width"].to_pylist()
        h = batch["height"].to_pylist()
        px = batch["pixels"].combine_chunks()
        out = np.empty((n, self.out_h, self.out_w, 3), dtype=np.uint8)
        for i in range(n):
            W, H = w[i] or 64, h[i] or 48
            img = np.asarray(px[i].values, dtype=np.uint8).reshape(H, W, 3)
            yi = (np.arange(self.out_h) * H // self.out_h)[:, None]
            xi = (np.arange(self.out_w) * W // self.out_w)[None, :]
            out[i] = img[yi, xi]
        flat = pa.ListArray.from_arrays(
            pa.array(range(0, (n + 1) * self.out_h * self.out_w * 3, self.out_h * self.out_w * 3), pa.int32()),
            pa.array(out.reshape(-1), pa.uint8()),
        )
        t = batch.drop_columns(["pixels"]).append_column("pixels", flat)
        t = t.set_column(t.column_names.index("width"), "width", pa.array([self.out_w] * n, pa.int32()))
        return t.set_column(t.column_names.index("height"), "height", pa.array([self.out_h] * n, pa.int32()))


class FeatureExtractor:
    """Mean-color + luma-histogram features per image (numpy, vectorized
    across the batch tensor) — the stand-in for a real embedding model;
    model load would live here in ``__init__`` (once per actor)."""

    def __init__(self, bins: int = 8):
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        feats = np.empty((n, 3 + self.bins), dtype=np.float32)
        px = batch["pixels"].combine_chunks()
        w = batch["width"].to_pylist()
        h = batch["height"].to_pylist()
        for i in range(n):
            img = np.asarray(px[i].values, dtype=np.float32).reshape(h[i], w[i], 3)
            feats[i, :3] = img.mean(axis=(0, 1)) / 255.0
            luma = img.mean(axis=2).ravel() / 255.0
            hist, _ = np.histogram(luma, bins=self.bins, range=(0, 1))
            feats[i, 3:] = hist / max(1, luma.size)
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), 3 + self.bins
        )
        return batch.select(["media_id", "kind"]).append_column("features", flat)


def frame_sample_ids(batch: pa.Table, every_ms: int = 250) -> pa.Table:
    """Video frame-sampling plan: explode each video row into (media_id,
    frame_ms) rows — the shape a real frame extractor consumes. Vectorized
    np.repeat + ranges expansion, no per-row Python."""
    import pyarrow.compute as pc

    ids = batch["media_id"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    durs = (
        pc.fill_null(batch["duration_ms"].combine_chunks().cast(pa.int64()), 0)
        .to_numpy(zero_copy_only=False)
    )
    counts = np.maximum(durs, 0)
    counts = (counts + every_ms - 1) // every_ms  # len(range(0, d, every_ms))
    total = int(counts.sum())
    out_ids = np.repeat(ids, counts)
    base = np.repeat(np.cumsum(counts) - counts, counts)
    out_ms = (np.arange(total, dtype=np.int64) - base) * every_ms
    return pa.table(
        {
            "media_id": pa.array(out_ids, pa.int64()),
            "frame_ms": pa.array(out_ms.astype(np.int32), pa.int32()),
        }
    )


def decode_pipeline(
    ds: ray.data.Dataset,
    decoder: str = "fake",
    batch_size: int = 64,
    concurrency: int | tuple = (1, 4),
) -> ray.data.Dataset:
    """decode → resize → feature-extract, all actor pools with small batches
    (binary payloads dominate memory)."""
    ds = ds.map_batches(
        Decoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"decoder": decoder},
    )
    ds = ds.map_batches(
        Resizer, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
    return ds.map_batches(
        FeatureExtractor, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
