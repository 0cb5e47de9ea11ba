"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video cells are treated as opaque ``binary`` columns with a
``media_type`` metadata column. Decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with SMALL batch
sizes (wide binary rows — SURVEY §7.4 memory note).

The decode kernels are STUBS (the image/audio libraries are not in this
container): ``DeterministicFakeDecoder`` produces a seeded, deterministic
feature vector from the payload bytes so the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested;
``LibraryDecoder`` raises ``NotImplementedError`` until a real codec is
wired in.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # e.g. image/png, audio/wav
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests (binary payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.randint(0, 256, size=128 + (i % 64), dtype=np.uint8).tobytes() for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array(
                ["image/png" if i % 2 == 0 else "audio/wav" for i in range(n)], pa.string()
            ),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([64 + (i % 8) * 16 for i in range(n)], pa.int32()),
            "height": pa.array([48 + (i % 4) * 16 for i in range(n)], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class LibraryDecoder:
    """Real decode stage placeholder — raises until a codec library exists."""

    def __init__(self, media_type: str = "image/png"):
        self.media_type = media_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "use DeterministicFakeDecoder for plumbing tests"
        )


class DeterministicFakeDecoder:
    """Actor-pool decode stub: payload bytes → fixed-dim feature vector.

    Deterministic (md5-seeded) so pipelines over media columns are fully
    testable; swap for a real decoder without touching the pipeline shape.
    """

    def __init__(self, feature_dim: int = 16):
        self.dim = feature_dim

    def features_of(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "little")
        rng = np.random.RandomState(seed)
        return rng.normal(size=self.dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.features_of(p) for p in batch.column("payload").to_pylist()]
        out = batch.drop_columns(["payload"])  # drop the wide binary ASAP
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def decode_features_stage(ds, batch_size: int = 32, concurrency=(1, 4), feature_dim: int = 16):
    """Media Dataset → features Dataset. Small batches: payload rows are wide."""
    return ds.map_batches(
        DeterministicFakeDecoder,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def frame_sample_stage(ds, every_nth: int = 2):
    """Frame-sampling plumbing stub: keep every Nth media row (deterministic
    on media_id) — stands in for temporal sampling of video payloads."""

    def sample(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("media_id").to_pylist())
        return batch.filter(pa.array(ids % every_nth == 0))

    return ds.map_batches(sample, batch_format="pyarrow")


def _bilinear_resize(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Vectorized bilinear resample of one (h, w) float array to (th, tw)
    (align_corners=False / half-pixel-centers convention, the common default
    in image libraries)."""
    h, w = img.shape
    ys = (np.arange(th, dtype=np.float64) + 0.5) * h / th - 0.5
    xs = (np.arange(tw, dtype=np.float64) + 0.5) * w / tw - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


class PixelResize:
    """Actor-pool resize stage over DECODED pixel rows (``pixels``
    list<float> + ``height``/``width`` columns — the layout a real decoder
    emits upstream). Real numpy bilinear math, no codec dependency; output
    rows carry the fixed target shape so downstream batched model stages can
    stack them."""

    def __init__(self, target_h: int = 32, target_w: int = 32):
        self.th = int(target_h)
        self.tw = int(target_w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = batch.column("height").to_pylist()
        ws = batch.column("width").to_pylist()
        px = batch.column("pixels").to_pylist()
        out = [
            _bilinear_resize(
                np.asarray(p, dtype=np.float64).reshape(h, w), self.th, self.tw
            ).reshape(-1).astype(np.float32)
            for p, h, w in zip(px, hs, ws)
        ]
        t = batch.drop_columns(["pixels", "height", "width"])
        t = t.append_column("pixels", pa.array([o.tolist() for o in out], pa.list_(pa.float32())))
        t = t.append_column("height", pa.array([self.th] * len(out), pa.int32()))
        return t.append_column("width", pa.array([self.tw] * len(out), pa.int32()))


def resize_stage(ds, target_h: int = 32, target_w: int = 32, batch_size: int = 32,
                 concurrency=(1, 4)):
    """Pixel Dataset → fixed-shape pixel Dataset (small batches: pixel rows
    are wide; actor pool so per-worker state stays warm for real decoders)."""
    return ds.map_batches(
        PixelResize,
        fn_constructor_kwargs={"target_h": target_h, "target_w": target_w},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def synth_pixel_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Deterministic variable-shape pixel rows for resize/model plumbing
    tests (mirrors synth_media_table for the decoded layout)."""
    rng = np.random.RandomState(seed)
    ids, px, hs, ws = [], [], [], []
    for i in range(n):
        h = int(rng.randint(4, 17))
        w = int(rng.randint(4, 17))
        ids.append(i)
        hs.append(h)
        ws.append(w)
        px.append(rng.rand(h * w).astype(np.float32).tolist())
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "pixels": pa.array(px, pa.list_(pa.float32())),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
        }
    )
