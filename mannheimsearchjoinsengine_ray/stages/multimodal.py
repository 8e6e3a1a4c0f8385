"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata.

The Ray-side plumbing (schema, actor-pool stages, small batch sizes for large
payloads, output layout) is real and tested; the codec work itself is STUBBED
because no image/audio libraries exist in this container — each decoder raises
``NotImplementedError`` unless ``deterministic_fake=True``, which produces a
seeded fake so the distributed path can be exercised end-to-end.

Stage shape: callable classes for ``map_batches(cls, concurrency=N,
batch_size=SMALL, num_cpus=c)`` — model/codec load belongs in __init__.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),             # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

# Large binary payloads: keep batches small so batch × concurrency fits the
# worker heap (ray_guide 'Memory-aware').
MEDIA_BATCH_SIZE = 32


def make_fake_media(n: int, media_type: str = "image", seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array([media_type] * n),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([48] * n, pa.int32()),
        "duration_ms": pa.array([-1] * n, pa.int32()),
    })


class ImageDecoder:
    """payload → decoded pixel features.  Real codec stubbed (no PIL/cv2 in
    this container); ``deterministic_fake`` hashes the payload into a stable
    pseudo-feature vector so the distributed path is testable."""

    def __init__(self, deterministic_fake: bool = False, feature_dim: int = 16):
        self.fake = deterministic_fake
        self.dim = feature_dim

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires an image library (PIL/cv2) not present "
                "in this environment; construct with deterministic_fake=True "
                "for plumbing tests")
        h = hashlib.blake2b(payload, digest_size=self.dim * 4).digest()
        return np.frombuffer(h, dtype=np.uint32).astype(np.float32) / 2**32

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch.column("payload").to_pylist()]
        return pa.table({
            "media_id": batch.column("media_id"),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class ImageResizer:
    """payload → resized payload (stub).  Fake mode truncates/pads the byte
    payload deterministically to simulate a size change."""

    def __init__(self, target_w: int = 32, target_h: int = 24,
                 deterministic_fake: bool = False):
        self.w, self.h = target_w, target_h
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("resize requires an image library")
        size = self.w * self.h
        payloads = [(p[:size]).ljust(size, b"\0")
                    for p in batch.column("payload").to_pylist()]
        out = {n: batch.column(n) for n in batch.column_names}
        out["payload"] = pa.array(payloads, pa.binary())
        out["width"] = pa.array([self.w] * batch.num_rows, pa.int32())
        out["height"] = pa.array([self.h] * batch.num_rows, pa.int32())
        return pa.table(out)


class FrameSampler:
    """video payload → k evenly spaced 'frames' (stub: byte slices)."""

    def __init__(self, num_frames: int = 4, deterministic_fake: bool = False):
        self.k = num_frames
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("frame sampling requires a video library")
        ids, frames, indices = [], [], []
        for mid, p in zip(batch.column("media_id").to_pylist(),
                          batch.column("payload").to_pylist()):
            step = max(1, len(p) // self.k)
            for fi in range(self.k):
                ids.append(mid)
                indices.append(fi)
                frames.append(p[fi * step:(fi + 1) * step])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(indices, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def decode_features(media_ds, deterministic_fake: bool = False,
                    concurrency: int = 2):
    return media_ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"deterministic_fake": deterministic_fake},
        batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency, num_cpus=1)
