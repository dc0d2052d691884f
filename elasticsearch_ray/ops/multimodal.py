"""Multimodal (image/audio/video) column processing for training-data
pipelines.

Media travel as opaque ``binary`` columns with typed metadata columns
(mime, width/height/duration). Stages are actor-pool ``map_batches`` classes
— the Ray-side plumbing (schema, batch sizing for large payloads, actor
signature, output layout) is real and tested; the actual codec call is
STUBBED behind ``decode_image_stub`` / ``decode_audio_stub`` because no
image/audio libraries exist in this container. The stub parses a small
deterministic header format (see ``synthesize_media``) so tests exercise
real bytes→array→feature flows; swapping in PIL/torchaudio means replacing
ONLY the ``_decode`` method body.

Batch-size guidance encoded here (SURVEY memory-aware rule): media rows are
large, so stages default to small ``batch_size`` and ``batch_format="pyarrow"``
(binary columns round-trip Arrow zero-copy; pandas would objectify them).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("payload", pa.binary()),
    ]
)

_MAGIC = b"ESRIMG1\x00"


def synthesize_media(n: int, seed: int = 42, max_side: int = 32, n_frames: int = 1) -> pa.Table:
    """Deterministic fake media: payload = magic + w,h,frames header + uint8
    'pixel' planes. Stands in for real JPEG/WAV bytes."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "mime", "width", "height", "n_frames", "payload")}
    for i in range(n):
        w = int(rng.integers(8, max_side + 1))
        h = int(rng.integers(8, max_side + 1))
        f = n_frames if n_frames > 1 else 1
        pixels = rng.integers(0, 256, size=f * h * w, dtype=np.uint8)
        payload = (
            _MAGIC
            + np.array([w, h, f], dtype="<i4").tobytes()
            + pixels.tobytes()
        )
        rows["media_id"].append(i)
        rows["mime"].append("image/fake" if f == 1 else "video/fake")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(f)
        rows["payload"].append(payload)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "payload": pa.array(rows["payload"], pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: parses the synthetic header → (frames, h, w) uint8 array.
    Real deployment: replace body with PIL.Image.open / cv2.imdecode.
    Raises on foreign bytes like a real decoder would."""
    if not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real image codecs are unavailable in this environment; "
            "only the synthetic ESRIMG format decodes"
        )
    w, h, f = np.frombuffer(payload, dtype="<i4", count=3, offset=len(_MAGIC))
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=len(_MAGIC) + 12)
    return pixels.reshape(int(f), int(h), int(w))


class DecodeStats:
    """Actor-pool stage: decode → per-media pixel stats (mean/std/entropy
    proxy). Setup (none here; a model would load in __init__) amortized per
    actor; small batch_size recommended for large payloads."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, stds, frames = [], [], [], []
        for mid, payload in zip(batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()):
            arr = decode_image_stub(payload)
            ids.append(mid)
            means.append(float(arr.mean()))
            stds.append(float(arr.std()))
            frames.append(arr.shape[0])
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "pix_mean": pa.array(np.round(means, 6)),
                "pix_std": pa.array(np.round(stds, 6)),
                "n_frames": pa.array(frames, pa.int32()),
            }
        )


class ResizeStage:
    """Actor-pool stage: nearest-neighbor resize to (out_h, out_w), re-encoded
    into the same payload format (decode → transform → encode round trip)."""

    def __init__(self, out_h: int, out_w: int, payload_col: str = "payload"):
        self.out_h, self.out_w = out_h, out_w
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch[self.payload_col].to_pylist():
            arr = decode_image_stub(payload)
            f, h, w = arr.shape
            yi = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            resized = arr[:, yi][:, :, xi]
            out.append(
                _MAGIC
                + np.array([self.out_w, self.out_h, f], dtype="<i4").tobytes()
                + resized.tobytes()
            )
        cols = {c: batch[c] for c in batch.column_names if c != self.payload_col}
        cols["width"] = pa.array(np.full(len(batch), self.out_w, np.int32))
        cols["height"] = pa.array(np.full(len(batch), self.out_h, np.int32))
        cols[self.payload_col] = pa.array(out, pa.binary())
        return pa.table(cols)


class EmbedStage:
    """Actor-pool stage: media → fixed-dim feature vector (downsampled pixel
    histogram — the stub for a vision model forward pass; a real model loads
    in __init__ ONCE per actor and runs batched inference in __call__)."""

    def __init__(self, dim: int = 16, payload_col: str = "payload", id_col: str = "media_id"):
        self.dim, self.payload_col, self.id_col = dim, payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, vecs = [], []
        for mid, payload in zip(batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()):
            arr = decode_image_stub(payload)
            hist, _ = np.histogram(arr, bins=self.dim, range=(0, 256))
            v = hist.astype(np.float32)
            n = np.linalg.norm(v)
            vecs.append((v / n if n else v).tolist())
            ids.append(mid)
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )


class FrameSampleStage:
    """Video frame sampling: keep every k-th frame (decode → slice →
    re-encode), the scale pattern for frame-level training data."""

    def __init__(self, every_k: int = 2, payload_col: str = "payload"):
        self.every_k = every_k
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, nf = [], []
        for payload in batch[self.payload_col].to_pylist():
            arr = decode_image_stub(payload)
            sampled = arr[:: self.every_k]
            f, h, w = sampled.shape
            out.append(_MAGIC + np.array([w, h, f], dtype="<i4").tobytes() + sampled.tobytes())
            nf.append(f)
        cols = {c: batch[c] for c in batch.column_names if c not in (self.payload_col, "n_frames")}
        cols["n_frames"] = pa.array(nf, pa.int32())
        cols[self.payload_col] = pa.array(out, pa.binary())
        return pa.table(cols)


def media_pipeline(ds: Dataset, out_h: int = 16, out_w: int = 16, dim: int = 16,
                   batch_size: int = 64, concurrency=2) -> Dataset:
    """decode→resize→embed chained actor-pool stages; small batches because
    payload rows are large (memory-aware rule)."""
    return (
        ds.map_batches(ResizeStage, fn_constructor_args=(out_h, out_w),
                       batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
        .map_batches(EmbedStage, fn_constructor_args=(dim,),
                     batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
    )
