"""Multimodal (image/audio) column plumbing (task brief).

Media are opaque ``binary`` columns + typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with SMALL batch sizes (large payloads — SURVEY
§4 memory notes).  Real codecs (PIL / libav) are NOT in this container:
the decode step is stubbed behind a deterministic fake format so the
Ray-side plumbing — schema, batch size, actor signature, output layout —
is real and tested (tests/test_multimodal.py).

Fake format: b"FAKEIMG|<w>|<h>|" + w*h grayscale bytes (row-major).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MAGIC = b"FAKEIMG|"


def encode_fake_image(w: int, h: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    return MAGIC + f"{w}|{h}|".encode() + rng.randint(0, 256, w * h, dtype=np.uint8).tobytes()


def _decode_one(blob: bytes) -> tuple[int, int, np.ndarray]:
    if blob is None or not blob.startswith(MAGIC):
        raise NotImplementedError(
            "real image codecs (PIL/turbojpeg) are not available in this "
            "container; only the FAKEIMG fixture format is decodable"
        )
    head = blob[len(MAGIC) :]
    w_s, h_s, rest = head.split(b"|", 2)
    w, h = int(w_s), int(h_s)
    px = np.frombuffer(rest[: w * h], dtype=np.uint8).reshape(h, w)
    return w, h, px


class DecodeImageStage:
    """Actor stage: binary → (width, height, mean_px, std_px).
    Use ``map_batches(DecodeImageStage, concurrency=N, batch_size=64)`` —
    small batches because payload rows are wide."""

    def __init__(self):
        pass  # a real impl would initialize the codec here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, means, stds = [], [], [], []
        for blob in batch.column("image").to_pylist():
            w, h, px = _decode_one(blob)
            ws.append(w)
            hs.append(h)
            means.append(float(px.mean()))
            stds.append(float(px.std()))
        return (
            batch.drop_columns(["image"])
            .append_column("width", pa.array(ws, type=pa.int32()))
            .append_column("height", pa.array(hs, type=pa.int32()))
            .append_column("mean_px", pa.array(means, type=pa.float64()))
            .append_column("std_px", pa.array(stds, type=pa.float64()))
        )


class ResizeStage:
    """Actor stage: deterministic nearest-neighbor resize to (tw, th),
    re-encoded in the fixture format (shape-preserving plumbing test)."""

    def __init__(self, tw: int = 8, th: int = 8):
        self.tw, self.th = tw, th

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for blob in batch.column("image").to_pylist():
            w, h, px = _decode_one(blob)
            yi = (np.arange(self.th) * h) // self.th
            xi = (np.arange(self.tw) * w) // self.tw
            small = px[yi][:, xi]
            out.append(MAGIC + f"{self.tw}|{self.th}|".encode() + small.tobytes())
        idx = batch.schema.get_field_index("image")
        return batch.set_column(idx, "image", pa.array(out, type=pa.binary()))


def decode_images(ds: Dataset, *, concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    return ds.map_batches(
        DecodeImageStage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def resize_images(ds: Dataset, tw: int, th: int, *, concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    import functools  # noqa: F401  (kept minimal; class carries the params)

    return ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"tw": tw, "th": th},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
