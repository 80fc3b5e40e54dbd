"""Multimodal (image/audio/video) column stages (task brief).

Media are opaque ``binary`` columns + typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with SMALL batch sizes (large payloads — SURVEY
§4 memory notes).  Decode is REAL for PNG / JPEG (sequential +
progressive) / BMP / PPM / PGM / GIF, PCM WAV, AVI-MJPEG and animated
GIF video (pure numpy+stdlib codecs in codecs.py, rounds 3-5); formats
that genuinely need PIL/libav (WebP, mp3, MP4…) raise — or skip/flag
via the stages' ``on_error`` policy on crawl inputs.  A deterministic
fake format remains for plumbing fixtures:
b"FAKEIMG|<w>|<h>|" + w*h grayscale bytes (row-major).
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
    """PNG / JPEG (sequential + progressive) / BMP / PPM / PGM decode REAL in pure
    numpy+zlib (codecs.py, rounds 3-4); the FAKEIMG fixture format stays
    supported; WebP/AVIF/etc. genuinely need external codecs and raise."""
    if blob is not None and blob.startswith(MAGIC):
        head = blob[len(MAGIC) :]
        w_s, h_s, rest = head.split(b"|", 2)
        w, h = int(w_s), int(h_s)
        px = np.frombuffer(rest[: w * h], dtype=np.uint8).reshape(h, w)
        return w, h, px
    if blob is not None:
        try:
            from .codecs import decode_image

            return decode_image(blob)
        except ValueError as e:
            if "unsupported image format" not in str(e):
                raise  # corrupt blob of a RECOGNIZED format: clean ValueError
    raise NotImplementedError(
        "unsupported image format: PNG/JPEG/BMP/PPM/PGM decode "
        "in pure numpy (codecs.py); WebP/AVIF need external codecs, "
        "absent from this container"
    )


class DecodeImageStage:
    """Actor stage: binary → (width, height, mean_px, std_px).
    Use ``map_batches(DecodeImageStage, concurrency=N, batch_size=64)`` —
    small batches because payload rows are wide."""

    def __init__(self, on_error: str = "raise"):
        # crawl corpora carry corrupt/truncated media by the million —
        # a 100 TB job must not die on one bad blob.  "raise" (default,
        # fail-fast for curated inputs), "skip" (drop bad rows), or
        # "flag" (null measures + a decode_error column for lineage).
        if on_error not in ("raise", "skip", "flag"):
            raise ValueError(f"on_error must be raise/skip/flag, "
                             f"got {on_error!r}")
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, means, stds, errs = [], [], [], [], []
        for blob in batch.column("image").to_pylist():
            try:
                w, h, px = _decode_one(blob)
            except (ValueError, NotImplementedError) as e:
                if self.on_error == "raise":
                    raise
                ws.append(None)
                hs.append(None)
                means.append(None)
                stds.append(None)
                errs.append(f"{type(e).__name__}: {e}")
                continue
            ws.append(w)
            hs.append(h)
            means.append(float(px.mean()))
            stds.append(float(px.std()))
            errs.append(None)
        out = (
            batch.drop_columns(["image"])
            .append_column("width", pa.array(ws, type=pa.int32()))
            .append_column("height", pa.array(hs, type=pa.int32()))
            .append_column("mean_px", pa.array(means, type=pa.float64()))
            .append_column("std_px", pa.array(stds, type=pa.float64()))
        )
        if self.on_error == "skip":
            return out.filter(pa.array([e is None for e in errs]))
        if self.on_error == "flag":
            return out.append_column(
                "decode_error", pa.array(errs, type=pa.string()))
        return out


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


def decode_images(ds: Dataset, *, concurrency=(1, 4), batch_size: int = 64,
                  on_error: str = "raise") -> Dataset:
    return ds.map_batches(
        DecodeImageStage, fn_constructor_kwargs={"on_error": on_error},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def resize_images(ds: Dataset, tw: int, th: int, *, concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    return ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"tw": tw, "th": th},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Audio: b"FAKEAUD|<rate>|" + int16 LE samples
# ---------------------------------------------------------------------------

AUDIO_MAGIC = b"FAKEAUD|"


def encode_fake_audio(rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    samples = (rng.standard_normal(n_samples) * 8000).astype(np.int16)
    return AUDIO_MAGIC + f"{rate}|".encode() + samples.tobytes()


def _decode_audio_one(blob: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV decode REAL (codecs.py); FAKEAUD fixture stays supported;
    compressed audio (mp3/ogg/flac) needs libav and raises."""
    if blob is not None and blob.startswith(AUDIO_MAGIC):
        head = blob[len(AUDIO_MAGIC):]
        rate_s, rest = head.split(b"|", 1)
        return int(rate_s), np.frombuffer(rest, dtype=np.int16)
    if blob is not None and blob[:4] == b"RIFF":
        from .codecs import decode_wav

        try:
            rate, x = decode_wav(blob)
        except NotImplementedError:
            raise
        except ValueError as e:
            if "not a WAV" not in str(e):
                raise
            # RIFF but not WAVE (e.g. AVI): fall to NotImplementedError
        except Exception as e:  # struct.error etc. from a truncated blob
            raise ValueError(f"corrupt WAV blob: {e}") from e
        else:
            return rate, (x * 32767.0).astype(np.int16)
    raise NotImplementedError(
        "unsupported audio format: PCM WAV decodes in pure numpy "
        "(codecs.py); compressed audio needs libav, absent from this "
        "container"
    )


class AudioFeatureStage:
    """Actor stage: binary → (sample_rate, duration_s, rms, zero_crossings).
    Small batches — audio payloads are wide rows.  ``on_error`` as in
    DecodeImageStage (raise/skip/flag)."""

    def __init__(self, on_error: str = "raise"):
        if on_error not in ("raise", "skip", "flag"):
            raise ValueError(f"on_error must be raise/skip/flag, "
                             f"got {on_error!r}")
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, durs, rms, zc, errs = [], [], [], [], []
        for blob in batch.column("audio").to_pylist():
            try:
                rate, s = _decode_audio_one(blob)
                if rate <= 0:  # belt-and-braces: never divide by a
                    raise ValueError(f"invalid sample rate {rate}")
            except (ValueError, NotImplementedError) as e:
                if self.on_error == "raise":
                    raise
                rates.append(None)
                durs.append(None)
                rms.append(None)
                zc.append(None)
                errs.append(f"{type(e).__name__}: {e}")
                continue
            rates.append(rate)
            durs.append(len(s) / rate)
            f = s.astype(np.float64)
            rms.append(float(np.sqrt(np.mean(f * f))) if len(s) else 0.0)
            zc.append(int((np.signbit(f[1:]) != np.signbit(f[:-1])).sum()))
            errs.append(None)
        out = (
            batch.drop_columns(["audio"])
            .append_column("sample_rate", pa.array(rates, type=pa.int32()))
            .append_column("duration_s", pa.array(durs, type=pa.float64()))
            .append_column("rms", pa.array(rms, type=pa.float64()))
            .append_column("zero_crossings", pa.array(zc, type=pa.int64()))
        )
        if self.on_error == "skip":
            return out.filter(pa.array([e is None for e in errs]))
        if self.on_error == "flag":
            return out.append_column(
                "decode_error", pa.array(errs, type=pa.string()))
        return out


# ---------------------------------------------------------------------------
# Video: a sequence of FAKEIMG frames, length-prefixed
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"FAKEVID|"


def encode_fake_video(w: int, h: int, n_frames: int, seed: int) -> bytes:
    frames = [encode_fake_image(w, h, seed * 1000 + i) for i in range(n_frames)]
    out = [VIDEO_MAGIC + f"{n_frames}|".encode()]
    for f in frames:
        out.append(len(f).to_bytes(4, "little"))
        out.append(f)
    return b"".join(out)


def encode_mjpeg_video(w: int, h: int, n_frames: int, seed: int) -> bytes:
    """Deterministic REAL video fixture (round 5): seeded grayscale
    gradient frames, baseline-JPEG-encoded (codecs.encode_jpeg_gray)
    and muxed into an AVI-MJPEG container (codecs.encode_avi_mjpeg) —
    the whole video path exercises real parsers end to end."""
    from .codecs import encode_avi_mjpeg, encode_jpeg_gray

    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h, w)).astype(np.int64)
    frames = [
        encode_jpeg_gray(((base + 11 * i) % 256).astype(np.uint8))
        for i in range(n_frames)
    ]
    return encode_avi_mjpeg(frames, w, h)


def _iter_video_frames(blob: bytes):
    if blob is not None and blob[:4] == b"RIFF":
        # real AVI container: each movi '##dc' chunk is one JPEG frame
        from .codecs import iter_avi_mjpeg_frames

        yield from iter_avi_mjpeg_frames(blob)
        return
    if blob is not None and blob[:6] in (b"GIF87a", b"GIF89a"):
        # animated GIF as a video source: composited grayscale frames
        # re-emitted as PGM (P5) bytes — a real format decode_images
        # reads, so the frame column stays decodable blobs
        from .codecs import iter_gif_frames

        # normalize parser exceptions (struct.error on truncation etc.)
        # to ValueError so FrameSampleStage's on_error=skip catches them
        # — the image path gets this from decode_image; the video path
        # must do it here
        try:
            for px in iter_gif_frames(blob):
                h, w = px.shape
                yield b"P5\n%d %d\n255\n" % (w, h) + px.tobytes()
        except (ValueError, NotImplementedError):
            raise
        except Exception as e:
            raise ValueError(f"corrupt GIF video: {e}") from e
        return
    if blob is None or not blob.startswith(VIDEO_MAGIC):
        raise NotImplementedError(
            "unsupported video container: AVI-MJPEG and animated GIF "
            "demux real (codecs.py); MP4/MKV/etc. need external codecs, "
            "absent from this container; the FAKEVID fixture format "
            "also decodes"
        )
    head = blob[len(VIDEO_MAGIC):]
    n_s, rest = head.split(b"|", 1)
    off = 0
    for _ in range(int(n_s)):
        ln = int.from_bytes(rest[off : off + 4], "little")
        off += 4
        yield rest[off : off + ln]
        off += ln


class FrameSampleStage:
    """Actor stage: video binary → every k-th frame exploded to rows
    (vid_id, frame_idx, image).  flat_map-shaped: one input row → many."""

    def __init__(self, every_k: int = 2, on_error: str = "raise"):
        # "skip": a corrupt/unsupported video contributes zero frames
        # instead of killing the job (crawl inputs); default fail-fast
        if on_error not in ("raise", "skip"):
            raise ValueError(f"on_error must be raise/skip, "
                             f"got {on_error!r}")
        self.k = every_k
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, frames = [], [], []
        for vid, blob in zip(
            batch.column("vid_id").to_pylist(), batch.column("video").to_pylist()
        ):
            try:
                decoded = list(_iter_video_frames(blob))
            except (ValueError, NotImplementedError):
                if self.on_error == "raise":
                    raise
                continue
            for i, frame in enumerate(decoded):
                if i % self.k == 0:
                    vids.append(vid)
                    idxs.append(i)
                    frames.append(frame)
        return pa.table(
            {
                "vid_id": pa.array(vids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "image": pa.array(frames, type=pa.binary()),
            }
        )


def audio_features(ds: Dataset, *, concurrency=(1, 4), batch_size: int = 64,
                   on_error: str = "raise") -> Dataset:
    return ds.map_batches(
        AudioFeatureStage, fn_constructor_kwargs={"on_error": on_error},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds: Dataset, every_k: int = 2, *, concurrency=(1, 4),
                  batch_size: int = 16, on_error: str = "raise") -> Dataset:
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every_k": every_k, "on_error": on_error},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
