"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` columns with struct
metadata (the reference's byte-stream/`chunk_ptr` analog,
``include/tenzir/chunk.hpp``); decode/feature stages are ACTOR-POOL
``map_batches`` with SMALL batch sizes (payload bytes dominate block
size — a handful of rows per batch keeps batch × concurrency inside a
worker heap).

The real image/audio codecs are not in this container, so the decode
kernels are STUBBED: ``codec="fake"`` runs a deterministic
header-parsing decoder (real Ray-side plumbing — schema, batch sizing,
actor signature, output layout — all exercised by tests);
any other codec raises NotImplementedError with the dependency named.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_PYARROW = dict(batch_format="pyarrow", zero_copy_batch=True)

# fake payload layout: magic(4s) width(u16) height(u16) channels(u8) then pixel bytes
_FAKE_MAGIC = b"FIMG"
_FAKE_AUDIO_MAGIC = b"FAUD"
# fake video: magic(4s) n_frames(u32) fps(u16) then n_frames fake-image payloads,
# each length-prefixed (u32)
_FAKE_VIDEO_MAGIC = b"FVID"


def make_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic fake image payload for tests/fixtures."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, width * height * channels, dtype=np.uint8)
    return _FAKE_MAGIC + struct.pack("<HHB", width, height, channels) + pixels.tobytes()


def make_fake_audio(n_samples: int, sample_rate: int = 16000, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    samples = (rng.normal(0, 0.1, n_samples) * 32767).astype(np.int16)
    return _FAKE_AUDIO_MAGIC + struct.pack("<II", n_samples, sample_rate) + samples.tobytes()


class ImageDecode:
    """Actor-pool decode stage: binary column -> width/height/channels +
    a content digest. Swap ``codec='fake'`` for a PIL/cv2 kernel in a
    container that has them."""

    def __init__(self, data_col: str = "data", codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} needs an image library (PIL/cv2) not present in this container"
            )
        self.data_col = data_col

    def decode(self, payload: Optional[bytes]):
        if payload is None or payload[:4] != _FAKE_MAGIC:
            return None, None, None, None
        w, h, c = struct.unpack("<HHB", payload[4:9])
        digest = hashlib.sha256(payload[9:]).hexdigest()
        return w, h, c, digest

    def __call__(self, batch: pa.Table) -> pa.Table:
        decoded = [self.decode(p) for p in batch[self.data_col].to_pylist()]
        batch = batch.append_column("width", pa.array([d[0] for d in decoded], type=pa.int32()))
        batch = batch.append_column("height", pa.array([d[1] for d in decoded], type=pa.int32()))
        batch = batch.append_column("channels", pa.array([d[2] for d in decoded], type=pa.int32()))
        return batch.append_column("pixels_sha256", pa.array([d[3] for d in decoded], type=pa.string()))


class ImageResize:
    """Actor-pool resize stage over fake payloads: nearest-neighbor
    downsample with real numpy indexing (a real kernel would call
    PIL.Image.resize)."""

    def __init__(self, target: int = 64, data_col: str = "data"):
        self.target = target
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch[self.data_col].to_pylist():
            if payload is None or payload[:4] != _FAKE_MAGIC:
                out.append(None)
                continue
            w, h, c = struct.unpack("<HHB", payload[4:9])
            px = np.frombuffer(payload[9:], dtype=np.uint8).reshape(h, w, c)
            yi = (np.arange(self.target) * h // self.target).clip(0, h - 1)
            xi = (np.arange(self.target) * w // self.target).clip(0, w - 1)
            small = px[yi][:, xi]
            out.append(
                _FAKE_MAGIC
                + struct.pack("<HHB", self.target, self.target, c)
                + small.tobytes()
            )
        idx = batch.column_names.index(self.data_col)
        return batch.set_column(idx, self.data_col, pa.array(out, type=pa.binary()))


class AudioFeatures:
    """Actor-pool audio feature extraction over fake payloads: frame
    RMS energy + zero-crossing rate (numpy; a real kernel would use
    librosa/torchaudio)."""

    def __init__(self, data_col: str = "data", frame: int = 512):
        self.data_col = data_col
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms_out, zcr_out, dur_out = [], [], []
        for payload in batch[self.data_col].to_pylist():
            if payload is None or payload[:4] != _FAKE_AUDIO_MAGIC:
                rms_out.append(None)
                zcr_out.append(None)
                dur_out.append(None)
                continue
            n, sr = struct.unpack("<II", payload[4:12])
            x = np.frombuffer(payload[12:], dtype=np.int16).astype(np.float64) / 32767
            nf = max(1, len(x) // self.frame)
            frames = x[: nf * self.frame].reshape(nf, self.frame)
            rms_out.append(float(np.sqrt((frames**2).mean())))
            zcr_out.append(float((np.diff(np.sign(x)) != 0).mean()))
            dur_out.append(n / sr)
        batch = batch.append_column("rms", pa.array(rms_out, type=pa.float64()))
        batch = batch.append_column("zcr", pa.array(zcr_out, type=pa.float64()))
        return batch.append_column("duration_sec", pa.array(dur_out, type=pa.float64()))


def decode_images(ds: Dataset, data_col: str = "data", concurrency: int = 2, batch_size: int = 64) -> Dataset:
    """Small batches: payload bytes dominate; batch_size × concurrency
    × payload must fit the worker heap."""
    return ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={"data_col": data_col},
        concurrency=concurrency,
        num_cpus=0.5,
        batch_size=batch_size,
        **_PYARROW,
    )


def resize_images(ds: Dataset, target: int = 64, data_col: str = "data", concurrency: int = 2, batch_size: int = 64) -> Dataset:
    return ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"target": target, "data_col": data_col},
        concurrency=concurrency,
        num_cpus=0.5,
        batch_size=batch_size,
        **_PYARROW,
    )


def audio_features(ds: Dataset, data_col: str = "data", concurrency: int = 2, batch_size: int = 64) -> Dataset:
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"data_col": data_col},
        concurrency=concurrency,
        num_cpus=0.5,
        batch_size=batch_size,
        **_PYARROW,
    )


def make_fake_video(n_frames: int, width: int = 32, height: int = 16, fps: int = 30, seed: int = 0) -> bytes:
    """Deterministic fake video payload: header + length-prefixed fake
    images (stands in for a container format the way FIMG stands in
    for JPEG)."""
    out = [_FAKE_VIDEO_MAGIC + struct.pack("<IH", n_frames, fps)]
    for i in range(n_frames):
        frame = make_fake_image(width, height, seed=seed * 10_007 + i)
        out.append(struct.pack("<I", len(frame)) + frame)
    return b"".join(out)


class VideoFrameSample:
    """Actor-pool frame sampler: emit every Nth frame of each video as
    its own row (video_id, frame_index, ts_sec, data) — the fan-out
    shape (one row in, many rows out) a real ffmpeg/pyav kernel would
    use. ``codec='fake'`` walks the FVID container; other codecs raise
    with the dependency named."""

    def __init__(self, data_col: str = "data", id_col: str = "video_id",
                 every_n: int = 30, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} needs a video library (ffmpeg/pyav) not present "
                "in this container"
            )
        self.data_col = data_col
        self.id_col = id_col
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, ts, frames = [], [], [], []
        for vid, payload in zip(
            batch[self.id_col].to_pylist(), batch[self.data_col].to_pylist()
        ):
            if payload is None or payload[:4] != _FAKE_VIDEO_MAGIC:
                continue
            n, fps = struct.unpack("<IH", payload[4:10])
            pos = 10
            for i in range(n):
                (flen,) = struct.unpack("<I", payload[pos : pos + 4])
                pos += 4
                if i % self.every_n == 0:
                    ids.append(vid)
                    idxs.append(i)
                    ts.append(i / fps)
                    frames.append(payload[pos : pos + flen])
                pos += flen
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_index": pa.array(idxs, type=pa.int32()),
                "ts_sec": pa.array(ts, type=pa.float64()),
                "data": pa.array(frames, type=pa.binary()),
            }
        )


def sample_video_frames(
    ds: Dataset,
    every_n: int = 30,
    data_col: str = "data",
    id_col: str = "video_id",
    concurrency: int = 2,
    batch_size: int = 8,
) -> Dataset:
    """Every-Nth-frame sampling: one row per sampled frame. TINY
    batches — a video payload is frames × image bytes, the largest
    payload class this module handles."""
    return ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={
            "data_col": data_col, "id_col": id_col, "every_n": every_n,
        },
        concurrency=concurrency,
        num_cpus=0.5,
        batch_size=batch_size,
        **_PYARROW,
    )
