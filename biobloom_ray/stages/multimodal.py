"""Multimodal-column stages: opaque ``binary`` payloads + typed metadata.

The image/audio codec libraries are not available in this environment,
so the *decode* kernels are stubbed (clearly marked, deterministic fake
available for tests) while all the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested.  Swap
``FakeCodec`` for a real decoder (PIL / torchaudio / pyav) in
``DecodeActor.__init__`` and nothing else changes.

Pattern notes for 100 TB: binary payloads can be MBs per row, so these
stages run with a small ``batch_size`` and rely on Arrow
``large_binary`` columns; outputs drop the payload column as soon as the
features are extracted (``select_columns``) to keep downstream shuffle
payloads small.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class FakeCodec:
    """Deterministic stand-in decoder: payload bytes → fixed-size feature
    vector derived from a byte histogram.  NOT a real image/audio codec —
    replace with one where the libraries exist."""

    def __init__(self, feature_dim: int = 32):
        self.feature_dim = feature_dim

    def decode(self, payload: bytes) -> np.ndarray:
        if payload is None or len(payload) == 0:
            return np.zeros(self.feature_dim, dtype=np.float32)
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr % self.feature_dim, minlength=self.feature_dim)
        return (hist / max(len(arr), 1)).astype(np.float32)


class RealCodecUnavailable:
    """The honest stub: raises on use (codec libs absent here)."""

    def decode(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image/audio decode requires PIL/pyav/torchaudio, which are not "
            "installed in this environment; use FakeCodec for plumbing tests")


class DecodeFeatureActor:
    """Actor-pool stage: binary payload column → feature vector column.

    Codec construction happens ONCE per actor in __init__ (model-load
    analogue); __call__ handles one Arrow batch.  Run with e.g.
    ``map_batches(DecodeFeatureActor, fn_constructor_kwargs=...,
    batch_size=64, concurrency=8, num_cpus=1)`` — small batches because
    payloads are wide."""

    def __init__(self, payload_col: str = "payload", out_col: str = "features",
                 feature_dim: int = 32, use_fake: bool = True,
                 drop_payload: bool = True):
        self.codec = FakeCodec(feature_dim) if use_fake else RealCodecUnavailable()
        self.payload_col = payload_col
        self.out_col = out_col
        self.feature_dim = feature_dim
        self.drop_payload = drop_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        feats = np.stack([self.codec.decode(v) for v in col.to_pylist()])
        flat = pa.array(feats.reshape(-1), type=pa.float32())
        out = batch.append_column(
            self.out_col, pa.FixedSizeListArray.from_arrays(flat, self.feature_dim))
        if self.drop_payload:
            out = out.drop_columns([self.payload_col])
        return out


def frame_sample_plan(n_frames_col: np.ndarray, every: int) -> list[np.ndarray]:
    """Deterministic frame-sampling indices per row (video analogue):
    every ``every``-th frame.  Pure planning helper — decode itself is
    stubbed."""
    return [np.arange(0, int(n), every, dtype=np.int64) for n in n_frames_col]


class FrameSampleActor:
    """Actor-pool stage: opaque "video" payload → sampled per-frame
    feature rows (``flat_map`` shape: one input row explodes into one
    output row per sampled frame).

    The container parse is a deterministic fake (fixed frame size
    declared in metadata columns — a real pyav demuxer drops in at
    ``__init__``); the Ray-side contract is real: payload columns never
    outlive the stage, frame features travel as fixed-size lists, and
    ``(media_id, frame_idx)`` keys the output for downstream dedup /
    similarity over frames.
    """

    def __init__(self, payload_col: str = "payload",
                 n_frames_col: str = "n_frames", id_col: str = "media_id",
                 every: int = 2, feature_dim: int = 16):
        self.codec = FakeCodec(feature_dim)
        self.payload_col = payload_col
        self.n_frames_col = n_frames_col
        self.id_col = id_col
        self.every = every
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_frames = batch[self.n_frames_col].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_id, out_fi, feats = [], [], []
        for r in range(len(batch)):
            payload = col[r].as_py() or b""
            n = int(n_frames[r])
            if n <= 0:
                continue
            fsz = max(1, len(payload) // n)    # fake fixed-size frames
            for fi in frame_sample_plan(np.array([n]), self.every)[0]:
                frame = payload[int(fi) * fsz:(int(fi) + 1) * fsz]
                out_id.append(ids[r])
                out_fi.append(int(fi))
                feats.append(self.codec.decode(frame))
        if not feats:
            empty = pa.array([], type=pa.float32())
            return pa.table({
                self.id_col: pa.array([], type=pa.int64()),
                "frame_idx": pa.array([], type=pa.int64()),
                "features": pa.FixedSizeListArray.from_arrays(
                    empty, self.feature_dim),
            })
        f = np.stack(feats)
        flat = pa.array(f.reshape(-1), type=pa.float32())
        return pa.table({
            self.id_col: pa.array(np.asarray(out_id, dtype=np.int64)),
            "frame_idx": pa.array(np.asarray(out_fi, dtype=np.int64)),
            "features": pa.FixedSizeListArray.from_arrays(
                flat, self.feature_dim),
        })
