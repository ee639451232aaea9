"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside (the same layout the pages table uses for ``html``).
The Ray-side plumbing — schema, actor-pool signature, batch sizing for
large binaries, output layout — is real and tested; the actual codec
call is STUBBED (no image/audio libraries ship in this container):

- ``decode="strict"``  -> raises NotImplementedError at the codec line
  (the marked integration point for PIL/soundfile/av);
- ``decode="fake"``    -> a deterministic stand-in (blake2b-seeded
  pseudo-pixels / pseudo-frames) so downstream feature stages and
  tests exercise the full path with stable outputs.

Batch sizing: binary payloads make rows wide — callers should use a
small ``batch_size`` (e.g. 64) and let dynamic block splitting handle
the rest (SURVEY §7.4 "very wide records").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = [
    "MediaDecode",
    "MediaResize",
    "FrameSampler",
    "frame_sample",
    "resize_nn",
    "decode_stage",
    "resize_stage",
    "frame_sample_stage",
    "media_dedup_exact",
]


def media_dedup_exact(ds, id_col: str = "media_id", payload_col: str = "payload"):
    """Exact dedup over an opaque binary media column — no codec
    needed: two payloads are duplicates iff their sha256 digests are
    equal (hash-equality, not literal byte comparison — a deliberate
    trade so payload bytes never shuffle; sha256 keeps publicly known
    collision constructions, e.g. SHAttered-style sha1 pairs, out of
    reach), so this works on any media kind (image/audio/video) even
    where the decode stage is stubbed. The multimodal sibling of
    :func:`gleaner_ray.ops.dedup.exact_dedup` (reference analogue: the
    summoner's sha-identity dedup, internal/summoner/acquire/
    jsonutils.go:384-388, applied to payload bytes instead of JSON-LD
    text).

    NULL payloads hash as empty bytes — ``coalesce(payload, '')``
    semantics, matching the documented SQL equivalent — so NULL and
    b"" fall in one group. NULL ids are rejected with a ValueError
    naming the column (a silent NaN would corrupt the int64 min).

    Output: one row per distinct payload, ``(keeper, n_copies)`` with
    ``keeper`` the smallest id in the group — SQL-equivalent to
    ``SELECT min(id), count(*) GROUP BY coalesce(payload, '')``.

    Scale shape: payload bytes are hashed batch-locally (sha256 via
    zero-copy Arrow buffers — the payloads themselves never leave the
    map stage or shuffle) and pre-combined per batch, so the exchange
    carries one 64-byte digest row per distinct payload per batch; the
    reduce is a digest-keyed groupby with C-side Min/Sum combiners.
    Beyond ~10^8 distinct payloads, bucket the exchange by digest
    first byte first (the web_training_prep device) — documented seam,
    same as the text exact-dedup family."""
    import pyarrow as pa
    from ray.data.aggregate import Min, Sum

    _EMPTY_H = hashlib.sha256(b"").hexdigest()

    def partial(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {
                    "h": pd.Series(dtype=str),
                    "keeper": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        ids = t.column(id_col)
        if ids.null_count:
            raise ValueError(
                "media_dedup_exact: %d null value(s) in id column %r — "
                "ids must be non-null int64" % (ids.null_count, id_col)
            )
        pay = t.column(payload_col)
        hs = [
            hashlib.sha256(pay[i].as_buffer()).hexdigest() if pay[i].is_valid else _EMPTY_H
            for i in range(t.num_rows)
        ]
        df = pd.DataFrame(
            {"h": hs, "keeper": ids.to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("h", as_index=False).agg(keeper=("keeper", "min"), n=("keeper", "size"))
        return g.astype({"keeper": "int64", "n": "int64"})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("keeper", alias_name="keeper"), Sum("n", alias_name="n_copies"))
        .select_columns(["keeper", "n_copies"])
    )


class MediaDecode:
    """Actor-pool decode/feature stage for binary media columns.

    Output per row: fixed-size float32 feature vector + basic shape
    metadata. ``kind`` in {image, audio, video}; ``mode`` in
    {strict, fake}.
    """

    FEATURE_DIM = 32

    def __init__(self, kind: str = "image", mode: str = "fake", target_size: tuple = (64, 64)):
        if kind not in ("image", "audio", "video"):
            raise ValueError(kind)
        self.kind = kind
        self.mode = mode
        self.target_size = target_size

    # -- the stubbed codec boundary -----------------------------------------
    def _decode(self, payload: bytes) -> np.ndarray:
        if self.mode == "strict":
            # INTEGRATION POINT: PIL.Image.open / soundfile.read / av.open
            raise NotImplementedError(
                "no %s codec available in this environment; use mode='fake' "
                "or install the codec library" % self.kind
            )
        # deterministic fake decode: payload bytes -> seeded pseudo-signal
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        if self.kind == "image":
            return rng.integers(0, 256, size=(*self.target_size, 3)).astype(np.float32)
        if self.kind == "audio":
            return rng.standard_normal(16000).astype(np.float32)
        return rng.integers(0, 256, size=(8, *self.target_size, 3)).astype(np.float32)  # video: 8 frames

    def _features(self, decoded: np.ndarray) -> np.ndarray:
        flat = decoded.reshape(-1)
        chunks = np.array_split(flat, self.FEATURE_DIM)
        return np.array([c.mean() for c in chunks], dtype=np.float32)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats, shapes, n_bytes = [], [], []
        for payload in batch["payload"]:
            data = bytes(payload) if payload is not None else b""
            decoded = self._decode(data)
            feats.append(self._features(decoded))
            shapes.append("x".join(map(str, decoded.shape)))
            n_bytes.append(len(data))
        out = pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "kind": self.kind,
                "shape": shapes,
                "n_bytes": n_bytes,
                "features": feats,
            }
        )
        return out


def frame_sample(decoded_video: np.ndarray, every: int = 2) -> np.ndarray:
    """Deterministic frame sampling for video payloads."""
    return decoded_video[::every]


def resize_nn(img: np.ndarray, out_hw: tuple) -> np.ndarray:
    """Nearest-neighbor resize, fully vectorized (no codec needed — this
    is real work on the decoded array, index-gather in C)."""
    h, w = img.shape[:2]
    rows = np.clip(np.round(np.linspace(0, h - 1, out_hw[0])).astype(np.int64), 0, h - 1)
    cols = np.clip(np.round(np.linspace(0, w - 1, out_hw[1])).astype(np.int64), 0, w - 1)
    return img[rows][:, cols]


class MediaResize(MediaDecode):
    """Decode -> nearest-neighbor resize -> features. Same actor-pool
    contract as MediaDecode; only the codec line is stubbed — the
    resize itself is real vectorized numpy."""

    def __init__(self, mode: str = "fake", target_size: tuple = (64, 64), out_size: tuple = (32, 32)):
        super().__init__(kind="image", mode=mode, target_size=target_size)
        self.out_size = out_size

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats, shapes, n_bytes = [], [], []
        for payload in batch["payload"]:
            data = bytes(payload) if payload is not None else b""
            small = resize_nn(self._decode(data), self.out_size)
            feats.append(self._features(small))
            shapes.append("x".join(map(str, small.shape)))
            n_bytes.append(len(data))
        return pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "kind": self.kind,
                "shape": shapes,
                "n_bytes": n_bytes,
                "features": feats,
            }
        )


class FrameSampler(MediaDecode):
    """Decode video -> sample every k-th frame -> per-frame mean
    features. Output one row per payload with the sampled-frame count
    (wide-row guidance as MediaDecode)."""

    def __init__(self, mode: str = "fake", every: int = 2, target_size: tuple = (64, 64)):
        super().__init__(kind="video", mode=mode, target_size=target_size)
        self.every = every

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        shapes, n_frames, frame_means = [], [], []
        for payload in batch["payload"]:
            data = bytes(payload) if payload is not None else b""
            frames = frame_sample(self._decode(data), self.every)
            shapes.append("x".join(map(str, frames.shape)))
            n_frames.append(int(frames.shape[0]))
            frame_means.append(frames.reshape(frames.shape[0], -1).mean(axis=1).astype(np.float32))
        return pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "kind": self.kind,
                "shape": shapes,
                "n_frames": n_frames,
                "frame_means": frame_means,
            }
        )


def decode_stage(ds, kind: str = "image", mode: str = "fake", concurrency: int = 2, batch_size: int = 64):
    """Wire the decode actor pool with binary-friendly batch sizing."""
    return ds.map_batches(
        MediaDecode,
        fn_constructor_kwargs={"kind": kind, "mode": mode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_stage(ds, mode: str = "fake", out_size: tuple = (32, 32), concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        MediaResize,
        fn_constructor_kwargs={"mode": mode, "out_size": out_size},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_stage(ds, mode: str = "fake", every: int = 2, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"mode": mode, "every": every},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
