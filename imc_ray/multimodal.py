"""Multimodal (image/audio/video) column plumbing — STUBBED decode.

The container has no image/audio codecs, so per the driver brief the decode
step is a clearly-marked stub while the Ray-side plumbing — schema, batch
size, actor signature, output layout — is real and tested:

* media payloads are opaque ``binary`` columns with typed metadata
* decode/feature-extract runs as an actor-pool ``map_batches`` stage (codec
  "loaded" once per actor in ``__init__``)
* the deterministic fake feature extractor (byte histogram + length) stands
  in for a real CNN/fbank featurizer; swap ``_decode_real`` in when codecs
  exist

The ``html`` binary column of the pages corpus doubles as the opaque payload
for tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 18  # 16 histogram bins + length + entropy


def _decode_real(payload: bytes, media_type: str):
    """Real decode hook — requires PIL/ffmpeg-class codecs, absent here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "the deterministic fake featurizer below exercises the plumbing"
    )


def _resize_real(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize hook — requires codecs, absent here."""
    raise NotImplementedError("image codecs unavailable; see module docstring")


def _frame_sample_real(payload: bytes, every_ms: int) -> list:
    """Real video frame-sampling hook — requires codecs, absent here."""
    raise NotImplementedError("video codecs unavailable; see module docstring")


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resize: stride-samples the payload bytes to
    width*height bytes (keeps the actor/batch plumbing real)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = max(width * height, 1)
    if len(arr) == 0:
        return bytes(n)
    idx = (np.arange(n) * len(arr)) // n
    return arr[idx].tobytes()


def fake_frame_sample(payload: bytes, n_frames: int = 4) -> list:
    """Deterministic stand-in frame sampler: n_frames equal byte slices."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0 or n_frames < 1:
        return []
    bounds = np.linspace(0, len(arr), n_frames + 1).astype(int)
    return [arr[bounds[i]:bounds[i + 1]].tobytes() for i in range(n_frames)]


def fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in featurizer: 16-bin byte histogram (L1-normed)
    + log length + byte entropy.  Pure function of the payload bytes."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    p = hist / hist.sum()
    nz = p[p > 0]
    ent = float(-(nz * np.log2(nz)).sum())
    out = np.concatenate([p, [np.log1p(len(arr)), ent]])
    return out.astype(np.float32)


class MediaFeaturizer:
    """Actor-pool decode/feature stage.  ``use_stub=False`` routes to the
    real decoder (raises NotImplementedError here — see module docstring)."""

    def __init__(self, use_stub: bool = True):
        self.use_stub = use_stub
        # real impl would load the codec/model here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            if self.use_stub:
                feats.append(fake_features(payload or b""))
            else:
                feats.append(_decode_real(payload, "image"))
        cols = {
            "media_id": batch["media_id"],
            "feature": pa.array([f.tolist() for f in feats],
                                type=pa.list_(pa.float32())),
            "n_bytes": pa.array(
                [len(p or b"") for p in batch["payload"].to_pylist()],
                type=pa.int64(),
            ),
        }
        # frame attribution survives the featurize stage when present
        if "frame_idx" in batch.column_names:
            cols["frame_idx"] = batch["frame_idx"]
        return pa.table(cols)


def featurize_media(ds: ray.data.Dataset, concurrency=(1, 4),
                    batch_size: int = 256) -> ray.data.Dataset:
    """Media Dataset (MEDIA_SCHEMA-like, needs media_id+payload) → features.
    Small batch size: payloads are fat binary rows (SURVEY guide: size
    batch × concurrency to worker heap)."""
    return ds.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class MediaResizer:
    """Actor-pool resize stage (codec 'loaded' once per actor; stride-sample
    stub in this codec-less environment — see module docstring)."""

    def __init__(self, width: int, height: int, use_stub: bool = True):
        self.width, self.height = int(width), int(height)
        self.use_stub = use_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch["payload"].to_pylist():
            if self.use_stub:
                out.append(fake_resize(payload or b"", self.width, self.height))
            else:
                out.append(_resize_real(payload, self.width, self.height))
        # pass through every non-replaced column (frame_idx etc. — round-2
        # review: rebuilding the table dropped frame attribution in the
        # sample_frames → resize chain)
        t = batch
        for name, arr in (
            ("payload", pa.array(out, type=pa.binary())),
            ("width", pa.array([self.width] * batch.num_rows, type=pa.int32())),
            ("height", pa.array([self.height] * batch.num_rows, type=pa.int32())),
        ):
            if name in t.column_names:
                t = t.set_column(t.column_names.index(name), name, arr)
            else:
                t = t.append_column(name, arr)
        return t


def resize_media(ds: ray.data.Dataset, width: int, height: int,
                 concurrency=(1, 4), batch_size: int = 256) -> ray.data.Dataset:
    """Media Dataset → fixed-size payloads (actor pool; small batches —
    payload rows are fat)."""
    return ds.map_batches(MediaResizer, fn_constructor_args=(width, height),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


class FrameSampler:
    """Actor-pool video frame-sampling stage: one input row → n_frames output
    rows (flat-map shape), frame index carried alongside."""

    def __init__(self, n_frames: int = 4, use_stub: bool = True):
        self.n_frames = int(n_frames)
        self.use_stub = use_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, fidx = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            fs = (fake_frame_sample(payload or b"", self.n_frames)
                  if self.use_stub
                  else _frame_sample_real(payload, self.n_frames))
            for i, f in enumerate(fs):
                ids.append(mid)
                frames.append(f)
                fidx.append(i)
        return pa.table({
            "media_id": pa.array(ids, type=pa.string()),
            "frame_idx": pa.array(fidx, type=pa.int32()),
            "payload": pa.array(frames, type=pa.binary()),
        })


def sample_frames(ds: ray.data.Dataset, n_frames: int = 4,
                  concurrency=(1, 4), batch_size: int = 128) -> ray.data.Dataset:
    """Media Dataset → per-frame rows (n_frames × input rows); feed the
    result to :func:`featurize_media` for per-frame features."""
    return ds.map_batches(FrameSampler, fn_constructor_args=(n_frames,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def pages_as_media(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Adapter: pages html payloads as an opaque media table (test fixture)."""

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "media_id": t["url"],
                "payload": t["html"],
                "media_type": pa.array(["image"] * n, type=pa.string()),
                "width": pa.array([0] * n, type=pa.int32()),
                "height": pa.array([0] * n, type=pa.int32()),
                "duration_ms": pa.array([0] * n, type=pa.int32()),
            }
        )

    return pages.map_batches(f, batch_format="pyarrow")
