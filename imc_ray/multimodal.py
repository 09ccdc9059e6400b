"""Multimodal (image/audio/video) column plumbing.

Decode is REAL for uncompressed containers — implemented from the public
file-format specs in pure NumPy, no codec libraries needed:

* **BMP** (24-bit uncompressed BI_RGB, bottom-up, BGR, 4-byte row padding)
  — :func:`encode_bmp` / :func:`decode_bmp`
* **WAV** (RIFF PCM 16-bit mono) — :func:`encode_wav` / :func:`decode_wav`
* **video** — a concatenated-BMP frame container (each BMP carries its own
  file size in the header, so frames split by real header parsing)

and the decoded-domain operators are real too: nearest-neighbor resize on
pixel arrays, header-parsed frame sampling, channel-statistics + luminance-
histogram image features and RMS/zero-crossing audio features.

COMPRESSED codecs (JPEG/PNG/MP4/Opus…) are genuinely absent from this
container, so those formats route to clearly-marked ``NotImplementedError``
stubs (`_decode_real` etc.), and the byte-level ``fake_*`` stand-ins remain
for opaque payloads.  The Ray-side plumbing — schema, batch size, actor
signature, 1-row→n-frames flat-map, output layout — is identical for all
three paths and is what the pipeline exercises.

The ``html`` binary column of the pages corpus doubles as the opaque payload
for tests of the stub path; :func:`synth_media` generates REAL BMP/WAV/video
payloads deterministically for the decode path.
"""

from __future__ import annotations

import struct

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


# ---------------------------------------------------------------------------
# REAL pure-numpy codecs for uncompressed containers (public format specs)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP bytes (BITMAPINFOHEADER,
    bottom-up rows, BGR byte order, rows padded to 4 bytes — the classic
    Windows DIB layout)."""
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = np.zeros((h, row + pad), dtype=np.uint8)
    body[:, :row] = img[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    data = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp, comp = struct.unpack_from("<HI", payload, 28)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    body = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=off).reshape(h, stride)[:, :row]
    img = body.reshape(h, w, 3)[:, :, ::-1]           # BGR → RGB
    return img[::-1] if flip else img


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM 16-bit mono bytes → (sample_rate, int16 samples) by
    real chunk walking (fmt may be followed by LIST/fact chunks)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            tag, ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8)
            if tag != 1 or ch != 1 or bits != 16:
                raise NotImplementedError("only PCM 16-bit mono supported")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2",
                                    count=size // 2, offset=pos + 8)
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return int(rate), samples


def split_bmp_frames(payload: bytes) -> list[bytes]:
    """Concatenated-BMP video container → frame payloads, by parsing each
    BMP's declared file size out of its own header (real demuxing)."""
    frames, pos = [], 0
    while pos + 6 <= len(payload):
        if payload[pos:pos + 2] != b"BM":
            raise ValueError(f"bad frame magic at offset {pos}")
        size = struct.unpack_from("<I", payload, pos + 2)[0]
        # a corrupt size below the 54-byte header floor would stall the
        # walk (size 0 never advances) or split garbage — fail loudly
        if size < 54 or pos + size > len(payload):
            raise ValueError(f"bad frame size {size} at offset {pos}")
        frames.append(payload[pos:pos + size])
        pos += size
    return frames


def nearest_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize of an (H, W, 3) array — integer
    index mapping ``src = floor(dst · S/D)``, the standard NN formula."""
    h, w = img.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return img[yi][:, xi]


def _decode_real(payload: bytes, media_type: str):
    """Compressed-codec decode hook — JPEG/PNG/MP4-class codecs are absent
    from this environment; uncompressed BMP/WAV route through the REAL
    pure-numpy decoders above instead."""
    raise NotImplementedError(
        "compressed media codecs are not available in this environment; "
        "BMP/WAV payloads decode via decode_bmp/decode_wav"
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


def image_features(img: np.ndarray) -> np.ndarray:
    """Decoded-domain image features: per-channel mean+std (6) + 12-bin
    luminance histogram (L1-normed) — FEATURE_DIM floats."""
    f = img.astype(np.float64)
    lum = f.mean(axis=2)
    hist = np.histogram(lum, bins=12, range=(0.0, 256.0))[0].astype(np.float64)
    hist = hist / max(hist.sum(), 1.0)
    out = np.concatenate([f.mean(axis=(0, 1)) / 255.0,
                          f.std(axis=(0, 1)) / 255.0, hist])
    return out.astype(np.float32)


def audio_features(rate: int, samples: np.ndarray) -> np.ndarray:
    """Decoded-domain audio features: RMS, zero-crossing rate, log duration
    + 15-bin absolute-amplitude histogram — FEATURE_DIM floats."""
    s = samples.astype(np.float64) / 32768.0
    if len(s) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    rms = float(np.sqrt((s * s).mean()))
    zcr = float((np.signbit(s[1:]) != np.signbit(s[:-1])).mean()) if len(s) > 1 else 0.0
    hist = np.histogram(np.abs(s), bins=15, range=(0.0, 1.0))[0].astype(np.float64)
    hist = hist / max(hist.sum(), 1.0)
    out = np.concatenate([[rms, zcr, np.log1p(len(s) / rate)], hist])
    return out.astype(np.float32)


def real_features(payload: bytes) -> np.ndarray:
    """REAL decode → features, routed by container magic: BMP (and
    concatenated-BMP video — the header-declared size bounds the first
    frame) → image features; RIFF/WAVE → audio features; anything else is
    a compressed format this environment cannot decode (stub raises)."""
    if payload[:2] == b"BM":
        return image_features(decode_bmp(payload))
    if payload[:4] == b"RIFF":
        return audio_features(*decode_wav(payload))
    return _decode_real(payload, "unknown")


class MediaFeaturizer:
    """Actor-pool decode/feature stage.  ``use_stub=False`` routes through
    the REAL pure-numpy decoders (BMP/WAV/concatenated-BMP); compressed
    formats raise the documented stub error."""

    def __init__(self, use_stub: bool = True):
        self.use_stub = use_stub
        # a compressed-codec impl would load the codec/model here, once
        # per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            if self.use_stub:
                feats.append(fake_features(payload or b""))
            else:
                feats.append(real_features(payload or b""))
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
                    batch_size: int = 256,
                    use_stub: bool = True) -> ray.data.Dataset:
    """Media Dataset (MEDIA_SCHEMA-like, needs media_id+payload) → features.
    Small batch size: payloads are fat binary rows (SURVEY guide: size
    batch × concurrency to worker heap)."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_args=(use_stub,),
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
                # REAL path: decode BMP → nearest-neighbor resize on the
                # pixel array → re-encode (compressed formats raise)
                if (payload or b"")[:2] != b"BM":
                    out.append(_resize_real(payload, self.width, self.height))
                else:
                    out.append(encode_bmp(nearest_resize(
                        decode_bmp(payload), self.width, self.height)))
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
                 concurrency=(1, 4), batch_size: int = 256,
                 use_stub: bool = True) -> ray.data.Dataset:
    """Media Dataset → fixed-size payloads (actor pool; small batches —
    payload rows are fat).  ``use_stub=False`` = REAL BMP decode→NN-resize→
    re-encode."""
    return ds.map_batches(MediaResizer,
                          fn_constructor_args=(width, height, use_stub),
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
            if self.use_stub:
                fs = fake_frame_sample(payload or b"", self.n_frames)
            elif (payload or b"")[:2] == b"BM":
                # REAL path: demux the concatenated-BMP container by header
                # sizes, then sample n_frames evenly across the timeline
                all_f = split_bmp_frames(payload)
                take = np.unique(np.linspace(0, len(all_f) - 1,
                                             min(self.n_frames, len(all_f)))
                                 .astype(int))
                fs = [all_f[i] for i in take]
            else:
                fs = _frame_sample_real(payload, self.n_frames)
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
                  concurrency=(1, 4), batch_size: int = 128,
                  use_stub: bool = True) -> ray.data.Dataset:
    """Media Dataset → per-frame rows (n_frames × input rows); feed the
    result to :func:`featurize_media` for per-frame features.
    ``use_stub=False`` = REAL concatenated-BMP demuxing."""
    return ds.map_batches(FrameSampler,
                          fn_constructor_args=(n_frames, use_stub),
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


def synth_media_table(ids: np.ndarray) -> pa.Table:
    """Deterministic REAL media payloads for the given integer ids — no RNG:
    id%3==0 → BMP image (gradient pattern keyed by id), 1 → WAV PCM clip
    (integer triangle wave, frequency keyed by id), 2 → 3-frame
    concatenated-BMP video.  Pure arithmetic → byte-identical across runs
    and partitionings."""
    rows = {"media_id": [], "payload": [], "media_type": [],
            "width": [], "height": [], "duration_ms": []}
    for i in ids.tolist():
        kind = i % 3
        if kind == 0:
            # shape varies by (i//3)%3 — i%3 is 0 by construction here, so
            # the modulus must be over the image SEQUENCE index; widths
            # 30/31/32 exercise all 4-byte row-padding cases (2/3/0)
            v = (i // 3) % 3
            h, w = 24 + v * 8, 30 + v
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([(xx * (3 + i % 5)) % 256,
                            (yy * (7 + i % 11)) % 256,
                            (xx + yy + i) % 256], axis=2).astype(np.uint8)
            rows["payload"].append(encode_bmp(img))
            rows["media_type"].append("image")
            rows["width"].append(w); rows["height"].append(h)
            rows["duration_ms"].append(0)
        elif kind == 1:
            n, rate = 1600 + (i % 7) * 160, 16000
            period = 20 + (i % 50)
            tri = np.abs((np.arange(n) % period) * 2 - period).astype(np.int64)
            samples = ((tri * 30000) // period - 15000).astype(np.int16)
            rows["payload"].append(encode_wav(samples, rate))
            rows["media_type"].append("audio")
            rows["width"].append(0); rows["height"].append(0)
            rows["duration_ms"].append(int(n * 1000 / rate))
        else:
            frames = []
            for f in range(3):
                yy, xx = np.mgrid[0:16, 0:16]
                img = np.stack([(xx * (f + 1) + i) % 256,
                                (yy + f * 40) % 256,
                                (xx ^ yy) % 256], axis=2).astype(np.uint8)
                frames.append(encode_bmp(img))
            rows["payload"].append(b"".join(frames))
            rows["media_type"].append("video")
            rows["width"].append(16); rows["height"].append(16)
            rows["duration_ms"].append(3000)
        rows["media_id"].append(f"media://{i}")
    return pa.table({
        "media_id": pa.array(rows["media_id"], type=pa.string()),
        "payload": pa.array(rows["payload"], type=pa.binary()),
        "media_type": pa.array(rows["media_type"], type=pa.string()),
        "width": pa.array(rows["width"], type=pa.int32()),
        "height": pa.array(rows["height"], type=pa.int32()),
        "duration_ms": pa.array(rows["duration_ms"], type=pa.int32()),
    })


def synth_media_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Media Dataset keyed by the documents table's doc_ids (so the corpus
    size tracks the sf scale) with REAL BMP/WAV/video payloads."""
    from .stages import read_table

    ids = read_table(sf_dir, "documents", columns=["doc_id"])

    def gen(t: pa.Table) -> pa.Table:
        return synth_media_table(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))

    return ids.map_batches(gen, batch_format="pyarrow", batch_size=512)


def media_decode_stats(sf_dir: str):
    """REAL-decode pipeline over the synthetic media corpus: every payload
    decodes through its actual container parser (BMP pixels / WAV samples /
    concatenated-BMP frames) inside an actor-pool stage, emitting verified
    decoded metadata per media row.  Rows-only driver check (binary decode
    is not SQL-expressible); decoded values are pytest-asserted against the
    encoders (round-trip identity)."""
    import pandas as pd

    ds = synth_media_from_documents(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        out = {"media_id": [], "kind": [], "n_bytes": [], "w": [], "h": [],
               "n_frames": [], "n_samples": [], "mean_val": []}
        for mid, payload, kind in zip(t["media_id"].to_pylist(),
                                      t["payload"].to_pylist(),
                                      t["media_type"].to_pylist()):
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["n_bytes"].append(len(payload))
            if kind == "audio":
                rate, samples = decode_wav(payload)
                out["w"].append(0); out["h"].append(0)
                out["n_frames"].append(0)
                out["n_samples"].append(len(samples))
                out["mean_val"].append(
                    float(np.abs(samples.astype(np.float64)).mean()))
            else:
                frames = split_bmp_frames(payload)
                img0 = decode_bmp(frames[0])
                out["w"].append(img0.shape[1]); out["h"].append(img0.shape[0])
                out["n_frames"].append(len(frames))
                out["n_samples"].append(0)
                out["mean_val"].append(float(img0.astype(np.float64).mean()))
        return pa.table({
            "media_id": pa.array(out["media_id"], type=pa.string()),
            "kind": pa.array(out["kind"], type=pa.string()),
            "n_bytes": pa.array(out["n_bytes"], type=pa.int64()),
            "w": pa.array(out["w"], type=pa.int64()),
            "h": pa.array(out["h"], type=pa.int64()),
            "n_frames": pa.array(out["n_frames"], type=pa.int64()),
            "n_samples": pa.array(out["n_samples"], type=pa.int64()),
            "mean_val": pa.array(out["mean_val"], type=pa.float64()),
        })

    out = (ds.map_batches(stats, batch_format="pyarrow", batch_size=512)
           .to_pandas())
    out["mean_val"] = np.round(out["mean_val"], 6)
    return out.sort_values("media_id").reset_index(drop=True)
