"""Page synthesis, text extraction and track parsing (SURVEY.md §2.1/§2.2).

Input model per BASELINE.json input_hint:
    pages(url, warc_ts, html, text, lang)
with trajectories embedded in ``text`` as TRACK lines (FIXTURES.md §A grammar):

    TRACK <k>: <lat>,<lon>,<iso_ts>; <lat>,<lon>,<iso_ts>; ...

Everything is a pure function of ``(seed, doc_index)`` — same bytes for any
Ray parallelism, batch size or run (never wall-clock, never global RNG).

The reference synthesized trajectories with a TrajectoryMaker-style module and
read its own trajectory files; this generator replaces it with the graft's
web-page shape (SURVEY §2.1 SRC3).  ``extract_text`` replaces an HTML
extractor: the generator and extractor are exact inverses, so the per-url
byte-identical invariant holds by construction and is asserted in tests.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

from . import geom

# corpus-wide projection anchor (M4) — graft-normative constant
ANCHOR_LAT = 37.0
ANCHOR_LON = -122.0
_EPOCH = datetime(2024, 1, 1)

# site grid: sites spaced ~2.2 km apart so coarse cells separate them
_SITE_STEP_DEG = 0.02
_SITE_COLS = 53

_WORDS = (
    "indoor map corridor sensor trace walk floor building survey page web "
    "crawl archive data pipeline cluster segment route signal beacon"
).split()


def _site_anchor(site: int):
    lat0 = ANCHOR_LAT + (site % _SITE_COLS) * _SITE_STEP_DEG
    lon0 = ANCHOR_LON + (site // _SITE_COLS) * _SITE_STEP_DEG
    return lat0, lon0


# corridor graph per site (local meters): an H corridor and a V corridor
_ROUTES = (
    ((0.0, 0.0), (80.0, 0.0)),
    ((80.0, 0.0), (0.0, 0.0)),
    ((0.0, 0.0), (40.0, 0.0), (40.0, 60.0)),
    ((40.0, 60.0), (40.0, 0.0), (80.0, 0.0)),
)


def _walk_route(rng: np.random.Generator, route) -> np.ndarray:
    """Sample points along a route polyline with ~constant step + noise."""
    wp = np.asarray(route, dtype=np.float64)
    d = np.diff(wp, axis=0)
    seg_len = np.hypot(d[:, 0], d[:, 1])
    total = float(seg_len.sum())
    step = 2.5 + rng.random() * 2.0  # 2.5..4.5 m → ≤ ~56 points
    s = np.arange(0.0, total + 1e-9, step)
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    k = np.clip(np.searchsorted(cum, s, side="right") - 1, 0, len(seg_len) - 1)
    f = (s - cum[k]) / np.maximum(seg_len[k], 1e-12)
    pts = wp[k] + d[k] * f[:, None]
    pts = pts + rng.normal(0.0, 0.8, size=pts.shape)
    return pts


def make_doc(idx: int, seed: int = 42, n_sites: int = 20) -> dict:
    """One deterministic page row.  ~10% duplicate urls (idx%10==9 clones the
    previous doc with a later warc_ts — dedup D1 fodder), ~30% zero tracks,
    ~2% malformed TRACK lines the parser must skip."""
    if idx % 10 == 9 and idx > 0:
        base = make_doc(idx - 1, seed, n_sites)
        base["warc_ts"] = _EPOCH + timedelta(minutes=idx)
        return base
    rng = np.random.Generator(np.random.PCG64(seed * (1 << 20) + idx))
    site = int(rng.integers(0, n_sites))
    lat0, lon0 = _site_anchor(site)
    lang = ("en", "en", "en", "de", "es", "zh")[idx % 6]
    url = f"https://example.org/site{site}/page{idx}"
    n_words = int(rng.integers(8, 30))
    prose = " ".join(_WORDS[int(w)] for w in rng.integers(0, len(_WORDS), n_words))
    lines = [prose]
    if rng.random() >= 0.3:
        n_tracks = int(rng.integers(1, 4))
        t0 = _EPOCH + timedelta(minutes=idx)
        for k in range(n_tracks):
            route = _ROUTES[int(rng.integers(0, len(_ROUTES)))]
            pts = _walk_route(rng, route)
            lat, lon = geom.unproject_xy(pts[:, 0], pts[:, 1], lat0, lon0)
            # vectorized point formatting (byte-identical to the former
            # per-point f-string/strftime loop: C printf %.6f + ISO-second
            # datetime_as_string — the generator dominated bench walls)
            ts = np.datetime_as_string(
                np.datetime64(t0, "s")
                + np.arange(len(lat)).astype("timedelta64[s]"), unit="s")
            parts = np.char.add(np.char.add(
                np.char.mod("%.6f,", lat), np.char.mod("%.6f,", lon)), ts)
            line = f"TRACK {k}: " + "; ".join(parts.tolist())
            if rng.random() < 0.02:
                line = line.replace(",", "", 1)  # malformed: parser skips it
            lines.append(line)
    text = "\n".join(lines)
    return {
        "url": url,
        "warc_ts": _EPOCH + timedelta(minutes=idx),
        "html": render_html(text),
        "text": text,
        "lang": lang,
    }


# ---------------------------------------------------------------------------
# HTML render / extract (M1) — exact inverses, byte-identical per url
# ---------------------------------------------------------------------------

def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unescape(s: str) -> str:
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def render_html(text: str) -> bytes:
    body = "".join(f"<p>{_escape(line)}</p>" for line in text.split("\n"))
    return (f"<html><body>{body}</body></html>").encode("utf-8")


_P_RE = re.compile(r"<p>(.*?)</p>")


def extract_text(html: bytes) -> str:
    """Deterministic HTML → text: one line per <p>, entities decoded.
    Byte-identical per url across runs and batch sizes (the north-rule
    invariant, BASELINE.json input_hint)."""
    s = html.decode("utf-8", errors="replace")
    return "\n".join(_unescape(m) for m in _P_RE.findall(s))


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """M1 as a stateless map_batches body (pyarrow in/out, SURVEY §2.2)."""
    texts = [extract_text(h.as_py()) for h in batch["html"]]
    return pa.table(
        {
            "url": batch["url"],
            "text": pa.array(texts, type=pa.large_string()),
            "lang": batch["lang"],
        }
    )


# ---------------------------------------------------------------------------
# Track parsing (M2) → points with projected x/y
# ---------------------------------------------------------------------------

_TRACK_RE = re.compile(r"^TRACK (\d+): (.+)$")
_PT_RE = re.compile(
    r"^(-?\d+\.\d{6}),(-?\d+\.\d{6}),(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})$"
)


def parse_tracks(url: str, text: str, with_ts: bool = True):
    """Parse TRACK lines → list of (traj_id, lat[], lon[], ts[]).  A line with
    any malformed point is skipped entirely (deterministic).  Tracks need ≥ 2
    valid points.  ``with_ts=False`` skips timestamp materialization (the
    geometry stages don't use it — parsing datetimes per point is the single
    hottest part of a full parse)."""
    out = []
    for line in text.split("\n"):
        m = _TRACK_RE.match(line)
        if not m:
            continue
        k, rest = m.group(1), m.group(2)
        lats, lons, tss = [], [], []
        ok = True
        for piece in rest.split("; "):
            pm = _PT_RE.match(piece)
            if not pm:
                ok = False
                break
            lats.append(float(pm.group(1)))
            lons.append(float(pm.group(2)))
            tss.append(pm.group(3))
        if ok and len(lats) >= 2:
            ts_arr = (np.asarray(tss, dtype="datetime64[s]").astype("datetime64[us]")
                      if with_ts else None)
            out.append((f"{url}#{k}", np.asarray(lats), np.asarray(lons), ts_arr))
    return out


def list_flat(arr) -> tuple:
    """ListArray → ``(values, offsets)`` with offsets normalized to start at
    0 and ``values`` sliced to exactly the covered range, so callers may zip
    offsets positionally against the flat child (a sliced/offset ListArray
    would otherwise silently misalign — round-4 advice item)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.values
    if offs[0] != 0 or len(vals) != offs[-1]:
        vals = vals.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
    return vals, offs


# RE2 forms of the line/point grammar (named groups for pc.extract_regex).
# Lines carry no embedded newlines (they come from a "\n" split), so RE2's
# end-of-text ``$`` is equivalent to Python re's end-of-line ``$`` here.
_TRACK_PAT = r"^TRACK (?P<k>\d+): (?P<rest>.+)$"
_PT_PAT = (r"^(?P<lat>-?\d+\.\d{6}),(?P<lon>-?\d+\.\d{6}),"
           r"(?P<ts>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})$")


def parse_tracks_flat(urls, texts, with_ts: bool = True):
    """Vectorized M2 for a whole batch: ONE Arrow newline split + ONE RE2
    ``extract_regex`` pass over every line + ONE over every point — the
    batch-grammar replacement for the per-page :func:`parse_tracks` loop
    that dominated the flagship's parse stage (round-4 verdict item 1).
    Accept/reject semantics are identical to :func:`parse_tracks` (asserted
    against it in tests/test_extract.py): a track with any malformed point
    is dropped whole; survivors need ≥ 2 points.

    Returns ``(traj_id, offsets, lat, lon, ts)``: ``traj_id`` object ndarray
    (n_tracks,), ``offsets`` int64 (n_tracks+1,) indexing the flat point
    arrays ``lat``/``lon`` (and ``ts`` datetime64[us] when ``with_ts``).
    """
    pc = pa.compute
    empty = (np.empty(0, dtype=object), np.zeros(1, dtype=np.int64),
             np.empty(0, dtype=np.float64), np.empty(0, dtype=np.float64),
             np.empty(0, dtype="datetime64[us]") if with_ts else None)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if len(texts) == 0:
        return empty
    lines, loffs = list_flat(pc.split_pattern(texts, "\n"))
    if len(lines) == 0:
        return empty
    tm = pc.extract_regex(lines, _TRACK_PAT)
    tvalid = pc.is_valid(tm).to_numpy(zero_copy_only=False)
    if not tvalid.any():
        return empty
    line_doc = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(loffs))
    tm = tm.filter(pa.array(tvalid))
    track_doc = line_doc[tvalid]
    pts, poffs = list_flat(pc.split_pattern(pc.struct_field(tm, "rest"), "; "))
    counts = np.diff(poffs)  # rest matches ".+" → every track has ≥ 1 piece
    pm = pc.extract_regex(pts, _PT_PAT)
    pvalid = pc.is_valid(pm).to_numpy(zero_copy_only=False)
    ok = (np.add.reduceat(pvalid, poffs[:-1]) == counts) & (counts >= 2)
    if not ok.any():
        return empty
    pm = pm.filter(pa.array(np.repeat(ok, counts)))
    lat = pc.struct_field(pm, "lat").cast(pa.float64()).to_numpy()
    lon = pc.struct_field(pm, "lon").cast(pa.float64()).to_numpy()
    ts = None
    if with_ts:
        ts = pc.strptime(pc.struct_field(pm, "ts"),
                         format="%Y-%m-%dT%H:%M:%S",
                         unit="us").to_numpy(zero_copy_only=False)
    sel = pa.array(ok)
    traj = pc.binary_join_element_wise(
        urls.take(pa.array(track_doc[ok])).cast(pa.large_string()),
        pc.struct_field(tm, "k").filter(sel).cast(pa.large_string()),
        pa.scalar("#", type=pa.large_string())).to_pandas().to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts[ok])]).astype(np.int64)
    return traj, offsets, lat, lon, ts


def parse_tracks_batch(batch: pa.Table) -> pa.Table:
    """M2+M4 fused: pages text → exploded points with projected planar meters.
    Emits the POINTS schema; ``seq`` preserves per-trajectory order explicitly
    (Ray Data block order is never relied on — SURVEY §2.10).  Runs the
    batch-vectorized grammar (:func:`parse_tracks_flat`)."""
    traj, offs, lat, lon, ts = parse_tracks_flat(batch["url"], batch["text"])
    if len(traj) == 0:
        return pa.table(
            {
                "traj_id": pa.array([], type=pa.string()),
                "seq": pa.array([], type=pa.int32()),
                "x": pa.array([], type=pa.float64()),
                "y": pa.array([], type=pa.float64()),
                "t": pa.array([], type=pa.timestamp("us")),
            }
        )
    x, y = geom.project_xy(lat, lon, ANCHOR_LAT, ANCHOR_LON)
    counts = np.diff(offs)
    seq = np.arange(len(x), dtype=np.int64) - np.repeat(offs[:-1], counts)
    return pa.table(
        {
            "traj_id": pa.array(np.repeat(traj, counts).tolist(),
                                type=pa.string()),
            "seq": pa.array(seq.astype(np.int32), type=pa.int32()),
            "x": pa.array(x, type=pa.float64()),
            "y": pa.array(y, type=pa.float64()),
            "t": pa.array(ts, type=pa.timestamp("us")),
        }
    )


# ---------------------------------------------------------------------------
# Pages-table constructors
# ---------------------------------------------------------------------------

def synth_pages_table(n_docs: int, seed: int = 42, start: int = 0,
                      n_sites: int = 20) -> pa.Table:
    """Materialize pages [start, start+n_docs) as one Arrow table — the
    per-batch body of the distributed generator (stages.synth_pages)."""
    rows = [make_doc(i, seed, n_sites) for i in range(start, start + n_docs)]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], type=pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], type=pa.binary()),
            "text": pa.array([r["text"] for r in rows], type=pa.large_string()),
            "lang": pa.array([r["lang"] for r in rows], type=pa.string()),
        }
    )


def pages_from_documents_batch(batch: pa.Table, seed: int = 42,
                               n_sites: int = 20) -> pa.Table:
    """Build pages rows from the driver's ``documents`` table (TESTDATA.md):
    each document becomes a crawled page whose text is the document text plus
    deterministic TRACK lines derived from ``doc_id`` — ties entry()/bench to
    /root/testdata without external data."""
    doc_ids = batch["doc_id"].to_pylist()
    doc_texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    urls, wts, htmls, texts = [], [], [], []
    for doc_id, dtext, src in zip(doc_ids, doc_texts, sources):
        synth = make_doc(int(doc_id), seed, n_sites)
        # prose from the real document (single line), tracks from the generator
        track_lines = synth["text"].split("\n")[1:]
        text = "\n".join([dtext.replace("\n", " ")] + track_lines)
        urls.append(f"https://docs.example/{src}/{doc_id}")
        wts.append(_EPOCH + timedelta(minutes=int(doc_id)))
        htmls.append(render_html(text))
        texts.append(text)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(wts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.large_string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
