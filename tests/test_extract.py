"""M1/M2 extraction tests — the byte-identical per-url invariant
(BASELINE.json input_hint) and parser determinism (SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa

from imc_ray import extract


class TestByteIdentity:
    def test_render_extract_inverse(self):
        for idx in range(0, 120, 7):
            d = extract.make_doc(idx)
            assert extract.extract_text(d["html"]) == d["text"]

    def test_entities_roundtrip(self):
        text = "a < b & c > d\nsecond & line"
        assert extract.extract_text(extract.render_html(text)) == text

    def test_batch_size_invariance(self):
        t = extract.synth_pages_table(40, seed=42)
        full = extract.extract_text_batch(t)["text"].to_pylist()
        parts = []
        for lo in range(0, 40, 7):
            parts += extract.extract_text_batch(t.slice(lo, 7))["text"].to_pylist()
        assert full == parts

    def test_generator_deterministic(self):
        a = extract.synth_pages_table(30, seed=42)
        b = extract.synth_pages_table(30, seed=42)
        assert a.equals(b)
        c = extract.synth_pages_table(30, seed=43)
        assert not a["text"].equals(c["text"])

    def test_duplicate_urls_present(self):
        t = extract.synth_pages_table(100, seed=42)
        urls = t["url"].to_pylist()
        assert len(set(urls)) < len(urls)  # ~10% dup-url rows for D1


class TestParser:
    def test_parse_basic(self):
        d = extract.make_doc(3)  # known to contain ≥1 track
        tracks = extract.parse_tracks(d["url"], d["text"])
        assert tracks
        traj_id, lat, lon, ts = tracks[0]
        assert traj_id.startswith(d["url"] + "#")
        assert len(lat) >= 2 and len(lat) == len(lon) == len(ts)
        assert 36.0 < lat.mean() < 40.0

    def test_malformed_line_skipped(self):
        text = "prose here\nTRACK 0: 37.000000-122.000000,2024-01-01T00:00:00"
        assert extract.parse_tracks("u", text) == []

    def test_malformed_point_kills_whole_track(self):
        good = "37.000000,-122.000000,2024-01-01T00:00:00"
        bad = "37.0,-122.0,2024-01-01T00:00:00"  # not 6 decimals
        text = f"TRACK 0: {good}; {bad}; {good}"
        assert extract.parse_tracks("u", text) == []

    def test_single_point_track_dropped(self):
        text = "TRACK 0: 37.000000,-122.000000,2024-01-01T00:00:00"
        assert extract.parse_tracks("u", text) == []

    def test_parse_tracks_batch_schema(self):
        t = extract.synth_pages_table(20, seed=42)
        ext = extract.extract_text_batch(t)
        pts = extract.parse_tracks_batch(ext)
        assert pts.column_names == ["traj_id", "seq", "x", "y", "t"]
        assert pts.num_rows > 0
        # seq restarts at 0 per trajectory
        df = pts.to_pandas()
        assert (df.groupby("traj_id")["seq"].min() == 0).all()

    def test_empty_batch(self):
        t = extract.synth_pages_table(1, seed=42).slice(0, 0)
        ext = extract.extract_text_batch(t)
        assert extract.parse_tracks_batch(ext).num_rows == 0


class TestPagesFromDocuments:
    def test_deterministic_and_parquet_compatible(self):
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": ["hello world doc", "another document text"],
                "lang": ["en", "de"],
                "source": ["src1", "src2"],
                "n_chars": pa.array([15, 21], type=pa.int64()),
            }
        )
        a = extract.pages_from_documents_batch(docs)
        b = extract.pages_from_documents_batch(docs)
        assert a.equals(b)
        assert extract.extract_text(a["html"][0].as_py()) == a["text"][0].as_py()
