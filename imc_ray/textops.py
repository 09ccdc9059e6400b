"""Text-analysis and deduplication operators for a large-scale training-data
pipeline over the ``documents`` table (driver brief: dedup, language-ID,
quality scoring, token counting, fingerprinting).

All deterministic; vectorized per batch; the dedup family follows the
shingle→minhash→band→bucket-groupby pattern so the wide step shuffles only
(band, hash, doc_id) rows, never document text.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .geom import UnionFind
from .stages import read_table
from .util import round_half_away

# ---------------------------------------------------------------------------
# Fingerprinting — md5 content fingerprint + 64-bit rolling polynomial hash
# ---------------------------------------------------------------------------

_ROLL_BASE = np.uint64(1099511628211)


def rolling_hash64(text: str) -> int:
    """FNV-style rolling polynomial hash over utf-8 bytes (document
    fingerprint; deterministic, mergeable per chunk)."""
    h = np.uint64(14695981039346656037)
    for b in text.encode("utf-8"):
        h = np.uint64((int(h) ^ b) * int(_ROLL_BASE) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fingerprint_documents(sf_dir: str) -> pd.DataFrame:
    """(doc_id, md5 fingerprint, rolling 64-bit hash) per document."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        fps = [hashlib.md5(s.encode()).hexdigest() for s in texts]
        rolls = [rolling_hash64(s) >> 1 for s in texts]  # 63-bit for int64
        return pa.table({
            "doc_id": t["doc_id"],
            "fp": pa.array(fps, type=pa.string()),
            "roll64": pa.array(rolls, type=pa.int64()),
        })

    return (ds.map_batches(f, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Token counting + quality scoring (SQL-checkable definitions)
# ---------------------------------------------------------------------------

def quality_scores(sf_dir: str) -> pd.DataFrame:
    """Quality heuristics with SQL-mirrorable math:
    n_tokens (space-split), avg_token_len, quality = n_tokens/(n_tokens+100)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64()).to_numpy()
        n_tok = pc.cast(
            pc.add(pc.count_substring(t["text"], " "), pa.scalar(1)), pa.int64()
        ).to_numpy()
        avg_len = round_half_away((n_chars - (n_tok - 1)) / np.maximum(n_tok, 1), 4)
        quality = round_half_away(n_tok / (n_tok + 100.0), 4)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "avg_token_len": pa.array(avg_len),
            "quality": pa.array(quality),
        })

    return (ds.map_batches(f, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Language-ID — stopword/character heuristic (no SQL oracle; rows-only)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "for", "with", "data",
           "query", "select", "join", "table"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "für", "ein"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una"},
    "zh": set(),  # detected by CJK codepoints below
}


class LangId:
    """Stateful actor-pool stage: marker sets + regex compiled once per actor
    (SURVEY §2.3 pattern).  Scores whitespace tokens against per-language
    stopword sets; CJK codepoint ratio decides 'zh'.  Deterministic tie-break:
    lexicographically smallest top-scoring language, 'und' when no signal."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-ZäöüÄÖÜßáéíóúñ]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for text in batch["text"].to_pylist():
            cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
            if cjk > 5:
                preds.append("zh")
                continue
            toks = [w.lower() for w in self.word.findall(text[:2000])]
            if not toks:
                preds.append("und")
                continue
            scores = {
                lang: sum(1 for w in toks if w in markers)
                for lang, markers in _LANG_MARKERS.items() if markers
            }
            best = max(scores.values())
            if best == 0:
                preds.append("und")
            else:
                preds.append(min(l for l, s in scores.items() if s == best))
        return batch.append_column("pred_lang", pa.array(preds, type=pa.string()))


def lang_id_documents(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(LangId, batch_format="pyarrow", batch_size=2048,
                         concurrency=(1, 4), num_cpus=1).to_pandas()
    return (out[["doc_id", "pred_lang"]]
            .sort_values("doc_id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (shingle → minhash → band → bucket groupby)
# ---------------------------------------------------------------------------

_N_PERM = 64
_N_BANDS = 16  # 16 bands × 4 rows


def _perm_params(seed: int = 42):
    """Odd multipliers + offsets for the affine-mod-2^64 hash family —
    uint64 wraparound arithmetic keeps the signature fully vectorized."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 62, _N_PERM, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 62, _N_PERM, dtype=np.uint64)
    return a, b


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles hashed to 64-bit (blake2b-stable)."""
    toks = text.split(" ")
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(grams), dtype=np.int64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
        ) >> 3
    return out


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    sh = _shingles(text).astype(np.uint64)
    # (a*x + b) mod 2^64 per permutation, min over shingles — vectorized (P, S)
    vals = a[:, None] * sh[None, :] + b[:, None]
    return (vals.min(axis=1) >> np.uint64(1)).astype(np.int64)


class MinHasher:
    """Actor-pool stage: permutation parameters built once per actor; emits
    (band, band_hash, doc_id) rows — the only thing the LSH groupby shuffles."""

    def __init__(self, seed: int = 42):
        self.a, self.b = _perm_params(seed)
        self.rows_per_band = _N_PERM // _N_BANDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        bands, bhash, docs = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            sig = minhash_signature(text, self.a, self.b)
            for band in range(_N_BANDS):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                h = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                ) >> 1
                bands.append(band)
                bhash.append(h)
                docs.append(doc_id)
        return pa.table({
            "band": pa.array(bands, type=pa.int64()),
            "band_hash": pa.array(bhash, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        })


def _lsh_candidates(bands, star_only: bool) -> pd.DataFrame:
    """Candidate pairs from (band, band_hash) buckets.

    One coarse groupby over ``pkey = band_hash % 512`` with vectorized pandas
    bucket logic inside each group — NOT a map_groups per (band,hash) bucket,
    which costs one Python call per tiny group (measured 10× slower).
    ``star_only`` emits (min_doc, other) star pairs (enough for connected
    components); otherwise all within-bucket pairs."""
    import pyarrow.compute as _pc

    def add_pkey(t: pa.Table) -> pa.Table:
        pk = _pc.cast(_pc.bit_wise_and(t["band_hash"], pa.scalar(511)), pa.int64())
        return t.append_column("pkey", pk)

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        g2 = (g.sort_values(["band", "band_hash", "doc_id"])
              .drop_duplicates(["band", "band_hash", "doc_id"]))
        if star_only:
            first = g2.groupby(["band", "band_hash"])["doc_id"].transform("min")
            mask = g2["doc_id"].to_numpy() != first.to_numpy()
            return pd.DataFrame({"a": first[mask].to_numpy(dtype="int64"),
                                 "b": g2["doc_id"][mask].to_numpy(dtype="int64")})
        m = g2.merge(g2, on=["band", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame({"a": m["doc_id_x"].to_numpy(dtype="int64"),
                             "b": m["doc_id_y"].to_numpy(dtype="int64")})

    cand = (bands.map_batches(add_pkey, batch_format="pyarrow")
            .groupby("pkey").map_groups(pairs_fn, batch_format="pandas")
            .to_pandas())
    if "a" not in cand.columns:  # empty result loses its schema
        cand = pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return cand.drop_duplicates()


def _verify_jaccard(ds, cand: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Exact shingle-Jaccard per candidate pair, distributed: only CANDIDATE
    documents' texts are fetched (broadcast id-set filter — never the whole
    corpus), then pairs verify in parallel ``map_batches`` over the pair
    list.  Returns pairs with jaccard ≥ threshold."""
    if len(cand) == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    need = set(int(x) for x in pd.concat([cand["a"], cand["b"]]).unique())
    need_ref = ray.put(need)

    def pick(t: pa.Table) -> pa.Table:
        ids = ray.get(need_ref)
        mask = pa.array([int(d) in ids for d in t["doc_id"].to_pylist()])
        return t.filter(mask)

    texts = (ds.map_batches(pick, batch_format="pyarrow").to_pandas()
             .set_index("doc_id")["text"])
    texts_ref = ray.put(texts)
    pairs_ds = ray.data.from_pandas(cand.reset_index(drop=True))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(texts_ref)
        out = {"a": [], "b": [], "jaccard": []}
        cache: dict = {}

        def sh(i):
            if i not in cache:
                cache[i] = set(_shingles(tx.loc[i]).tolist())
            return cache[i]

        for a, b in zip(df["a"], df["b"]):
            sa, sb = sh(int(a)), sh(int(b))
            jac = len(sa & sb) / max(len(sa | sb), 1)
            if jac >= threshold:
                out["a"].append(int(a))
                out["b"].append(int(b))
                out["jaccard"].append(round(float(jac), 4))
        return pd.DataFrame(out) if out["a"] else pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")})

    out = pairs_ds.map_batches(verify, batch_format="pandas").to_pandas()
    if "a" not in out.columns:
        out = pd.DataFrame({"a": pd.Series(dtype="int64"),
                            "b": pd.Series(dtype="int64"),
                            "jaccard": pd.Series(dtype="float64")})
    return out


def minhash_dedup(sf_dir: str, jaccard_threshold: float = 0.7) -> pd.DataFrame:
    """MinHash-LSH near-dup groups: shingle→minhash per batch (actor pool) →
    (band, band_hash) groupby → candidate pairs → exact shingle-Jaccard verify
    → connected components → (doc_id, dup_group = min doc_id in group).

    Docs with no near-dup get dup_group = their own id, so the output is one
    row per document (stable count for the rows-only check)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pyarrow", batch_size=2048,
                           concurrency=(1, 4), num_cpus=1)
    cand = _lsh_candidates(bands, star_only=True)

    verified = _verify_jaccard(ds, cand, jaccard_threshold)
    uf = UnionFind()
    for a, b in zip(verified["a"], verified["b"]):
        uf.union(int(a), int(b))
    all_ids = sorted(int(i) for i in ds.unique("doc_id"))
    groups = [uf.find(i) for i in all_ids]
    return pd.DataFrame({"doc_id": all_ids, "dup_group": groups})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (blake2b token hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split(" "):
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out >> 1  # 63-bit for int64


def simhash_documents(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        hs = [simhash64(s) for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(hs, type=pa.int64())})

    return (ds.map_batches(f, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity of candidate pairs (exact, over LSH candidates)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(sf_dir: str, min_jaccard: float = 0.2) -> pd.DataFrame:
    """Exact word-3-gram Jaccard for LSH candidate pairs ≥ threshold —
    the verify half of near-dup, exposed as its own operator."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pyarrow", batch_size=2048,
                           concurrency=(1, 4), num_cpus=1)
    cand = _lsh_candidates(bands, star_only=False)
    out = _verify_jaccard(ds, cand, min_jaccard)
    return out.sort_values(["a", "b"]).reset_index(drop=True)
