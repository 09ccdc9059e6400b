"""Driver-mirror test: every SQL-backed queries() entry must match its
oracle_sql() via DuckDB at sf0.001 — row count, column names, and
order-insensitive values (the same compare the driver runs at sf0.01)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


SQL_KEYS = None


def test_sql_backed_queries_match_duckdb(entry_mod, con):
    queries = entry_mod.queries()
    oracle = entry_mod.oracle_sql()
    assert set(oracle) <= set(queries)
    failures = []
    for name, sql in oracle.items():
        got = _norm(_to_pandas(queries[name](SF_DIR)))
        want = _norm(con.execute(sql).df())
        if list(got.columns) != list(want.columns):
            failures.append(f"{name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if a.dtype.kind == "f":
                ok = np.allclose(a, b, atol=1e-6, equal_nan=True)
            else:
                ok = (a == b).all()
            if not ok:
                bad = int((a != b).sum()) if a.dtype.kind != "f" else int(
                    (~np.isclose(a, b, atol=1e-6, equal_nan=True)).sum())
                failures.append(f"{name}: column {c} differs in {bad} rows")
    assert not failures, "\n".join(failures)


def test_rows_only_queries_run(entry_mod):
    """Every queries() entry without an oracle must still run and return a
    stable non-degenerate shape at sf0.001."""
    queries = entry_mod.queries()
    oracle = entry_mod.oracle_sql()
    for name in set(queries) - set(oracle):
        if name.startswith("geo_") or name == "media_features":
            continue  # exercised in test_entry_geo (pipeline cache)
        df = _to_pandas(queries[name](SF_DIR))
        assert len(df.columns) > 0, name
        assert len(df) >= 0, name


def test_entry_geo(entry_mod):
    out = entry_mod.entry()
    assert isinstance(out, pd.DataFrame)
    assert list(out.columns) == ["tile_id", "cluster_id", "frac"]
    assert len(out) > 0
    queries = entry_mod.queries()
    for name in ("geo_segments", "geo_labels", "geo_representatives",
                 "geo_tiles", "geo_tile_cluster", "media_features"):
        df = _to_pandas(queries[name](SF_DIR))
        assert len(df) > 0, name


def test_geo_matches_numpy_oracle(entry_mod):
    """The documents-derived corpus at sf0.001 must also match the NumPy
    oracle exactly (second corpus shape beyond the synth_pages goldens)."""
    import pyarrow.parquet as pq

    from imc_ray import extract, oracle

    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    pages = extract.pages_from_documents_batch(docs)
    gold = oracle.run(pages)
    eng_labels = entry_mod.queries()["geo_labels"](SF_DIR)
    gl = gold["labels"].sort_values("seg_id").reset_index(drop=True)
    assert len(eng_labels) == len(gl)
    m = eng_labels.merge(gl, on="seg_id", suffixes=("_e", "_g"))
    assert int((m.cluster_id_e != m.cluster_id_g).sum()) == 0
    etc = entry_mod.queries()["geo_tile_cluster"](SF_DIR)
    gtc = gold["tile_cluster"].sort_values(
        ["tile_id", "cluster_id"]).reset_index(drop=True)
    assert etc.reset_index(drop=True).equals(gtc)


def test_knn_query_shape(entry_mod):
    df = entry_mod.queries()["geo_knn"](SF_DIR)
    assert list(df.columns) == ["seg_id", "nbr_id", "rank", "dist"]
    assert len(df) > 0
    assert (df.groupby("seg_id")["rank"].max() <= 2).all()
    assert (df["dist"] >= 0).all()
