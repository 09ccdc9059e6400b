"""Standalone driver-surface verification sweep (the /verify recipe).

Mirrors the grading driver: runs ``__ray_entry__.queries()[name](sf_dir)``
and compares against DuckDB running ``oracle_sql()[name]`` over the same
parquet views (row count + schema + order-insensitive value compare after
sorting columns by name and rounding floats).

    python BENCH/verify_driver.py                 # all queries at sf0.01
    python BENCH/verify_driver.py q1 minhash      # substring filters
    python BENCH/verify_driver.py --entry         # entry() smoke + CLI run

Owns its Ray session (library code never does).
"""

from __future__ import annotations

import json
import sys
import time
import warnings

warnings.filterwarnings("ignore")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(df):
    import numpy as np
    import pandas as pd

    if not isinstance(df, pd.DataFrame):
        try:
            df = df.to_pandas()
        except AttributeError:
            df = pd.DataFrame(df)
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = np.round(df[c].astype("float64"), 6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main(argv):
    filters = [a for a in argv if not a.startswith("--")]
    do_entry = "--entry" in argv

    import logging

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    sys.path.insert(0, "/root/repo")
    import duckdb
    import pandas as pd

    import __ray_entry__ as m

    if do_entry:
        t0 = time.time()
        out = m.entry()
        print(f"entry(): {len(out)} rows in {time.time() - t0:.1f}s, "
              f"cols={list(out.columns)}")
        ray.shutdown()
        return 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    qs = m.queries()
    oracles = m.oracle_sql()
    names = [n for n in qs
             if not filters or any(f in n for f in filters)]
    results = {}
    for name in names:
        t0 = time.time()
        try:
            got = qs[name](SF_DIR)
            wall = round(time.time() - t0, 1)
            if name not in oracles:
                n = len(got) if hasattr(got, "__len__") else got.count()
                results[name] = ("rows_only", wall, int(n))
                print(name, results[name], flush=True)
                continue
            want = con.execute(oracles[name]).df()
            g, w = _norm(got), _norm(want)
            if list(g.columns) != list(w.columns):
                results[name] = ("SCHEMA_MISMATCH", wall,
                                 list(g.columns), list(w.columns))
            elif len(g) != len(w):
                results[name] = ("ROWS_MISMATCH", wall, len(g), len(w))
            elif not g.equals(w):
                neq = int((~(g == w).all(axis=1)).sum()) \
                    if len(g) else 0
                results[name] = ("VALUE_MISMATCH", wall, neq)
            else:
                results[name] = ("PASS", wall, len(g))
        except Exception as e:  # noqa: BLE001 — sweep must not die mid-run
            results[name] = ("ERROR", round(time.time() - t0, 1),
                             f"{type(e).__name__}: {e}"[:200])
        print(name, results[name], flush=True)
    bad = {k: v for k, v in results.items()
           if v[0] not in ("PASS", "rows_only")}
    n_pass = sum(1 for v in results.values() if v[0] == "PASS")
    n_rows = sum(1 for v in results.values() if v[0] == "rows_only")
    print(json.dumps({"pass": n_pass, "rows_only": n_rows,
                      "failed": len(bad), "bad": list(bad)}))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
