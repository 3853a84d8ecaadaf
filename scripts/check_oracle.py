"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares it
with the DuckDB oracle: row count, column names (sorted), and values
(rows sorted, floats rounded). Usage:

    python scripts/check_oracle.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main():
    from geocube_spark.operators import all_queries
    from geocube_spark.session import get_spark

    args = sys.argv[1:]
    include_extra = "--extra" in args
    if include_extra:
        args.remove("--extra")

    spark = get_spark(app="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    reg = all_queries(include_extra=include_extra)
    qs = {name: fn for name, (fn, _sql) in reg.items()}
    oracles = {
        name: sql for name, (_fn, sql) in reg.items() if sql is not None
    }
    only = set(args)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        want = con.execute(oracles[name]).df()
        g, w = normalize(got), normalize(want)
        status = []
        if len(g) != len(w):
            status.append(f"rowcount {len(g)} != {len(w)}")
        elif list(g.columns) != list(w.columns):
            status.append(f"cols {list(g.columns)} != {list(w.columns)}")
        else:
            for c in g.columns:
                a, b = g[c].values, w[c].values
                if pd.api.types.is_float_dtype(g[c]):
                    bad = ~(
                        np.isclose(a.astype(float), b.astype(float),
                                   rtol=1e-6, atol=1e-6)
                        | (pd.isna(a) & pd.isna(b))
                    )
                else:
                    bad = ~((a == b) | (pd.isna(a) & pd.isna(b)))
                if bad.any():
                    i = int(np.argmax(bad))
                    status.append(
                        f"col {c}: {int(bad.sum())} mismatches, "
                        f"first row {i}: {a[i]!r} != {b[i]!r}"
                    )
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name}: rows={len(g)} match [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
