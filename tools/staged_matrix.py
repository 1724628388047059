"""Determinism-matrix runner for STAGED registry rows: verify a staged
module's Spark queries against their DuckDB twins bit-for-bit at an
arbitrary scale factor and parallelism — the pre-registration evidence
the rotation cadence requires beyond the staged tests' fixed
sf0.001/sf0.01 pair (NOTES: every staged row records sf0.1 at local[8]
AND sf0.01 at local[3] before its swap lands).

Usage:
  python tools/staged_matrix.py r11 [query,query...] [sf_dir] [master]
  python tools/staged_matrix.py r12                  # all rows, defaults

Defaults: all rows of the module, /root/testdata/sf0.1, local[8].
Exit 0 iff every row matches (rows, schema, values — the gate's
normalize/compare rules).
"""

from __future__ import annotations

import importlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from peskas_mozambique_data_pipeline_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _exact(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        return fa == fb or (math.isnan(fa) and math.isnan(fb))
    return str(a) == str(b)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    mod = importlib.import_module(
        f"peskas_mozambique_data_pipeline_spark.registry_staged_{sys.argv[1]}"
    )
    names = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2 and sys.argv[2]
        else sorted(mod.STAGED_QUERIES)
    )
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    master = sys.argv[4] if len(sys.argv) > 4 else "local[8]"

    spark = get_spark(app_name="staged-matrix", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    sql = mod.build_staged_oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    ok = True
    for name in names:
        sdf = mod.STAGED_QUERIES[name](spark, sf_dir)
        srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
        res = con.execute(sql[name])
        dcols = [d[0] for d in res.description]
        drows = _norm(res.fetchall(), dcols)
        good = (
            sorted(c.lower() for c in sdf.columns)
            == sorted(c.lower() for c in dcols)
            and len(srows) == len(drows)
            and all(
                all(_exact(a, b) for a, b in zip(rs, rd))
                for rs, rd in zip(srows, drows)
            )
        )
        print(
            f"{name} @ {sf_dir} {master}: rows={len(srows)}/{len(drows)} "
            f"{'OK' if good else 'MISMATCH'}"
        )
        ok = ok and good
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
