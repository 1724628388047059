"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, sorts columns by name and rows by value, and compares
row counts + values EXACTLY (bit-for-bit on floats, like the driver's
value hash) — queries must quantize identically on both engines.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from peskas_mozambique_data_pipeline_spark.session import get_spark
import importlib

entry_mod = importlib.import_module("__spark_entry__")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(rows, cols):
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
    return out, [cols[i] for i in order]


def type_class(t: str) -> str:
    """Collapse an engine type name to a comparison class so Spark and
    DuckDB schemas can be checked for driver-level compatibility."""
    t = t.lower()
    # container classes FIRST: "array<double>" must classify as list,
    # not fall into the float family via its element type
    for cls, keys in {
        "list": ("array", "list", "[]"),
        "struct": ("struct", "row", "map"),
        "int": ("tinyint", "smallint", "int", "bigint", "long", "hugeint"),
        "float": ("float", "double", "real", "decimal"),
        "bool": ("boolean",),
        "ts": ("timestamp",),
        "date": ("date",),
        "str": ("string", "varchar", "char", "text", "uuid", "json"),
    }.items():
        if any(k in t for k in keys):
            return cls
    return t


def values_close(a, b):
    """Exact, driver-style comparison: floats must match bit-for-bit."""
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = dict(entry_mod.queries())
    oracles = dict(entry_mod.oracle_sql())
    # retired rows (consolidated out of the driver registry) stay
    # verifiable by explicit name
    from peskas_mozambique_data_pipeline_spark import registry as _reg

    for _n in only & set(getattr(_reg, "RETIRED_QUERIES", {})):
        qs[_n] = _reg.RETIRED_QUERIES[_n]
        oracles[_n] = _reg.RETIRED_ORACLE_SQL[_n]
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            stypes = dict(sdf.dtypes)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) -> {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            bad_types = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, rel.types)
                if any(k in str(t).upper() for k in ("HUGEINT", "DECIMAL"))
            ]
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if bad_types:
            # The driver's value hash serializes DuckDB HUGEINT/DECIMAL
            # differently from Spark's bigint/double (Arrow -> pandas
            # widens int128), so identical values still hash-mismatch.
            # Oracles must CAST these away.
            print(f"FAIL {name}: oracle emits non-portable column types: {bad_types}")
            failures += 1
            continue

        dtypes = {c.lower(): str(t) for c, t in zip(rel.columns, rel.types)}
        sn, scols_s = normalize(srows, scols)
        dn, dcols_s = normalize(drows, dcols)
        status = []
        if [c.lower() for c in scols_s] != [c.lower() for c in dcols_s]:
            status.append(f"cols spark={scols_s} duck={dcols_s}")
        else:
            type_mism = [
                f"{c}: spark={stypes[c]} duck={dtypes.get(c.lower())}"
                for c in scols
                if type_class(stypes[c]) != type_class(dtypes.get(c.lower(), "?"))
            ]
            if type_mism:
                status.append("type-class mismatch " + "; ".join(type_mism))
        if len(sn) != len(dn):
            status.append(f"rowcount spark={len(sn)} duck={len(dn)}")
        elif not status:
            mism = 0
            example = None
            for rs, rd in zip(sn, dn):
                if len(rs) != len(rd) or not all(values_close(a, b) for a, b in zip(rs, rd)):
                    mism += 1
                    if example is None:
                        example = (rs, rd)
            if mism:
                status.append(f"{mism}/{len(sn)} rows differ; e.g. spark={example[0]} duck={example[1]}")
        if status:
            print(f"FAIL {name}: " + " | ".join(status))
            failures += 1
        else:
            print(f"OK   {name}: {len(sn)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
