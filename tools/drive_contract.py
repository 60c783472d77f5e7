"""Contract drive: mirror the verification driver against __spark_entry__.

Vanilla session, entry smoke, every query vs its DuckDB oracle. The
canonicalizer is IMPORTED from tests/conftest.py — the strict local
gate (full-precision repr floats, HUGEINT rejection) — so this tool and
pytest cannot drift into contradictory verdicts, and a pass here is a
pass under the driver's bit-exact value hash (round-1 lesson: a
``%.9g``-rounded comparator silently green-lit three driver hash
fails).

Usage:
    python tools/drive_contract.py                  # all queries
    python tools/drive_contract.py q_foo s_bar      # subset (no entry smoke)
    SF_DIR=/root/testdata/sf0.1 python tools/drive_contract.py ...
"""

import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import duckdb
from pyspark.sql import SparkSession

from conftest import _FORBIDDEN_DUCK_TYPES, _canon  # tests/conftest.py

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
ONLY = set(sys.argv[1:])  # optional subset of query names


def compare(sdf, rel):
    """(ok, detail) under the strict conftest gate."""
    scols = sorted(sdf.columns)
    srows = sdf.select(*scols).collect()
    dcols = [d[0] for d in rel.description]
    if sorted(dcols) != scols:
        return False, f"schema spark={scols} duck={sorted(dcols)}"
    dtypes = [str(t) for t in rel.types]
    bad = [(c, t) for c, t in zip(dcols, dtypes) if t.upper() in _FORBIDDEN_DUCK_TYPES]
    if bad:
        return False, f"driver-incomparable oracle types (add CAST): {bad}"
    drows = rel.fetchall()
    if len(srows) != len(drows):
        return False, f"rows spark={len(srows)} duck={len(drows)}"
    didx = [dcols.index(c) for c in scols]
    sset = sorted(tuple(_canon(v) for v in row) for row in srows)
    dset = sorted(tuple(_canon(row[i]) for i in didx) for row in drows)
    if sset != dset:
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        return False, f"value diffs: {diffs}"
    return True, f"rows={len(srows)}"


def main():
    import __spark_entry__ as e

    qs = e.queries()
    unknown = ONLY - set(qs)
    if unknown:
        print(f"UNKNOWN query names: {sorted(unknown)}")
        sys.exit(2)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("drive_contract")
        .getOrCreate()
    )
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    if not ONLY:
        df = e.entry(spark)
        rows = df.collect()
        print(f"ENTRY ok rows={len(rows)} schema={[f.name for f in df.schema.fields]}")

    oracles = e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    t0 = time.time()
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            if name in oracles:
                ok, detail = compare(sdf, duck.sql(oracles[name]))
                if ok:
                    n_pass += 1
                    print(f"PASS {name} {detail}")
                else:
                    n_fail += 1
                    print(f"FAIL {name} {detail}")
            else:
                n_rowsonly += 1
                print(f"ROWS-ONLY {name} rows={len(sdf.collect())}")
        except Exception as exc:
            n_fail += 1
            print(f"ERROR {name}: {str(exc)[:300]}")
            if os.environ.get("VERBOSE"):
                traceback.print_exc()
    print(
        f"SUMMARY pass={n_pass} fail={n_fail} rows_only={n_rowsonly} "
        f"elapsed={time.time()-t0:.0f}s"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
