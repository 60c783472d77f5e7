"""Contract drive: mirror the verification driver against __spark_entry__.

Vanilla session, entry smoke, every query vs its DuckDB oracle at sf0.01.
"""
import hashlib
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
ONLY = set(sys.argv[1:])  # optional subset of query names


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for l in lines:
        h.update(l.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import __spark_entry__ as e

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

    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    t0 = time.time()
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = [f.name for f in sdf.schema.fields]
            if name in oracles:
                rel = duck.sql(oracles[name])
                ocols = rel.columns
                orows = rel.fetchall()
                ok_schema = sorted(scols) == sorted(ocols)
                ok_rows = len(srows) == len(orows)
                ok_hash = frame_hash(scols, srows) == frame_hash(ocols, orows)
                if ok_schema and ok_rows and ok_hash:
                    n_pass += 1
                    print(f"PASS {name} rows={len(srows)}")
                else:
                    n_fail += 1
                    print(
                        f"FAIL {name} schema={ok_schema} rows={ok_rows}({len(srows)}/{len(orows)}) hash={ok_hash}"
                    )
            else:
                n_rowsonly += 1
                print(f"ROWS-ONLY {name} rows={len(srows)}")
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
