"""Pre-flight harness mimicking the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same parquet, compare row count, column names/order-insensitive value
hash. Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from opennre_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            if len(srows) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error {str(e)[:300]}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            sh = table_hash(scols, [[r[c] for c in scols] for r in srows])
            dh = table_hash(dcols, drows)
            if sh != dh:
                problems.append("value hash mismatch")
                # show first differing line for debugging
                so = sorted(
                    "|".join(
                        norm_cell(r[c]) for c in sorted(scols)
                    )
                    for r in srows
                )
                do = sorted(
                    "|".join(
                        norm_cell(r[sorted(dcols).index(c) if False else dcols.index(c)])
                        for c in sorted(dcols)
                    )
                    for r in drows
                )
                for a, b in zip(so, do):
                    if a != b:
                        problems.append(f"  spark: {a[:200]}")
                        problems.append(f"  duck : {b[:200]}")
                        break
        if problems:
            failures.append((name, "; ".join(problems[:1])))
            print(f"[FAIL] {name}: " + "; ".join(problems))
        else:
            print(f"[ OK ] {name}: {len(srows)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
