#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every `__spark_entry__.queries()` entry AND its `oracle_sql()` mirror
on the same parquet tables (default sf0.01), then compares row count,
column-name set, and a canonical value hash (columns sorted by name, rows
sorted, values stringified). Prints one JSON line per query + a summary.

Usage:
  python check_correctness.py [--sf-dir /root/testdata/sf0.01] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma list of query names")
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as em
    from co_deduplicate_spark.session import build_session

    spark = build_session("co_dedup_correctness", cores=args.cores,
                          driver_memory="24g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = em.queries()
    oracles = em.oracle_sql()
    names = args.only.split(",") if args.only else list(qs)
    results, n_fail = {}, 0
    for name in names:
        rec: dict = {}
        try:
            sdf = qs[name](spark, args.sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            if name in oracles:
                cur = con.execute(oracles[name])
                o_cols = [d[0] for d in cur.description]
                o_rows = cur.fetchall()
                rec["oracle_rows"] = len(o_rows)
                rec["rows_match"] = len(s_rows) == len(o_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(o_cols)
                if not rec["schema_match"]:
                    rec["spark_cols"], rec["oracle_cols"] = sorted(s_cols), sorted(o_cols)
                sh, oh = frame_hash(s_cols, s_rows), frame_hash(o_cols, o_rows)
                rec["hash_match"] = sh == oh
                rec["ok"] = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            else:
                rec["oracle_rows"] = None
                rec["ok"] = True  # rows-only query (driver's weaker check)
        except Exception as e:  # noqa: BLE001 — report, keep going
            rec["ok"] = False
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        results[name] = rec
        if not rec["ok"]:
            n_fail += 1
        print(json.dumps({name: rec}), flush=True)

    print(json.dumps({"summary": {"total": len(names), "failed": n_fail}}))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
