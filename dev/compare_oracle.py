#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare (column-name-sorted,
row-sorted) against the Spark parquet dumps from graft.Verify."""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            osch = con.execute(sql).arrow().schema
            otypes = {f.name: str(f.type) for f in osch}
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            ssql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            stypes = {f.name: str(f.type) for f in con.execute(ssql).arrow().schema}
            s = con.execute(ssql)
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark dump error: {e}")
            n_fail += 1
            continue
        # the driver lexsorts result rows with pandas, which CRASHES on
        # array/list cells (unhashable numpy.ndarray — the q_project r12
        # lesson). Hard-fail any array-typed output column locally so the
        # gate-shape bug never reaches the driver.
        listy = {c: t for c, t in list(otypes.items()) + list(stypes.items())
                 if "list" in t.lower() or t.lower().startswith("array")}
        if listy:
            print(f"FAIL {name}: array/list-typed output column(s) {listy} — "
                  f"the driver's pandas sort cannot handle arrays; "
                  f"stringify (array_to_string) or posexplode the column")
            n_fail += 1
            continue
        oc, ocn = canon(orows, ocols)
        sc, scn = canon(srows, scols)
        if ocn != scn:
            print(f"FAIL {name}: columns differ oracle={ocn} spark={scn}")
            n_fail += 1
            continue
        # the driver's hash is TYPED enough to fail on DuckDB's int128
        # widening (HUGEINT from sum()/list_sum → arrow decimal128) vs
        # Spark's BIGINT, but it tolerates int-width diffs (int32 vs
        # int64 passed every round). Mirror exactly that: fail on a
        # decimal-vs-nondecimal mismatch, stay silent otherwise.
        tdiff = {c: (otypes[c], stypes[c]) for c in ocn
                 if otypes[c].startswith("decimal") != stypes[c].startswith("decimal")}
        if tdiff:
            print(f"FAIL {name}: decimal/non-decimal TYPE mismatch "
                  f"(oracle,spark): {tdiff} — cast ::BIGINT/::DOUBLE in the oracle")
            n_fail += 1
            continue
        if oc == sc:
            print(f"PASS {name} ({len(sc)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows differ (oracle {len(oc)} vs spark {len(sc)})")
            so, ss = set(oc), set(sc)
            for r in list(so - ss)[:3]:
                print(f"    oracle-only: {r}")
            for r in list(ss - so)[:3]:
                print(f"    spark-only : {r}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
