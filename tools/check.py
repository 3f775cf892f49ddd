#!/usr/bin/env python3
"""Dev-only pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result and
the DuckDB result of oracle_sql.json[name] (tables registered as views over
<sfDir>/*.parquet), sort columns by name, sort rows, compare values.
NOT part of the shipped library — development tooling only.
"""
import json, math, sys
import duckdb

def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append("%.10g" % v if not math.isnan(v) else "nan")
            else:
                rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.execute(sql).df()
            got = got.reindex(sorted(got.columns), axis=1)
            exp = exp.reindex(sorted(exp.columns), axis=1)
            if list(got.columns) != list(exp.columns):
                print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
                n_bad += 1
                continue
            g, e = canon(got.values.tolist()), canon(exp.values.tolist())
            if g == e:
                print(f"ok   {name} ({len(g)} rows)")
                n_ok += 1
            else:
                n_bad += 1
                diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
                print(f"FAIL {name}: {len(g)} vs {len(e)} rows; first diffs:")
                for i in diff:
                    print(f"  spark : {g[i]}\n  oracle: {e[i]}")
                if len(g) != len(e):
                    print(f"  spark-only: {[r for r in g if r not in e][:2]}")
                    print(f"  oracle-only: {[r for r in e if r not in g][:2]}")
        except Exception as ex:
            n_bad += 1
            print(f"ERROR {name}: {ex}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
