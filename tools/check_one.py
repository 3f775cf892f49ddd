#!/usr/bin/env python3
"""Dev-only: per-query oracle compare with timing — check.py's compare for
an explicit subset, printing per-query wall time so slow oracles are
attributable. Usage: check_one.py <sfDir> <verifyOutDir> <q1> [q2 ...]"""
import json, math, sys, time
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


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.execute(oracle[name]).df()
            got = got.reindex(sorted(got.columns), axis=1)
            exp = exp.reindex(sorted(exp.columns), axis=1)
            dt = time.time() - t0
            if list(got.columns) != list(exp.columns):
                print(f"FAIL {name}: cols {list(got.columns)} vs "
                      f"{list(exp.columns)} [{dt:.1f}s]", flush=True)
                n_bad += 1
                continue
            g, e = canon(got.values.tolist()), canon(exp.values.tolist())
            if g == e:
                print(f"ok   {name} ({len(g)} rows) [{dt:.1f}s]", flush=True)
                n_ok += 1
            else:
                n_bad += 1
                diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
                print(f"FAIL {name}: {len(g)} vs {len(e)} rows [{dt:.1f}s]",
                      flush=True)
                for i in diff:
                    print(f"  spark : {g[i]}\n  oracle: {e[i]}", flush=True)
        except Exception as ex:
            n_bad += 1
            print(f"ERROR {name}: {ex} [{time.time()-t0:.1f}s]", flush=True)
    print(f"== {n_ok} ok, {n_bad} bad ==", flush=True)
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
