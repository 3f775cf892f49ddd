#!/usr/bin/env python3
"""Float-canon audit: measure the round(x, n) residual risk per tier.

The cross-engine divergence classes this repo has actually hit (r12
q_autocorr at sf1; r15 q_centroids / q_pipeline_exact at sf3) share one
precondition: an emitted `round(x, n)` where x*10^n lands within ulps of
a representable .5 boundary (Spark's decimal-expansion HALF_UP and
DuckDB's vectorized product-round can then legally disagree), or a
negative x rounding to -0.0 ('-0' vs '0' under %.10g).

Method (A/B probe): every registered oracle SQL containing round(...) is
run twice with round textually rewritten to two boundary-adversarial but
otherwise-identical spellings:

    A: floor(x*10^n + 0.5) / 10^n      (half rounds UP toward +inf)
    B: ceil (x*10^n - 0.5) / 10^n      (half rounds DOWN toward -inf)

Both are numeric-type-preserving, so they survive CASTs, sums, GROUP BYs
and comparisons, and a boundary hit PROPAGATES to the emitted rows the
same way a real engine divergence would (including row-set changes via
GROUP BY/ORDER BY on rounded keys, and the -0.0 print class: B emits
-0.0 where A emits 0.0 for negatives rounding to zero). The two runs
agree on every value except within ulps of a .5 boundary, so
canon(A) != canon(B)  <=>  the query emits at-risk cells at this tier.
DECIMAL inputs keep exact round() (both engines round decimals
identically — not a risk class).

Usage: python3 tools/round_audit.py <sfDir> <verifyOutDir> [only...]
  <verifyOutDir> needs only oracle_sql.json (a Verify dump).
Exit 1 iff any query is at-risk or errors.
"""
import json, math, re, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

MACROS = """
CREATE MACRO graft_round1_a(x) AS (
  CASE WHEN typeof(x) LIKE 'DECIMAL%' THEN CAST(round(x) AS DOUBLE)
       ELSE floor(CAST(x AS DOUBLE) + 0.5) END);
CREATE MACRO graft_round1_b(x) AS (
  CASE WHEN typeof(x) LIKE 'DECIMAL%' THEN CAST(round(x) AS DOUBLE)
       WHEN CAST(x AS DOUBLE) = 0 THEN 0.0
       -- tiny POSITIVE x: real round() gives +0.0 on both engines, so
       -- keep ceil's manufactured -0.0 only for genuine negatives (x*10^n
       -- in (-0.5, 0) emits '-0' in Spark — the r15 q_centroids class)
       WHEN CAST(x AS DOUBLE) > 0 AND CAST(x AS DOUBLE) < 0.5 THEN 0.0
       ELSE ceil(CAST(x AS DOUBLE) - 0.5) END);
CREATE MACRO graft_round2_a(x, n) AS (
  CASE WHEN typeof(x) LIKE 'DECIMAL%' THEN CAST(round(x, n) AS DOUBLE)
       ELSE floor(CAST(x AS DOUBLE) * power(10, n) + 0.5) / power(10, n)
  END);
CREATE MACRO graft_round2_b(x, n) AS (
  CASE WHEN typeof(x) LIKE 'DECIMAL%' THEN CAST(round(x, n) AS DOUBLE)
       WHEN CAST(x AS DOUBLE) = 0 THEN 0.0
       WHEN CAST(x AS DOUBLE) > 0
            AND CAST(x AS DOUBLE) * power(10, n) < 0.5 THEN 0.0
       ELSE ceil(CAST(x AS DOUBLE) * power(10, n) - 0.5) / power(10, n)
  END);
"""

ROUND_RE = re.compile(r"\bround\s*\(", re.IGNORECASE)


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


def rewrite(sql, variant):
    """Replace each round(...) call with graft_round{1,2}_<variant>(...),
    picking the macro by argument count (first depth-1 comma)."""
    while True:
        m = ROUND_RE.search(sql)
        if m is None:
            return sql
        depth, i, two_args = 1, m.end(), False
        while i < len(sql) and depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                two_args = True
            i += 1
        name = f"graft_round{2 if two_args else 1}_{variant}"
        # rewrite innermost-last: the loop re-scans, so nested round()
        # inside the argument span is picked up on a later iteration
        sql = sql[:m.start()] + name + "(" + sql[m.end():]


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for stmt in MACROS.strip().split(";"):
        if stmt.strip():
            con.execute(stmt)
    n_round = n_clean = n_risk = n_err = 0
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if not ROUND_RE.search(sql):
            continue
        n_round += 1
        t0 = time.time()
        try:
            a = canon(con.execute(rewrite(sql, "a")).fetchall())
            b = canon(con.execute(rewrite(sql, "b")).fetchall())
            dt = time.time() - t0
            if a == b:
                n_clean += 1
                print(f"clean   {name} ({len(a)} rows) [{dt:.1f}s]", flush=True)
            else:
                n_risk += 1
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"AT_RISK {name}: {len(a)} vs {len(b)} rows [{dt:.1f}s]",
                      flush=True)
                for x, y in diffs:
                    print(f"  A: {x}\n  B: {y}", flush=True)
        except Exception as ex:
            n_err += 1
            msg = str(ex).split("\n")[0][:140]
            print(f"ERROR   {name}: {msg} [{time.time()-t0:.1f}s]", flush=True)
    print(f"== {n_round} queries with round(): {n_clean} clean, "
          f"{n_risk} at-risk, {n_err} errors ==", flush=True)
    return 1 if (n_risk or n_err) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
