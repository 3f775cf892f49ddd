#!/usr/bin/env python3
"""Prototype + probe for the unrolled FW-BW q_scc oracle.

Generates the materialized-CTE replay of the engine's FW-BW coloring
rounds (operators/StronglyConnectedComponents.scala) for a given
(outer_rounds, prop_rounds), runs it in DuckDB over a fixture dir, and
either compares against an engine parquet dump (--engine) or reports
per-outer-round remaining-edge counts (--probe) so the committed Scala
oracle can carry empirically-sufficient round counts.

Usage:
  python3 tools/scc_oracle_probe.py SF_DIR [--engine q_scc.parquet]
      [--outer 8] [--prop 14] [--probe]
"""
import argparse, sys, time
import duckdb


def edges_cte(sf_dir):
    # purchase-path edges, identical to the registered oracle's derivation
    return (
        "seq AS MATERIALIZED (SELECT l_orderkey, l_partkey, "
        "lead(l_partkey) OVER (PARTITION BY l_orderkey "
        "ORDER BY l_linenumber, l_partkey) AS nxt FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet{PQ_GLOB}')), "
        "ed0 AS MATERIALIZED (SELECT DISTINCT l_partkey AS src, nxt AS dst "
        "FROM seq WHERE nxt IS NOT NULL AND l_partkey % 7 = 0 "
        "AND nxt % 7 = 0 AND l_partkey <> nxt)"
    )


def fixpoint_ctes(tag, edges, init_nodes, prop_rounds, reverse=False):
    """Min-label-reach fixpoint with pointer jumping, unrolled.

    tag: CTE name prefix; edges: edge CTE name; init_nodes: SQL producing
    one column `node` (the fixpoint's node universe). Returns (sql, final).
    Label semantics: m(v) = min id reachable from v following edges
    forward (or backward when reverse=True), v included.
    """
    s, d = ("dst", "src") if reverse else ("src", "dst")
    parts = [f"{tag}0 AS MATERIALIZED (SELECT node, node AS m FROM ({init_nodes}) t)"]
    prev = f"{tag}0"
    for i in range(1, prop_rounds + 1):
        hop = f"{tag}h{i}"
        # hop: m := min(m, min over out-neighbors' m)
        parts.append(
            f"{hop} AS MATERIALIZED (SELECT l.node, "
            f"least(l.m, coalesce(h.hm, l.m)) AS m FROM {prev} l "
            f"LEFT JOIN (SELECT e.{s} AS node, min(x.m) AS hm FROM {edges} e "
            f"JOIN {prev} x ON e.{d} = x.node GROUP BY 1) h USING (node))")
        # jump: m := min(m, m(m)) — m(v) is reachable from v, so anything
        # reachable from m(v) is reachable from v (label doubling)
        parts.append(
            f"{tag}{i} AS MATERIALIZED (SELECT l.node, "
            f"least(l.m, coalesce(j.m, l.m)) AS m FROM {hop} l "
            f"LEFT JOIN {hop} j ON l.m = j.node)")
        prev = f"{tag}{i}"
    return ", ".join(parts), prev


def scc_sql(sf_dir, outer_rounds, prop_rounds, probe=False):
    ctes = [edges_cte(sf_dir)]
    settled = []
    probes = []
    for o in range(outer_rounds):
        ed = f"ed{o}"
        nodes = f"SELECT {ed}.src AS node FROM {ed} UNION SELECT {ed}.dst FROM {ed}"
        fsql, f_fin = fixpoint_ctes(f"f{o}_", ed, nodes, prop_rounds)
        ctes.append(fsql)
        # same-color edges (F(src) = F(dst))
        ctes.append(
            f"c{o} AS MATERIALIZED (SELECT e.src, e.dst FROM {ed} e "
            f"JOIN {f_fin} fs ON e.src = fs.node "
            f"JOIN {f_fin} fd ON e.dst = fd.node WHERE fs.m = fd.m)")
        gnodes = f"SELECT c{o}.src AS node FROM c{o} UNION SELECT c{o}.dst FROM c{o}"
        gsql, g_fin = fixpoint_ctes(f"g{o}_", f"c{o}", gnodes, prop_rounds,
                                    reverse=True)
        ctes.append(gsql)
        # verdicts: settle F = G (nodes with no same-color edge default G to
        # self — their pivot iff F(v) = v, matching the engine's coalesce)
        ctes.append(
            f"v{o} AS MATERIALIZED (SELECT f.node, f.m AS f, "
            f"coalesce(g.m, f.node) AS g FROM {f_fin} f "
            f"LEFT JOIN {g_fin} g USING (node))")
        settled.append(f"SELECT node, f AS scc FROM v{o} WHERE f = g")
        # next round: open nodes' same-color edges
        ctes.append(f"op{o} AS MATERIALIZED (SELECT node FROM v{o} WHERE f <> g)")
        ctes.append(
            f"ed{o + 1} AS MATERIALIZED (SELECT c.src, c.dst FROM c{o} c "
            f"WHERE c.src IN (SELECT node FROM op{o}) "
            f"AND c.dst IN (SELECT node FROM op{o}))")
        # open nodes with no surviving edge are singleton SCCs
        settled.append(
            f"SELECT node, node AS scc FROM op{o} "
            f"WHERE node NOT IN (SELECT src FROM ed{o + 1}) "
            f"AND node NOT IN (SELECT dst FROM ed{o + 1})")
        probes.append(f"SELECT {o} AS outer_round, "
                      f"(SELECT count(*) FROM ed{o}) AS remaining_edges")
    probes.append(f"SELECT {outer_rounds}, (SELECT count(*) FROM ed{outer_rounds})")
    body = " UNION ALL ".join(probes if probe else settled)
    return "WITH " + ", ".join(ctes) + " " + body


PQ_GLOB = ""


def main():
    global PQ_GLOB
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--engine")
    ap.add_argument("--outer", type=int, default=8)
    ap.add_argument("--prop", type=int, default=14)
    ap.add_argument("--probe", action="store_true")
    a = ap.parse_args()
    import os
    if os.path.isdir(f"{a.sf_dir}/lineitem.parquet"):
        PQ_GLOB = "/*.parquet"
    sql = scc_sql(a.sf_dir, a.outer, a.prop, probe=a.probe)
    print(f"[probe] sql bytes: {len(sql)}", file=sys.stderr)
    con = duckdb.connect()
    t0 = time.time()
    rows = con.execute(sql).fetchall()
    dt = time.time() - t0
    if a.probe:
        for r in sorted(rows):
            print(f"outer {r[0]}: remaining_edges {r[1]}")
        print(f"[probe] {dt:.1f}s")
        return
    got = sorted(rows)
    print(f"[probe] oracle rows: {len(got)} in {dt:.1f}s")
    if a.engine:
        eng = sorted(con.execute(
            f"SELECT node, scc FROM read_parquet('{a.engine}/*.parquet')"
        ).fetchall())
        if eng == got:
            print(f"MATCH: {len(got)} rows identical")
        else:
            print(f"MISMATCH: engine {len(eng)} rows vs oracle {len(got)}")
            diff = [p for p in zip(eng, got) if p[0] != p[1]][:10]
            for e, g in diff:
                print(f"  engine {e}  oracle {g}")
            sys.exit(1)


if __name__ == "__main__":
    main()
