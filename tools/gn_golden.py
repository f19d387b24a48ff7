#!/usr/bin/env python3
"""Independent golden generator for q38 (Girvan-Newman communities).

Re-implements the GN loop from scratch in pure Python -- correct
Brandes edge betweenness, frozen-graph Newman modularity, remove the
max-betweenness edge (ties: smallest (src, dst)), keep the best
partition -- and runs it on the SAME edge list DuckDB builds from the
input tables (the edge SQL is taken from the q37 oracle, which is
already hash-verified against the Spark edge build). Agreement between
this replay and the Scala engine is therefore a genuine two-
implementation cross-check of the LOOP, not a copy of engine output.

Determinism contract (mirrored in GirvanNewman.gnCommunities): both
implementations round betweenness to 4 dp and modularity to 6 dp with
floor(x*scale + 0.5 + 1e-9)/scale before any comparison, so summation-
order ulp drift cannot flip a removal decision or the best-partition
argmax, and every decision is a function of the edge SET alone.

Usage:
  python3 tools/gn_golden.py [verify_out_dir] [sf_dir ...]
Defaults: /tmp/verify_out and the three testdata SFs. Writes
src/main/resources/graft/gn_golden.txt:
  G <n_edges> <xor-of-h60(src,dst)>   # one per scale factor
  R <community> <csize> <best_q>      # golden rows of the open group

Refresh mode (what `sbt test` invokes when it meets an edge-set
fingerprint the shipped golden doesn't know -- a testdata refresh
degrades to a regeneration instead of an oracle error()):
  python3 tools/gn_golden.py --edges <edge_file> --out <golden_txt>
<edge_file> holds one "src dst" pair per line (the engine's own
hash-verified edge build; the GN LOOP is still replayed independently
here). The group for that edge set is MERGED into <golden_txt>:
same-fingerprint group replaced, all other groups kept.
"""
import hashlib
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


def edge_sql(verify_out):
    """The q37 oracle's edge-building prefix (cp/ed/ue CTEs)."""
    oracle = json.load(open(os.path.join(verify_out, "oracle_sql.json")))
    sql = oracle["q37_betweenness"]
    prefix = sql.split(",\nwalk AS (")[0]
    return prefix + "\nSELECT src, dst FROM ed ORDER BY src, dst"


def edges_for(sf_dir, sql):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return [(int(a), int(b)) for a, b in con.sql(sql).fetchall()]


def h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def fingerprint(edges):
    x = 0
    for a, b in edges:
        x ^= h60(f"{a},{b}")
    return len(edges), x


def r4(v):
    return math.floor(v * 1e4 + 0.5 + 1e-9) / 1e4


def r6(v):
    return math.floor(v * 1e6 + 0.5 + 1e-9) / 1e6


def adjacency(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    return {k: sorted(v) for k, v in adj.items()}


def brandes(edges):
    """Exact Brandes edge betweenness (credits halved), per edge."""
    adj = adjacency(edges)
    acc = {}
    for root in sorted(adj):
        dist = {root: 0}
        sigma = {root: 1.0}
        order = [root]
        queue = [root]
        preds = {}
        while queue:
            v = queue.pop(0)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    queue.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
                    preds.setdefault(w, []).append(v)
        delta = {}
        for w in reversed(order):
            for v in preds.get(w, []):
                c = sigma[v] / sigma[w] * (1.0 + delta.get(w, 0.0))
                e = (v, w) if v < w else (w, v)
                acc[e] = acc.get(e, 0.0) + c
                delta[v] = delta.get(v, 0.0) + c
    return {e: c / 2.0 for e, c in acc.items()}


def components(nodes, edges):
    adj = adjacency(edges)
    seen = set()
    out = []
    for n in sorted(nodes):
        if n in seen:
            continue
        comp = {n}
        seen.add(n)
        queue = [n]
        while queue:
            v = queue.pop(0)
            for w in adj.get(v, []):
                if w not in seen:
                    seen.add(w)
                    comp.add(w)
                    queue.append(w)
        out.append(comp)
    return out


def modularity(comms, orig):
    m = float(len(orig))
    if m == 0:
        return 0.0
    a = set(orig)
    k = {}
    for u, v in orig:
        k[u] = k.get(u, 0) + 1
        k[v] = k.get(v, 0) + 1
    q = 0.0
    for c in comms:
        members = sorted(c)
        for i in members:
            for j in members:
                if i == j:
                    continue
                e = (i, j) if i < j else (j, i)
                aij = 1.0 if e in a else 0.0
                q += aij - k[i] * k[j] / (2.0 * m)
    return q / (2.0 * m)


def gn(edges):
    orig = sorted({(a, b) if a < b else (b, a) for a, b in edges})
    nodes = {n for e in orig for n in e}
    current = list(orig)
    best_q = r6(modularity(components(nodes, current), orig))
    best = components(nodes, current)
    while current:
        bt = {e: r4(c) for e, c in brandes(current).items()}
        max_c = max(bt.values())
        top = min(e for e, c in bt.items() if c == max_c)
        current = [e for e in current if e != top]
        comps = components(nodes, current)
        q = r6(modularity(comps, orig))
        if q > best_q:
            best_q, best = q, comps
    return best_q, best


def fmt_q(q):
    """best_q at 4 dp from the 6-dp loop value, like the engine."""
    v = math.floor(q * 1e4 + 0.5) / 1e4
    return repr(v)


HEADER = ["# q38 goldens -- generated by tools/gn_golden.py "
          "(independent pure-Python GN replay).",
          "# G <n_edges> <xor-of-h60('src,dst')>; R <community> "
          "<csize> <best_q>."]


def golden_group(edges):
    """The golden lines (G + R rows) for one edge set."""
    n, x = fingerprint(edges)
    q, comms = gn(edges)
    rows = sorted(((min(c), len(c)) for c in comms),
                  key=lambda t: (-t[1], t[0]))
    lines = [f"G {n} {x}"]
    for cmin, csize in rows:
        lines.append(f"R {cmin} {csize} {fmt_q(q)}")
    return (n, x), lines


def parse_groups(path):
    """Existing golden file -> ordered [( (n, x), [lines] )]."""
    groups = []
    if not os.path.exists(path):
        return groups
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if parts[0] == "G":
            groups.append(((int(parts[1]), int(parts[2])), [line]))
        elif parts[0] == "R":
            groups[-1][1].append(line)
    return groups


def refresh(edge_files, out_path):
    """Merge the groups for the given edge files into out_path."""
    groups = parse_groups(out_path)
    for ef in edge_files:
        edges = []
        for line in open(ef):
            line = line.strip()
            if line:
                a, b = line.split()
                edges.append((int(a), int(b)))
        fp, lines = golden_group(edges)
        groups = [g for g in groups if g[0] != fp] + [(fp, lines)]
        print(f"{ef}: fingerprint {fp[1]} ({fp[0]} edges), "
              f"{len(lines) - 1} communities")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(HEADER) + "\n")
        for _, lines in groups:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.normpath(out_path)}")


def main():
    args = sys.argv[1:]
    if args and args[0] == "--edges":
        edge_files = []
        out = None
        i = 0
        while i < len(args):
            if args[i] == "--edges":
                edge_files.append(args[i + 1])
                i += 2
            elif args[i] == "--out":
                out = args[i + 1]
                i += 2
            else:
                raise SystemExit(f"unknown arg {args[i]}")
        if not out:
            raise SystemExit("--edges mode requires --out <golden_txt>")
        refresh(edge_files, out)
        return
    verify_out = args[0] if args else "/tmp/verify_out"
    sfs = args[1:] or [f"/root/testdata/sf{s}"
                       for s in ("0.001", "0.01", "0.1")]
    sql = edge_sql(verify_out)
    out = list(HEADER)
    for sf in sfs:
        edges = edges_for(sf, sql)
        n, x = fingerprint(edges)
        q, comms = gn(edges)
        rows = sorted(((min(c), len(c)) for c in comms),
                      key=lambda t: (-t[1], t[0]))
        out.append(f"G {n} {x}")
        for cmin, csize in rows:
            out.append(f"R {cmin} {csize} {fmt_q(q)}")
        print(f"{sf}: {n} edges, fingerprint {x}, "
              f"{len(rows)} communities, best_q {fmt_q(q)}")
    dest = os.path.join(os.path.dirname(__file__), "..",
                        "src", "main", "resources", "graft",
                        "gn_golden.txt")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {os.path.normpath(dest)}")


if __name__ == "__main__":
    main()
