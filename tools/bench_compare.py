#!/usr/bin/env python3
"""Compare two bench_queries.json artifacts per query (round attribution)."""
import json, sys
a = json.load(open(sys.argv[1])); b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
da = sum(qa[q] for q in common); db = sum(qb[q] for q in common)
print(f"A total={a['value']:.1f}s  B total={b['value']:.1f}s")
print(f"common {len(common)} queries: A={da:.1f}s B={db:.1f}s delta={db-da:+.1f}s ({(db-da)/da*100:+.1f}%)")
deltas = sorted(((qb[q]-qa[q], q) for q in common), reverse=True)
print("\nworst regressions (B-A):")
for d,q in deltas[:12]: print(f"  {q:32s} {qa[q]:7.3f} -> {qb[q]:7.3f}  {d:+.3f}")
print("\nbest improvements:")
for d,q in deltas[-12:]: print(f"  {q:32s} {qa[q]:7.3f} -> {qb[q]:7.3f}  {d:+.3f}")
only_a = set(qa)-set(qb); only_b = set(qb)-set(qa)
if only_a: print("only in A:", sorted(only_a))
if only_b: print("only in B:", sorted(only_b))
