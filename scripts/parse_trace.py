"""Summarise a jax.profiler Chrome trace (vm.trace.json.gz): per-op SELF
time on the TPU 'XLA Ops' lane, mapped to source lines.

Usage: python scripts/parse_trace.py /tmp/jaxprof [n_frames] [top_k]
"""

import collections
import glob
import gzip
import json
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    nf = float(sys.argv[2]) if len(sys.argv) > 2 else 7.0
    topk = int(sys.argv[3]) if len(sys.argv) > 3 else 35
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops = [e for e in ev if e.get("ph") == "X"
           and tids.get((e["pid"], e["tid"])) == "XLA Ops"]
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack, self_t, child = [], collections.Counter(), {}
    meta = {}
    for e in ops:
        while stack and stack[-1]["ts"] + stack[-1]["dur"] <= e["ts"] + 1e-9:
            p = stack.pop()
            self_t[p["name"]] += p["dur"] - child.get(id(p), 0.0)
        if stack:
            child[id(stack[-1])] = child.get(id(stack[-1]), 0.0) + e["dur"]
        stack.append(e)
        a = e.get("args") or {}
        if e["name"] not in meta and a:
            meta[e["name"]] = a
    while stack:
        p = stack.pop()
        self_t[p["name"]] += p["dur"] - child.get(id(p), 0.0)

    total = sum(self_t.values()) / 1000.0
    print(f"device self-time {total:.1f} ms = {total/nf:.1f} ms/frame "
          f"({nf:g} frames)\n")
    by_src = collections.Counter()
    for n, d in self_t.items():
        a = meta.get(n, {})
        src = a.get("source", "") or "?"
        by_src[src] += d
    print("--- by source line (ms/frame) ---")
    for s, d in by_src.most_common(topk):
        print(f"{d/1000/nf:8.2f}  {s}")
    print("\n--- by op (ms/frame) ---")
    for n, d in self_t.most_common(topk):
        src = (meta.get(n, {}).get("source", "") or "")[-55:]
        print(f"{d/1000/nf:8.2f}  {n[:40]:40s} {src}")


if __name__ == "__main__":
    main()
