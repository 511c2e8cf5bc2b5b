#!/usr/bin/env python3
"""Summarize a scaling_campaign7 run: per-leg rows + best-of efficiency.

Usage: python3 tools/campaign_table.py [/tmp]
Reads /tmp/scaling_r5c_{32_rN,8_rN,8b_rN,2_rN,ck,cd}.log + the main log's
loadavg notes; prints the markdown rows for BENCH/BASELINE.md.
"""
import glob, json, re, sys, os

base = sys.argv[1] if len(sys.argv) > 1 else "/tmp"

def leg_metrics(tag):
    out = []
    for f in sorted(glob.glob(f"{base}/scaling_r5c_{tag}_r*.log")):
        rep = re.search(r"_r(\d+)\.log", f).group(1)
        for line in open(f, errors="replace"):
            if line.startswith('{"metric":"oneshot suite"'):
                d = json.loads(line)
                out.append((int(rep), d["cores"], d["sec"], d["docs_per_sec"]))
    return out

loads = {}
main = f"{base}/scaling_r5c_main.log"
if os.path.exists(main):
    for line in open(main):
        m = re.search(r"suite leg cores=(\d+) tag=(\S+) start load=([\d.]+)", line)
        if m:
            loads[m.group(2)] = m.group(3)

def table(pairs, lo, hi, title):
    rows_lo = [r for r in pairs if r[1] == lo]
    rows_hi = [r for r in pairs if r[1] == hi]
    if not rows_lo or not rows_hi:
        print(f"{title}: incomplete ({len(rows_lo)} lo / {len(rows_hi)} hi legs)")
        return
    print(f"\n### {title}")
    print("| rep | cores | start load | wall | throughput |")
    print("|---|---|---|---|---|")
    for rep, c, sec, dps in sorted(rows_lo + rows_hi):
        tag = f"{c}_r{rep}" if (c in (32, 8) and title.startswith("8")) or c in (32,) else f"{'8b' if c == 8 and title.startswith('2') else c}_r{rep}"
        ld = loads.get(f"{c}_r{rep}") or loads.get(f"8b_r{rep}" if c == 8 else "", "?")
        print(f"| {rep} | {c} | {ld} | {sec:.1f} s | {dps/1000:.0f} k docs/s |")
    blo = min(r[2] for r in rows_lo)
    bhi = min(r[2] for r in rows_hi)
    eff = blo / (4.0 * bhi)
    print(f"best T{lo} = {blo:.1f} s, best T{hi} = {bhi:.1f} s -> "
          f"efficiency T{lo}/(4*T{hi}) = {eff:.3f}")

# primary 8/32 pair: tags 32_rN + 8_rN
prim = leg_metrics("32") + leg_metrics("8")
table(prim, 8, 32, "8 -> 32 cores (primary N=8)")

# secondary 2/8 pair: tags 8b_rN + 2_rN
sec = leg_metrics("8b") + leg_metrics("2")
table(sec, 2, 8, "2 -> 8 cores (below the write-bus knee)")

# compute pairs
for tag in ("ck", "cd"):
    f = f"{base}/scaling_r5c_{tag}.log"
    if os.path.exists(f):
        print(f"\n### compute {tag}")
        for line in open(f, errors="replace"):
            if line.startswith('{"metric":"compute scaling'):
                print(line.strip())
            elif "[scaling] compute" in line:
                print(line.strip())
