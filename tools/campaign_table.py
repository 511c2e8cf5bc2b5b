#!/usr/bin/env python3
"""Summarize a round-5 scaling campaign run: per-leg rows + best-of
efficiency for each core pair present, plus the compute-isolated pairs.

Usage: python3 tools/campaign_table.py [campaign] [dir]
  campaign: r5c (campaign 7, 30 M suite pairs + 8->32 compute keyscan),
            r5d (campaign 8, 120 M headline suite pair + 32-core row),
            r5e (campaign 9, compute pairs at 2->8)   [default: all]
  dir: where the logs live                            [default: /tmp]

Reads <dir>/scaling_<campaign>_<tag>.log (suite tags NN_rK, compute tags
ck/cd/ck2/cd2) + the main log's loadavg notes; prints the markdown rows
behind the tables in BENCH/BASELINE.md.
"""
import glob, json, re, sys, os

args = [a for a in sys.argv[1:]]
wanted = [a for a in args if a.startswith("r5")] or ["r5c", "r5d", "r5e"]
base = next((a for a in args if not a.startswith("r5")), "/tmp")


def leg_metrics(pref, tag):
    out = []
    for f in sorted(glob.glob(f"{base}/scaling_{pref}_{tag}_r*.log")):
        rep = re.search(r"_r(\d+)\.log", f).group(1)
        for line in open(f, errors="replace"):
            if line.startswith('{"metric":"oneshot suite"'):
                d = json.loads(line)
                out.append((int(rep), d["cores"], d["sec"], d["docs_per_sec"]))
    return out


def loads_of(pref):
    loads = {}
    main = f"{base}/scaling_{pref}_main.log"
    if os.path.exists(main):
        for line in open(main):
            m = re.search(r"suite leg cores=(\d+) tag=(\S+) start load=([\d.]+)", line)
            if m:
                loads[m.group(2)] = m.group(3)
    return loads


def table(pairs, loads, lo, hi, title, lo_tag=None):
    rows_lo = [r for r in pairs if r[1] == lo]
    rows_hi = [r for r in pairs if r[1] == hi]
    if not rows_lo or not rows_hi:
        print(f"{title}: incomplete ({len(rows_lo)} lo / {len(rows_hi)} hi legs)")
        return
    print(f"\n### {title}")
    print("| rep | cores | start load | wall | throughput |")
    print("|---|---|---|---|---|")
    for rep, c, sec, dps in sorted(rows_lo + rows_hi):
        keys = [f"{c}_r{rep}"]
        if lo_tag and c == lo:
            keys.insert(0, f"{lo_tag}_r{rep}")
        ld = next((loads[k] for k in keys if k in loads), "?")
        print(f"| {rep} | {c} | {ld} | {sec:.1f} s | {dps/1000:.0f} k docs/s |")
    blo = min(r[2] for r in rows_lo)
    bhi = min(r[2] for r in rows_hi)
    eff = blo / (4.0 * bhi)
    print(f"best T{lo} = {blo:.1f} s, best T{hi} = {bhi:.1f} s -> "
          f"efficiency T{lo}/(4*T{hi}) = {eff:.3f}")


def compute_blocks(pref, tags):
    for tag in tags:
        f = f"{base}/scaling_{pref}_{tag}.log"
        if os.path.exists(f):
            print(f"\n### compute {pref}/{tag}")
            for line in open(f, errors="replace"):
                if line.startswith('{"metric":"compute scaling'):
                    print(line.strip())
                elif "[scaling] compute" in line:
                    print(line.strip())


for pref in wanted:
    loads = loads_of(pref)
    print(f"\n## campaign logs scaling_{pref}_* ({base})")
    if pref == "r5c":
        # primary 8/32 pair (tags 32_rN + 8_rN), secondary 2/8 (8b_rN + 2_rN)
        table(leg_metrics(pref, "32") + leg_metrics(pref, "8"), loads,
              8, 32, "8 -> 32 cores (primary N=8)")
        table(leg_metrics(pref, "8b") + leg_metrics(pref, "2"), loads,
              2, 8, "2 -> 8 cores (below the write-bus knee)", lo_tag=None)
        compute_blocks(pref, ("ck", "cd"))
    else:
        legs = sum((leg_metrics(pref, t) for t in ("32", "8", "2")), [])
        table(legs, loads, 2, 8, "2 -> 8 cores (headline pair)")
        table(legs, loads, 8, 32, "8 -> 32 cores")
        compute_blocks(pref, ("ck", "cd", "ck2", "cd2"))
