#!/usr/bin/env python3
"""Decade-decomposition probe harness (round-15, verdict directive #5).

The round-14 `corpus_admission` fix came from a MEASURE-FIRST
decomposition: time the query's stages separately at each decade and read
which one owns the growth, instead of guessing from the plan. That table
was hand-run; this tool makes it one command, so every decade-2
adjudication (scale_gate violations, bench-exception probes) starts from
numbers.

Usage:
  python3 scripts/decompose.py QUERY [PROBE ...] [--scales 1,10,100]
                               [--out FILE]

QUERY is any `SparkEntry.queries` name; PROBEs are either more query
names or the bench-only probe forms registered in `graft.Bench`
(`probe_*` — named sub-stages of the heavy composites, e.g.
`probe_dvc_cand` / `probe_dvc_sh3` / `probe_dvc_inter` decompose
`dedup_verify_capped` into candidate generation, the trigram shingle
pass, and the pair-intersection verify).

Method matches scale_gate.py: scale 1 = sf0.1 with reps=3 medians after a
warm rep; scales 10/100 = the deterministic rehearsal slices
(scale_rehearsal.py, built on demand) with 1 scored rep after warm.
Exponents are per-decade log10 ratios. Output: a markdown table on
stdout (paste into SCALE.md) and a JSON artifact (default
/tmp/decompose_<QUERY>.json) for citation.
"""
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = "/root/testdata/sf0.1"
SLICES = {10: "/tmp/sfr10", 100: "/tmp/sfr100"}


def run_bench(sf_dir, queries, reps, out_path):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"),
               SPARK_GRAFT_REPS=str(reps),
               SPARK_GRAFT_ONLY=",".join(queries),
               SPARK_GRAFT_BENCH_OUT=out_path)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=REPO, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return json.load(open(out_path))


def ensure_slice(k):
    d = SLICES[k]
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        print(f"[decompose] building {k}x slice at {d}", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/scale_rehearsal.py"),
             str(k), d], check=True)
    return d


def main():
    args = sys.argv[1:]
    scales, out_file, names = [1, 10, 100], None, []
    i = 0
    while i < len(args):
        if args[i] == "--scales":
            scales = [int(x) for x in args[i + 1].split(",")]; i += 2
        elif args[i] == "--out":
            out_file = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    if not names:
        print(__doc__)
        return 2
    query = names[0]
    out_file = out_file or f"/tmp/decompose_{query}.json"

    per_scale = {}
    for k in sorted(scales):
        if k == 1:
            sf_dir, reps = SF1, 3
        else:
            sf_dir, reps = ensure_slice(k), 1
        print(f"[decompose] scale {k}x ({sf_dir}) reps={reps}", file=sys.stderr)
        b = run_bench(sf_dir, names, reps, f"/tmp/decompose_s{k}.json")
        per_scale[k] = {
            "queries": b.get("queries", {}),
            "spread": b.get("rel_spread", {}),
            "preload": b.get("preload"),
            "failed": b.get("failed", []),
        }

    ks = sorted(per_scale)
    hdr = ["stage"] + [f"t{k} s" for k in ks] + [
        f"exp {ks[j]}x->{ks[j+1]}x" for j in range(len(ks) - 1)]
    rows = []
    for n in names:
        ts = [per_scale[k]["queries"].get(n) for k in ks]
        exps = []
        for j in range(len(ks) - 1):
            a, b = ts[j], ts[j + 1]
            if a and b and a > 0 and b > 0:
                decades = math.log10(ks[j + 1] / ks[j])
                exps.append(round(math.log10(b / a) / decades, 2))
            else:
                exps.append(None)
        rows.append([n] + [None if t is None else round(t, 2) for t in ts] + exps)

    def fmt(v):
        return "-" if v is None else str(v)
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| " + " | ".join(fmt(v) for v in r) + " |")

    artifact = {"query": query, "stages": names, "scales": ks,
                "rows": {r[0]: r[1:] for r in rows},
                "per_scale": per_scale}
    with open(out_file, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"[decompose] artifact: {out_file}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
