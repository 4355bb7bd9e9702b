#!/usr/bin/env python3
"""Cross-round SELFHASH drift gate.

Usage: python3 scripts/selfhash_drift.py OLD.json NEW.json [REPORT.json]

Compares the canonical per-query self-hashes of two graft.Verify runs
(typically: the previous round's committed SELFHASH.json vs this round's
fresh one). A hash that moved while its DEFINITION fingerprint (sha256 of
the oracle SQL, present since round 10) did not move means either silent
engine nondeterminism or driver testdata drift — both must fail loudly,
not ride into the round-close commit.

Exit 1 iff any query's hash moved with an unchanged definition (or the
two runs used different SF dirs). Writes a JSON report (default
SELFHASH_DRIFT.json next to NEW.json's repo copy) either way.

Old files from rounds before 10 lack "defs"; every moved hash is then
reported as "moved_def_unknown" and gates the same as moved_same_def —
a pre-10 baseline can't prove the definition changed.
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    report_path = sys.argv[3] if len(sys.argv) > 3 else "SELFHASH_DRIFT.json"
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old.get("queries", {}), new.get("queries", {})
    od, nd = old.get("defs", {}), new.get("defs", {})
    sf_mismatch = (old.get("sf") is not None and new.get("sf") is not None
                   and old["sf"] != new["sf"])
    moved_same_def, moved_def_changed, moved_def_unknown = [], [], []
    for name in sorted(set(oq) & set(nq)):
        if oq[name] == nq[name]:
            continue
        if name in od and name in nd:
            (moved_def_changed if od[name] != nd[name]
             else moved_same_def).append(name)
        else:
            moved_def_unknown.append(name)
    unstable = [k for k, v in new.get("double_run", {}).items()
                if not v.get("stable", True)]
    report = {
        "old": old_path, "new": new_path,
        "old_sf": old.get("sf"), "new_sf": new.get("sf"),
        "sf_mismatch": sf_mismatch,
        "compared": len(set(oq) & set(nq)),
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "moved_same_def": moved_same_def,
        "moved_def_changed": moved_def_changed,
        "moved_def_unknown": moved_def_unknown,
        "double_run_unstable": unstable,
        "ok": not (moved_same_def or moved_def_unknown or unstable
                   or sf_mismatch),
    }
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(report, indent=1, sort_keys=True))
    if not report["ok"]:
        print("DRIFT GATE FAILED", file=sys.stderr)
        sys.exit(1)
    print("drift gate ok: "
          f"{report['compared']} compared, "
          f"{len(moved_def_changed)} moved with changed definitions, "
          f"{len(report['added'])} added, {len(report['removed'])} removed")


if __name__ == "__main__":
    main()
