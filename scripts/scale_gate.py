#!/usr/bin/env python3
"""Standing scale-rehearsal gate (round-10 verdict, next-round #2).

The manual 10x rehearsals recorded in SCALE.md caught three quadratics in
two rounds (dedup_verify_candidates 2.01, dedup_threshold_curve 1.17,
ann_decontaminate 1.50). This script makes the catch systematic: it
re-measures the PRESCRIBED sub-linear scale defaults at sf0.1 and at the
10x rehearsal slice, writes the committed `SCALE_REHEARSAL.json`
(query -> {t1, t10, ratio, exponent}), and exits 1 if any gated query's
exponent exceeds LIMIT - the same trip-wire discipline as
`selfhash_drift.py`, run at round close.

Usage: python3 scripts/scale_gate.py [--slice DIR] [--out FILE] [query...]

With no query args, gates GATED_QUERIES (the documented sub-linear
prescribed defaults; SCALE.md holds the provenance of each). The 10x
slice is built by scale_rehearsal.py into --slice (default /tmp/sfr10)
if absent, and reused otherwise - replication is deterministic, so reuse
is exact.

Method (matches SCALE.md): sf0.1 = median of SPARK_GRAFT_REPS=3 scored
reps after a warm rep; 10x = 1 scored rep after warm. Both via
graft.Bench (idle-gated, strict codegen), exponent = log10(t10/t1).
Queries faster than FLOOR_SEC at sf0.1 are reported but not gated - at
sub-half-second scale, JVM jitter dominates the ratio (SCALE.md's
vocab_growth measured "0.5x" that way).
"""
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = "/root/testdata/sf0.1"
LIMIT = 1.2
FLOOR_SEC = 0.35

# The prescribed sub-linear scale defaults (SCALE.md rehearsal tables).
# dedup_clusters / corpus_filter are documented LINEAR by design (connected
# components must touch every edge) and are deliberately not gated at 1.2.
GATED_QUERIES = [
    "dedup_verify_capped",          # SCALE.md: 0.66 (the r9 quadratic's fix)
    "dedup_threshold_curve_capped",  # 0.83 (the r10 1.17's fix)
    "ann_decontaminate_capped",     # 0.25 (the r10 1.50's fix)
    "ann_semdedup_capped",          # 0.14/0.61 (the r11 second-decade
                                    # 1.40's fix; the exact ann_semdedup is
                                    # now the documented quadratic baseline
                                    # and is NOT gated)
    "cdc_debezium_e2e",             # 0.58
    "corpus_admission",             # 0.81
    "cdc_incremental_snapshot",     # 0.40
    "corpus_token_budget",          # 0.41
    "corpus_funnel_order",          # 0.76
    "events_funnel",                # 0.21
    # round-11 wave-18/19 additions (first measured this round)
    "cdc_reconcile_repair",         # 0.58
    "events_session_stats",         # 0.63
    "mm_modality_mix",              # 0.96 (dominated by the linear
                                    # encode+decode of the media index)
    "events_gini",                  # 0.35 (sub-floor at sf0.1; reported)
    # round-11 wave-20 stream audits (two-decade avg exponents measured)
    "cdc_chain_integrity",          # 0.38/decade
    "cdc_heartbeat_gap",            # 0.67/decade
    "cdc_tombstone_gc",             # 0.42/decade
    # round-11 waves 22-25 (everything over the 0.35 s floor at sf0.1)
    "cdc_scd2",                     # keyed apply + lead windows
    "q_local_supplier_volume",      # the Q5 multi-join shape
    "q_disjunctive_revenue",        # Q19: pushed-conjunct disjunction
    "q_cold_customers",             # Q22: anti join + 1-row broadcast
    "q_big_basket",                 # Q18: HAVING subquery joined back
    "q_promo_revenue",              # Q14
    "q_top_supplier",               # Q15 argmax
    "events_growth_accounting",     # user-week ledger
    "events_pagerank",              # one lead pass + in-row fold
    "mm_aspect_buckets",            # decoded-dims ladder ledger
    "emb_centroid_cone",            # two corpus passes, dim-keyed sums
    "emb_dim_variance",             # dim-keyed sums
    "quality_ablation",             # one gopher-flag pass
    # round-11 wave 26
    "q_order_count_distribution",   # Q13: outer join + double aggregate
    "q_returned_revenue",           # Q10: pushed filter + keyed agg + heap
    # round-12: the four heavies the r11 verdict ordered through the
    # standing gate (second-decade spot checks recorded in SCALE.md)
    "mm_phash_clusters",            # banded Hamming pairs + star contraction
    "mm_frame_dedup",               # aHash → banded pairs → cluster agg
    # round-12 image-side scale fixes (SCALE.md round-12 table)
    "mm_phash_clusters_capped",     # 0.98/decade-2: 16-bit bands + cap + stars
    "mm_frame_dedup_capped",        # 0.91/decade-2
    "mm_phash_clusters_persisted",  # 0.61/decade-2: standing mmhash: index
    "split_contamination_matrix",   # cluster-index join, count-only cells
    "search_hybrid_rrf",            # cosine + trigram top-k rank fusion
    # round-12 TPC-H wave (Q1 full/Q6/Q7/Q8/Q9/Q17/Q21 shapes; the
    # sub-floor ones report without gating)
    "q_pricing_summary",
    "q_forecast_revenue",
    "q_volume_shipping",
    "q_market_share",
    "q_product_profit",
    "q_small_qty_revenue",
    "q_waiting_suppliers",
    # round-13: Q12 shape (one fact pass, conditional counts)
    "q_ship_priority_mix",
    # round-14: the fixed-batch bucket-pruned admission shape
    "corpus_admission_batch",
    # round-15: the heaviest CDC composite (verdict #6 — never had a
    # decade-2 row) and the linear-by-design contraction composite, both
    # promoted into the standing gate so their decade rows re-measure per
    # round instead of resting on narrative numbers
    "cdc_snapshot_tail",
    "dedup_clusters",
    # round-15: the bucket-pruned live ingest gate (fixed micro-batch)
    "dedup_ingest_gate_pruned",
    # round-15: the train-in-query heavy and its standing-pipeline twin
    # (decade exponents GATED net-of-training when train_t* is present --
    # training growth is attributed, not gated; gross stays in the report)
    "ann_ivfpq_topk",
    "ann_ivfpq_persisted",
    # round-17 (r16 verdict #5): the heaviest CDC composite families with
    # no decade row until now -- the envelope decode -> txn assembly ->
    # apply -> diff e2e path and the harness report
    "cdc_evaluate",
    # round-17: the admission index's maintenance-lifecycle query
    # (increments + re-bucket; build amortized once per JVM like the
    # other index-backed forms, so the row times the pruned gate)
    "corpus_admission_rebucket",
    # round-17: the concurrent-maintenance twins -- compacted fast path
    # and the between-compactions folded read (base + 2 pending delta
    # segments; the bucket prune pushes below the min-fold into every
    # segment's scan, so the folded row must scale like the plain one)
    "corpus_admission_concurrent",
    "corpus_admission_delta_gate",
]

# Queries whose prescriptions carry SECOND-decade (100x) numbers in
# SCALE.md: the standing gate re-measures these at the 100x slice too
# (one scored rep after warm), so a decade-2 regression trips the gate
# instead of living only in a narrative table (round-13 verdict #6).
# Gated against LIMIT on the 10x->100x exponent.
DECADE2_QUERIES = [
    "q_waiting_suppliers",    # SCALE.md r13: 12.26 s @100x, exponent 0.83
    "q_ship_priority_mix",    # SCALE.md r13: 4.81 s @100x, exponent 0.68
    "corpus_admission",       # SCALE.md r14: 10.3 s @100x, exponent 0.49
    "corpus_admission_batch", # SCALE.md r14: 3.2 s @100x, ~flat (O(batch))
    # the two historical second-decade quadratic catches: their capped
    # fixes carry the production composites, so a decade-2 regression
    # here is exactly what this stage exists to trip
    "dedup_verify_capped",    # SCALE.md r11: 57.0 s @100x, exponent 0.72
    "ann_semdedup_capped",    # SCALE.md r11: 15.2 s @100x, exponent 0.61
    # round-15 widening (verdict #1/#6): the steady heavy families whose
    # decade-2 claims were era-stale narrative numbers (r11-r13 one-shots)
    "dedup_clusters",              # SCALE.md r13: 48.3 s @100x, 0.69
    "ann_ivfpq_topk",              # train-in-query; never 100x-measured
    "ann_ivfpq_persisted",         # the standing-pipeline twin
    "mm_phash_clusters_capped",    # SCALE.md r12: 82.8 s @100x, 0.98
    "mm_frame_dedup_capped",       # SCALE.md r12: 49.3 s @100x, 0.91
    "mm_phash_clusters_persisted", # SCALE.md r12/r13: 0.61/0.69
    "cdc_snapshot_tail",           # heaviest CDC query; never 100x-measured
    "dedup_ingest_gate_pruned",    # round-15: must stay O(batch) like
                                   # corpus_admission_batch
    # round-16 (verdict #3): highest gated first-decade exponent (0.97,
    # ratio 9.25) with no 100x row until now; shares its heavy pass with
    # dedup_verify_capped (one verifyCandidates + a 5-row broadcast
    # fanout), so its decade-2 number should track verify_capped's
    "dedup_threshold_curve_capped",
    # round-17 (r16 verdict #5): the reference's core end-to-end path
    # (heaviest query family with no 100x row until now) and the harness
    # report composite -- the gate protects their exponents, not just
    # their components'
    "cdc_debezium_e2e",
    "cdc_evaluate",
]

# Measured at the 100x slice and RECORDED in the artifact but never
# gated: the exact recall-calibration baselines whose documented decade-2
# exponents sit at the limit by design (mm 1.15/1.11 at r12 — the capped/
# persisted twins above are the production defaults the gate protects).
# dedup_verify_candidates, the remaining exact baseline, is EXCLUDED even
# from the report tier: its measured 10x exponent is 2.01 (SCALE.md r9,
# 436 s at 10x) — a 100x run projects to ~12 h by design, which is the
# documented reason the capped form exists.
DECADE2_REPORT = [
    "mm_phash_clusters",
    "mm_frame_dedup",
]


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


def main():
    args = sys.argv[1:]
    slice_dir, out_file = "/tmp/sfr10", os.path.join(REPO, "SCALE_REHEARSAL.json")
    slice100_dir = "/tmp/sfr100"
    skip_d2 = False
    queries = []
    i = 0
    while i < len(args):
        if args[i] == "--slice":
            slice_dir = args[i + 1]; i += 2
        elif args[i] == "--slice100":
            slice100_dir = args[i + 1]; i += 2
        elif args[i] == "--no-decade2":
            skip_d2 = True; i += 1
        elif args[i] == "--out":
            out_file = args[i + 1]; i += 2
        else:
            queries.append(args[i]); i += 1
    if not queries:
        queries = GATED_QUERIES
    d2_queries = [] if skip_d2 else [
        q for q in DECADE2_QUERIES + DECADE2_REPORT if q in queries]

    if not os.path.exists(os.path.join(slice_dir, "documents.parquet")):
        print(f"[scale_gate] building 10x slice at {slice_dir}")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/scale_rehearsal.py"),
             "10", slice_dir], check=True)
    if d2_queries and not os.path.exists(
            os.path.join(slice100_dir, "documents.parquet")):
        print(f"[scale_gate] building 100x slice at {slice100_dir}")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/scale_rehearsal.py"),
             "100", slice100_dir], check=True)

    print(f"[scale_gate] sf0.1 reps=3 over {len(queries)} queries")
    b1 = run_bench(SF1, queries, 3, "/tmp/scale_gate_sf1.json")
    print("[scale_gate] 10x slice reps=1")
    b10 = run_bench(slice_dir, queries, 1, "/tmp/scale_gate_sf10.json")
    b100 = {}
    if d2_queries:
        print(f"[scale_gate] 100x slice reps=1 over {len(d2_queries)} "
              "decade-2 queries")
        b100 = run_bench(slice100_dir, d2_queries, 1,
                         "/tmp/scale_gate_sf100.json")

    report, violations, skipped = {}, [], []
    for q in sorted(queries):
        t1 = b1.get("queries", {}).get(q)
        t10 = b10.get("queries", {}).get(q)
        if t1 is None or t10 is None:
            violations.append(f"{q}: missing measurement "
                              f"(sf0.1={t1}, 10x={t10})")
            report[q] = {"t1": t1, "t10": t10, "error": "missing"}
            continue
        ratio = t10 / t1
        exponent = math.log10(ratio) if ratio > 0 else float("nan")
        gated = t1 >= FLOOR_SEC
        report[q] = {
            "t1": round(t1, 3), "t10": round(t10, 3),
            "ratio": round(ratio, 2), "exponent": round(exponent, 2),
            "gated": gated,
            "spread_t1": round(b1.get("rel_spread", {}).get(q, 0.0), 2),
        }
        # train-in-query attribution (ann_ivfpq & co): when train_sec is
        # present the GATE reads the exponent net-of-training (training
        # growth is a different axis -- the query's scan/join shape is
        # what the gate protects); gross stays in the report. Net decades
        # under FLOOR_SEC fall back to the gross exponent (a near-zero net
        # makes log-ratios meaningless).
        trains = {}
        for lbl, b in (("t1", b1), ("t10", b10), ("t100", b100)):
            tr = (b or {}).get("train_sec", {}).get(q)
            if tr is not None:
                report[q][f"train_{lbl}"] = round(tr, 3)
                trains[lbl] = tr

        def net_exp(ta, tb, la, lb):
            if not trains:
                return None
            # one-sided train attribution skews the subtraction (train
            # recorded at only the larger decade would UNDERSTATE growth
            # and could mask a violation): fall back to gross (r16 ADVICE)
            if (la in trains) != (lb in trains):
                print(f"  [scale_gate] {q}: train_sec at only one of "
                      f"{la}/{lb} — net exponent skipped, gross gates")
                return None
            na = max(ta - trains.get(la, 0.0), 0.0)
            nb = max(tb - trains.get(lb, 0.0), 0.0)
            # BOTH decades must clear the floor: a tiny-positive nb (the
            # train≈total degenerate case) yields a strongly-negative
            # exponent that would silently replace the gross one (r16
            # ADVICE) — the documented fallback is gross, not near-zero net
            if na < FLOOR_SEC or nb < FLOOR_SEC:
                return None
            return math.log10(nb / na)

        exp1_net = net_exp(t1, t10, "t1", "t10")
        if exp1_net is not None:
            report[q]["exponent_net"] = round(exp1_net, 2)
        t100 = b100.get("queries", {}).get(q)
        if t100 is not None and t10 > 0:
            exp2 = math.log10(t100 / t10)
            report[q]["t100"] = round(t100, 3)
            report[q]["exponent2"] = round(exp2, 2)
            exp2_net = net_exp(t10, t100, "t10", "t100")
            if exp2_net is not None:
                report[q]["exponent2_net"] = round(exp2_net, 2)
            exp2_gate = exp2 if exp2_net is None else exp2_net
            if q in DECADE2_REPORT:
                report[q]["decade2_report_only"] = True
            elif gated and exp2_gate > LIMIT:
                violations.append(
                    f"{q}: decade-2 exponent {exp2_gate:.2f} > {LIMIT}" +
                    (" (net of train)" if exp2_net is not None else ""))
        exp1_gate = exponent if exp1_net is None else exp1_net
        if not gated:
            skipped.append(q)
        elif exp1_gate > LIMIT:
            violations.append(
                f"{q}: exponent {exp1_gate:.2f} > {LIMIT}" +
                (" (net of train)" if exp1_net is not None else ""))

    artifact = {
        "limit": LIMIT,
        "floor_sec": FLOOR_SEC,
        "sf1": SF1,
        "slice": slice_dir,
        "slice100": slice100_dir if d2_queries else None,
        "queries": report,
        "not_gated_under_floor": skipped,
        "violations": violations,
        "ok": not violations,
        "contaminated_sf1": b1.get("contaminated", []),
        "preload": [b1.get("preload"), b10.get("preload")] +
                   ([b100.get("preload")] if d2_queries else []),
    }
    with open(out_file, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    for q, r in sorted(report.items()):
        print(f"  {q}: t1={r.get('t1')} t10={r.get('t10')} "
              f"exp={r.get('exponent')}{'' if r.get('gated') else ' (under floor, not gated)'}")
    if violations:
        print("SCALE GATE FAILED:")
        for v in violations:
            print(f"  {v}")
        return 1
    print(f"SCALE GATE OK ({sum(1 for r in report.values() if r.get('gated'))} "
          f"gated, {len(skipped)} under floor)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
