#!/usr/bin/env python3
"""Round-6 bench adjudication (VERDICT r5 ask #3): compare the min-over-runs
per-query seconds of N fresh clean bench runs against the BENCH_r04 mins for
the 9-query cluster the driver's r5 capture showed ~2x slower, and report
which side of the +-40% noise band each lands on.

Usage: python3 tools/bench_adjudicate.py run1.json [run2.json ...]
Each runN.json is one graft.Bench stdout line (the {"metric":...} object).
"""
import json
import re
import sys

CLUSTER = [
    "q_k_anonymity", "q_k_enforce", "q_k_enforce_multi", "q_key_skew",
    "q_knn_classify", "q_lang_id", "q_lang_confusion", "q_lm_bigram",
    "q_lm_surprisal",
]


def r4_mins():
    """BENCH_r04's per-query numbers live in its truncated `tail` string
    (min-of-2 protocol). All nine cluster queries happen to survive the
    truncation; parse them out.
    """
    tail = json.load(open("BENCH_r04.json"))["tail"]
    out = {}
    for name in CLUSTER:
        m = re.search(rf'"{name}":([0-9.]+)', tail)
        if m:
            out[name] = float(m.group(1))
    return out


def main(paths):
    runs = []
    for p in paths:
        d = json.load(open(p))
        runs.append(d.get("queries_min") or d["queries"])
    r4 = r4_mins()
    print(f"{'query':22s} {'r4_min':>8s} {'r6_min':>8s} {'ratio':>7s}  verdict")
    worst = 0.0
    for name in CLUSTER:
        if name not in r4:
            print(f"{name:22s} missing from BENCH_r04 tail")
            continue
        mins = [r[name] for r in runs if r.get(name, -1) > 0]
        if not mins:
            print(f"{name:22s} no clean sample")
            continue
        m6 = min(mins)
        ratio = m6 / r4[name]
        worst = max(worst, ratio)
        verdict = "within band" if ratio <= 1.4 else "REGRESSION?"
        print(f"{name:22s} {r4[name]:8.3f} {m6:8.3f} {ratio:6.2f}x  {verdict}")
    print(f"\nworst ratio {worst:.2f}x vs the +-40% band (1.40x)")


if __name__ == "__main__":
    main(sys.argv[1:])
