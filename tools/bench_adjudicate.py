#!/usr/bin/env python3
"""Standing per-round bench adjudication (VERDICT r6 ask #7): compare the
min-over-captures per-query seconds of this round's bench runs against the
previous round's, over ALL queries both rounds share, and flag anything past
the noise band for a mandatory plan-diff or noise adjudication before it can
be called a regression. The r5 noise episode (a 2x capture that three clean
re-runs showed was box noise) is the reason this is a standing artifact.

Usage:
  python3 tools/bench_adjudicate.py PREV.json RUN1.json [RUN2.json ...]

ANCHORING RULE (r14, VERDICT r13 ask #7): cross-round comparisons anchor on
the DRIVER's artifacts — PREV.json is the previous round's driver
BENCH_rNN.json (or the bench_results.json the driver's run wrote), and the
primary RUN is the current round's driver capture when one exists. Builder
captures may ride along as extra RUNx evidence, but they supplement the
driver baseline, never replace it. A capture whose warmup canary deviates
>1.5x from the best capture is FLAGGED as load-contaminated — flagged, not
excluded and not substituted: a regression verdict must not rest on a
contaminated capture alone, and an improvement claim must not rest on
discarding the driver's numbers (the r13 adjudication substituted a
builder-chosen baseline and headlined "zero regressions" while the driver's
HEAD run regressed 9 queries — this rule exists so that cannot recur).

PREV.json may be a prior round's bench_results.json / raw graft.Bench line
(with a `queries_min` or `queries` dict) or a driver BENCH_rNN.json wrapper
whose truncated `tail` string still carries per-query numbers. RUNx.json are
this round's captures (raw bench lines); per query the MIN across captures
is compared — min-vs-min is the noise-robust statistic.

Exit code: 0 when every shared query is within the band, 1 otherwise.
"""
import json
import re
import sys

BAND = 1.5  # min-vs-min ratio beyond which a named plan diff is required


def load_samples(path):
    """Per-query sample arrays, when the artifact carries them (round 10+:
    graft.Bench emits `samples`, 6 per sub-second query) — the variance
    data a breach adjudication must cite instead of plan-identity argument
    (VERDICT r9 'what's wrong' #2)."""
    try:
        d = json.load(open(path))
    except Exception:
        return {}
    s = d.get("samples")
    if isinstance(s, dict):
        return s
    parsed = d.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("samples"), dict):
        return parsed["samples"]
    return {}


def load_warmup(path):
    """The capture's warmup-pass wall time (round 13+: graft.Bench emits
    `warmup_sec`). The warmup is the same work in every capture of one
    build, so across captures it varies only with box load — the
    mechanical contamination signal (the r12 driver capture's false 1.45x
    headline is why this exists)."""
    try:
        d = json.load(open(path))
    except Exception:
        return None
    w = d.get("warmup_sec")
    if isinstance(w, (int, float)):
        return float(w)
    parsed = d.get("parsed")
    if isinstance(parsed, dict) and isinstance(
            parsed.get("warmup_sec"), (int, float)):
        return float(parsed["warmup_sec"])
    return None


WARMUP_BAND = 1.5  # warmup ratio vs the best capture beyond which a
                   # capture is marked load-contaminated


def load_queries(path):
    d = json.load(open(path))
    q = d.get("queries_min") or d.get("queries")
    if q:
        return q
    parsed = d.get("parsed")
    if isinstance(parsed, dict):
        q = parsed.get("queries_min") or parsed.get("queries")
        if q:
            return q
    tail = d.get("tail")
    if tail:
        # driver wrapper with a (possibly truncated) stdout tail: scrape
        # whatever per-query numbers survive
        return {
            name: float(val)
            for name, val in re.findall(r'"(q[0-9a-z_]+)":([0-9.]+)', tail)
        }
    raise SystemExit(f"{path}: no queries/queries_min/tail found")


def main(prev_path, run_paths):
    prev = {k: v for k, v in load_queries(prev_path).items() if v > 0}
    runs = [load_queries(p) for p in run_paths]

    # mechanical contamination check: a capture whose warmup-pass wall
    # time deviates >WARMUP_BAND from the best capture ran under external
    # load — marked (not excluded: the per-query MIN is already robust to
    # inflation, but a marked capture must not drive a regression verdict
    # on its own)
    warmups = [(p, load_warmup(p)) for p in run_paths]
    known = [w for _, w in warmups if w is not None]
    if known:
        best = min(known)
        print("capture warmups (load canary; same work per capture):")
        pw = load_warmup(prev_path)
        if pw is not None:
            # context only, never flagged: the prev anchor ran a DIFFERENT
            # build, so its warmup is not the same work as this round's
            print(f"  {prev_path}: {pw:.1f}s (prev anchor — different "
                  "build, not judged)")
        for p, w in warmups:
            if w is None:
                print(f"  {p}: no warmup_sec (pre-round-13 artifact)")
            elif w > best * WARMUP_BAND:
                print(f"  {p}: {w:.1f}s — CONTAMINATED "
                      f"({w / best:.2f}x the best capture's {best:.1f}s; "
                      "external load during the run; flagged, not excluded)")
            else:
                print(f"  {p}: {w:.1f}s")
        print()
    cur = {}
    for name in set().union(*[set(r) for r in runs]):
        vals = [r[name] for r in runs if r.get(name, -1) > 0]
        if vals:
            cur[name] = min(vals)

    shared = sorted(set(prev) & set(cur))
    only_prev = sorted(set(prev) - set(cur))
    only_cur = sorted(set(cur) - set(prev))

    rows = [(name, prev[name], cur[name], cur[name] / prev[name])
            for name in shared]
    rows.sort(key=lambda r: -r[3])

    print(f"{'query':26s} {'prev_min':>9s} {'cur_min':>9s} {'ratio':>7s}  verdict")
    flagged = []
    for name, p, c, ratio in rows:
        verdict = "within band" if ratio <= BAND else "NEEDS ADJUDICATION"
        if ratio > BAND:
            flagged.append((name, ratio))
        print(f"{name:26s} {p:9.3f} {c:9.3f} {ratio:6.2f}x  {verdict}")

    tp = sum(prev[n] for n in shared)
    tc = sum(cur[n] for n in shared)
    print(f"\nshared queries: {len(shared)}  "
          f"total prev {tp:.1f}s -> cur {tc:.1f}s ({tc / tp:.2f}x)")
    if only_cur:
        print(f"new this round ({len(only_cur)}): {', '.join(only_cur)}")
    if only_prev:
        print(f"dropped since prev ({len(only_prev)}): {', '.join(only_prev)}")
    if flagged:
        print(f"\n{len(flagged)} queries past the {BAND:.1f}x band — each needs "
              "a named plan diff or a clean-box noise adjudication:")
        samples = [load_samples(p) for p in run_paths]
        prev_samples = load_samples(prev_path)
        for name, ratio in flagged:
            print(f"  {name}: {ratio:.2f}x")
            for label, smap in [("prev", prev_samples)] + [
                    (f"run{i + 1}", s) for i, s in enumerate(samples)]:
                ss = smap.get(name)
                if ss:
                    lo, hi = min(ss), max(ss)
                    spread = (hi / lo) if lo > 0 else float("inf")
                    print(f"    {label} samples: "
                          f"[{', '.join(f'{x:.3f}' for x in ss)}] "
                          f"spread {spread:.2f}x")
        return 1
    print(f"\nall shared queries within the {BAND:.1f}x min-vs-min band")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2:]))
