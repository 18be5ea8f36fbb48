#!/usr/bin/env python3
"""Round-15 bench re-pin: snapshot the outgoing r14 baseline into
BASELINE_HISTORY.json, re-pin q331 (its r15 mechanism-vs-declaration
containment probes add ~0.35 s of bounded anti-join jobs) and q336
(the r14 VERDICT ask #2 — its pin was a single run; now a quiet
median, and the r15 grid-clip fix adds one bounded maxU job), append
median pins for the four new queries (q337-q340), refresh the
__sentinel pin, then regenerate BASELINE_EARLIEST.json.

The systematic early-pin sweep (r14 VERDICT ask #8) ran first: per
query, the quiet-run median (h2 a/b/c sentinels 0.985/0.998/1.065 +
both h1 runs 0.953/0.637) against its pin — ONLY q331 exceeded
1.25x, and its mechanism is the r15 code change, not drift; every
r1-r8-era sub-second pin read at or under ~1.2x. The three r14
closing-bench advisory flags (q47 1.86x, q179 1.75x, q163 1.39x)
did NOT reproduce in any quiet run (q47 0.615/0.626/0.635 vs pin
0.742; q179 0.847/0.806 vs 0.903; q163 0.494/0.604 vs 0.643) —
adjudicated transient per-query variance (the documented
batch-composition class); pins kept. Evidence in SCALE.md."""
import json
import statistics

H2_RUNS = [f"target/bench_h2_r15{x}.json" for x in "abcd"]
H1_RUNS = [f"target/bench_h1_r15{x}.json" for x in "ab"]


def load(path):
    return json.load(open(path))


def main():
    h2 = [load(p) for p in H2_RUNS]
    h1 = [load(p) for p in H1_RUNS]
    bb = json.load(open("BENCH_BASELINE.json"))

    # 1. snapshot outgoing baseline under its round key
    hist = json.load(open("BASELINE_HISTORY.json"))
    if "r14" not in hist["rounds"]:
        hist["rounds"]["r14"] = {
            "total": bb.get("value"),
            "n_queries": bb.get("n_queries"),
            "note": "outgoing r14 pins snapshotted before the r15 "
                    "re-pin (q331 containment-probe mechanism, q336 "
                    "re-median, q337-q340 appends)",
            "queries": dict(bb["queries"]),
        }
        json.dump(hist, open("BASELINE_HISTORY.json", "w"), indent=1)
        print("snapshotted r14 into history")

    def med(q, rs):
        vals = [r["queries"][q] for r in rs if q in r["queries"]]
        return (statistics.median(vals), len(vals), vals)

    # 2. mechanism re-pins: q331 (r15 keyed-domain containment
    # probes), q336 (single-run pin -> quiet median; r15 grid fix
    # adds the bounded maxU job). Quiet h2 runs = a/b/c.
    for q in ["q331_dp_parallel_ledger", "q336_sq8_calibration"]:
        m, n, vals = med(q, h2[:3])
        old = bb["queries"][q]
        bb["queries"][q] = round(m, 6)
        print(f"re-pin {q}: {old} -> {m:.3f} (median of {n}: "
              f"{[round(v, 3) for v in vals]})")

    # 3. new-query pins (present in runs b/c/d)
    for q in ["q337_gif_scenes", "q338_dp_user_level",
              "q339_dp_zcdp_ledger", "q340_nbest_encode"]:
        m, n, vals = med(q, h2)
        if n < 2:
            print(f"SKIP {q}: only {n} observations")
            continue
        bb["queries"][q] = round(m, 6)
        print(f"pin {q}: {m:.3f} (median of {n}: "
              f"{[round(v, 3) for v in vals]})")

    # 4. sentinel pin: warm (min-of-passes) medians across every run
    sents = [r["sentinel_sec"] for r in h2 + h1 if "sentinel_sec" in r]
    bb["__sentinel"] = round(statistics.median(sents), 3)
    print(f"__sentinel pin: {bb['__sentinel']} (from {sents})")

    bb["n_queries"] = len(bb["queries"])
    bb["value"] = round(sum(bb["queries"].values()), 3)
    bb["note"] = (
        "r15 pins: r14 file + q331 re-pinned (the r15 "
        "mechanism-vs-declaration containment probes are real added "
        "work) and q336 re-medianed (r14 ask #2; the r15 grid-clip "
        "fix adds one bounded maxU job), q337-q340 appended as "
        "medians of the quiet r15 h2 runs, __sentinel refreshed. The "
        "r14 ask #8 sweep found NO other pin whose quiet median "
        "exceeded 1.25x (SCALE.md 'r14 advisory flags adjudication "
        "and early-pin sweep'); the q47/q179/q163 closing-bench "
        "flags did not reproduce and their pins are kept.")
    json.dump(bb, open("BENCH_BASELINE.json", "w"), indent=1)
    print(f"BENCH_BASELINE: {bb['n_queries']} pins, sum {bb['value']}")

    # 5. regenerate earliest (history rounds + the new r15 file)
    hist = json.load(open("BASELINE_HISTORY.json"))
    earliest = {}
    pinned_at = {}
    rounds = sorted(hist["rounds"], key=lambda k: int(k[1:]))
    for rk in rounds:
        for q, v in hist["rounds"][rk]["queries"].items():
            if q not in earliest:
                earliest[q] = v
                pinned_at[q] = rk
    for q, v in bb["queries"].items():
        if q not in earliest:
            earliest[q] = v
            pinned_at[q] = "r15"
    e = json.load(open("BASELINE_EARLIEST.json"))
    e["queries"] = dict(sorted(earliest.items()))
    e["pinned_at"] = dict(sorted(pinned_at.items()))
    json.dump(e, open("BASELINE_EARLIEST.json", "w"), indent=1)
    print(f"BASELINE_EARLIEST: {len(earliest)} rows")


if __name__ == "__main__":
    main()
