#!/usr/bin/env python3
"""Round-14 bench re-pin: snapshot the outgoing r13 baseline into
BASELINE_HISTORY.json, re-pin q24/q322 from the round's quiet full-run
medians (the r13 VERDICT ask-#1 adjudication), append median pins for
the seven new queries (q328-q334) and the __sentinel ambient probe,
then regenerate BASELINE_EARLIEST.json."""
import json
import statistics
import sys

H2_RUNS = [f"/tmp/bench_h2_run{i}.log" for i in range(1, 7)]
H1_RUNS = ["/tmp/bench_h1_run1.log", "/tmp/bench_h1_run2.log"]


def load_metric(path):
    for l in open(path):
        if '"metric"' in l:
            return json.loads(l[l.index("{"):])
    return None


def main():
    runs = [load_metric(p) for p in H2_RUNS]
    runs = [r for r in runs if r]
    h1 = [load_metric(p) for p in H1_RUNS]
    h1 = [r for r in h1 if r]
    print(f"h2 runs: {len(runs)}, h1 runs: {len(h1)}")

    bb = json.load(open("BENCH_BASELINE.json"))

    # 1. snapshot outgoing baseline under its round key
    hist = json.load(open("BASELINE_HISTORY.json"))
    if "r13" not in hist["rounds"]:
        hist["rounds"]["r13"] = {
            "total": bb.get("value"),
            "n_queries": bb.get("n_queries"),
            "note": "outgoing r13 pins snapshotted before the r14 "
                    "re-pin (q24/q322 adjudication + q328-q334 "
                    "appends + __sentinel)",
            "queries": dict(bb["queries"]),
        }
        json.dump(hist, open("BASELINE_HISTORY.json", "w"), indent=1)
        print("snapshotted r13 into history")

    def med(q, rs):
        vals = [r["queries"][q] for r in rs if q in r["queries"]]
        return (statistics.median(vals), len(vals), vals)

    # 2. adjudication re-pins (quiet h2 full-run medians)
    for q in ["q24_lang_id", "q322_louvain_two_level"]:
        m, n, vals = med(q, runs)
        old = bb["queries"][q]
        bb["queries"][q] = round(m, 6)
        print(f"re-pin {q}: {old} -> {m:.3f} (median of {n}: "
              f"{[round(v,3) for v in vals]})")

    # 3. new-query pins
    for q in ["q328_ivf_retrain", "q329_audio_sweep",
              "q330_unigram_lm", "q331_dp_parallel_ledger",
              "q332_weighted_paths", "q333_unigram_encode",
              "q334_encoding_repair"]:
        m, n, vals = med(q, runs)
        if n < 2:
            print(f"SKIP {q}: only {n} observations"); continue
        bb["queries"][q] = round(m, 6)
        print(f"pin {q}: {m:.3f} (median of {n}: "
              f"{[round(v,3) for v in vals]})")

    # 4. sentinel pin: warm (min-of-passes) medians across every run
    sents = [r["sentinel_sec"] for r in runs + h1 if "sentinel_sec" in r]
    bb["__sentinel"] = round(statistics.median(sents), 3)
    print(f"__sentinel pin: {bb['__sentinel']} (from {sents})")

    bb["n_queries"] = len(bb["queries"])
    bb["value"] = round(sum(bb["queries"].values()), 3)
    bb["note"] = (
        "r14 pins: r13 file + q24/q322 re-pinned from the round-14 "
        "adjudication (median of 6 quiet h2 full runs — SCALE.md "
        "'r13 advisory flags adjudication'), q328-q334 appended as "
        "medians of the closing full h2 runs, and __sentinel = the "
        "ambient-probe warm median (graft.Bench annotates advisory "
        "tripwires with measured ambient ratio against it).")
    json.dump(bb, open("BENCH_BASELINE.json", "w"), indent=1)
    print(f"BENCH_BASELINE: {bb['n_queries']} pins, sum {bb['value']}")

    # 5. regenerate earliest (history rounds + the new r14 file)
    hist = json.load(open("BASELINE_HISTORY.json"))
    earliest = {}
    pinned_at = {}
    rounds = sorted(hist["rounds"],
                    key=lambda k: int(k[1:]))
    for rk in rounds:
        for q, v in hist["rounds"][rk]["queries"].items():
            if q not in earliest:
                earliest[q] = v
                pinned_at[q] = rk
    for q, v in bb["queries"].items():
        if q not in earliest:
            earliest[q] = v
            pinned_at[q] = "r14"
    e = json.load(open("BASELINE_EARLIEST.json"))
    e["queries"] = dict(sorted(earliest.items()))
    e["pinned_at"] = dict(sorted(pinned_at.items()))
    json.dump(e, open("BASELINE_EARLIEST.json", "w"), indent=1)
    print(f"BASELINE_EARLIEST: {len(earliest)} rows")


if __name__ == "__main__":
    main()
