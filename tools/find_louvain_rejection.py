#!/usr/bin/env python3
"""Search for a tiny bigram corpus whose q322 Louvain level-1 move
phase REJECTS a round (synchronous parallel moves that do not
strictly improve exact Q) while the last-accepted and last-unrolled
label tables coarsen to DIFFERENT coarse graphs — the regime the r13
ADVICE medium finding says the q322 oracle must replay correctly.

Simulates exactly the operator/oracle arithmetic: md5 parity gate,
2m*wvc - k*sigx integer gain, (score desc, lbl asc) tie-break,
strict-improvement accept, prefix-min stop.
"""
import hashlib
import itertools
import random


def par(a: str) -> int:
    return int(hashlib.md5(a.encode()).hexdigest()[:7], 16) % 2


def simulate(edges, max_rounds):
    """edges: dict (a,b)->w directed input (a!=b). Returns
    (trace, labels_per_round, last_accepted_round)."""
    und = {}
    for (a, b), w in edges.items():
        und[(a, b)] = und.get((a, b), 0) + w
        und[(b, a)] = und.get((b, a), 0) + w
    nodes = sorted({a for a, _ in und})
    deg = {n: 0 for n in nodes}
    for (a, b), w in und.items():
        deg[a] += w
    m2 = sum(und.values())

    def qnum(lbl):
        intra = 0
        degw = {}
        for (a, b), w in und.items():
            if lbl[a] == lbl[b]:
                intra += w
            degw[lbl[a]] = degw.get(lbl[a], 0) + w
        return intra * m2 - sum(v * v for v in degw.values())

    labels = {n: n for n in nodes}
    tables = [dict(labels)]
    trace = [(0, 0, len(set(labels.values())), qnum(labels))]
    q_prev = trace[0][3]
    last_acc = 0
    for r in range(1, max_rounds + 1):
        sig = {}
        for n in nodes:
            sig[labels[n]] = sig.get(labels[n], 0) + deg[n]
        nxt = {}
        nmoves = 0
        for a in nodes:
            la = labels[a]
            cand = {la: 0}
            for (x, b), w in und.items():
                if x == a and b != a:
                    cand[labels[b]] = cand.get(labels[b], 0) + w
            best = None
            for lb, wvc in cand.items():
                sigx = sig[lb] - deg[a] if lb == la else sig[lb]
                score = m2 * wvc - deg[a] * sigx
                key = (-score, lb)
                if best is None or key < best:
                    best = key
            stay_sigx = sig[la] - deg[a]
            stay = m2 * cand[la] - deg[a] * stay_sigx
            best_s, best_l = -best[0], best[1]
            if par(a) == r % 2 and best_s > stay:
                nxt[a] = best_l
            else:
                nxt[a] = la
            if nxt[a] != la:
                nmoves += 1
        qn = qnum(nxt)
        if qn > q_prev:
            labels = nxt
            tables.append(dict(labels))
            trace.append((r, nmoves, len(set(labels.values())), qn))
            q_prev = qn
            last_acc = r
        else:
            tables.append(dict(nxt))  # the REJECTED table (oracle l$r)
            trace.append((r, nmoves, len(set(nxt.values())), qn))
            break
    return trace, tables, last_acc


def coarse_of(und_edges, lbl):
    c = {}
    for (a, b), w in und_edges.items():
        c[(lbl[a], lbl[b])] = c.get((lbl[a], lbl[b]), 0) + w
    return c


def main():
    rng = random.Random(14)
    words = [w for w in (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo "
        "sierra tango uniform victor whiskey xray yankee zulu").split()]
    p0 = [w for w in words if par(w) == 0]
    p1 = [w for w in words if par(w) == 1]
    print(f"parity0: {p0}\nparity1: {p1}")
    tried = 0
    for trial in range(200000):
        n0 = rng.randint(1, 3)
        n1 = rng.randint(2, 4)
        ns = rng.sample(p0, n0) + rng.sample(p1, n1)
        edges = {}
        pairs = list(itertools.combinations(sorted(ns), 2))
        rng.shuffle(pairs)
        for pair in pairs[: rng.randint(2, min(7, len(pairs)))]:
            edges[pair] = rng.randint(1, 4)
        if len({x for e in edges for x in e}) < len(ns):
            continue
        tried += 1
        trace, tables, last_acc = simulate(edges, 2)
        rejected = len(trace) - 1 > last_acc
        if not rejected:
            continue
        # need the rejected table to coarsen DIFFERENTLY
        und = {}
        for (a, b), w in edges.items():
            und[(a, b)] = und.get((a, b), 0) + w
            und[(b, a)] = und.get((b, a), 0) + w
        c_acc = coarse_of(und, tables[last_acc])
        c_rej = coarse_of(und, tables[-1])
        if c_acc == c_rej:
            continue
        # prefer a fixture where round 1 accepts and round 2 rejects
        # (exercises both branches)
        if last_acc != 1:
            continue
        print(f"\nFOUND after {tried} candidates (trial {trial}):")
        print(f"edges: {edges}")
        print(f"trace: {trace}")
        print(f"last accepted round: {last_acc}")
        print(f"labels accepted: {tables[last_acc]}")
        print(f"labels rejected (oracle l2 if unguarded): {tables[-1]}")
        print(f"coarse(accepted): {sorted(c_acc.items())}")
        print(f"coarse(rejected): {sorted(c_rej.items())}")
        docs = []
        for (a, b), w in sorted(edges.items()):
            docs += [f"{a} {b}"] * w
        print(f"docs ({len(docs)}): {docs}")
        return
    print(f"no fixture found in {tried} candidates")


if __name__ == "__main__":
    main()
