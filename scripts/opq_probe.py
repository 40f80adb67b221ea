#!/usr/bin/env python3
"""OPQ-rotation probe (r13, verdict ask #4): does a FIT-FREE
deterministic rotation before the PQ subspace split buy recall at
equal bytes on the driver-generated embedding corpus?

Replicates the engine's PQ tier bit-for-bit (books = first 16 vectors
per subspace, nearest-book codes with code-asc ties, floor(1e9) ADC,
(adc, vec_id) ranking — the replica reproduces the evaluator's
recall_milli = 340 exactly) and measures recall@5 vs the cosine brute
truth for each candidate rotation:

  pq (plain, contiguous split)        340   <-- winner
  pq + stride permutation             240
  pq + Hadamard (sign=(-1)^pc(i&j))   320
  pq + Hadamard + stride              240
  pq + variance-snake allocation      180
  pq + variance-round-robin           340   (tie, not a win)

Why rotation cannot help HERE: OPQ's lever is rebalancing
variance/correlation across subspaces, and this corpus is already
balanced — per-subspace variance sums are 0.255/0.250/0.249/0.243 in
the NATURAL order (the snake allocation "improves" that spread to
0.250..0.249 and still LOSES 160 milli, because it scrambles the
local correlation the codes exploit). Per the keep-only-if-it-wins
criterion, no rotation tier ships; this probe is the evidence.

Usage: python3 scripts/opq_probe.py [sfdir]
"""
import sys

import numpy as np
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
t = pq.read_table(f"{sfdir}/embeddings.parquet")
v = np.array(t["embedding"].to_pylist(), dtype=np.float64)
ids = np.array(t["vec_id"].to_pylist())
order = np.argsort(ids)
v, ids = v[order], ids[order]
n, dim = v.shape
M, K = 4, 16
sub = dim // M

qidx = np.where(ids < 10)[0]
norms = np.linalg.norm(v, axis=1)


def brute_top5(qi):
    sims = (v @ v[qi]) / (norms * norms[qi])
    sims[qi] = -np.inf
    r = np.round(sims, 7)
    idx = sorted(range(n), key=lambda j: (-r[j], ids[j]))
    return set(ids[idx[:5]])


truth = {ids[qi]: brute_top5(qi) for qi in qidx}


def pq_recall(x):
    books = x[:K]
    codes = np.zeros((n, M), dtype=int)
    for m in range(M):
        seg = x[:, m * sub:(m + 1) * sub]
        bs = books[:, m * sub:(m + 1) * sub]
        codes[:, m] = np.argmin(
            ((seg[:, None, :] - bs[None, :, :]) ** 2).sum(-1), axis=1)
    hits = 0
    for qi in qidx:
        dq = np.array([((books[:, m * sub:(m + 1) * sub]
                         - x[qi, m * sub:(m + 1) * sub]) ** 2).sum(-1)
                       for m in range(M)])
        adc = np.array([sum(np.floor(dq[m, codes[j, m]] * 1e9)
                            for m in range(M)) for j in range(n)])
        adc[qi] = np.inf
        idx = sorted(range(n), key=lambda j: (adc[j], ids[j]))[:5]
        hits += len(set(ids[idx]) & truth[ids[qi]])
    return hits * 1000 // (5 * len(qidx))


perm_stride = np.arange(dim).reshape(sub, M).T.flatten()
H = np.array([[(-1) ** bin(i & j).count("1") for j in range(dim)]
              for i in range(dim)])
vm = np.round(v * 1000)  # milli fixed-point keeps the transform exact
had = vm @ H.T

var = v.var(axis=0)
sdims = np.argsort(-var)
alloc = [[] for _ in range(M)]
for r in range(sub):
    grp = sdims[r * M:(r + 1) * M]
    if r % 2:
        grp = grp[::-1]
    for m in range(M):
        alloc[m].append(grp[m])
snake = np.concatenate(alloc)
rrob = np.concatenate([sdims[m::M] for m in range(M)])

print("pq (plain)      ", pq_recall(v))
print("pq+stride       ", pq_recall(v[:, perm_stride]))
print("pq+hadamard     ", pq_recall(had))
print("pq+had+stride   ", pq_recall(had[:, perm_stride]))
print("pq+var-snake    ", pq_recall(v[:, snake]))
print("pq+var-roundrob ", pq_recall(v[:, rrob]))
for name, p in [("natural", np.arange(dim)), ("snake", snake)]:
    pv = [v[:, p][:, m * sub:(m + 1) * sub].var(axis=0).sum()
          for m in range(M)]
    print(f"{name} subspace variance sums:",
          [f"{a:.3f}" for a in pv])
