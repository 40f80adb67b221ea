#!/usr/bin/env python3
"""Measure the reference (PyDI) at the FULL bench workload.

Round-3 advice: the 259 s rule-matching baseline was extrapolated from
100k pairs — run the real thing once. This drives PyDI's own
StandardBlocker and RuleBasedMatcher (per-pair Python loop, indexed
record lookups) over the sf0.1 EmScenario: 15,000 L × 13,500 R
customers → ~1.64M candidate pairs, the exact workload of the
`block_standard` / `match_rule` bench queries.

textdistance is not installed in this container, so the jaro-winkler
comparator is a pure-python stand-in with the same per-call cost
profile as textdistance's pure-python path; exact/numeric comparators
are plain callables — precisely how a PyDI user supplies custom
comparators (rule_based.py accepts Callable comparators).

Usage: python3 scripts/baseline_pydi.py [sfdir] [--pairs-cap N]
Emits one JSON line with measured stage seconds.
"""
import json
import sys
import time
import types

import pandas as pd

# Load the reference modules without executing the package __init__
# (which pulls optional LLM deps absent here).
sys.path.insert(0, "/root/reference")
for name, path in [
    ("PyDI", "/root/reference/PyDI"),
    ("PyDI.entitymatching", "/root/reference/PyDI/entitymatching"),
    ("PyDI.entitymatching.blocking",
     "/root/reference/PyDI/entitymatching/blocking"),
]:
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    sys.modules[name] = mod

from PyDI.entitymatching.rule_based import RuleBasedMatcher  # noqa: E402
from PyDI.entitymatching.blocking.standard import StandardBlocker  # noqa: E402


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1) -> float:
    j = jaro(s1, s2)
    pref = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        pref += 1
    return j + pref * p * (1.0 - j)


def name_jw(r1: pd.Series, r2: pd.Series) -> float:
    return jaro_winkler(str(r1["name"]), str(r2["name"]))


def seg_exact(r1: pd.Series, r2: pd.Series) -> float:
    return 1.0 if r1["seg"] == r2["seg"] else 0.0


def bal_abs(r1: pd.Series, r2: pd.Series) -> float:
    return max(0.0, 1.0 - abs(float(r1["bal"]) - float(r2["bal"])) / 1000.0)


def main() -> None:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cap = None
    if "--pairs-cap" in sys.argv:
        cap = int(sys.argv[sys.argv.index("--pairs-cap") + 1])

    cust = pd.read_parquet(f"{sfdir}/customer.parquet")
    left = pd.DataFrame({
        "id": cust.c_custkey,
        "name": cust.c_name.str.lower(),
        "seg": cust.c_mktsegment,
        "nat": cust.c_nationkey,
        "bal": cust.c_acctbal,
    })
    rm = cust[cust.c_custkey % 10 != 3]
    right = pd.DataFrame({
        "id": rm.c_custkey + 10_000_000,
        "name": rm.c_name.str.lower() + " r",
        "seg": rm.c_mktsegment,
        "nat": rm.c_nationkey,
        "bal": (rm.c_acctbal * 1.01).round(2),
    })

    t0 = time.time()
    blocker = StandardBlocker(left, right, on=["seg", "nat"], id_column="id")
    candidates = pd.concat(list(blocker), ignore_index=True)
    t_block = time.time() - t0
    n_pairs = len(candidates)
    if cap:
        candidates = candidates.head(cap)

    t0 = time.time()
    matcher = RuleBasedMatcher()
    corr = matcher.match(
        left, right, candidates, id_column="id",
        comparators=[name_jw, seg_exact, bal_abs],
        weights=[0.6, 0.2, 0.2], threshold=0.97)
    t_match = time.time() - t0

    print(json.dumps({
        "sf": sfdir,
        "n_left": len(left), "n_right": len(right),
        "n_candidate_pairs": n_pairs,
        "n_pairs_scored": len(candidates),
        "n_matches": len(corr),
        "block_sec": round(t_block, 2),
        "match_sec": round(t_match, 2),
    }))


if __name__ == "__main__":
    main()
