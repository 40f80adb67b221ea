#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py [sfdir] [verify_out]
Runs each oracle_sql.json query in DuckDB against the sf parquet tables
and strictly compares (schema, rows, values) with the Spark dump.

Memory architecture (r13, after the r12 driver gate OOM'd 5 oracles at
KILOBYTE-scale allocations — box starvation, not heavy SQL; all 5 were
judge-re-verified correct):
 1. Each oracle runs in its OWN forked child process. Memory truly
    returns to the OS after every query — a shared process accrues
    non-evictable DuckDB buffer-pool state across 250+ queries until a
    later query OOMs at ANY limit (the r11->r12 failure mode; a "fresh
    connection" in the same process was not enough). A child that the
    OOM-killer or a DuckDB abort takes down costs ONE query, not the
    whole gate.
 2. memory_limit=4GB (was 24GB). The slimmed heavy oracles pass at
    200MB (r12 judge verification); a 24GB bound invites DuckDB to grow
    into a box a 48g bench JVM already owns, and DuckDB only engages
    spill when it nears ITS OWN limit — so the limit must sit well
    below the box, not at it. 2GB broke 18 recursive-CTE oracles in
    r11 testing; at 4GB, 270/271 oracles pass at sf0.01 (measured,
    ORACLE_PEAKS.json). The one exception (ann_recall_eval — 7 index
    pipelines in one SQL) gets an escalate-on-OOM retry in a fresh
    child at 12GB: the steady-state footprint stays bounded at 4GB and
    a big bound is requested only for the query that provably needs
    it, never held for the whole 271-query sweep.
 3. Heaviest-first ordering: queries run in descending measured-peak
    order (ORACLE_PEAKS.json at the repo root, written by --peaks),
    so the biggest allocations happen while the box is freshest.
 4. Every run re-measures per-query peak RSS (child ru_maxrss) and
    writes {out}/oracle_peaks.json, so the next starvation is
    diagnosable from the artifact alone: a query that OOMs with a
    historical peak of 120MB is a starved box, not a heavy oracle.
"""
import glob
import json
import multiprocessing as mp
import os
import pathlib
import resource
import sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
MEM_LIMIT = os.environ.get("GRAFT_ORACLE_MEM", "4GB")
MEM_ESCALATED = os.environ.get("GRAFT_ORACLE_MEM_BIG", "12GB")
TIMEOUT_S = int(os.environ.get("GRAFT_ORACLE_TIMEOUT", "900"))
REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def run_one(q, sql, limit, pipe):
    """Child body: fresh DuckDB, run + compare, report a small dict."""
    import duckdb  # inherited via fork; import is a no-op

    baseline_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    def peak_mb():
        kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        return max(0, (kb - baseline_kb) // 1024)

    try:
        con = duckdb.connect()
        con.execute(f"SET memory_limit='{limit}'")
        con.execute(f"SET temp_directory='{out}/.duck_spill'")
        for p in glob.glob(f"{sfdir}/*.parquet"):
            con.execute(
                f"CREATE VIEW {pathlib.Path(p).stem} AS "
                f"SELECT * FROM read_parquet('{p}')")
        got = con.execute(
            f"SELECT * FROM read_parquet('{out}/{q}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
        con.close()
    except Exception as e:
        pipe.send({"ok": False, "peak_mb": peak_mb(),
                   "problems": [f"{type(e).__name__}: {e}"]})
        return
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    problems = []
    if list(got.columns) != list(exp.columns):
        problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
    elif got.shape != exp.shape:
        problems.append(f"shape {got.shape} != {exp.shape}")
    else:
        if [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
            problems.append(
                f"dtypes {list(map(str, got.dtypes))} != "
                f"{list(map(str, exp.dtypes))}")
        neq = got.astype(str) != exp.astype(str)
        if neq.any().any():
            bad = neq.any(axis=1)
            problems.append(
                "values:\nspark:\n" + got[bad].head(3).to_string()
                + "\nduck:\n" + exp[bad].head(3).to_string())
    pipe.send({"ok": not problems, "rows": int(got.shape[0]),
               "peak_mb": peak_mb(), "problems": problems})


def main():
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # Heaviest-first: measured peaks from the committed artifact; a query
    # without history (a new operator) runs first, conservatively.
    hist = {}
    peaks_file = REPO_ROOT / "ORACLE_PEAKS.json"
    if peaks_file.exists():
        try:
            hist = json.load(open(peaks_file)).get("peaks_mb", {})
        except Exception:
            hist = {}
    order = sorted(oracle, key=lambda q: (-hist.get(q, 1 << 30), q))

    ctx = mp.get_context("fork")
    fails = 0
    peaks = {}
    escalated = []

    def run_in_child(q, limit):
        rx, tx = ctx.Pipe(duplex=False)
        child = ctx.Process(target=run_one, args=(q, oracle[q], limit, tx))
        child.start()
        tx.close()
        res = None
        if rx.poll(TIMEOUT_S):
            try:
                res = rx.recv()
            except EOFError:
                res = None
        child.join(30)
        if child.is_alive():
            child.kill()
            child.join()
        return res, child.exitcode

    for q in order:
        res, exitcode = run_in_child(q, MEM_LIMIT)
        # escalate ONLY memory deaths, once, in a fresh child: the
        # steady-state bound stays at MEM_LIMIT and the big bound is
        # held exactly as long as the one query that needs it
        oomed = (res is None or
                 any("OutOfMemory" in p for p in res.get("problems", [])))
        if oomed:
            escalated.append(q)
            res, exitcode = run_in_child(q, MEM_ESCALATED)
        if res is None:
            fails += 1
            print(f"FAIL {q}: child died (exitcode={exitcode}) — "
                  f"OOM-kill or timeout; see oracle_peaks.json history")
            continue
        peaks[q] = res["peak_mb"]
        lim = f", limit {MEM_ESCALATED}" if q in escalated else ""
        if res["ok"]:
            print(f"OK   {q} ({res['rows']} rows, peak {res['peak_mb']}MB{lim})")
        else:
            fails += 1
            print(f"FAIL {q}: " + "; ".join(res["problems"]))
    art = {"memory_limit": MEM_LIMIT, "escalated_limit": MEM_ESCALATED,
           "escalated": sorted(escalated), "sfdir": sfdir,
           "max_peak_mb": max(peaks.values(), default=0),
           "peaks_mb": {k: peaks[k] for k in sorted(peaks)}}
    with open(f"{out}/oracle_peaks.json", "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    if "--peaks" in sys.argv:  # refresh the committed ordering artifact
        with open(peaks_file, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True)
    print(f"{len(oracle) - fails}/{len(oracle)} oracle-matched "
          f"(peak {art['max_peak_mb']}MB, limit {MEM_LIMIT})")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
