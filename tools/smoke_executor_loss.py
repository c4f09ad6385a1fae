#!/usr/bin/env python3
"""Executor-loss recovery smoke: SIGKILL a worker JVM mid-iterative-loop.

SMOKE_LOCAL_CLUSTER.md proves multi-JVM hash PARITY; this tool proves
RECOVERY — the actual fault-tolerance claim behind the r12
reliable-checkpoint mode (`plans/graph_algos._cut_lineage`). On a
1000-executor cluster, executors are lost routinely; an iterative loop
whose lineage cuts pin blocks to executors (`localCheckpoint`) cannot
recompute them after the loss, while reliable `.checkpoint()` re-reads
the cut state from shared storage and the stage retry machinery replays
only the lost work.

Two scenarios, each mode in its own subprocess, master =
local-cluster[2,4,4096] (two REAL worker JVMs), victim ancestry-checked
so only this run's executors are ever touched:

  dedup_clusters (iterative CC loop):
    kill when the 2nd lineage cut completes (edges + initial labels —
    the loop is about to start).
    --mode reliable   : checkpoint dir configured -> .checkpoint() path.
                        MUST complete and hash-match the no-fault
                        local[8] baseline — the recovery claim under test.
    --mode local-ckpt : no checkpoint dir -> .localCheckpoint() path.
                        Contrast case, outcome RECORDED not gated: blocks
                        pinned to the killed executor are unrecoverable,
                        so the expected outcome is a job failure
                        ("Checkpoint block ... not found"). If the kill
                        lands where no pinned block is lost the job can
                        survive — the report says which happened.

  stream_upsert_sink (ST3 exactly-once foreachBatch MERGE sink):
    kill at the first tx_upsert entry — micro-batch 1's MERGE commit is
    beginning when the executor dies; the entry's second (replay) pass
    then runs on the replacement executor. MUST complete with the
    baseline hash: task retries re-execute MERGE work at-least-once, and
    the manifest-pointer commit keeps the table exactly-once. No
    reliable/local-ckpt contrast exists here (Structured Streaming's
    fault tolerance is task retry + sink idempotence, no graph
    checkpoint involved).

Kill signals are event-based, not sleep-based: the subprocess wraps
`_cut_lineage` / `tx_upsert` and fires at the exact call, so the kill
lands inside the intended window deterministically regardless of load.

Usage:
    python tools/smoke_executor_loss.py --out SMOKE_EXECUTOR_LOSS_r13.json
    python tools/smoke_executor_loss.py --mode reliable --out /tmp/r.json
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR_DEFAULT = "/root/testdata/sf0.001"
CLUSTER_MASTER = "local-cluster[2,4,4096]"

# Per-entry kill signal: install a hook that sets the Event at the point
# in the query where the kill should land (event-based, never sleep-tuned).
#   dedup_clusters     — after the 2nd _cut_lineage (edges + initial labels
#                        cut ⇒ the iterative CC loop is about to start)
#   stream_upsert_sink — at the 1st tx_upsert entry (micro-batch 1's MERGE
#                        is beginning ⇒ the executor dies under the
#                        exactly-once sink commit; the replay pass then
#                        runs on the replacement executor)


def _install_cc_hook(fire) -> None:
    from gfe_db_spark.plans import graph_algos

    orig = graph_algos._cut_lineage
    calls = {"n": 0}

    def counting_cut(df):
        res = orig(df)
        calls["n"] += 1
        if calls["n"] == 2:
            fire()
        return res

    graph_algos._cut_lineage = counting_cut


def _install_tx_hook(fire) -> None:
    from gfe_db_spark.plans import txtable

    orig = txtable.tx_upsert
    fired = {"done": False}

    def signalling_upsert(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            fire()
        return orig(*a, **kw)

    txtable.tx_upsert = signalling_upsert


SCENARIO_HOOKS = {
    "dedup_clusters": _install_cc_hook,
    "stream_upsert_sink": _install_tx_hook,
}


def _descendant_executor_pids() -> list[int]:
    """Pids of CoarseGrainedExecutorBackend JVMs descended from THIS
    process (never another session's cluster: ancestry is walked through
    the ps ppid chain back to os.getpid())."""
    out = subprocess.run(
        ["ps", "-eo", "pid,ppid,args"], capture_output=True, text=True
    ).stdout
    ppid_of: dict[int, int] = {}
    execs: list[int] = []
    for line in out.splitlines()[1:]:
        parts = line.split(None, 2)
        if len(parts) < 3:
            continue
        try:
            pid, ppid = int(parts[0]), int(parts[1])
        except ValueError:
            continue
        ppid_of[pid] = ppid
        if "CoarseGrainedExecutorBackend" in parts[2]:
            execs.append(pid)
    me = os.getpid()

    def is_mine(pid: int) -> bool:
        seen = 0
        while pid > 1 and seen < 32:
            if pid == me:
                return True
            pid = ppid_of.get(pid, 1)
            seen += 1
        return False

    return sorted(p for p in execs if is_mine(p))


def run_one_mode(mode: str, out_path: str, sf_dir: str, entry: str) -> None:
    from pyspark.sql import SparkSession

    report: dict = {"mode": mode, "entry": entry}
    master = "local[8]" if mode == "baseline" else CLUSTER_MASTER
    builder = (
        SparkSession.builder.master(master)
        .appName(f"smoke_executor_loss_{mode}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.executorEnv.PYTHONPATH", _REPO)
    )
    if master.startswith("local-cluster"):
        builder = builder.config("spark.executor.memory", "2g")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = None
    try:
        if mode == "reliable":
            ckpt = tempfile.mkdtemp(prefix="smoke_loss_ckpt_")
            spark.sparkContext.setCheckpointDir(ckpt)
            report["checkpoint_dir"] = True

        kill_state: dict = {}
        if mode != "baseline":
            # install the entry's event-based kill signal, then kill one
            # executor the moment it fires
            kill_point = threading.Event()
            SCENARIO_HOOKS[entry](kill_point.set)

            def killer():
                if not kill_point.wait(timeout=300):
                    kill_state["error"] = "kill point never reached"
                    return
                pids = _descendant_executor_pids()
                if not pids:
                    kill_state["error"] = "no executor pids found"
                    return
                victim = pids[0]
                os.kill(victim, signal.SIGKILL)
                kill_state["killed_pid"] = victim
                kill_state["kill_monotonic"] = time.monotonic()
                print(f"[{mode}] SIGKILL executor JVM {victim} "
                      f"(of {pids})", flush=True)

            threading.Thread(target=killer, daemon=True).start()

        from gfe_db_spark.queries import all_queries
        from tools.smoke_local_cluster import result_hash

        t0 = time.monotonic()
        try:
            pdf = all_queries()[entry].fn(spark, sf_dir).toPandas()
            report.update(
                completed=True,
                hash=result_hash(pdf),
                rows=len(pdf),
                wall_s=round(time.monotonic() - t0, 1),
            )
        except Exception as e:
            report.update(
                completed=False,
                error=f"{type(e).__name__}: {str(e)[:2000]}",
                wall_s=round(time.monotonic() - t0, 1),
            )
        if mode != "baseline":
            # the kill must have landed BEFORE the job ended, else the
            # scenario didn't execute and the run is invalid
            report["kill"] = kill_state
            report["kill_before_end"] = (
                "kill_monotonic" in kill_state
                and kill_state["kill_monotonic"] < time.monotonic()
                and kill_state["kill_monotonic"] - t0 < report["wall_s"]
            )
            if "killed_pid" in kill_state:
                # give ps a beat; a SIGKILLed JVM must be gone
                time.sleep(1.0)
                report["victim_gone"] = (
                    kill_state["killed_pid"] not in _descendant_executor_pids()
                )
    finally:
        spark.stop()
        if ckpt:
            import shutil

            shutil.rmtree(ckpt, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[{mode}] {report}", flush=True)


# (entry, modes): the recovery run is the mode named "reliable" for the
# iterative-loop scenario (graph checkpoint dir configured) and
# "local-ckpt" for the streaming sink (Structured Streaming's fault
# tolerance is task retry + idempotent MERGE sink — no graph checkpoint
# involved, so no reliable/local-ckpt contrast exists for it).
SCENARIOS = [
    ("dedup_clusters", ("baseline", "reliable", "local-ckpt"), "reliable"),
    ("stream_upsert_sink", ("baseline", "local-ckpt"), "local-ckpt"),
]


def orchestrate(sf_dir: str, out: str | None) -> int:
    tmp = tempfile.mkdtemp(prefix="smoke_loss_")
    report = {"sf_dir": sf_dir, "cluster_master": CLUSTER_MASTER, "scenarios": {}}
    all_ok = True
    for entry, modes, recovery_mode in SCENARIOS:
        results = {}
        for mode in modes:
            path = os.path.join(tmp, f"{entry}.{mode}.json")
            t0 = time.monotonic()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--mode", mode, "--entry", entry,
                 "--out", path, "--sf-dir", sf_dir],
                cwd=_REPO,
            )
            print(f"== {entry}/{mode}: rc={proc.returncode} "
                  f"({time.monotonic() - t0:.0f}s)", flush=True)
            if proc.returncode != 0 or not os.path.exists(path):
                return 2
            results[mode] = json.load(open(path))

        base, rec = results["baseline"], results[recovery_mode]
        recovered = (
            rec.get("completed")
            and rec.get("kill_before_end")
            and rec.get("victim_gone")
            and rec.get("hash") == base.get("hash")
            and rec.get("rows") == base.get("rows")
        )
        all_ok = all_ok and recovered
        scen = {"runs": results, "recovery_mode": recovery_mode,
                "recovered": bool(recovered)}
        # the iterative-loop scenario also records the localCheckpoint
        # contrast outcome (not gated — see module docstring)
        if recovery_mode != "local-ckpt" and "local-ckpt" in results:
            loc = results["local-ckpt"]
            scen["local_ckpt_outcome"] = (
                "failed as expected"
                if not loc.get("completed") and loc.get("kill_before_end")
                else "survived (kill missed every pinned block)"
                if loc.get("completed") and loc.get("kill_before_end")
                else "scenario did not execute"
            )
        report["scenarios"][entry] = scen
    report["ok"] = all_ok
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"EXECUTOR-LOSS SMOKE {'PASS' if all_ok else 'FAIL'}", flush=True)
    return 0 if all_ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["baseline", "reliable", "local-ckpt"])
    ap.add_argument("--entry", default="dedup_clusters",
                    choices=sorted(SCENARIO_HOOKS))
    ap.add_argument("--out")
    ap.add_argument("--sf-dir", default=SF_DIR_DEFAULT)
    args = ap.parse_args()
    if args.mode:
        run_one_mode(args.mode, args.out, args.sf_dir, args.entry)
        return 0
    return orchestrate(args.sf_dir, args.out)


if __name__ == "__main__":
    raise SystemExit(main())
