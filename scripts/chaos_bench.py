#!/usr/bin/env python3
"""Chaos-test the bench's control defense (r11 verdict task 6).

Runs the SAME small Bench sweep three ways and checks the harness's
claims hold under each regime:

  idle      — no interference:          expect load=clean, box_speed ~1
  midload   — N CPU hogs spun up MID-sweep for a window: expect the
              control to drift => reruns > 0 and/or verdict=flagged,
              while medians of queries measured in unloaded reps stay
              within band of the idle run
  fullload  — hogs for the WHOLE run:   the per-rep drift test goes
              blind (the control min itself converges to the loaded
              floor) — THIS is the documented detection floor — but
              box_speed (control_base / idle floor) must move up,
              which is exactly what it was added for (r11 verdict #1)

The hog window is keyed off Bench's "BENCH SWEEP BEGIN" stderr marker
(streamed via Popen), not the sbt launch time — cold compiles and the
warmup/baseline phases make wall-clock offsets from launch land the
hogs in the wrong phase (r12 review pass). "fullload" starts its hogs
at launch on purpose: loading the baseline phase too is the scenario
being tested.

Usage: python3 scripts/chaos_bench.py [n_hogs] [midload_start_s] [midload_dur_s]
(midload_start_s counts from the SWEEP BEGIN marker.)
Prints a PASS/FAIL verdict per claim plus the three JSON lines.
"""
import json
import os
import subprocess
import sys
import threading
from multiprocessing import Process

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from benchjson import last_total, split_queries

N_HOGS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
MID_START = int(sys.argv[2]) if len(sys.argv) > 2 else 10
MID_DUR = int(sys.argv[3]) if len(sys.argv) > 3 else 45
TIMEOUT_S = 2400

QUERIES = ("q01_pricing_summary,q03_distinct_agg,q06_join_3way,q07_join_left,"
           "q15_window_running,q17_topk,q21_distinct,q25_rollup,q33_window_range,"
           "q37_math_funcs,q47_stats_agg,q54_tpch_q5")


def hog():
    while True:
        pass


def run_bench(label, hogs_at=None, hogs_for=0, n_hogs=0, from_marker=True,
              cpus="32", queries=QUERIES, reps="3"):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.01",
               SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_REPS=reps,
               SPARK_GRAFT_BUDGET="100000",
               SPARK_GRAFT_ONLY=queries)
    hogs = []
    lock = threading.Lock()
    # arm state (r12 ADVICE + r13 ADVICE): records not just THAT
    # start_hogs fired but WHEN relative to the sweep window — a Timer
    # that fires after the bench already printed its final JSON (short
    # sweep, late marker) injected no load into any measured rep, and
    # must read as INCONCLUSIVE, not as a defense failure.
    armed = []          # "armed" or "late" per start_hogs firing
    json_seen = []      # non-empty once the final bench JSON was read

    def start_hogs():
        with lock:
            hogs.extend(Process(target=hog, daemon=True) for _ in range(n_hogs))
            for h in hogs:
                h.start()
            state = "late" if json_seen else "armed"
            armed.append(state)
        print(f"[{label}] {len(hogs)} hogs ON ({state})", flush=True)

    def stop_hogs():
        with lock:
            for h in hogs:
                h.terminate()
            n = len(hogs)
            hogs.clear()
        if n:
            print(f"[{label}] hogs OFF", flush=True)

    timers = []

    def arm(delay_start):
        t1 = threading.Timer(delay_start, start_hogs)
        t2 = threading.Timer(delay_start + hogs_for, stop_hogs)
        for t in (t1, t2):
            t.daemon = True
            t.start()
        timers.extend((t1, t2))

    print(f"[{label}] launching bench (cpus={cpus} reps={reps})", flush=True)
    proc = subprocess.Popen(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # arm AFTER Popen: a Timer(0)-forked hog racing Popen in another
    # thread inherits the stdout pipe's WRITE end mid-fork, so the reader
    # never sees EOF after the bench exits and the whole harness wedges
    # with hogs left burning (observed r13: 75 min zombie + 24 live hogs)
    if hogs_at is not None and not from_marker:
        arm(hogs_at)
    lines = []
    try:
        def read_stream():
            # readline, NOT file iteration: the iterator's read-ahead
            # buffers ~8 KB before yielding, and Bench prints nothing
            # between the marker and the final JSON — so the marker used
            # to arrive only at process exit and the hogs armed AFTER the
            # sweep (r13: midload measured zero inflation twice)
            for ln in iter(proc.stdout.readline, ""):
                lines.append(ln)
                if '"metric":"total"' in ln:
                    json_seen.append(True)
                if (hogs_at is not None and from_marker
                        and "BENCH SWEEP BEGIN" in ln and not timers):
                    arm(hogs_at)
        reader = threading.Thread(target=read_stream, daemon=True)
        reader.start()
        reader.join(TIMEOUT_S)
        if reader.is_alive():
            proc.kill()
            print(f"[{label}] TIMED OUT after {TIMEOUT_S}s — counting as FAIL",
                  flush=True)
            return None, "late" if "late" in armed else ("armed" if armed else "never")
        try:
            proc.wait(60)
        except subprocess.TimeoutExpired:
            proc.kill()
    finally:
        for t in timers:
            t.cancel()
        stop_hogs()
        if proc.poll() is None:
            proc.kill()
    d = last_total("".join(lines))
    if d is None:
        tail = "".join(lines)[-800:]
        print(f"[{label}] no bench JSON found; tail: {tail}", flush=True)
    return d, "late" if "late" in armed else ("armed" if armed else "never")


def main():
    results, armed = {}, {}
    results["idle"], armed["idle"] = run_bench("idle")
    results["midload"], armed["midload"] = run_bench(
        "midload", hogs_at=MID_START, hogs_for=MID_DUR, n_hogs=N_HOGS)
    results["fullload"], armed["fullload"] = run_bench(
        "fullload", hogs_at=0, hogs_for=10 ** 6, n_hogs=N_HOGS,
        from_marker=False)
    # r12 verdict #6: the box_speed floor is only calibrated at cpus=32;
    # at any other parallelism Bench must emit box_speed/total_norm null
    # rather than a mis-normalized figure. One tiny run asserts that path.
    results["noncanon"], armed["noncanon"] = run_bench(
        "noncanon", cpus="8", queries="q01_pricing_summary", reps="1")
    for k, v in results.items():
        if v is None:
            print(f"JSON {k}: <no result>")
            continue
        slim = {kk: v.get(kk) for kk in
                ("value", "load", "box_speed", "total_norm", "control")}
        print(f"JSON {k}: {json.dumps(slim)}")

    checks = [("all four runs produced a bench line",
               all(v is not None for v in results.values()))]
    if checks[0][1]:
        idle, mid, full = results["idle"], results["midload"], results["fullload"]
        checks.append(("idle run is clean", idle["load"] == "clean"))
        checks.append(("idle box_speed ~1 (0.6-1.6)",
                       idle.get("box_speed") is not None
                       and 0.6 <= idle["box_speed"] <= 1.6))
        # distinguish "load was never injected" from "harness failed to
        # defend" (r12 ADVICE): a midload run whose hogs never armed —
        # marker line changed, stdout buffering — is INCONCLUSIVE, and
        # must not read as a defense failure.
        if armed["midload"] != "armed":
            why = ("hogs fired only after the final bench JSON — no "
                   "measured rep saw load" if armed["midload"] == "late"
                   else "hogs never started — check the 'BENCH SWEEP "
                   "BEGIN' marker")
            checks.append((f"midload {why} (INCONCLUSIVE, not a defense "
                           "failure)", False))
        else:
            defended = (mid["control"]["reruns"] > 0 or mid["load"] == "flagged")
            checks.append(("mid-sweep load triggers reruns and/or flagged",
                           defended))
        # medians of reps the control accepted must stay comparable: compare
        # per-query medians idle vs midload, excluding queries the harness
        # itself kept-and-flagged and queries errored in either run. Band is
        # generous (2x + 0.3s) — the claim is "not corrupted", not "identical".
        flagged = set(mid["control"].get("flagged", []))
        idle_ok, _ = split_queries(idle)
        mid_ok, _ = split_queries(mid)
        bad = [q for q, t in mid_ok.items()
               if q not in flagged and q in idle_ok
               and t > 2.0 * idle_ok[q] + 0.3]
        checks.append((f"unflagged midload medians within band (outliers: {bad})",
                       not bad))
        if armed["fullload"] != "armed":
            checks.append(("fullload hogs never/late started — load was "
                           "never injected (INCONCLUSIVE, not a defense "
                           "failure)", False))
        else:
            # absolute + relative: a pure 1.5x-idle ratio is flaky when
            # the idle box itself wobbles (r13: idle box_speed read 1.17
            # and 1.47 on adjacent runs). The claim is "diffuse full-run
            # load shows MATERIALLY in box_speed".
            checks.append(("full-load box_speed materially up (>=1.4 abs, "
                           ">=1.15x idle)",
                           full.get("box_speed") is not None
                           and full["box_speed"] >= 1.4
                           and full["box_speed"] >= 1.15 * idle["box_speed"]))
        nc = results["noncanon"]
        checks.append(("non-canonical cpus emits box_speed/total_norm null",
                       nc.get("box_speed") is None
                       and nc.get("total_norm") is None))
    ok = True
    for name, passed in checks:
        print(f"{'PASS' if passed else 'FAIL'} {name}")
        ok &= passed
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
