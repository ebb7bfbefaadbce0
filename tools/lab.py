#!/usr/bin/env python
"""Persistent TPU lab: executes queued python scripts in ONE process.

Every fresh TPU client process pays a 10-25 min remote-worker handshake
before its first dispatch (ROADMAP "Known environment fact"); this runner
amortizes ONE handshake over arbitrarily many measurement/sweep scripts.

Protocol:
  lab/queue/NNN_name.py   scripts, executed in sorted order
  lab/out/NNN_name.log    combined stdout+stderr of each script
  lab/done/NNN_name.py    moved here on completion (`.FAILED` marker on error)
  lab/STOP                touch to stop the loop after the current script

A dead TPU worker (UNAVAILABLE) poisons the whole process: the runner exits
with status 3 so tools/run_resumable.sh can relaunch it (fresh handshake).
Scripts run via runpy in this process and share the live JAX client.
"""
import contextlib
import os
import runpy
import shutil
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAB = os.path.join(ROOT, "lab")
QUEUE, DONE, OUT = [os.path.join(LAB, d) for d in ("queue", "done", "out")]


def fatal(e) -> bool:
    s = f"{type(e).__name__}: {e}"
    return ("UNAVAILABLE" in s or "worker process crashed" in s
            or "RESOURCE_EXHAUSTED" in s)


def main():
    os.chdir(ROOT)
    sys.path.insert(0, ROOT)
    for d in (QUEUE, DONE, OUT):
        os.makedirs(d, exist_ok=True)
    stop = os.path.join(LAB, "STOP")

    t0 = time.time()
    import jax
    dev = jax.devices()
    import jax.numpy as jnp
    float(jnp.zeros(8).sum())          # force the handshake NOW
    print(f"### lab up: {dev} handshake+first-dispatch "
          f"{time.time()-t0:.0f}s", flush=True)

    while True:
        if os.path.exists(stop):
            print("### STOP file found, exiting", flush=True)
            return 0
        jobs = sorted(f for f in os.listdir(QUEUE) if f.endswith(".py"))
        if not jobs:
            time.sleep(5)
            continue
        job = jobs[0]
        src = os.path.join(QUEUE, job)
        log = os.path.join(OUT, job[:-3] + ".log")
        print(f"### running {job} -> {log}", flush=True)
        # scripts must see CURRENT repo code: purge the package so edits
        # made since the last job are re-imported (pytree re-registration
        # of the fresh class objects is harmless; the JAX client survives)
        for mod in [m for m in sys.modules
                    if m.startswith("spmv_research_tpu")]:
            del sys.modules[mod]
        t0 = time.time()
        ok = True
        with open(log, "a") as f:
            with contextlib.redirect_stdout(f), contextlib.redirect_stderr(f):
                print(f"### start {job} {time.ctime()}", flush=True)
                try:
                    runpy.run_path(src, run_name="__main__")
                except SystemExit as e:
                    if e.code not in (0, None):
                        ok = False
                        print(f"### SystemExit({e.code})", flush=True)
                except BaseException as e:  # noqa: BLE001
                    ok = False
                    traceback.print_exc()
                    if fatal(e):
                        print("### FATAL worker death; exiting 3 for "
                              "restart", flush=True)
                        f.flush()
                        shutil.move(src, os.path.join(DONE, job + ".CRASH"))
                        sys.exit(3)
                print(f"### end {job} ok={ok} {time.time()-t0:.0f}s",
                      flush=True)
        shutil.move(src, os.path.join(DONE, job + ("" if ok else ".FAILED")))
        print(f"### done {job} ok={ok} {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
