"""Minimal repro for the host->TPU transfer leak (VERDICT r4 Weak #1).

The RegTr eviction-stress probe leaks ~86 MB/iter; the cache-hit path is
flat. This strips it to the bone: repeatedly upload a grid-sized numpy
array, drop the reference, measure RSS. Variants:

  UP_MODE=plain    jnp.asarray(x); del        (the trainer's upload path)
  UP_MODE=trim     plain + malloc_trim(0) every 10 uploads (glibc-arena
                   hypothesis: buffers freed but never returned to the OS)
  UP_MODE=gc       plain + gc.collect() every 10 uploads
  UP_MODE=reuse    upload the SAME numpy buffer each time (alias check)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf/probe_upload_leak.py
"""
from __future__ import annotations

import ctypes
import gc
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

MODE = os.environ.get("UP_MODE", "plain")
N = int(os.environ.get("UP_N", 60))
MB = int(os.environ.get("UP_MB", 56))  # ~ one 128^3 x 7 f32 grid


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    libc = ctypes.CDLL("libc.so.6")
    rng = np.random.default_rng(0)
    base = rng.standard_normal((MB * 1024 * 1024 // 4,), np.float32)
    print(f"[upload] mode={MODE} start {rss_mb():.0f} MB "
          f"on {jax.devices()}", flush=True)
    trace = []
    for i in range(N):
        x = base if MODE == "reuse" else (base + np.float32(i))
        d = jnp.asarray(x)
        d.block_until_ready()
        del d
        if MODE == "trim" and (i + 1) % 10 == 0:
            libc.malloc_trim(0)
        if MODE == "gc" and (i + 1) % 10 == 0:
            gc.collect()
        if (i + 1) % 10 == 0:
            m = rss_mb()
            trace.append({"i": i + 1, "rss_mb": round(m, 1)})
            print(f"[upload] {i+1} RSS {m:.0f} MB", flush=True)
    out = {"mode": MODE, "mb": MB, "trace": trace,
           "mb_per_upload": round(
               (trace[-1]["rss_mb"] - trace[0]["rss_mb"])
               / max(trace[-1]["i"] - trace[0]["i"], 1), 2)
           if len(trace) >= 2 else None}
    print(json.dumps(out), flush=True)
    with open(f"/tmp/upload_leak_{MODE}.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
