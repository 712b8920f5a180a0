"""Characterize the host<->device link: bandwidth vs per-transfer latency.

The seg2d pipeline composites are link-sensitive (every frame's pixels cross
the tunnel), so knowing whether the link is BANDWIDTH-bound (cut bytes) or
LATENCY-bound (batch transfers) decides the optimization strategy. Run on the
real TPU; co-tenancy can change the answer between sessions (CLAUDE.md), so
numbers here are a probe, not a constant.

Usage: python tools/probe_link.py  (no PYTHONPATH on TPU; sys.path below)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    def fence(x):
        float(jax.device_get(x.reshape(-1)[:1].astype(jnp.float32)[0]))

    # 1) upload bandwidth vs size (one transfer per timing)
    print("# --- upload: one transfer per fence ---", flush=True)
    for kb in (4, 64, 512, 2048, 8192):
        buf = np.random.randint(0, 255, (kb * 1024,), np.uint8)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            d = jnp.asarray(buf)
            fence(d)
            best = min(best, time.perf_counter() - t0)
        print(f"# up {kb:>5} KB: {best * 1000:7.1f} ms  ({kb / 1024 / best:6.1f} MB/s)",
              flush=True)

    # 2) download bandwidth vs size
    print("# --- download ---", flush=True)
    for kb in (4, 64, 512, 2048, 8192):
        d = jnp.asarray(np.random.randint(0, 255, (kb * 1024,), np.uint8))
        fence(d)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(d))
            best = min(best, time.perf_counter() - t0)
        print(f"# down {kb:>5} KB: {best * 1000:7.1f} ms  ({kb / 1024 / best:6.1f} MB/s)",
              flush=True)

    # 3a) pipelining with per-transfer fences: N small uploads, fence each.
    print("# --- pipelining: 8 x 512KB uploads ---", flush=True)
    bufs = [np.random.randint(0, 255, (512 * 1024,), np.uint8) for _ in range(8)]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        devs = [jnp.asarray(b) for b in bufs]
        for d in devs:
            fence(d)
        best = min(best, time.perf_counter() - t0)
    print(f"# 8x512KB fence-each: {best * 1000:7.1f} ms "
          f"({4 / best:6.1f} MB/s aggregate)", flush=True)

    # 3b) same uploads, ONE dependent fence at the end: if async dispatch
    # pipelines transfers, this approaches the one-big-upload time and only
    # the final fence round-trips; if each upload blocks, it matches 3a.
    reduce8 = jax.jit(lambda *xs: sum(x[:1].astype(jnp.float32).sum() for x in xs))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        devs = [jnp.asarray(b) for b in bufs]
        float(jax.device_get(reduce8(*devs)))
        best = min(best, time.perf_counter() - t0)
    print(f"# 8x512KB one-combined-fence: {best * 1000:7.1f} ms "
          f"({4 / best:6.1f} MB/s aggregate)", flush=True)

    # 3c) dispatch-only cost: how long does jnp.asarray itself block the
    # caller (the prefetch thread), without any fence?
    for kb in (512, 2048):
        buf = np.random.randint(0, 255, (kb * 1024,), np.uint8)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            d = jnp.asarray(buf)
            best = min(best, time.perf_counter() - t0)
            fence(d)
        print(f"# asarray({kb}KB) dispatch-only: {best * 1000:7.1f} ms", flush=True)

    # 3d) TRUE download (the earlier section device_gets an UPLOADED buffer,
    # which the runtime serves from its cached host copy): fetch computed data
    print("# --- true download: device-computed data ---", flush=True)
    inc = jax.jit(lambda x: x + 1)
    for kb in (4, 512, 2048, 8192):
        d = inc(jnp.asarray(np.random.randint(0, 254, (kb * 1024,), np.uint8)))
        fence(d)
        best = 1e9
        for _ in range(3):
            d = inc(d)
            fence(d)
            t0 = time.perf_counter()
            np.asarray(jax.device_get(d))
            best = min(best, time.perf_counter() - t0)
        print(f"# true-down {kb:>5} KB: {best * 1000:7.1f} ms  "
              f"({kb / 1024 / best:6.1f} MB/s)", flush=True)

    # 4) does copy_to_host_async overlap with a subsequent upload?
    print("# --- duplex: 2MB up while 2MB down in flight ---", flush=True)
    up_buf = np.random.randint(0, 255, (2 * 1024 * 1024,), np.uint8)
    down_dev = jnp.asarray(np.random.randint(0, 255, (2 * 1024 * 1024,), np.uint8))
    fence(down_dev)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        try:
            down_dev.copy_to_host_async()
        except AttributeError:
            pass
        d = jnp.asarray(up_buf)
        fence(d)
        np.asarray(jax.device_get(down_dev))
        best = min(best, time.perf_counter() - t0)
    print(f"# 2MB up + 2MB down overlapped: {best * 1000:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
