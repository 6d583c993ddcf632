"""Minimal repro + mitigation probe for the relay-client host-RSS leak
(BENCH.md item 45 investigation).

Context: the 10-min product soak measured RSS +787 MB/min on the axon
relay backend; the CPU twin is flat (slope 0.0); a bare ``device_put``
loop leaks its payload size per iteration.  This probe quantifies the
per-iteration retention for each candidate source and tests every
release mechanism available from Python.

Run from /root/repo (one TPU process at a time, output to a file):

  python bench_probes/relay_leak_probe.py > /tmp/relay_leak.json 2>/tmp/relay_leak.err
"""
import gc
import json

import numpy as np


def rss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return -1


def measure(tag, fn, iters=200):
    """Per-iteration RSS growth (KB) of fn, after a 20-iter warmup."""
    for _ in range(20):
        fn()
    gc.collect()
    r0 = rss_kb()
    for _ in range(iters):
        fn()
    gc.collect()
    r1 = rss_kb()
    out = {"tag": tag, "kb_per_iter": round((r1 - r0) / iters, 2),
           "total_mb": round((r1 - r0) / 1024, 1)}
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(json.dumps({"backend": dev.platform, "device": str(dev)}),
          flush=True)

    x_np = np.zeros((8192,), np.float32)  # 32 KB payload

    # 1. bare device_put, result dropped immediately
    measure("device_put_drop", lambda: jax.device_put(x_np))

    # 2. device_put + explicit .delete()
    def dp_delete():
        a = jax.device_put(x_np)
        a.delete()
    measure("device_put_delete", dp_delete)

    # 3. device_put + fetch + del
    def dp_fetch():
        a = jax.device_put(x_np)
        np.asarray(a)
        del a
    measure("device_put_fetch_del", dp_fetch)

    # 4. jit identity called with NUMPY arg (implicit transfer)
    f = jax.jit(lambda v: v + 1.0)
    np.asarray(f(x_np))  # compile once
    measure("jit_numpy_arg", lambda: np.asarray(f(x_np)))

    # 5. jit with DEVICE-RESIDENT arg (no host transfer per call)
    x_dev = jax.device_put(x_np)
    np.asarray(f(x_dev))

    def jit_dev():
        np.asarray(f(x_dev))
    measure("jit_device_arg", jit_dev)

    # 6. donated carry chain (the streaming pattern): does the chained
    # state itself leak host-side?
    g = jax.jit(lambda v: v * 1.0001, donate_argnums=0)
    carry = jax.device_put(x_np)
    carry = g(carry)

    def chain():
        nonlocal carry
        carry = g(carry)
    measure("jit_donated_chain", chain, iters=400)
    float(carry[0])

    # 7. device_put_drop again, then clear_caches — does it release?
    before = rss_kb()
    for _ in range(200):
        jax.device_put(x_np)
    mid = rss_kb()
    jax.clear_caches()
    gc.collect()
    after = rss_kb()
    print(json.dumps({"tag": "clear_caches_release",
                      "grown_mb": round((mid - before) / 1024, 1),
                      "released_mb": round((mid - after) / 1024, 1)}),
          flush=True)

    # 8. live-arrays census: does jax think the dropped arrays are live?
    live = jax.live_arrays()
    print(json.dumps({"tag": "live_arrays", "count": len(live)}),
          flush=True)


if __name__ == "__main__":
    main()
