"""Third relay-leak isolation: bytes-proportional or per-op?  Does
block staging or full deferral change the retention?  Run from
/root/repo, output to a file (one TPU process at a time)."""
import gc
import json
import time

import numpy as np


def rss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return -1


def measure(tag, fn, iters, finish=None):
    print(json.dumps({"start": tag, "t": round(time.time(), 1)}), flush=True)
    for _ in range(20):
        fn()
    if finish:
        finish()
    gc.collect()
    r0 = rss_kb()
    for _ in range(iters):
        fn()
    if finish:
        finish()
    gc.collect()
    r1 = rss_kb()
    print(json.dumps({"tag": tag,
                      "kb_per_iter": round((r1 - r0) / iters, 2)}),
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    f1 = jax.jit(lambda c, v: (c * 1.0001 + jnp.sum(v), v[:64] * 2.0),
                 donate_argnums=0)
    carry = jax.device_put(np.zeros((64,), np.float32))
    carry, _ = f1(carry, np.zeros((8192,), np.float32))

    def force():
        nonlocal carry
        float(carry[0])

    # 1. tiny numpy arg (1 KB), force every 64 — bytes or per-op?
    x_tiny = np.zeros((256,), np.float32)
    f2 = jax.jit(lambda c, v: (c * 1.0001 + jnp.sum(v), v[:64] * 2.0),
                 donate_argnums=0)
    carry2 = jax.device_put(np.zeros((64,), np.float32))
    carry2, _ = f2(carry2, x_tiny)
    k = [0]

    def tiny():
        nonlocal carry2
        carry2, _v = f2(carry2, x_tiny.copy())
        k[0] += 1
        if k[0] % 64 == 0:
            float(carry2[0])
    measure("tiny_1kb_periodic_force", tiny, 300)

    # 2. 32 KB arg, force every 64 (baseline repeat at this probe's f)
    x_np = np.zeros((8192,), np.float32)
    j = [0]

    def big():
        nonlocal carry
        carry, _v = f1(carry, x_np.copy())
        j[0] += 1
        if j[0] % 64 == 0:
            force()
    measure("big_32kb_periodic_force", big, 300)

    # 3. block staging: ONE device_put of (64, 8192) = 2 MB per 64 hops,
    # steps consume device-side slices; force per block
    blk_np = np.zeros((64, 8192), np.float32)

    def block():
        nonlocal carry
        blk = jax.device_put(blk_np)
        for i in range(64):
            carry, _v = f1(carry, blk[i])
        force()
        del blk
    measure("block64_staged_force", block, 6)  # 6*64 = 384 hops
    # per-HOP number:
    print(json.dumps({"note": "block64 kb_per_iter is per 64 hops"}),
          flush=True)

    # 4. full deferral at scale: 1024 hops, ONE force at the end
    def scale_a():
        nonlocal carry
        for _ in range(1024):
            carry, _v = f1(carry, x_np.copy())
        force()
    measure("defer1024_single_force", scale_a, 2)


if __name__ == "__main__":
    main()
