"""Second minimal relay-leak isolation: which ingredient of the
streaming step retains ~28 KB/col?  Dimensions: fresh numpy arg per
call (vs device-resident), fetched vs never-fetched results, dropped
extra outputs.  Run from /root/repo, output to a file."""
import gc
import json

import numpy as np


def rss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return -1


def measure(tag, fn, iters=150, finish=None):
    import sys, time
    print(json.dumps({"start": tag, "t": time.time()}), flush=True)
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

    x_np = np.zeros((8192,), np.float32)          # 32 KB
    f1 = jax.jit(lambda c, v: (c * 1.0001 + v[0], v[:1024] * 2.0),
                 donate_argnums=0)

    # A. fresh numpy arg each call, outputs NEVER fetched (stream shape)
    carry = jax.device_put(np.zeros((8192,), np.float32))
    carry, _ = f1(carry, x_np)

    def a():
        nonlocal carry
        carry, _vis = f1(carry, x_np.copy())

    def force_a():
        nonlocal carry
        float(carry[0])
    measure("numpy_arg_nofetch", a, finish=force_a)

    # B. same but the numpy block is the SAME object every call
    def b():
        nonlocal carry
        carry, _vis = f1(carry, x_np)
    measure("same_numpy_arg_nofetch", b, finish=force_a)

    # C. device-resident arg, outputs never fetched
    x_dev = jax.device_put(x_np)

    def c():
        nonlocal carry
        carry, _vis = f1(carry, x_dev)
    measure("device_arg_nofetch", c, finish=force_a)

    # D. fresh numpy arg, secondary output fetched every call
    def d():
        nonlocal carry
        carry, vis = f1(carry, x_np.copy())
        np.asarray(vis)
    measure("numpy_arg_fetch", d, finish=force_a)

    # E. fresh numpy arg, periodic carry force every 64 calls
    k = [0]

    def e():
        nonlocal carry
        carry, _vis = f1(carry, x_np.copy())
        k[0] += 1
        if k[0] % 64 == 0:
            float(carry[0])
    measure("numpy_arg_periodic_force", e, finish=force_a)


if __name__ == "__main__":
    main()
