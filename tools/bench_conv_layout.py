#!/usr/bin/env python
"""Microbenchmark: conv output layout vs the DP's (F-major, H, W)
consumption (PERF.md §copy-tail family 2, ~0.95 GB/call of relayout).

A: conv emits NHWC (current), then moveaxis + filterid gather (the
   dp_min init).
B: conv emits NCHW directly (output dimension_numbers), then gather.
C: conv NHWC, gather along lanes first, then transpose.

Times the chain on flagship bucket-0 shapes (B*L=80 maps, 122x162,
32->101 filters, 5x5), chained through a fori_loop carry.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BL, H, W, C, F, K = 80, 122, 162, 32, 101, 5
P, M = 26, 4


def main():
    import jax
    import jax.numpy as jnp
    from partsbaseddetector_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.random((BL, H, W, C)), jnp.float32)
    bank = jnp.asarray(rng.random((K, K, C, F)), jnp.float32)
    fid = jnp.asarray(rng.integers(0, F, (P, M)), jnp.int32)
    Ho, Wo = H - K + 1, W - K + 1

    prec = jax.lax.Precision.HIGHEST

    def conv(x, dn):
        return jax.lax.conv_general_dilated(
            x, bank, (1, 1), "VALID",
            dimension_numbers=dn, precision=prec)

    def vA(x):
        out = conv(x, ("NHWC", "HWIO", "NHWC"))     # (BL, Ho, Wo, F)
        pf = jnp.moveaxis(out, -1, 1)               # (BL, F, Ho, Wo)
        s0 = pf[:, fid]                             # (BL, P, M, Ho, Wo)
        return s0

    def vB(x):
        out = conv(x, ("NHWC", "HWIO", "NCHW"))     # (BL, F, Ho, Wo)
        return out[:, fid]

    def vC(x):
        out = conv(x, ("NHWC", "HWIO", "NHWC"))
        g = out[..., fid.ravel()]                   # (BL, Ho, Wo, P*M)
        return jnp.moveaxis(g, -1, 1).reshape(BL, P, M, Ho, Wo)

    # correctness
    a = vA(feats)
    for name, fn in [("B", vB), ("C", vC)]:
        got = fn(feats)
        ok = bool(jnp.all(a == got))
        print(f"bitwise {name} == A: {ok}")

    R = 30

    def timeit(name, fn):
        # chain via a scalar carry folded into the input so the loop
        # body cannot be hoisted (loop-invariant code motion); the
        # 1e-38 perturbation is timing-only
        def body(i, carry):
            x, acc = carry
            s0 = fn(x + acc * jnp.float32(1e-38))
            return (x, acc + s0[0, 0, 0, 0, 0])

        loop = jax.jit(lambda x: jax.lax.fori_loop(
            0, R, body, (x, jnp.float32(0)))[1])
        t0 = time.time()
        jax.block_until_ready(loop(feats))
        comp = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(loop(feats))
            best = min(best, time.time() - t0)
        print(f"{name:4s} {best / R * 1e3:7.2f} ms/iter "
              f"(compile {comp:.1f}s)")

    timeit("A", vA)
    timeit("B", vB)
    timeit("C", vC)


if __name__ == "__main__":
    main()
