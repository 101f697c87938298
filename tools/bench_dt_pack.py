#!/usr/bin/env python
"""Microbenchmark: DT lane-packing layouts (PERF.md §lane-packing).

Measures the per-part DP step (x-pass + y-pass [+ mixture-bias reduce
+ carry add]) on the flagship bucket shape (L=12, M=4, H=58, W=78) in
the current (L, M, H, W) layout vs mixture-packed layouts where the
candidate tensor's minor dims hold Q*M (or (Q, M)) instead of Q — the
round-4 61%-lane-occupancy observation.

Fidelity to the real scan: each variant runs R iterations inside one
jitted lax.fori_loop whose carry crosses iterations (like the part
scan's (P, ...) carry), and defw/anchor/bias are TRACED arguments so
the penalty matrices are rebuilt per iteration exactly as dp_min's
scan rebuilds them per part (they come from the traced
PackedComponent and cannot be constant-folded).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

L, M, H, W = 12, 4, 58, 78
R = 400


def main():
    import jax
    import jax.numpy as jnp
    from partsbaseddetector_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    s0 = jnp.asarray(rng.random((L, M, H, W)), jnp.float32)
    defw0 = jnp.asarray(rng.random((M, 4)) * 0.01 + 0.005, jnp.float32)
    anc0 = jnp.asarray(rng.integers(-3, 4, (M, 2)), jnp.float32)
    bias0 = jnp.asarray(rng.random((M, M)) * 0.1, jnp.float32)

    from partsbaseddetector_tpu.ops.dt import dt_max_x, dt_max_y

    def pens(defw, anc):
        """pen_x (M, Cx, Q), pen_y (M, Py, Cy) from traced params."""
        dtype = jnp.float32
        q = jnp.arange(W, dtype=dtype)
        cx = jnp.arange(W, dtype=dtype)
        py = jnp.arange(H, dtype=dtype)
        cy = jnp.arange(H, dtype=dtype)
        dx = q[None, None, :] + anc[:, 0][:, None, None] \
            - cx[None, :, None]
        pen_x = -defw[:, 0][:, None, None] * dx * dx \
            - defw[:, 1][:, None, None] * dx          # (M, Cx, Q)
        dy = py[None, :, None] + anc[:, 1][:, None, None] \
            - cy[None, None, :]
        pen_y = -defw[:, 2][:, None, None] * dy * dy \
            - defw[:, 3][:, None, None] * dy          # (M, Py, Cy)
        return pen_x, pen_y

    # ---------------- v0: current layout (L, M, H, W) ----------------
    def v0_dt(s, defw, anc, bias):
        f = jax.vmap(jax.vmap(
            lambda sm, wm, am: dt_max_y(
                dt_max_x(sm, wm[0], wm[1], am[0]), wm[2], wm[3], am[1]),
            in_axes=(0, 0, 0)), in_axes=(0, None, None))
        return f(s, defw, anc)

    def v0_step(s, defw, anc, bias):
        sdt = v0_dt(s, defw, anc, bias)
        weighted = sdt[:, None] + bias.T[None, :, :, None, None]
        maxv = jnp.max(weighted, axis=2)               # (L, Mp, H, W)
        return s + maxv

    # ---------------- v1: packed q-major (L, H, W*M) ----------------
    def v1_dt(sp, defw, anc, bias):
        pen_x, pen_y = pens(defw, anc)
        pen_x_qm = jnp.transpose(pen_x, (1, 2, 0))     # (Cx, Q, M)
        pen_y_qm = jnp.transpose(pen_y, (1, 2, 0))     # (Py, Cy, M)
        s4 = sp.reshape(L, H, W, M)
        cand = s4[:, :, :, None, :] + pen_x_qm[None, None]
        tmp = jnp.max(cand, axis=2)                    # (L, H, Q, M)
        tmp = tmp.reshape(L, H, W * M)
        t4 = tmp.reshape(L, H, W, M)
        cand = t4[:, None, :, :, :] + pen_y_qm[None, :, :, None, :]
        out = jnp.max(cand, axis=2)                    # (L, Py, W, M)
        return out.reshape(L, H, W * M)

    def v1_step(sp, defw, anc, bias):
        sdt = v1_dt(sp, defw, anc, bias).reshape(L, H, W, M)
        weighted = sdt[..., :, None] + bias[None, None, None]
        maxv = jnp.max(weighted, axis=-2)              # (L, H, W, Mp)
        return sp + maxv.reshape(L, H, W * M)

    # ---------------- v2: rank-4 trailing M (L, H, W, M) -------------
    def v2_dt(s4, defw, anc, bias):
        pen_x, pen_y = pens(defw, anc)
        pen_x_qm = jnp.transpose(pen_x, (1, 2, 0))
        pen_y_qm = jnp.transpose(pen_y, (1, 2, 0))
        cand = s4[:, :, :, None, :] + pen_x_qm[None, None]
        tmp = jnp.max(cand, axis=2)                    # (L, H, Q, M)
        cand = tmp[:, None, :, :, :] + pen_y_qm[None, :, :, None, :]
        return jnp.max(cand, axis=2)                   # (L, Py, W, M)

    def v2_step(s4, defw, anc, bias):
        sdt = v2_dt(s4, defw, anc, bias)
        weighted = sdt[..., :, None] + bias[None, None, None]
        maxv = jnp.max(weighted, axis=-2)
        return s4 + maxv

    # ---------------- pack/unpack transposes ----------------
    def pack_qm(s):                                    # (L,M,H,W)->(L,H,WM)
        return jnp.transpose(s, (0, 2, 3, 1)).reshape(L, H, W * M)

    def unpack_qm(sp):
        return jnp.transpose(sp.reshape(L, H, W, M), (0, 3, 1, 2))

    # -------- numeric cross-check (one iteration, vs v0) --------
    args = (defw0, anc0, bias0)
    ref_dt = v0_dt(s0, *args)
    got1 = unpack_qm(v1_dt(pack_qm(s0), *args))
    got2 = jnp.transpose(v2_dt(jnp.transpose(s0, (0, 2, 3, 1)), *args),
                         (0, 3, 1, 2))
    for name, got in [("v1", got1), ("v2", got2)]:
        ok = bool(jnp.all(ref_dt == got))
        print(f"bitwise {name} dt == v0 dt: {ok}")
    ref_st = v0_step(s0, *args)
    gst1 = unpack_qm(v1_step(pack_qm(s0), *args))
    ok = bool(jnp.all(ref_st == gst1))
    print(f"bitwise v1_step == v0_step: {ok}")

    # ---------------- timing ----------------
    def timeit(name, fn, x):
        def body(i, carry):
            s, d, a, b = carry
            return (fn(s, d, a, b), d, a, b)

        loop = jax.jit(lambda x0, d, a, b: jax.lax.fori_loop(
            0, R, body, (x0, d, a, b))[0])
        t0 = time.time()
        jax.block_until_ready(loop(x, *args))
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(loop(x, *args))
            best = min(best, time.time() - t0)
        print(f"{name:16s} {best / R * 1e6:8.1f} us/iter "
              f"(compile {compile_s:.1f}s)")
        return best / R * 1e6

    print(f"shapes (L,M,H,W)=({L},{M},{H},{W}), R={R}, traced params")
    timeit("v0_dt", v0_dt, s0)
    timeit("v1_dt(qmajor)", v1_dt, pack_qm(s0))
    timeit("v2_dt(rank4)", v2_dt, jnp.transpose(s0, (0, 2, 3, 1)))
    timeit("v0_step", v0_step, s0)
    timeit("v1_step", v1_step, pack_qm(s0))
    timeit("v2_step", v2_step, jnp.transpose(s0, (0, 2, 3, 1)))
    timeit("pack+unpack_qm",
           lambda s, d, a, b: unpack_qm(pack_qm(s)) if s.ndim == 4
           else s, s0)


if __name__ == "__main__":
    main()
