"""Min-sum dynamic program over the part tree, as a level-synchronous
scan.

Reimagines the reference's per-(scale, component) OpenMP loop with nested
cv::Mat arithmetic (reference: src/DynamicProgram.cpp:66-173) as a single
``lax.scan`` over parts in reverse topological order.  Parts are stored
root-first with parent < child (guaranteed by the schema validation), so
the reverse scan visits children before parents, exactly like the
reference's ``for (p = nparts-1; p > 0; --p)``
(reference: src/DynamicProgram.cpp:95).

Per step: distance-transform all mixtures of the part, add the child->
parent mixture-pair bias table, max-reduce over child mixtures (the
reference's Math::reduceMax + reducePickIndex, include/Math.hpp:108-185),
and scatter-add the result into the parent's accumulated score.

TPU-shaped design decisions (vs a naive translation):
  * scores are keyed by part slot (P, M, H, W) rather than by filter id
    (the reference's ncscores, src/DynamicProgram.cpp:93-155) —
    equivalent for models without filter aliasing, asserted at pack time;
  * NO per-element (H, W) gathers anywhere: mixture selection uses
    one-hot sums over the tiny mixture axis, and the DT argmin
    composition (an (H, W) gather in the reference,
    include/DistanceTransform.hpp:233-244) is deferred to backtracking
    where it touches only K candidates (ops/argmax.py);
  * backtrack state is bit-packed into int32 tables so the per-part walk
    is one gather (plus one for the deferred compose).

Packed tables:
  bt1[p, m_parent, y, x] = primary-axis child coord (bits 0..11)
                           | winning child mixture (bits 24..30)
  bt2[p, m_child, y, x]  = secondary-axis pass argmax (bits 0..11)

With compose="reference", primary = x (row-pass Ix), secondary = the
column-pass Iy, and the composed child y is bt2[p, mc, y, x_child]
read at the *composed x* — reproducing Iy[m][n] = IyCol[m][Ix[m][n]]
(and the row-pass table being indexed by parent y, the reference's
quirk).  With compose="correct", primary = y and secondary = x.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.models.part_tree import PackedComponent
from partsbaseddetector_tpu.ops.common import NEG
from partsbaseddetector_tpu.ops.dt import dt_mixtures_raw


class DPResult(NamedTuple):
    rootv: jnp.ndarray   # (H, W) root score map (bias added, maxed)
    rooti: jnp.ndarray   # (H, W) int32 best root mixture
    bt1: jnp.ndarray     # (P, M, H, W) int32, see module docstring
    bt2: jnp.ndarray     # (P, M, H, W) int32


def _onehot_select_int(values: jnp.ndarray, idx: jnp.ndarray
                       ) -> jnp.ndarray:
    """out[mp, ...] = values[idx[mp, ...], ...] via one-hot sum over the
    (tiny) leading mixture axis — avoids TPU per-element gathers.
    values: (Mc, H, W) int32; idx: (Mp, H, W) int32."""
    M = values.shape[0]
    acc = jnp.zeros_like(idx)
    for mc in range(M):
        acc = acc + jnp.where(idx == mc, values[mc], 0)
    return acc


@partial(jax.jit, static_argnames=("compose",))
def dp_min(pdfs: jnp.ndarray, comp: PackedComponent,
           compose: str = "reference") -> DPResult:
    """Run the DP for one component on one response map.

    pdfs: (H, W, F) filter responses for ALL model filters (the output of
    ops.conv.conv_bank), matching the reference's responses-by-filter-id
    convention (include/Parts.hpp:165-168).
    """
    if compose not in ("reference", "correct"):
        raise ValueError(compose)
    P, M = comp.filterid.shape
    H, W = pdfs.shape[:2]
    assert H < 4096 and W < 4096 and M < 128, (H, W, M)
    pdfs_f = jnp.moveaxis(pdfs, -1, 0)                 # (F, H, W)
    scores0 = pdfs_f[comp.filterid]                    # (P, M, H, W)
    # invalid mixture slots must never win any max
    scores0 = jnp.where(comp.mix_valid[..., None, None], scores0, NEG)

    mixid = jnp.arange(M, dtype=jnp.int32)[:, None, None]

    def step(scores, p):
        s = scores[p]                                  # (M, H, W)
        sdt, ix_row, iy_col = dt_mixtures_raw(
            s, comp.defw[p], comp.anchor[p])
        # bias[p] is (child_m, parent_m); weighted: (Mp, Mc, H, W)
        weighted = sdt[None, :, :, :] + \
            comp.bias[p].T[:, :, None, None]
        ik = jnp.argmax(weighted, axis=1).astype(jnp.int32)  # (Mp, H, W)
        maxv = jnp.max(weighted, axis=1)
        if compose == "reference":
            primary, secondary = ix_row, iy_col
        else:
            primary, secondary = iy_col, ix_row
        packed1 = primary | (jnp.broadcast_to(
            mixid, (M, H, W)) << 24)                   # (Mc, H, W)
        bt1 = _onehot_select_int(packed1, ik)          # (Mp, H, W)
        scores = scores.at[comp.parent[p]].add(maxv)
        return scores, (bt1, secondary)

    parts_rev = jnp.arange(P - 1, 0, -1)
    scores, (bt1s, bt2s) = jax.lax.scan(step, scores0, parts_rev)

    # reorder scan outputs (visited P-1..1) into part-index order with a
    # zero row for the root
    def to_tables(x):
        x = jnp.flip(x, axis=0)
        return jnp.concatenate(
            [jnp.zeros((1,) + x.shape[1:], x.dtype), x], axis=0)

    bt1 = to_tables(bt1s)
    bt2 = to_tables(bt2s)

    # root: add the scalar root bias to every root mixture and max
    # (reference: src/DynamicProgram.cpp:162-171)
    rootw = scores[0] + comp.root_bias                 # (M, H, W)
    rootw = jnp.where(comp.mix_valid[0][:, None, None], rootw, NEG)
    rooti = jnp.argmax(rootw, axis=0).astype(jnp.int32)
    rootv = jnp.max(rootw, axis=0)
    return DPResult(rootv, rooti, bt1, bt2)


def dp_min_levels(pdfs: jnp.ndarray, comp: PackedComponent,
                  compose: str = "reference") -> DPResult:
    """vmap of dp_min over a leading levels axis: pdfs (L, H, W, F)."""
    return jax.vmap(lambda x: dp_min(x, comp, compose))(pdfs)


def walk_step(res: DPResult, p: int, mp, py, px, compose: str):
    """One backtracking step: child (x, y, mixture) of part p given the
    parent's (mixture, y, x) — performs the deferred argmin composition
    (reference: include/DistanceTransform.hpp:233-244 +
    src/DynamicProgram.cpp:219-235).  All index args are equal-shaped
    int32 arrays."""
    b1 = res.bt1[p, mp, py, px]
    prim = b1 & 0xFFF
    mc = (b1 >> 24) & 0x7F
    if compose == "reference":
        x = prim
        y = res.bt2[p, mc, py, x] & 0xFFF
    else:
        y = prim
        x = res.bt2[p, mc, y, px] & 0xFFF
    return x, y, mc


def composed_tables(res: DPResult, comp: PackedComponent,
                    compose: str = "reference"):
    """Materialize full (P, M, H, W) Ix/Iy/Ik tables (test/debug helper —
    the production path never builds these)."""
    P, M, H, W = res.bt1.shape
    yy = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W)).astype(jnp.int32)
    xx = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W)).astype(jnp.int32)
    Ix = jnp.zeros((P, M, H, W), jnp.int32)
    Iy = jnp.zeros((P, M, H, W), jnp.int32)
    Ik = jnp.zeros((P, M, H, W), jnp.int32)
    for p in range(1, P):
        for m in range(M):
            mp = jnp.full((H, W), m, jnp.int32)
            x, y, mc = walk_step(res, p, mp, yy, xx, compose)
            Ix = Ix.at[p, m].set(x)
            Iy = Iy.at[p, m].set(y)
            Ik = Ik.at[p, m].set(mc)
    return Ix, Iy, Ik
