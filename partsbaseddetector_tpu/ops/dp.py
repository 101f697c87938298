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

Scores are keyed by part slot (P, M, H, W) rather than by filter id as in
the reference (``ncscores``, src/DynamicProgram.cpp:93-155) — equivalent
for models without filter aliasing, which pack_model asserts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.models.part_tree import PackedComponent
from partsbaseddetector_tpu.ops.common import NEG
from partsbaseddetector_tpu.ops.dt import dt_mixtures


class DPResult(NamedTuple):
    rootv: jnp.ndarray   # (H, W) root score map (bias added, maxed)
    rooti: jnp.ndarray   # (H, W) int32 best root mixture
    Ix: jnp.ndarray      # (P, M, H, W) int32 child x at parent (y, x)
    Iy: jnp.ndarray      # (P, M, H, W) int32 child y
    Ik: jnp.ndarray      # (P, M, H, W) int32 child mixture


@partial(jax.jit, static_argnames=("compose",))
def dp_min(pdfs: jnp.ndarray, comp: PackedComponent,
           compose: str = "reference") -> DPResult:
    """Run the DP for one component on one response map.

    pdfs: (H, W, F) filter responses for ALL model filters (the output of
    ops.conv.conv_bank), matching the reference's responses-by-filter-id
    convention (include/Parts.hpp:165-168).
    """
    P, M = comp.filterid.shape
    H, W = pdfs.shape[:2]
    pdfs_f = jnp.moveaxis(pdfs, -1, 0)                 # (F, H, W)
    scores0 = pdfs_f[comp.filterid]                    # (P, M, H, W)
    # invalid mixture slots must never win any max
    scores0 = jnp.where(comp.mix_valid[..., None, None], scores0, NEG)

    def step(scores, p):
        s = scores[p]                                  # (M, H, W)
        sdt, ix, iy = dt_mixtures(s, comp.defw[p], comp.anchor[p],
                                  compose)
        # bias[p] is (child_m, parent_m); weighted: (Mp, Mc, H, W)
        weighted = sdt[None, :, :, :] + \
            comp.bias[p].T[:, :, None, None]
        ik = jnp.argmax(weighted, axis=1).astype(jnp.int32)  # (Mp, H, W)
        maxv = jnp.max(weighted, axis=1)
        sel = ik[:, None, :, :]
        ixp = jnp.take_along_axis(
            jnp.broadcast_to(ix[None], (M, M, H, W)), sel, axis=1)[:, 0]
        iyp = jnp.take_along_axis(
            jnp.broadcast_to(iy[None], (M, M, H, W)), sel, axis=1)[:, 0]
        scores = scores.at[comp.parent[p]].add(maxv)
        return scores, (ixp, iyp, ik)

    parts_rev = jnp.arange(P - 1, 0, -1)
    scores, (ixs, iys, iks) = jax.lax.scan(step, scores0, parts_rev)

    # reorder scan outputs (visited P-1..1) into part-index order with a
    # zero row for the root
    def to_tables(x):
        x = jnp.flip(x, axis=0)                        # parts 1..P-1
        return jnp.concatenate(
            [jnp.zeros((1,) + x.shape[1:], x.dtype), x], axis=0)

    Ix, Iy, Ik = (to_tables(t) for t in (ixs, iys, iks))

    # root: add the scalar root bias to every root mixture and max
    # (reference: src/DynamicProgram.cpp:162-171)
    rootw = scores[0] + comp.root_bias                 # (M, H, W)
    rootw = jnp.where(comp.mix_valid[0][:, None, None], rootw, NEG)
    rooti = jnp.argmax(rootw, axis=0).astype(jnp.int32)
    rootv = jnp.max(rootw, axis=0)
    return DPResult(rootv, rooti, Ix, Iy, Ik)


def dp_min_levels(pdfs: jnp.ndarray, comp: PackedComponent,
                  compose: str = "reference") -> DPResult:
    """vmap of dp_min over a leading levels axis: pdfs (L, H, W, F)."""
    return jax.vmap(lambda x: dp_min(x, comp, compose))(pdfs)
