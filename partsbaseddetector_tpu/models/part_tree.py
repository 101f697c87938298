"""Packed, padded device representation of a PartsModel.

Replaces the reference's pointer-translating object pool
(``Parts``/``ComponentPart``, reference: include/Parts.hpp:51-261) with a
flat struct-of-arrays pytree per component, padded to the maximum mixture
count, plus one global packed filter bank shared by all components
(the conv stage scores every filter once, like the reference's
``responses[scale][filter]`` — reference: src/SpatialConvolutionEngine.
cpp:106-124).

All invalid (padded) mixture slots are masked with ``NEG`` biases so they
can never win a max.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.models.schema import PartsModel
from partsbaseddetector_tpu.ops.common import NEG
from partsbaseddetector_tpu.ops.conv import pack_filter_bank


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedComponent:
    """One part tree, padded to M = max mixtures.

    Index semantics mirror the reference accessors
    (include/Parts.hpp:124-187):
      filterid[p, m]  -> global filter index (pad: repeats mixture 0)
      defw[p, m, 4]   -> deformation weights (w0..w3)
      anchor[p, m, 2] -> (ax, ay) anchor offsets
      bias[p, mc, mp] -> biasw[biasid[p][mc] + mp]
                         (include/Parts.hpp:172-175); NEG outside valid
                         (mc < nmix[p], mp < nmix[parent[p]])
      parent[p]       -> parent part index (parent[0] = 0)
      nmix[p]         -> true mixture count
      root_bias       -> biasw[biasid[0][0]]
                         (src/DynamicProgram.cpp:163-170)
      fsize[p, m]     -> filter rows (box size; the reference uses rows
                         for both x and y — include/Parts.hpp:185-187)
    """

    filterid: jnp.ndarray     # (P, M) int32
    defw: jnp.ndarray         # (P, M, 4) f32
    anchor: jnp.ndarray       # (P, M, 2) int32
    bias: jnp.ndarray         # (P, M, M) f32
    parent: jnp.ndarray       # (P,) int32
    nmix: jnp.ndarray         # (P,) int32
    mix_valid: jnp.ndarray    # (P, M) bool
    root_bias: jnp.ndarray    # () f32
    fsize: jnp.ndarray        # (P, M) int32
    # True when some filter id is referenced by more than one
    # (part, mixture) slot of THIS component.  The reference keys its
    # accumulated DP scores by filter id (ncscores,
    # include/Parts.hpp:165-168 via src/DynamicProgram.cpp:115-155), so
    # shared filters alias their accumulation buffers; the packed DP
    # reproduces that with a filter-keyed scan carry (ops/dp.py) only
    # when needed — the common non-aliased case keeps the cheaper
    # part-keyed carry (provably identical there).
    aliased: bool = dataclasses.field(
        default=False, metadata={"static": True})

    @property
    def nparts(self) -> int:
        return self.filterid.shape[0]

    @property
    def maxmix(self) -> int:
        return self.filterid.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedModel:
    """Device-ready model: global filter bank + per-component part trees
    + static hyperparameters (in aux_data, not traced)."""

    bank: jnp.ndarray                     # (FH, FW, C, F) f32, HWIO
    components: Tuple[PackedComponent, ...]
    thresh: jnp.ndarray                   # () f32

    # static fields
    interval: int = dataclasses.field(metadata={"static": True})
    binsize: int = dataclasses.field(metadata={"static": True})
    norient: int = dataclasses.field(metadata={"static": True})
    flen: int = dataclasses.field(metadata={"static": True})
    name: str = dataclasses.field(metadata={"static": True})
    # host-side copies needed for static (unrolled) tree walks
    parent_static: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata={"static": True})
    # per-component, per-part absolute scale offsets (octaves finer than
    # the root; all zeros for single-resolution models — see
    # PartsModel.part_scales).  Static: they select which bucket's
    # response maps feed each part in the multi-resolution DP
    scale_static: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        default=(), metadata={"static": True})

    @property
    def nfilters(self) -> int:
        return self.bank.shape[3]


def pack_model(model: PartsModel, dtype=jnp.float32) -> PackedModel:
    model.validate()
    bank_np, sizes = pack_filter_bank(
        [np.asarray(f) for f in model.filters])
    M = model.max_nmixtures()

    comps: List[PackedComponent] = []
    parent_static: List[Tuple[int, ...]] = []
    for c, comp in enumerate(model.components):
        P = comp.nparts
        filterid = np.zeros((P, M), np.int32)
        defw = np.zeros((P, M, 4), np.float32)
        anchor = np.zeros((P, M, 2), np.int32)
        bias = np.full((P, M, M), NEG, np.float32)
        parent = np.zeros(P, np.int32)
        nmix = np.zeros(P, np.int32)
        fsize = np.zeros((P, M), np.int32)
        for p, part in enumerate(comp.parts):
            n = part.nmixtures
            nmix[p] = n
            parent[p] = max(part.parentid, 0)
            pn = comp.parts[parent[p]].nmixtures if p > 0 else 1
            for m in range(M):
                mm = min(m, n - 1)
                filterid[p, m] = part.filterid[mm]
                defw[p, m] = np.asarray(model.defw[part.defid[mm]])
                anchor[p, m] = np.asarray(
                    model.anchors[part.defid[mm]]).ravel()[:2]
                fsize[p, m] = model.filters[part.filterid[mm]].shape[0]
            if p > 0:
                for mc in range(n):
                    off = part.biasid[mc]
                    for mp in range(pn):
                        bias[p, mc, mp] = model.biasw[off + mp]
        # shared-filter aliasing (reference ncscores keyed by filter id,
        # include/Parts.hpp:165-168): duplicated filter ids within one
        # component switch the DP to the filter-keyed accumulator scan
        # that reproduces the reference's buffer aliasing exactly.
        # Sharing across components (the common converted-model pattern,
        # e.g. mirrored components) never aliases — ncscores is
        # per-(scale, component) in the reference (src/DynamicProgram.
        # cpp:93) — so it does not set the flag.
        fids = [part.filterid[m] for part in comp.parts
                for m in range(part.nmixtures)]
        aliased = len(set(fids)) != len(fids)
        comps.append(PackedComponent(
            aliased=aliased,
            filterid=jnp.asarray(filterid),
            defw=jnp.asarray(defw),
            anchor=jnp.asarray(anchor),
            bias=jnp.asarray(bias),
            parent=jnp.asarray(parent),
            nmix=jnp.asarray(nmix),
            mix_valid=jnp.asarray(
                np.arange(M)[None, :] < nmix[:, None]),
            root_bias=jnp.asarray(
                float(model.biasw[comp.parts[0].biasid[0]]), dtype),
            fsize=jnp.asarray(fsize)))
        parent_static.append(tuple(int(x) for x in parent))

    return PackedModel(
        bank=jnp.asarray(bank_np, dtype),
        components=tuple(comps),
        thresh=jnp.asarray(float(model.thresh), dtype),
        interval=int(model.interval), binsize=int(model.binsize),
        norient=int(model.norient), flen=int(model.flen),
        name=model.name, parent_static=tuple(parent_static),
        scale_static=tuple(tuple(model.part_scales(c))
                           for c in range(model.ncomponents)))
