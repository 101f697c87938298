"""Multi-resolution mixtures-of-parts detection on TPU.

Parts may live at a FINER pyramid level than their parent (anchor
ds > 0) — the Matlab detector's multi-resolution capability
(reference: matlab/detection/detect.m:184-212 with passmsg :230-255 and
the strided DT matlab/oct/shiftdt.cc) that the C++ port dropped.  The
oracle counterpart is oracle/multires.py; semantics documented there.

TPU shape of the program:

  * stages 1-2 are shared with the single-resolution detector
    (infer/detector.pyramid_pdfs): per-octave padded buckets, one
    MXU conv per bucket;
  * for root-octave o, a part at absolute scale s reads its response
    maps from bucket o - s at the SAME slot index (octave bucketing
    makes level ell - s*interval land exactly one bucket up), sliced to
    the root bucket's level count — the cross-resolution wiring is pure
    indexing, no resampling;
  * the leaf-to-root pass is unrolled over parts (maps of different
    parts have different shapes, so a lax.scan cannot carry them); each
    edge message is a strided max-only DT (ops/dt.shiftdt_max) vmapped
    over levels x mixtures;
  * backtracking recomputes argmaxes at the K candidate points only
    (same design as ops/dp.walk_children), with positions mapped through
    the edge stride: child position = parent position * 2^ds + anchor.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.models.part_tree import (PackedComponent,
                                                     PackedModel,
                                                     pack_model)
from partsbaseddetector_tpu.models.schema import PartsModel
from partsbaseddetector_tpu.infer.detector import (Detection, Detector,
                                                   pyramid_pdfs)
from partsbaseddetector_tpu.infer.pyramid_plan import make_plan
from partsbaseddetector_tpu.ops import argmax as argmax_ops
from partsbaseddetector_tpu.ops.common import NEG
from partsbaseddetector_tpu.ops.dp import _argmax_first, _dt_vals_at
from partsbaseddetector_tpu.ops.dt import shiftdt_max


def _dp_multires(per_bucket, o: int, L: int, comp: PackedComponent,
                 pscales, parents, part_masks=None):
    """Leaf-to-root pass for root bucket o over its L levels.

    part_masks: optional per-bucket tuple of (L_b, P, fh_b, fw_b) bool
    masks (allowed part placements); each part's mask is read from its
    OWN slot bucket (o - pscales[p]) — the latent-positive overlap
    constraint at the part's own resolution.  The Matlab reference
    composes masking with multi-scale parts (detect.m:60-101 with
    :184-212), but its testoverlap is called with rlevel (detect.m:95)
    while the score lives at the part's finer level — a logical-index
    size mismatch Matlab silently linearizes.  We implement the
    evident intent: the mask computed on the part's own level grid.

    Returns (rootv (L, M?, H, W) reduced -> (L, H, W), rooti, scores
    per part, tmps per part)."""
    P, M = comp.filterid.shape
    scores: List[jnp.ndarray] = []
    for p in range(P):
        _, pdfs_s, ts_s, _ = per_bucket[o - pscales[p]]
        sp = jnp.moveaxis(pdfs_s[:L], -1, 1)[
            :, comp.filterid[p]]                    # (L, M, Hs, Ws)
        sp = jnp.where(comp.mix_valid[p][None, :, None, None], sp, NEG)
        # padded-cell masking fused here (value-identical to masking
        # the response tensor; PERF.md §mask-fold): each slot's valid
        # extent comes from its OWN bucket's true sizes
        ts = ts_s[:L]                               # (L, 2)
        Hs, Ws = sp.shape[-2:]
        inb = ((jnp.arange(Hs)[None, :, None]
                < ts[:, 0][:, None, None])
               & (jnp.arange(Ws)[None, None, :]
                  < ts[:, 1][:, None, None]))       # (L, Hs, Ws)
        sp = jnp.where(inb[:, None], sp, NEG)
        if part_masks is not None:
            mb = part_masks[o - pscales[p]][:L, p]  # (L, Hs, Ws)
            sp = jnp.where(mb[:, None, :, :], sp, NEG)
        scores.append(sp)

    tmps: List[jnp.ndarray] = [None] * P
    for p in range(P - 1, 0, -1):
        par = parents[p]
        step = 2 ** (pscales[p] - pscales[par])
        Hp, Wp = scores[par].shape[-2:]
        w = comp.defw[p]                            # (M, 4)
        anc = comp.anchor[p].astype(jnp.float32)    # (M, 2)

        def edge(sm, wm, am):
            return shiftdt_max(sm, wm, am[0], am[1], Wp, Hp, step)

        out, tmp = jax.vmap(lambda sl: jax.vmap(edge)(sl, w, anc))(
            scores[p])                              # (L,M,Hp,Wp),(L,M,Hp,Wc)
        tmps[p] = tmp
        weighted = out[:, None] + \
            comp.bias[p].T[None, :, :, None, None]  # (L, Mp, Mc, Hp, Wp)
        maxv = jnp.max(weighted, axis=2)
        scores[par] = scores[par] + maxv

    rootw = scores[0] + comp.root_bias
    rootw = jnp.where(comp.mix_valid[0][None, :, None, None], rootw, NEG)
    rooti = jnp.argmax(rootw, axis=1).astype(jnp.int32)   # (L, H, W)
    rootv = jnp.max(rootw, axis=1)
    return rootv, rooti, scores, tmps


def _walk_slot(rootv, rooti, scores_slot, tmps_slot,
               comp: PackedComponent, pscales, parents, thresh,
               true_size_root, part_scales_slot, k: int,
               component_index: int, level_index):
    """Backtracking for ONE root level: top-k roots + strided K-point
    argmax recomputation down the tree (cf. ops/argmax.backtrack)."""
    H, W = rootv.shape
    P = comp.nparts
    h, wid = true_size_root[0], true_size_root[1]
    inb = ((jnp.arange(H) < h)[:, None] & (jnp.arange(W) < wid)[None, :])
    rv = jnp.where(inb, rootv, -jnp.inf)

    k_eff = min(k, H * W)
    topv, topi = jax.lax.top_k(rv.ravel(), k_eff)
    if k_eff < k:
        topv = jnp.concatenate(
            [topv, jnp.full((k - k_eff,), -jnp.inf, topv.dtype)])
        topi = jnp.concatenate([topi, jnp.zeros((k - k_eff,), topi.dtype)])
    ys = (topi // W).astype(jnp.int32)
    xs = (topi % W).astype(jnp.int32)
    valid = topv > thresh

    xv = [None] * P
    yv = [None] * P
    mv = [None] * P
    xv[0], yv[0] = xs, ys
    mv[0] = rooti[ys, xs]
    for p in range(1, P):
        par = parents[p]
        step = float(2 ** (pscales[p] - pscales[par]))
        w = comp.defw[p]
        anc = comp.anchor[p].astype(jnp.float32)
        pxf = xv[par].astype(jnp.float32) * step
        pyf = yv[par].astype(jnp.float32) * step

        # winning child mixture: strided-DT value at (py, px) per mc,
        # from the y-pass maxima row at parent y (matlab composition)
        line = tmps_slot[p][:, yv[par], :]          # (M, K, Wc)
        sdt_at, _ = _dt_vals_at(
            line, w[:, 0][:, None], w[:, 1][:, None],
            pxf[None, :], anc[:, 0][:, None])       # (M, K)
        weighted = sdt_at + comp.bias[p][:, mv[par]]
        mc = _argmax_first(weighted, 0)             # (K,)

        # x from the y-pass row at (mc, parent y)
        row = tmps_slot[p][mc, yv[par], :]          # (K, Wc)
        _, cx = _dt_vals_at(row, w[mc, 0], w[mc, 1], pxf, anc[mc, 0])
        # y from the accumulated child-score column at cx
        col = scores_slot[p][mc, :, cx]             # (K, Hc)
        _, cy = _dt_vals_at(col, w[mc, 2], w[mc, 3], pyf, anc[mc, 1])
        xv[p], yv[p], mv[p] = cx, cy, mc

    X = jnp.stack(xv, axis=1)                       # (K, P)
    Y = jnp.stack(yv, axis=1)
    Mm = jnp.stack(mv, axis=1)
    sizes = comp.fsize[jnp.arange(P)[None, :], Mm]  # (K, P)
    scl = part_scales_slot[None, :]                 # (1, P)
    x1 = jnp.rint((X - 1) * scl)
    y1 = jnp.rint((Y - 1) * scl)
    ext = jnp.rint(sizes * scl)
    boxes = jnp.stack([x1, y1, x1 + ext - 1, y1 + ext - 1], axis=-1)

    return argmax_ops.Candidates(
        score=topv.astype(jnp.float32),
        valid=valid,
        component=jnp.full((k,), component_index, jnp.int32),
        level=jnp.broadcast_to(jnp.asarray(level_index, jnp.int32),
                               (k,)).astype(jnp.int32),
        boxes=boxes.astype(jnp.float32),
        loc=jnp.stack([X, Y, Mm], axis=-1).astype(jnp.int32))


def _multires_program(image: jnp.ndarray, packed: PackedModel, plan,
                      k_per_level: int,
                      pdfs_transform=None,
                      depth=None, depth_cfg=None,
                      conv_engine: str = "spatial",
                      part_masks=None
                      ) -> argmax_ops.Candidates:
    """pdfs_transform: optional fn(pdfs (L, fh, fw, F)) -> pdfs, applied
    per bucket — the seam scale-axis sharding uses to constrain each
    bucket's LEVEL axis onto the mesh (parallel/scale_sharded.py); the
    cross-bucket slot reads below then reshard through XLA's SPMD
    partitioner.

    depth + depth_cfg: optional (H, W) metric depth map and DepthPrune
    config — per-bucket response pruning before the DP, identical to
    the single-resolution path (infer/detector._detect_program).

    conv_engine: stage-2 scoring engine ("spatial" | "fft"), same knob
    as the single-resolution facade.

    part_masks: optional per-bucket tuple of (L_b, P, fh_b, fw_b) bool
    allowed-placement masks (latent-positive search; see
    _dp_multires)."""
    from partsbaseddetector_tpu.infer.detector import _depth_bad_mask

    per_bucket = pyramid_pdfs(image, packed, plan,
                              conv_engine=conv_engine,
                              mask_invalid=(conv_engine == "fft"))
    if depth is not None and depth_cfg is not None:
        per_bucket = [(b, jnp.where(
            _depth_bad_mask(depth, b, depth_cfg)[:, :, :, None],
            NEG, pdfs), ts, sc) for b, pdfs, ts, sc in per_bucket]
    if pdfs_transform is not None:
        per_bucket = [(b, pdfs_transform(pdfs), ts, sc)
                      for b, pdfs, ts, sc in per_bucket]
    smax = max((max(sc) for sc in packed.scale_static), default=0)
    all_cands: List[argmax_ops.Candidates] = []

    for o in range(smax, len(plan.buckets)):
        bkt, _, tsizes_o, _ = per_bucket[o]
        L = len(bkt.levels)
        levels = jnp.arange(L, dtype=jnp.int32) + bkt.levels[0].index
        for c, comp in enumerate(packed.components):
            pscales = packed.scale_static[c]
            parents = packed.parent_static[c]
            rootv, rooti, scores, tmps = _dp_multires(
                per_bucket, o, L, comp, pscales, parents, part_masks)
            # per-part pixel stride at each slot: the scale vector of
            # the part's own bucket, sliced to this bucket's levels
            pscl = jnp.stack(
                [per_bucket[o - pscales[p]][3][:L]
                 for p in range(comp.nparts)], axis=1)   # (L, P)

            # tmps[0] is never read (the root has no incoming message);
            # a zero placeholder keeps the pytree rectangular for vmap
            tmps_full = tuple([jnp.zeros_like(tmps[1])] + tmps[1:]) \
                if comp.nparts > 1 else (jnp.zeros_like(rootv[:, None]),)
            fn = jax.vmap(lambda rv, ri, sc, tm, ts, ps, li: _walk_slot(
                rv, ri, sc, tm, comp, pscales, parents, packed.thresh,
                ts, ps, k_per_level, c, li))
            cands = fn(rootv, rooti, tuple(scores), tmps_full,
                       tsizes_o, pscl, levels)
            all_cands.append(jax.tree.map(
                lambda x: x.reshape((L * k_per_level,) + x.shape[2:]),
                cands))

    merged = argmax_ops.concat_candidates(all_cands)
    return argmax_ops.sort_candidates(merged)


class MultiResDetector:
    """Facade for multi-resolution models (max_scale() > 0); also valid
    for single-resolution models, where it reproduces the Matlab-mode
    semantics (same values as Detector; argmax tie order may differ).

    >>> det = MultiResDetector(model)
    >>> detections = det.detect(image)
    """

    def __init__(self, model: PartsModel, k_per_level: int = 64,
                 depth_prune=None, conv_engine: str = "spatial",
                 aot_dir=None):
        from partsbaseddetector_tpu.infer.detector import CONV_ENGINES
        if conv_engine not in CONV_ENGINES:
            raise ValueError(f"conv_engine {conv_engine!r}; one of "
                             f"{sorted(CONV_ENGINES)}")
        self.conv_engine = conv_engine
        # AOT executable cache (infer/aot.py), same semantics as
        # Detector(aot_dir=...): restarts deserialize instead of
        # recompiling; artifacts keyed by program config + source hash
        self.aot_dir = aot_dir
        self.aot_stats = []
        self.model = model
        self.packed = pack_model(model)
        if any(c.aliased for c in self.packed.components):
            # the multires DP keys accumulation by (part, level); the
            # reference's filter-id buffer aliasing (ncscores,
            # include/Parts.hpp:165-168) is implemented on the
            # single-resolution paths (ops/dp._dp_min_aliased) but the
            # combination with cross-octave slots has no reference
            # semantics to match (the C++ port dropped multires, the
            # Matlab path never shares filters within a component)
            raise NotImplementedError(
                "multi-resolution models with shared filter ids within "
                "a component are not supported")
        self.k_per_level = int(k_per_level)
        self.depth_prune = depth_prune   # infer.detector.DepthPrune
        self._compiled: Dict[Tuple, object] = {}

    def detect_raw(self, image, depth=None) -> argmax_ops.Candidates:
        """depth: optional (H, W) metric depth map — with a
        ``depth_prune`` config, responses at implausible depths are
        masked before the DP (same semantics as Detector.detect_raw)."""
        image = jnp.asarray(image)
        if depth is not None and self.depth_prune is None:
            raise ValueError(
                "depth map passed but this detector has no depth_prune "
                "config (matches Detector behavior)")
        use_depth = depth is not None
        key = (("depth",) if use_depth else ()) + tuple(image.shape)
        if self.aot_dir is not None:
            # Compiled executables are (shape, dtype)-exact
            key += (str(image.dtype),)
            if use_depth:
                depth = jnp.asarray(depth)
                key += tuple(depth.shape) + (str(depth.dtype),)
        if key not in self._compiled:
            plan = make_plan(image.shape[:2], self.model.binsize,
                             self.model.interval)
            kw = dict(plan=plan, k_per_level=self.k_per_level,
                      conv_engine=self.conv_engine)
            if use_depth:
                kw["depth_cfg"] = self.depth_prune
            if self.aot_dir is not None:
                from partsbaseddetector_tpu.infer import aot as aot_mod
                single = partial(_multires_program, **kw)
                if use_depth:
                    prog = (lambda image, packed, depth:
                            single(image, packed, depth=depth))
                    args = (image, self.packed, jnp.asarray(depth))
                else:
                    prog = single
                    args = (image, self.packed)
                cfg = dict(kind="multires",
                           k_per_level=self.k_per_level,
                           conv_engine=self.conv_engine,
                           depth="depth" if use_depth else "")
                if self.depth_prune is not None:
                    # pruning constants are baked into the executable —
                    # key them so a config change misses the cache
                    import dataclasses as _dc
                    cfg["depth_prune"] = _dc.asdict(self.depth_prune)
                stats = aot_mod.AotStats()
                fn = aot_mod.get_or_compile(jax.jit(prog), args, cfg,
                                            self.aot_dir, stats)
                self.aot_stats.append(stats)
            else:
                fn = jax.jit(partial(_multires_program, **kw))
            self._compiled[key] = fn
        if use_depth:
            if self.aot_dir is not None:
                return self._compiled[key](image, self.packed,
                                           jnp.asarray(depth))
            return self._compiled[key](image, self.packed,
                                       depth=jnp.asarray(depth))
        return self._compiled[key](image, self.packed)

    def detect_masked_raw(self, image, part_masks
                          ) -> argmax_ops.Candidates:
        """Latent-positive masked search on a multi-resolution model:
        part_masks is the per-bucket (L, P, fh, fw) bool format of
        Detector.detect_masked_raw; each part's mask is read at its
        own octave (see _dp_multires — the Matlab trainer's overlap
        constraint, detect.m:60-101, composed with multi-scale parts,
        detect.m:184-212)."""
        image = jnp.asarray(image)
        key = ("masked",) + tuple(image.shape[:2])
        if key not in self._compiled:
            plan = make_plan(image.shape[:2], self.model.binsize,
                             self.model.interval)
            self._compiled[key] = jax.jit(partial(
                _multires_program, plan=plan,
                k_per_level=self.k_per_level,
                conv_engine=self.conv_engine))
        return self._compiled[key](
            image, self.packed,
            part_masks=tuple(jnp.asarray(m) for m in part_masks))

    def plan_for(self, imshape):
        """PyramidPlan for an image shape (same facade surface as
        Detector — the trainer's mask/feature plumbing uses it)."""
        return make_plan(imshape, self.model.binsize,
                         self.model.interval)

    def update_model(self, model: PartsModel) -> None:
        """Swap weights without recompiling (same traced-args contract
        as Detector.update_model)."""
        assert model.binsize == self.model.binsize
        assert model.interval == self.model.interval
        self.model = model
        self.packed = pack_model(model)

    def pyramid_features(self, image):
        """Per-level HOG maps (true sizes, host numpy) — the trainer's
        feature write-back path (train/features.py), shared program
        with Detector.pyramid_features."""
        import numpy as _np

        from partsbaseddetector_tpu.infer.detector import \
            pyramid_features_program
        image = jnp.asarray(image)
        key = ("feats",) + tuple(image.shape[:2])
        if key not in self._compiled:
            plan = self.plan_for(image.shape[:2])
            fn = jax.jit(pyramid_features_program(
                plan, self.packed.norient, self.packed.flen))
            self._compiled[key] = (fn, plan)
        fn, plan = self._compiled[key]
        feats = fn(image)
        return [_np.asarray(f[:lvl.featsize[0], :lvl.featsize[1]])
                for f, lvl in zip(feats, plan.levels)]

    def detect(self, image, *, depth=None,
               max_detections=None) -> List[Detection]:
        # keyword-only: a legacy positional detect(im, 5) must raise,
        # not silently pass 5 as a depth map
        return Detector.candidates_to_detections(
            self.detect_raw(image, depth=depth), max_detections)

    # same facade surface as Detector (demo CLI, streaming pipeline)
    candidates_to_detections = staticmethod(
        Detector.candidates_to_detections)
