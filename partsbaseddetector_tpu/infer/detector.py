"""Detector facade: the TPU-native counterpart of PartsBasedDetector.

Mirrors the reference's 4-stage pipeline — pyramid, filter-bank scoring,
DP, backtracking (reference: src/PartsBasedDetector.cpp:69-95) — as one
jitted program per (image shape, model) pair:

  stage 1  resize ladder + HOG per level, levels grouped into per-octave
           padded buckets (SURVEY.md §7.2 shape bucketing)
  stage 2  one MXU conv per bucket over all mixture filters
  stage 3  vmapped tree-scan DP over levels
  stage 4  deterministic top-K extraction + unrolled backtracking

``distributeModel`` (reference: src/PartsBasedDetector.cpp:102-127)
becomes ``pack_model``: weights land on device once; per-image work is a
single device call.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.models.part_tree import PackedModel, pack_model
from partsbaseddetector_tpu.models.schema import PartsModel
from partsbaseddetector_tpu.infer.pyramid_plan import PyramidPlan, make_plan
from partsbaseddetector_tpu.ops import argmax as argmax_ops
from partsbaseddetector_tpu.ops.common import NEG
from partsbaseddetector_tpu.ops.conv import conv_bank, conv_bank_fft
from partsbaseddetector_tpu.ops.dp import dp_min_levels
from partsbaseddetector_tpu.ops.hog import hog_features
from partsbaseddetector_tpu.ops.imageops import pyr_down, resize_linear

#: selectable stage-2 convolution engines — the facade-level engine
#: choice the reference makes when wiring the model
#: (src/PartsBasedDetector.cpp:108-118: Spatial only; the Fourier
#: engine was dead code, realized working in ops/conv.conv_bank_fft)
CONV_ENGINES = {"spatial": conv_bank, "fft": conv_bank_fft}


@dataclasses.dataclass
class Detection:
    """Host-side detection result (the reference's Candidate,
    include/Candidate.hpp:56-101)."""

    score: float
    component: int
    level: int
    parts: np.ndarray      # (P, 4) float boxes x1, y1, x2, y2
    locations: np.ndarray  # (P, 3) int x, y, mixture (feature-grid coords)

    def bounding_box(self) -> np.ndarray:
        """Hull over part boxes (reference: include/Candidate.hpp:105-111).
        """
        x1 = self.parts[:, 0].min()
        y1 = self.parts[:, 1].min()
        x2 = self.parts[:, 2].max()
        y2 = self.parts[:, 3].max()
        return np.array([x1, y1, x2, y2])

    def bounding_box_norm(self) -> np.ndarray:
        """mean +- 1.5 sigma box over part centroids
        (reference: include/Candidate.hpp:117-130)."""
        cx = (self.parts[:, 0] + self.parts[:, 2]) / 2.0
        cy = (self.parts[:, 1] + self.parts[:, 3]) / 2.0
        return np.array([cx.mean() - 1.5 * cx.std(),
                         cy.mean() - 1.5 * cy.std(),
                         cx.mean() + 1.5 * cx.std(),
                         cy.mean() + 1.5 * cy.std()])

    def resized(self, factor: float) -> "Detection":
        """Scale all part boxes (reference: include/Candidate.hpp:82-89).
        """
        return dataclasses.replace(self, parts=self.parts * factor)


@dataclasses.dataclass(frozen=True)
class DepthPrune:
    """Static config for depth-based response pruning — the completed
    form of the reference's abandoned filterResponseByDepth
    (src/SearchSpacePruning.cpp:47-70: computes the plausible depth
    Z = fx * X / scale, then does nothing; its call site is commented
    out at src/PartsBasedDetector.cpp:86).  A part of physical width
    ``part_width_m`` detected at pyramid scale s (pixels per cell) is
    plausible only at depths within ``tol`` (relative) of
    fx * part_width_m / s; response cells at implausible depths are
    masked to NEG before the DP.  Depth 0 means unknown: never pruned.
    """

    part_width_m: float
    fx: float
    tol: float = 0.5


def _depth_bad_mask(depth: jnp.ndarray, bucket, cfg: DepthPrune):
    """(L, fh, fw) bool: True where the response cell's observed depth
    is implausible for this level's scale.  Depth is sampled at cell
    centers with static indices (one tiny gather per level, off the
    DT/DP hot path), mirroring post/depth.filter_response_by_depth."""
    dh, dw = depth.shape
    fh, fw = bucket.feat_pad
    rows = []
    for lvl in bucket.levels:
        th, tw = lvl.featsize
        ys = np.clip(((np.arange(fh) + 0.5) * dh
                      / max(th, 1)).astype(np.int32), 0, dh - 1)
        xs = np.clip(((np.arange(fw) + 0.5) * dw
                      / max(tw, 1)).astype(np.int32), 0, dw - 1)
        sdepth = depth[ys][:, xs]                         # (fh, fw)
        zexp = cfg.fx * cfg.part_width_m / float(lvl.scale)
        bad = (sdepth > 0) & (jnp.abs(sdepth - zexp) > cfg.tol * zexp)
        rows.append(bad)
    return jnp.stack(rows)


def _dp_groups(bucket, dp_split: int):
    """Split a bucket's levels into <= dp_split groups for stages 3-4,
    each padded only to ITS largest level.  Within an octave, level sizes
    decay by 2^(-i/interval), so DT cost on the octave-padded buffer
    wastes ~2x on the upper levels; re-padding per group recovers most of
    it (cost model: sum over levels of H*W^2 vs the padded bound)."""
    L = len(bucket.levels)
    n = max(1, min(dp_split, L))
    size = (L + n - 1) // n
    groups = []
    for lo in range(0, L, size):
        hi = min(lo + size, L)
        fh, fw = bucket.levels[lo].featsize   # largest level in group
        groups.append((lo, hi, fh, fw))
    return groups


def pyramid_pdfs(image: jnp.ndarray, packed: PackedModel,
                 plan: PyramidPlan, conv_engine: str = "spatial",
                 mask_invalid: bool = True):
    """Stages 1-2 for every bucket (ladder + HOG + filter-bank conv).

    Yields (bucket, pdfs, tsizes, scales) per octave bucket.  With
    mask_invalid=True, pdfs (L, fh, fw, F) is NEG-masked beyond each
    level's true extent so the DT can never pull a padded cell into the
    true region; with False the caller fuses that mask into the DP's
    scores0 construction instead (dp_min(true_size=...)) — value-
    identical, but skips a full-(L, fh, fw, F) rewrite per bucket
    (PERF.md §mask-fold).  Shared by the single-resolution detect
    program and the multi-resolution one (infer/multires.py).

    conv_engine: "spatial" (direct MXU conv) or "fft" (frequency-domain
    scoring) — the reference's engine choice at distributeModel time
    (src/PartsBasedDetector.cpp:108-118)."""
    conv = CONV_ENGINES[conv_engine]
    binsize = plan.binsize
    norient = packed.norient
    flen = packed.flen
    img = image.astype(jnp.float32)
    prev_buf = None            # padded (L, H, W, C) images of prev octave
    prev_levels = None
    out = []

    for bucket in plan.buckets:
        # ---- stage 1a: scale ladder into the bucket buffer, one traced
        # body per bucket (vmap over levels with traced true sizes keeps
        # the program O(buckets), not O(levels))
        imsizes = jnp.asarray([lvl.imsize for lvl in bucket.levels],
                              jnp.int32)
        if bucket.octave == 0:
            buf = jax.vmap(lambda ts: resize_linear(
                img, bucket.img_pad, (ts[0], ts[1])))(imsizes)
        else:
            prev_sizes = jnp.asarray(
                [lvl.imsize for lvl in prev_levels[:len(bucket.levels)]],
                jnp.int32)
            buf = jax.vmap(lambda sb, ts: pyr_down(
                sb, bucket.img_pad, (ts[0], ts[1])))(
                    prev_buf[:len(bucket.levels)], prev_sizes)
        prev_buf, prev_levels = buf, bucket.levels

        # ---- stage 1b: HOG per level (traced true sizes, one body)
        feats = jax.vmap(lambda b, ts: hog_features(
            b, binsize, norient, flen, true_size=(ts[0], ts[1]),
            feat_pad=bucket.feat_pad))(buf, imsizes)   # (L, fh, fw, C)

        # ---- stage 2: one conv for the whole bucket
        tsizes = jnp.asarray([lvl.featsize for lvl in bucket.levels],
                             jnp.int32)
        pdfs = conv(feats, packed.bank, true_size=tsizes)

        if mask_invalid:
            # mask responses beyond each level's true extent
            fh, fw = bucket.feat_pad
            masks = np.zeros((len(bucket.levels), fh, fw, 1),
                             np.float32)
            for j, lvl in enumerate(bucket.levels):
                masks[j, :lvl.featsize[0], :lvl.featsize[1]] = 1.0
            maskj = jnp.asarray(masks)
            pdfs = pdfs * maskj + (1.0 - maskj) * NEG

        scales = jnp.asarray([lvl.scale for lvl in bucket.levels],
                             jnp.float32)
        out.append((bucket, pdfs, tsizes, scales))
    return out


def pyramid_features_program(plan: PyramidPlan, norient: int,
                             flen: int):
    """Stage-1 program: per-level HOG maps (padded) for the whole
    pyramid — the trainer's feature write-back path, shared by the
    single-resolution and multi-resolution facades."""
    def fn(img):
        img = img.astype(jnp.float32)
        out = []
        prev_buf = prev_levels = None
        for bucket in plan.buckets:
            imsizes = jnp.asarray(
                [lvl.imsize for lvl in bucket.levels], jnp.int32)
            if bucket.octave == 0:
                buf = jax.vmap(lambda ts: resize_linear(
                    img, bucket.img_pad, (ts[0], ts[1])))(imsizes)
            else:
                prev_sizes = jnp.asarray(
                    [lvl.imsize for lvl in
                     prev_levels[:len(bucket.levels)]], jnp.int32)
                buf = jax.vmap(lambda sb, ts: pyr_down(
                    sb, bucket.img_pad, (ts[0], ts[1])))(
                        prev_buf[:len(bucket.levels)], prev_sizes)
            prev_buf, prev_levels = buf, bucket.levels
            feats = jax.vmap(lambda b, ts: hog_features(
                b, plan.binsize, norient, flen,
                true_size=(ts[0], ts[1]),
                feat_pad=bucket.feat_pad))(buf, imsizes)
            out.extend(feats[j] for j in range(len(bucket.levels)))
        return out

    return fn


def _detect_program(image: jnp.ndarray, packed: PackedModel,
                    plan: PyramidPlan, k_per_level: int,
                    compose: str,
                    dt_impl: str = "xla",
                    part_masks=None,
                    dp_split: int = 1,
                    depth=None,
                    depth_cfg: Optional[DepthPrune] = None,
                    conv_engine: str = "spatial",
                    walk_impl: str = "xla",
                    pdfs_transform=None
                    ) -> argmax_ops.Candidates:
    """The full jitted detection program for one image.

    part_masks: optional per-bucket list of (L, P, fh, fw) bool masks of
    allowed part placements (latent-positive search, train/latent.py).
    depth + depth_cfg: optional (H, W) depth map (meters) and static
    pruning config — masks stage-2 responses at implausible depths
    before the DP (the realized filterResponseByDepth call site,
    src/PartsBasedDetector.cpp:86).
    pdfs_transform: optional fn(pdfs (L, fh, fw, F_local)) -> (L, fh,
    fw, F) applied per bucket right after stage 2 — the hook the
    manual-sharding (shard_map) batch path uses to all-gather
    filter-sharded conv responses before the DP (parallel/sharded.py).
    """
    all_cands: List[argmax_ops.Candidates] = []

    # padded-cell masking is fused into the DP's scores0 construction
    # (dp_min(true_size=...)) instead of rewriting the full response
    # tensor here — value-identical (PERF.md §mask-fold)
    for bucket, pdfs, tsizes, scales in pyramid_pdfs(
            image, packed, plan, conv_engine,
            mask_invalid=(conv_engine == "fft")):
        if pdfs_transform is not None:
            pdfs = pdfs_transform(pdfs)
        if depth is not None and depth_cfg is not None:
            bad = _depth_bad_mask(depth, bucket, depth_cfg)
            pdfs = jnp.where(bad[:, :, :, None], NEG, pdfs)
        bmask = None if part_masks is None else \
            part_masks[bucket.octave]
        all_cands.extend(dp_backtrack_bucket(
            bucket, pdfs, tsizes, scales, packed, k_per_level, compose,
            dt_impl, bmask, dp_split, walk_impl))

    merged = argmax_ops.concat_candidates(all_cands)
    return argmax_ops.sort_candidates(merged)


def dp_backtrack_bucket(bucket, pdfs, tsizes, scales,
                        packed: PackedModel, k_per_level: int,
                        compose: str, dt_impl: str = "xla",
                        bmask=None, dp_split: int = 1,
                        walk_impl: str = "xla"
                        ) -> List[argmax_ops.Candidates]:
    """Stages 3-4 for one octave bucket: per (level group, component)
    DP + backtracking.  Groups re-pad to their own largest level so the
    DT never pays the octave bound.  Shared by the single-image detect
    program and the cross-stage pipeline (parallel/pipeline.py)."""
    out: List[argmax_ops.Candidates] = []
    for lo, hi, gfh, gfw in _dp_groups(bucket, dp_split):
        gpdfs = pdfs[lo:hi, :gfh, :gfw]
        gmask = None if bmask is None else bmask[lo:hi, :, :gfh, :gfw]
        for c, comp in enumerate(packed.components):
            res = dp_min_levels(gpdfs, comp, compose, dt_impl, gmask,
                                true_sizes=tsizes[lo:hi])
            cands = argmax_ops.backtrack_levels(
                res, comp, packed.parent_static[c], packed.thresh,
                scales[lo:hi], k_per_level, true_sizes=tsizes[lo:hi],
                component_index=c,
                level_offset=bucket.levels[lo].index, compose=compose,
                walk_impl=walk_impl)
            out.append(cands)
    return out


class Detector:
    """User-facing facade.

    >>> det = Detector(model)
    >>> detections = det.detect(image)     # image: (H, W[, 3]) RGB array
    """

    def __init__(self, model: PartsModel, k_per_level: int = 64,
                 compose: str = "reference", dt_impl: str = "auto",
                 dp_split: Optional[int] = None,
                 depth_prune: Optional[DepthPrune] = None,
                 conv_engine: str = "spatial",
                 walk_impl: str = "auto",
                 aot_dir: Optional[str] = None):
        if model.max_scale() > 0:
            raise ValueError(
                "model has parts at multiple resolutions (anchor ds > "
                "0); use infer.multires.MultiResDetector")
        self.model = model
        self.packed = pack_model(model)
        self.k_per_level = int(k_per_level)
        self.compose = compose
        if dt_impl == "auto":
            # the dense max-only XLA formulation measured fastest on
            # TPU: 266 GOPS sustained vs 9.6 GOPS for a Pallas
            # displacement-sweep kernel on the same shapes (PERF.md
            # §DT); the envelope algorithm cannot vectorize on TPU
            # (per-lane stack indexing), so the Pallas path was deleted
            # after the measurement
            dt_impl = "xla"
        self.dt_impl = dt_impl
        if dp_split is None:
            # measured optimum scales with levels per octave: person-26
            # (interval 10) peaks at dp_split 5, face-68 (interval 5)
            # at 3 — more groups than ~interval/2 over-fragment the
            # scans (PERF.md §retune sweep)
            dp_split = max(1, (model.interval + 1) // 2)
        self.dp_split = int(dp_split)
        self.depth_prune = depth_prune
        if conv_engine not in CONV_ENGINES:
            raise ValueError(f"conv_engine {conv_engine!r}; one of "
                             f"{sorted(CONV_ENGINES)}")
        self.conv_engine = conv_engine
        if walk_impl == "auto":
            # the fused Pallas walk replaces ~3 launch-bound gather ops
            # per part with one kernel per (bucket, group); it is a TPU
            # (Mosaic) kernel, so other backends keep the XLA walk
            # (the interpret-mode kernel exists for parity tests only)
            walk_impl = ("pallas" if jax.default_backend() == "tpu"
                         else "xla")
        if walk_impl not in ("xla", "pallas", "pallas_interpret"):
            raise ValueError(f"walk_impl {walk_impl!r}")
        self.walk_impl = walk_impl
        # AOT executable cache (infer/aot.py): when set, detect_raw /
        # detect_batch_raw materialize programs by DESERIALIZING the
        # compiled executable from this directory instead of compiling
        # — the deterministic serving cold-start the C++ reference gets
        # for free.  Weights stay traced args, so artifacts are
        # weight-independent.
        self.aot_dir = aot_dir
        self.aot_stats: List = []      # one infer.aot.AotStats per
        #                                materialized program
        # keys: (H, W) | ("batch", B, H, W) | ("masked"|"feats"|"depth",
        # H, W) | ("aot"[, "batch"], full shape...) ->
        # (compiled fn, PyramidPlan)
        self._compiled: Dict[tuple, tuple] = {}

    def _aot_materialize(self, key, plan, program, example_args,
                         variant: str):
        """Compile-or-load for one program under the AOT cache."""
        from partsbaseddetector_tpu.infer import aot as aot_mod
        cfg = dict(k_per_level=self.k_per_level, compose=self.compose,
                   dt_impl=self.dt_impl, dp_split=self.dp_split,
                   conv_engine=self.conv_engine,
                   walk_impl=self.walk_impl, variant=variant,
                   plan=plan.signature()
                   if hasattr(plan, "signature") else str(key))
        if self.depth_prune is not None:
            # DepthPrune values are baked into the compiled program as
            # constants (_depth_bad_mask) — a different config must MISS
            # the executable cache, not load a stale-pruning program
            cfg["depth_prune"] = dataclasses.asdict(self.depth_prune)
        stats = aot_mod.AotStats()
        fn = aot_mod.get_or_compile(jax.jit(program), example_args,
                                    cfg, self.aot_dir, stats)
        self.aot_stats.append(stats)
        return fn

    @classmethod
    def from_config(cls, model: PartsModel, cfg) -> "Detector":
        """Build from a config.RuntimeConfig (the unified typed config,
        SURVEY.md §5 'one typed config covering model + runtime')."""
        return cls(model, k_per_level=cfg.k_per_level,
                   compose=cfg.compose, dt_impl=cfg.dt_impl,
                   dp_split=cfg.dp_split, conv_engine=cfg.conv_engine,
                   walk_impl=getattr(cfg, "walk_impl", "auto"),
                   aot_dir=getattr(cfg, "aot_dir", None))

    def plan_for(self, imshape: Tuple[int, int]) -> PyramidPlan:
        return make_plan(imshape, self.model.binsize, self.model.interval)

    def _program(self, plan: PyramidPlan, **overrides):
        """The detect program with this detector's static config bound
        (the distributeModel step, src/PartsBasedDetector.cpp:102-127)."""
        kw = dict(plan=plan, k_per_level=self.k_per_level,
                  compose=self.compose, dt_impl=self.dt_impl,
                  dp_split=self.dp_split, conv_engine=self.conv_engine,
                  walk_impl=self.walk_impl)
        kw.update(overrides)
        return partial(_detect_program, **kw)

    def _get_fn(self, imshape: Tuple[int, int]):
        key = tuple(imshape)
        if key not in self._compiled:
            plan = self.plan_for(imshape)
            fn = jax.jit(self._program(plan))
            self._compiled[key] = (fn, plan)
        return self._compiled[key]

    def detect_raw(self, image, depth=None) -> argmax_ops.Candidates:
        """Run the device program; returns the fixed-capacity Candidates
        pytree (scores sorted descending, invalid entries last).

        depth: optional (H, W) metric depth map — with a ``depth_prune``
        config, stage-2 responses at implausible depths are masked
        before the DP (the reference's detect(im, depth, candidates)
        signature, include/PartsBasedDetector.hpp:172-174, with the
        commented-out pruning call realized)."""
        image = jnp.asarray(image)
        if depth is not None and self.depth_prune is None:
            raise ValueError(
                "depth map passed but this Detector has no depth_prune "
                "config; construct Detector(..., depth_prune="
                "DepthPrune(...)) (matches BatchDetector behavior)")
        if depth is None:
            if self.aot_dir is not None:
                # the executable's calling convention is fixed at full
                # (shape, dtype) — keyed here; uint8 frames stay uint8
                # (host->device transfer volume matters, PERF.md)
                key = ("aot",) + tuple(image.shape) + (str(image.dtype),)
                if key not in self._compiled:
                    plan = self.plan_for(image.shape[:2])
                    fn = self._aot_materialize(
                        key, plan, self._program(plan),
                        (image, self.packed), "single")
                    self._compiled[key] = (fn, plan)
                fn, _ = self._compiled[key]
                return fn(image, self.packed)
            fn, _ = self._get_fn(image.shape[:2])
            return fn(image, self.packed)
        depth = jnp.asarray(depth)
        if self.aot_dir is not None:
            key = ("aot", "depth") + tuple(image.shape) \
                + (str(image.dtype),) + tuple(depth.shape) \
                + (str(depth.dtype),)
            if key not in self._compiled:
                plan = self.plan_for(image.shape[:2])
                single = self._program(plan, depth_cfg=self.depth_prune)
                # positional wrapper: Compiled's serialized calling
                # convention is positional-only
                prog = (lambda image, packed, depth:
                        single(image, packed, depth=depth))
                fn = self._aot_materialize(
                    key, plan, prog, (image, self.packed, depth),
                    "depth")
                self._compiled[key] = (fn, plan)
            fn, _ = self._compiled[key]
            return fn(image, self.packed, depth)
        key = ("depth",) + tuple(image.shape[:2])
        if key not in self._compiled:
            plan = self.plan_for(image.shape[:2])
            fn = jax.jit(self._program(plan, depth_cfg=self.depth_prune))
            self._compiled[key] = (fn, plan)
        fn, _ = self._compiled[key]
        return fn(image, self.packed, depth=depth)

    def detect_batch_raw(self, images, depths=None
                         ) -> argmax_ops.Candidates:
        """Single-chip micro-batched detection: one device dispatch for a
        (B, H, W, 3) stack of frames (vmap of the detect program over the
        batch axis).  Amortizes per-dispatch host overhead and gives XLA
        a batch axis to overlap the small upper-pyramid levels across
        frames; the per-frame math is identical to detect_raw.  Returns
        Candidates with a leading (B, ...) axis.

        depths: optional (B, H, W) metric depth maps (requires a
        ``depth_prune`` config) — per-frame response pruning, identical
        to the single-frame depth path."""
        images = jnp.asarray(images)
        if images.ndim != 4:
            raise ValueError("detect_batch_raw expects (B, H, W, 3) "
                             f"images, got shape {images.shape}")
        if depths is not None and self.depth_prune is None:
            raise ValueError(
                "depth maps passed but this Detector has no depth_prune "
                "config; construct Detector(..., depth_prune="
                "DepthPrune(...))")
        use_depth = depths is not None
        if self.aot_dir is not None and not use_depth:
            key = ("aot", "batch") + tuple(images.shape) \
                + (str(images.dtype),)
            if key not in self._compiled:
                plan = self.plan_for(images.shape[1:3])
                single = self._program(plan)

                def batch_program(ims, packed):
                    return jax.vmap(lambda im: single(im, packed))(ims)
                fn = self._aot_materialize(
                    key, plan, batch_program, (images, self.packed),
                    "batch")
                self._compiled[key] = (fn, plan)
            fn, _ = self._compiled[key]
            return fn(images, self.packed)
        key = (("batch", "depth") if use_depth else ("batch",)) \
            + (images.shape[0],) + tuple(images.shape[1:3])
        if key not in self._compiled:
            plan = self.plan_for(images.shape[1:3])
            if use_depth:
                single = self._program(plan, depth_cfg=self.depth_prune)
                fn = jax.jit(lambda ims, ds, packed: jax.vmap(
                    lambda im, d: single(im, packed, depth=d))(ims, ds))
            else:
                single = self._program(plan)
                fn = jax.jit(lambda ims, packed: jax.vmap(
                    lambda im: single(im, packed))(ims))
            self._compiled[key] = (fn, plan)
        fn, _ = self._compiled[key]
        if use_depth:
            return fn(images, jnp.asarray(depths), self.packed)
        return fn(images, self.packed)

    def detect_masked_raw(self, image, part_masks
                          ) -> argmax_ops.Candidates:
        """Detection with per-part placement masks (latent-positive
        search).  part_masks: per-bucket list of (L, P, fh, fw) bool
        arrays (see train/features.part_overlap_masks + plan buckets)."""
        image = jnp.asarray(image)
        key = ("masked",) + tuple(image.shape[:2])
        if key not in self._compiled:
            plan = self.plan_for(image.shape[:2])
            fn = jax.jit(self._program(plan))
            self._compiled[key] = (fn, plan)
        fn, _ = self._compiled[key]
        return fn(image, self.packed,
                  part_masks=tuple(jnp.asarray(m) for m in part_masks))

    def detect(self, image, *, depth=None,
               max_detections: Optional[int] = None) -> List[Detection]:
        """Detect and return host-side Detections above the model
        threshold, sorted by score descending.  depth: optional (H, W)
        metric depth map (see detect_raw).  Trailing params are
        keyword-only so a legacy positional ``detect(im, 5)`` cannot
        silently pass 5 as a depth map."""
        return self.candidates_to_detections(
            self.detect_raw(image, depth=depth), max_detections)

    def update_model(self, model: PartsModel) -> None:
        """Swap in updated weights without recompiling (the packed model
        is a traced argument, so any same-shaped model reuses the
        compiled programs — the trainer's inner loop relies on this)."""
        assert model.binsize == self.model.binsize
        assert model.interval == self.model.interval
        self.model = model
        self.packed = pack_model(model)

    def pyramid_features(self, image) -> List[np.ndarray]:
        """Per-level HOG feature maps (true sizes, host numpy) — used by
        the trainer's feature write-back (train/features.py)."""
        image = jnp.asarray(image)
        key = ("feats",) + tuple(image.shape[:2])
        if key not in self._compiled:
            plan = self.plan_for(image.shape[:2])
            fn = jax.jit(pyramid_features_program(
                plan, self.packed.norient, self.packed.flen))
            self._compiled[key] = (fn, plan)
        fn, plan = self._compiled[key]
        feats = fn(image)
        return [np.asarray(f[:lvl.featsize[0], :lvl.featsize[1]])
                for f, lvl in zip(feats, plan.levels)]

    @staticmethod
    def candidates_to_detections(cands: argmax_ops.Candidates,
                                 max_detections: Optional[int] = None
                                 ) -> List[Detection]:
        """Convert a device Candidates pytree to host Detections
        (valid entries only, preserving order)."""
        score = np.asarray(cands.score)
        valid = np.asarray(cands.valid)
        comp = np.asarray(cands.component)
        level = np.asarray(cands.level)
        boxes = np.asarray(cands.boxes)
        locs = np.asarray(cands.loc)
        out: List[Detection] = []
        for i in range(len(score)):
            if not valid[i]:
                continue
            out.append(Detection(score=float(score[i]),
                                 component=int(comp[i]),
                                 level=int(level[i]),
                                 parts=boxes[i], locations=locs[i]))
            if max_detections is not None and len(out) >= max_detections:
                break
        return out
