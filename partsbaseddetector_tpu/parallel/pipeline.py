"""Pipeline parallelism across detection stages.

The reference's detect() is a 4-stage pipeline run sequentially per
frame (src/PartsBasedDetector.cpp:69-95).  For streaming video over
multiple chips, the stages can run on DIFFERENT device groups —
pyramid + HOG + filter-bank conv (stages 1-2) on a front group, DP +
backtracking (stages 3-4) on a back group — with frames in flight in
both groups at once (BASELINE.json config 5; SURVEY.md §2.4 row 4).

Because JAX dispatch is asynchronous, the software pipeline needs no
threads: the host enqueues stage-1(frame i+1) while stage-2(frame i)
runs; the inter-group transfer of the response maps is an async
device-to-device copy.

When to use (measured on the flagship workload, see PERF.md): the
stages are imbalanced — stage 1-2 ~12 ms vs stage 3-4 ~44 ms per
frame — so a 1:1 two-group pipeline is throughput-bound at the slow
stage and LOSES to pure data parallelism over the same chips.  It wins
when (a) groups are sized to the imbalance (e.g. 1 front : 3+ back
chips), or (b) per-chip memory cannot hold the whole model + working
set, or (c) per-frame latency must overlap I/O decode on the front
group.  The class supports uneven groups via the device lists.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from partsbaseddetector_tpu.infer.detector import (Detector,
                                                   dp_backtrack_bucket,
                                                   pyramid_pdfs)
from partsbaseddetector_tpu.infer.pyramid_plan import make_plan
from partsbaseddetector_tpu.models.part_tree import pack_model
from partsbaseddetector_tpu.models.schema import PartsModel
from partsbaseddetector_tpu.ops import argmax as argmax_ops


def _stage1_program(image, packed, plan, conv_engine: str = "spatial",
                    depth=None, depth_cfg=None):
    """Stages 1-2: ladder + HOG + conv for every bucket.  Returns a
    pytree of (pdfs, tsizes, scales) per bucket (bucket metadata is
    static via the shared plan).  Depth pruning happens HERE, on the
    front group, so only pruned response maps cross the inter-group
    link."""
    from partsbaseddetector_tpu.infer.detector import _depth_bad_mask
    from partsbaseddetector_tpu.ops.common import NEG

    out = []
    # padded-cell masking fused into the back group's DP
    # (dp_backtrack_bucket passes true sizes; PERF.md §mask-fold)
    for bucket, pdfs, tsizes, scales in pyramid_pdfs(
            image, packed, plan, conv_engine,
            mask_invalid=(conv_engine == "fft")):
        if depth is not None and depth_cfg is not None:
            bad = _depth_bad_mask(depth, bucket, depth_cfg)
            pdfs = jnp.where(bad[:, :, :, None], NEG, pdfs)
        out.append((pdfs, tsizes, scales))
    return tuple(out)


def _stage2_program(per_bucket, packed, plan, k_per_level: int,
                    compose: str, dp_split: int, part_masks=None,
                    walk_impl: str = "xla"):
    """Stages 3-4: DP + backtracking from transferred response maps.
    part_masks: optional per-bucket tuple of (L, P, fh, fw) bool masks
    (latent-positive search), applied on the back group.  walk_impl:
    the back group is a single device group (no SPMD sharding), so the
    fused Pallas walk applies exactly as on the single-chip path."""
    all_cands: List[argmax_ops.Candidates] = []
    for bucket, (pdfs, tsizes, scales) in zip(plan.buckets, per_bucket):
        bmask = None if part_masks is None else \
            part_masks[bucket.octave]
        all_cands.extend(dp_backtrack_bucket(
            bucket, pdfs, tsizes, scales, packed, k_per_level, compose,
            bmask=bmask, dp_split=dp_split, walk_impl=walk_impl))
    return argmax_ops.sort_candidates(
        argmax_ops.concat_candidates(all_cands))


class PipelinedDetector:
    """Two-group cross-stage pipelined detector.

    >>> devs = jax.devices()
    >>> pdet = PipelinedDetector(model, front=devs[0], back=devs[1])
    >>> for cands in pdet.stream(frames): ...
    """

    def __init__(self, model: PartsModel, front, back,
                 k_per_level: int = 64, compose: str = "reference",
                 dp_split=None, conv_engine: str = "spatial",
                 depth_prune=None, walk_impl: str = "auto",
                 aot_dir=None):
        if model.max_scale() > 0:
            raise ValueError(
                "multi-resolution models couple levels across octave "
                "buckets; stage groups cannot split them — use the "
                "data-parallel BatchDetector (multires)")
        self.model = model
        self.front = front
        self.back = back
        self.k_per_level = int(k_per_level)
        self.compose = compose
        if dp_split is None:     # interval-scaled optimum (PERF.md)
            dp_split = max(1, (model.interval + 1) // 2)
        self.dp_split = int(dp_split)
        self.conv_engine = conv_engine
        self.depth_prune = depth_prune      # infer.detector.DepthPrune
        if walk_impl == "auto":
            # same resolution rule as the single-chip Detector: the
            # fused walk is a TPU (Mosaic) kernel
            walk_impl = ("pallas" if jax.default_backend() == "tpu"
                         else "xla")
        if walk_impl not in ("xla", "pallas", "pallas_interpret"):
            raise ValueError(f"walk_impl {walk_impl!r}")
        self.walk_impl = walk_impl
        # AOT executable cache (infer/aot.py): BOTH stage programs
        # restart by deserializing (keyed per stage group's device), so
        # the pipelined serving shape has the same deterministic cold
        # start as every other path (the reference's zero cold start,
        # src/demo.cpp:55-118)
        self.aot_dir = aot_dir
        self.aot_stats = []
        packed = pack_model(model)
        # the front group only convolves: it needs the bank; the back
        # group needs the tree parameters
        self.packed_front = jax.device_put(packed, front)
        self.packed_back = jax.device_put(packed, back)
        self._compiled = {}

    def _get_fns(self, imshape, variant: str = ""):
        key = (variant,) + tuple(imshape)
        if key not in self._compiled:
            plan = make_plan(imshape, self.model.binsize,
                             self.model.interval)
            s1kw = dict(plan=plan, conv_engine=self.conv_engine)
            if variant == "depth":
                if self.depth_prune is None:
                    raise ValueError("construct PipelinedDetector with "
                                     "depth_prune=DepthPrune(...)")
                s1kw["depth_cfg"] = self.depth_prune
            fn1 = jax.jit(partial(_stage1_program, **s1kw))
            fn2 = jax.jit(partial(_stage2_program, plan=plan,
                                  k_per_level=self.k_per_level,
                                  compose=self.compose,
                                  dp_split=self.dp_split,
                                  walk_impl=self.walk_impl))
            self._compiled[key] = (fn1, fn2, plan)
        return self._compiled[key]

    def _get_exec_fns(self, image, depth=None):
        """(fn1, fn2) callables, AOT-materialized when aot_dir is set.
        Both take positional args; fn1 takes (image, packed[, depth]),
        fn2 takes (per_bucket, packed).  fn2's example args (the
        stage-1 output pytree) only exist after stage 1 runs, so the
        first materialization executes stage 1 once."""
        variant = "depth" if depth is not None else ""
        if self.aot_dir is None:
            fn1, fn2, _ = self._get_fns(image.shape[:2], variant)
            if depth is not None:
                return (lambda im, pk, d: fn1(im, pk, depth=d)), fn2
            return fn1, fn2
        key = ("aot", variant) + tuple(image.shape) \
            + (str(image.dtype),)
        if depth is not None:
            key += tuple(depth.shape) + (str(depth.dtype),)
        if key not in self._compiled:
            import dataclasses as _dc

            from partsbaseddetector_tpu.infer import aot as aot_mod
            jfn1, jfn2, _ = self._get_fns(image.shape[:2], variant)
            cfg = dict(kind="pipelined",
                       k_per_level=self.k_per_level,
                       compose=self.compose, dp_split=self.dp_split,
                       conv_engine=self.conv_engine,
                       walk_impl=self.walk_impl, variant=variant)
            if self.depth_prune is not None:
                cfg["depth_prune"] = _dc.asdict(self.depth_prune)

            def devs(d):
                return list(d) if isinstance(d, (list, tuple)) else [d]

            img_f = jax.device_put(image, self.front)
            if depth is not None:
                d_f = jax.device_put(depth, self.front)
                # positional wrapper (Compiled calling convention)
                prog1 = jax.jit(
                    lambda im, pk, d: jfn1(im, pk, depth=d))
                s1_args = (img_f, self.packed_front, d_f)
            else:
                prog1 = jfn1
                s1_args = (img_f, self.packed_front)
            st1 = aot_mod.AotStats()
            fn1x = aot_mod.get_or_compile(
                prog1, s1_args, dict(cfg, stage=1), self.aot_dir, st1,
                devices=devs(self.front))
            s1 = fn1x(*s1_args)
            s1_back = jax.device_put(s1, self.back)
            st2 = aot_mod.AotStats()
            fn2x = aot_mod.get_or_compile(
                jfn2, (s1_back, self.packed_back), dict(cfg, stage=2),
                self.aot_dir, st2, devices=devs(self.back))
            self.aot_stats.extend([st1, st2])
            self._compiled[key] = (fn1x, fn2x)
        return self._compiled[key]

    def detect_raw(self, image, depth=None) -> argmax_ops.Candidates:
        """One frame through both stages (no pipelining benefit for a
        single frame; use stream() for throughput).  depth: optional
        (H, W) metric depth map (requires depth_prune; pruning runs on
        the front group)."""
        image = jnp.asarray(image)
        if depth is not None and self.depth_prune is None:
            raise ValueError(
                "depth map passed but this detector has no depth_prune "
                "config (matches Detector behavior)")
        if depth is not None and self.depth_prune is not None:
            depth = jnp.asarray(depth)
            fn1, fn2 = self._get_exec_fns(image, depth)
            s1 = fn1(jax.device_put(image, self.front),
                     self.packed_front,
                     jax.device_put(depth, self.front))
        else:
            fn1, fn2 = self._get_exec_fns(image)
            s1 = fn1(jax.device_put(image, self.front),
                     self.packed_front)
        s1_back = jax.device_put(s1, self.back)     # inter-group copy
        return fn2(s1_back, self.packed_back)

    def detect_masked_raw(self, image, part_masks
                          ) -> argmax_ops.Candidates:
        """Latent-positive masked search through the pipeline: masks
        apply in the DP, so they ride to the back group only."""
        image = jnp.asarray(image)
        fn1, fn2, _ = self._get_fns(image.shape[:2])
        s1 = fn1(jax.device_put(image, self.front), self.packed_front)
        s1_back = jax.device_put(s1, self.back)
        masks_back = tuple(
            jax.device_put(jnp.asarray(m), self.back)
            for m in part_masks)
        return fn2(s1_back, self.packed_back, part_masks=masks_back)

    def stream(self, frames, depth_of_pipeline: int = 2, depths=None):
        """Generator over Candidates, one per frame, with up to
        ``depth_of_pipeline`` frames in flight (front computes frame
        i+1 while back computes frame i — all enqueued asynchronously,
        drained with a lag so the host never blocks the pipe).

        depths: optional per-frame metric depth maps (requires
        depth_prune); pruning runs on the front group per frame."""
        if depths is not None and self.depth_prune is None:
            raise ValueError(
                "depth maps passed but this detector has no "
                "depth_prune config (matches Detector behavior)")
        pending = []
        for i, f in enumerate(frames):
            image = jnp.asarray(f)
            if depths is not None and self.depth_prune is not None:
                d = jnp.asarray(depths[i])
                fn1, fn2 = self._get_exec_fns(image, d)
                s1 = fn1(jax.device_put(image, self.front),
                         self.packed_front,
                         jax.device_put(d, self.front))
            else:
                fn1, fn2 = self._get_exec_fns(image)
                s1 = fn1(jax.device_put(image, self.front),
                         self.packed_front)
            s1_back = jax.device_put(s1, self.back)
            out = fn2(s1_back, self.packed_back)
            pending.append(out)
            if len(pending) >= depth_of_pipeline:
                yield pending.pop(0)
        yield from pending

    def detect(self, image, max_detections: Optional[int] = None):
        return Detector.candidates_to_detections(
            self.detect_raw(image), max_detections)
