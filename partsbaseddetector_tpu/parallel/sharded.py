"""Sharded batch detection over a (data, filter) mesh.

Image batches shard over ``data``; the packed filter bank shards its
output-channel axis over ``filter``, so the stage-2 conv (the FLOPs
bulk, reference analog src/SpatialConvolutionEngine.cpp:106-124) runs
model-parallel, and XLA's SPMD partitioner inserts the all-gather of
responses feeding the DP (whose gather by filter id needs the full F
axis).  Candidates come back per-image with deterministic top-K order —
the multi-chip replacement for the reference's OpenMP-critical
push_back (src/DynamicProgram.cpp:246-251).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from partsbaseddetector_tpu.infer.detector import _detect_program
from partsbaseddetector_tpu.infer.pyramid_plan import make_plan
from partsbaseddetector_tpu.models.part_tree import pack_model
from partsbaseddetector_tpu.models.schema import PartsModel
from partsbaseddetector_tpu.ops.argmax import Candidates


class BatchDetector:
    """Batched, mesh-sharded detector.

    >>> mesh = make_mesh((4, 2))
    >>> bdet = BatchDetector(model, mesh)
    >>> cands = bdet.detect_batch(images)   # (B, H, W, 3), B % data == 0
    """

    def __init__(self, model: PartsModel, mesh: Mesh,
                 k_per_level: int = 64, compose: str = "reference",
                 dt_impl: str = "auto", dp_split=None,
                 conv_engine: str = "spatial", depth_prune=None,
                 walk_impl: str = "auto", aot_dir=None):
        self.model = model
        self.mesh = mesh
        self.k_per_level = int(k_per_level)
        self.compose = compose
        self.dt_impl = "xla" if dt_impl == "auto" else dt_impl
        if dp_split is None:     # interval-scaled optimum (PERF.md)
            dp_split = max(1, (model.interval + 1) // 2)
        self.dp_split = int(dp_split)
        self.conv_engine = conv_engine
        self.depth_prune = depth_prune      # infer.detector.DepthPrune
        if walk_impl == "auto":
            # same rule as the single-chip Detector; the fused walk is
            # a Mosaic (TPU) kernel.  On the sharded path it runs under
            # shard_map (manual data+filter axes) because Mosaic custom
            # calls are not auto-partitionable by GSPMD.
            walk_impl = ("pallas" if jax.default_backend() == "tpu"
                         else "xla")
        if walk_impl not in ("xla", "pallas", "pallas_interpret"):
            raise ValueError(f"walk_impl {walk_impl!r}")
        self.walk_impl = walk_impl
        # AOT executable cache for the SHARDED serving program
        # (infer/aot.py): restart of a fleet deserializes the SPMD
        # executable per host instead of recompiling; artifacts keyed
        # by mesh shape + device list on top of the single-chip key.
        self.aot_dir = aot_dir
        self.aot_stats = []
        # multi-resolution models route through the multires program
        # (same facade; the single-res program asserts max_scale() == 0)
        self.multires = model.max_scale() > 0
        self.packed = pack_model(model)
        if self.multires and any(c.aliased
                                 for c in self.packed.components):
            # same boundary as MultiResDetector: the multires DP has no
            # filter-keyed accumulator (no reference semantics to match)
            raise NotImplementedError(
                "multi-resolution models with shared filter ids within "
                "a component are not supported")
        # pad the filter bank's output-channel axis to the filter-axis
        # size (padded filters are all-zero and never referenced by any
        # filterid), then shard it
        nfilt_axis = mesh.shape["filter"]
        F = self.packed.bank.shape[3]
        pad = (-F) % nfilt_axis
        bank = self.packed.bank
        if pad:
            bank = jax.numpy.pad(bank, ((0, 0),) * 3 + ((0, pad),))
        bank_spec = P(None, None, None, "filter")
        import dataclasses
        self.packed = dataclasses.replace(
            self.packed,
            bank=jax.device_put(bank, NamedSharding(mesh, bank_spec)),
            components=jax.device_put(
                self.packed.components, NamedSharding(mesh, P())),
            thresh=jax.device_put(
                self.packed.thresh, NamedSharding(mesh, P())))
        self._compiled = {}

    def _get_fn(self, imshape: Tuple[int, ...], variant: str = ""):
        """variant: "" | "depth" | "masked" — the same feature set the
        single-chip Detector exposes, batched + sharded (no silent
        capability holes across parallelism paths)."""
        key = (variant,) + tuple(imshape)
        if key not in self._compiled:
            plan = make_plan(imshape[1:3], self.model.binsize,
                             self.model.interval)

            if self.multires:
                # every variant incl. "masked": _multires_program takes
                # part_masks (per-part masks at each part's own octave,
                # infer/multires._dp_multires)
                from functools import partial as _partial

                from partsbaseddetector_tpu.infer.multires import \
                    _multires_program

                single = _partial(_multires_program, plan=plan,
                                  k_per_level=self.k_per_level,
                                  conv_engine=self.conv_engine)
                if variant == "depth":
                    if self.depth_prune is None:
                        raise ValueError("construct BatchDetector with "
                                         "depth_prune=DepthPrune(...)")
                    single = _partial(single,
                                      depth_cfg=self.depth_prune)
            else:
                from functools import partial as _partial
                base = _partial(
                    _detect_program, plan=plan,
                    k_per_level=self.k_per_level, compose=self.compose,
                    dt_impl=self.dt_impl, dp_split=self.dp_split,
                    conv_engine=self.conv_engine)
                if variant == "depth":
                    if self.depth_prune is None:
                        raise ValueError("construct BatchDetector with "
                                         "depth_prune=DepthPrune(...)")
                    single = _partial(base, depth_cfg=self.depth_prune)
                else:
                    single = base
                if self.walk_impl != "xla":
                    return self._shard_map_fn(key, plan, single,
                                              variant)

            img_sharding = NamedSharding(
                self.mesh, P("data", None, None))
            out_sharding = NamedSharding(self.mesh, P("data"))
            if variant == "depth":
                def batch_program(images, depths, packed):
                    return jax.vmap(lambda im, d: single(
                        im, packed, depth=d))(images, depths)
                fn = jax.jit(batch_program,
                             in_shardings=(img_sharding,
                                           NamedSharding(
                                               self.mesh,
                                               P("data", None, None)),
                                           None),
                             out_shardings=out_sharding)
            elif variant == "masked":
                def batch_program(images, masks, packed):
                    return jax.vmap(lambda im, m: single(
                        im, packed, part_masks=m))(images, masks)
                mask_sharding = NamedSharding(self.mesh, P("data"))
                fn = jax.jit(batch_program,
                             in_shardings=(img_sharding, mask_sharding,
                                           None),
                             out_shardings=out_sharding)
            else:
                def batch_program(images, packed):
                    return jax.vmap(lambda im: single(im, packed))(
                        images)
                fn = jax.jit(batch_program,
                             in_shardings=(img_sharding, None),
                             out_shardings=out_sharding)
            self._compiled[key] = fn
        return self._compiled[key]

    def _shard_map_fn(self, key, plan, single, variant: str):
        """Manual-sharding batch program (jax.shard_map over the
        (data, filter) mesh) for the fused Pallas walk: Mosaic custom
        calls are not auto-partitionable by GSPMD, so the whole
        per-frame program runs per data shard, with the filter-sharded
        stage-2 responses ALL-GATHERED explicitly (the one collective
        of the program) before the DP.  Stages 3-4 are replicated
        across the filter axis — the same work placement GSPMD's
        propagation chooses for the auto path, expressed manually.
        Numerics are identical to the auto path (the all-gather
        reconstructs the full bank order; the per-frame program is
        unchanged)."""
        import dataclasses as _dc
        from functools import partial as _partial

        if key in self._compiled:
            return self._compiled[key]

        single = _partial(
            single, walk_impl=self.walk_impl,
            pdfs_transform=lambda pdfs: jax.lax.all_gather(
                pdfs, "filter", axis=-1, tiled=True))

        packed_specs = jax.tree.map(lambda _: P(), self.packed)
        packed_specs = _dc.replace(
            packed_specs, bank=P(None, None, None, "filter"))
        img_spec = P("data", None, None, None)
        out_spec = P("data")

        if variant == "depth":
            def program(images, depths, packed):
                return jax.vmap(lambda im, d: single(
                    im, packed, depth=d))(images, depths)
            in_specs = (img_spec, P("data", None, None), packed_specs)
        elif variant == "masked":
            def program(images, masks, packed):
                return jax.vmap(lambda im, m: single(
                    im, packed, part_masks=m))(images, masks)
            in_specs = (img_spec,
                        tuple(P("data", None, None, None, None)
                              for _ in plan.buckets), packed_specs)
        else:
            def program(images, packed):
                return jax.vmap(lambda im: single(im, packed))(images)
            in_specs = (img_spec, packed_specs)

        fn = jax.jit(jax.shard_map(
            program, mesh=self.mesh, in_specs=in_specs,
            out_specs=out_spec, check_vma=False))
        self._compiled[key] = fn
        return fn

    def _check_batch(self, images):
        images = jax.numpy.asarray(images, jax.numpy.float32)
        ndata = self.mesh.shape["data"]
        if images.shape[0] % ndata:
            raise ValueError(
                f"batch {images.shape[0]} not divisible by data axis "
                f"{ndata}")
        return images

    def detect_batch(self, images, depths=None) -> Candidates:
        """images: (B, H, W[, 3]); B must divide evenly over the data
        axis.  Returns Candidates with leading batch axis (B, ...).

        depths: optional (B, H, W) metric depth maps — with a
        ``depth_prune`` config, per-frame stage-2 response pruning
        exactly like Detector.detect_raw(image, depth)."""
        images = self._check_batch(images)
        if depths is not None:
            fn = self._get_fn(images.shape, "depth")
            return fn(images, jax.numpy.asarray(depths), self.packed)
        if self.aot_dir is not None:
            key = ("aot",) + tuple(images.shape) + (str(images.dtype),)
            if key not in self._compiled:
                from partsbaseddetector_tpu.infer import aot as aot_mod
                jitted = self._get_fn(images.shape)
                cfg = dict(kind="batch_sharded",
                           mesh=dict(self.mesh.shape),
                           k_per_level=self.k_per_level,
                           compose=self.compose, dt_impl=self.dt_impl,
                           dp_split=self.dp_split,
                           conv_engine=self.conv_engine,
                           walk_impl=self.walk_impl,
                           multires=self.multires)
                stats = aot_mod.AotStats()
                fn = aot_mod.get_or_compile(
                    jitted, (images, self.packed), cfg, self.aot_dir,
                    stats, devices=list(self.mesh.devices.flat))
                self.aot_stats.append(stats)
                self._compiled[key] = fn
            return self._compiled[key](images, self.packed)
        fn = self._get_fn(images.shape)
        return fn(images, self.packed)

    def detect_masked_batch(self, images, part_masks) -> Candidates:
        """Batched latent-positive masked search: part_masks is a
        per-bucket tuple of (B, L, P, fh, fw) bool arrays (the batched
        form of Detector.detect_masked_raw's per-image masks)."""
        images = self._check_batch(images)
        fn = self._get_fn(images.shape, "masked")
        return fn(images,
                  tuple(jax.numpy.asarray(m) for m in part_masks),
                  self.packed)

    def local_frame_slices(self, global_batch: int):
        """Which rows of a global batch THIS process must supply to
        detect_batch_distributed: the union of its devices' shards
        under the data-axis sharding.  On a 1-D (data,) mesh this is
        the contiguous per-process slice; on a 2-D (data, filter) mesh
        processes sharing a data row each supply the SAME rows (frames
        replicate across the filter axis).  Returns a sorted list of
        (start, stop) row ranges."""
        sharding = NamedSharding(self.mesh, P("data", None, None, None))
        m = sharding.addressable_devices_indices_map(
            (global_batch, 1, 1, 1))
        return sorted({(sl[0].start or 0, sl[0].stop or global_batch)
                       for sl in m.values()})

    def local_frames(self, global_images) -> np.ndarray:
        """Slice a host-resident global batch down to the frames this
        process owns (see local_frame_slices) — the convenience inverse
        for drivers that materialize the whole batch on every host."""
        global_images = np.asarray(global_images)
        return np.concatenate(
            [global_images[a:b] for a, b in
             self.local_frame_slices(global_images.shape[0])])

    def detect_batch_distributed(self, local_images) -> Candidates:
        """Multi-PROCESS entry point (jax.distributed initialized, the
        mesh spanning all processes' devices): every process passes the
        (B_local, H, W, 3) frames it OWNS under the mesh's data axis —
        exactly the rows local_frame_slices reports, in order.  On a
        1-D data mesh that is the per-process contiguous slice; on a
        2-D (data, filter) mesh, processes sharing a data row pass the
        same rows.  Returns the global Candidates pytree — each process
        addresses its own shards (use multihost_utils.process_allgather
        for a full host copy).  This is the DCN/ICI replacement for the
        reference's single-process frame loop (SURVEY.md §2.4)."""
        from jax.sharding import NamedSharding, PartitionSpec

        local_images = np.asarray(local_images, np.float32)
        if local_images.ndim != 4:
            raise ValueError("detect_batch_distributed expects local "
                             "(B_local, H, W, 3) images")
        sharding = NamedSharding(
            self.mesh, PartitionSpec("data", None, None, None))
        global_images = jax.make_array_from_process_local_data(
            sharding, local_images)
        fn = self._get_fn(global_images.shape)
        return fn(global_images, self.packed)
