#!/usr/bin/env python
"""Per-stage timing of the detect program on the real chip: compile
cumulative programs (HOG | +conv | +DP | full) and difference the
steady-state times."""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.models.part_tree import pack_model
from partsbaseddetector_tpu.infer.detector import _detect_program
from partsbaseddetector_tpu.infer.pyramid_plan import make_plan
from partsbaseddetector_tpu.ops.conv import conv_bank
from partsbaseddetector_tpu.ops.dp import dp_min_levels
from partsbaseddetector_tpu.ops.hog import hog_features
from partsbaseddetector_tpu.ops.imageops import pyr_down, resize_linear
from partsbaseddetector_tpu.ops.common import NEG


def build(stage, plan, packed):
    def prog(image, packed):
        binsize = plan.binsize
        img = image.astype(jnp.float32)
        prev_buf = prev_levels = None
        acc = jnp.float32(0)
        for bucket in plan.buckets:
            imsizes = jnp.asarray([l.imsize for l in bucket.levels],
                                  jnp.int32)
            if bucket.octave == 0:
                buf = jax.vmap(lambda ts: resize_linear(
                    img, bucket.img_pad, (ts[0], ts[1])))(imsizes)
            else:
                prev_sizes = jnp.asarray(
                    [l.imsize for l in prev_levels[:len(bucket.levels)]],
                    jnp.int32)
                buf = jax.vmap(lambda sb, ts: pyr_down(
                    sb, bucket.img_pad, (ts[0], ts[1])))(
                        prev_buf[:len(bucket.levels)], prev_sizes)
            prev_buf, prev_levels = buf, bucket.levels
            if stage == "ladder":
                acc += jnp.sum(buf)
                continue
            feats = jax.vmap(lambda b, ts: hog_features(
                b, binsize, packed.norient, packed.flen,
                true_size=(ts[0], ts[1]),
                feat_pad=bucket.feat_pad))(buf, imsizes)
            if stage == "hog":
                acc += jnp.sum(feats)
                continue
            tsizes = jnp.asarray([l.featsize for l in bucket.levels],
                                 jnp.int32)
            pdfs = conv_bank(feats, packed.bank, true_size=tsizes)
            fh, fw = bucket.feat_pad
            masks = np.zeros((len(bucket.levels), fh, fw, 1), np.float32)
            for j, lvl in enumerate(bucket.levels):
                masks[j, :lvl.featsize[0], :lvl.featsize[1]] = 1.0
            maskj = jnp.asarray(masks)
            pdfs = pdfs * maskj + (1.0 - maskj) * NEG
            if stage == "conv":
                acc += jnp.sum(jnp.where(jnp.isfinite(pdfs), pdfs, 0))
                continue
            for c, comp in enumerate(packed.components):
                res = dp_min_levels(pdfs, comp, "reference", "xla")
                acc += jnp.sum(res.rootv) + jnp.sum(res.tmp[0])
        return acc
    return jax.jit(prog)


def timeit(fn, *args):
    # force a host fetch of the scalar: through the axon tunnel
    # block_until_ready returns immediately (experimental platform), so
    # np.asarray is the only reliable completion barrier.  The constant
    # round-trip cost cancels in the cumulative differences.
    np.asarray(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    model = synthetic.person_like()
    model.thresh = 0.0
    packed = pack_model(model)
    plan = make_plan((480, 640), model.binsize, model.interval)
    rng = np.random.default_rng(0)
    im = jnp.asarray((rng.random((480, 640, 3)) * 255)
                     .astype(np.float32))

    results = {}
    for stage in ["ladder", "hog", "conv", "dp"]:
        t0 = time.time()
        fn = build(stage, plan, packed)
        t = timeit(fn, im, packed)
        results[stage] = t
        print(f"{stage:8s} cumulative {t*1000:8.2f} ms  "
              f"(compile {time.time()-t0:.1f}s)", flush=True)

    full = jax.jit(partial(_detect_program, plan=plan, k_per_level=64,
                           compose="reference", dt_impl="xla"))
    def fw(image, packed):
        c = full(image, packed)
        return c.score
    t = timeit(fw, im, packed)
    results["full"] = t
    print(f"{'full':8s} cumulative {t*1000:8.2f} ms", flush=True)

    prev = 0.0
    for k in ["ladder", "hog", "conv", "dp", "full"]:
        print(f"{k:8s} marginal {(results[k]-prev)*1000:8.2f} ms")
        prev = results[k]


if __name__ == "__main__":
    main()
