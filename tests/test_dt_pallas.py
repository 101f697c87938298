"""Pallas DT kernel vs the XLA reference implementation (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from partsbaseddetector_tpu.ops.dt import (distance_transform_raw,
                                           dt_mixtures_raw)
from partsbaseddetector_tpu.ops.dt_pallas import (
    distance_transform_raw_pallas, dt_mixtures_raw_pallas, dt_pass_pallas)


@pytest.mark.parametrize("R,N", [(8, 16), (11, 37), (3, 130)])
def test_dt_pass_pallas_matches_xla(rng, R, N):
    src = rng.standard_normal((R, N)).astype(np.float32) * 3
    a = -np.abs(rng.standard_normal(R)).astype(np.float32) * 0.1 - 0.01
    b = rng.standard_normal(R).astype(np.float32) * 0.05
    off = rng.integers(-5, 6, R).astype(np.float32)

    out_p, idx_p = dt_pass_pallas(jnp.asarray(src), jnp.asarray(a),
                                  jnp.asarray(b), jnp.asarray(off),
                                  interpret=True)
    # row-by-row XLA reference (_pass_1d takes +w and negates internally;
    # the pallas kernel takes literal coefficients)
    from partsbaseddetector_tpu.ops.dt import _pass_1d
    for r in range(R):
        out_r, idx_r = _pass_1d(jnp.asarray(src[r]), -a[r], -b[r], off[r])
        np.testing.assert_allclose(np.asarray(out_p)[r], np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx_p)[r],
                                      np.asarray(idx_r))


def test_dt_mixtures_pallas_matches_xla(rng):
    M, H, W = 3, 14, 19
    scores = rng.standard_normal((M, H, W)).astype(np.float32) * 2
    defw = np.stack([np.abs(rng.standard_normal(4)) * 0.1 + 0.01
                     for _ in range(M)]).astype(np.float32)
    defw[:, 1] = rng.standard_normal(M) * 0.03   # linear terms any sign
    defw[:, 3] = rng.standard_normal(M) * 0.03
    anchors = rng.integers(-3, 4, (M, 2)).astype(np.int32)

    o1, ix1, iy1 = dt_mixtures_raw(jnp.asarray(scores), jnp.asarray(defw),
                                   jnp.asarray(anchors))
    o2, ix2, iy2 = dt_mixtures_raw_pallas(
        jnp.asarray(scores), jnp.asarray(defw), jnp.asarray(anchors),
        interpret=True)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ix2), np.asarray(ix1))
    np.testing.assert_array_equal(np.asarray(iy2), np.asarray(iy1))


def test_dp_with_pallas_dt_matches_xla(rng):
    from partsbaseddetector_tpu.models import synthetic
    from partsbaseddetector_tpu.models.part_tree import pack_model
    from partsbaseddetector_tpu.ops.dp import dp_min
    from partsbaseddetector_tpu.oracle import reference as oracle

    model = synthetic.tiny(seed=5)
    feat = rng.standard_normal((12, 15, model.flen)) * 0.5
    pdfs = oracle.conv_bank(feat, model.filters)
    packed = pack_model(model)
    pj = jnp.stack([jnp.asarray(p, jnp.float32) for p in pdfs], axis=-1)

    from partsbaseddetector_tpu.ops.dp import composed_tables
    r1 = dp_min(pj, packed.components[0], "reference", "xla")
    # cross-check the full composed tables against the oracle DP
    rootv, rooti, Ix, Iy, Ik = oracle.dp_min(model, 0, pdfs, "reference")
    np.testing.assert_allclose(np.asarray(r1.rootv), rootv, atol=2e-4)
    jIx, jIy, jIk = (np.asarray(t) for t in composed_tables(
        r1, packed.components[0], "reference"))
    for p in range(1, model.components[0].nparts):
        for mp in range(model.components[0].parts[p].nmixtures):
            assert (jIx[p, mp] == Ix[p][mp]).mean() > 0.97
            assert (jIy[p, mp] == Iy[p][mp]).mean() > 0.97
