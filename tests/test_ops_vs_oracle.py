"""JAX op parity vs the NumPy oracle (f32 vs f64 tolerances)."""

import numpy as np
import pytest

from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.oracle import reference as oracle

import jax.numpy as jnp


# ----------------------------------------------------------------- imageops

@pytest.mark.parametrize("shape,dsize", [
    ((48, 64), (30, 40)), ((47, 63), (29, 41)), ((30, 40, 3), (19, 27)),
])
def test_resize_matches_oracle(rng, shape, dsize):
    from partsbaseddetector_tpu.ops.imageops import resize_linear
    im = rng.random(shape)
    ours = np.asarray(resize_linear(jnp.asarray(im), dsize, dsize))
    ref = oracle.resize_linear(im, dsize)
    np.testing.assert_allclose(ours, ref.reshape(ours.shape), atol=2e-5)


def test_resize_padded_dynamic(rng):
    """Resize into a larger padded buffer with dynamic true sizes."""
    from partsbaseddetector_tpu.ops.imageops import resize_linear
    im = np.zeros((64, 64))
    im[:48, :40] = rng.random((48, 40))
    out = np.asarray(resize_linear(jnp.asarray(im), (40, 40), (30, 25),
                                   in_size=(48, 40)))
    ref = oracle.resize_linear(im[:48, :40], (30, 25))
    np.testing.assert_allclose(out[:30, :25], ref, atol=2e-5)
    assert np.all(out[30:] == 0) and np.all(out[:, 25:] == 0)


@pytest.mark.parametrize("shape", [(48, 64), (47, 63), (33, 45, 3)])
def test_pyrdown_matches_oracle(rng, shape):
    from partsbaseddetector_tpu.ops.imageops import pyr_down
    im = rng.random(shape)
    oh, ow = (shape[0] + 1) // 2, (shape[1] + 1) // 2
    ours = np.asarray(pyr_down(jnp.asarray(im), (oh, ow), shape[:2]))
    ref = oracle.pyr_down(im)
    np.testing.assert_allclose(ours, ref.reshape(ours.shape), atol=2e-5)


def test_pyrdown_padded_dynamic(rng):
    from partsbaseddetector_tpu.ops.imageops import pyr_down
    im = np.zeros((64, 64))
    true = (47, 51)
    im[:true[0], :true[1]] = rng.random(true)
    out = np.asarray(pyr_down(jnp.asarray(im), (32, 32), true))
    ref = oracle.pyr_down(im[:true[0], :true[1]])
    oh, ow = (true[0] + 1) // 2, (true[1] + 1) // 2
    np.testing.assert_allclose(out[:oh, :ow], ref, atol=2e-5)


# ----------------------------------------------------------------- HOG

@pytest.mark.parametrize("shape", [(40, 52, 3), (41, 53), (32, 32, 3)])
def test_hog_matches_oracle(rng, shape):
    from partsbaseddetector_tpu.ops.hog import hog_features
    im = rng.random(shape) * 255
    ours = np.asarray(hog_features(jnp.asarray(im), 4, 18, 32))
    ref = oracle.hog_features(im, 4, 18, 32)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_hog_padded_dynamic(rng):
    """HOG in a padded buffer with traced true size must equal HOG of the
    cropped image."""
    from partsbaseddetector_tpu.ops.hog import hog_features, \
        hog_output_shape
    im = np.zeros((64, 64, 3))
    true = (41, 53)
    im[:true[0], :true[1]] = rng.random(true + (3,)) * 255
    bh, bw, oh, ow = hog_output_shape(true, 4)
    ours = np.asarray(hog_features(jnp.asarray(im), 4, 18, 32,
                                   true_size=true, feat_pad=(14, 14)))
    ref = oracle.hog_features(im[:true[0], :true[1]], 4, 18, 32)
    np.testing.assert_allclose(ours[:oh, :ow], ref, atol=5e-4)
    assert np.all(ours[oh:] == 0) and np.all(ours[:, ow:] == 0)


# ----------------------------------------------------------------- conv

def test_conv_bank_matches_oracle(rng):
    from partsbaseddetector_tpu.ops.conv import conv_bank, pack_filter_bank
    H, W, C = 19, 23, 8
    feat = rng.standard_normal((H, W, C))
    filters = [rng.standard_normal((3, 3, C)) for _ in range(4)]
    bank, sizes = pack_filter_bank(filters)
    ours = np.asarray(conv_bank(jnp.asarray(feat), jnp.asarray(bank)))
    ref = oracle.conv_bank(feat, filters)
    for n in range(4):
        np.testing.assert_allclose(ours[..., n], ref[n], atol=1e-4)


def test_conv_bank_mixed_sizes(rng):
    """Variably-sized filters packed with anchor-preserving shifts must be
    exact, including at the occlusion border."""
    from partsbaseddetector_tpu.ops.conv import conv_bank, pack_filter_bank
    H, W, C = 17, 15, 5
    feat = rng.standard_normal((H, W, C))
    filters = [rng.standard_normal((kh, kw, C))
               for kh, kw in [(3, 3), (5, 5), (4, 6), (2, 2)]]
    bank, sizes = pack_filter_bank(filters)
    ours = np.asarray(conv_bank(jnp.asarray(feat), jnp.asarray(bank)))
    ref = oracle.conv_bank(feat, filters)
    for n in range(len(filters)):
        np.testing.assert_allclose(ours[..., n], ref[n], atol=1e-4,
                                   err_msg=f"filter {n}")


def test_conv_bank_padded_dynamic(rng):
    """Levels inside a padded bucket must see their own occlusion border."""
    from partsbaseddetector_tpu.ops.conv import conv_bank, pack_filter_bank
    C = 4
    true = (11, 13)
    feat = np.zeros((16, 16, C))
    feat[:true[0], :true[1]] = rng.standard_normal(true + (C,))
    filters = [rng.standard_normal((3, 3, C))]
    bank, _ = pack_filter_bank(filters)
    ours = np.asarray(conv_bank(jnp.asarray(feat), jnp.asarray(bank),
                                true_size=jnp.asarray(true)))
    ref = oracle.conv_bank(feat[:true[0], :true[1]], filters)
    np.testing.assert_allclose(ours[:true[0], :true[1], 0], ref[0],
                               atol=1e-4)


# ----------------------------------------------------------------- DT

@pytest.mark.parametrize("shape,anchor,compose", [
    ((13, 13), (0, 0), "reference"), ((9, 14), (2, -3), "reference"),
    ((20, 7), (-5, 4), "reference"), ((12, 12), (1, 1), "correct"),
])
def test_dt_matches_oracle(rng, shape, anchor, compose):
    from partsbaseddetector_tpu.ops.dt import distance_transform
    score = rng.standard_normal(shape).astype(np.float32) * 3
    w = np.array([0.1, -0.02, 0.07, 0.01], np.float32)
    out, ix, iy = distance_transform(
        jnp.asarray(score), jnp.asarray(w),
        jnp.asarray(anchor, jnp.int32), compose)
    ref_out, ref_ix, ref_iy = oracle.distance_transform(
        score.astype(np.float64), w, anchor, compose)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4)
    # argmax tables must agree wherever the max is numerically unique
    assert (np.asarray(ix) == ref_ix).mean() > 0.99
    assert (np.asarray(iy) == ref_iy).mean() > 0.99


# ----------------------------------------------------------------- DP

def _setup_dp(seed=5, shape=(14, 17)):
    model = synthetic.tiny(seed=seed)
    rng = np.random.default_rng(seed)
    feat = rng.standard_normal(shape + (model.flen,)) * 0.5
    pdfs = oracle.conv_bank(feat, model.filters)
    return model, feat, pdfs


@pytest.mark.parametrize("compose", ["reference", "correct"])
def test_dp_rootv_matches_oracle(compose):
    from partsbaseddetector_tpu.models.part_tree import pack_model
    from partsbaseddetector_tpu.ops.dp import dp_min
    model, feat, pdfs = _setup_dp()
    packed = pack_model(model)
    pdfs_jax = jnp.stack([jnp.asarray(p, jnp.float32) for p in pdfs],
                         axis=-1)
    from partsbaseddetector_tpu.ops.dp import composed_tables
    res = dp_min(pdfs_jax, packed.components[0], compose)
    rootv, rooti, Ix, Iy, Ik = oracle.dp_min(model, 0, pdfs, compose)
    np.testing.assert_allclose(np.asarray(res.rootv), rootv, atol=2e-4)
    assert (np.asarray(res.rooti) == rooti).mean() > 0.99
    jIx, jIy, jIk = (np.asarray(t) for t in composed_tables(
        res, packed.components[0], compose))
    for p in range(1, model.components[0].nparts):
        pm = model.components[0].parts[
            model.components[0].parts[p].parentid].nmixtures
        for mp in range(pm):
            assert (jIx[p, mp] == Ix[p][mp]).mean() > 0.98
            assert (jIy[p, mp] == Iy[p][mp]).mean() > 0.98
            assert (jIk[p, mp] == Ik[p][mp]).mean() > 0.98


def test_backtrack_matches_oracle():
    from partsbaseddetector_tpu.models.part_tree import pack_model
    from partsbaseddetector_tpu.ops.argmax import backtrack
    from partsbaseddetector_tpu.ops.dp import dp_min
    model, feat, pdfs = _setup_dp(seed=11)
    packed = pack_model(model)
    pdfs_jax = jnp.stack([jnp.asarray(p, jnp.float32) for p in pdfs],
                         axis=-1)
    res = dp_min(pdfs_jax, packed.components[0], "reference")

    scale = 4.0
    rootv, rooti, Ix, Iy, Ik = oracle.dp_min(model, 0, pdfs, "reference")
    # pick a threshold that yields a handful of candidates
    thresh = float(np.quantile(rootv, 0.98))
    model.thresh = thresh
    ref_cands = oracle.dp_argmin(model, 0, rootv, rooti, scale, 0,
                                 Ix, Iy, Ik)
    cands = backtrack(res, packed.components[0],
                      packed.parent_static[0], thresh, scale, k=64)
    got = {}
    for i in range(cands.capacity):
        if bool(cands.valid[i]):
            key = (int(cands.loc[i, 0, 0]), int(cands.loc[i, 0, 1]))
            got[key] = cands
            got[key] = (np.asarray(cands.loc[i]),
                        np.asarray(cands.boxes[i]),
                        float(cands.score[i]))
    assert len(got) == len(ref_cands)
    matched = 0
    for rc in ref_cands:
        key = (int(rc.locations[0, 0]), int(rc.locations[0, 1]))
        assert key in got
        loc, boxes, score = got[key]
        assert abs(score - rc.score) < 2e-4
        if (loc == rc.locations).all():
            matched += 1
            np.testing.assert_array_equal(boxes.astype(np.int64),
                                          rc.parts)
    # allow rare argmax flips from f32-vs-f64, but most must match fully
    assert matched >= max(1, int(0.9 * len(ref_cands)))


def test_conv_bank_fft_matches_spatial(rng):
    from partsbaseddetector_tpu.ops.conv import (conv_bank, conv_bank_fft,
                                                 pack_filter_bank)
    H, W, C = 21, 17, 6
    feats = rng.standard_normal((2, H, W, C)).astype(np.float32)
    filters = [rng.standard_normal((5, 5, C)) for _ in range(3)]
    bank, _ = pack_filter_bank(filters)
    ts = jnp.asarray([[H, W], [15, 11]], jnp.int32)
    a = np.asarray(conv_bank(jnp.asarray(feats), jnp.asarray(bank),
                             true_size=ts))
    b = np.asarray(conv_bank_fft(jnp.asarray(feats), jnp.asarray(bank),
                                 true_size=ts))
    np.testing.assert_allclose(b, a, atol=2e-4)


# ------------------------------------------------------------ shiftdt

@pytest.mark.parametrize("step,start,out_shape", [
    (1, (0, 0), (13, 13)),            # plain DT, same grid
    (2, (3, 1), (6, 7)),              # half-resolution parent
    (2, (-2, -4), (8, 6)),            # negative virtual-padding starts
    (4, (5, 2), (4, 4)),              # two-octave gap
])
def test_shiftdt_matches_oracle(rng, step, start, out_shape):
    from partsbaseddetector_tpu.ops.dt import shiftdt
    H, W = 13, 15
    score = rng.standard_normal((H, W)).astype(np.float32) * 3
    w = np.array([0.1, -0.02, 0.07, 0.01], np.float32)
    startx, starty = start
    leny, lenx = out_shape
    out, ix, iy = shiftdt(jnp.asarray(score), jnp.asarray(w),
                          startx, starty, lenx, leny, step)
    ref_out, ref_ix, ref_iy = oracle.shiftdt(
        score.astype(np.float64), w, startx, starty, lenx, leny, step)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4)
    assert (np.asarray(ix) == ref_ix).mean() > 0.99
    assert (np.asarray(iy) == ref_iy).mean() > 0.99


def test_shiftdt_step1_equals_plain_dt(rng):
    """step=1, start=0 shiftdt equals the plain DT's values (pass order
    differs — y-then-x vs x-then-y — but the max-transform is
    separable, so the values agree; only argmin composition differs)."""
    from partsbaseddetector_tpu.ops.dt import shiftdt, distance_transform
    score = rng.standard_normal((11, 12)).astype(np.float32)
    w = np.array([0.15, 0.03, 0.08, -0.01], np.float32)
    out_s, _, _ = shiftdt(jnp.asarray(score), jnp.asarray(w),
                          0, 0, 12, 11, 1)
    out_d, _, _ = distance_transform(
        jnp.asarray(score), jnp.asarray(w),
        jnp.asarray((0, 0), jnp.int32), "reference")
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               atol=1e-4)
