"""Filter-id aliasing parity: shared filters within one component.

The reference keys its accumulated DP scores by FILTER ID (``ncscores``
read/written through ``ComponentPart::score`` = scores[filterid[p][m]],
reference: include/Parts.hpp:165-168 via src/DynamicProgram.cpp:115-155),
so several (part, mixture) slots sharing one filter id ALIAS their
accumulation buffers — converted VOC/face-lineage models rely on shared
filters.  These tests pin the packed DP's filter-keyed accumulator scan
(ops/dp._dp_min_aliased) to the NumPy oracle, whose dp_min implements
the same buffer-aliasing semantics scalar-by-scalar.
"""

import numpy as np
import pytest

from partsbaseddetector_tpu.infer.detector import Detector
from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.models.part_tree import pack_model
from partsbaseddetector_tpu.oracle import reference as oracle


def aliased_chain(seed: int = 13):
    """4-part chain with two kinds of within-component sharing that
    genuinely change the DP result vs unique filters:

      * parent/child sharing — part 2 mixture 0 reuses part 1 mixture
        0's filter, so part 1's read also sees the messages part 3
        addressed to part 2 (the ncscores aliasing of
        src/DynamicProgram.cpp:115-118);
      * within-part sharing — part 1's two mixtures share one filter,
        so both parent-mixture writes (:152-155) land in one buffer.
    """
    model = synthetic.make_model(
        name="aliased_chain", nparts=4, nmixtures=2, root_nmixtures=2,
        filter_size=3, norient=6, flen=14, binsize=4, interval=3,
        parent=[-1, 0, 1, 2], seed=seed)
    comp = model.components[0]
    comp.parts[2].filterid[0] = comp.parts[1].filterid[0]
    comp.parts[1].filterid[1] = comp.parts[1].filterid[0]
    model.validate()
    return model


def dealiased_copy(model):
    """Same weights, but every (part, mixture) gets its own filter id
    (fresh copies of the shared filter) — the reference semantics on
    this model are the plain part-keyed DP."""
    import copy
    out = copy.deepcopy(model)
    comp = out.components[0]
    for part in comp.parts:
        for m in range(part.nmixtures):
            fid = part.filterid[m]
            part.filterid[m] = len(out.filters)
            out.filters.append(out.filters[fid].copy())
    out.validate()
    return out


def test_pack_model_accepts_aliasing():
    model = aliased_chain()
    packed = pack_model(model)
    assert packed.components[0].aliased
    plain = pack_model(synthetic.tiny(seed=3))
    assert not plain.components[0].aliased


def test_aliasing_changes_the_dp():
    """Sanity: the fixture's aliasing is load-bearing — the oracle on
    the aliased model differs from the oracle on the dealiased copy
    (same weights, unique ids).  Without this, the parity test below
    could pass with a DP that ignores aliasing entirely."""
    model = aliased_chain()
    model.thresh = -1e9
    deal = dealiased_copy(model)
    rng = np.random.default_rng(5)
    im = rng.random((64, 64)) * 255

    feats = [oracle.hog_features(x, model.binsize, model.norient,
                                 model.flen)
             for x in oracle.pyramid(im, model.binsize,
                                     model.interval)[0]]
    f = feats[0]
    ra, _, _, _, _ = oracle.dp_min(model, 0,
                                   oracle.conv_bank(f, model.filters))
    rd, _, _, _, _ = oracle.dp_min(deal, 0,
                                   oracle.conv_bank(f, deal.filters))
    assert np.abs(ra - rd).max() > 1e-6


@pytest.mark.parametrize("seed", [13, 29])
def test_aliased_detector_matches_oracle(seed):
    model = aliased_chain(seed=seed)
    rng = np.random.default_rng(seed + 1)
    im = rng.random((64, 80)) * 255

    ref_all = oracle.detect(im, model)
    scores = np.array([c.score for c in ref_all])
    model.thresh = float(np.quantile(scores, 0.999))
    ref = [c for c in ref_all if c.score > model.thresh]
    assert 1 <= len(ref) < 64

    det = Detector(model, k_per_level=64)
    dets = det.detect(im)

    got = {(d.level, int(d.locations[0, 0]), int(d.locations[0, 1])): d
           for d in dets}
    exact = 0
    for rc in ref:
        key = (rc.scale_index, int(rc.locations[0, 0]),
               int(rc.locations[0, 1]))
        assert key in got, f"oracle candidate {key} missing"
        d = got[key]
        assert abs(d.score - rc.score) < 5e-4
        if (d.locations == rc.locations).all():
            np.testing.assert_array_equal(
                d.parts.astype(np.int64), rc.parts)
            exact += 1
    assert exact >= int(0.9 * len(ref))
    assert abs(len(dets) - len(ref)) <= max(1, int(0.1 * len(ref)))


def test_aliased_native_cross_check():
    """Independent-engine check of the buffer-aliasing semantics: the
    native C++ engine's filter-keyed accumulator (envelope DT,
    reference algorithm structure) must reproduce the JAX filter-keyed
    scan's candidate sets on a genuinely-aliased model."""
    from partsbaseddetector_tpu import native_engine as ne
    try:
        eng = ne.NativeEngine()
    except (RuntimeError, OSError) as e:
        pytest.skip(f"native engine unavailable: {e}")

    model = aliased_chain()
    model.thresh = -1e9
    rng = np.random.default_rng(31)
    im = (rng.random((96, 128, 3)) * 255).astype(np.float32)

    native = eng.detect(im, model, k_per_level=8)
    dets = Detector(model, k_per_level=8, dp_split=1).detect(im)

    nat = {(n.level, int(n.loc[0, 0]), int(n.loc[0, 1])): n
           for n in native}
    jx = {(d.level, int(d.locations[0, 0]), int(d.locations[0, 1])): d
          for d in dets}
    assert len(nat) > 8, "native engine returned too few candidates"
    common = set(nat) & set(jx)
    assert len(common) >= 0.9 * len(nat), (len(common), len(nat))
    exact = total = 0
    for key in common:
        n, d = nat[key], jx[key]
        assert abs(n.score - d.score) < 1e-3
        total += n.loc.shape[0]
        exact += int(((n.loc == d.locations).all(axis=1)).sum())
    assert exact >= 0.95 * total, (exact, total)


def test_aliased_batch_detector_matches_single():
    """The filter-keyed accumulator scan under the sharded batch path
    (vmap + SPMD over a (2,2) mesh) reproduces the single-chip aliased
    detector."""
    import jax

    from partsbaseddetector_tpu.parallel.mesh import make_mesh
    from partsbaseddetector_tpu.parallel.sharded import BatchDetector

    model = aliased_chain()
    model.thresh = -1e9
    rng = np.random.default_rng(21)
    ims = (rng.random((4, 64, 64, 3)) * 255).astype(np.float32)

    det = Detector(model, k_per_level=4, dp_split=1)
    bdet = BatchDetector(model, make_mesh((2, 2),
                                          devices=jax.devices()[:4]),
                         k_per_level=4, dp_split=1)
    cands = bdet.detect_batch(ims)
    for i in range(4):
        single = det.detect_raw(ims[i])
        np.testing.assert_allclose(np.asarray(cands.score[i]),
                                   np.asarray(single.score), atol=2e-4)
        v = np.asarray(single.valid)
        np.testing.assert_array_equal(np.asarray(cands.valid[i]), v)
        np.testing.assert_array_equal(np.asarray(cands.loc[i])[v],
                                      np.asarray(single.loc)[v])


def test_aliased_multires_is_explicit_error():
    """Multires + within-component sharing is an explicit error on
    EVERY path that serves multires models (no silent part-keyed
    fallback)."""
    import jax

    from partsbaseddetector_tpu.infer.multires import MultiResDetector
    from partsbaseddetector_tpu.parallel.mesh import make_mesh
    from partsbaseddetector_tpu.parallel.scale_sharded import (
        ScaleShardedDetector, make_scale_mesh)
    from partsbaseddetector_tpu.parallel.sharded import BatchDetector

    model = aliased_chain()
    with pytest.raises(NotImplementedError, match="shared filter"):
        MultiResDetector(model)

    mr = synthetic.tiny_multires(seed=5)
    comp = mr.components[0]
    comp.parts[2].filterid[0] = comp.parts[1].filterid[0]
    mr.validate()
    devs = jax.devices()[:4]
    with pytest.raises(NotImplementedError, match="shared filter"):
        BatchDetector(mr, make_mesh((2, 2), devices=devs))
    with pytest.raises(NotImplementedError, match="shared filter"):
        ScaleShardedDetector(mr, make_scale_mesh((2, 2), devices=devs))
