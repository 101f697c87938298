"""Multi-component models, end to end.

The reference's detect loop runs every component at every scale
(src/DynamicProgram.cpp:80-93: the OpenMP loop is flat over
nscales*ncomponents) and its VOC-lineage models are multi-component,
built by merging independently trained models
(matlab/learning/mergemodels.m:1-46).  These tests push 2-component
models through (a) the merge itself, (b) JAX-vs-oracle candidate parity,
(c) the independent native C++ engine per component, and (d) the
shared-filter-pool pattern (mirrored components indexing one response
set — the motivation for the reference's filter-id response cache,
include/Parts.hpp:165-168).
"""

import numpy as np
import pytest

from partsbaseddetector_tpu.infer.detector import Detector
from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.models.part_tree import pack_model
from partsbaseddetector_tpu.oracle import reference as oracle
from partsbaseddetector_tpu.train.build import (merge_models,
                                                mirror_component)


def two_component(seed_a: int = 1, seed_b: int = 2):
    return merge_models([synthetic.tiny(seed=seed_a),
                         synthetic.tiny(seed=seed_b)],
                        name="two_component")


def test_merge_models_structure():
    m1, m2 = synthetic.tiny(seed=1), synthetic.tiny(seed=2)
    mm = merge_models([m1, m2])
    assert mm.ncomponents == 2
    assert mm.nfilters == m1.nfilters + m2.nfilters
    assert len(mm.biasw) == len(m1.biasw) + len(m2.biasw)
    # component 1's ids are offset into the concatenated pools
    # (mergemodels.m:17-21,25-29,33-39)
    p0 = mm.components[1].parts[0]
    q0 = m2.components[0].parts[0]
    assert p0.filterid[0] == q0.filterid[0] + m1.nfilters
    assert p0.biasid[0] == q0.biasid[0] + len(m1.biasw)
    assert p0.defid[0] == q0.defid[0] + len(m1.defw)
    # component 1 reproduces m2's weights exactly
    np.testing.assert_array_equal(mm.filters[p0.filterid[0]],
                                  m2.filters[q0.filterid[0]])
    assert mm.thresh == min(m1.thresh, m2.thresh)

    bad = synthetic.tiny(seed=3)
    bad.interval = m1.interval + 1
    with pytest.raises(ValueError, match="interval"):
        merge_models([m1, bad])


def _oracle_vs_detector(model, im, k_per_level=64):
    """Shared parity harness: threshold for a handful of oracle
    candidates, then require the detector to reproduce them all."""
    ref_all = oracle.detect(im, model)
    scores = np.array([c.score for c in ref_all])
    model.thresh = float(np.quantile(scores, 0.999))
    ref = [c for c in ref_all if c.score > model.thresh]
    assert 1 <= len(ref) < 64

    det = Detector(model, k_per_level=k_per_level)
    dets = det.detect(im)

    got = {(d.component, d.level, int(d.locations[0, 0]),
            int(d.locations[0, 1])): d for d in dets}
    exact = 0
    for rc in ref:
        key = (rc.component, rc.scale_index, int(rc.locations[0, 0]),
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
    return ref, dets


def test_two_component_detector_matches_oracle():
    model = two_component()
    rng = np.random.default_rng(7)
    im = rng.random((80, 64)) * 255
    ref, dets = _oracle_vs_detector(model, im)
    # the merged threshold must admit candidates from BOTH part trees
    # on at least one image — otherwise the component loop is untested
    model.thresh = -1e9
    det = Detector(model, k_per_level=4)
    comps = {d.component for d in det.detect(im)}
    assert comps == {0, 1}


def test_mirrored_shared_pool_matches_oracle():
    """Cross-component filter sharing: both components index ONE filter
    pool (convolved once in the packed bank), the converted-model
    pattern behind the reference's response cache keyed by filter id."""
    base = synthetic.tiny(seed=4)
    model = mirror_component(base, [0, 1, 2, 3])
    # shared pool: no new filters were created for component 1
    assert model.nfilters == base.nfilters
    packed = pack_model(model)
    assert packed.nfilters == base.nfilters
    # sharing across components never aliases (ncscores is
    # per-component, src/DynamicProgram.cpp:93)
    assert not any(c.aliased for c in packed.components)
    rng = np.random.default_rng(11)
    im = rng.random((64, 80)) * 255
    _oracle_vs_detector(model, im)


@pytest.mark.parametrize("kind", ["merged", "mirrored"])
def test_two_component_native_cross_check(kind):
    """Independent engine: the native C++ pipeline (envelope DT,
    reference algorithm structure) run per component must reproduce the
    JAX multi-component candidate sets — merge semantics included
    (the reference's per-(scale, component) DP independence).  The
    "mirrored" variant shares ONE filter pool across components (the
    packed bank convolves each filter once; the native engine convolves
    its per-component dense copy) — agreement proves the cross-
    component response sharing changes nothing."""
    from partsbaseddetector_tpu import native_engine as ne
    try:
        eng = ne.NativeEngine()
    except (RuntimeError, OSError) as e:
        pytest.skip(f"native engine unavailable: {e}")

    if kind == "merged":
        model = two_component()
    else:
        model = mirror_component(synthetic.tiny(seed=4), [0, 1, 2, 3])
    model.thresh = -1e9
    rng = np.random.default_rng(15)
    im = (rng.random((96, 128, 3)) * 255).astype(np.float32)

    det = Detector(model, k_per_level=8, dp_split=1)
    dets = det.detect(im)
    assert {d.component for d in dets} == {0, 1}

    for c in range(2):
        native = eng.detect(im, model.component_model(c), k_per_level=8)
        nat = {(n.level, int(n.loc[0, 0]), int(n.loc[0, 1])): n
               for n in native}
        jx = {(d.level, int(d.locations[0, 0]), int(d.locations[0, 1])):
              d for d in dets if d.component == c}
        common = set(nat) & set(jx)
        assert len(common) >= 0.9 * len(nat), \
            f"component {c}: {len(common)}/{len(nat)} roots agree"
        exact = total = 0
        for key in common:
            n, d = nat[key], jx[key]
            assert abs(n.score - d.score) < 1e-3
            total += n.loc.shape[0]
            exact += int(((n.loc == d.locations).all(axis=1)).sum())
        assert exact >= 0.95 * total, (c, exact, total)


def test_mirror_map_must_be_tree_consistent():
    """A permutation that does not commute with the tree would read
    pairwise-bias blocks from the wrong source; it must be rejected."""
    model = synthetic.make_model(
        name="chain3", nparts=3, nmixtures=2, root_nmixtures=1,
        filter_size=3, norient=6, flen=14, binsize=4, interval=3,
        parent=[-1, 0, 1], seed=2)
    with pytest.raises(ValueError, match="tree-consistent"):
        mirror_component(model, [0, 2, 1])
    with pytest.raises(ValueError, match="permutation"):
        mirror_component(model, [0, 0, 1])


def test_merged_model_format_roundtrip(tmp_path):
    """A merged 2-component model survives every serialization format
    (the reference stores per-component indexers,
    src/FileStorageModel.cpp:130-153) and detects identically after
    reload."""
    from partsbaseddetector_tpu.models import (load_any, save_filestorage)
    from partsbaseddetector_tpu.models.npzio import load_npz, save_npz

    model = two_component()
    model.thresh = -1e9
    rng = np.random.default_rng(3)
    im = rng.random((64, 64)) * 255
    ref = Detector(model, k_per_level=4).detect(im)

    for name, save, load in (
            ("m.xml", save_filestorage, load_any),
            ("m.yml", save_filestorage, load_any),
            ("m.npz", save_npz, load_npz)):
        path = str(tmp_path / name)
        save(path, model)
        m2 = load(path)
        assert m2.ncomponents == 2
        got = Detector(m2, k_per_level=4).detect(im)
        assert [(d.component, d.level, tuple(map(tuple, d.locations)))
                for d in got] == \
            [(d.component, d.level, tuple(map(tuple, d.locations)))
             for d in ref], name


def test_train_multi_component(tmp_path):
    """Trainer emits a merged multi-component model (trainmodel per
    group + mergemodels, matlab/learning/mergemodels.m), and the merged
    model's components discriminate their own patterns: the best
    detection on each held-out pattern comes from the right component.
    """
    from partsbaseddetector_tpu.train.trainer import (
        TrainConfig, train_multi_component)

    rng = np.random.default_rng(0)

    def vertical(cx, cy, im):       # component 0: vertical pair
        im[cy - 6:cy + 6, cx - 6:cx + 6] += 180
        im[cy + 10:cy + 22, cx - 6:cx + 6] += 180
        return im

    def horizontal(cx, cy, im):     # component 1: horizontal pair
        im[cy - 6:cy + 6, cx - 6:cx + 6] += 180
        im[cy - 6:cy + 6, cx + 10:cx + 22] += 180
        return im

    def make_group(pattern, dxy):
        pos_images, pos_points = [], []
        for _ in range(8):
            cx = int(rng.integers(20, 40))
            cy = int(rng.integers(20, 40))
            im = pattern(cx, cy, rng.random((64, 64)) * 40)
            pos_images.append(np.clip(im, 0, 255))
            pos_points.append([[cx, cy], [cx + dxy[0], cy + dxy[1]]])
        return {"pos_images": pos_images,
                "pos_points": np.asarray(pos_points, float),
                "neg_images": [rng.random((64, 64)) * 40
                               for _ in range(3)],
                "parents": [-1, 0]}

    cfg = TrainConfig(nmix=1, binsize=4, interval=3, latent_iters=1,
                      nmax=400, k_per_level=8, neg_per_image=8, C=0.05)
    model = train_multi_component(
        "mc", [make_group(vertical, (0, 16)),
               make_group(horizontal, (16, 0))],
        cfg, cache_dir=str(tmp_path), verbose=False)
    assert model.ncomponents == 2
    model.thresh = -1e9

    det = Detector(model, k_per_level=4)
    for want_c, pattern in ((0, vertical), (1, horizontal)):
        im = np.clip(pattern(32, 28, rng.random((64, 64)) * 40), 0, 255)
        best = det.detect(im, max_detections=1)[0]
        assert best.component == want_c, \
            (want_c, best.component, best.score)


def test_two_component_batch_detector():
    """Multi-component through the sharded batch path on the virtual
    mesh (the dryrun's path, asserted here in the suite too)."""
    import jax
    from partsbaseddetector_tpu.parallel.mesh import make_mesh
    from partsbaseddetector_tpu.parallel.sharded import BatchDetector

    model = two_component()
    model.thresh = -1e9
    rng = np.random.default_rng(23)
    ims = (rng.random((4, 64, 64, 3)) * 255).astype(np.float32)

    det = Detector(model, k_per_level=4, dp_split=1)
    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    bdet = BatchDetector(model, mesh, k_per_level=4, dp_split=1)
    cands = bdet.detect_batch(ims)

    def entries(c):
        return {(int(cc), int(l)) + tuple(map(tuple, x)):
                round(float(s), 4)
                for s, v, x, l, cc in zip(
                    np.asarray(c.score), np.asarray(c.valid),
                    np.asarray(c.loc), np.asarray(c.level),
                    np.asarray(c.component)) if v}

    for i in range(ims.shape[0]):
        single = det.detect_raw(ims[i])
        got = entries(jax.tree.map(lambda x: x[i], cands))
        want = entries(single)
        assert got == want
        assert {k[0] for k in want} == {0, 1}
