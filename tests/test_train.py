"""Training subsystem tests: QP solver, feature write-back invariant,
clustering, and a miniature end-to-end training run."""

import numpy as np
import pytest

from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.train.qp import QPCache
from partsbaseddetector_tpu.train.vectorize import (BlockLayout,
                                                    model_to_vec,
                                                    vec_to_model)


# ------------------------------------------------------------------ QP

def test_qp_separable_2d():
    """Dual CD must find a separating w on a linearly separable set."""
    rng = np.random.default_rng(0)
    n = 40
    X = np.vstack([rng.normal([2, 2], 0.3, (n, 2)),
                   rng.normal([-2, -2], 0.3, (n, 2))])
    y = np.hstack([np.ones(n), -np.ones(n)])
    length = 3
    qp = QPCache(length, 2 * n, np.ones(length), np.zeros(length),
                 np.zeros(0, np.int64), c_pos=1.0, c_neg=1.0)
    for i in range(2 * n):
        qp.write(np.concatenate([[1.0], X[i]]), (int(y[i]), i, 0, 0, 0),
                 int(y[i]))
    qp.optimize(tol=0.01)
    w = qp.final_w()
    margins = y * (np.hstack([np.ones((2 * n, 1)), X]) @ w)
    assert (margins > 0).mean() == 1.0
    assert 1.0 - qp.lb / qp.ub < 0.02


def test_qp_group_constraint():
    """Constraints sharing an id share slack: dual mass within a group
    is capped at C=1."""
    qp = QPCache(2, 8, np.ones(2), np.zeros(2), np.zeros(0, np.int64),
                 c_pos=1.0, c_neg=1.0)
    rng = np.random.default_rng(1)
    for j in range(4):   # 4 constraints, same id -> one group
        qp.write(rng.normal(0, 1, 2), (1, 7, 0, 0, 0), 1)
    qp.optimize()
    groups = qp._group_keys()
    assert groups.max() == 0
    assert qp.a[:qp.n].sum() <= 1.0 + 1e-6


def test_qp_noneg_projection():
    qp = QPCache(2, 4, np.ones(2), np.zeros(2),
                 np.asarray([1], np.int64), c_pos=1.0, c_neg=1.0)
    qp.write(np.array([1.0, -5.0]), (1, 0, 0, 0, 0), 1)
    qp.optimize()
    assert qp.w[1] >= 0.0


# ------------------------------------------------------- vectorization

def test_model_vec_roundtrip(tiny_model):
    layout = BlockLayout.for_model(tiny_model)
    w, wreg, w0, noneg = model_to_vec(tiny_model, layout)
    m2 = vec_to_model(w, tiny_model, layout)
    w2, _, _, _ = model_to_vec(m2, layout)
    np.testing.assert_allclose(w, w2)
    # def quadratic coords flagged noneg with floor 0.01
    assert (w0[noneg] == 0.01).all()


# ---------------------------------------------------- feature invariant

def test_detection_feature_score_invariant():
    """w . detection_feature == detection score — the reference's live
    assertion (matlab/detection/detect.m:137-142) as a test of the
    entire scoring path."""
    from partsbaseddetector_tpu.infer.detector import Detector
    from partsbaseddetector_tpu.train.features import detection_feature

    model = synthetic.tiny(seed=3)
    model.thresh = -1e9
    layout = BlockLayout.for_model(model)
    w, _, _, _ = model_to_vec(model, layout)
    det = Detector(model, k_per_level=8, compose="correct")
    im = np.random.default_rng(5).random((72, 88)) * 255
    dets = det.detect(im, max_detections=10)
    feats = det.pyramid_features(im)
    assert len(dets) > 0
    for d in dets:
        vec = detection_feature(model, layout, d, feats)
        rec = float(w @ vec)
        assert abs(rec - d.score) < 5e-3, (rec, d.score)


# ------------------------------------------------------------ clustering

def test_point_to_box_and_clustering():
    from partsbaseddetector_tpu.train.cluster import (cluster_parts,
                                                      data_def,
                                                      point_to_box)
    rng = np.random.default_rng(0)
    N, P = 40, 3
    parents = [-1, 0, 1]
    pts = np.zeros((N, P, 2))
    pts[:, 0] = rng.uniform(30, 50, (N, 2))
    # part 1: either left or right of the root -> 2 natural clusters
    side = rng.integers(0, 2, N) * 2 - 1
    pts[:, 1] = pts[:, 0] + np.stack(
        [side * 10.0, np.zeros(N)], axis=1)
    pts[:, 2] = pts[:, 1] + [0.0, 10.0]
    boxes = point_to_box(pts, parents)
    assert boxes.shape == (N, P, 4)
    deffeat = data_def(pts, boxes, (5, 5))
    idx = cluster_parts(deffeat, 2, parents, restarts=10)
    # part 1 clusters should recover the left/right split
    a = idx[1][side == 1]
    b = idx[1][side == -1]
    assert len(np.unique(a)) == 1 and len(np.unique(b)) == 1
    assert a[0] != b[0]


# -------------------------------------------------------- end-to-end

@pytest.mark.slow
def test_tiny_training_run(tmp_path):
    """Miniature end-to-end training: 2-part vertical pattern planted in
    noise; the trained model must localize it on held-out images."""
    from partsbaseddetector_tpu.train.trainer import (TrainConfig,
                                                      train_parts_model)
    from partsbaseddetector_tpu.infer.detector import Detector

    rng = np.random.default_rng(0)
    P = 2
    parents = [-1, 0]
    N = 10

    def make_image(cx, cy):
        im = rng.random((64, 64)) * 40
        im[cy - 6:cy + 6, cx - 6:cx + 6] += 180       # part 0 blob
        im[cy + 10:cy + 22, cx - 6:cx + 6] += 180     # part 1 below
        return np.clip(im, 0, 255)

    pos_images, pos_points = [], []
    for _ in range(N):
        cx = int(rng.integers(20, 44))
        cy = int(rng.integers(16, 30))
        pos_images.append(make_image(cx, cy))
        pos_points.append([[cx, cy], [cx, cy + 16]])
    pos_points = np.asarray(pos_points, float)
    neg_images = [rng.random((64, 64)) * 40 for _ in range(4)]

    cfg = TrainConfig(nmix=1, binsize=4, interval=3, latent_iters=2,
                      nmax=600, k_per_level=8, neg_per_image=10,
                      C=0.05)
    model = train_parts_model("tinytrain", pos_images, pos_points,
                              neg_images, parents, cfg,
                              cache_dir=str(tmp_path), verbose=False)
    assert model.components[0].nparts == P

    # held-out localization: best detection root center near the blob
    cx, cy = 32, 22
    test_im = make_image(cx, cy)
    model.thresh = -1e9
    det = Detector(model, k_per_level=4)
    dets = det.detect(test_im, max_detections=1)
    assert dets
    b = dets[0].parts[0]
    det_cx = (b[0] + b[2]) / 2
    det_cy = (b[1] + b[3]) / 2
    assert abs(det_cx - cx) < 12 and abs(det_cy - cy) < 12, \
        (det_cx, det_cy)
    # negatives score below the learned threshold more often than
    # positives
    neg_scores = [d.score for d in det.detect(neg_images[0],
                                              max_detections=1)]
    assert dets[0].score > neg_scores[0]


def test_flip_positives_mirror_map():
    """Flip augmentation doubles positives; mirrored keypoints land at
    (W-1-x) under the part permutation (train.m:130,165)."""
    from partsbaseddetector_tpu.train.trainer import flip_positives

    rng = np.random.default_rng(0)
    ims = [rng.random((10, 20)), rng.random((8, 16))]
    pts = np.array([[[2.0, 3.0], [5.0, 7.0]],
                    [[1.0, 1.0], [9.0, 4.0]]])
    out_ims, out_pts = flip_positives(ims, pts, mirror_map=[1, 0])
    assert len(out_ims) == 4 and out_pts.shape == (4, 2, 2)
    np.testing.assert_array_equal(out_ims[2], ims[0][:, ::-1])
    # part 0 of the flipped example is the MIRROR of part 1
    np.testing.assert_allclose(out_pts[2, 0], [20 - 1 - 5.0, 7.0])
    np.testing.assert_allclose(out_pts[2, 1], [20 - 1 - 2.0, 3.0])
    # identity mirror keeps part order
    _, idp = flip_positives(ims, pts, mirror_map=[0, 1])
    np.testing.assert_allclose(idp[2, 0], [20 - 1 - 2.0, 3.0])

    import pytest
    with pytest.raises(AssertionError):
        flip_positives(ims, pts, mirror_map=[0, 0])


def test_qp_prune_and_continue_mining():
    """With a cache far smaller than the mined negative stream, mining
    must prune and keep going (detect.m:319-321) instead of stopping at
    the first cache-full, and the model must still train to a working
    threshold."""
    from partsbaseddetector_tpu.tools.datasets import synthetic_figures
    from partsbaseddetector_tpu.train.trainer import (TrainConfig,
                                                      train_parts_model)

    pos, neg = synthetic_figures(n=8, imsize=(64, 64), nparts=2,
                                 seed=3)
    logs = []
    cfg = TrainConfig(nmix=1, binsize=4, interval=3, latent_iters=1,
                      nmax=24,       # tiny: forces prune-and-continue
                      k_per_level=8, neg_per_image=4, C=0.05,
                      overlap=0.35)
    model = train_parts_model(
        "prunetest", [s.image for s in pos],
        np.stack([s.points for s in pos]), neg[:3], [-1, 0], cfg,
        cache_dir=None, verbose=True)
    # the model is usable: it still detects the planted figures
    from partsbaseddetector_tpu.infer.detector import Detector
    model.thresh = -1e9
    det = Detector(model, k_per_level=4)
    dets = det.candidates_to_detections(det.detect_raw(pos[0].image), 1)
    assert dets
