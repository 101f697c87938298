"""Dataset loading: the PARSE-style directory loader, exercised on a
fixture the test writes itself (true PARSE data is absent from this
environment; the loader-level fixture is the achievable proxy for
matlab/learning/getPositiveData.m's data flow, driven from
training_demo.m:1-42)."""

import os

import numpy as np
import pytest

from partsbaseddetector_tpu.tools import datasets


def write_parse_dir(path, n=2, P=2, size=(64, 64), seed=0):
    """PARSE-style directory: numbered images + labels.mat holding a
    (P, 2, N) keypoint array (the layout getPositiveData.m reads)."""
    import scipy.io
    from PIL import Image

    rng = np.random.default_rng(seed)
    pts = np.zeros((P, 2, n))
    for i in range(n):
        im = (rng.random(size + (3,)) * 40)
        cx = int(rng.integers(20, size[1] - 20))
        cy = int(rng.integers(16, size[0] - 28))
        im[cy - 6:cy + 6, cx - 6:cx + 6] += 180
        im[cy + 10:cy + 22, cx - 6:cx + 6] += 180
        pts[0, :, i] = (cx, cy)
        pts[1, :, i] = (cx, cy + 16)
        Image.fromarray(np.clip(im, 0, 255).astype(np.uint8)).save(
            os.path.join(path, f"im{i:04d}.png"))
    scipy.io.savemat(os.path.join(path, "labels.mat"), {"ptsAll": pts})
    return pts


def test_parse_dir_loader(tmp_path):
    pts = write_parse_dir(str(tmp_path))
    samples = datasets.load_dataset(str(tmp_path))
    assert len(samples) == 2
    for i, s in enumerate(samples):
        assert s.image.shape == (64, 64, 3)
        np.testing.assert_allclose(s.points, pts[:, :, i])
        span = pts[:, :, i].max(0) - pts[:, :, i].min(0)
        assert s.scale == pytest.approx(
            float(np.sqrt(span[0] * span[1])))

    with pytest.raises(FileNotFoundError, match="labels.mat"):
        empty = tmp_path / "empty"
        empty.mkdir()
        datasets.load_dataset(str(empty))


def test_train_cli_on_parse_dir(tmp_path):
    """The training CLI consumes a PARSE-style directory end to end
    (tools/train.py --data flow vs matlab/training_demo.m:1-42) and
    writes a loadable model."""
    from partsbaseddetector_tpu.models import npzio
    from partsbaseddetector_tpu.tools import train as train_cli

    data_dir = tmp_path / "parse"
    data_dir.mkdir()
    write_parse_dir(str(data_dir), n=4)
    out = tmp_path / "model.npz"
    rc = train_cli.main([
        str(data_dir), str(out), "--parents", "0,1", "--nmix", "1",
        "--binsize", "4", "--interval", "3", "--iters", "1",
        "--C", "0.05", "--cache", str(tmp_path / "cache"),
        "--platform", "cpu"])
    assert rc == 0
    model = npzio.load_npz(str(out))
    assert model.components[0].nparts == 2
    model.validate()
