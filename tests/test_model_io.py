"""Model layer tests: schema validation, FileStorage XML/YAML round-trips
(cross-validated against cv2's own FileStorage when available), .mat
round-trip, .npz round-trip."""

import numpy as np
import pytest

from partsbaseddetector_tpu.models import (filestorage, matio, npzio,
                                           synthetic)
from partsbaseddetector_tpu.models.schema import (flatten_filter,
                                                  unflatten_filter)

try:
    import cv2
    HAVE_CV2 = True
except ImportError:  # pragma: no cover
    HAVE_CV2 = False


def assert_models_equal(a, b, atol=0.0):
    assert a.name == b.name
    assert a.interval == b.interval
    assert a.binsize == b.binsize
    assert a.norient == b.norient
    assert a.flen == b.flen
    assert np.isclose(a.thresh, b.thresh)
    assert len(a.filters) == len(b.filters)
    for fa, fb in zip(a.filters, b.filters):
        np.testing.assert_allclose(fa, fb, atol=atol)
    for da, db in zip(a.defw, b.defw):
        np.testing.assert_allclose(da, db, atol=atol)
    for aa, ab in zip(a.anchors, b.anchors):
        np.testing.assert_array_equal(aa, ab)
    np.testing.assert_allclose(a.biasw, b.biasw, atol=atol)
    assert a.ncomponents == b.ncomponents
    for ca, cb in zip(a.components, b.components):
        assert ca.nparts == cb.nparts
        for pa, pb in zip(ca.parts, cb.parts):
            assert pa.parentid == pb.parentid
            assert pa.filterid == pb.filterid
            assert pa.biasid == pb.biasid
            assert pa.defid == pb.defid


def test_synthetic_valid(tiny_model, person_model):
    tiny_model.validate()
    person_model.validate()
    assert person_model.components[0].nparts == 26
    assert person_model.flen == 32 and person_model.norient == 18


def test_filter_flatten_roundtrip(rng):
    f = rng.standard_normal((5, 7, 32))
    np.testing.assert_array_equal(unflatten_filter(flatten_filter(f), 32), f)


@pytest.mark.parametrize("ext", ["xml", "yml"])
def test_filestorage_roundtrip(tmp_path, tiny_model, ext):
    path = str(tmp_path / f"model.{ext}")
    filestorage.save_model(path, tiny_model)
    loaded = filestorage.load_model(path)
    assert_models_equal(tiny_model, loaded)


@pytest.mark.parametrize("ext", ["xml", "yml"])
@pytest.mark.skipif(not HAVE_CV2, reason="cv2 unavailable")
def test_filestorage_readable_by_opencv(tmp_path, tiny_model, ext):
    """Our writer's output must parse with OpenCV's own FileStorage and
    contain the reference schema fields
    (reference: src/FileStorageModel.cpp:104-153)."""
    path = str(tmp_path / f"model.{ext}")
    filestorage.save_model(path, tiny_model)
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    assert fs.isOpened()
    assert int(fs.getNode("sbin").real()) == tiny_model.binsize
    assert int(fs.getNode("interval").real()) == tiny_model.interval
    assert abs(fs.getNode("thresh").real() - tiny_model.thresh) < 1e-12
    n_filters = fs.getNode("filtersw")
    assert n_filters.size() == len(tiny_model.filters)
    f0 = n_filters.at(0).mat()
    np.testing.assert_allclose(
        f0, flatten_filter(tiny_model.filters[0]), atol=0)
    part0 = fs.getNode("indexers").getNode("component-0").getNode("part-0")
    assert int(part0.getNode("parentid").real()) == -1
    fs.release()


@pytest.mark.parametrize("ext", ["xml", "yml"])
@pytest.mark.skipif(not HAVE_CV2, reason="cv2 unavailable")
def test_filestorage_reads_opencv_output(tmp_path, tiny_model, ext):
    """A model written by OpenCV's FileStorage (as the reference's
    serializer would) must load identically through our parser."""
    ours = str(tmp_path / f"ours.{ext}")
    theirs = str(tmp_path / f"cv.{ext}")
    filestorage.save_model(ours, tiny_model)
    # round-trip the file through cv2 to re-emit it in OpenCV's own style
    fs_in = cv2.FileStorage(ours, cv2.FILE_STORAGE_READ)
    fs_out = cv2.FileStorage(theirs, cv2.FILE_STORAGE_WRITE)

    def copy_node(name, node, fs_out):
        if node.isMap() and {"rows", "cols", "dt", "data"} <= set(
                node.keys()):
            fs_out.write(name, node.mat())
        elif node.isMap():
            fs_out.startWriteStruct(name, cv2.FILE_NODE_MAP)
            for key in node.keys():
                copy_node(key, node.getNode(key), fs_out)
            fs_out.endWriteStruct()
        elif node.isSeq():
            fs_out.startWriteStruct(name, cv2.FILE_NODE_SEQ)
            for i in range(node.size()):
                copy_node("", node.at(i), fs_out)
            fs_out.endWriteStruct()
        elif node.isString():
            fs_out.write(name, node.string())
        elif node.isInt():
            fs_out.write(name, int(node.real()))
        elif node.isReal():
            fs_out.write(name, float(node.real()))
        else:  # matrix
            fs_out.write(name, node.mat())

    root = fs_in.root()
    for key in root.keys():
        copy_node(key, root.getNode(key), fs_out)
    fs_out.release()
    fs_in.release()

    loaded = filestorage.load_model(theirs)
    assert_models_equal(tiny_model, loaded)


def test_mat_roundtrip(tmp_path, tiny_model):
    path = str(tmp_path / "model.mat")
    matio.save_mat(path, tiny_model)
    loaded = matio.load_mat(path)
    # .mat hardcodes norient=18 (reference: src/MatlabIOModel.cpp:101),
    # so compare everything else
    loaded.norient = tiny_model.norient
    loaded.validate()
    assert_models_equal(tiny_model, loaded)


def test_npz_roundtrip(tmp_path, person_model):
    path = str(tmp_path / "model.npz")
    npzio.save_npz(path, person_model)
    loaded = npzio.load_npz(path)
    assert_models_equal(person_model, loaded, atol=1e-6)


def test_load_any_dispatch(tmp_path, tiny_model):
    from partsbaseddetector_tpu.models import load_any
    for ext in ("xml", "yml"):
        p = str(tmp_path / f"m.{ext}")
        filestorage.save_model(p, tiny_model)
        assert_models_equal(tiny_model, load_any(p))
    p = str(tmp_path / "m.npz")
    npzio.save_npz(p, tiny_model)
    assert_models_equal(tiny_model, load_any(p), atol=1e-6)


def _save_face_fixture(path, ncomp=2, nparts=3):
    """Minimal Zhu-Ramanan-style face .mat model."""
    import scipy.io
    rng = np.random.default_rng(0)
    nf = ncomp * nparts
    filt_dt = np.dtype([("w", object)])
    filters = np.empty((1, nf), dtype=filt_dt)
    for i in range(nf):
        filters[0, i]["w"] = rng.standard_normal((4, 4, 32))
    ndefs = ncomp * nparts  # first def per comp = scalar bias
    defs_dt = np.dtype([("w", object), ("anchor", object)])
    defs = np.empty((1, ndefs), dtype=defs_dt)
    d = 0
    for c in range(ncomp):
        defs[0, d]["w"] = np.array([[0.3 + c]])     # global bias
        defs[0, d]["anchor"] = np.zeros((1, 3))
        d += 1
        for p in range(1, nparts):
            defs[0, d]["w"] = np.array([[0.02, 0.01, 0.03, -0.01]])
            defs[0, d]["anchor"] = np.array([[2.0, 3.0, 0.0]])
            d += 1
    part_dt = np.dtype([("filterid", object), ("defid", object),
                        ("parent", object)])
    comps = np.empty((1, ncomp), dtype=object)
    d = 1
    f = 1
    for c in range(ncomp):
        parts = np.empty((1, nparts), dtype=part_dt)
        base_def = c * nparts + 1
        base_f = c * nparts + 1
        for p in range(nparts):
            parts[0, p]["filterid"] = np.array([[float(base_f + p)]])
            parts[0, p]["defid"] = np.array([[float(base_def + p)]])
            parts[0, p]["parent"] = np.array(
                [[0.0 if p == 0 else 1.0]])
        comps[0, c] = parts
    model_dt = np.dtype([(k, object) for k in
                         ("sbin", "interval", "thresh", "filters",
                          "defs", "components")])
    rec = np.empty((1, 1), dtype=model_dt)
    rec[0, 0]["sbin"] = np.array([[5.0]])
    rec[0, 0]["interval"] = np.array([[10.0]])
    rec[0, 0]["thresh"] = np.array([[-0.5]])
    rec[0, 0]["filters"] = filters
    rec[0, 0]["defs"] = defs
    rec[0, 0]["components"] = comps
    scipy.io.savemat(path, {"model": rec})


def test_face_format_conversion(tmp_path):
    from partsbaseddetector_tpu.models.transfer_formats import \
        load_foreign
    path = str(tmp_path / "face.mat")
    _save_face_fixture(path)
    model = load_foreign(path, "face", "facetest")
    assert model.ncomponents == 2
    assert model.components[0].nparts == 3
    assert model.binsize == 5
    # per-component bias + shared zero pairwise bias
    np.testing.assert_allclose(model.biasw[:2], [0.3, 1.3])
    assert model.biasw[2] == 0.0
    # anchors re-based to 0
    p1 = model.components[0].parts[1]
    np.testing.assert_array_equal(model.anchors[p1.defid[0]], [1, 2])
    model.validate()
