"""Frontend adapter shims: ROS node + ECTO cell over fake transports.

The real transports are absent from this image (the adapters are
import-guarded); these tests exercise the full adapter lifecycle —
topic advertising, subscriber-gated materialization, tendril
declare/configure/process — against duck-typed fakes, matching the
reference frontends' behavior (ros/Node.cpp:205-249,
cells/detect.cpp:115-340)."""

import numpy as np
import pytest

from partsbaseddetector_tpu.models import synthetic
from partsbaseddetector_tpu.post.depth import CameraModel


@pytest.fixture(scope="module")
def model():
    m = synthetic.tiny(seed=2)
    m.thresh = -1e9
    return m


class FakePublisher:
    def __init__(self, topic):
        self.topic = topic
        self.subscribers = 0
        self.published = []

    def publish(self, msg):
        self.published.append(msg)

    def get_num_connections(self):
        return self.subscribers


class FakeTransport:
    def __init__(self):
        self.pubs = {}

    def advertise(self, topic, kind):
        pub = FakePublisher(topic)
        self.pubs[topic] = pub
        return pub


def test_ros_node_subscriber_gating(model):
    from partsbaseddetector_tpu.frontends import PartsBasedDetectorNode

    transport = FakeTransport()
    cam = CameraModel(fx=100.0, fy=100.0, cx=32.0, cy=32.0)
    node = PartsBasedDetectorNode(model, transport, camera=cam)

    # the reference's topic set is advertised (Node.cpp:121-129)
    suffixes = {t.rsplit("/", 1)[1] for t in transport.pubs}
    assert suffixes == {"candidates_rect_color", "mask", "bounding_box",
                        "cleaned_cloud", "part_centers", "object_poses"}

    rng = np.random.default_rng(0)
    rgb = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    depth = np.full((64, 64), 1.5, np.float32)
    cloud = rng.random((400, 3)).astype(np.float32) * 2

    # no subscribers -> nothing published, nothing materialized
    res = node.depth_image_callback(rgb, depth, cloud)
    assert all(not p.published for p in transport.pubs.values())
    assert res.overlay is None and res.boxes3d is None

    # subscribe to overlay + bounding boxes -> exactly those publish
    over = next(p for p in transport.pubs.values()
                if p.topic.endswith("candidates_rect_color"))
    bb = next(p for p in transport.pubs.values()
              if p.topic.endswith("bounding_box"))
    over.subscribers = 1
    bb.subscribers = 2
    res = node.depth_image_callback(rgb, depth, cloud)
    assert len(over.published) == 1
    assert (over.published[0].height, over.published[0].width,
            3) == rgb.shape
    assert len(bb.published) == 1
    mask = next(p for p in transport.pubs.values()
                if p.topic.endswith("/mask"))
    assert not mask.published

    # unsubscribe -> gated off again (Node.cpp getNumSubscribers).
    # bounding_box publishes TWICE on the second frame: the previous
    # markers flipped to DELETE, then the new array (the reference's
    # clearMarkerArray protocol, Messages.cpp:68-80)
    over.subscribers = 0
    node.depth_image_callback(rgb, depth, cloud)
    assert len(over.published) == 1
    assert len(bb.published) == 3
    from partsbaseddetector_tpu.frontends import messages as msgs
    assert all(m.action == msgs.Marker.DELETE
               for m in bb.published[1].markers)
    assert all(m.action == msgs.Marker.ADD
               for m in bb.published[2].markers)
    assert ([m.id for m in bb.published[1].markers]
            == [m.id for m in bb.published[0].markers])


def test_ecto_cell_lifecycle(model):
    from partsbaseddetector_tpu.frontends import PartsBasedDetectorCell
    from partsbaseddetector_tpu.frontends.ecto_cell import PoseResult

    params, inputs, outputs = {}, {}, {}
    PartsBasedDetectorCell.declare_params(params)
    PartsBasedDetectorCell.declare_io(params, inputs, outputs)
    assert set(inputs) == {"image", "depth", "K", "input_cloud"}
    assert set(outputs) == {"pose_results", "image"}

    params["model_file"] = model      # in-memory model accepted
    params["visualize"] = True
    cell = PartsBasedDetectorCell()
    cell.configure(params, inputs, outputs)

    rng = np.random.default_rng(1)
    inputs["image"] = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    # 16-bit depth in mm (the Kinect convention detect.cpp consumes)
    inputs["depth"] = np.full((64, 64), 1500, np.uint16)
    inputs["K"] = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    inputs["input_cloud"] = rng.random((300, 3)).astype(np.float32) * 2

    assert cell.process(inputs, outputs) == 0
    assert outputs["image"] is not None
    assert isinstance(outputs["pose_results"], list)
    assert outputs["pose_results"], "no detections on thresh=-1e9 model"
    pr = outputs["pose_results"][0]
    assert isinstance(pr, PoseResult)
    assert pr.object_id == model.name
    assert np.isfinite(pr.score)


def test_ecto_cell_multicomponent():
    """The ORK cell serves multi-component (mergemodels-lineage) models
    end to end — the reference's VOC-style deployments."""
    from partsbaseddetector_tpu.frontends import PartsBasedDetectorCell
    from partsbaseddetector_tpu.models import synthetic
    from partsbaseddetector_tpu.train.build import merge_models

    model = merge_models([synthetic.tiny(seed=1),
                          synthetic.tiny(seed=2)], name="mc")
    model.thresh = -1e9
    params, inputs, outputs = {}, {}, {}
    PartsBasedDetectorCell.declare_params(params)
    PartsBasedDetectorCell.declare_io(params, inputs, outputs)
    params["model_file"] = model
    cell = PartsBasedDetectorCell()
    cell.configure(params, inputs, outputs)

    rng = np.random.default_rng(5)
    inputs["image"] = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    inputs["depth"] = np.full((64, 64), 1500, np.uint16)
    inputs["K"] = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    inputs["input_cloud"] = rng.random((200, 3)).astype(np.float32) * 2
    assert cell.process(inputs, outputs) == 0
    assert outputs["pose_results"]


def test_missing_model_file_raises():
    from partsbaseddetector_tpu.frontends import PartsBasedDetectorCell

    params, inputs, outputs = {}, {}, {}
    PartsBasedDetectorCell.declare_params(params)
    cell = PartsBasedDetectorCell()
    with pytest.raises(ValueError):
        cell.configure(params, inputs, outputs)


# ---------------------------------------------------------------- ORK config

REF_CONF = "/root/reference/conf"

BY_PARTS_MINIMAL = """
source1:
  type: RosKinect
  module: 'object_recognition_ros.io'

sink1:
  type: Publisher
  module: 'object_recognition_by_parts'

pipeline1:
  type: PartsBasedDetector
  module: 'object_recognition_by_parts'
  inputs: [source1]
  outputs: [sink1]
  parameters:
    visualize: true
    extra:
        model_file: "/nonexistent/model.xml"
        use_cuda: false
"""


def test_ork_config_parse_and_instantiate(model):
    """The reference's only automated test is the ORK config lint of its
    two .by_parts files (test/CMakeLists.txt:5-9); this is that check,
    plus actual instantiation of the detector cell from the config."""
    from partsbaseddetector_tpu.frontends.ork_config import (
        instantiate, parse_by_parts)

    cfg = parse_by_parts(BY_PARTS_MINIMAL)
    assert set(cfg.cells) == {"source1", "sink1", "pipeline1"}
    pipe = cfg.detector_pipeline()
    assert pipe.inputs == ["source1"] and pipe.outputs == ["sink1"]
    params = cfg.detector_params()
    assert params["visualize"] is True
    assert params["model_file"].endswith("model.xml")
    assert "use_cuda" not in params     # dead flag dropped on use

    # in-memory model overrides the (author-machine-absolute) model_file
    cell = instantiate(cfg, model=model)
    inputs = {"image": (np.random.default_rng(0).random((48, 48, 3))
                        * 255).astype(np.uint8),
              "depth": None, "K": None, "input_cloud": None}
    outputs = {"pose_results": [], "image": None}
    assert cell.process(inputs, outputs) == 0
    assert outputs["pose_results"]


def test_ork_config_validation_errors():
    from partsbaseddetector_tpu.frontends.ork_config import parse_by_parts

    with pytest.raises(ValueError, match="missing 'module'"):
        parse_by_parts("cell1:\n  type: X\n")
    with pytest.raises(ValueError, match="undeclared cell"):
        parse_by_parts("pipeline1:\n  type: X\n  module: m\n"
                       "  inputs: [ghost]\n")
    with pytest.raises(ValueError, match="empty"):
        parse_by_parts("")


@pytest.mark.skipif(not __import__("os").path.isdir(REF_CONF),
                    reason="reference configs not mounted")
def test_ork_config_reference_files_lint():
    """Lint the reference's shipped configs verbatim — the exact files
    its CI config test covers (conf/config_person.by_parts,
    conf/config_face.by_parts)."""
    import os

    from partsbaseddetector_tpu.frontends.ork_config import parse_by_parts

    for fname in ("config_person.by_parts", "config_face.by_parts"):
        cfg = parse_by_parts(os.path.join(REF_CONF, fname))
        params = cfg.detector_params()
        assert params["model_file"].endswith(
            ("Person_26parts.xml", "Face_68parts.xml"))
        assert params["visualize"] is True
        assert cfg.detector_pipeline().inputs == ["source1"]


# ------------------------------------------------------------- messages
# the ros/Messages.cpp analog: assert actual FIELD CONTENTS per topic


def test_message_contents_all_topics(model):
    """Every one of the six advertised topics receives a typed message
    with the reference's field semantics (ros/Messages.cpp:55-235)."""
    from partsbaseddetector_tpu.frontends import (PartsBasedDetectorNode,
                                                  messages as msgs)

    transport = FakeTransport()
    cam = CameraModel(fx=100.0, fy=100.0, cx=32.0, cy=32.0)
    node = PartsBasedDetectorNode(model, transport, camera=cam,
                                  name="unit")
    for p in transport.pubs.values():
        p.subscribers = 1

    rng = np.random.default_rng(0)
    rgb = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    depth = np.full((64, 64), 1.5, np.float32)
    cloud = rng.random((400, 3)).astype(np.float32) * 2
    header = msgs.Header(stamp=12.5, frame_id="camera_rgb_frame", seq=7)
    res = node.depth_image_callback(rgb, depth, cloud, header=header)

    def pub(suffix):
        return next(p for p in transport.pubs.values()
                    if p.topic.endswith(suffix))

    # overlay image: rgb8, stamped from the input message
    # (Messages.cpp:136-149)
    img = pub("candidates_rect_color").published[0]
    assert isinstance(img, msgs.ImageMsg)
    assert img.encoding == "rgb8"
    assert (img.height, img.width) == rgb.shape[:2]
    assert img.step == rgb.shape[1] * 3
    assert len(img.data) == rgb.size
    assert img.header.frame_id == "camera_rgb_frame"
    assert img.header.stamp == 12.5
    np.testing.assert_array_equal(img.to_array(), res.overlay)

    # mask image: rgb & (mask != 0) (Messages.cpp:157-174)
    m = pub("/mask").published[0]
    arr = m.to_array()
    assert arr.shape == rgb.shape
    np.testing.assert_array_equal(
        arr, np.where(res.mask[..., None] != 0, rgb, 0))
    assert (arr[res.mask == 0] == 0).all()

    # 3-D bounding boxes: CUBE markers, pose = box center, scale =
    # extents, alpha 0.5, lifetime 5 s, id = index (Messages.cpp:85-127)
    ma = pub("bounding_box").published[0]
    assert isinstance(ma, msgs.MarkerArray)
    assert len(ma.markers) == len(res.boxes3d)
    color = msgs.hash_string_to_color("unit")
    for i, (mk, bb) in enumerate(zip(ma.markers, res.boxes3d)):
        assert mk.type == msgs.Marker.CUBE
        assert mk.action == msgs.Marker.ADD
        assert mk.id == i
        assert mk.lifetime == 5.0
        np.testing.assert_allclose(mk.pose.position,
                                   (bb.tl() + bb.br()) / 2.0)
        assert mk.pose.orientation == (0.0, 0.0, 0.0, 1.0)
        np.testing.assert_allclose(mk.scale, bb.br() - bb.tl())
        assert mk.color == (color[0], color[1], color[2], 0.5)
        assert mk.header.stamp == 12.5

    # clusters: ONE concatenated cloud (Messages.cpp:176-185)
    pc = pub("cleaned_cloud").published[0]
    assert isinstance(pc, msgs.PointCloudMsg)
    assert pc.points.shape[1] == 3
    assert len(pc.points) == sum(len(c) for c in res.clusters)

    # part centers: SPHERE markers for finite centers only
    pm = pub("part_centers").published[0]
    assert isinstance(pm, msgs.MarkerArray)
    nfinite = sum(int(np.isfinite(pc).all(axis=1).sum())
                  for pc in res.part_centers)
    assert len(pm.markers) == nfinite
    assert all(mk.type == msgs.Marker.SPHERE for mk in pm.markers)

    # poses: PoseArray with unit quaternions in ROS (x, y, z, w) order
    # (Messages.cpp:187-235)
    pa = pub("object_poses").published[0]
    assert isinstance(pa, msgs.PoseArray)
    assert pa.header.frame_id == "camera_rgb_frame"
    valid_poses = [p for p in res.poses if p is not None]
    assert len(pa.poses) == len(valid_poses)
    for msg_pose, p in zip(pa.poses, valid_poses):
        np.testing.assert_allclose(msg_pose.position, p.position)
        np.testing.assert_allclose(
            np.linalg.norm(msg_pose.orientation), 1.0, atol=1e-9)
        # (w, x, y, z) -> (x, y, z, w) field-order mapping
        np.testing.assert_allclose(
            msg_pose.orientation,
            (p.orientation[1], p.orientation[2], p.orientation[3],
             p.orientation[0]))


def test_message_image_roundtrip_and_depth_units():
    from partsbaseddetector_tpu.frontends import messages as msgs
    from partsbaseddetector_tpu.frontends.ros_node import _unpack_frame

    rng = np.random.default_rng(2)
    rgb = (rng.random((8, 10, 3)) * 255).astype(np.uint8)
    msg = msgs.ImageMsg.from_array(rgb, "rgb8",
                                   msgs.Header(stamp=1.0, frame_id="f"))
    np.testing.assert_array_equal(msg.to_array(), rgb)

    # uint16 depth arrives in millimeters -> meters (demo.cpp:95-99)
    depth_mm = np.full((8, 10), 1500, np.uint16)
    r, d, c, h = _unpack_frame(msg, depth_mm, None, None)
    assert h.frame_id == "f" and h.stamp == 1.0
    np.testing.assert_allclose(d, 1.5)
    assert d.dtype == np.float32


def test_hash_string_to_color():
    from partsbaseddetector_tpu.frontends.messages import \
        hash_string_to_color

    c1 = hash_string_to_color("person")
    c2 = hash_string_to_color("person")
    c3 = hash_string_to_color("face")
    assert c1 == c2            # deterministic
    assert c1 != c3            # distinct names -> distinct colors
    # 0..255-scaled like the reference (Messages.cpp:64-65), v = 0.7
    assert all(0 <= ch <= 255 for ch in c1)
    assert max(c1) == pytest.approx(0.7 * 255)


def test_approximate_time_synchronizer():
    """3-stream ApproximateTime matching (ros/Node.hpp:104-108): each
    emitted set pairs the messages closest in stamp; different rates
    and jitter are tolerated; sets are emitted in order."""
    from partsbaseddetector_tpu.frontends.messages import \
        ApproximateTimeSynchronizer

    got = []
    sync = ApproximateTimeSynchronizer(3, lambda *m: got.append(m),
                                       queue_size=50)
    # depth at t, rgb slightly later, cloud at 2x the period (so every
    # second depth/rgb pair has no cloud partner and is dropped)
    for t in range(6):
        sync.add(0, t * 0.10, ("d", t))
        sync.add(1, t * 0.10 + 0.01, ("r", t))
        if t % 2 == 0:
            sync.add(2, t * 0.10 + 0.02, ("c", t))
    sync.flush()
    assert len(got) >= 2
    for d, r, c in got:
        assert d[1] == r[1] == c[1]       # closest-stamp triples

    # out-of-order arrival within the queue still matches by stamp
    got.clear()
    sync2 = ApproximateTimeSynchronizer(3, lambda *m: got.append(m))
    sync2.add(1, 0.11, ("r", 1))
    sync2.add(0, 0.10, ("d", 1))
    sync2.add(2, 0.30, ("c", 3))          # late/far cloud
    sync2.add(2, 0.12, ("c", 1))          # wait: sorted into place
    sync2.flush()
    assert got and got[0][0][1] == got[0][1][1] == got[0][2][1] == 1


def test_approximate_time_synchronizer_slop():
    from partsbaseddetector_tpu.frontends.messages import \
        ApproximateTimeSynchronizer

    got = []
    sync = ApproximateTimeSynchronizer(2, lambda *m: got.append(m),
                                       slop=0.05)
    sync.add(0, 0.0, "a0")        # 0.3 s from any stream-1 stamp
    sync.add(1, 0.30, "b0")
    sync.add(0, 0.31, "a1")       # within slop of b0
    sync.flush()
    assert got == [("a1", "b0")]


def test_node_synchronizer_end_to_end(model):
    """Message-typed inputs through the synchronizer drive the callback
    (the full subscriber-side path: sync -> cv_bridge unpack -> detect)."""
    from partsbaseddetector_tpu.frontends import (PartsBasedDetectorNode,
                                                  messages as msgs)

    transport = FakeTransport()
    node = PartsBasedDetectorNode(model, transport)
    over = next(p for p in transport.pubs.values()
                if p.topic.endswith("candidates_rect_color"))
    over.subscribers = 1

    sync = node.make_synchronizer(queue_size=10)
    rng = np.random.default_rng(4)
    rgb = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    h = msgs.Header(stamp=3.0, frame_id="kinect")
    sync.add(0, 3.00, msgs.ImageMsg.from_array(
        np.full((64, 64), 1500, np.uint16).view(np.uint8).reshape(
            64, 128)[:, :64], "mono8", h))  # placeholder depth image
    sync.add(1, 3.01, msgs.ImageMsg.from_array(rgb, "rgb8", h))
    sync.add(2, 3.02, msgs.PointCloudMsg(
        header=h, points=rng.random((100, 3)).astype(np.float32)))
    sync.flush()
    assert len(over.published) == 1
    assert over.published[0].header.frame_id == "kinect"


def test_node_from_params(tmp_path, model):
    """Param-driven construction like the reference init()
    (ros/Node.cpp:64-105): model path loaded by extension."""
    from partsbaseddetector_tpu.frontends import PartsBasedDetectorNode
    from partsbaseddetector_tpu.models import save_filestorage

    path = str(tmp_path / "m.xml")
    save_filestorage(path, model)
    node = PartsBasedDetectorNode.from_params(
        FakeTransport(), {"model": path, "remove_planes": True,
                          "max_overlap": 0.25, "name": "fromparams"})
    assert node.name == "fromparams"
    assert node.stream.remove_planes is True
    assert node.stream.max_overlap == 0.25

    import pytest
    with pytest.raises(ValueError, match="model"):
        PartsBasedDetectorNode.from_params(FakeTransport(), {})


def test_node_depth_camera_callback(model):
    """Camera intrinsics arrive via the info subscriber
    (ros/Node.cpp:137-142) and enable the 3-D path."""
    from partsbaseddetector_tpu.frontends import PartsBasedDetectorNode

    transport = FakeTransport()
    node = PartsBasedDetectorNode(model, transport)   # no camera yet
    assert node.stream.camera is None
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    node.depth_camera_callback(K)
    cam = node.stream.camera
    assert (cam.fx, cam.fy, cam.cx, cam.cy) == (100.0, 100.0, 32.0,
                                                32.0)

    rng = np.random.default_rng(0)
    rgb = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    depth = np.full((64, 64), 1.5, np.float32)
    for p in transport.pubs.values():
        p.subscribers = 1
    res = node.depth_image_callback(rgb, depth,
                                    rng.random((200, 3)) * 2)
    assert res.boxes3d is not None      # 3-D path active post-callback

    kflat = tuple(K.ravel())

    class InfoMsg:
        K = kflat
    node.depth_camera_callback(InfoMsg())
    assert node.stream.camera.fx == 100.0
