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
    assert over.published[0].shape == rgb.shape
    assert len(bb.published) == 1
    mask = next(p for p in transport.pubs.values()
                if p.topic.endswith("/mask"))
    assert not mask.published

    # unsubscribe -> gated off again (Node.cpp getNumSubscribers)
    over.subscribers = 0
    node.depth_image_callback(rgb, depth, cloud)
    assert len(over.published) == 1
    assert len(bb.published) == 2


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
