"""Transport adapters: ROS node and ECTO/ORK cell shims.

These map StreamingDetector's sinks onto the reference's two frontends
(reference: ros/Node.cpp:46-250, cells/detect.cpp:74-355).  The actual
transports (rospy/rclpy, ecto) are not present in this image, so both
adapters are import-guarded and transport-injected: they run against
any object with the small duck-typed surface they need (a publisher
factory / tendrils dicts), which is also how they are tested.
"""

from partsbaseddetector_tpu.frontends import messages  # noqa: F401
from partsbaseddetector_tpu.frontends.ros_node import (  # noqa: F401
    PartsBasedDetectorNode, ros_available)
from partsbaseddetector_tpu.frontends.ecto_cell import (  # noqa: F401
    PartsBasedDetectorCell, ecto_available)
from partsbaseddetector_tpu.frontends.ork_config import (  # noqa: F401
    OrkConfig, parse_by_parts)
