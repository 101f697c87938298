"""partsbaseddetector_tpu — TPU-native mixtures-of-parts detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wg-perception/PartsBasedDetector (Yang & Ramanan, "Articulated Pose Estimation
with Flexible Mixtures-of-Parts", CVPR 2011): HOG feature pyramids, mixture
filter-bank scoring, generalized distance transforms, min-sum dynamic
programming over part trees, candidate extraction / NMS, RGB-D post-processing,
training and evaluation — designed TPU-first (MXU-batched convolution, static
shapes, shape-bucketed pyramids, mesh-sharded multi-chip execution) rather
than ported from the reference's OpenCV/OpenMP object graph.

Reference parity targets are cited per module as /root/reference file:line.
"""

__version__ = "0.1.0"

from partsbaseddetector_tpu.models.schema import PartsModel  # noqa: F401
