"""Distribution layer: device meshes, sharded batch detection.

The reference's only parallelism is shared-memory OpenMP loops
(reference: src/HOGFeatures.cpp:111-133, src/SpatialConvolutionEngine.cpp:
114-117, src/DynamicProgram.cpp:80-83); everything here is new TPU-native
design per SURVEY.md §2.4: mesh axes (data, filter) with XLA-inserted
collectives, deterministic top-K candidate merges instead of the
reference's nondeterministic critical-section push_back
(src/DynamicProgram.cpp:246-251)."""

from partsbaseddetector_tpu.parallel.mesh import (  # noqa: F401
    make_mesh)
from partsbaseddetector_tpu.parallel.sharded import (  # noqa: F401
    BatchDetector)
