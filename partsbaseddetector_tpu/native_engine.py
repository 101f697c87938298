"""ctypes binding to the native C++/OpenMP engine (native/pbd_native.cpp).

The native engine re-implements the reference's detection pipeline with
the reference's algorithm structure (per-channel spatial correlation,
O(N) envelope distance transform, OpenMP at the reference's four
parallel-for sites — src/HOGFeatures.cpp:111,130, src/
SpatialConvolutionEngine.cpp:114, src/DynamicProgram.cpp:80).  Binding
it gives an INDEPENDENT cross-check of the JAX detector: two engines,
two codebases, one candidate-set contract (the reference's
DynamicProgram::argmin semantics, src/DynamicProgram.cpp:208-251).

Build: ``make -C native libpbd_native.so`` (done lazily by
:func:`ensure_built`).
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import List, Optional

import numpy as np

from partsbaseddetector_tpu.models.schema import PartsModel

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_SO = os.path.join(_NATIVE_DIR, "libpbd_native.so")


def ensure_built() -> str:
    """Build libpbd_native.so if missing/stale; returns its path.

    Raises RuntimeError when the toolchain is unavailable (callers — the
    parity test — skip in that case)."""
    src = os.path.join(_NATIVE_DIR, "pbd_native.cpp")
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(src)):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "libpbd_native.so"],
                           check=True, capture_output=True, text=True)
        except (OSError, subprocess.CalledProcessError) as e:
            raise RuntimeError(f"cannot build native engine: {e}") from e
    return _SO


@dataclasses.dataclass
class NativeCandidate:
    """One native-engine detection (feature-grid coordinates)."""

    score: float
    level: int
    loc: np.ndarray        # (P, 3) int32: x, y, mixture


class NativeEngine:
    """Detection through the native C++ pipeline.

    Requires a single-component model with a uniform mixture count
    across all parts (the native model layout is dense (P, M); the
    shipped reference models satisfy this after root-mixture padding —
    the cross-check fixtures are generated uniform).
    """

    def __init__(self, lib_path: Optional[str] = None):
        self._lib = ctypes.CDLL(lib_path or ensure_built())
        f = self._lib.pbd_detect_candidates
        f.restype = ctypes.c_int
        f.argtypes = [
            ctypes.POINTER(ctypes.c_float),                 # image
            ctypes.c_int, ctypes.c_int, ctypes.c_int,       # h, w, c
            ctypes.c_int, ctypes.c_int, ctypes.c_int,       # P, M, fsize
            ctypes.c_int, ctypes.c_int,                     # flen, norient
            ctypes.c_int, ctypes.c_int, ctypes.c_float,     # bin, intv, thr
            ctypes.POINTER(ctypes.c_int),                   # parent
            ctypes.POINTER(ctypes.c_float),                 # filters
            ctypes.POINTER(ctypes.c_float),                 # defw
            ctypes.POINTER(ctypes.c_int),                   # anchor
            ctypes.POINTER(ctypes.c_float),                 # bias
            ctypes.POINTER(ctypes.c_float),                 # root_bias
            ctypes.POINTER(ctypes.c_int),                   # fid (or None)
            ctypes.c_int,                                   # k_per_level
            ctypes.POINTER(ctypes.c_float),                 # out_score
            ctypes.POINTER(ctypes.c_int32),                 # out_level
            ctypes.POINTER(ctypes.c_int32),                 # out_loc
            ctypes.c_int,                                   # cap
        ]
        g = self._lib.pbd_nscales
        g.restype = ctypes.c_int
        g.argtypes = [ctypes.c_int] * 4

    def nscales(self, h: int, w: int, binsize: int, interval: int) -> int:
        return int(self._lib.pbd_nscales(h, w, binsize, interval))

    @staticmethod
    def model_arrays(model: PartsModel):
        """Flatten a PartsModel into the native dense (P, M) layout.

        bias[p, mc, mp] = biasw[biasid[p][mc] + mp] (the reference's
        addressing, include/Parts.hpp:172-175 with src/DynamicProgram.
        cpp:139); root_bias[m] = biasw[biasid[0][m]].

        Also returns fid: the (P*M,) COMPACTED filter-id map when the
        component shares filters across (part, mixture) slots (the
        reference's score-buffer aliasing, include/Parts.hpp:165-168),
        else None (no sharing — the engine keeps per-slot buffers)."""
        if model.ncomponents != 1:
            raise ValueError("native engine: single-component models only")
        comp = model.components[0]
        P = comp.nparts
        mixes = {p.nmixtures for p in comp.parts}
        if len(mixes) != 1:
            raise ValueError("native engine: uniform mixture count "
                             f"required, got {sorted(mixes)}")
        M = mixes.pop()
        sizes = {tuple(f.shape) for f in model.filters}
        if len(sizes) != 1:
            raise ValueError("native engine: uniform filter size required")
        fsize = model.filters[0].shape[0]
        if model.filters[0].shape[1] != fsize:
            raise ValueError("native engine: square filters required")

        parent = np.zeros(P, np.int32)
        filters = np.zeros((P * M, fsize, fsize, model.flen), np.float32)
        defw = np.zeros((P * M, 4), np.float32)
        anchor = np.zeros((P * M, 2), np.int32)
        bias = np.zeros((P, M, M), np.float32)
        root_bias = np.zeros(M, np.float32)
        gids = np.zeros(P * M, np.int64)        # global filter ids
        for p, part in enumerate(comp.parts):
            parent[p] = max(part.parentid, 0)
            for m in range(M):
                filters[p * M + m] = model.filters[part.filterid[m]]
                gids[p * M + m] = part.filterid[m]
                defw[p * M + m] = model.defw[part.defid[m]]
                anc = np.asarray(model.anchors[part.defid[m]]).ravel()
                if anc.size >= 3 and anc[2] != 0:
                    raise ValueError("native engine: multi-resolution "
                                     "parts (anchor ds != 0) unsupported")
                anchor[p * M + m] = anc[:2]
                if p == 0:
                    root_bias[m] = model.biasw[part.biasid[m]]
                else:
                    bias[p, m, :] = model.biasw[
                        part.biasid[m]:part.biasid[m] + M]
        if len(set(gids.tolist())) == P * M:
            fid = None                          # no sharing
        else:
            # compact global ids to [0, P*M) for the native acc table
            _, fid = np.unique(gids, return_inverse=True)
            fid = fid.astype(np.int32)
        return (parent, filters, defw, anchor, bias, root_bias, fid,
                P, M, fsize)

    def detect(self, image: np.ndarray, model: PartsModel,
               k_per_level: int = 64) -> List[NativeCandidate]:
        """Run the native pipeline; returns candidates above
        model.thresh, grouped by level (ascending), scores descending
        within each level."""
        (parent, filters, defw, anchor, bias, root_bias, fid,
         P, M, fsize) = self.model_arrays(model)
        img = np.ascontiguousarray(image, np.float32)
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, c = img.shape
        ns = self.nscales(h, w, model.binsize, model.interval)
        cap = max(1, ns * k_per_level)
        out_score = np.zeros(cap, np.float32)
        out_level = np.zeros(cap, np.int32)
        out_loc = np.zeros((cap, P, 3), np.int32)

        def fp(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

        def ip(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

        def i32p(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

        n = self._lib.pbd_detect_candidates(
            fp(img), h, w, c, P, M, fsize, model.flen, model.norient,
            model.binsize, model.interval, ctypes.c_float(model.thresh),
            ip(parent), fp(np.ascontiguousarray(filters)),
            fp(np.ascontiguousarray(defw)),
            ip(np.ascontiguousarray(anchor)),
            fp(np.ascontiguousarray(bias)), fp(root_bias),
            None if fid is None else ip(np.ascontiguousarray(fid)),
            int(k_per_level), fp(out_score), i32p(out_level),
            i32p(out_loc), cap)
        if n < 0:
            raise RuntimeError("pbd_detect_candidates failed")
        return [NativeCandidate(score=float(out_score[i]),
                                level=int(out_level[i]),
                                loc=out_loc[i].copy())
                for i in range(n)]
