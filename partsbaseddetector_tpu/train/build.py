"""Model initialization and assembly.

Python counterparts of initmodel.m / buildmodel.m / mergemodels.m
(reference: matlab/learning/): template sizing from the 5th-percentile
annotated box area, and the merge of per-part mixture filters into one
tree-structured PartsModel with per-edge bias blocks and deformation
parameters."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from partsbaseddetector_tpu.models.schema import (ComponentSpec, PartSpec,
                                                  PartsModel)


def template_size(boxes: np.ndarray, binsize: int) -> Tuple[int, int]:
    """Square template size in cells from the 5th-percentile box area
    (reference: matlab/learning/initmodel.m:8-23)."""
    w = boxes[:, 0, 2] - boxes[:, 0, 0] + 1
    h = boxes[:, 0, 3] - boxes[:, 0, 1] + 1
    areas = np.sort(h * w)
    area = areas[int(np.floor(len(areas) * 0.05))]
    nw = np.sqrt(area)
    t = max(int(np.floor(nw / binsize)), 1)
    return (t, t)


def build_model(name: str,
                filters_per_part: Sequence[Sequence[np.ndarray]],
                idx: Sequence[np.ndarray],
                deffeat: np.ndarray,
                parents: Sequence[int],
                binsize: int, interval: int,
                norient: int, flen: int,
                thresh: float = 0.0) -> PartsModel:
    """Merge per-part mixture filters into a tree model
    (reference: matlab/learning/buildmodel.m).

    filters_per_part[p][k]: (th, tw, flen) filter of part p mixture k;
    idx[p]: (N,) mixture assignment of each positive for part p;
    deffeat: (N, P, 2) scale-normalized part positions;
    parents[p]: parent index (root: -1 or 0)."""
    P = len(parents)
    filters: List[np.ndarray] = []
    defw: List[np.ndarray] = []
    anchors: List[np.ndarray] = []
    biasw: List[float] = []
    parts: List[PartSpec] = []

    for p in range(P):
        K = len(filters_per_part[p])
        parent = parents[p] if p > 0 else -1
        biasid: List[int] = []
        filterid: List[int] = []
        defid: List[int] = []
        if p == 0:
            # root: single scalar bias shared by all mixtures
            bid = len(biasw)
            biasw.append(0.0)
            biasid = [bid] * K
        else:
            Kp = len(filters_per_part[parents[p]])
            for k in range(K):
                bid = len(biasw)
                biasw.extend([0.0] * Kp)   # block indexed by parent mix
                biasid.append(bid)
        for k in range(K):
            filterid.append(len(filters))
            filters.append(np.asarray(filters_per_part[p][k],
                                      np.float64))
            did = len(defw)
            defid.append(did)
            if p == 0:
                defw.append(np.zeros(4))
                anchors.append(np.zeros(2, np.int64))
            else:
                defw.append(np.array([0.01, 0.0, 0.01, 0.0]))
                sel = idx[p] == k
                if sel.any():
                    rel = (deffeat[sel, p] - deffeat[sel, parents[p]]
                           ).mean(0)
                else:
                    rel = np.zeros(2)
                # mean relative displacement, rounded
                # (reference: buildmodel.m:62-69; 1-based round(x+1)
                # re-based to 0 == round(x))
                anchors.append(np.rint(rel).astype(np.int64))
        parts.append(PartSpec(parentid=parent, filterid=filterid,
                              biasid=biasid, defid=defid))

    model = PartsModel(
        name=name, interval=interval, thresh=thresh, binsize=binsize,
        norient=norient, flen=flen, filters=filters, defw=defw,
        anchors=anchors, biasw=np.asarray(biasw),
        components=[ComponentSpec(parts=parts)])
    model.validate()
    return model
