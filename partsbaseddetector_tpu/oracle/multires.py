"""NumPy oracle for MULTI-RESOLUTION mixtures-of-parts detection.

The Matlab detector supports parts living at a finer pyramid level than
their parent — anchor ds > 0 puts a part ds octaves down, and messages
are passed with the strided/shifted DT (reference: matlab/detection/
detect.m:184-212 + passmsg :230-255, matlab/oct/shiftdt.cc).  The C++
port dropped this capability (its DT fixes step == 1).  This oracle
reproduces it with the framework's conventions:

  * part level: lvl[p] = root_level - scale[p] * interval with
    scale[p] = ds(p) + scale[parent(p)] (detect.m:184-204);
  * message for an edge with offset ds: out[q] = max_c child[c]
    - w . pen(d), d = anchor + q * 2^ds - c per axis (shiftdt with
    startx/starty = anchor, step = 2^ds; we carry no feature padding,
    so the matlab virtual-padding correction is identity);
  * pass order and argmin composition follow the matlab kernel
    (y pass first; Iy read through Ix — shiftdt.cc:97-111), for ALL
    edges including ds = 0, making this a "matlab-mode" detector: its
    VALUES equal the C++ mode's (the max-transform is separable), only
    argmax tie resolution can differ;
  * boxes use the C++ formula with each PART's own level scale:
    xy1 = (pt - 1) * scale_p (src/DynamicProgram.cpp:238-244).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from partsbaseddetector_tpu.models.schema import PartsModel
from partsbaseddetector_tpu.oracle.reference import (
    OracleCandidate, _bias_entry, conv_bank, cv_round, hog_features,
    pyramid, shiftdt)


def dp_min_multires(model: PartsModel, c: int,
                    pdfs_by_level: Dict[int, List[np.ndarray]],
                    root_level: int, interval: int, part_masks=None):
    """Leaf-to-root message passing with per-edge strided DTs.

    pdfs_by_level[lvl][fid]: response map of filter fid at pyramid level
    lvl.  Returns (rootv, rooti, Ix, Iy, Ik, lvl) — argmax tables like
    oracle.reference.dp_min, plus lvl[p] = each part's pyramid level.

    part_masks: optional per-level masks, part_masks[lvl] = (P, h, w)
    bool allowed placements on that level's true grid — each part
    masked at its OWN level BEFORE messages are added, the Matlab
    order (detect.m:89-101 masks parts(k).score, messages add after;
    its testoverlap-at-rlevel size garble for ds > 0 parts is
    intentionally NOT reproduced, see infer/multires._dp_multires)."""
    from partsbaseddetector_tpu.ops.common import NEG

    comp = model.components[c]
    nparts = comp.nparts
    scales = model.part_scales(c)
    lvl = [root_level - s * interval for s in scales]
    if min(lvl) < 0:
        raise ValueError(f"root level {root_level} too coarse for "
                         f"part scales {scales}")

    ncs: Dict[Tuple[int, int], np.ndarray] = {}  # (level, fid) -> score
    if part_masks is not None:
        # seed each part's buffers with the MASKED response so later
        # messages add on top (multires models never alias filter ids
        # within a component — MultiResDetector's guard)
        for p in range(nparts):
            part = comp.parts[p]
            for m in range(part.nmixtures):
                fid = part.filterid[m]
                key = (lvl[p], fid)
                if key not in ncs:
                    ncs[key] = pdfs_by_level[lvl[p]][fid].copy()
                mask = part_masks[lvl[p]][p]
                buf = ncs[key]
                buf[~mask[:buf.shape[0], :buf.shape[1]]] = NEG
    Ix: Dict[int, List[np.ndarray]] = {}
    Iy: Dict[int, List[np.ndarray]] = {}
    Ik: Dict[int, List[np.ndarray]] = {}

    for p in range(nparts - 1, 0, -1):
        part = comp.parts[p]
        par = part.parentid
        nmix = part.nmixtures
        pnmix = comp.parts[par].nmixtures
        ds = scales[p] - scales[par]
        step = 2 ** ds
        ph, pw = pdfs_by_level[lvl[par]][
            comp.parts[par].filterid[0]].shape

        scoresp, Ixp, Iyp = [], [], []
        for m in range(nmix):
            fid = part.filterid[m]
            score_in = ncs.get((lvl[p], fid), pdfs_by_level[lvl[p]][fid])
            w = model.defw[part.defid[m]]
            anc = np.asarray(model.anchors[part.defid[m]]).ravel()
            sdt, ix, iy = shiftdt(score_in, w, float(anc[0]),
                                  float(anc[1]), pw, ph, float(step))
            scoresp.append(sdt)
            Ixp.append(ix)
            Iyp.append(iy)

        Ix[p], Iy[p], Ik[p] = [], [], []
        for mp in range(pnmix):
            weighted = np.stack([scoresp[mm]
                                 + _bias_entry(model, c, p, mm, mp)
                                 for mm in range(nmix)])
            maxi = np.argmax(weighted, axis=0)
            maxv = np.take_along_axis(weighted, maxi[None], 0)[0]
            Ix[p].append(np.take_along_axis(np.stack(Ixp),
                                            maxi[None], 0)[0])
            Iy[p].append(np.take_along_axis(np.stack(Iyp),
                                            maxi[None], 0)[0])
            Ik[p].append(maxi)

            pfid = comp.parts[par].filterid[mp]
            key = (lvl[par], pfid)
            if key not in ncs:
                ncs[key] = pdfs_by_level[lvl[par]][pfid].copy()
            ncs[key] = ncs[key] + maxv

    root = comp.parts[0]
    bias = float(model.biasw[root.biasid[0]])
    weighted = np.stack(
        [ncs.get((lvl[0], root.filterid[m]),
                 pdfs_by_level[lvl[0]][root.filterid[m]]) + bias
         for m in range(root.nmixtures)])
    rooti = np.argmax(weighted, axis=0)
    rootv = np.take_along_axis(weighted, rooti[None], 0)[0]
    return rootv, rooti, Ix, Iy, Ik, lvl


def dp_argmin_multires(model: PartsModel, c: int, rootv, rooti,
                       pyr_scales: List[float], root_level: int,
                       Ix, Iy, Ik, lvl) -> List[OracleCandidate]:
    """Backtracking across levels: each part's box uses its own level's
    scale (src/DynamicProgram.cpp:238-244 applied per part level)."""
    comp = model.components[c]
    nparts = comp.nparts
    ys, xs = np.nonzero(rootv > model.thresh)
    out: List[OracleCandidate] = []
    for y0, x0 in zip(ys, xs):
        xv = np.zeros(nparts, dtype=np.int64)
        yv = np.zeros(nparts, dtype=np.int64)
        mv = np.zeros(nparts, dtype=np.int64)
        boxes = np.zeros((nparts, 4), dtype=np.int64)
        for p in range(nparts):
            part = comp.parts[p]
            if p == 0:
                x, y, m = int(x0), int(y0), int(rooti[y0, x0])
            else:
                idx = part.parentid
                px_, py_, pm_ = xv[idx], yv[idx], mv[idx]
                x = int(Ix[p][pm_][py_, px_])
                y = int(Iy[p][pm_][py_, px_])
                m = int(Ik[p][pm_][py_, px_])
            xv[p], yv[p], mv[p] = x, y, m
            scale = pyr_scales[lvl[p]]
            fs = model.filters[part.filterid[m]].shape
            xsize = ysize = fs[0]
            x1 = int(cv_round((x - 1) * scale))
            y1 = int(cv_round((y - 1) * scale))
            x2 = x1 + int(cv_round(xsize * scale)) - 1
            y2 = y1 + int(cv_round(ysize * scale)) - 1
            boxes[p] = (x1, y1, x2, y2)
        out.append(OracleCandidate(
            component=c, score=float(rootv[y0, x0]),
            scale_index=root_level, parts=boxes,
            locations=np.stack([xv, yv, mv], axis=1)))
    return out


def detect_multires(im: np.ndarray, model: PartsModel, part_masks=None
                    ) -> List[OracleCandidate]:
    """Full multi-resolution pipeline: root levels start max_scale
    octaves up so every part's level exists (detect.m:104).

    part_masks: optional per-level (P, h, w) bool allowed-placement
    masks (latent-positive search; see dp_min_multires — masking
    operates on per-call copies, the shared response maps are never
    mutated)."""
    images, pyr_scales = pyramid(im, model.binsize, model.interval)
    feats = [hog_features(x, model.binsize, model.norient, model.flen)
             for x in images]
    pdfs_by_level = {n: conv_bank(f, model.filters)
                     for n, f in enumerate(feats)}
    smax = model.max_scale()
    nscales = len(images)
    candidates: List[OracleCandidate] = []
    for root_level in range(smax * model.interval, nscales):
        for c in range(model.ncomponents):
            rootv, rooti, Ix, Iy, Ik, lvl = dp_min_multires(
                model, c, pdfs_by_level, root_level, model.interval,
                part_masks)
            candidates.extend(dp_argmin_multires(
                model, c, rootv, rooti, pyr_scales, root_level,
                Ix, Iy, Ik, lvl))
    return candidates
