#!/usr/bin/env python
"""HLO audit of the compiled flagship program: copy/transpose bytes by
shape, and the definitions of named ops (e.g. the profiler's top
fusions).  Compile is cached (.jax_cache), so this is cheap to re-run.

Usage: audit_hlo.py [--batch=8] [--dp-split=5] [--op=fusion.1239 ...]
"""
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    sizes = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "u8": 1,
             "bf16": 2, "f16": 2, "s8": 1, "f64": 8, "s64": 8}
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * sizes.get(dt, 4)


def main():
    import jax

    from partsbaseddetector_tpu.infer.detector import Detector
    from partsbaseddetector_tpu.models import synthetic
    from partsbaseddetector_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batch, dp_split, want_ops = 8, 5, []
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("--dp-split="):
            dp_split = int(a.split("=", 1)[1])
        elif a.startswith("--op="):
            want_ops.append(a.split("=", 1)[1])

    model = synthetic.person_like()
    model.thresh = 0.0
    det = Detector(model, k_per_level=64, dp_split=dp_split)
    ims = np.zeros((batch, 480, 640, 3), np.uint8)
    plan = det.plan_for((480, 640))
    single = det._program(plan)
    fn = jax.jit(lambda b, p: jax.vmap(lambda im: single(im, p))(b))
    compiled = fn.lower(ims, det.packed).compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt) / 1e6:.1f} MB", file=sys.stderr)

    # ---- copy ops by result shape
    tot = defaultdict(int)
    cnt = defaultdict(int)
    grand = 0
    for m in re.finditer(
            r"^\s*(\S+) = (\S+?) copy\(", txt, re.M):
        name, shape = m.groups()
        b = shape_bytes(shape)
        # strip layout annotation for grouping
        key = re.sub(r"\{[^}]*\}", "", shape)
        tot[key] += b
        cnt[key] += 1
        grand += b
    print(f"total copy bytes per call: {grand / 1e9:.2f} GB "
          f"({grand / 1e9 / batch:.3f} GB/frame)")
    for key, b in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {b / 1e6:10.1f} MB  x{cnt[key]:<5d} {key}")

    # ---- transpose ops by result shape
    tot2 = defaultdict(int)
    cnt2 = defaultdict(int)
    for m in re.finditer(r"^\s*(\S+) = (\S+?) transpose\(", txt, re.M):
        name, shape = m.groups()
        b = shape_bytes(shape)
        key = re.sub(r"\{[^}]*\}", "", shape)
        tot2[key] += b
        cnt2[key] += 1
    g2 = sum(tot2.values())
    print(f"total transpose bytes per call: {g2 / 1e9:.2f} GB")
    for key, b in sorted(tot2.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {b / 1e6:10.1f} MB  x{cnt2[key]:<5d} {key}")

    # ---- requested op definitions (with a few lines of context)
    for op in want_ops:
        print(f"\n==== {op} ====")
        # the fused computation the op calls, if any
        m = re.search(rf"^\s*%?{re.escape(op)}\s*=\s*(.+)$", txt, re.M)
        if not m:
            print("  (not found)")
            continue
        line = m.group(1)
        print(" ", line[:400])
        cm = re.search(r"(?:calls|to_apply)=%?([\w.\-]+)", line)
        if cm:
            comp = cm.group(1)
            dm = re.search(
                rf"^%?{re.escape(comp)}[^\n]*\{{(.*?)^\}}", txt,
                re.M | re.S)
            if dm:
                body = dm.group(1)
                lines = body.strip().splitlines()
                print(f"  [{comp}: {len(lines)} instrs]")
                for ln in lines[:40]:
                    print("   ", ln.strip()[:180])


if __name__ == "__main__":
    main()


def grep_copies(txt, shape_sub):
    """Print metadata of copies whose result shape contains shape_sub."""
    for m in re.finditer(r"^\s*(\S+) = (\S+?) copy\((\S+?)\)(.*)$",
                         txt, re.M):
        name, shape, operand, rest = m.groups()
        if shape_sub in shape:
            md = re.search(r'op_name="([^"]*)".*?source_line=(\d+)',
                           rest)
            src = re.search(r'source_file="([^"]*)"', rest)
            print(f"{name} {shape} <- {operand}")
            if md:
                print(f"    {md.group(1)[:120]}  "
                      f"{src.group(1).split('/')[-1] if src else ''}:"
                      f"{md.group(2)}")
