"""Static HBM-byte attribution for the shipped tracking programs.

Compiles the EXACT window-tracking program bench.py times, then walks the
optimized HLO and ranks instructions by (operand + output) bytes — the
post-fusion traffic XLA's cost analysis sums into the single 'bytes
accessed' number the roofline in BASELINE.md reports. This breaks that
total down per fusion/op so byte-diet work targets the real movers.

Heuristic, not a profile: VMEM-resident reuse inside a fusion is not
visible (bytes are overcounted for operands consumed by several fused
users), and custom-call (Pallas) operand bytes are face-value. Use
scripts/profile_device.py for measured per-stage times.

Usage: python scripts/hlo_bytes.py [--path f2f|f2m|infer] [--top 40]
"""
import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 640
FX = 500.0

_DT_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
             "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
             "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples by summing)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DT_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*))\s+"
    r"([\w\-]+)\(")


def analyze(hlo_text: str, top: int):
    """Rank non-entry-computation HLO instructions by operand+output bytes."""
    # map instruction name -> output type (for operand byte lookup)
    out_type = {}
    rows = []
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, typ, op = m.groups()
        out_type[name] = typ
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        ob = shape_bytes(typ)
        # operand bytes: every %ref on the rhs after the opcode
        rhs = line.split("(", 1)[1]
        ib = 0
        for ref in re.findall(r"%([\w.\-]+)", rhs):
            ib += shape_bytes(out_type.get(ref, ""))
        rows.append((ib + ob, ib, ob, op, name))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    by_op = defaultdict(int)
    for t, _, _, op, _ in rows:
        by_op[op] += t
    print(f"total operand+output bytes: {total / 1e9:.2f} GB")
    print("\n-- by opcode --")
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {op:24s} {b / 1e9:8.3f} GB  ({100.0 * b / total:4.1f}%)")
    print(f"\n-- top {top} instructions --")
    for t, ib, ob, op, name in rows[:top]:
        print(f"  {t / 1e6:9.1f} MB (in {ib / 1e6:8.1f} out {ob / 1e6:8.1f})"
              f"  {op:16s} {name[:90]}")


def compiled_window_text(f2f: bool = True, t_window: int = 8) -> str:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    cfg = {
        "frame2frame": f2f, "lbgfs_iters": 20 if f2f else 100,
        "conf_weighing": True, "depth_clipping": [1, 250], "dist_thr": 0.05,
        "average_pts": False,
    }
    if not f2f:
        cfg.update(map_capacity=t_window * H * W,
                   initial_bucket=t_window * H * W)
    est = bench.build_estimator(cfg)
    ls, rs = bench.make_sequence(1)
    est(ls[0], rs[0], np.ones((1, H, W, 1), bool))
    ls, rs = bench.make_sequence(t_window, seed=1)
    masks = jnp.ones((t_window, 1, H, W, 1), bool)
    limgs, rimgs = jnp.asarray(ls, jnp.float32), jnp.asarray(rs, jnp.float32)
    if f2f:
        # instantiate the cached steady-state jit, then lower it AOT for the
        # same signature to extract the optimized HLO
        est.track_window(limgs, rimgs, masks)
        fn = est._jit_windows[False]
        lowered = fn.lower(est.variables, est.last_pose, est.frame,
                           est._feats, limgs, rimgs, masks)
    else:
        est.track_window(limgs, rimgs, masks)
        fn = est._get_f2m_window(est.scene.cfg, False)
        lowered = fn.lower(est.variables, est.last_pose, est.scene.state,
                           est._model_frame_f2m(), limgs, rimgs, masks)
    return lowered.compile().as_text()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="f2f", choices=["f2f", "f2m"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--window", type=int, default=8)
    args = ap.parse_args()

    text = compiled_window_text(args.path == "f2f", args.window)
    analyze(text, args.top)


if __name__ == "__main__":
    main()
