"""Static HBM-byte attribution for the shipped tracking programs.

Compiles the EXACT window-tracking program bench.py times, then walks the
optimized HLO and estimates TRUE HBM traffic per instruction — the number
XLA's aggregate "bytes accessed" cost analysis overstates (BASELINE.md's
roofline showed f2f at 118.9% "HBM utilization", i.e. the naive byte model
exceeds what the chip physically moved). Differences vs the naive model:

  * only instructions in the entry computation, while bodies/conditions
    (WEIGHTED by trip count) and called/branch computations are counted —
    fusion-internal instructions are excluded (their traffic is the fusion
    op's operands/outputs; everything inside is VMEM-resident);
  * operands that are regenerable on-core (constants, iota, scalar
    broadcasts) cost no HBM reads;
  * gather / dynamic-slice read only what they emit (output bytes +
    indices), not the full operand;
  * scatter reads indices + updates and read-modify-writes only the
    touched rows (~2x updates), not init + full output;
  * while carries are donated/aliased (the while op itself moves nothing).

Remaining overcounts (model limits, stated so the number is honest): a
fusion operand only partially read inside the fusion is charged in full,
and multi-consumer buffers are charged per consumer even when a later
consumer could hit VMEM. Remaining undercounts: scatter/gather row
granularity below the 512-byte HBM burst, spills. Use --measure-bw to
calibrate the chip's achievable copy bandwidth for the utilization row.

Usage:
  python scripts/hlo_bytes.py [--path f2f|f2m] [--top 30] [--window 8]
                              [--frame-ms MS] [--measure-bw]
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


_COMP_RE = re.compile(r"^(ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{\s*$")
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*))\s+"
    r"([\w\-]+)\(")
_TRIP_RE = re.compile(r'known_trip_count=\{["a-z_:]*\s*(\d+)')
_CALLREF_RE = re.compile(
    r"(?:calls|body|condition|to_apply|branch_computations)="
    r"(?:\{([^}]*)\}|%?([\w.\-]+))")


class Instr:
    __slots__ = ("name", "typ", "op", "line")

    def __init__(self, name, typ, op, line):
        self.name, self.typ, self.op, self.line = name, typ, op, line


def parse_computations(hlo_text):
    """-> (comps: name -> [Instr], entry_name)."""
    comps, cur, entry = {}, None, None
    for line in hlo_text.splitlines():
        m = _COMP_RE.match(line)
        if m and "=" not in line.split("{")[0]:
            cur = m.group(2)
            comps[cur] = []
            if m.group(1):
                entry = cur
            continue
        if line.strip() == "}":
            cur = None
            continue
        if cur is None:
            continue
        mi = _INSTR_RE.match(line)
        if mi:
            comps[cur].append(Instr(mi.group(1), mi.group(2), mi.group(3),
                                    line))
    return comps, entry


# opcodes that move no HBM bytes themselves
_FREE_OPS = {"parameter", "constant", "get-tuple-element", "tuple",
             "bitcast", "iota", "after-all", "partition-id", "replica-id",
             "rng-bit-generator-state"}
# operand producers whose value is regenerable on-core (no HBM read)
_REGEN_OPS = {"constant", "iota"}


def trip_count(instr_line, cond_comp):
    """Trip count of a while op: prefer the known_trip_count backend
    annotation; else find `compare(..., constant(N))` in the condition."""
    m = _TRIP_RE.search(instr_line)
    if m:
        return int(m.group(1))
    best = None
    for ins in cond_comp:
        if ins.op == "constant":
            mc = re.search(r"constant\((\d+)\)", ins.line)
            if mc:
                best = int(mc.group(1))
    return best if best is not None else 1


def analyze(hlo_text, top, n_frames, frame_ms=None, peak_gbps=819.0,
            measured_gbps=None):
    comps, entry = parse_computations(hlo_text)

    # map instruction name -> (type, opcode) for operand lookup (names are
    # unique program-wide in optimized HLO)
    meta = {}
    for ins_list in comps.values():
        for ins in ins_list:
            meta[ins.name] = (ins.typ, ins.op)

    rows = []  # (weighted_bytes, weight, op, name)
    naive_total = 0

    def count_comp(cname, weight):
        nonlocal naive_total
        for ins in comps.get(cname, []):
            refs = re.findall(r"%([\w.\-]+)", ins.line.split("(", 1)[1])
            # recurse into control flow; fusion bodies are NOT counted
            # (the fusion op at this call site carries the traffic)
            if ins.op == "while":
                mb = re.search(r"body=%?([\w.\-]+)", ins.line)
                mc = re.search(r"condition=%?([\w.\-]+)", ins.line)
                body = mb.group(1) if mb else None
                cond = mc.group(1) if mc else None
                tc = trip_count(ins.line, comps.get(cond, []))
                if body:
                    count_comp(body, weight * tc)
                if cond:
                    count_comp(cond, weight * (tc + 1))
                continue
            if ins.op == "conditional":
                for grp, single in _CALLREF_RE.findall(ins.line):
                    for tgt in ([single] if single else
                                [t.strip().lstrip("%")
                                 for t in grp.split(",")]):
                        if tgt:
                            count_comp(tgt, weight)
                continue
            if ins.op == "call":
                for grp, single in _CALLREF_RE.findall(ins.line):
                    if single:
                        count_comp(single, weight)
                continue
            if ins.op in _FREE_OPS:
                continue

            ob = shape_bytes(ins.typ)
            ib_naive = sum(shape_bytes(meta.get(r, ("",))[0]) for r in refs)
            naive_total += weight * (ib_naive + ob)

            if ins.op in ("gather", "dynamic-slice"):
                idx_b = sum(shape_bytes(meta[r][0]) for r in refs[1:]
                            if r in meta)
                b = ob * 2 + idx_b            # read emitted rows + write
            elif ins.op == "scatter":
                # operand order: init, indices, updates
                upd_b = shape_bytes(meta[refs[-1]][0]) if refs and \
                    refs[-1] in meta else ob
                idx_b = sum(shape_bytes(meta[r][0]) for r in refs[1:-1]
                            if r in meta)
                b = idx_b + 3 * upd_b         # read idx+upd, RMW touched rows
            elif ins.op == "broadcast":
                b = ob                        # writes output, reads ~nothing
            elif ins.op == "dynamic-update-slice":
                upd_b = shape_bytes(meta[refs[1]][0]) if len(refs) > 1 and \
                    refs[1] in meta else 0
                b = 2 * upd_b                 # in-place: read update, write it
            else:
                ib = 0
                for r in refs:
                    t, op_r = meta.get(r, ("", ""))
                    if op_r in _REGEN_OPS:
                        continue
                    ib += shape_bytes(t)
                b = ib + ob
            rows.append((weight * b, weight, ins.op, ins.name))

    count_comp(entry, 1)
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    by_op = defaultdict(int)
    for t, _, op, _ in rows:
        by_op[op] += t

    print(f"naive operand+output bytes : {naive_total / 1e9:8.2f} GB "
          f"({naive_total / n_frames / 1e9:.2f} GB/frame)")
    print(f"corrected true-HBM estimate: {total / 1e9:8.2f} GB "
          f"({total / n_frames / 1e9:.2f} GB/frame)")
    if frame_ms:
        need_ms = total / n_frames / (peak_gbps * 1e6)
        print(f"HBM-bound time @ {peak_gbps:.0f} GB/s peak: "
              f"{need_ms:.1f} ms/frame; measured {frame_ms:.1f} ms/frame "
              f"-> utilization {100 * need_ms / frame_ms:.0f}%")
        if measured_gbps:
            need2 = total / n_frames / (measured_gbps * 1e6)
            print(f"@ measured copy BW {measured_gbps:.0f} GB/s: "
                  f"{need2:.1f} ms/frame -> utilization "
                  f"{100 * need2 / frame_ms:.0f}%")
    print("\n-- by opcode (corrected) --")
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {op:24s} {b / 1e9:8.3f} GB  ({100.0 * b / total:4.1f}%)")
    print(f"\n-- top {top} instructions (corrected, xN = loop weight) --")
    for t, wgt, op, name in rows[:top]:
        print(f"  {t / 1e6:9.1f} MB  x{wgt:<5d} {op:18s} {name[:80]}")


def measure_copy_bw(gib=1.0):
    """Achievable single-chip HBM copy bandwidth (read+write GB/s) via a
    jitted y = x + 1 over a large f32 array — the realistic peak the
    utilization row should compare against."""
    import time
    n = int(gib * (1 << 30) // 4)
    x = jax.block_until_ready(jnp.zeros((n,), jnp.float32))
    f = jax.jit(lambda v: v + 1.0)
    y = jax.block_until_ready(f(x))
    _ = np.asarray(y[:1])
    t0 = time.perf_counter()
    reps = 4
    for _i in range(reps):
        y = f(y)
    _ = np.asarray(y[:1])
    dt = (time.perf_counter() - t0) / reps
    return 2 * n * 4 / dt / 1e9


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
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--frame-ms", type=float, default=None,
                    help="measured ms/frame for the utilization row")
    ap.add_argument("--measure-bw", action="store_true",
                    help="also measure achievable copy bandwidth on-device")
    args = ap.parse_args()

    bw = measure_copy_bw() if args.measure_bw else None
    if bw:
        print(f"measured copy bandwidth: {bw:.0f} GB/s (read+write)")
    text = compiled_window_text(args.path == "f2f", args.window)
    analyze(text, args.top, n_frames=args.window, frame_ms=args.frame_ms,
            measured_gbps=bw)


if __name__ == "__main__":
    main()
