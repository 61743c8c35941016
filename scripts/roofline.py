"""Per-op roofline of the whole-model bf16 mmoecut epoch program.

Round-3 closed per-KERNEL speed-of-light accounting (RESULTS.md "Speed-of-
light accounting") but the whole-model claim — "the remaining ~70% is the
FLOPs themselves, 44 ms/epoch is the floor" — rested on a coarse profile
grouping. This script extends the method to every dominant op in the
compiled epoch program (VERDICT r3 ask #2):

  capture:  run the real Trainer epoch program (mmoecut bf16 by default) on
            the TPU, trace K dispatches with jax.profiler, and dump the
            compiled HLO text of the same executable.
  analyze:  join the xplane device timeline (per-HLO-op durations × counts)
            against the HLO module (per-fusion dot shapes, operand bytes,
            jax scope metadata) and emit a per-op table: time/epoch, FLOPs,
            achieved TFLOP/s, depth-adjusted MXU ceiling, HBM floor, and
            percent-of-ceiling — most-expensive first.

Ceiling model (same constants as RESULTS.md): TPU v5e 197.25 TFLOP/s bf16
MXU peak, 819 GB/s HBM. A dot with contraction depth K or output lanes N
below 128 can use at most (min(K,128)/128)·(min(N,128)/128) of the systolic
array; a fusion's ceiling is its FLOP-weighted harmonic mean over fused
dots. Ops whose HBM floor exceeds their compute floor are marked
memory-bound and judged against bytes/819GB/s instead.

Reference hot path being priced: MMOECut.py:88-105 (BiLSTM pre-encoding,
3 expert transformers, flattened gates, towers) under run.py:113-158's
epoch loop.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py capture \
      [--model mmoecut] [--dispatches 10] [--dir /tmp/rlt_roofline]
  python scripts/roofline.py analyze [--dir /tmp/rlt_roofline] \
      [--out RESULTS_roofline.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import sys

PEAK_BF16 = 197.25e12     # TPU v5e MXU, bf16
PEAK_F32 = PEAK_BF16 / 2
HBM_BW = 819e9            # bytes/s

DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s32": 4, "u32": 4,
               "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8,
               "u64": 8, "c64": 8, "c128": 16}


# ---------------------------------------------------------------------------
# capture
# ---------------------------------------------------------------------------

def capture(args):
    import dataclasses

    import jax
    import numpy as np

    import rlt_tpu
    rlt_tpu.enable_compilation_cache()
    from rlt_tpu import config as config_lib
    from rlt_tpu.train import Trainer

    cfg = config_lib.apply_preset(config_lib.TrainConfig(
        model_name=args.model, dataset_name="drmm_tks",
        log_dir="/tmp/rlt_tpu_roofline_runs", epochs=4,
    ))
    cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
    if args.batch_size:
        # b256-style captures (VERDICT r4 ask #5: the bf16 b256 MFU dip)
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    if args.queries:
        cfg = dataclasses.replace(cfg, synthetic_queries=args.queries)
    trainer = Trainer(cfg)

    key = jax.random.PRNGKey(7)
    # one compiled executable for both the HLO dump and the traced dispatches
    lowered = trainer.epoch_fn.lower(trainer.state, trainer.data, key)
    compiled = lowered.compile()
    os.makedirs(args.dir, exist_ok=True)
    with open(os.path.join(args.dir, "epoch_hlo.txt"), "w") as f:
        f.write(compiled.as_text())

    def dispatch(state, i):
        state, metrics = trainer.epoch_fn(
            state, trainer.data, jax.random.fold_in(key, i))
        # fetch real bytes — block_until_ready can lie through the tunnel
        np.asarray(jax.device_get(metrics["test_f1"]))
        return state

    state = dispatch(trainer.state, 0)   # warm (cache hit or compile)
    state = dispatch(state, 1)
    jax.profiler.start_trace(args.dir)
    for i in range(args.dispatches):
        state = dispatch(state, 2 + i)
    jax.profiler.stop_trace()
    meta = {"model": args.model, "dtype": args.dtype,
            "dispatches": args.dispatches,
            "n_train": int(trainer.data.n_train),
            "n_test": int(trainer.data.n_test),
            "batch_size": int(trainer.data.batch_size)}
    with open(os.path.join(args.dir, "capture_meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


# ---------------------------------------------------------------------------
# HLO text parsing
# ---------------------------------------------------------------------------

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_DOT_RE = re.compile(
    r"=\s*([a-z0-9]+)\[([0-9,]*)\][^ ]*\s+dot\(([^)]*)\),\s*(.*)")
_META_RE = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')


def _parse_shape(tok):
    m = _SHAPE_RE.search(tok)
    if not m:
        return None, []
    dtype = m.group(1)
    dims = [int(d) for d in m.group(2).split(",") if d] if m.group(2) else []
    return dtype, dims


def _dims_attr(attrs, name):
    m = re.search(name + r"=\{([0-9,]*)\}", attrs)
    if not m or not m.group(1):
        return []
    return [int(d) for d in m.group(1).split(",")]


_OPCODE_RE = re.compile(r"=\s*(?:\([^=]*?\)|\S+)\s+([a-z][a-z0-9\-_]*)\(")
_LAYOUT_RE = re.compile(r"\[[0-9,]*\]\{([0-9]+)[,}]")


def _minor_dim(out_seg: str, dims):
    """Size of the minor-most output dim (first entry of the HLO layout)."""
    m = _LAYOUT_RE.search(out_seg)
    if m and dims:
        idx = int(m.group(1))
        if idx < len(dims):
            return dims[idx]
    return dims[-1] if dims else 1


def _parse_window(attrs):
    """Effective contraction taps per window dim. XLA:TPU expresses matmuls
    as convolutions two ways: lhs_dilate=D with size=D (each window covers
    exactly one real element), and the batch-via-window trick size=N with
    pad (N-1 total) + rhs_reversal (each output position aligns with exactly
    one valid tap). Neither contracts over the window. This framework has no
    real convolution layers, so both collapse to taps=1."""
    m = re.search(r"window=\{([^}]*)\}", attrs)
    if not m:
        return [1]
    w = m.group(1)
    sm = re.search(r"size=([0-9x]+)", w)
    size = [int(s) for s in sm.group(1).split("x")] if sm else [1]
    dm = re.search(r"lhs_dilate=([0-9x]+)", w)
    dil = [int(s) for s in dm.group(1).split("x")] if dm \
        else [1] * len(size)
    pm = re.search(r"pad=([0-9_x]+)", w)
    pads = [[int(p) for p in d.split("_")] for d in pm.group(1).split("x")] \
        if pm else [[0, 0]] * len(size)
    taps = []
    for i, s in enumerate(size):
        d = dil[i] if i < len(dil) else 1
        lo, hi = pads[i] if i < len(pads) else (0, 0)
        if s > 1 and lo + hi >= s - 1:
            taps.append(1)          # batch-via-window matmul trick
        else:
            taps.append(max(1, math.ceil(s / max(1, d))))
    return taps


def _out_bytes(segment: str) -> int:
    """Total bytes of every typed shape token in an output segment."""
    total = 0
    for dtype, dims_s in re.findall(r"([a-z][a-z0-9]*)\[([0-9,]*)\]", segment):
        if dtype in DTYPE_BYTES:
            dims = [int(d) for d in dims_s.split(",") if d]
            total += DTYPE_BYTES[dtype] * (math.prod(dims) if dims else 1)
    return total


def _operand_names(call: str):
    return re.findall(r"%([\w\.\-]+)", call)


class HloModule:
    """Minimal text-parse of a compiled HLO module.

    Builds (a) a symbol table instr-name -> output bytes, (b) per-computation
    dot lists (shape/contraction/jax-scope), (c) instruction records for
    fusions, custom calls and naked dots so profiler event names can be
    joined back to FLOPs, depth-utilization and HBM traffic."""

    def __init__(self, text: str):
        self.sym_bytes = {}      # instr name -> output bytes
        self.comp_dots = {}      # computation name -> [dot dicts]
        self.instr = {}          # instr name -> record
        self.op_meta = {}        # EVERY instr name -> (opcode, scope)
        self.comp_scopes = {}    # computation name -> {scopes of its instrs}
        cur = None
        for raw in text.splitlines():
            line = raw.strip()
            if line.endswith("{") and "->" in line and "(" in line \
                    and "=" not in line.split("(")[0]:
                toks = line.split()
                name = toks[1] if toks[0] == "ENTRY" else toks[0]
                cur = name.lstrip("%").rstrip("(").split("(")[0]
                self.comp_dots[cur] = []
                continue
            if "=" not in line or cur is None:
                continue
            iname = line.split("=")[0].strip()
            if iname.startswith("ROOT "):
                iname = iname[5:].strip()
            iname = iname.lstrip("%")
            if not iname or " " in iname:
                continue
            om = _OPCODE_RE.search(line)
            opcode = om.group(1) if om else ""
            rhs = line.split("=", 1)[1]
            out_seg = rhs.split(opcode + "(", 1)[0] if opcode else rhs
            self.sym_bytes[iname] = _out_bytes(out_seg)
            meta = _META_RE.search(line)
            scope = meta.group(1) if meta else ""
            self.op_meta[iname] = (opcode, scope)
            if scope:
                self.comp_scopes.setdefault(cur, set()).add(scope)

            if opcode == "dot":
                dm = _DOT_RE.search(line)
                if dm:
                    out_dims = [int(d) for d in dm.group(2).split(",") if d]
                    attrs = dm.group(4)
                    lhs_c = _dims_attr(attrs, "lhs_contracting_dims")
                    # contraction depth: product of lhs contracting dims —
                    # resolve via the rhs operand when lhs shape is unknown
                    ops_names = _operand_names(dm.group(3))
                    kdim = None
                    rhs_c = _dims_attr(attrs, "rhs_contracting_dims")
                    for onm, cdims in ((ops_names[0] if ops_names else None,
                                        lhs_c),
                                       (ops_names[1] if len(ops_names) > 1
                                        else None, rhs_c)):
                        shp = self._shape_of(onm)
                        if shp and cdims:
                            kdim = math.prod(shp[i] for i in cdims)
                            break
                    if kdim is None:
                        kdim = 128  # unknown: assume full depth
                    out_total = math.prod(out_dims) if out_dims else 1
                    dot = {"flops": 2.0 * out_total * kdim, "k": kdim,
                           "lanes": out_dims[-1] if out_dims else 1,
                           "out": dm.group(1) + str(out_dims),
                           "scope": scope, "name": iname}
                    self.comp_dots[cur].append(dot)
                    self.instr[iname] = {
                        "kind": "dot", "dots": [dot], "scope": scope,
                        "operands": _operand_names(dm.group(3)),
                        "out_bytes": self.sym_bytes[iname]}
            elif opcode == "convolution":
                # XLA:TPU canonicalizes (batched) matmuls to base-dilated
                # convolutions — e.g. the vmapped expert FFN matmul becomes
                # window={size=3x1 stride=2x1 lhs_dilate=3x1} over an expert
                # spatial dim. Effective taps per output = ceil(size/dilate).
                dims_m = _SHAPE_RE.search(rhs)
                out_dims = [int(d) for d in dims_m.group(2).split(",")
                            if d] if dims_m else []
                lm = re.search(r"dim_labels=([0-9a-z]+)_([0-9a-z]+)->"
                               r"([0-9a-z]+)", line)
                ops_names = _operand_names(
                    rhs.split("convolution(", 1)[1].split(")")[0])
                kshape = self._shape_of(ops_names[1]) \
                    if len(ops_names) > 1 else None
                in_feat = 1
                if lm and kshape:
                    klabels = lm.group(2)
                    if "i" in klabels:
                        in_feat = kshape[klabels.index("i")]
                taps = math.prod(_parse_window(line))
                out_total = math.prod(out_dims) if out_dims else 1
                kdim = in_feat * taps
                dot = {"flops": 2.0 * out_total * kdim, "k": kdim,
                       "lanes": _minor_dim(out_seg, out_dims),
                       "out": str(out_dims), "scope": scope, "name": iname}
                self.comp_dots[cur].append(dot)
                self.instr[iname] = {
                    "kind": "conv", "dots": [dot], "scope": scope,
                    "operands": ops_names,
                    "out_bytes": self.sym_bytes[iname]}
            elif opcode in ("fusion", "custom-call"):
                rec = {"kind": opcode, "scope": scope,
                       "out_bytes": self.sym_bytes[iname],
                       "operands": _operand_names(
                           rhs.split(opcode + "(", 1)[1].split(")")[0])
                       if opcode + "(" in rhs else []}
                cm = re.search(r"calls=%?([\w\.\-]+)", line)
                if cm:
                    rec["calls"] = cm.group(1)
                tm = re.search(r'custom_call_target="([^"]+)"', line)
                if tm:
                    rec["target"] = tm.group(1)
                self.instr[iname] = rec
            # remember shapes of every instruction for operand resolution
            self._shapes = getattr(self, "_shapes", {})
            sm = _SHAPE_RE.search(out_seg)
            if sm:
                self._shapes[iname] = [int(d) for d in
                                       sm.group(2).split(",") if d]

    def _shape_of(self, name):
        return getattr(self, "_shapes", {}).get(name)

    def op_profile(self, iname: str):
        """(flops_per_exec, ceiling_frac, hbm_bytes, scopes, ndots, target)."""
        rec = self.instr.get(iname)
        if rec is None:
            return 0.0, 1.0, self.sym_bytes.get(iname, 0), [], 0, ""
        dots = rec.get("dots") or self.comp_dots.get(rec.get("calls"), [])
        flops = sum(d["flops"] for d in dots)
        if flops > 0:
            inv = sum(d["flops"] / (min(d["k"], 128) / 128.0 *
                                    min(d["lanes"], 128) / 128.0)
                      for d in dots)
            frac = flops / inv
        else:
            frac = 1.0
        hbm = rec.get("out_bytes", 0) + sum(
            self.sym_bytes.get(o, 0) for o in rec.get("operands", []))
        scopes = sorted({d["scope"] for d in dots if d["scope"]})
        if not scopes and rec.get("scope"):
            scopes = [rec["scope"]]
        if not scopes and rec.get("calls"):
            # non-dot fusion: inherit the fused computation's instr scopes
            scopes = sorted(self.comp_scopes.get(rec["calls"], set()))[:4]
        return flops, frac, hbm, scopes, len(dots), rec.get("target", "")


# ---------------------------------------------------------------------------
# xplane parsing
# ---------------------------------------------------------------------------

def load_device_ops(profile_dir: str):
    """Aggregate device-plane events: name -> [count, total_ps]."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {profile_dir}")
    ops = {}
    planes_seen = []
    for path in sorted(paths)[-1:]:   # latest capture
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            planes_seen.append(plane.name)
            if not ("TPU" in plane.name or "/device:" in plane.name):
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # device op lines: "XLA Ops" (per-HLO) — skip step/module
                # aggregation lines to avoid double counting
                if line.name not in ("XLA Ops",):
                    continue
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                    rec = ops.setdefault(name, [0, 0])
                    rec[0] += 1
                    rec[1] += ev.duration_ps
    if not ops:
        # fallback: take the busiest line of any device-looking plane
        raise SystemExit(
            "no 'XLA Ops' line found; planes seen: " + ", ".join(planes_seen))
    return ops


# ---------------------------------------------------------------------------
# analyze
# ---------------------------------------------------------------------------

def _label(name, scopes, target, opcode=""):
    """Human attribution from the instruction name + jax scope paths, with an
    opcode-category fallback so no op lands in 'ungrouped' without at least a
    structural classification (VERDICT r4 ask #4: 33% of the epoch was
    unattributed)."""
    text = name + " " + " ".join(scopes) + " " + (target or "")
    rules = [
        (r"self_attn", "attention"),
        (r"pre_encoding|lstm", "LSTM"),
        (r"linear1|linear2|experts", "expert FFN"),
        (r"gate|tbe,ebld", "MMOE gates"),  # incl. the gate-weighted expert mix
        (r"tower|classi|rerank|decision", "towers"),
        (r"rng-bit|threefry|rbg|random_bits", "rng bits"),
        (r"^copy\.", "layout copy"),
        (r"tpu_custom_call", "pallas kernel"),
        (r"adam|scale_by|apply_updates|weight_decay|inject", "optimizer"),
        (r"layer_norm|norm", "layernorm"),
        (r"softmax|logits|reward|metric|loss|cumsum|f1|dcg", "loss/metrics"),
        (r"permutation|shuffle|batch_plan|take|sort", "batch plan"),
        (r"transpose|bitcast", "layout copy"),
    ]
    for pat, lab in rules:
        if re.search(pat, text, re.I):
            return lab
    # opcode-category fallback (structural attribution, not model-level)
    op = opcode or name.split(".")[0]
    fallback = [
        (r"dynamic-update-slice|dynamic-slice|^slice|concatenate|pad|reshape",
         "scan/slice plumbing"),
        (r"gather|scatter", "gather/scatter"),
        (r"reduce", "reduction"),
        (r"convert", "dtype convert"),
        (r"copy|transpose|bitcast", "layout copy"),
        (r"rng|random", "rng bits"),
        (r"iota|constant|broadcast", "materialize"),
        (r"add|multiply|subtract|divide|select|compare|maximum|minimum|exp|"
         r"log|tanh|logistic|and|or|xor|not|abs|sign|floor|ceil|clamp",
         "elementwise"),
        (r"all-reduce|all-gather|collective|reduce-scatter", "collective"),
        (r"fusion", "misc fusion"),
    ]
    for pat, lab in fallback:
        if re.search(pat, op, re.I):
            return lab
    return ""


def analyze(args):
    meta = json.load(open(os.path.join(args.dir, "capture_meta.json")))
    hlo = HloModule(open(os.path.join(args.dir, "epoch_hlo.txt")).read())
    ops = load_device_ops(args.dir)
    dispatches = meta["dispatches"]
    peak = PEAK_BF16 if meta["dtype"] == "bfloat16" else PEAK_F32

    rows = []
    total_ms = 0.0
    _CONTAINERS = ("while", "call", "conditional", "infeed", "outfeed")
    for name, (count, ps) in ops.items():
        # event names carry the full instruction signature: "%name = ..."
        base = name.split(" = ")[0].strip().lstrip("%")
        if base.split(".")[0] in _CONTAINERS:
            continue  # container ops cover their children — double counting
        ms_per_epoch = ps / 1e9 / dispatches
        total_ms += ms_per_epoch
        flops, frac, hbm, scopes, ndots, target = hlo.op_profile(base)
        opcode, own_scope = hlo.op_meta.get(base, ("", ""))
        if not scopes and own_scope:
            scopes = [own_scope]
        execs_per_epoch = count / dispatches
        fl_epoch = flops * execs_per_epoch
        compute_floor_ms = fl_epoch / (peak * frac) * 1e3 if fl_epoch else 0.0
        hbm_floor_ms = hbm * execs_per_epoch / HBM_BW * 1e3
        floor_ms = max(compute_floor_ms, hbm_floor_ms)
        achieved = fl_epoch / (ms_per_epoch / 1e3) if ms_per_epoch > 0 else 0.0
        rows.append({
            "op": base, "label": _label(base, scopes, target, opcode),
            "execs_per_epoch": execs_per_epoch,
            "ms_per_epoch": round(ms_per_epoch, 4),
            "gflops_per_epoch": round(fl_epoch / 1e9, 3),
            "ndots": ndots,
            "depth_frac": round(frac, 4),
            "achieved_tflops": round(achieved / 1e12, 3),
            "compute_floor_ms": round(compute_floor_ms, 4),
            "hbm_floor_ms": round(hbm_floor_ms, 4),
            "bound": ("hbm" if hbm_floor_ms > compute_floor_ms else "mxu")
                     if fl_epoch else "other",
            "pct_of_ceiling": round(100 * floor_ms / ms_per_epoch, 1)
                              if ms_per_epoch > 0 and floor_ms > 0 else None,
            "scopes": scopes[:4],
            "target": target,
        })
    rows.sort(key=lambda r: -r["ms_per_epoch"])

    groups = {}
    for r in rows:
        g = groups.setdefault(r["label"] or "ungrouped", [0.0, 0.0, 0, []])
        g[0] += r["ms_per_epoch"]
        g[1] += r["gflops_per_epoch"]
        g[2] += 1
        g[3].append(r)
    group_rows = sorted(
        ({"label": k, "ms": round(v[0], 3), "gflops": round(v[1], 2),
          "ops": v[2],
          # top members by time, so no group is a black box (r4 ask #4)
          "top": [{"op": m["op"], "ms": m["ms_per_epoch"],
                   "x": m["execs_per_epoch"], "scopes": m["scopes"][:2]}
                  for m in sorted(v[3], key=lambda m: -m["ms_per_epoch"])[:6]]}
         for k, v in groups.items()),
        key=lambda g: -g["ms"])

    out = {
        "meta": meta,
        "total_device_ms_per_epoch": round(total_ms, 3),
        "peak_tflops": peak / 1e12,
        "hbm_gbps": HBM_BW / 1e9,
        "groups": group_rows,
        "rows": rows[:args.top],
        "tail_ms": round(sum(r["ms_per_epoch"] for r in rows[args.top:]), 3),
        "tail_ops": len(rows) - args.top if len(rows) > args.top else 0,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)

    # console table
    print(f"device total: {total_ms:.2f} ms/epoch  "
          f"({len(rows)} ops, top {args.top} shown)")
    for g in group_rows:
        print(f"  group {g['label']:24s} {g['ms']:8.3f} ms "
              f"{g['gflops']:9.2f} GF  ({g['ops']} ops)")
    hdr = (f"{'ms/ep':>7} {'%ceil':>5} {'bound':>5} {'GF/ep':>8} "
           f"{'TF/s':>6} {'x/ep':>5}  op / label")
    print(hdr)
    for r in out["rows"]:
        pct = f"{r['pct_of_ceiling']:.0f}" if r["pct_of_ceiling"] else "-"
        print(f"{r['ms_per_epoch']:7.3f} {pct:>5} {r['bound']:>5} "
              f"{r['gflops_per_epoch']:8.2f} {r['achieved_tflops']:6.2f} "
              f"{r['execs_per_epoch']:5.0f}  {r['op'][:60]} "
              f"[{r['label']}] {r['target'][:40]}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("capture")
    pc.add_argument("--model", default="mmoecut")
    pc.add_argument("--dtype", default="bfloat16")
    pc.add_argument("--dispatches", type=int, default=10)
    pc.add_argument("--batch-size", type=int, default=0)
    pc.add_argument("--queries", type=int, default=0)
    pc.add_argument("--dir", default="/tmp/rlt_roofline")
    pa = sub.add_parser("analyze")
    pa.add_argument("--dir", default="/tmp/rlt_roofline")
    pa.add_argument("--out", default="RESULTS_roofline.json")
    pa.add_argument("--top", type=int, default=40)
    args = p.parse_args(argv)
    if args.cmd == "capture":
        capture(args)
    else:
        analyze(args)


if __name__ == "__main__":
    sys.exit(main())
