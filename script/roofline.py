"""Per-op roofline accounting (VERDICT r4 item 3): analytic bytes/FLOPs
for the top trace ops at bench scale vs the v5e's peaks, with measured
ms supplied from the latest `bench.py --trace` run. Prints achieved
GB/s / TFLOP/s / descriptor-rate fractions and a verdict per op:
">=70% roofline - done" or "attackable".

v5e (v5 lite, 1 chip) peaks used:
  HBM       819 GB/s          (public v5e spec)
  MXU       197 TFLOP/s bf16; f32-accumulated bf16x2-split ~0.5x,
            HIGHEST (bf16x3/x6) ~1/6x
  VPU       ~4 Top/s f32 elementwise (8x128 lanes x ~4 ALUs x 0.94 GHz)
  gather    ~150 M rows/s descriptor rate (measured: 47 ms / 2M x 64 B
            rows round-2 probe -> ~6.5-23 ns/row depending on width;
            the engine is per-descriptor, not per-byte)
  scatter   ~0.85 M updates/s/operand-array (measured round-3/4:
            ~1.2 ms per 660k-position channel)
  sort      lax.sort ~2.2 ns/(row*operand) in-graph at 1.5-3M rows
            (measured; radix passes over 32-bit keys)

Workload constants (bench.py: 1600x1064, 661k capacity, ~1.25M
instances, CHUNK=128, ~6.7k tiles):
"""

import argparse
import json

# ---- bench-scale workload constants ----
C = 661_504  # gaussian capacity
S = 1_572_864  # instance capacity (1.5M)
S_LIVE = 1_250_000  # actual instances after culling
PIX = 1600 * 1064  # 1.70M
TILES = 100 * 67  # 6,700
CHUNK = 128
PIXB = 256  # pixels per tile block
STEPS = S_LIVE // CHUNK + TILES  # ragged flattened grid ~16.4k
SKY_ROWS = PIX  # sky taps (1 per pixel at ds=1)

HBM = 819e9
MXU_BF16 = 197e12
VPU = 4e12
GATHER_NS_PER_ROW = 6.5
SCATTER_S_PER_CHANNEL = 1.2e-3 / 660_000
SORT_NS_PER_ROW_OPERAND = 2.2

# Per-op engine model. Engines: hbm bytes, mxu MACs*2, vpu elementwise
# ops, gather descriptors (measured ~6.5 ns/row), grid steps (measured
# Pallas flattened-grid floor ~0.6 us/step, journal wave 2), sort rows
# (lax.sort internals are opaque below XLA; modeled from the measured
# r2/r4 points: ~4.3 ns/row + ~0.45 ns/row per extra operand).
STEP_US = 0.6
SORT_NS_BASE = 4.3
SORT_NS_EXTRA = 0.45

OPS = {
    "blend_fwd": dict(
        bytes=STEPS * (CHUNK * 64) + TILES * PIXB * 5 * 4,
        mxu=STEPS * (2 * PIXB * CHUNK * CHUNK + PIXB * CHUNK * 8) * 2,
        vpu=STEPS * PIXB * CHUNK * 40,
        grid_steps=STEPS,
        note="grid-step floor dominates: single-pass-prefix experiment "
        "(r5) measured it/s-NEUTRAL, so the MXU passes are hidden "
        "behind step machinery + VPU",
    ),
    "blend_bwd": dict(
        bytes=STEPS * (CHUNK * 64 * 2) + 2 * TILES * PIXB * 5 * 4,
        mxu=STEPS * (3 * PIXB * CHUNK * CHUNK + 3 * PIXB * CHUNK * 8) * 2,
        vpu=STEPS * PIXB * CHUNK * 60,
        grid_steps=STEPS,
        note="suffix accumulator + 9 gradient-row reductions per step; "
        "1.34 us/step vs fwd 0.81 — the extra is real VPU/MXU work",
    ),
    "payload_gather": dict(
        bytes=2 * S * 64,
        gather_rows=S,
        note="row-gather of [S, 16] payload by sorted inst_gauss",
    ),
    "payload_grad_sort": dict(
        sort_rows=S, sort_operands=5,
        bytes=8 * S * 20,
        note="bwd cotangent rows sorted by gaussian id "
        "(key + 4 bf16-pair-packed words)",
    ),
    "instance_tile_sort": dict(
        sort_rows=S, sort_operands=3,
        bytes=8 * S * 12,
        note="LSD tile pass of the (depth, tile) radix (binning.py:396)",
    ),
    "gauss_depth_sort": dict(
        sort_rows=C, sort_operands=5,
        bytes=8 * C * 20,
        note="N-scale gaussian depth sort (binning.py:310)",
    ),
    "sky_bwd_sort": dict(
        sort_rows=SKY_ROWS, sort_operands=5,
        bytes=8 * SKY_ROWS * 20,
        note="1.7M tap rows keyed by base texel",
    ),
    "sky_bwd_segsum": dict(
        bytes=2 * 4 * 6_293_504 * 12 * 4 // 8,
        mxu=6_293_504 * CHUNK * 12 * 2,
        note="[12, 6.29M] banded segment-sum (ops/segsum.py)",
    ),
    "sky_fwd_concat": dict(
        bytes=2 * 393_216 * 102 * 4,
        note="window-table build [393k, 102] (sky_cubemap.py:68)",
    ),
    "sky_fwd_relayout": dict(
        bytes=2 * PIX * 102 * 4,
        note="[H, W, 102] gathered-row relayout copy "
        "(sky_cubemap.py:82) — 695 MB intermediate",
    ),
    "fill_expand": dict(
        bytes=2 * S * 4 * 5,
        mxu=(S // 512 + C // 256) * 6 * 256 * 512 * 2,
        vpu=(S // 512 + C // 256) * 2 * 512 * 256,
        note="MXU run-expansion (ops/fill.py)",
    ),
    "detile_copies": dict(
        bytes=4 * TILES * PIXB * 5 * 4,
        note="tile->image layout copies fwd+bwd (rasterize.py:263-264)",
    ),
    "ssim": dict(
        bytes=20 * PIX * 3 * 4,
        mxu=4 * PIX * 3 * 11 * 2,
        note="separable banded blur matmuls fwd+bwd",
    ),
}


def analyze(measured_ms: dict):
    rows = []
    for op, m in OPS.items():
        ms = measured_ms.get(op)
        row = {"op": op, "ms": ms, "note": m.get("note", "")}
        if ms:
            t = ms / 1e3
            fracs = {}
            if m.get("bytes"):
                fracs["hbm"] = m["bytes"] / t / HBM
            if m.get("mxu"):
                fracs["mxu_bf16"] = m["mxu"] / t / MXU_BF16
            if m.get("vpu"):
                fracs["vpu"] = m["vpu"] / t / VPU
            if m.get("gather_rows"):
                fracs["gather_descr"] = (
                    m["gather_rows"] * GATHER_NS_PER_ROW / 1e9 / t
                )
            if m.get("grid_steps"):
                fracs["grid_steps"] = m["grid_steps"] * STEP_US / 1e6 / t
            if m.get("sort_rows"):
                ns = SORT_NS_BASE + SORT_NS_EXTRA * (m.get("sort_operands", 1) - 1)
                fracs["sort_engine"] = m["sort_rows"] * ns / 1e9 / t
            row["fractions"] = {k: round(v, 3) for k, v in fracs.items()}
            best = max(fracs.values()) if fracs else 0.0
            row["roofline_frac"] = round(best, 3)
            row["verdict"] = (
                ">=70% roofline - done" if best >= 0.7 else "attackable"
            )
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--measured", default=None,
        help="JSON file {op: ms}; defaults to the r5 trace numbers inline",
    )
    args = ap.parse_args()
    if args.measured:
        measured = json.load(open(args.measured))
    else:
        # round-5 trace (bench.py --trace /tmp/trace_r5, 20 iters,
        # device step 128.5 ms; attribution via script/trace_summary.py)
        measured = {
            "blend_bwd": 21.94,
            "blend_fwd": 13.30,
            "payload_gather": 9.71,
            "payload_grad_sort": 6.46,
            "instance_tile_sort": 2.65,
            "sky_bwd_sort": 5.55,
            "sky_bwd_segsum": 4.33,
            "sky_fwd_concat": 3.57,
            "sky_fwd_relayout": 2.44,
            "fill_expand": 3.49,
            "gauss_depth_sort": 2.07,
            "detile_copies": 3.74,
            "ssim": 2.60,
        }
    for row in analyze(measured):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
