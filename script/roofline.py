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

# Per-op analytic model: (bytes_hbm, mxu_flops, vpu_ops, gather_rows,
# scatter_positions, sort_row_operands, note)
OPS = {
    "blend_fwd": dict(
        # payload blocks in + rgb/acc/depth/T out; 2 two-pass prefix
        # matmuls [PIXB,CHUNK]@[CHUNK,CHUNK] + feature matmul per step;
        # ~40 VPU ops per (pixel, instance) for alpha/exp/masks
        bytes=STEPS * (CHUNK * 64) + PIX * 6 * 4,
        mxu=STEPS * (2 * PIXB * CHUNK * CHUNK * 2 + PIXB * CHUNK * 8 * 2),
        vpu=STEPS * PIXB * CHUNK * 40,
        note="MXU prefix products dominate (journal wave 2/7)",
    ),
    "blend_bwd": dict(
        bytes=STEPS * (CHUNK * 64 + CHUNK * 64) + PIX * 6 * 4,
        mxu=STEPS * (3 * PIXB * CHUNK * CHUNK * 2 + 2 * PIXB * CHUNK * 8 * 2),
        vpu=STEPS * PIXB * CHUNK * 60,
        note="suffix accumulators + AbsGS rows; single-pass bf16 prefix",
    ),
    "payload_gather": dict(
        bytes=2 * S * 64,
        gather_rows=S,
        note="descriptor-rate bound: ~6.5 ns/row regardless of width",
    ),
    "payload_grad_segsum": dict(
        bytes=2 * S * 64,
        mxu=S * CHUNK * 16 * 2,  # banded 0/1 matmul blocks
        note="ops/segsum.py banded matmul (round-2 item 1)",
    ),
    "instance_tile_sort": dict(
        bytes=6 * S * 8,  # multi-pass radix r/w of key+value
        sort_row_operands=S * 2,
        note="lax.sort key+1 value at S rows",
    ),
    "sky_bwd_sort": dict(
        bytes=6 * SKY_ROWS * 28,
        sort_row_operands=SKY_ROWS * 7,
        note="1.7M rows x (key + 6 packed bf16-pair words)",
    ),
    "sky_fwd_gather": dict(
        bytes=2 * SKY_ROWS * 264,  # [T/16, 102-lane] window rows
        gather_rows=SKY_ROWS // 16,
        note="window-table rows, 16 pixels share a row (stride 16)",
    ),
    "fill_expand": dict(
        # MXU run-expansion: mask build (2 iota compares over
        # [GOUT=512, CAP=256]) + select matmul [Cc,256]@[256,512]/step
        bytes=2 * S * 4 * 6,
        mxu=(S // 512 + C // 256) * 6 * 256 * 512 * 2,
        vpu=(S // 512 + C // 256) * 2 * 512 * 256,
        note="ops/fill.py banded select-matmul (r4)",
    ),
    "ssim": dict(
        bytes=20 * PIX * 3 * 4,
        mxu=2 * PIX * 3 * 11 * 2 * 2,  # separable banded matmuls fwd+bwd
        note="banded [.,W]@[W,W] blur matmuls (round-2 item 10)",
    ),
    "adam": dict(
        bytes=3 * 3 * C * 260,  # params + mu + nu r/w at ~260 B/row
        note="pure HBM traffic",
    ),
    "preprocess": dict(
        bytes=4 * C * 100,
        vpu=C * 400,
        note="scalarized per-gaussian math (journal lesson 2)",
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
            if m.get("sort_row_operands"):
                fracs["sort_engine"] = (
                    m["sort_row_operands"] * SORT_NS_PER_ROW_OPERAND / 1e9 / t
                )
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
        # filled from the round-5 trace (bench.py --trace; see
        # docs/perf_journal.md round 5)
        measured = {}
    for row in analyze(measured):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
