"""Learnable sky cubemap with differentiable cube sampling, pure jnp.

TPU-native replacement for the reference's `SkyCubeMap`
(ref: lib/models/sky_cubemap.py:14-125), which samples a 6xRxRx3
parameter cubemap with `nvdiffrast dr.texture(boundary_mode='cube')`.
Here the cube lookup is a face-select + bilinear gather, which XLA
fuses and differentiates; edge handling is clamp-to-face (nvdiffrast
blends across seams — visually negligible at R=1024 and documented as
the one deviation).

Face layout and orientation reproduce nvdiffrast's OpenGL convention as
used by the reference's `cube_to_dir` (sky_cubemap.py:283-291):
  face 0 +x: dir = ( 1, -v, -u)      face 1 -x: dir = (-1, -v,  u)
  face 2 +y: dir = ( u,  1,  v)      face 3 -y: dir = ( u, -1, -v)
  face 4 +z: dir = ( u, -v,  1)      face 5 -z: dir = (-u, -v, -1)
with u, v in [-1, 1] across the face.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.utils.camera import CameraJax, camera_rays


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# texels per window-table row (lane budget: 3 channels x 2 windows x
# (WINDOW + 1) lanes <= 128 -> WINDOW <= 20; 16 keeps //, % as shifts
# and the row count (table size, build write traffic) minimal)
WINDOW = 16


def _window_table(cm3: jnp.ndarray, R: int) -> jnp.ndarray:
    """[3, T] channel-major texels -> [ceil(T/W), 3*(2W+2)] double-
    window row table, CHANNEL-PLANAR lanes (W = WINDOW texels/row).

    Row r packs texels [Wr, Wr+W] and [Wr+R, Wr+R+W] (W+1 texels each)
    per channel; lane layout c*(2W+2) + window*(W+1) + k (channel c,
    window 0/+R, in-window offset k) so one row gather serves all 4
    bilinear taps of any pixel whose base texel falls in [Wr, Wr+W).
    Planar lanes let the table build read the [3, T] parameter planes
    DIRECTLY — the earlier interleaved-rgb layout forced a per-step
    relayout copy + a lane-padded (..., 3)-minor flatten of the whole
    cubemap (4.3 + 4.4 ms/step in the round-4 trace; a (..., 3)-minor
    f32 array pads its lane dim 3 -> 128, 42x memory). Depends only on
    the parameters — at serving (frozen params) build ONCE with
    `build_sky_table` (the reference's nvdiffrast samples the parameter
    texture directly, lib/models/sky_cubemap.py:99-119)."""
    T = cm3.shape[1]
    W = WINDOW
    nrows = -(-T // W)
    pieces = []
    for c in range(3):
        pc = jnp.pad(cm3[c], (0, nrows * W + R + 2 * W + 1 - T))
        w0 = pc[: nrows * W].reshape(nrows, W)
        w0b = pc[W : W + nrows * W].reshape(nrows, W)[:, :1]
        w1 = pc[R : R + nrows * W].reshape(nrows, W)
        w1b = pc[R + W : R + W + nrows * W].reshape(nrows, W)[:, :1]
        pieces += [w0, w0b, w1, w1b]
    return jnp.concatenate(pieces, axis=1)  # [T/W, 3*(2W+2)]


def _combine_taps(tbl: jnp.ndarray, base: jnp.ndarray, e4: jnp.ndarray) -> jnp.ndarray:
    """Gather window rows by base // WINDOW and contract the 4 tap
    weights: multiply by a per-lane weight image carrying e4[p, t]
    exactly at tap t's lane, then collapse lanes to rgb with a 0/1
    [lanes, 3] matmul.
    Lane l of a row holds channel l // (2W+2), window
    (l % (2W+2)) // (W+1) (0 = base row, 1 = +R row), in-window offset
    (l % (2W+2)) % (W+1)."""
    W = WINDOW
    span = 2 * W + 2  # lanes per channel
    bflat = base.reshape(-1)
    rows = jnp.take(tbl, bflat // W, axis=0)  # [P, 3*span]
    j = (bflat % W)[:, None]  # [P, 1]
    ef = e4.reshape(-1, 4)
    lane = np.arange(3 * span)
    kvec = jnp.asarray((lane % span) % (W + 1))[None, :]
    lo = jnp.asarray((lane % span) < W + 1)[None, :]
    w_hit = jnp.where(lo, ef[:, 0:1], ef[:, 2:3])
    w_nxt = jnp.where(lo, ef[:, 1:2], ef[:, 3:4])
    Wimg = jnp.where(kvec == j, w_hit, 0.0) + jnp.where(kvec == j + 1, w_nxt, 0.0)
    collapse = jnp.asarray(
        (lane[:, None] // span) == np.arange(3)[None, :], jnp.float32
    )
    out = jax.lax.dot_general(
        rows * Wimg,
        collapse,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # [P, 3]
    return out.reshape(*base.shape, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bilinear_taps(cm3, base, e4, R, interpret=False):
    """4-tap bilinear lookup of a [3, T] channel-major table with a
    SCATTER-FREE transpose.

    base: [...] int32 — linear index of the top-left tap texel;
    e4: [..., 4] f32 — tap weights in offset order (+0, +1, +R, +R+1),
      pre-folded at borders so degenerate taps carry zero weight and
      every live tap is at EXACTLY its static offset from `base`.

    The plain VJP is a 4-way scatter-add of ~1.1M pixel cotangents into
    the [6*R*R, 3] cubemap (measured ~270 ms at 1280x880/R=1024 — by far
    the most expensive op of the whole train step). The structured
    backward instead sorts ONE entry per pixel keyed by `base` carrying
    the 12 weighted-cotangent channels (lax.sort cost is key-dominated),
    reduces per-texel with the banded-matmul segment sum
    (ops/segsum.py), and assigns the +1/+R/+R+1 tap planes by three
    static shifts of the per-texel sums. Weight cotangents are
    intentionally zero: rays come from the fixed camera and the random
    jitter, neither learnable (the reference's nvdiffrast uv-gradients
    equally die at non-learnable rays, lib/models/sky_cubemap.py:99-119).
    """
    # ONE wide gather instead of 4 narrow ones (gather cost is per-ROW
    # latency-dominated, so minimizing descriptor count beats minimizing
    # bytes). Rows pack WINDOW texels' tap windows per channel (a
    # [T, 12] per-texel table would be 3.2 GB physical from lane
    # padding). A pixel with base b reads row b // WINDOW and combines
    # its 4 taps (in-row offset j = b % WINDOW, j+1 <= WINDOW) in one
    # shot: multiply by a weight image that carries e4[p, t] exactly at
    # tap t's lane and 0 elsewhere (2-D elementwise — PER-LANE column
    # slicing measured 3.5x worse), then contract the lane axis with a
    # 0/1 channel-collapse matrix on the MXU. Out-of-face window values
    # are dead: border folding gives any tap that would cross a
    # row/face boundary zero weight.
    return _combine_taps(_window_table(cm3, R), base, e4)


def _bt_fwd(cm3, base, e4, R, interpret):
    return _bilinear_taps(cm3, base, e4, R, interpret), (cm3.shape[1], base, e4)


def _bt_bwd(R, interpret, res, d_out):
    from street_gaussians_tpu.ops import segsum as segsum_lib

    T, base, e4 = res
    C = d_out.shape[-1]
    P = int(np.prod(base.shape))
    keys = base.reshape(-1)  # [P]
    # cap/group tuned on v5e (texel space 6.3M >> 1.7M entries, so the
    # banded matmul is sparse: small cap bounds per-step flops, big
    # group amortizes step overhead). skip_empty skips the >60% of
    # texel groups outside the camera cone entirely.
    cap = 512
    L = _round_up(P, cap)
    keys = jnp.pad(keys, (0, L - P), constant_values=segsum_lib.BIG)
    # 12 value channels: tap-plane-major (e_t * d_rgb), built as twelve
    # 1-D arrays (a [P, 12] staging buffer would be lane-padded 12->128
    # on TPU: 870 MB of pure padding traffic)
    def chan(t, r):
        v = (e4[..., t] * d_out[..., r]).reshape(-1)
        return jnp.pad(v, (0, L - P))

    chans = [chan(t, r) for t in range(4) for r in range(C)]
    if interpret:
        srt = jax.lax.sort((keys, *chans), num_keys=1, is_stable=False)
        skeys = srt[0]
        svals = jnp.stack(srt[1:], axis=0)  # [4C, L]
    else:
        # sort cost scales with operand count: pack bf16 PAIRS into u32
        # words (13 -> 7 arrays, 24 -> ~14 ms at bench scale). Bit-
        # neutral: the segsum matmul at default TPU precision rounds
        # every addend to bf16 anyway, and the round-trip through the
        # packed word is that exact rounding.
        packed = [
            segsum_lib.pack_bf16_pair(chans[2 * i], chans[2 * i + 1])
            for i in range(2 * C)
        ]
        srt = jax.lax.sort((keys, *packed), num_keys=1, is_stable=False)
        skeys = srt[0]
        svals = jnp.stack(
            [
                h
                for i in range(2 * C)
                for h in segsum_lib.unpack_bf16_pair(srt[1 + i])
            ],
            axis=0,
        )  # [4C, L]
    group = 2048
    Tp = _round_up(T, group)
    planes12 = segsum_lib.segment_rowsum(
        svals, skeys, num_segments=Tp, cap=cap, group=group,
        skip_empty=True, interpret=interpret,
    )  # [4*C, Tp], tap-major then rgb (row 3t+r = tap t, channel r)
    # tap plane for offset `off` accumulated at `base` belongs to texel
    # base + off: shift each plane down by its offset (live taps never
    # cross a row/face boundary — border folding guarantees it).
    # Row SLICES of the [12, Tp] segsum output, NOT a [4, C, Tp]
    # reshape: the reshape forced a T(4,128)-tiled relayout of the whole
    # 300 MB buffer (2.35 ms/step in the round-4 trace); slices keep the
    # native [12, Tp] layout.
    d_cm = planes12[0:C, :T]
    for t, off in enumerate((1, R, R + 1)):
        d_cm = d_cm + jnp.pad(
            planes12[(t + 1) * C : (t + 2) * C, :T], ((0, 0), (off, 0))
        )[:, :T]
    # d_cm IS the [3, T] channel-major cotangent — no transpose: the old
    # [T, 3] orientation forced a lane-padded (3 -> 128) 3.2 GB buffer
    return (
        d_cm,
        np.zeros(base.shape, jax.dtypes.float0),
        jnp.zeros_like(e4),
    )


_bilinear_taps.defvjp(_bt_fwd, _bt_bwd)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SkyParams:
    """cubemap: [3, 6*R*R] CHANNEL-MAJOR texels (channel, face-major
    linear texel index). Stored channel-major because every hot consumer
    is: the window-table build reads the three planes directly, and the
    backward's segment-sum emits [3, T] — the logical [6, R, R, 3] view
    has a (..., 3) minor dim that lane-pads 3 -> 128 on TPU (42x memory)
    and cost a 4.3 ms relayout copy + a 4.4 ms padded flatten per train
    step (round-4 trace). Constructing with a [6, R, R, 3] faces array
    auto-converts (tests, checkpoint back-compat, exports use
    `sky_faces`)."""

    cubemap: jnp.ndarray  # [3, 6*R*R] f32

    def __post_init__(self):
        cm = self.cubemap
        if getattr(cm, "ndim", 2) == 4 and hasattr(cm, "reshape"):
            self.cubemap = jnp.transpose(
                jnp.asarray(cm).reshape(-1, 3), (1, 0)
            )


def sky_resolution(cubemap: jnp.ndarray) -> int:
    """Face resolution R from the [3, 6*R*R] (or [6, R, R, 3]) array."""
    if cubemap.ndim == 4:
        return cubemap.shape[1]
    import math

    return math.isqrt(cubemap.shape[1] // 6)


def sky_faces(cubemap: jnp.ndarray) -> jnp.ndarray:
    """[3, 6*R*R] -> logical [6, R, R, 3] faces (export/debug only —
    materializes the lane-padded layout; never on the train path)."""
    if cubemap.ndim == 4:
        return cubemap
    R = sky_resolution(cubemap)
    return jnp.transpose(cubemap, (1, 0)).reshape(6, R, R, 3)


def init_sky(resolution: int = 1024, white_background: bool = True) -> SkyParams:
    """White-ε or ε init (ref: sky_cubemap.py:21-27)."""
    eps = 1e-3
    base = 1.0 - eps if white_background else eps
    return SkyParams(
        cubemap=jnp.full((3, 6 * resolution * resolution), base, jnp.float32)
    )


def build_sky_table(cubemap: jnp.ndarray) -> jnp.ndarray:
    """Precompute the serving-time window table for `sample_cubemap`'s
    `table=` fast path. Depends only on the cubemap parameters: at
    serving (frozen params) build once, sample every frame — removes the
    per-frame table build + flatten (~11 ms/frame at R=1024 on v5e,
    docs/perf_journal.md round 4). The cached path is BIT-IDENTICAL to
    the default path (same `_combine_taps` on the same table values)."""
    cm3 = SkyParams(cubemap).cubemap  # accepts [3, T] or legacy faces
    return _window_table(cm3, sky_resolution(cm3))


def sample_cubemap(
    cubemap: jnp.ndarray,
    dirs: jnp.ndarray,
    interpret: bool = False,
    table: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bilinear cube sampling. dirs [..., 3] (need not be normalized);
    returns [..., 3]. `interpret` runs the backward's segment-sum kernel
    in Pallas interpreter mode (CPU tests). `table`: optional precomputed
    `build_sky_table(cubemap)` — serving-only (NOT differentiable w.r.t.
    the cubemap), skips the per-frame table build."""
    if cubemap.ndim == 4:  # legacy faces layout (tests/exports)
        cubemap = SkyParams(cubemap).cubemap
    R = sky_resolution(cubemap)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # face selection: largest-magnitude axis
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    )

    major = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    major = jnp.maximum(major, 1e-12)
    # per-face (u, v) from the inverse of cube_to_dir
    u = jnp.where(
        is_x,
        jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    ) / major
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y)) / major

    # texel grid: u = -1 + (2i+1)/R at texel centers
    px = (u + 1.0) * 0.5 * R - 0.5
    py = (v + 1.0) * 0.5 * R - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, R - 1)
    x1i = jnp.clip(x0i + 1, 0, R - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, R - 1)
    y1i = jnp.clip(y0i + 1, 0, R - 1)

    # linear-index window gathers; the 4 taps run through a custom-VJP
    # core whose backward is a sort + segment-sum instead of a
    # scatter-add. Taps are expressed as (base texel, static offsets
    # {0, 1, R, R+1}); at the clamped borders (x1i == x0i / y1i == y0i)
    # the degenerate tap's weight is folded into its live partner so
    # offsets stay exact.
    base = face * (R * R) + y0i * R + x0i
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    degx = (x1i == x0i).astype(w00.dtype)
    degy = (y1i == y0i).astype(w00.dtype)
    e00 = w00 + degx * w01 + degy * w10 + degx * degy * w11
    e01 = (1 - degx) * (w01 + degy * w11)
    e10 = (1 - degy) * (w10 + degx * w11)
    e11 = (1 - degx) * (1 - degy) * w11
    e4 = jnp.stack([e00, e01, e10, e11], axis=-1)
    if table is not None:
        return _combine_taps(table, base, e4)
    return _bilinear_taps(cubemap, base, e4, R, interpret)


def render_sky(
    params: SkyParams,
    cam: CameraJax,
    jitter: jnp.ndarray | None = None,
    interpret: bool = False,
    row_start=None,
    num_rows: int | None = None,
    downsample: int = 1,
    table: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-pixel sky color [H, W, 3], clamped to [0, 1].

    jitter: optional [H, W, 2] sub-pixel ray offsets (train-time
    anti-aliasing, ref: sky_cubemap.py:93-96). The reference evaluates
    only sky-mask pixels at train time as a speed trick; on TPU the
    full-image gather is cheaper than a dynamic mask, and compositing
    multiplies by (1 - acc) anyway.
    downsample: > 1 samples a 1/N ray grid and returns the SMALL image
    [ceil(H/N), ceil(W/N), 3] — the caller bilinear-upsamples
    (renderer.render_frame eval fast path; the per-row gather is
    descriptor-rate-bound, so a 2x grid cut is ~4x fewer rows).
    """
    dirs = camera_rays(
        cam, jitter=jitter, row_start=row_start, num_rows=num_rows,
        downsample=downsample,
    )
    return jnp.clip(
        sample_cubemap(params.cubemap, dirs, interpret, table=table), 0.0, 1.0
    )


# ---------------------------------------------------------------------------
# latlong export (checkpoint-time, ref: sky_cubemap.py:42-45, 154-191)
# ---------------------------------------------------------------------------


def cubemap_to_latlong(cubemap: jnp.ndarray, res) -> jnp.ndarray:
    """[H, W, 3] equirectangular image (ref: sky_cubemap.py:178-191)."""
    H, W = res
    gy = np.linspace(0.0 + 1.0 / H, 1.0 - 1.0 / H, H)
    gx = np.linspace(-1.0 + 1.0 / W, 1.0 - 1.0 / W, W)
    gy, gx = np.meshgrid(gy, gx, indexing="ij")
    sintheta, costheta = np.sin(gy * np.pi), np.cos(gy * np.pi)
    sinphi, cosphi = np.sin(gx * np.pi), np.cos(gx * np.pi)
    dirs = jnp.asarray(
        np.stack([sintheta * sinphi, costheta, -sintheta * cosphi], axis=-1),
        jnp.float32,
    )
    return sample_cubemap(cubemap, dirs)
