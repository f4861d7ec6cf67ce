"""Tracklet pose store + learnable refinement, fully vectorized.

TPU-native replacement for the reference's `ActorPose`
(ref: lib/models/actor_pose.py:8-173). The reference does a numpy
argsort over tracklet timestamps per (object, query) at every render;
here the nearest-timestamp *indices* are precomputed once per camera at
dataset build time (`build_interp_table`) and the in-graph work is a
pure gather + slerp over all objects at once.

Semantics reproduced:
  * learnable residuals: per-(frame, object) translation delta and yaw
    delta applied via `quaternion_raw_multiply_theta`
    (actor_pose.py:20-27, general_utils.py:240-259);
  * linear interpolation of translation, slerp of rotation between the
    two nearest tracklet timestamps (actor_pose.py:107-158);
  * at val frames with opt_track, the pose is evaluated at the two
    nearest *train-camera* timestamps and interpolated between them, so
    unoptimized residuals at held-out frames are never used
    (actor_pose.py:124-136, 160-173). Both levels collapse into one
    uniform 4-sample structure per (camera, object).

Deliberate deviation: the reference computes `rots2` from `rots1` and
looks up `theta2` at (frame_ind1, column_ind2) (actor_pose.py:306-311) —
an evident typo; here the second sample uses its own rotation and its
own (frame, column) residual.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.utils.quaternion import quat_multiply, quat_normalize, quat_slerp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ActorPoseParams:
    """Learnable tracklet residuals (ref: actor_pose.py:20-27)."""

    opt_trans: jnp.ndarray  # [F, O, 3]
    opt_rots: jnp.ndarray  # [F, O, 1] yaw residual theta


@dataclasses.dataclass(frozen=True)
class ActorPoseData:
    """Frozen tracklet inputs. O = max objects per frame (tracklet column
    layout), F = number of tracklet frames."""

    input_trans: jnp.ndarray  # [F, O, 3]
    input_rots: jnp.ndarray  # [F, O, 4] (w, x, y, z)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ActorInterp:
    """Per-camera interpolation table over the scene's A actors (model
    order, background excluded). 4 tracklet samples per actor: (1, 2)
    bracket the first timestamp, (3, 4) the second; ratios = (r_a, r_b,
    r). Train cameras use samples (3,4) == (1,2), r = 0."""

    frame_idx: jnp.ndarray  # [A, 4] int32 into F
    col_idx: jnp.ndarray  # [A, 4] int32 into O
    ratios: jnp.ndarray  # [A, 3] float32


def quat_multiply_theta(q: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Right-multiply q by the z-axis 'rotation' (cos θ, 0, 0, sin θ) —
    exact reproduction of general_utils.py:240-259."""
    aw, ax, ay, az = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    bw = jnp.cos(theta)
    bz = jnp.sin(theta)
    return jnp.stack(
        [aw * bw - az * bz, ax * bw + ay * bz, ay * bw - ax * bz, az * bw + aw * bz],
        axis=-1,
    )


def actor_poses(
    data: ActorPoseData,
    params: Optional[ActorPoseParams],
    interp: ActorInterp,
    ego_quat: jnp.ndarray,  # [4] ego rotation as quaternion
    ego_rotmat: jnp.ndarray,  # [3, 3]
    ego_trans: jnp.ndarray,  # [3]
):
    """World-frame pose of every actor for one camera.

    Returns (obj_quat [A, 4], obj_trans [A, 3]): tracklet pose composed
    with the camera's ego pose (ref: street_gaussian_model.py:254-270).
    params=None disables opt_track (residuals off).
    """
    f = interp.frame_idx  # [A, 4]
    c = interp.col_idx
    trans_k = data.input_trans[f, c]  # [A, 4, 3]
    rots_k = data.input_rots[f, c]  # [A, 4, 4]
    if params is not None:
        trans_k = trans_k + params.opt_trans[f, c]
        rots_k = quat_multiply_theta(rots_k, params.opt_rots[f, c, ..., 0])

    r_a = interp.ratios[:, 0:1]
    r_b = interp.ratios[:, 1:2]
    r = interp.ratios[:, 2:3]

    trans_a = trans_k[:, 0] * (1.0 - r_a) + trans_k[:, 1] * r_a
    trans_b = trans_k[:, 2] * (1.0 - r_b) + trans_k[:, 3] * r_b
    trans = trans_a * (1.0 - r) + trans_b * r

    q_a = quat_slerp(rots_k[:, 0], rots_k[:, 1], r_a)
    q_b = quat_slerp(rots_k[:, 2], rots_k[:, 3], r_b)
    quat = quat_slerp(q_a, q_b, r)

    # compose with ego pose (street_gaussian_model.py:262-265)
    world_quat = quat_normalize(quat_multiply(ego_quat[None, :], quat))
    world_trans = trans @ ego_rotmat.T + ego_trans[None, :]
    return world_quat, world_trans


# ---------------------------------------------------------------------------
# host-side table construction (dataset build time)
# ---------------------------------------------------------------------------


def _bracket(track_rows: np.ndarray, row_ts: np.ndarray, t: float):
    """Two tracklet rows nearest in time to t, + lerp ratio.

    Matches find_closest_indices (actor_pose.py:83-90): the two smallest
    |Δt| rows, in that order; ratio r = (t - t1) / (t2 - t1).
    """
    d = np.abs(row_ts - t)
    i1, i2 = np.argsort(d, kind="stable")[:2]
    t1, t2 = row_ts[i1], row_ts[i2]
    r = 0.0 if t2 == t1 else (t - t1) / (t2 - t1)
    return track_rows[i1], track_rows[i2], float(r)


def build_interp_table(
    tracklets: np.ndarray,  # [F, O, 8] (track_id, x, y, z, qw, qx, qy, qz)
    tracklet_timestamps: np.ndarray,  # [F]
    actor_track_ids: List[int],  # per scene actor, model order
    timestamp: float,
    is_val: bool,
    train_timestamps_in_range,  # callable track_id -> np.ndarray of usable train cam timestamps
    opt_track: bool,
) -> ActorInterp:
    """Build one camera's ActorInterp (host-side, numpy)."""
    A = len(actor_track_ids)
    frame_idx = np.zeros((A, 4), np.int32)
    col_idx = np.zeros((A, 4), np.int32)
    ratios = np.zeros((A, 3), np.float32)

    track_ids = tracklets[..., 0]
    for a, tid in enumerate(actor_track_ids):
        rows = np.argwhere(track_ids == tid)  # [n, 2] (frame, col)
        if rows.shape[0] < 2:
            # degenerate: single observation — repeat it
            rows = np.repeat(rows, 2, axis=0) if rows.shape[0] == 1 else np.zeros((2, 2), np.int64)
        row_ts = tracklet_timestamps[rows[:, 0]]

        ts_pair = None
        if opt_track and is_val:
            cam_ts = np.asarray(train_timestamps_in_range(tid))
            if len(cam_ts) >= 2:
                d = np.abs(cam_ts - timestamp)
                j1, j2 = np.argsort(d, kind="stable")[:2]
                ts_pair = (float(cam_ts[j1]), float(cam_ts[j2]))

        if ts_pair is None:
            p1, p2, r_a = _bracket(rows, row_ts, timestamp)
            frame_idx[a] = [p1[0], p2[0], p1[0], p2[0]]
            col_idx[a] = [p1[1], p2[1], p1[1], p2[1]]
            ratios[a] = [r_a, r_a, 0.0]
        else:
            t_a, t_b = ts_pair
            pa1, pa2, r_a = _bracket(rows, row_ts, t_a)
            pb1, pb2, r_b = _bracket(rows, row_ts, t_b)
            r = 0.0 if t_b == t_a else (timestamp - t_a) / (t_b - t_a)
            frame_idx[a] = [pa1[0], pa2[0], pb1[0], pb2[0]]
            col_idx[a] = [pa1[1], pa2[1], pb1[1], pb2[1]]
            ratios[a] = [r_a, r_b, r]

    return ActorInterp(
        frame_idx=jnp.asarray(frame_idx),
        col_idx=jnp.asarray(col_idx),
        ratios=jnp.asarray(ratios),
    )


def init_actor_pose(tracklets: np.ndarray):
    """(data, params) from the dense tracklet array
    (ref: actor_pose.py:13-27)."""
    tracklets = np.asarray(tracklets, np.float32)
    data = ActorPoseData(
        input_trans=jnp.asarray(tracklets[..., 1:4]),
        input_rots=jnp.asarray(tracklets[..., 4:8]),
    )
    F, O = tracklets.shape[0], tracklets.shape[1]
    params = ActorPoseParams(
        opt_trans=jnp.zeros((F, O, 3), jnp.float32),
        opt_rots=jnp.zeros((F, O, 1), jnp.float32),
    )
    return data, params
