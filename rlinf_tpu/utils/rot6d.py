"""Rotation representations + SE(3) helpers (numpy, dependency-free).

Reference analog: rlinf/utils/rot6d.py — quaternions are xyzw; rot6d is the
first two COLUMNS of R flattened (decode = Gram-Schmidt on r1, r2); the
SE(3) body-frame delta is ``T_delta = inv(T_state) @ T_abs``. scipy's
Rotation is replaced by explicit quaternion<->matrix formulas.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "quat_xyzw_to_matrix", "matrix_to_quat_xyzw",
    "quat_xyzw_to_rot6d", "rot6d_to_matrix", "matrix_to_rot6d",
    "rot6d_to_quat_xyzw", "rot6d_to_quat_xyzw_safe",
    "pose_to_SE3", "SE3_to_pose", "se3_body_delta", "se3_body_compose",
]


def quat_xyzw_to_matrix(q: np.ndarray) -> np.ndarray:
    """[..., 4] xyzw quaternion -> [..., 3, 3] rotation matrix."""
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3), np.float64)
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - z * w)
    R[..., 0, 2] = 2 * (x * z + y * w)
    R[..., 1, 0] = 2 * (x * y + z * w)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - x * w)
    R[..., 2, 0] = 2 * (x * z - y * w)
    R[..., 2, 1] = 2 * (y * z + x * w)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R.astype(np.float32)


def matrix_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    """[..., 3, 3] -> [..., 4] xyzw (Shepperd's method, batched)."""
    R = np.asarray(R, np.float64)
    flat = R.reshape(-1, 3, 3)
    out = np.empty((flat.shape[0], 4), np.float64)
    for i, m in enumerate(flat):
        t = np.trace(m)
        if t > 0:
            s = np.sqrt(t + 1.0) * 2
            w = 0.25 * s
            x = (m[2, 1] - m[1, 2]) / s
            y = (m[0, 2] - m[2, 0]) / s
            z = (m[1, 0] - m[0, 1]) / s
        elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
            s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
            w = (m[2, 1] - m[1, 2]) / s
            x = 0.25 * s
            y = (m[0, 1] + m[1, 0]) / s
            z = (m[0, 2] + m[2, 0]) / s
        elif m[1, 1] > m[2, 2]:
            s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
            w = (m[0, 2] - m[2, 0]) / s
            x = (m[0, 1] + m[1, 0]) / s
            y = 0.25 * s
            z = (m[1, 2] + m[2, 1]) / s
        else:
            s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
            w = (m[1, 0] - m[0, 1]) / s
            x = (m[0, 2] + m[2, 0]) / s
            y = (m[1, 2] + m[2, 1]) / s
            z = 0.25 * s
        out[i] = (x, y, z, w)
    out /= np.linalg.norm(out, axis=-1, keepdims=True)
    return out.reshape(R.shape[:-2] + (4,)).astype(np.float32)


def matrix_to_rot6d(R: np.ndarray) -> np.ndarray:
    """First two columns of R, flattened -> [..., 6]."""
    R = np.asarray(R)
    if R.shape[-2:] != (3, 3):
        raise ValueError(f"expected (..., 3, 3); got {R.shape}")
    return np.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1).astype(
        np.float32
    )


def rot6d_to_matrix(r6: np.ndarray) -> np.ndarray:
    """Gram-Schmidt decode; raises on degenerate input (|r1| or |r2_perp|
    underflow), matching the reference's strict variant."""
    r6 = np.asarray(r6, np.float64)
    if r6.shape[-1] != 6:
        raise ValueError(f"expected trailing dim 6; got {r6.shape}")
    r1, r2 = r6[..., :3], r6[..., 3:]
    n1 = np.linalg.norm(r1, axis=-1, keepdims=True)
    if np.any(n1 < 1e-8):
        raise ValueError("rot6d_to_matrix: |r1| underflow")
    b1 = r1 / n1
    r2p = r2 - np.sum(b1 * r2, axis=-1, keepdims=True) * b1
    n2 = np.linalg.norm(r2p, axis=-1, keepdims=True)
    if np.any(n2 < 1e-8):
        raise ValueError("rot6d_to_matrix: |r2_perp| underflow (collinear)")
    b2 = r2p / n2
    b3 = np.cross(b1, b2, axis=-1)
    return np.stack([b1, b2, b3], axis=-1).astype(np.float32)


def quat_xyzw_to_rot6d(q: np.ndarray) -> np.ndarray:
    return matrix_to_rot6d(quat_xyzw_to_matrix(q))


def rot6d_to_quat_xyzw(r6: np.ndarray) -> np.ndarray:
    return matrix_to_quat_xyzw(rot6d_to_matrix(r6))


def rot6d_to_quat_xyzw_safe(r6: np.ndarray) -> np.ndarray:
    """Degenerate inputs fall back to identity instead of raising."""
    try:
        return rot6d_to_quat_xyzw(r6)
    except ValueError:
        r6 = np.asarray(r6, np.float32)
        out = np.zeros(r6.shape[:-1] + (4,), np.float32)
        out[..., 3] = 1.0
        return out


def pose_to_SE3(pos: np.ndarray, quat_xyzw: np.ndarray) -> np.ndarray:
    """(pos [..., 3], quat [..., 4]) -> [..., 4, 4]."""
    pos = np.asarray(pos, np.float32)
    T = np.zeros(pos.shape[:-1] + (4, 4), np.float32)
    T[..., :3, :3] = quat_xyzw_to_matrix(quat_xyzw)
    T[..., :3, 3] = pos
    T[..., 3, 3] = 1.0
    return T


def SE3_to_pose(T: np.ndarray):
    T = np.asarray(T)
    return T[..., :3, 3].astype(np.float32), matrix_to_quat_xyzw(T[..., :3, :3])


def _inv_SE3(T: np.ndarray) -> np.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = np.swapaxes(R, -1, -2)
    out = np.zeros_like(T)
    out[..., :3, :3] = Rt
    out[..., :3, 3:] = -Rt @ t
    out[..., 3, 3] = 1.0
    return out


def se3_body_delta(T_state: np.ndarray, T_abs: np.ndarray) -> np.ndarray:
    """Body-frame delta: T_delta = inv(T_state) @ T_abs."""
    return (_inv_SE3(T_state) @ T_abs).astype(np.float32)


def se3_body_compose(T_state: np.ndarray, T_delta: np.ndarray) -> np.ndarray:
    """Inverse of ``se3_body_delta``: T_abs = T_state @ T_delta."""
    return (np.asarray(T_state) @ np.asarray(T_delta)).astype(np.float32)
