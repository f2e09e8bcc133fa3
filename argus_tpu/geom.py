"""SE(3) / se(3) / quaternion math in pure JAX, plus host-side pose-convention converters.

Replaces the reference's pypose dependency and the converters in `argus/utils.py`:
  * quaternion order swaps          (reference: argus/utils.py:110-145)
  * MJPC <-> Unity frame converters (reference: argus/utils.py:16-107)
  * se(3) Exp / SE(3) Log / compose / inverse used by the geodesic loss
    (reference: argus/train.py:105-119 via pypose)

Conventions (identical to pypose, which the reference uses):
  * Quaternions are stored in **xyzw** order; the scalar part is last.
  * SE(3) elements are 7-vectors ``[tx, ty, tz, qx, qy, qz, qw]``.
  * se(3) tangent vectors are 6-vectors ``[rho(3), phi(3)]`` — translation tangent
    first, rotation tangent last.
  * ``se3_exp`` uses the full SE(3) exponential: ``t = J_l(phi) @ rho``,
    ``q = so3_exp(phi)`` (the left Jacobian, not the naive "quat+trans" map).

Everything here is batched over arbitrary leading dims, differentiable, and safe under
jit (Taylor-series branches via `jnp.where` with safe denominators instead of Python
control flow).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Small-angle crossover for Taylor expansions. float32 eps ~ 1.2e-7; theta^2 below
# ~1e-3 is where the closed forms start losing precision.
_EPS = 1e-6


# ───────────────────────────── quaternion primitives ─────────────────────────────


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of xyzw quaternions, batched over leading dims."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions) of an xyzw quaternion."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors ``v`` (..., 3) by unit quaternions ``q`` (..., 4) xyzw.

    Uses the 2-cross-product formula: v' = v + 2 * qv x (qv x v + qw * v).
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = jnp.cross(qv, jnp.cross(qv, v) + qw * v)
    return v + 2.0 * t


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to a unit quaternion."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_canonical(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the scalar (w) component is non-negative."""
    return jnp.where(q[..., 3:4] < 0.0, -q, q)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) rotation-vector -> xyzw unit quaternion (half-angle map).

    q_xyz = phi * sin(|phi|/2)/|phi|, q_w = cos(|phi|/2); Taylor near 0.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < _EPS
    # grad-safe: never take sqrt of ~0 on a path autodiff will differentiate
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    half = 0.5 * theta
    # sin(theta/2)/theta  ->  1/2 - theta^2/48 + theta^4/3840
    sinc_half = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_sq * theta_sq / 3840.0,
        jnp.sin(half) / theta,
    )
    # cos(theta/2)  ->  1 - theta^2/8 + theta^4/384
    qw = jnp.where(
        small,
        1.0 - theta_sq / 8.0 + theta_sq * theta_sq / 384.0,
        jnp.cos(half),
    )
    return jnp.concatenate([phi * sinc_half, qw], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw unit quaternion -> so(3) rotation vector (angle in (-pi, pi])."""
    q = quat_canonical(q)  # ensure w >= 0 so the angle is the short way around
    qv = q[..., :3]
    qw = q[..., 3:4]
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    # scale = 2 * atan2(n, w) / n ;  n -> 0 Taylor: 2/w * (1 - n^2/(3 w^2)).
    # sqrt of the guarded value keeps gradients finite at n = 0.
    small = n_sq < _EPS
    safe_n = jnp.sqrt(jnp.where(small, 1.0, n_sq))
    scale = jnp.where(
        small,
        2.0 / qw - 2.0 * n_sq / (3.0 * qw**3),
        2.0 * jnp.arctan2(safe_n, qw) / safe_n,
    )
    return qv * scale


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _jacobian_coeff_AB(phi: jnp.ndarray):
    """Left-Jacobian coefficients A = (1-cos t)/t^2, B = (t-sin t)/t^3, Taylor near 0.

    Returns (A, B) with a trailing keepdim for broadcasting against (..., 3) vectors.
    All intermediates use grad-safe denominators (the untaken `where` branch never
    sees a zero/negative sqrt, which would poison gradients).
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    A = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    B = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (safe_sq * theta))
    return A, B


def _jacobian_coeff_C(phi: jnp.ndarray):
    """Inverse-left-Jacobian coefficient C = 1/t^2 - (1+cos t)/(2 t sin t), Taylor near 0."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    sin_t = jnp.sin(theta)
    # near t=pi, (1 + cos t) -> 0 along with sin t; the ratio stays finite.
    safe_sin = jnp.where(jnp.abs(sin_t) < 1e-20, 1e-20, sin_t)
    C = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        1.0 / safe_sq - (1.0 + jnp.cos(theta)) / (2.0 * theta * safe_sin),
    )
    return C


def so3_left_jacobian_apply(phi: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """J_l(phi) @ v without forming the matrix: v + A (phi x v) + B phi x (phi x v).

    The vector form avoids 3x3 matmuls, which XLA may run at reduced precision on
    some backends, and is cheaper on the VPU anyway.
    """
    A, B = _jacobian_coeff_AB(phi)
    pv = jnp.cross(phi, v)
    ppv = jnp.cross(phi, pv)
    return v + A * pv + B * ppv


def so3_left_jacobian_inv_apply(phi: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """J_l(phi)^-1 @ v without forming the matrix: v - 1/2 (phi x v) + C phi x (phi x v)."""
    C = _jacobian_coeff_C(phi)
    pv = jnp.cross(phi, v)
    ppv = jnp.cross(phi, pv)
    return v - 0.5 * pv + C * ppv


def _outer_minus_thetasq(phi: jnp.ndarray) -> jnp.ndarray:
    """[phi]x^2 computed exactly as outer(phi, phi) - |phi|^2 I (no matmul)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    outer = phi[..., :, None] * phi[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), outer.shape)
    return outer - theta_sq * eye


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3) as a (..., 3, 3) matrix: J_l = I + A [phi]x + B [phi]x^2."""
    A, B = _jacobian_coeff_AB(phi)
    K = _skew(phi)
    KK = _outer_minus_thetasq(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + A[..., None] * K + B[..., None] * KK


def so3_left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian as a (..., 3, 3) matrix: J_l^-1 = I - 1/2 [phi]x + C [phi]x^2."""
    C = _jacobian_coeff_C(phi)
    K = _skew(phi)
    KK = _outer_minus_thetasq(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + C[..., None] * KK


# ───────────────────────────── SE(3) group operations ─────────────────────────────


def se3_exp(tau: jnp.ndarray) -> jnp.ndarray:
    """se(3) 6-vector [rho, phi] -> SE(3) 7-vector [t, q_xyzw].

    Matches pypose `pp.se3(tau).Exp()`: t = J_l(phi) @ rho, q = so3_exp(phi).
    (reference usage: argus/train.py:119, argus/utils.py:189)
    """
    rho = tau[..., :3]
    phi = tau[..., 3:6]
    t = so3_left_jacobian_apply(phi, rho)
    q = so3_exp(phi)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(pose: jnp.ndarray) -> jnp.ndarray:
    """SE(3) 7-vector [t, q_xyzw] -> se(3) 6-vector [rho, phi].

    Matches pypose `pose.Log()`: phi = so3_log(q), rho = J_l(phi)^-1 @ t.
    """
    t = pose[..., :3]
    q = pose[..., 3:7]
    phi = so3_log(q)
    rho = so3_left_jacobian_inv_apply(phi, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose SE(3) 7-vectors: a . b (matches pypose `a @ b`)."""
    t = a[..., :3] + quat_rotate(a[..., 3:7], b[..., :3])
    q = quat_multiply(a[..., 3:7], b[..., 3:7])
    return jnp.concatenate([t, q], axis=-1)


def se3_inverse(pose: jnp.ndarray) -> jnp.ndarray:
    """Inverse of an SE(3) 7-vector (matches pypose `pose.Inv()`)."""
    q_inv = quat_conjugate(pose[..., 3:7])
    t_inv = -quat_rotate(q_inv, pose[..., :3])
    return jnp.concatenate([t_inv, q_inv], axis=-1)


def se3_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """SE(3) 7-vector -> (..., 4, 4) homogeneous matrix (pypose `pose.matrix()`)."""
    q = pose[..., 3:7]
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    top = jnp.concatenate([R, pose[..., :3, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> xyzw unit quaternion (branchless Shepperd).

    Computes all four candidate quaternions (one per dominant diagonal/trace case)
    and selects the numerically best with `where` — no data-dependent control flow,
    safe under jit/vmap.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates, each scaled by 4*q_k^2 >= 0 + 1 (always positive pre-sqrt)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # candidate built from w-dominant case
    w_w = safe_sqrt(qw2) / 2.0
    cand_w = jnp.stack([(m21 - m12) / (4 * w_w), (m02 - m20) / (4 * w_w), (m10 - m01) / (4 * w_w), w_w], -1)
    x_x = safe_sqrt(qx2) / 2.0
    cand_x = jnp.stack([x_x, (m01 + m10) / (4 * x_x), (m02 + m20) / (4 * x_x), (m21 - m12) / (4 * x_x)], -1)
    y_y = safe_sqrt(qy2) / 2.0
    cand_y = jnp.stack([(m01 + m10) / (4 * y_y), y_y, (m12 + m21) / (4 * y_y), (m02 - m20) / (4 * y_y)], -1)
    z_z = safe_sqrt(qz2) / 2.0
    cand_z = jnp.stack([(m02 + m20) / (4 * z_z), (m12 + m21) / (4 * z_z), z_z, (m10 - m01) / (4 * z_z)], -1)

    scores = jnp.stack([qx2, qy2, qz2, qw2], -1)
    best = jnp.argmax(scores, axis=-1)[..., None]
    q = jnp.where(
        best == 3,
        cand_w,
        jnp.where(best == 0, cand_x, jnp.where(best == 1, cand_y, cand_z)),
    )
    return quat_canonical(quat_normalize(q))


def random_se3(key, shape=(), stdev: float = 1.0) -> jnp.ndarray:
    """Random se(3) tangent vectors ~ N(0, stdev) (pypose `pp.randn_se3`)."""
    import jax

    return stdev * jax.random.normal(key, tuple(shape) + (6,))


def random_SE3(key, shape=()) -> jnp.ndarray:
    """Random SE(3) poses = Exp of N(0,1) tangents (pypose `pp.randn_SE3`)."""
    return se3_exp(random_se3(key, shape))


def pose_errors(pred: jnp.ndarray, target: jnp.ndarray) -> tuple:
    """Interpretable pose-error metrics between (..., 7) xyzw SE(3) poses.

    Returns (rotation error in DEGREES, translation error in METERS) per pose —
    the physical quantities the estimator exists to get right, unlike the raw
    tangent-space training loss (VERDICT r1 #9: report rot/trans error, not loss).
    """
    dq = quat_multiply(pred[..., 3:], quat_conjugate(target[..., 3:]))
    dq = quat_normalize(dq)
    ang = 2.0 * jnp.arccos(jnp.clip(jnp.abs(dq[..., 3]), 0.0, 1.0))
    trans = jnp.linalg.norm(pred[..., :3] - target[..., :3], axis=-1)
    return jnp.rad2deg(ang), trans


# ───────────────────────────── quat-order swaps ─────────────────────────────
# The HDF5 dataset stores cube poses with wxyz quats; the model/loss pipeline uses
# xyzw (reference: argus/utils.py:110-145, argus/data.py:184-185).


def xyzwxyz_to_xyzxyzw_SE3(xyzwxyz):
    """(x,y,z, qw,qx,qy,qz) -> (x,y,z, qx,qy,qz,qw). Works on jnp or np arrays."""
    xp = jnp if isinstance(xyzwxyz, jnp.ndarray) else np
    return xp.concatenate(
        [xyzwxyz[..., :3], xyzwxyz[..., -3:], xyzwxyz[..., -4:-3]], axis=-1
    )


def xyzxyzw_to_xyzwxyz_SE3(xyzxyzw):
    """(x,y,z, qx,qy,qz,qw) -> (x,y,z, qw,qx,qy,qz). Works on jnp or np arrays."""
    xp = jnp if isinstance(xyzxyzw, jnp.ndarray) else np
    return xp.concatenate(
        [xyzxyzw[..., :3], xyzxyzw[..., -1:], xyzxyzw[..., -4:-1]], axis=-1
    )


# ───────────────────────────── MJPC <-> Unity converters ─────────────────────────────
# Host-side (numpy) frame converters between MuJoCo's z-up right-handed wxyz convention
# and Unity's y-up left-handed xyzw convention (reference: argus/utils.py:16-107).


def convert_pose_mjpc_to_unity(pose_mjpc: np.ndarray) -> np.ndarray:
    """MJPC pose (..., 7) wxyz -> Unity pose (..., 7) xyzw.

    Translation goes through the improper rotation (axis remap + handedness flip);
    the quaternion gets the matching axis remap and angle-sign flips, returned with
    non-negative w. (reference: argus/utils.py:16-57)
    """
    R_m2u = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    trans_unity = (R_m2u @ pose_mjpc[..., :3, None]).squeeze(-1)

    q_wxyz = pose_mjpc[..., 3:]
    q_xyzw = np.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)
    quat_unity = np.concatenate(
        [
            -q_xyzw[..., 1:2],  # mjpc y-rotation is unity -x-rotation
            q_xyzw[..., 2:3],  # mjpc z-rotation is unity y-rotation
            q_xyzw[..., 0:1],  # mjpc x-rotation is unity x-rotation
            -q_xyzw[..., 3:4],  # flip angle sign: right- to left-handed frames
        ],
        axis=-1,
    )
    neg_w = quat_unity[..., 3] < 0
    quat_unity[neg_w] = -quat_unity[neg_w]
    return np.concatenate([trans_unity, quat_unity], axis=-1)


def convert_pose_unity_to_mjpc(pose_unity: np.ndarray) -> np.ndarray:
    """Unity pose (..., 7) xyzw -> MJPC pose (..., 7) wxyz. Inverse of the above.

    (reference: argus/utils.py:60-97)
    """
    R_u2m = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    trans_mjpc = (R_u2m @ pose_unity[..., :3, None]).squeeze(-1)

    q_xyzw = pose_unity[..., 3:]
    q_wxyz = np.concatenate([q_xyzw[..., -1:], q_xyzw[..., :-1]], axis=-1)
    quat_mjpc = np.concatenate(
        [
            -q_wxyz[..., 0:1],  # flip angle sign: left- to right-handed frames
            q_wxyz[..., 3:4],  # unity z-rotation is mjpc x-rotation
            -q_wxyz[..., 1:2],  # unity x-rotation is mjpc -y-rotation
            q_wxyz[..., 2:3],  # unity y-rotation is mjpc z-rotation
        ],
        axis=-1,
    )
    neg_w = quat_mjpc[..., 0] < 0
    quat_mjpc[neg_w] = -quat_mjpc[neg_w]
    return np.concatenate([trans_mjpc, quat_mjpc], axis=-1)


def convert_unity_quat_to_euler(quat: np.ndarray) -> np.ndarray:
    """Unity xyzw quaternion -> intrinsic XYZ Euler angles in degrees.

    Debug helper for comparing against the Unity editor inspector
    (reference: argus/utils.py:100-107).
    """
    from scipy.spatial.transform import Rotation as R

    return R.from_quat(quat).as_euler("XYZ", degrees=True)
