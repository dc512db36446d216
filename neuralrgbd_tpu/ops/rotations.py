"""Rotation parameterizations and pose algebra.

The pose-free pipeline optimizes camera rotations in the reference's
"unit-quaternion xyz chart" — a rational (stereographic-like) 3-parameter
chart of SO(3) with no trig, so it is smooth and cheap to differentiate
through (``mutils/misc.py:404-502``). Quaternions follow the TUM layout
``[qx, qy, qz, qw]`` everywhere (DSO's result.txt uses it too).

All functions are jnp, jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rotation(q: jax.Array) -> jax.Array:
    """TUM quaternion [qx, qy, qz, qw] -> 3x3 rotation.

    Includes the 1/|q|^2 normalization of the reference
    (``quaternion2Rotation``, mutils/misc.py:295-336), so non-unit inputs are
    handled identically.
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = 1.0 / (w * w + x * x + y * y + z * z)
    r00 = 1 - 2 * s * (y * y + z * z)
    r11 = 1 - 2 * s * (x * x + z * z)
    r22 = 1 - 2 * s * (x * x + y * y)
    # NOTE: parity with the reference, which scales the diagonal by s but
    # leaves the off-diagonal terms unscaled (exact only for unit q).
    r01 = 2 * (x * y - w * z)
    r10 = 2 * (x * y + w * z)
    r02 = 2 * (x * z + w * y)
    r20 = 2 * (x * z - w * y)
    r12 = 2 * (y * z - w * x)
    r21 = 2 * (y * z + w * x)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotation_to_quat(R: jax.Array) -> jax.Array:
    """3x3 rotation -> TUM quaternion [qx, qy, qz, qw], numerically stable.

    (The reference's ``Rotation2Quaternion`` has copy-paste bugs in its
    non-primary branches — mutils/misc.py:384-402 reuses ``quat[0]`` before
    assignment; we use the standard stable 4-branch form instead.)
    """
    tr = R[0, 0] + R[1, 1] + R[2, 2]

    def case_w(_):
        w = 0.5 * jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12))
        s = 0.25 / w
        return jnp.array(
            [s * (R[2, 1] - R[1, 2]), s * (R[0, 2] - R[2, 0]),
             s * (R[1, 0] - R[0, 1]), w]
        )

    def case_x(_):
        x = 0.5 * jnp.sqrt(jnp.maximum(1.0 + R[0, 0] - R[1, 1] - R[2, 2], 1e-12))
        s = 0.25 / x
        return jnp.array(
            [x, s * (R[0, 1] + R[1, 0]), s * (R[0, 2] + R[2, 0]),
             s * (R[2, 1] - R[1, 2])]
        )

    def case_y(_):
        y = 0.5 * jnp.sqrt(jnp.maximum(1.0 - R[0, 0] + R[1, 1] - R[2, 2], 1e-12))
        s = 0.25 / y
        return jnp.array(
            [s * (R[0, 1] + R[1, 0]), y, s * (R[1, 2] + R[2, 1]),
             s * (R[0, 2] - R[2, 0])]
        )

    def case_z(_):
        z = 0.5 * jnp.sqrt(jnp.maximum(1.0 - R[0, 0] - R[1, 1] + R[2, 2], 1e-12))
        s = 0.25 / z
        return jnp.array(
            [s * (R[0, 2] + R[2, 0]), s * (R[1, 2] + R[2, 1]), z,
             s * (R[1, 0] - R[0, 1])]
        )

    cands = jnp.array([tr, R[0, 0], R[1, 1], R[2, 2]])
    idx = jnp.argmax(cands)
    return jax.lax.switch(idx, [case_w, case_x, case_y, case_z], None)


def unitq_to_quat(uq: jax.Array) -> jax.Array:
    """xyz chart -> TUM quaternion (``unitQ_to_quat``, mutils/misc.py:459-471)."""
    x, y, z = uq[..., 0], uq[..., 1], uq[..., 2]
    a = x * x + y * y + z * z
    inv = 1.0 / (a + 1.0)
    qw = 2 * x * inv
    qx = 2 * y * inv
    qy = 2 * z * inv
    qz = (1 - a) * inv
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def quat_to_unitq(q: jax.Array) -> jax.Array:
    """TUM quaternion -> xyz chart (``quat_to_unitQ``, mutils/misc.py:487-502)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    a = (1 - qz) / (1 + qz)
    h = (a + 1.0) * 0.5
    return jnp.stack([qw * h, qx * h, qy * h], axis=-1)


def unitq_to_rotation(uq: jax.Array) -> jax.Array:
    """xyz chart -> rotation matrix (differentiable; used by LBA)."""
    return quat_to_rotation(unitq_to_quat(uq))


def rotation_to_unitq(R: jax.Array) -> jax.Array:
    return quat_to_unitq(rotation_to_quat(R))


def rel_extrinsics(ext_ref: jax.Array, ext_src: jax.Array) -> jax.Array:
    """Extrinsic matrix from ref view to src view: ext_src @ inv(ext_ref)
    (``get_rel_extrinsicM``, homography.py:904-906)."""
    return ext_src @ jnp.linalg.inv(ext_ref)


def add_pose_noise(key: jax.Array, poses: jax.Array, noise_level: float) -> jax.Array:
    """Training-time pose-noise augmentation (``add_noise2pose``,
    train_KVNet.py:39-69): Gaussian noise scaled by the norm, applied to R in
    the unit-quaternion chart and to t in raw space.

    poses: (..., 4, 4) relative extrinsics. Returns same shape.
    """
    flat = poses.reshape(-1, 4, 4)
    keys = jax.random.split(key, flat.shape[0] * 2).reshape(flat.shape[0], 2, -1)

    def one(pose, ks):
        r = rotation_to_unitq(pose[:3, :3])
        t = pose[:3, 3]
        r = r + jax.random.normal(ks[0], (3,)) * (noise_level * jnp.linalg.norm(r))
        t = t + jax.random.normal(ks[1], (3,)) * (noise_level * jnp.linalg.norm(t))
        out = jnp.eye(4, dtype=pose.dtype)
        out = out.at[:3, :3].set(unitq_to_rotation(r))
        out = out.at[:3, 3].set(t)
        return out

    return jax.vmap(one)(flat, keys).reshape(poses.shape)
