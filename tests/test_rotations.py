"""Round-trip and parity tests for rotation parameterizations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.rotations import (
    add_pose_noise,
    quat_to_rotation,
    quat_to_unitq,
    rel_extrinsics,
    rotation_to_quat,
    rotation_to_unitq,
    unitq_to_quat,
    unitq_to_rotation,
)


def _random_rotation(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    if q[3] < 0:
        q = -q
    return np.asarray(quat_to_rotation(jnp.asarray(q, jnp.float32)))


def test_quat_rotation_roundtrip(rng):
    for _ in range(20):
        R = _random_rotation(rng)
        q = rotation_to_quat(jnp.asarray(R))
        R2 = np.asarray(quat_to_rotation(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_rotation_is_orthonormal(rng):
    R = _random_rotation(rng)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_unitq_chart_roundtrip(rng):
    for _ in range(20):
        uq = jnp.asarray(rng.randn(3).astype(np.float32))
        q = unitq_to_quat(uq)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(q)), 1.0, atol=1e-5)
        uq2 = quat_to_unitq(q)
        np.testing.assert_allclose(np.asarray(uq2), np.asarray(uq), atol=1e-4)


def test_unitq_rotation_roundtrip(rng):
    for _ in range(10):
        R = _random_rotation(rng)
        uq = rotation_to_unitq(jnp.asarray(R))
        R2 = np.asarray(unitq_to_rotation(uq))
        np.testing.assert_allclose(R2, R, atol=1e-4)


def test_unitq_identity():
    # identity rotation lives at unitQ = (1, 0, 0) in this chart
    R = np.asarray(unitq_to_rotation(jnp.asarray([1.0, 0.0, 0.0])))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_unitq_chart_matches_reference_formula():
    """Cross-check against the reference's unitQ_to_quat algebra
    (mutils/misc.py:459-471)."""
    uq = np.array([0.3, -0.2, 0.9], np.float32)
    x, y, z = uq
    a2 = x * x + y * y + z * z
    expect = np.array(
        [2 * y / (a2 + 1), 2 * z / (a2 + 1), (1 - a2) / (1 + a2),
         2 * x / (a2 + 1)]
    )
    got = np.asarray(unitq_to_quat(jnp.asarray(uq)))
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_rel_extrinsics():
    rng = np.random.RandomState(3)
    ext_ref = np.eye(4)
    ext_ref[:3, :3] = _random_rotation(rng)
    ext_ref[:3, 3] = rng.randn(3)
    ext_src = np.eye(4)
    ext_src[:3, :3] = _random_rotation(rng)
    ext_src[:3, 3] = rng.randn(3)
    rel = np.asarray(
        rel_extrinsics(jnp.asarray(ext_ref, jnp.float32),
                       jnp.asarray(ext_src, jnp.float32))
    )
    np.testing.assert_allclose(rel @ ext_ref, ext_src, atol=1e-4)


def test_add_pose_noise_shapes_and_zero_level(rng):
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 5, 1, 1))
    poses[..., :3, 3] = rng.randn(2, 5, 3)
    out = np.asarray(
        add_pose_noise(jax.random.PRNGKey(0), jnp.asarray(poses), 0.0)
    )
    np.testing.assert_allclose(out, poses, atol=1e-5)
    out2 = np.asarray(
        add_pose_noise(jax.random.PRNGKey(0), jnp.asarray(poses), 0.1)
    )
    assert out2.shape == poses.shape
    assert not np.allclose(out2[..., :3, 3], poses[..., :3, 3])
