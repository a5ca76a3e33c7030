"""Quaternion / rigid-transform math (x, y, z, w convention).

jnp rebuild of the reference's ti.func library
(/root/reference/taichi_slam/taichi_transformations.py): rotation-matrix
conversion, inverse, rotation, Hamilton product, tangent-space retraction and
the lift Jacobian used to map gradients onto the quaternion tangent space.
All functions are vectorized over leading batch dims and differentiable with
``jax.grad`` (replacing Taichi's ``needs_grad`` autodiff).
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_matrix(q):
    """Unit quaternion (..., 4) [x,y,z,w] -> rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def quaternion_inverse(q):
    """Conjugate of a unit quaternion."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quaternion_multiply(a, b):
    """Hamilton product a ⊗ b, both (..., 4) [x,y,z,w]."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def quaternion_rotate(q, v):
    """Rotate vectors (..., 3) by unit quaternions (..., 4)."""
    qv = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
    out = quaternion_multiply(quaternion_multiply(q, qv),
                              quaternion_inverse(q))
    return out[..., :3]


def quaternion_retraction(q, dtheta):
    """Retract a tangent increment (..., 3) onto the unit quaternion manifold:
    q ⊞ δ = normalize(q ⊗ [δ/2, 1]) — the first-order exponential update used
    by the reference's BA (taichi_transformations.py:55-66)."""
    dq = jnp.concatenate([dtheta * 0.5, jnp.ones_like(dtheta[..., :1])],
                         axis=-1)
    out = quaternion_multiply(q, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def plus_quaternion_jacobian(q):
    """∂(q ⊞ δ)/∂δ at δ = 0: the (..., 4, 3) lift matrix 0.5·L(q) that maps
    ambient quaternion gradients to the 3-dof tangent space
    (taichi_transformations.py:31-42)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    J = jnp.stack([
        w, -z, y,
        z, w, -x,
        -y, x, w,
        -x, -y, -z,
    ], axis=-1).reshape(q.shape[:-1] + (4, 3))
    return 0.5 * J


# numpy twins for host-side pose bookkeeping -------------------------------

def quaternion_matrix_np(q):
    import numpy as np
    return np.asarray(quaternion_matrix(jnp.asarray(q, jnp.float32)))


def quaternion_from_matrix(R):
    """Rotation matrix -> quaternion [x,y,z,w] (Shepperd's method, numpy)."""
    import numpy as np
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])
