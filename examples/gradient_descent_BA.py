#!/usr/bin/env python
"""Bundle-adjustment demo: gradient descent with quaternion retraction.

Rebuild of /root/reference/scripts/simple_gradient_descent_BA.py on
``jax.grad`` (replacing Taichi's ``needs_grad`` autodiff): a synthetic scene
of camera poses + landmarks + reprojection observations, optimized by
manifold gradient descent (quaternions updated through the tangent-space
retraction), plus a ``benchmark()`` timing harness like the reference's
(simple_gradient_descent_BA.py:182-191).
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, ".")

from taichislam_tpu.opti import transformations as tf


def make_scene(n_cams=8, n_pts=200, pix_noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, size=(n_pts, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    qs, ts = [], []
    for i in range(n_cams):
        axis = rng.normal(size=3) * 0.05
        q = np.concatenate([axis, [1.0]])
        qs.append(q / np.linalg.norm(q))
        ts.append(rng.normal(scale=0.3, size=3))
    qs = np.asarray(qs, np.float32)
    ts = np.asarray(ts, np.float32)

    obs = project(jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(pts))
    obs = np.asarray(obs) + rng.normal(scale=pix_noise, size=obs.shape)
    return qs, ts, pts, jnp.asarray(obs, jnp.float32)


def project(qs, ts, pts):
    """Reproject all landmarks into all cameras: (C, P, 2)."""
    p_cam = tf.quaternion_rotate(qs[:, None, :],
                                 pts[None, :, :] - ts[:, None, :])
    return p_cam[..., :2] / jnp.maximum(p_cam[..., 2:3], 1e-3)


def reprojection_loss(qs, ts, pts, obs):
    r = project(qs, ts, pts) - obs
    return 0.5 * jnp.sum(r * r)


def gradient_descent(qs, ts, pts, obs, iters=200, lr_q=1e-4, lr_t=1e-4):
    """Manifold GD: translation step + quaternion tangent retraction
    (the reference's scheme, simple_gradient_descent_BA.py:173-180)."""

    @jax.jit
    def step(qs, ts):
        loss, (gq, gt) = jax.value_and_grad(
            reprojection_loss, argnums=(0, 1))(qs, ts, pts, obs)
        # lift ambient quaternion grads to the tangent space
        J = tf.plus_quaternion_jacobian(qs)            # (C, 4, 3)
        dtheta = jnp.einsum("cij,ci->cj", J, gq)       # (C, 3)
        qs = tf.quaternion_retraction(qs, -lr_q * dtheta)
        ts = ts - lr_t * gt
        return qs, ts, loss

    losses = []
    for _ in range(iters):
        qs, ts, loss = step(qs, ts)
        losses.append(float(loss))
    return qs, ts, losses


def benchmark(iters=1000):
    qs, ts, pts, obs = make_scene()
    qs0 = jnp.asarray(qs)
    ts0 = jnp.asarray(ts) + 0.05
    ptsj = jnp.asarray(pts)

    @jax.jit
    def step(qs, ts):
        loss, (gq, gt) = jax.value_and_grad(
            reprojection_loss, argnums=(0, 1))(qs, ts, ptsj, obs)
        return loss

    float(step(qs0, ts0))  # compile
    s = time.time()
    for _ in range(iters):
        loss = step(qs0, ts0)
    float(loss)
    print(f"BA gradient step: {(time.time()-s)*1000/iters:.3f} ms/iter "
          f"({iters} iters)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--benchmark", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.benchmark:
        benchmark()
        return

    qs, ts, pts, obs = make_scene()
    # perturb the initial guess
    rng = np.random.default_rng(1)
    qs_init = jnp.asarray(qs + rng.normal(scale=0.01, size=qs.shape)
                          .astype(np.float32))
    qs_init = qs_init / jnp.linalg.norm(qs_init, axis=-1, keepdims=True)
    ts_init = jnp.asarray(ts + rng.normal(scale=0.05, size=ts.shape)
                          .astype(np.float32))

    loss0 = float(reprojection_loss(qs_init, ts_init, jnp.asarray(pts), obs))
    qs_f, ts_f, losses = gradient_descent(qs_init, ts_init, jnp.asarray(pts),
                                          obs, iters=args.iters)
    print(f"loss: {loss0:.6f} -> {losses[-1]:.6f} "
          f"({args.iters} iterations)")
    assert losses[-1] < loss0 * 0.05, "BA failed to converge"
    print("BA demo OK")


if __name__ == "__main__":
    main()
