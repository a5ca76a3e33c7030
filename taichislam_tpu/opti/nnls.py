"""Nonlinear least squares on jax.grad.

Role-equivalent of the reference's TaichiNNLS scaffold
(/root/reference/taichi_slam/taichi_opti/taichi_nnls.py): named parameter
blocks packed into one flat vector, cost functions referencing blocks by
name, loss + gradient evaluation — but where the reference stops at autodiff
plumbing ("in development", no solver loop), this one ships working solvers:
plain gradient descent and a damped Gauss–Newton (Levenberg–Marquardt) using
``jax.jacfwd`` residual Jacobians.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class CostFunction:
    """A residual term over named parameter blocks.

    ``residual_fn(*blocks) -> residual array``; the squared L2 norm of all
    residuals is the NNLS objective (taichi_nnls.py:8-35 keeps indices into
    the packed vector; we keep names and slice functionally).
    """

    def __init__(self, residual_fn: Callable, param_names: List[str]):
        self.residual_fn = residual_fn
        self.param_names = list(param_names)


class NNLS:
    def __init__(self):
        self.blocks: Dict[str, jnp.ndarray] = {}
        self.costs: List[CostFunction] = []
        self._packed = None
        self._layout = None

    # -- parameter blocks ---------------------------------------------------
    def add_parameter_block(self, name: str, value):
        self.blocks[name] = jnp.asarray(value, jnp.float32)

    def add_cost_function(self, cost: CostFunction):
        self.costs.append(cost)

    # -- packing (pre_solve, taichi_nnls.py:37-72) ---------------------------
    def pre_solve(self):
        layout = {}
        off = 0
        for name, v in self.blocks.items():
            layout[name] = (off, v.shape)
            off += int(np.prod(v.shape))
        self._layout = layout
        self._packed = jnp.concatenate(
            [v.reshape(-1) for v in self.blocks.values()]) if self.blocks \
            else jnp.zeros((0,))
        return self._packed

    def _unpack(self, x):
        out = {}
        for name, (off, shape) in self._layout.items():
            n = int(np.prod(shape))
            out[name] = jax.lax.dynamic_slice(x, (off,), (n,)).reshape(shape)
        return out

    # -- objective ----------------------------------------------------------
    def residuals(self, x):
        blocks = self._unpack(x)
        res = [c.residual_fn(*[blocks[n] for n in c.param_names]).reshape(-1)
               for c in self.costs]
        return jnp.concatenate(res) if res else jnp.zeros((0,))

    def loss(self, x):
        r = self.residuals(x)
        return 0.5 * jnp.sum(r * r)

    def evaluate_test(self):
        """Loss + gradient at the current packed params
        (taichi_nnls.py:86-96's evaluate + kernel.grad())."""
        if self._packed is None:
            self.pre_solve()
        val, grad = jax.value_and_grad(self.loss)(self._packed)
        return float(val), np.asarray(grad)

    # -- solvers (beyond the reference) --------------------------------------
    def solve(self, iters: int = 100, lr: float = 1e-2):
        """Plain gradient descent, jitted, returns final blocks dict."""
        if self._packed is None:
            self.pre_solve()
        loss = self.loss

        @jax.jit
        def run(x0):
            def body(_, x):
                return x - lr * jax.grad(loss)(x)
            return jax.lax.fori_loop(0, iters, body, x0)

        self._packed = run(self._packed)
        return {n: np.asarray(v) for n, v in
                self._unpack(self._packed).items()}

    def solve_lm(self, iters: int = 20, damping: float = 1e-3):
        """Damped Gauss–Newton (LM) for small problems: J from jax.jacfwd,
        normal equations solved densely."""
        if self._packed is None:
            self.pre_solve()
        res_fn = self.residuals

        @jax.jit
        def step(x, lam):
            r = res_fn(x)
            J = jax.jacfwd(res_fn)(x)
            H = J.T @ J + lam * jnp.eye(x.shape[0])
            g = J.T @ r
            dx = jnp.linalg.solve(H, g)
            return x - dx, 0.5 * jnp.sum(r * r)

        x = self._packed
        lam = damping
        prev = float("inf")
        for _ in range(iters):
            x_new, f = step(x, lam)
            f = float(f)
            if f < prev:
                x, prev, lam = x_new, f, max(lam * 0.5, 1e-9)
            else:
                lam = min(lam * 4.0, 1e6)
        self._packed = x
        return {n: np.asarray(v) for n, v in self._unpack(x).items()}


# reference-compatible alias
TaichiNNLS = NNLS
