"""First-order descent with LR decay + elementwise gradient clipping.

Jitted port of the reference optimizer semantics (GradientDescent,
/root/reference/src/optimization/gradient_descent.cc:18-33): per iteration,
clip each gradient component into [min_clip, max_clip], take a step, decay
the learning rate. Gradients come from autodiff instead of the reference's
hand-written LossFunction::eval.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gradient_descent(
    loss_fn: Callable,
    x0,
    num_iters: int,
    learning_rate: float,
    learning_rate_decay: float = 1.0,
    min_gradient_clip: float = -10.0,
    max_gradient_clip: float = 10.0,
):
    """Returns the final parameter vector after ``num_iters`` steps."""
    x0 = jnp.asarray(x0)
    grad_fn = jax.grad(loss_fn)

    def step(state, _):
        x, lr = state
        g = jnp.clip(grad_fn(x), min_gradient_clip, max_gradient_clip)
        return (x - lr * g, lr * learning_rate_decay), None

    (x, _), _ = jax.lax.scan(
        step,
        (x0, jnp.asarray(learning_rate, x0.dtype)),
        None,
        length=int(num_iters),
    )
    return x
