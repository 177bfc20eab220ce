"""Sign-SGD optimizer as an optax-style gradient transformation.

Role of the reference's ``SignSGD`` (``auto_round/algorithms/quantization/
sign_round/sign_sgd.py:128`` — update ``param -= lr * sign(grad)`` at
``:389``), with the reference's linear LR decay folded in and a per-leaf
LR multiplier so the clip scales (``min_scale``/``max_scale``) can train at
``minmax_lr`` while rounding offsets ``v`` train at ``lr`` (reference
keeps two param groups for this).

``sign(0) == 0`` so parameters a dtype ignores (zero gradient) never move.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["SignSGDState", "sign_sgd", "linear_decay_schedule"]


class SignSGDState(NamedTuple):
    step: jax.Array
    momentum: Optional[object]  # pytree like params, or None


def linear_decay_schedule(lr: float, total_steps: int) -> Callable:
    """lr_t = lr * (1 - t / total) — the reference's LambdaLR ramp."""
    def schedule(step):
        frac = 1.0 - step.astype(jnp.float32) / max(total_steps, 1)
        return lr * jnp.maximum(frac, 0.0)
    return schedule


def sign_sgd(
    lr: float,
    total_steps: int,
    momentum: float = 0.0,
    lr_scale_fn: Optional[Callable[[str], float]] = None,
):
    """Build (init, update) for sign-SGD with linear decay.

    ``lr_scale_fn(path_leaf_name) -> float`` multiplies the LR per leaf
    (used for minmax_lr).  ``update`` returns param *deltas* to add.
    """
    schedule = linear_decay_schedule(lr, total_steps)

    def init(params):
        mom = None
        if momentum > 0.0:
            mom = jax.tree.map(jnp.zeros_like, params)
        return SignSGDState(step=jnp.zeros((), jnp.int32), momentum=mom)

    def update(grads, state, params=None):
        del params
        cur_lr = schedule(state.step)

        if state.momentum is not None:
            new_mom = jax.tree.map(
                lambda m, g: momentum * m + g, state.momentum, grads)
            eff_grads = new_mom
        else:
            new_mom = None
            eff_grads = grads

        def leaf_update(path, g):
            scale = 1.0
            if lr_scale_fn is not None:
                name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
                scale = lr_scale_fn(name)
            return -cur_lr * scale * jnp.sign(g)

        updates = jax.tree_util.tree_map_with_path(leaf_update, eff_grads)
        return updates, SignSGDState(step=state.step + 1, momentum=new_mom)

    return init, update
