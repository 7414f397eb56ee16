"""Optimizer: momentum SGD with staircase exponential LR decay.

Matches the reference training rule (``src/tf_aerial_images.py:112-122``):
``lr * 0.95^floor(step/1000)`` staircase schedule into a MomentumOptimizer
(accumulator v = m*v + g; p -= lr*v), implemented with optax.
"""

from __future__ import annotations

import optax


def learning_rate_schedule(lr: float, transition_steps: int = 1000,
                           decay_rate: float = 0.95,
                           staircase: bool = True) -> optax.Schedule:
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=transition_steps,
        decay_rate=decay_rate,
        staircase=staircase,
    )


def make_optimizer(lr: float, momentum: float = 0.9) -> optax.GradientTransformation:
    """TF-1 MomentumOptimizer semantics: LR applied after the momentum trace."""
    schedule = learning_rate_schedule(lr)
    return optax.chain(
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),  # also flips sign for descent
    )
