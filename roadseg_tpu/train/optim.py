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


def make_optimizer(lr: float, momentum: float = 0.9,
                   decay_steps: int = 1000) -> optax.GradientTransformation:
    """TF-1 MomentumOptimizer semantics: LR applied after the momentum trace.

    ``decay_steps`` is the staircase transition length in *optimizer steps*.
    The reference always trains at batch 1, so its 1000-step staircase
    (``tf_aerial_images.py:112-122``) decays once per 1000 samples. When
    training at batch ``b``, pass ``decay_steps=1000//b`` to reproduce the
    reference's batch-1-equivalent anneal (same lr-vs-samples curve);
    leaving the default 1000 reproduces the reference's literal
    steps-based rule instead.
    """
    schedule = learning_rate_schedule(lr, transition_steps=decay_steps)
    return optax.chain(
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),  # also flips sign for descent
    )
