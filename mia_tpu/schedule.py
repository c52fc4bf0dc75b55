"""LR schedules and consistency ramp-ups as pure functions of step.

Parity targets:
- ``PolyLRScheduler`` (reference ``src/scheduler/lr_scheduler.py:6-55``):
  linear warmup ``lr*(i+1)/warmup`` then poly decay
  ``lr*(1 - i/(max-warmup))**0.9``, with step indices quantized by
  ``interval`` (both warmup and max are pre-divided by the interval).
- ``SigmoidRampUp`` / ``LinearRampUp`` (``src/scheduler/ramps.py:14-70``).

All return ``step -> value`` callables usable as optax schedules or inside
jit (inputs may be traced integers). Called with a plain Python/numpy step
(the trainers' per-iteration logging path) they evaluate in NUMPY — an
eager jnp evaluation would dispatch device ops and a D2H sync per
iteration, which on a TPU tunnel costs more than the train step itself.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _xp(step):
    """numpy for host scalars, jnp for arrays/tracers."""
    return np if isinstance(step, (int, float, np.integer, np.floating)) else jnp


def poly_warmup_schedule(
    initial_lr: float,
    max_steps: int,
    warmup_steps: int = 0,
    exponent: float = 0.9,
    interval: int = 1,
):
    adj_warmup = warmup_steps // interval
    adj_max = max_steps // interval

    def schedule(step):
        xp = _xp(step)
        i = xp.asarray(step) // interval
        warm = initial_lr * (i + 1) / max(adj_warmup, 1)
        j = i - adj_warmup
        real_max = max(adj_max - adj_warmup, 1)
        frac = xp.clip(1.0 - j / real_max, 0.0, 1.0)
        decay = initial_lr * frac**exponent
        if adj_warmup <= 0:
            return decay
        return xp.where(i < adj_warmup, warm, decay)

    return schedule


def sigmoid_ramp_up(
    final_value: float,
    max_steps: int,
    interval: int = 1,
    exponent: float = 5.0,
):
    """``final * exp(-exponent * (1 - t)^2)`` with interval quantization."""
    adj_max = max_steps // interval

    def schedule(step):
        xp = _xp(step)
        if adj_max == 0:
            return xp.asarray(final_value, jnp.float32)
        i = xp.clip(xp.asarray(step) // interval, 0, adj_max)
        phase = 1.0 - i / adj_max
        return final_value * xp.exp(-exponent * phase**2)

    return schedule


def linear_ramp_up(final_value: float, max_steps: int, interval: int = 1):
    adj_max = max_steps // interval

    def schedule(step):
        xp = _xp(step)
        if adj_max == 0:
            return xp.asarray(final_value, jnp.float32)
        i = xp.clip(xp.asarray(step) // interval, 0, adj_max)
        return final_value * i / adj_max

    return schedule
