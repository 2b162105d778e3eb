"""Learning-rate and temperature schedules.

Reference parity:
- inverse_sqrt_schedule <- modules/scheduler/inv_sqrt.py:5-16 (constant base
  LR through `warmup_steps`, then base * sqrt(warmup / step)).
- TemperatureScheduler  <- distributions/gumbel.py:23-43 (exponential anneal;
  defined in the reference but unused by its trainers, which hard-code
  t=0.2 / 1.0 — we keep it available for parity).
"""

from __future__ import annotations

import math


def inverse_sqrt_schedule(base_lr: float, warmup_steps: int):
    """Returns an optax-compatible schedule fn of the update count.

    The torch scheduler sets the LR used by update i (0-based) from
    step = i + 1: base for step <= warmup, else base * sqrt(warmup/step).
    """

    def schedule(count):
        import jax.numpy as jnp

        step = count + 1
        scale = jnp.where(
            step <= warmup_steps,
            1.0,
            jnp.sqrt(warmup_steps / jnp.maximum(step, 1)),
        )
        return base_lr * scale

    return schedule


class TemperatureScheduler:
    """Exponential-anneal Gumbel temperature (host-side, stateful).

    Matches distributions/gumbel.py:23-43: every `step_size` steps,
    t <- max(t * exp(-anneal_rate * iter), min_t).
    """

    def __init__(self, t0: float, min_t: float, anneal_rate: float, step_size: int):
        self.t0 = t0
        self.min_t = min_t
        self.anneal_rate = anneal_rate
        self.step_size = step_size
        self.t = t0

    def update_t(self, iteration: int) -> None:
        if iteration % self.step_size == self.step_size - 1:
            self.t = max(self.t * math.exp(-self.anneal_rate * iteration), self.min_t)

    def get_t(self, iteration: int) -> float:
        self.update_t(iteration)
        return self.t


def gumbel_temperature_at(step, t0: float, min_t: float, anneal_rate: float, step_size: int):
    """Closed form of TemperatureScheduler.get_t called sequentially for
    every iteration up to `step` — a pure function of step, so it runs
    INSIDE jit/lax.scan (the host-stateful class forces per-step dispatch).

    By `step`, n = (step+1)//step_size updates have fired, at iterations
    j*step_size - 1 (j=1..n); their exponents sum to
    step_size*n(n+1)/2 - n, and the clamp commutes with the monotone
    product, so t = max(t0 * exp(-rate * sum), min_t).
    """
    import jax.numpy as jnp

    n = (step + 1) // step_size
    # the exponent sum in float32: for a traced int32 `step`,
    # step_size*n*(n+1) overflows int32 within shipped budgets (e.g.
    # step_size=10 at 400k iters), flipping exp(-rate*s) to exp(+huge)
    nf = jnp.asarray(n, jnp.float32)
    s = step_size * nf * (nf + 1.0) / 2.0 - nf
    return jnp.maximum(t0 * jnp.exp(-anneal_rate * s), min_t)
