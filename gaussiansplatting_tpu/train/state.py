"""Full training state pytree: parameters + Adam moments + density-control
accumulators + iteration counter + PRNG key.

The reference has no such object — state is scattered across Metal buffers
(optimizer.mm:34-60, density_control.mm:92-101) — but collecting it in one
pytree makes checkpoints complete (params + m/v + step + accumulators,
SURVEY.md §5 checkpoint row) and the train step a pure function.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from gaussiansplatting_tpu.core.gaussians import GaussianParams
from gaussiansplatting_tpu.density.control import DensityAccum, init_accum
from gaussiansplatting_tpu.train.optimizer import AdamState, init_state


@flax.struct.dataclass
class TrainState:
    params: GaussianParams
    opt: AdamState
    accum: DensityAccum
    key: jax.Array

    @property
    def iteration(self) -> jnp.ndarray:
        """Completed optimizer steps (== Adam timestep, optimizer.mm:251)."""
        return self.opt.t


def create(params: GaussianParams, seed: int = 0) -> TrainState:
    return TrainState(
        params=params,
        opt=init_state(params),
        accum=init_accum(params.capacity),
        key=jax.random.PRNGKey(seed),
    )
