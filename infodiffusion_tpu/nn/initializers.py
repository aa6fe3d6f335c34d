"""Weight initializers matching the reference's init scheme.

The reference applies ``init.xavier_uniform_`` + zero bias to every
Conv2d/Linear inside each block's ``initialize()`` loop
(reference: modules.py:241-245, 303-307, 355-359), with two exceptions:

- UNet/encoder tails use xavier gain 1e-5 (reference: models.py:59,293,485).
- ``BottleneckAuxUNet.fc_a`` uses Kaiming-normal/ReLU
  (reference: models.py:385-387).

Note a reference subtlety we reproduce by construction: although
``AttnBlock.initialize`` sets its output-proj gain to 1e-5
(reference: modules.py:143), every AttnBlock in the model lives inside a
ResBlock whose own ``initialize()`` re-initializes *all* submodules with
plain xavier afterwards (reference: modules.py:241-245) — so in practice
attention projections are plain xavier, and that is what we use.
"""

from __future__ import annotations

from flax import linen as nn
from jax import numpy as jnp


def xavier_uniform(gain: float = 1.0):
    """torch ``init.xavier_uniform_(w, gain)`` equivalent (fan_avg uniform)."""
    return nn.initializers.variance_scaling(
        gain * gain, mode="fan_avg", distribution="uniform"
    )


def kaiming_normal_relu():
    """torch ``init.kaiming_normal_(w, a=0, nonlinearity='relu')``:
    std = sqrt(2/fan_in), untruncated normal."""
    return nn.initializers.variance_scaling(
        2.0, mode="fan_in", distribution="normal"
    )


zeros = nn.initializers.zeros_init()

# Shorthand used by nearly every layer.
DEFAULT_KERNEL = xavier_uniform()
TAIL_KERNEL = xavier_uniform(gain=1e-5)


def param_dtype() -> jnp.dtype:
    return jnp.float32
