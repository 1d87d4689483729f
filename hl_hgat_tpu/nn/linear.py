"""Dense layer with torch-style default initialization.

The reference's attention/value heads are plain ``torch.nn.Linear``s
(reference lib/Hodge_Cheb_Conv.py:270-289), whose default init is
kaiming-uniform(a=√5): weights ~ U(±√(1/fan_in)), bias ~ U(±√(1/fan_in)).
Matching the init distribution keeps training dynamics statistically
comparable (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

torch_kaiming_uniform = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        w = self.param("kernel", torch_kaiming_uniform, (fan_in, self.features))
        y = jnp.einsum(
            "...c,cf->...f", x, w.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + b.astype(y.dtype)
        return y
