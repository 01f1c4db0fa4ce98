"""LayerNorm with float32 statistics and compute-dtype output.

`nn.LayerNorm(dtype=f32)` forces a float32 activation write between every
block on the bf16 path (2× the HBM traffic of the surrounding bf16
tensors); `nn.LayerNorm(dtype=bf16)` computes the moments in bf16.  This
module does the standard TPU thing: moments and normalization in f32
(numerically identical to the torch reference under the parity policy),
cast to the compute dtype on the way out so XLA fuses one bf16-in /
bf16-out kernel.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerNorm(nn.Module):
    epsilon: float = 1e-6
    out_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (d,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.out_dtype)
