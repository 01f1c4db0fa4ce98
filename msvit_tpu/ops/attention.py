"""Masked multi-head attention for TPU.

This is the TPU-native replacement for the reference's two attention paths
(`model/base_encoder/modeling_base.py:47-155`): an eager scores/softmax
implementation and a torch-SDPA fused call.  Semantics preserved:

* boolean masks mean "True = may attend" and are applied by masking scores
  to −inf before softmax (reference `modeling_base.py:89-93`);
* float masks are additive biases (same line range);
* cross-context keys/values are handled by the *caller* concatenating
  context tokens onto K/V (reference `modeling_base.py:77-82`) — the kernel
  itself just takes (possibly longer) K/V.

Two implementations:

* ``"xla"``   — plain jnp einsum + softmax.  XLA already fuses the mask and
                softmax into the matmul epilogue; at the reference's
                sequence lengths (≤ ~1.6k tokens) this is near
                speed-of-light and materializing [B,H,N,M] probs is cheap.
                Required whenever attention probabilities are an output
                (the multistate encoder consumes attention sub-blocks,
                reference `modeling_msvitencoder.py:528-543`).
* ``"flash"`` — fused Pallas online-softmax kernel (never materializes the
                scores matrix in HBM); preferred for long sequences /
                training memory.  See `msvit_tpu/ops/flash_attention.py`.

``"auto"`` picks flash when shapes are kernel-eligible and probs are not
requested, else xla.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Large-but-finite mask value: avoids NaNs from exp(-inf - (-inf)) in fully
# masked rows while being -inf for softmax purposes in f32.
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _apply_mask(
    scores: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    mask_value: float,
) -> jnp.ndarray:
    if mask is None:
        return scores
    if mask.dtype == jnp.bool_:
        return jnp.where(mask, scores, mask_value)
    # additive float mask (reference `modeling_base.py:93`)
    return scores + mask.astype(scores.dtype)


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    mask_value: float = DEFAULT_MASK_VALUE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-semantics attention.

    Args:
      q: [..., H, Nq, Dh]
      k, v: [..., H, Nk, Dh]
      mask: broadcastable to [..., H, Nq, Nk]; bool (True = attend) or
        additive float.
      scale: defaults to 1/sqrt(Dh).

    Returns:
      (out [..., H, Nq, Dh], probs [..., H, Nq, Nk]).  Softmax statistics
      are computed in float32 regardless of input dtype.
    """
    dh = q.shape[-1]
    scale = (1.0 / dh**0.5) if scale is None else scale
    scores = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    scores = _apply_mask(scores, mask, mask_value)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "...qk,...kd->...qd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype), probs


def _kernel_shapes_ok(q, k, mask, allow_float_mask: bool = False) -> bool:
    """Pallas kernel constraints: 4D [B,H,N,D] inputs with concrete
    (non-symbolic) shapes; bool mask (the fused kernel additionally
    supports 4D additive float masks)."""
    if q.ndim != 4 or k.ndim != 4:
        return False
    # shape-polymorphic export traces with symbolic dims — Pallas grids
    # and cost estimates need concrete ints; dispatch falls back to XLA
    if not all(
        isinstance(d, int) for d in tuple(q.shape) + tuple(k.shape)
    ):
        return False
    if mask is not None:
        if mask.ndim != 4:
            return False
        if mask.dtype != jnp.bool_ and not allow_float_mask:
            return False
    return True


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _fused_eligible(q, k, mask) -> bool:
    # one head's f32 scores tile (plus its mask tile, which shares VMEM)
    # must fit the single-pass kernel's budget (see ops/fused_attention.py;
    # Mosaic reuses the scores buffer for the probs, so one copy counts).
    # Measured OK at [16,12,1600,1600] unmasked (11MB scores, 5.7 ms —
    # benchmarks/RESULTS.md); beyond this the online-softmax flash kernel
    # takes over.
    def pad(n):
        return -(-n // 128) * 128

    scores = pad(q.shape[-2]) * pad(k.shape[-2]) * 4
    m_bytes = 0
    if mask is not None:
        m_bytes = scores // 4 if mask.dtype == jnp.bool_ else scores
    return scores + m_bytes <= 12 * 1024 * 1024


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    implementation: str = "auto",
    output_probs: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
    inference: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Dispatching attention front end used by all encoder families.

    ``inference=True`` (serving paths only — NOT differentiable) lets
    the fused branch use the shaved-softmax + transposed-PV kernel
    (`fused_attention_inference`), ~2.6× the exact fused kernel at the
    dh=64 masked multistate shape."""
    if implementation == "auto":
        # Measured on v5e (tests/test_fused_attention.py + benchmarks):
        # below ~512 kv tokens the custom-call boundary costs more than
        # the kernels save end-to-end (ViT-B @197: XLA trains 568 vs 520
        # img/s, benchmarks/bench_train.py) — XLA.  Above, the
        # single-pass fused Pallas kernel wins (scores tile lives in
        # VMEM only; multistate @816 is 18% faster e2e); the online-
        # softmax flash kernel takes over when the scores tile exceeds
        # VMEM (it beats XLA there too — benchmarks/RESULTS.md attention
        # table); XLA whenever probabilities are requested.
        symbolic = not all(
            isinstance(d, int) for d in tuple(q.shape) + tuple(k.shape)
        )
        if output_probs or not _on_tpu() or symbolic or k.shape[-2] < 512:
            implementation = "xla"
        elif _fused_eligible(q, k, mask) and _kernel_shapes_ok(
            q, k, mask, allow_float_mask=True
        ):
            implementation = "fused"
        elif _kernel_shapes_ok(q, k, mask, allow_float_mask=True):
            implementation = "flash"
        else:
            implementation = "xla"
    if (
        implementation == "fused"
        and not output_probs
        and _kernel_shapes_ok(q, k, mask, allow_float_mask=True)
    ):
        from msvit_tpu.ops.fused_attention import (
            fused_attention,
            fused_attention_inference,
        )

        fn = fused_attention_inference if inference else fused_attention
        out = fn(q, k, v, mask=mask, scale=scale, mask_value=mask_value)
        return out, None
    if (
        implementation == "flash"
        and not output_probs
        and _kernel_shapes_ok(q, k, mask, allow_float_mask=True)
    ):
        from msvit_tpu.ops.flash_attention import flash_attention

        out = flash_attention(
            q, k, v, mask=mask, scale=scale, mask_value=mask_value
        )
        return out, None
    out, probs = xla_attention(q, k, v, mask=mask, scale=scale, mask_value=mask_value)
    return out, (probs if output_probs else None)
