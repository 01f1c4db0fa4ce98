"""Bisect the ViT-B bs256 training backward (r3): which component owns
the 120 ms gap between measured fwd+bwd (323 ms) and the ideal 3x-fwd
(203 ms) — attention backward variant, GEMM transposes, or LN/glue.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import optax

import _timing  # noqa: F401
from _timing import bench_queued
from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.vit import ViTForImageClassification


def run(attn, bs=256, closed_form_max=None):
    if closed_form_max is not None:
        import msvit_tpu.ops.packed_attention as pa
        pa._CLOSED_FORM_MAX_BYTES = closed_form_max
    cfg = BaseViTConfig(attn_implementation=attn)
    model = ViTForImageClassification(cfg, num_labels=1000)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (bs, 224, 224, 3), jnp.float32)
    labels = jax.random.randint(rng, (bs,), 0, 1000)
    params = jax.jit(model.init)({"params": rng}, pix[:1])

    @jax.jit
    def fwd(p, x, i):
        return jnp.sum(model.apply(p, x + i * 1e-6, deterministic=True))

    @jax.jit
    def fwdbwd(p, x, i):
        def loss(p):
            logits = model.apply(p, x + i * 1e-6, deterministic=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        l, g = jax.value_and_grad(loss)(p)
        return l + sum(jnp.mean(a.astype(jnp.float32))
                       for a in jax.tree.leaves(g))

    for tag, f in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        try:
            dt = bench_queued(lambda i: f(params, pix, float(i)), iters=8)
            print(f"bs{bs} attn={attn:7s} cf={closed_form_max} {tag:8s}: "
                  f"{dt*1e3:7.1f} ms ({bs/dt:6.0f} img/s)", flush=True)
        except Exception as e:
            print(f"bs{bs} attn={attn:7s} cf={closed_form_max} {tag:8s}: "
                  f"FAILED {str(e).splitlines()[0][:120]}", flush=True)


def run_dx_vs_dw(bs=256):
    """Split the backward: grad wrt input only (dx chain) vs wrt params
    (adds every dW GEMM), plus a bare chained-GEMM MLP reference that
    shows what the backward GEMMs cost at peak."""
    cfg = BaseViTConfig(attn_implementation="packed")
    model = ViTForImageClassification(cfg, num_labels=1000)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (bs, 224, 224, 3), jnp.float32)
    labels = jax.random.randint(rng, (bs,), 0, 1000)
    params = jax.jit(model.init)({"params": rng}, pix[:1])

    def loss_of(p, x):
        logits = model.apply(p, x, deterministic=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    @jax.jit
    def dx_only(p, x, i):
        l, gx = jax.value_and_grad(loss_of, argnums=1)(p, x + i * 1e-6)
        return l + jnp.mean(gx)

    @jax.jit
    def dw_only(p, x, i):
        l, gp = jax.value_and_grad(loss_of, argnums=0)(p, x + i * 1e-6)
        return l + sum(jnp.mean(a.astype(jnp.float32))
                       for a in jax.tree.leaves(gp))

    for tag, f in (("dx-only", dx_only), ("dx+dW", dw_only)):
        dt = bench_queued(lambda i: f(params, pix, float(i)), iters=8)
        print(f"bs{bs} {tag:8s}: {dt*1e3:7.1f} ms ({bs/dt:6.0f} img/s)",
              flush=True)


def run_mlp_ref(bs=256, n=197, d=768, ff=3072, layers=12):
    """12 bare (fc1-gelu-fc2 + LN) blocks: the backward-GEMM speed of
    light without attention."""
    from msvit_tpu.ops.gelu import gelu_erf_tanh as gelu
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (bs, n, d), jnp.bfloat16)
    ws = {
        f"l{i}": {
            "w1": (jax.random.normal(jax.random.PRNGKey(i), (d, ff)) * 0.02
                   ).astype(jnp.bfloat16),
            "w2": (jax.random.normal(jax.random.PRNGKey(100 + i), (ff, d))
                   * 0.02).astype(jnp.bfloat16),
        }
        for i in range(layers)
    }

    def net(ws, x, with_ln):
        h = x
        for i in range(layers):
            y = gelu(h @ ws[f"l{i}"]["w1"]) @ ws[f"l{i}"]["w2"]
            h = h + y
            if with_ln:
                mu = jnp.mean(h.astype(jnp.float32), -1, keepdims=True)
                var = jnp.var(h.astype(jnp.float32), -1, keepdims=True)
                h = ((h - mu) * jax.lax.rsqrt(var + 1e-6)).astype(h.dtype)
        return jnp.sum(h.astype(jnp.float32))

    for with_ln in (False, True):
        @jax.jit
        def fwd(ws, x, i, wl=with_ln):
            return net(ws, x + i * jnp.bfloat16(1e-6), wl)

        @jax.jit
        def fwdbwd(ws, x, i, wl=with_ln):
            l, g = jax.value_and_grad(lambda w: net(w, x + i * jnp.bfloat16(1e-6), wl))(ws)
            return l + sum(jnp.mean(a.astype(jnp.float32))
                           for a in jax.tree.leaves(g))

        for tag, f in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
            dt = bench_queued(lambda i: f(ws, x, float(i)), iters=8)
            fl = 2 * bs * n * d * ff * 2 * layers
            fl = fl * (1 if tag == "fwd" else 3)
            print(f"mlp ln={int(with_ln)} {tag:8s}: {dt*1e3:7.1f} ms "
                  f"({fl/dt/1e12:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for spec in sys.argv[1:] or ["packed", "xla", "fused"]:
        if spec == "dxdw":
            run_dx_vs_dw()
        elif spec == "mlp":
            run_mlp_ref()
        elif ":" in spec:
            attn, cf = spec.split(":")
            run(attn, closed_form_max=int(cf))
        else:
            run(spec)
