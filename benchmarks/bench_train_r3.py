"""Training-batch sublinearity diagnosis (VERDICT r2 item 4).

Differences vs bench_train.py:
* **donation-chained** steps: params/opt_state flow through the queued
  iterations with donate=True — the production memory profile.  The r2
  bench's donate=False kept two copies of the 1.03 GB optimizer+param
  state live, inflating the no-remat footprint (its bs512 "OOM by
  604 MB" conclusion is re-tested here under donation).
* selective remat policies (config.remat_policy: "dots"/"dots_no_batch")
  — save MXU outputs, recompute elementwise only.
* optional bf16 first moment (make_optimizer(mu_dtype=bf16)).

Usage: python benchmarks/bench_train_r3.py [case ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import time

import jax
import jax.numpy as jnp
import optax

import _timing  # noqa: F401  (compilation cache setup)
from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.vit import ViTForImageClassification
from msvit_tpu.train.loop import make_optimizer, train_step_fn


def bench(batch_size=256, remat=False, remat_policy="", mu_bf16=False,
          iters=8, attn="auto"):
    tag = (f"bs{batch_size} remat={int(remat)}:{remat_policy or '-'} "
           f"mu_bf16={int(mu_bf16)}")
    cfg = BaseViTConfig(remat=remat, remat_policy=remat_policy,
                        attn_implementation=attn)
    model = ViTForImageClassification(cfg, num_labels=1000)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (batch_size, 224, 224, 3), jnp.float32)
    labels = jax.random.randint(rng, (batch_size,), 0, 1000)
    params = jax.jit(model.init)({"params": rng}, pix[:1])

    optimizer = make_optimizer(
        learning_rate=1e-4, mu_dtype=jnp.bfloat16 if mu_bf16 else None
    )
    opt_state = jax.jit(optimizer.init)(params)

    def loss_fn(p, batch, key):
        # i-dependent input perturbation inside the step (no extra
        # host-side buffer per queued iteration)
        x = batch["pixel_values"] + batch["i"] * 1e-6
        logits = model.apply(p, x, deterministic=True)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["labels"]
        ).mean()
        return loss, {}

    step = train_step_fn(loss_fn, optimizer, donate=True)

    def batch(i):
        return {"pixel_values": pix, "labels": labels,
                "i": jnp.float32(i)}

    try:
        params, opt_state, loss, _ = step(
            params, opt_state, batch(-1), jax.random.PRNGKey(0)
        )
        float(loss)  # compile+warmup sync
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, loss, _ = step(
                params, opt_state, batch(i), jax.random.PRNGKey(0)
            )
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {dt * 1e3:7.1f} ms/step ({batch_size / dt:6.0f} img/s)",
              flush=True)
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{tag}: FAILED — {msg}", flush=True)
        return None


CASES = {
    "base256": dict(batch_size=256),
    "b512": dict(batch_size=512),
    "b512mu": dict(batch_size=512, mu_bf16=True),
    "b512dots": dict(batch_size=512, remat=True, remat_policy="dots_no_batch"),
    "b1024dots": dict(batch_size=1024, remat=True,
                      remat_policy="dots_no_batch"),
    "b1024dotsmu": dict(batch_size=1024, remat=True,
                        remat_policy="dots_no_batch", mu_bf16=True),
    "b1024full": dict(batch_size=1024, remat=True),
}

def bench_parts(batch_size, attn="auto"):
    """Bisect: fwd-only and value_and_grad-only (no optimizer)."""
    cfg = BaseViTConfig(attn_implementation=attn)
    model = ViTForImageClassification(cfg, num_labels=1000)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (batch_size, 224, 224, 3), jnp.float32)
    labels = jax.random.randint(rng, (batch_size,), 0, 1000)
    params = jax.jit(model.init)({"params": rng}, pix[:1])

    @jax.jit
    def fwd(p, x, i):
        logits = model.apply(p, x + i * 1e-6, deterministic=True)
        return jnp.sum(logits)

    @jax.jit
    def grad_only(p, x, i):
        def loss(p):
            logits = model.apply(p, x + i * 1e-6, deterministic=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        l, g = jax.value_and_grad(loss)(p)
        return l + sum(jnp.sum(a.astype(jnp.float32) * 0) for a in
                       jax.tree.leaves(g)) * 0 + sum(
            jnp.mean(a.astype(jnp.float32)) for a in jax.tree.leaves(g))

    import time as _t
    for tag, f in (("fwd", fwd), ("fwd+bwd", grad_only)):
        float(f(params, pix, -1.0))
        t0 = _t.perf_counter()
        for i in range(8):
            s = f(params, pix, float(i))
        float(s)
        dt = (_t.perf_counter() - t0) / 8
        print(f"bs{batch_size} attn={attn:6s} {tag:8s}: {dt*1e3:7.1f} ms "
              f"({batch_size/dt:6.0f} img/s)", flush=True)


PART_CASES = {
    "p256": (256, "auto"),
    "p512": (512, "auto"),
    "p512packed": (512, "packed"),
    "p512fused": (512, "fused"),
}


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    names = sys.argv[1:] or list(CASES)
    for n in names:
        if n in PART_CASES:
            bench_parts(*PART_CASES[n])
        else:
            bench(**CASES[n])
