"""Speed-of-light decomposition of the predictive TRAINING step (r5,
VERDICT r4 item 6).

r4 left predictive train at a single number (32.67 ms/step bs64 =
1,959 img/s) with no statement of its floor.  This measures, in ONE
process at the sandbox config (`sandbox/predictive.py:48-137`: bs64,
64px scaling glimpses, E[ctx]=2 -> N=8 tokens incl. CLS/PRD, ViT-B
trunk, losses {ctx_patch 1e-4, query_patch 1.0, pos_reg 0.5},
AdamW 2e-3):

  e2e       full jitted train step (fwd + grad + adamw)  [the bench.py
            number]
  valgrad   value_and_grad only (no optimizer update)
  fwdloss   forward + training_loss value (no grad)
  fwd       model forward only (glimpse sample + embed + trunk)
  embed     glimpse embedding alone: grid_sample crops + conv encoder +
            token BN at the e2e token count
  dec       latent->patch deconv decode at the loss's token count
  opt       AdamW update alone on captured grads

and prints per-part shares, sum-of-parts vs e2e, and a FLOP/SoL
estimate per part against the chip calibration (chained bf16 123-152
TF/s; the conv/deconv stacks and the 8-token trunk run tiny GEMMs, so
the interesting question is which parts are overhead-bound).

Usage: python benchmarks/bench_predictive_sol_r5.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import optax

from _timing import bench_queued
from msvit_tpu.models.predictive import (
    PredictiveViTConfig,
    PredictiveViTModel,
    PredictiveViTTrainingConfig,
    training_loss,
)

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BS = 64


def main():
    cfg = PredictiveViTConfig(
        use_cls_token=False,
        patch_config="scaling",
        default_patch_scale=0.4,
        patch_config_scale=((1.0, 0.0), (1.0, 0.0), (1.0, -1.0)),
        patch_size=64,
        expected_context_length=2.0,
        max_context_length=6,
    )
    model = PredictiveViTModel(cfg)
    tc = PredictiveViTTrainingConfig(
        context_patch_prediction=1e-4,
        query_patch_prediction=1.0,
        positional_regularization=0.5,
    )
    rng = jax.random.PRNGKey(1212)
    pix = jax.random.normal(rng, (BS, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)({"params": rng, "glimpse": rng}, pix[:2])
    opt = optax.adamw(2e-3)
    opt_state = jax.jit(opt.init)(variables)
    keys = jax.random.split(jax.random.PRNGKey(1), 256)

    def loss_fn(v, x, key):
        out = model.apply(v, x, rngs={"glimpse": key}, output_inputs=True)
        err, _, _ = training_loss(model, v, x, out, tc)
        return jnp.mean(err)

    # ---- e2e step ----
    @jax.jit
    def step(v, s, x, key):
        loss, grads = jax.value_and_grad(loss_fn)(v, x, key)
        updates, s = opt.update(grads, s, v)
        return optax.apply_updates(v, updates), s, loss

    def f_e2e(i):
        _, _, loss = step(variables, opt_state, pix + i * 1e-6, keys[i % 256])
        return loss

    # ---- value_and_grad only ----
    @jax.jit
    def vgrad(v, x, key):
        loss, grads = jax.value_and_grad(loss_fn)(v, x, key)
        return loss + sum(
            jnp.sum(g.astype(jnp.float32) * 0) for g in jax.tree.leaves(grads)
        )

    def f_valgrad(i):
        return vgrad(variables, pix + i * 1e-6, keys[i % 256])

    # ---- forward + loss value ----
    @jax.jit
    def floss(v, x, key):
        return loss_fn(v, x, key)

    def f_fwdloss(i):
        return floss(variables, pix + i * 1e-6, keys[i % 256])

    # ---- forward only ----
    @jax.jit
    def fwd(v, x, key):
        out = model.apply(v, x, rngs={"glimpse": key}, output_inputs=True)
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

    def f_fwd(i):
        return fwd(variables, pix + i * 1e-6, keys[i % 256])

    # capture one output for the component probes
    out0 = model.apply(
        variables, pix, rngs={"glimpse": keys[0]}, output_inputs=True
    )
    pos0 = jax.device_put(out0["input_position"])
    state0 = jax.device_put(out0["last_hidden_state"])
    n_tok = state0.shape[1]

    # ---- glimpse embed alone (grid_sample + conv encoder + BN) ----
    @jax.jit
    def embed(v, x, pos):
        e = model.apply(v, x, pos, method=PredictiveViTModel.embed)
        return jnp.sum(e.astype(jnp.float32))

    def f_embed(i):
        return embed(variables, pix + i * 1e-6, pos0)

    # ---- latent -> patch decode at the loss's token count ----
    @jax.jit
    def dec(v, st):
        pos, orth = model.apply(
            v, st, True, method=PredictiveViTModel.latent_to_position
        )
        patch = model.apply(
            v, orth, method=lambda m, o: m.patch_embeddings.latent_to_patch(o)
        )
        return jnp.sum(patch.astype(jnp.float32)) + jnp.sum(pos)

    def f_dec(i):
        return dec(variables, state0 + i * 1e-6)

    # ---- optimizer alone ----
    grads0 = jax.jit(jax.grad(loss_fn))(variables, pix, keys[0])
    grads0 = jax.device_put(grads0)

    @jax.jit
    def optstep(g, s, v, i):
        g = jax.tree.map(lambda x: x + i * 1e-9, g)
        updates, s2 = opt.update(g, s, v)
        new = optax.apply_updates(v, updates)
        return sum(
            jnp.sum(x.astype(jnp.float32) * 1e-9) for x in jax.tree.leaves(new)
        )

    def f_opt(i):
        return optstep(grads0, opt_state, variables, float(i))

    parts = [
        ("e2e", f_e2e, 10),
        ("valgrad", f_valgrad, 10),
        ("fwdloss", f_fwdloss, 10),
        ("fwd", f_fwd, 20),
        ("embed", f_embed, 20),
        ("dec", f_dec, 20),
        ("opt", f_opt, 20),
    ]
    res = {}
    for name, fn, iters in parts:
        dt = bench_queued(fn, iters=iters, warmup=3)
        res[name] = dt * 1e3
        print(f"{name:9s} {dt*1e3:8.2f} ms", flush=True)

    e2e = res["e2e"]
    print(f"\nn_tokens={n_tok}  bs={BS}  ({BS/ (e2e/1e3):.0f} img/s)")
    print(f"grad overhead (valgrad-fwdloss): {res['valgrad']-res['fwdloss']:.2f} ms")
    print(f"loss overhead (fwdloss-fwd):     {res['fwdloss']-res['fwd']:.2f} ms")
    print(f"optimizer     (e2e-valgrad):     {e2e-res['valgrad']:.2f} ms "
          f"(isolated opt: {res['opt']:.2f})")
    print(f"embed share of fwd:              {res['embed']:.2f} / {res['fwd']:.2f} ms")
    print(f"decode (in loss):                {res['dec']:.2f} ms")

    # rough FLOP accounting (fwd path), bf16
    d = cfg.hidden_size
    layers = cfg.num_hidden_layers
    trunk_gemm = 2 * BS * n_tok * (4 * d * d + 2 * d * 4 * d) * layers
    # conv encoder: 5 stride-2 convs 64->2px; dominated by first layers
    # (exact count printed for the record, from the param shapes)
    enc_flops = 0
    p = variables["params"]["patch_embeddings"]
    size = cfg.patch_size
    for k in sorted(p):
        if (k.startswith("enc") and "kernel" in p[k]
                and p[k]["kernel"].ndim == 4):
            kh, kw, cin, cout = p[k]["kernel"].shape
            size = size // 2
            enc_flops += 2 * BS * n_tok * size * size * kh * kw * cin * cout
    print(f"\ntrunk GEMM FLOPs/step fwd: {trunk_gemm/1e9:.1f} GF "
          f"-> {(trunk_gemm/1e12)/(res['fwd']/1e3):.1f} TF/s if fwd were all trunk")
    print(f"conv-enc FLOPs (xN={n_tok} glimpses): {enc_flops/1e9:.1f} GF")


if __name__ == "__main__":
    main()
