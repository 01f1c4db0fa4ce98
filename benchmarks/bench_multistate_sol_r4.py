"""Speed-of-light decomposition of the multistate serving floor (r4,
VERDICT item 3).

r3 left the multistate number at "trunk-bound, 26.5 ms/batch-8 floor"
without the per-part audit the dense-B path got.  This measures, in ONE
process at the BASELINE bs8 shape ([8 imgs, N=816 tokens incl. 2x16
cluster slots, D=768, H=12], int8 GEMMs + bf16 masked attention — the
production serving composition):

  e2e        full int8 multistate forward, late256 clustering
  trunk      same with clustering disabled (pregeneration_period > L)
  attn12     12 chained masked packed-attention calls (the kernel alone)
  attn12_nm  same without the mask (upper bound for a maskless pregen path)
  gemm12     12 chained per-layer int8 GEMM chains (qkv/proj/fc1/fc2,
             M = 8*816, static act scales — includes the quantize pass)
  gemm12_pq  same with prequantized int8 inputs (isolates quantize cost)
  ln24       24 layer norms + residual adds at [8,816,768]
  maskbuild  build_multistate_attention_mask + additive conversion x5
             (initial + 4 re-clusterings)

and prints sum-of-parts vs the measured trunk, plus a bs sweep of the
e2e path (8/16/32/64).  Reference anchor for the hot loop:
`modeling_msvitencoder.py:469-552`.

Usage: python benchmarks/bench_multistate_sol_r4.py [--skip-sweep]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _timing import bench_queued
from msvit_tpu.models.clustering import SpectralClusteringConfig
from msvit_tpu.models.multistate import (
    MultiStateViTConfig,
    MultiStateViTEncoderModel,
    calibrate_multistate_act_scales,
    quantize_multistate_params,
    quantized_multistate_apply,
)
from msvit_tpu.models.multistate.model import build_multistate_attention_mask
from msvit_tpu.ops.packed_attention import packed_attention
from msvit_tpu.ops.quant import int8_matmul, int8_matmul_prequant, quantize_weight

B, D, H, NPATCH, CMAX = 8, 768, 12, 784, 16
N = NPATCH + 2 * CMAX  # 816


def make_cfg(pregen=4):
    return MultiStateViTConfig(
        patch_size=8,
        image_size=224,
        pregeneration_period=pregen,
        generation_period=2,
        clustering=SpectralClusteringConfig(
            ncut_dim=8, num_sample=1024, max_clusters=CMAX,
            eigenvalue_threshold=0.1, ncut_dist="rbf",
            eig_method="subspace", late_num_sample=256,
        ),
    )


def build_e2e(cfg, bs):
    model = MultiStateViTEncoderModel(make_cfg())  # params shared via init
    rng = jax.random.PRNGKey(1212)
    pix = jax.random.normal(rng, (bs, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": rng, "clustering": rng}, pix[:1])
    qp = quantize_multistate_params(params["params"])
    scales = jax.device_get(
        calibrate_multistate_act_scales(
            qp, cfg, pix[: min(bs, 8)], jax.random.PRNGKey(0)
        )
    )
    keys = jax.random.split(jax.random.PRNGKey(1), 64)

    @jax.jit
    def fwd(qp_, x, i, key):
        out = quantized_multistate_apply(
            qp_, cfg, x + i * 1e-6, key, act_scales=scales
        )
        return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

    return lambda i: fwd(qp, pix, float(i + 1), keys[i]), pix, qp, scales


def main():
    skip_sweep = "--skip-sweep" in sys.argv
    print("devices:", jax.devices(), flush=True)
    rows = {}

    # --- e2e + trunk-only ---
    f_e2e, pix, qp, scales = build_e2e(make_cfg(), B)
    rows["e2e(late256)"] = bench_queued(f_e2e, iters=20)
    f_trunk, *_ = build_e2e(make_cfg(pregen=99), B)
    rows["trunk(no clust)"] = bench_queued(f_trunk, iters=20)

    # --- parts ---
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    qkv = jax.random.normal(k1, (B, N, 3 * D), jnp.bfloat16) * 0.5
    mbool = jax.random.uniform(k2, (B, 1, N, N)) > 0.3
    additive = jnp.where(mbool, 0.0, -100.0).astype(jnp.float32)

    @jax.jit
    def attn12(x, i):
        s = jnp.float32(0)
        for l in range(12):
            s = s + jnp.sum(
                packed_attention(
                    x + (i + l) * 1e-6, H, mask=additive
                ).astype(jnp.float32)
            )
        return s

    @jax.jit
    def attn12_nm(x, i):
        s = jnp.float32(0)
        for l in range(12):
            s = s + jnp.sum(
                packed_attention(x + (i + l) * 1e-6, H).astype(jnp.float32)
            )
        return s

    rows["attn12(masked)"] = bench_queued(lambda i: attn12(qkv, float(i)),
                                          iters=20)
    rows["attn12(nomask)"] = bench_queued(lambda i: attn12_nm(qkv, float(i)),
                                          iters=20)

    # GEMM chain: weights like one trunk layer
    M = B * N
    x0 = jax.random.normal(k3, (M, D), jnp.bfloat16) * 0.1
    wq = quantize_weight(jax.random.normal(rng, (D, 3 * D)) * 0.02)
    wp = quantize_weight(jax.random.normal(rng, (D, D)) * 0.02)
    w1 = quantize_weight(jax.random.normal(rng, (D, 4 * D)) * 0.02)
    w2 = quantize_weight(jax.random.normal(rng, (4 * D, D)) * 0.02)
    s_act = jnp.float32(0.01)

    @jax.jit
    def gemm12(x, i):
        y = x + i * 1e-6
        for _ in range(12):
            a = int8_matmul(y, wq, act_scale=s_act)  # [M, 3D]
            b = int8_matmul(a[:, :D], wp, act_scale=s_act)
            c = int8_matmul(b, w1, act_scale=s_act)
            y = int8_matmul(jax.nn.gelu(c), w2, act_scale=s_act)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def gemm12_pq(xq, i):
        s = jnp.float32(0)
        yq = jnp.clip(xq + i.astype(jnp.int8), -127, 127)
        for _ in range(12):
            a = int8_matmul_prequant(yq, s_act, wq,
                                     out_inv_scale=1.0 / s_act)
            aq = a[:, :D].astype(jnp.int8)  # stay int8 between GEMMs
            b = int8_matmul_prequant(aq, s_act, wp,
                                     out_inv_scale=1.0 / s_act)
            c = int8_matmul_prequant(b.astype(jnp.int8), s_act, w1,
                                     out_inv_scale=1.0 / s_act)
            d = int8_matmul_prequant(c.astype(jnp.int8), s_act, w2,
                                     out_inv_scale=1.0 / s_act)
            yq = d.astype(jnp.int8)
            s = s + jnp.sum(d.astype(jnp.float32))
        return s

    rows["gemm12(int8+q)"] = bench_queued(lambda i: gemm12(x0, float(i)),
                                          iters=20)
    xq0 = jnp.clip(jnp.round(x0.astype(jnp.float32) / 0.01), -127, 127
                   ).astype(jnp.int8)
    rows["gemm12(prequant)"] = bench_queued(
        lambda i: gemm12_pq(xq0, jnp.int32(i % 3)), iters=20
    )

    # LN + residual glue
    x3 = jax.random.normal(rng, (B, N, D), jnp.bfloat16)
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)

    @jax.jit
    def ln24(x, i):
        y = x + i * 1e-6
        for _ in range(24):
            mu = jnp.mean(y.astype(jnp.float32), axis=-1, keepdims=True)
            var = jnp.var(y.astype(jnp.float32), axis=-1, keepdims=True)
            y = (((y - mu) * jax.lax.rsqrt(var + 1e-6)) * gamma + beta
                 ).astype(x.dtype) + y
        return jnp.sum(y.astype(jnp.float32))

    rows["ln24+res"] = bench_queued(lambda i: ln24(x3, float(i)), iters=20)

    # mask build x5 (initial + 4 re-clusterings)
    ci = jax.random.randint(rng, (B, NPATCH), 0, CMAX)
    ncl = jnp.full((B,), CMAX, jnp.int32)

    @jax.jit
    def maskbuild(ci_, i):
        s = jnp.float32(0)
        for l in range(5):
            m = build_multistate_attention_mask(
                jnp.clip(ci_ + l, 0, CMAX - 1), ncl, CMAX
            )
            a = jnp.where(m, 0.0, -100.0).astype(jnp.float32)
            s = s + jnp.sum(a) + i * 0.0
        return s

    rows["maskbuild x5"] = bench_queued(lambda i: maskbuild(ci, float(i)),
                                        iters=20)

    # --- report ---
    print(f"\nB={B} N={N} D={D} H={H} (int8 GEMM + bf16 masked attention)")
    for k, v in rows.items():
        print(f"  {k:18s}: {v * 1e3:7.2f} ms", flush=True)
    parts = (rows["attn12(masked)"] + rows["gemm12(int8+q)"]
             + rows["ln24+res"] + rows["maskbuild x5"])
    print(f"  {'sum of parts':18s}: {parts * 1e3:7.2f} ms "
          f"(vs trunk {rows['trunk(no clust)'] * 1e3:.2f})")
    print(f"  {'clustering':18s}: "
          f"{(rows['e2e(late256)'] - rows['trunk(no clust)']) * 1e3:7.2f} ms "
          "(e2e - trunk)")
    # FLOP accounting
    gemm_flops = 12 * 2 * (B * N) * D * (3 * D + D + 4 * D + 4 * D)
    attn_flops = 12 * 2 * 2 * B * N * N * D
    print(f"  gemm12 eff:  {gemm_flops / rows['gemm12(int8+q)'] / 1e12:6.1f} "
          f"TOPS (chip chained-int8 ~188)")
    print(f"  attn12 eff:  {attn_flops / rows['attn12(masked)'] / 1e12:6.1f} "
          f"TF/s (chip chained-bf16 ~123-152)")

    if not skip_sweep:
        print("\nbs sweep (e2e late256):")
        for bs in (8, 16, 32, 64):
            f, *_ = build_e2e(make_cfg(), bs)
            dt = bench_queued(f, iters=10)
            print(f"  bs{bs:3d}: {dt * 1e3:7.2f} ms/batch "
                  f"({bs / dt:6.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
