"""SAM ViT-B stage breakdown at serving shapes (B=4, 1024^2)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_ocr2_tpu.configs import OCR2Config
from deepseek_ocr2_tpu.models import sam as sam_mod
from deepseek_ocr2_tpu.ops.norms import layer_norm_2d

ITERS_LO, ITERS_HI = int(os.environ.get("SAM_BENCH_LO", "8")), int(os.environ.get("SAM_BENCH_HI", "40"))
B = 4


def _time_chain(make_run, *args) -> float:
    lo, hi = make_run(ITERS_LO), make_run(ITERS_HI)

    def once(fn):
        np.asarray(jax.device_get(fn(*args)))[:1]
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*args)))[:1]
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max(once(hi) - once(lo), 1e-9) / (ITERS_HI - ITERS_LO)


def chain(body):
    def make_run(iters):
        @jax.jit
        def run(x0, *rest):
            def b(x, _):
                y = body(x, *rest)
                f = jnp.ravel(y)[:1].astype(x0.dtype) * jnp.asarray(1e-24, x0.dtype)
                return x0 + f.reshape((1,) * x0.ndim), ()

            x, _ = jax.lax.scan(b, x0, None, length=iters)
            return x

        return run

    return make_run


def main():
    cfg = OCR2Config().sam
    key = jax.random.PRNGKey(0)
    params = sam_mod.init_params(cfg, key, dtype=jnp.bfloat16)
    print(f"device: {jax.devices()[0]}  B={B}")

    img = jax.random.uniform(key, (B, 3, 1024, 1024), jnp.bfloat16, -1, 1)
    dt = _time_chain(
        chain(lambda x, p: sam_mod._conv2d(x, p["patch_embed"]["w"], p["patch_embed"]["b"], stride=cfg.patch_size)),
        img,
        params,
    )
    print(f"patch embed conv              {dt * 1e3:8.2f} ms")

    x = jax.random.normal(key, (B, 64, 64, 768), jnp.bfloat16)
    blk = jax.tree_util.tree_map(lambda a: a, params["blocks"][0])

    dt = _time_chain(
        chain(lambda x, b2: sam_mod._block(x, b2, cfg, cfg.window_size)), x, blk
    )
    print(f"windowed block (win=14->16)   {dt * 1e3:8.2f} ms  (x8 = {8 * dt * 1e3:.0f} ms)")

    dt = _time_chain(chain(lambda x, b2: sam_mod._block(x, b2, cfg, 0)), x, blk)
    print(f"global block (L=4096)         {dt * 1e3:8.2f} ms  (x4 = {4 * dt * 1e3:.0f} ms)")

    # MLP alone.
    def mlp(x, b2):
        return (
            sam_mod._gelu(x @ b2["mlp"]["w1"].astype(x.dtype) + b2["mlp"]["b1"].astype(x.dtype))
            @ b2["mlp"]["w2"].astype(x.dtype)
        )

    dt = _time_chain(chain(mlp), x, blk)
    print(f"block MLP alone               {dt * 1e3:8.2f} ms")

    # Windowed attention alone (partition + attention + unpartition).
    def wattn(x, b2):
        wins, pad_hw = sam_mod.window_partition(x, cfg.window_size)
        pad = 16 - cfg.window_size
        wins = jnp.pad(wins, ((0, 0), (0, pad), (0, pad), (0, 0)))
        wins = sam_mod._attention(wins, b2["attn"], cfg.num_heads, valid_hw=(14, 14))
        wins = wins[:, :14, :14, :]
        return sam_mod.window_unpartition(wins, 14, pad_hw, (64, 64))

    dt = _time_chain(chain(wattn), x, blk)
    print(f"windowed attention alone      {dt * 1e3:8.2f} ms")

    def gattn(x, b2):
        return sam_mod._attention(x, b2["attn"], cfg.num_heads)

    dt = _time_chain(chain(gattn), x, blk)
    print(f"global attention alone        {dt * 1e3:8.2f} ms")

    nchw = jax.random.normal(key, (B, 768, 64, 64), jnp.bfloat16)

    def tail(x, p):
        n = p["neck"]
        y = sam_mod._conv2d(x, n["conv1"])
        y = layer_norm_2d(y, n["ln1"]["w"], n["ln1"]["b"], cfg.layer_norm_eps)
        y = sam_mod._conv2d(y, n["conv2"], padding=((1, 1), (1, 1)))
        y = layer_norm_2d(y, n["ln2"]["w"], n["ln2"]["b"], cfg.layer_norm_eps)
        y = sam_mod._conv2d(y, p["net_2"], stride=2, padding=((1, 1), (1, 1)))
        return sam_mod._conv2d(y, p["net_3"], stride=2, padding=((1, 1), (1, 1)))

    dt = _time_chain(chain(tail), nchw, params)
    print(f"neck + nets (old NCHW)        {dt * 1e3:8.2f} ms")

    nhwc = jax.random.normal(key, (B, 64, 64, 768), jnp.bfloat16)

    def tail_nhwc(x, p):
        n = p["neck"]
        y = x @ n["conv1"][:, :, 0, 0].T.astype(x.dtype)
        y = sam_mod.layer_norm(y, n["ln1"]["w"], n["ln1"]["b"], cfg.layer_norm_eps)
        y = sam_mod._conv2d_nhwc(y, n["conv2"], padding=((1, 1), (1, 1)))
        y = sam_mod.layer_norm(y, n["ln2"]["w"], n["ln2"]["b"], cfg.layer_norm_eps)
        y = sam_mod._conv2d_nhwc(y, p["net_2"], stride=2, padding=((1, 1), (1, 1)))
        y = sam_mod._conv2d_nhwc(y, p["net_3"], stride=2, padding=((1, 1), (1, 1)))
        return y.transpose(0, 3, 1, 2)

    dt = _time_chain(chain(tail_nhwc), nhwc, params)
    print(f"neck + nets (NHWC, shipping)  {dt * 1e3:8.2f} ms")


def glue_probes():
    """Isolate the gap between sum-of-block timings and the full tower."""
    cfg = OCR2Config().sam
    key = jax.random.PRNGKey(0)
    params = sam_mod.init_params(cfg, key, dtype=jnp.bfloat16)
    x = jax.random.normal(key, (B, 64, 64, 768), jnp.bfloat16)
    blocks = params["blocks"]

    # The real 12-block sequence (window pattern W W G x4), no conv/neck.
    def tower(x, blocks):
        for i, blk in enumerate(blocks):
            window = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = sam_mod._block(x, blk, cfg, window)
        return x

    dt = _time_chain(chain(tower), x, blocks)
    print(f"12-block tower (W W G x4)     {dt * 1e3:8.2f} ms")

    # Same blocks, summed from per-block single timings.
    tot = 0.0
    for i in (0, 2):  # one windowed, one global, scaled by count
        blk = blocks[i]
        window = 0 if i in cfg.global_attn_indexes else cfg.window_size
        dt = _time_chain(chain(lambda x, b2: sam_mod._block(x, b2, cfg, window)), x, blk)
        n = 4 if window == 0 else 8
        tot += n * dt
        kind = "global" if window == 0 else "windowed"
        print(f"  {kind} block x{n}             {n * dt * 1e3:8.2f} ms")
    print(f"sum of isolated blocks        {tot * 1e3:8.2f} ms")

    # W->G and G->W adjacent pairs (layout transitions between block kinds).
    for name, seq in (("W->W", (14, 14)), ("W->G", (14, 0)), ("G->W", (0, 14))):
        def pair(x, blocks, seq=seq):
            x = sam_mod._block(x, blocks[0], cfg, seq[0])
            return sam_mod._block(x, blocks[1], cfg, seq[1])

        dt = _time_chain(chain(pair), x, blocks)
        print(f"pair {name}                     {dt * 1e3:8.2f} ms")

    # MLP gelu dtype ablation.
    blk = blocks[0]

    def mlp_f32gelu(x, b2):
        return (
            sam_mod._gelu(x @ b2["mlp"]["w1"].astype(x.dtype) + b2["mlp"]["b1"].astype(x.dtype))
            @ b2["mlp"]["w2"].astype(x.dtype)
        )

    def mlp_bf16gelu(x, b2):
        h = x @ b2["mlp"]["w1"].astype(x.dtype) + b2["mlp"]["b1"].astype(x.dtype)
        return jax.nn.gelu(h, approximate=False) @ b2["mlp"]["w2"].astype(x.dtype)

    def mlp_nogelu(x, b2):
        h = x @ b2["mlp"]["w1"].astype(x.dtype) + b2["mlp"]["b1"].astype(x.dtype)
        return h @ b2["mlp"]["w2"].astype(x.dtype)

    for name, fn in (("f32 erf gelu", mlp_f32gelu), ("bf16 erf gelu", mlp_bf16gelu), ("no gelu", mlp_nogelu)):
        dt = _time_chain(chain(fn), x, blk)
        print(f"MLP {name:16s}        {dt * 1e3:8.2f} ms")

    # Attention sub-phases: qkv proj, rel-bias einsums, kernel.
    attn = blk["attn"]

    def qkv_only(x, a):
        return x @ a["qkv_w"].astype(x.dtype) + a["qkv_b"].astype(x.dtype)

    dt = _time_chain(chain(qkv_only), x, attn)
    print(f"attn qkv proj alone           {dt * 1e3:8.2f} ms")

    def relbias(x, a):
        b, h, w, dim = x.shape
        hd = dim // cfg.num_heads
        q = (x @ a["qkv_w"][:, :dim].astype(x.dtype)).reshape(b, h * w, cfg.num_heads, hd)
        q32 = q.transpose(0, 2, 1, 3).astype(jnp.float32).reshape(b * cfg.num_heads, h, w, hd)
        rh = sam_mod.get_rel_pos(h, h, a["rel_h"])
        rw = sam_mod.get_rel_pos(w, w, a["rel_w"])
        rel_h = jnp.einsum("nhwc,hkc->nhwk", q32, rh)
        rel_w = jnp.einsum("nhwc,wkc->nhwk", q32, rw)
        return rel_h.sum() + rel_w.sum()

    dt = _time_chain(chain(relbias), x, attn)
    print(f"rel-bias (qproj+einsums)      {dt * 1e3:8.2f} ms")

    # Head/tail pieces with a larger iteration window (they are cheap per
    # iter, so the 4/20 diff is all noise).
    global ITERS_LO, ITERS_HI
    lo_hi = (ITERS_LO, ITERS_HI)
    ITERS_LO, ITERS_HI = 16, 80

    img = jax.random.uniform(key, (B, 3, 1024, 1024), jnp.bfloat16, -1, 1)

    def head_conv(img, p):
        y = sam_mod._conv2d(img, p["patch_embed"]["w"], p["patch_embed"]["b"], stride=cfg.patch_size)
        y = y.transpose(0, 2, 3, 1)
        return y + sam_mod.resize_pos_embed(p["pos_embed"], y.shape[1], y.shape[2]).astype(y.dtype)

    dt = _time_chain(chain(head_conv), img, params)
    print(f"head (old NCHW conv)          {dt * 1e3:8.2f} ms")

    def head(img, p):
        y = sam_mod._patch_embed(img, p["patch_embed"]["w"], p["patch_embed"]["b"], cfg.patch_size)
        return y + sam_mod.resize_pos_embed(p["pos_embed"], y.shape[1], y.shape[2]).astype(y.dtype)

    dt = _time_chain(chain(head), img, params)
    print(f"head (GEMM patch embed)       {dt * 1e3:8.2f} ms")

    feats = jax.random.normal(key, (B, 64, 64, 768), jnp.bfloat16)

    def tail2(x, p):
        n = p["neck"]
        y = x @ n["conv1"][:, :, 0, 0].T.astype(x.dtype)
        y = sam_mod.layer_norm(y, n["ln1"]["w"], n["ln1"]["b"], cfg.layer_norm_eps)
        y = sam_mod._conv2d_nhwc(y, n["conv2"], padding=((1, 1), (1, 1)))
        y = sam_mod.layer_norm(y, n["ln2"]["w"], n["ln2"]["b"], cfg.layer_norm_eps)
        y = sam_mod._conv2d_nhwc(y, p["net_2"], stride=2, padding=((1, 1), (1, 1)))
        y = sam_mod._conv2d_nhwc(y, p["net_3"], stride=2, padding=((1, 1), (1, 1)))
        return y.transpose(0, 3, 1, 2)

    dt = _time_chain(chain(tail2), feats, params)
    print(f"tail (NHWC neck + nets)       {dt * 1e3:8.2f} ms")
    ITERS_LO, ITERS_HI = lo_hi


if __name__ == "__main__":
    if os.environ.get("SAM_GLUE"):
        glue_probes()
    else:
        main()


def full_towers():
    """Diff-method timings of the full towers (dispatch cancels)."""
    from deepseek_ocr2_tpu.configs import OCR2Config
    from deepseek_ocr2_tpu.models import qwen2 as qwen2_mod

    ocfg = OCR2Config()
    cfg = ocfg.sam
    key = jax.random.PRNGKey(0)
    params = sam_mod.init_params(cfg, key, dtype=jnp.bfloat16)
    qp = qwen2_mod.init_params(ocfg.qwen2, key, dtype=jnp.bfloat16)

    for name, shape in [("sam fwd 4x1024", (4, 3, 1024, 1024)), ("sam fwd 8x768", (8, 3, 768, 768))]:
        img = jax.random.uniform(key, shape, jnp.bfloat16, -1, 1)
        dt = _time_chain(chain(lambda x, p: sam_mod.sam_forward(p, cfg, x)), img, params)
        print(f"{name:28s}  {dt * 1e3:8.2f} ms")

    for name, shape in [("qwen2 4x(16,16)", (4, 896, 16, 16)), ("qwen2 8x(12,12)", (8, 896, 12, 12))]:
        f = jax.random.normal(key, shape, jnp.bfloat16)
        dt = _time_chain(chain(lambda x, p: qwen2_mod.qwen2_encode(p, ocfg.qwen2, x)), f, qp)
        print(f"{name:28s}  {dt * 1e3:8.2f} ms")


if os.environ.get("SAM_FULL"):
    full_towers()
