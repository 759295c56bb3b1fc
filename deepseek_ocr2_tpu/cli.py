"""CLI — mirrors the reference command surface (main.rs:122-261).

Subcommands: inspect | generate-text | generate-ocr | debug-rope | serve |
convert | validate-hf | train (fine-tuning, beyond the reference).

Backend flag maps the reference's vulkan|ndarray split to tpu|cpu. Dtype
flags accept f32|f16|bf16; f16 is mapped to bf16 on TPU (no hardware f16)
with a notice, keeping the reference flag surface intact.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _dtype_arg(value: str) -> str:
    v = value.lower()
    table = {
        "f32": "float32",
        "float32": "float32",
        "f16": "bfloat16",
        "float16": "bfloat16",
        "bf16": "bfloat16",
        "bfloat16": "bfloat16",
    }
    if v not in table:
        raise argparse.ArgumentTypeError(f"invalid dtype {value!r} (f32|f16|bf16)")
    if v in ("f16", "float16"):
        print("note: f16 maps to bf16 on TPU (native 16-bit type)", file=sys.stderr)
    return table[v]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="deepseek-ocr2-tpu",
        description="TPU-native DeepSeek-OCR-2 inference",
    )
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("inspect", help="List tensors in a .safetensors file")
    sp.add_argument("--weights", required=True)
    sp.add_argument("--take", type=int, default=50, help="entries to print (0 = all)")

    def common_gen(sp, ocr: bool):
        sp.add_argument("--backend", choices=["tpu", "cpu"], default="tpu")
        sp.add_argument("--weights", required=True)
        sp.add_argument("--tokenizer", required=True)
        sp.add_argument(
            "--config", default=None, help="JSON file overriding model config fields"
        )
        sp.add_argument("--max-new-tokens", type=int, default=512 if ocr else 128)
        sp.add_argument("--eos-token-id", type=int, default=1)
        sp.add_argument(
            "--kv-cache",
            type=_kv_dtype_arg,
            default="float32",
            help="KV cache dtype (f32|f16|bf16) for serve --continuous/"
            "--http: 'int8' quantizes the paged pool (half the KV bytes and "
            "pool memory, not token-exact); 'int8tail' additionally keeps "
            "each slot's newest page exact in bf16 (bounds int8 drift to "
            "history tokens)",
        )
        sp.add_argument("--trim-memory", action="store_true")
        sp.add_argument(
            "--moe-int8",
            action="store_true",
            help="weight-only int8 routed experts (fused Pallas decode kernel)",
        )
        sp.add_argument(
            "--int8",
            action="store_true",
            help="weight-only int8 for ALL decode weights (attention, MLPs, "
            "experts, lm_head); supersedes --moe-int8",
        )
        sp.add_argument(
            "--int4",
            action="store_true",
            help="weight-only int4 (w4a16, group-128 scales) for ALL decode "
            "weights — half the int8 weight bytes, larger quantization "
            "error; supersedes --int8/--moe-int8",
        )
        sp.add_argument(
            "--lookup-decode",
            type=int,
            default=0,
            metavar="CHUNK",
            help="prompt-lookup speculative greedy decoding with this chunk "
            "width (single sequence; verified drafts, greedy-exact output)",
        )
        sp.add_argument(
            "--device-resize",
            nargs="?",
            const="auto",
            default=None,
            choices=["auto", "always", "off"],
            help="run resize/letterbox/tiling on the TPU (PIL-bit-exact "
            "fixed-point GEMMs) instead of host PIL. Default 'auto' uses the "
            "device only in crop mode (measured faster there; no-crop pages "
            "keep the cheaper single host resize); 'always' forces it",
        )
        sp.add_argument("--temperature", type=float, default=0.0, help="0 = greedy")
        sp.add_argument("--top-k", type=int, default=0)
        sp.add_argument("--top-p", type=float, default=1.0)
        sp.add_argument("--seed", type=int, default=0)

    sp = sub.add_parser("generate-text", help="Text-only generation (LM backbone)")
    common_gen(sp, ocr=False)
    sp.add_argument("--prompt", required=True)
    sp.add_argument("--num-hidden-layers", type=int, default=12)
    sp.add_argument("--cast-f16", action="store_true", help="run weights in bf16")

    sp = sub.add_parser("generate-ocr", help="End-to-end OCR (image + language)")
    common_gen(sp, ocr=True)
    sp.add_argument("--image", required=True)
    sp.add_argument("--prompt", default=None, help="override the OCR prompt")
    sp.add_argument("--image-token-id", type=int, default=128815)
    sp.add_argument("--image-size", type=int, default=1024)
    sp.add_argument("--no-crop", action="store_true")
    sp.add_argument("--rotate", choices=["0", "90", "180", "270"], default="0")
    sp.add_argument("--auto-rotate", action="store_true")
    sp.add_argument("--crop-image-size", type=int, default=768)
    sp.add_argument("--no-repeat-ngram-size", type=int, default=20)
    sp.add_argument(
        "--profile-dir",
        default=None,
        help="write a jax.profiler trace of the run to this directory",
    )
    sp.add_argument("--vision-dtype", type=_dtype_arg, default="float32")
    sp.add_argument("--sam-dtype", type=_dtype_arg, default=None)
    sp.add_argument("--qwen2-dtype", type=_dtype_arg, default=None)
    sp.add_argument("--projector-dtype", type=_dtype_arg, default=None)
    sp.add_argument("--view-seperator-dtype", type=_dtype_arg, default=None)
    sp.add_argument("--lm-dtype", type=_dtype_arg, default="bfloat16")

    sp = sub.add_parser(
        "convert", help="Re-write a checkpoint with a dtype policy (e.g. cast to bf16)"
    )
    sp.add_argument("--weights", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--dtype", type=_dtype_arg, default="bfloat16")
    sp.add_argument(
        "--keep-f32-prefix",
        action="append",
        default=[],
        help="tensor-name prefix to keep in float32 (repeatable)",
    )

    sp = sub.add_parser(
        "validate-hf",
        help="Token-exact validation vs a recorded HF transcript (greedy OCR)",
    )
    common_gen(sp, ocr=True)
    sp.add_argument("--image", required=True)
    sp.add_argument("--prompt", default=None)
    sp.add_argument("--image-token-id", type=int, default=128815)
    sp.add_argument("--no-crop", action="store_true")
    sp.add_argument("--rotate", choices=["0", "90", "180", "270"], default="0")
    sp.add_argument("--auto-rotate", action="store_true")
    sp.add_argument("--no-repeat-ngram-size", type=int, default=20)
    sp.add_argument("--vision-dtype", type=_dtype_arg, default="float32")
    sp.add_argument("--lm-dtype", type=_dtype_arg, default="bfloat16")
    sp.add_argument(
        "--expected",
        default=None,
        help="transcript JSON to validate against (as written by --emit)",
    )
    sp.add_argument(
        "--emit",
        default=None,
        help="write the transcript JSON (generated token ids + text + fingerprints) here",
    )
    sp.add_argument(
        "--tiers",
        default=None,
        help="comma-separated quantization tiers to validate in ONE run "
        "(subset of bf16,int8,int4) — records/compares token ids + step-0 "
        "top-10 + embedding fingerprints PER TIER, so real-checkpoint "
        "bring-up gates every serving tier with one command",
    )
    sp.add_argument(
        "--fp-rtol",
        type=float,
        default=5e-3,
        help="relative tolerance for fingerprint channels (token ids are always exact)",
    )
    sp.add_argument(
        "--fp-atol",
        type=float,
        default=1e-4,
        help="absolute tolerance for fingerprint channels",
    )

    sp = sub.add_parser(
        "train", help="Fine-tune the LM trunk on a text dataset (AdamW + resume)"
    )
    sp.add_argument("--backend", choices=["tpu", "cpu"], default="tpu")
    sp.add_argument("--weights", required=True)
    sp.add_argument("--tokenizer", required=True)
    sp.add_argument("--config", default=None, help="JSON model-config overrides")
    sp.add_argument("--num-hidden-layers", type=int, default=None)
    sp.add_argument(
        "--data",
        required=True,
        help="JSONL per line: {'text': ...} packed LM loss, or "
        "{'prompt': ..., 'completion': ...} masked SFT loss; plain text also works",
    )
    sp.add_argument("--steps", type=int, default=100)
    sp.add_argument("--batch-size", type=int, default=4)
    sp.add_argument("--seq-len", type=int, default=512)
    sp.add_argument("--lr", type=float, default=1e-5)
    sp.add_argument("--weight-decay", type=float, default=0.01)
    sp.add_argument(
        "--lr-schedule", choices=["constant", "cosine"], default="constant"
    )
    sp.add_argument("--warmup-steps", type=int, default=0)
    sp.add_argument(
        "--log-file", default=None, help="append per-step JSONL metrics here"
    )
    sp.add_argument("--clip-norm", type=float, default=1.0)
    sp.add_argument(
        "--remat",
        action="store_true",
        help="rematerialize MoE layers in the backward (min activation "
        "memory; ~1 extra forward of FLOPs)",
    )
    sp.add_argument(
        "--grad-accum",
        type=int,
        default=1,
        help="micro-batches per optimizer update (optax.MultiSteps)",
    )
    sp.add_argument("--eos-token-id", type=int, default=1)
    sp.add_argument(
        "--mesh",
        default=None,
        help="'dp,mp' mesh for distributed training (e.g. 4,2: batch "
        "DP-sharded, attention heads/MLP columns TP- and experts EP-sharded "
        "over mp)",
    )
    sp.add_argument("--save-every", type=int, default=0, help="0 = only at the end")
    sp.add_argument(
        "--state-out", default=None, help="train-state checkpoint path (params+opt+step)"
    )
    sp.add_argument("--resume", default=None, help="train-state checkpoint to resume")
    sp.add_argument(
        "--out", default=None, help="final params as a PyTorch-layout safetensors"
    )

    sp = sub.add_parser("debug-rope", help="RoPE numeric sanity check on this backend")
    sp.add_argument("--max-seq-len", type=int, default=16)
    sp.add_argument("--head-dim", type=int, default=128)
    sp.add_argument("--seq-len", type=int, default=4)

    sp = sub.add_parser("serve", help="Batched multi-page OCR over a directory of images")
    common_gen(sp, ocr=True)
    sp.add_argument("--images", nargs="+", default=[], help="image files")
    sp.add_argument(
        "--http",
        action="store_true",
        help="serve an HTTP API (POST /v1/ocr) over the ONLINE continuous "
        "engine instead of a fixed image list",
    )
    sp.add_argument("--host", default="127.0.0.1", help="HTTP bind host")
    sp.add_argument("--port", type=int, default=8000, help="HTTP bind port")
    sp.add_argument(
        "--include-token-ids",
        action="store_true",
        help="include token ids in HTTP responses",
    )
    sp.add_argument("--batch-size", type=int, default=8)
    sp.add_argument("--no-crop", action="store_true")
    sp.add_argument("--rotate", choices=["0", "90", "180", "270"], default="0")
    sp.add_argument("--auto-rotate", action="store_true")
    sp.add_argument("--no-repeat-ngram-size", type=int, default=20)
    sp.add_argument("--vision-dtype", type=_dtype_arg, default="bfloat16")
    sp.add_argument("--lm-dtype", type=_dtype_arg, default="bfloat16")
    sp.add_argument(
        "--continuous",
        action="store_true",
        help="continuous batching (slots refill as pages finish; best for long outputs)",
    )
    sp.add_argument("--capacity", type=int, default=2048, help="max tokens per page (continuous)")
    sp.add_argument("--page-size", type=int, default=128, help="KV page size (continuous)")
    sp.add_argument(
        "--pool-tokens",
        type=int,
        default=None,
        help="shared KV pool size in tokens (continuous; default slots*capacity)",
    )
    sp.add_argument(
        "--per-page-stats", action="store_true", help="print per-page phase timings"
    )
    return p


def _int8_scope(args):
    """(scope, bits) requested by the quantization flags; scope None = off."""
    if getattr(args, "int4", False):
        return "full", 4
    if getattr(args, "int8", False):
        return "full", 8
    if getattr(args, "moe_int8", False):
        return "experts", 8
    return None, 8


def _kv_dtype_arg(value: str) -> str:
    if value.lower() in ("int8", "int8tail"):
        return value.lower()
    return _dtype_arg(value)


def _sampling_args(args):
    t = getattr(args, "temperature", 0.0)
    if t < 0:
        raise SystemExit("error: --temperature must be >= 0 (0 = greedy)")
    if not 0.0 < getattr(args, "top_p", 1.0) <= 1.0:
        raise SystemExit("error: --top-p must be in (0, 1]")
    if t == 0.0:
        return None
    return dict(
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        seed=args.seed,
    )


def _select_backend(backend: str) -> None:
    if backend == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # Persistent compile cache: repeat invocations skip XLA recompilation.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "deepseek_ocr2_tpu", "jax"),
    )


def cmd_inspect(args) -> int:
    from .io import inspect_safetensors

    rows = inspect_safetensors(args.weights)
    take = args.take if args.take > 0 else len(rows)
    for name, shape, dtype in rows[:take]:
        print(f"{name}\t{list(shape)}\t{dtype}")
    if take < len(rows):
        print(f"... ({len(rows) - take} more)")
    return 0


def _trim_memory(weights_path: str) -> None:
    """Best-effort host memory hygiene (reference main.rs:483-570)."""
    import ctypes
    import ctypes.util

    def rss_kb():
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return 0

    before = rss_kb()
    try:
        fd = os.open(weights_path, os.O_RDONLY)
        try:
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)
    except OSError as e:
        print(f"trim-memory: posix_fadvise failed: {e}", file=sys.stderr)
    ret = None
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c"))
        ret = libc.malloc_trim(0)
    except (OSError, AttributeError):
        pass
    after = rss_kb()
    print(
        f"trim-memory: rss_kb {before}->{after} (d={after - before}), malloc_trim={ret}",
        file=sys.stderr,
    )


def _load_ocr_pipeline(args):
    import dataclasses

    import jax.numpy as jnp
    import jax

    from .configs import OCR2Config, config_from_json
    from .io import DtypePolicy, load_flat
    from .models import deepseek_ocr2 as ocr2
    from .runtime.pipeline import OCR2Pipeline
    from .utils.tokenizer import load_tokenizer

    base_cfg = config_from_json(args.config) if args.config else OCR2Config()
    cfg = dataclasses.replace(
        base_cfg,
        image_token_id=getattr(args, "image_token_id", base_cfg.image_token_id),
        eos_token_id=args.eos_token_id,
    )
    if getattr(args, "image_size", None) and args.image_size != 1024:
        cfg = dataclasses.replace(cfg, base_image_size=args.image_size)
    if getattr(args, "crop_image_size", None) and args.crop_image_size != 768:
        cfg = dataclasses.replace(cfg, crop_image_size=args.crop_image_size)

    vision_default = args.vision_dtype
    policy = DtypePolicy(default=args.lm_dtype)
    for prefix, dtype in (
        ("model.sam_model", getattr(args, "sam_dtype", None) or vision_default),
        ("model.qwen2_model", getattr(args, "qwen2_dtype", None) or vision_default),
        ("model.projector", getattr(args, "projector_dtype", None) or vision_default),
        ("model.view_seperator", getattr(args, "view_seperator_dtype", None) or vision_default),
    ):
        policy = policy.with_prefix(prefix, dtype)

    flat = load_flat(args.weights, policy)
    params, report = ocr2.params_from_flat(flat, cfg)
    print(report.summary(), file=sys.stderr)
    report.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    del flat
    if args.trim_memory:
        _trim_memory(args.weights)

    scope, bits = _int8_scope(args)
    if scope:
        from .models.deepseek_v2 import quantize_lm_params

        params = dict(params)
        params["lm"] = quantize_lm_params(params["lm"], scope=scope, bits=bits)
        print(f"int{bits}: LM weights quantized (scope={scope})", file=sys.stderr)

    tokenizer = load_tokenizer(args.tokenizer)
    act = "float32" if vision_default == "float32" else "bfloat16"
    return (
        OCR2Pipeline(
            params, cfg, tokenizer, kv_dtype=args.kv_cache, act_dtype=act,
            lookup_chunk=getattr(args, "lookup_decode", 0),
            device_resize={"auto": "auto", "always": True, "off": False}.get(
                getattr(args, "device_resize", None)
            ),
        ),
        cfg,
    )


def cmd_generate_text(args) -> int:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from .configs import DeepseekV2Config, OCR2Config
    from .io import DtypePolicy, load_flat
    from .models import deepseek_v2 as dsv2
    from .runtime.pipeline import OCR2Pipeline
    from .utils.tokenizer import load_tokenizer

    if args.config:
        from .configs import config_from_json

        lm_cfg = config_from_json(args.config).lm
        if args.num_hidden_layers != 12:
            lm_cfg = dataclasses.replace(lm_cfg, num_hidden_layers=args.num_hidden_layers)
    else:
        lm_cfg = DeepseekV2Config(num_hidden_layers=args.num_hidden_layers)
    # Weights are BF16 on HF; keep stored dtype unless --cast-f16 forces 16-bit.
    policy = DtypePolicy(default="bfloat16" if args.cast_f16 else None)
    # Text path: load only the LM trunk (reference main.rs:824-827).
    flat = load_flat(
        args.weights,
        policy,
        include_regex=[
            r"^model\.embed_tokens\.",
            r"^model\.layers\.",
            r"^model\.norm\.",
            r"^lm_head\.",
        ],
    )
    params, report = dsv2.params_from_flat(flat, lm_cfg)
    print(report.summary(), file=sys.stderr)
    report.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    del flat
    if args.trim_memory:
        _trim_memory(args.weights)

    scope, bits = _int8_scope(args)
    if scope:
        from .models.deepseek_v2 import quantize_lm_params

        params = quantize_lm_params(params, scope=scope, bits=bits)
        print(f"int{bits}: LM weights quantized (scope={scope})", file=sys.stderr)

    tokenizer = load_tokenizer(args.tokenizer)
    cfg = OCR2Config(lm=lm_cfg, eos_token_id=args.eos_token_id)
    act_dtype = str(params["embed"].dtype)
    pipe = OCR2Pipeline(
        {"lm": params}, cfg, tokenizer, kv_dtype=args.kv_cache, act_dtype=act_dtype,
        lookup_chunk=getattr(args, "lookup_decode", 0),
    )
    result = pipe.generate_text(
        args.prompt,
        max_new_tokens=args.max_new_tokens,
        eos_token_id=args.eos_token_id,
        sampling=_sampling_args(args),
    )
    print(result.text)
    print(
        f"[{result.new_tokens} tokens, {result.decode_tokens_per_sec:.1f} tok/s]",
        file=sys.stderr,
    )
    return 0


def cmd_generate_ocr(args) -> int:
    from .utils.profiling import device_trace

    pipe, cfg = _load_ocr_pipeline(args)
    with device_trace(args.profile_dir):
        result = pipe.generate_ocr(
            args.image,
            prompt=args.prompt,
            max_new_tokens=args.max_new_tokens,
            no_crop=args.no_crop,
            rotate=int(args.rotate),
            auto_rotate=args.auto_rotate,
            ngram_size=args.no_repeat_ngram_size,
            eos_token_id=args.eos_token_id,
            sampling=_sampling_args(args),
        )
    print(result.text)
    print(
        f"[prefill {result.prefill_seconds * 1e3:.0f} ms, "
        f"{result.new_tokens} tokens, {result.decode_tokens_per_sec:.1f} tok/s]",
        file=sys.stderr,
    )
    return 0


def cmd_serve(args) -> int:
    pipe, cfg = _load_ocr_pipeline(args)
    sampling = _sampling_args(args)
    lookup_chunk = getattr(args, "lookup_decode", 0)
    if lookup_chunk and (sampling or {}).get("temperature", 0.0) != 0.0:
        print(
            "note: --lookup-decode requires greedy decoding; ignoring it "
            "because --temperature > 0",
            file=sys.stderr,
        )
        lookup_chunk = 0
    if args.http:
        from .runtime.continuous import ContinuousOCREngine
        from .runtime.http_server import OCRHttpServer

        engine = ContinuousOCREngine(
            pipe,
            slots=args.batch_size,
            capacity=args.capacity,
            page_size=args.page_size,
            pool_tokens=args.pool_tokens,
            lookup_chunk=lookup_chunk,
        )
        engine.start(ngram_size=args.no_repeat_ngram_size, sampling=sampling)
        server = OCRHttpServer(
            engine,
            host=args.host,
            port=args.port,
            include_token_ids=args.include_token_ids,
        )
        print(
            f"serving OCR at http://{args.host}:{server.port}/v1/ocr "
            f"(slots={args.batch_size}, lookup={lookup_chunk or 'off'}); Ctrl-C to stop",
            file=sys.stderr,
        )
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()
            engine.stop(timeout=120)
        return 0
    if not args.images:
        print("error: --images is required unless --http is set", file=sys.stderr)
        return 2
    if args.continuous:
        from .runtime.continuous import ContinuousOCREngine

        engine = ContinuousOCREngine(
            pipe,
            slots=args.batch_size,
            capacity=args.capacity,
            page_size=args.page_size,
            pool_tokens=args.pool_tokens,
            lookup_chunk=lookup_chunk,
        )
    else:
        from .runtime.engine import OCR2Engine

        engine = OCR2Engine(pipe, batch_size=args.batch_size)
    t0 = time.perf_counter()
    results = engine.run(
        args.images,
        max_new_tokens=args.max_new_tokens,
        no_crop=args.no_crop,
        rotate=int(args.rotate),
        auto_rotate=args.auto_rotate,
        ngram_size=args.no_repeat_ngram_size,
        sampling=sampling,
    )
    dt = time.perf_counter() - t0
    for path, res in zip(args.images, results):
        print(f"=== {path} ===")
        print(res.text)
        if args.per_page_stats:
            print(
                f"  [prefill {res.prefill_seconds * 1e3:.0f} ms, "
                f"decode {res.decode_seconds * 1e3:.0f} ms, "
                f"{res.new_tokens} tokens]",
                file=sys.stderr,
            )
    print(f"[{len(args.images)} pages in {dt:.2f}s = {len(args.images) / dt:.2f} pages/s]", file=sys.stderr)
    if args.continuous and getattr(engine, "last_lookup_forwards", 0):
        # First token per page comes from the admission prefill, not a chunk
        # forward; the remainder is what the speculative chunks produced.
        chunk_tokens = sum(r.new_tokens - 1 for r in results if r is not None)
        print(
            f"[lookup: {chunk_tokens} tokens / {engine.last_lookup_forwards} "
            f"chunk forwards = {chunk_tokens / engine.last_lookup_forwards:.2f} "
            "tok/forward]",
            file=sys.stderr,
        )
    return 0


def cmd_validate_hf(args) -> int:
    if getattr(args, "lookup_decode", 0):
        # HF validation must run the canonical 1-token greedy path:
        # speculative chunks round GEMMs at a different width.
        print("note: --lookup-decode is ignored for validate-hf", file=sys.stderr)
        args.lookup_decode = 0
    """Golden-fingerprint harness for real-checkpoint bring-up (SURVEY.md §4).

    With --emit: runs greedy OCR and records a transcript — generated token
    ids + text PLUS every fingerprint the reference's debug hooks emit
    (embedding slices at positions 0/1/last/289/545, step-0 top-10 logits;
    runtime/validate.py). With --expected: re-runs and compares in causal
    order (embeddings -> step-0 logits -> token ids), so the first FAIL
    line names the earliest diverging stage. The golden transcript can come
    from a prior --emit OR from the reference binary's stderr via
    tools/transcript_from_debug_log.py (docs/VALIDATE_HF.md has the recipe).
    """
    import json

    from .runtime.validate import collect_transcript, compare_transcripts

    # Force the HF-parity debug channels so fingerprints always print
    # (reference main.rs:1477-1523, 954-980).
    os.environ.setdefault("DEEPSEEK_DEBUG_OCR", "1")

    def _collect(p):
        return collect_transcript(
            p,
            args.image,
            prompt=args.prompt,
            max_new_tokens=args.max_new_tokens,
            no_crop=args.no_crop,
            rotate=int(args.rotate),
            auto_rotate=args.auto_rotate,
            ngram_size=args.no_repeat_ngram_size,
            eos_token_id=args.eos_token_id,
        )

    if args.tiers:
        # One bring-up run gating every serving tier (VERDICT r4 #8): each
        # tier reloads + requantizes the checkpoint and records its own
        # token ids / step-0 top-10 / embedding fingerprints.
        import argparse as _ap

        names = [t.strip() for t in args.tiers.split(",") if t.strip()]
        bad = [n for n in names if n not in ("bf16", "int8", "int4")]
        if bad:
            print(f"unknown tier(s) {bad}; valid: bf16,int8,int4", file=sys.stderr)
            return 2
        tiers = {}
        for name in names:
            targs = _ap.Namespace(**vars(args))
            targs.int8 = name == "int8"
            targs.int4 = name == "int4"
            targs.moe_int8 = False
            print(f"--- tier {name} ---", file=sys.stderr)
            tpipe, _ = _load_ocr_pipeline(targs)
            t = _collect(tpipe)
            t["tier"] = name
            tiers[name] = t
            del tpipe
        transcript = {"version": 2, "tiers": tiers}
        n_tok = {n: len(t["generated_ids"]) for n, t in tiers.items()}
    else:
        pipe, cfg = _load_ocr_pipeline(args)
        transcript = _collect(pipe)
        n_tok = len(transcript["generated_ids"])
    if args.emit:
        with open(args.emit, "w") as f:
            json.dump(transcript, f, indent=1)
        print(f"wrote transcript ({n_tok} tokens) to {args.emit}")
    if args.expected:
        with open(args.expected) as f:
            want = json.load(f)
        ok, lines = compare_transcripts(
            transcript, want, rtol=args.fp_rtol, atol=args.fp_atol
        )
        for line in lines:
            print(line)
        if ok:
            print(f"PASS: token-exact ({n_tok} tokens)")
            return 0
        print("hint: re-run with DEEPSEEK_DEBUG_TOPK=1 for per-step top-10 logits")
        return 1
    if not args.emit:
        if args.tiers:
            for name, t in transcript["tiers"].items():
                print(f"[{name}] {t['text']}")
        else:
            print(transcript["text"])
    return 0


def cmd_convert(args) -> int:
    from .io import DtypePolicy, load_flat, save_flat

    policy = DtypePolicy(default=args.dtype)
    for prefix in args.keep_f32_prefix:
        policy = policy.with_prefix(prefix, "float32")
    flat = load_flat(args.weights, policy)
    save_flat(flat, args.out)
    print(f"wrote {len(flat)} tensors to {args.out}", file=sys.stderr)
    return 0


def cmd_train(args) -> int:
    """LM fine-tuning loop: packed next-token CE, AdamW + global-norm clip,
    full-state checkpointing (beyond the inference-only reference; the step
    itself lives in runtime/train.py and backprops through the same scan
    stack and Pallas MoE kernels as inference)."""
    import dataclasses
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .configs import DeepseekV2Config
    from .io import DtypePolicy, load_flat, save_flat
    from .models import deepseek_v2 as dsv2
    from .runtime.train import (
        adamw_sft_train_step,
        adamw_train_step,
        init_opt_state,
        load_train_state,
        make_optimizer,
        save_train_state,
    )
    from .utils.tokenizer import load_tokenizer

    if args.config:
        from .configs import config_from_json

        lm_cfg = config_from_json(args.config).lm
    else:
        lm_cfg = DeepseekV2Config()
    if args.num_hidden_layers:
        lm_cfg = dataclasses.replace(lm_cfg, num_hidden_layers=args.num_hidden_layers)

    flat = load_flat(
        args.weights,
        DtypePolicy(default=None),
        include_regex=[
            r"^model\.embed_tokens\.",
            r"^model\.layers\.",
            r"^model\.norm\.",
            r"^lm_head\.",
        ],
    )
    params, report = dsv2.params_from_flat(flat, lm_cfg)
    print(report.summary(), file=sys.stderr)
    report.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    del flat

    tokenizer = load_tokenizer(args.tokenizer)
    stream = []
    sft_examples = []
    with open(args.data) as f:
        for lineno, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            sft = None
            if line.startswith("{"):
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    text = line
                else:
                    if isinstance(obj.get("prompt"), str) and isinstance(
                        obj.get("completion"), str
                    ):
                        sft = (obj["prompt"], obj["completion"])
                        text = None
                    else:
                        text = obj.get("text")
                        if not isinstance(text, str):
                            raise SystemExit(
                                f"error: {args.data}:{lineno}: JSONL line has "
                                'neither a string "text" field nor '
                                '"prompt"+"completion" fields '
                                f"(keys: {sorted(obj)})"
                            )
            else:
                text = line
            if sft is not None:
                # SFT example: loss on the completion + EOS only.
                p_ids = tokenizer.encode(sft[0], add_special_tokens=False).ids
                c_ids = tokenizer.encode(sft[1], add_special_tokens=False).ids
                if len(p_ids) >= args.seq_len:
                    raise SystemExit(
                        f"error: {args.data}:{lineno}: prompt alone is "
                        f"{len(p_ids)} tokens >= --seq-len {args.seq_len}; "
                        "no completion tokens would carry loss"
                    )
                ex = (p_ids + c_ids + [args.eos_token_id])[: args.seq_len]
                m = ([0] * len(p_ids) + [1] * (len(c_ids) + 1))[: args.seq_len]
                pad = args.seq_len - len(ex)
                sft_examples.append(
                    (
                        np.asarray(ex + [0] * pad, np.int32),
                        np.asarray(m + [0] * pad, np.float32),
                    )
                )
            else:
                stream.extend(tokenizer.encode(text, add_special_tokens=False).ids)
                stream.append(args.eos_token_id)
    if stream and sft_examples:
        raise SystemExit(
            f"error: {args.data} mixes 'text' and 'prompt'/'completion' lines"
        )
    if sft_examples:
        ex_ids = np.stack([e[0] for e in sft_examples])  # [N, seq]
        ex_mask = np.stack([e[1] for e in sft_examples])
        n_ex = len(sft_examples)
        cycled = args.steps * args.batch_size > n_ex

        def batch_at(step: int):
            idx = (np.arange(args.batch_size) + step * args.batch_size) % n_ex
            return ex_ids[idx], ex_mask[idx]

        print(
            f"dataset: {n_ex} prompt/completion examples -> {args.steps} steps "
            f"of [{args.batch_size}, {args.seq_len}] (masked SFT loss)"
            + (" (cycled)" if cycled else ""),
            file=sys.stderr,
        )
    else:
        if not stream:
            raise SystemExit(f"error: no tokens in {args.data}")
        stream_np = np.asarray(stream, np.int32)
        bs = args.batch_size * args.seq_len
        cycled = args.steps * bs > len(stream_np)

        def batch_at(step: int):
            idx = (np.arange(bs, dtype=np.int64) + step * bs) % len(stream_np)
            return stream_np[idx].reshape(args.batch_size, args.seq_len), None

        print(
            f"dataset: {len(stream_np)} tokens -> {args.steps} steps of "
            f"[{args.batch_size}, {args.seq_len}]" + (" (cycled)" if cycled else ""),
            file=sys.stderr,
        )

    mesh = None
    if args.mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel import lm_param_specs, make_mesh, shard_params

        dp, mp = (int(v) for v in args.mesh.split(","))
        mesh = make_mesh(dp=dp, mp=mp)
        params = shard_params(params, mesh, lm_param_specs(lm_cfg))
        batch_sharding = NamedSharding(mesh, P("dp", None))
        if args.batch_size % dp:
            raise SystemExit(f"error: --batch-size must be divisible by dp={dp}")
        print(f"mesh: dp={dp} mp={mp} ({dp * mp} devices)", file=sys.stderr)

    tx = make_optimizer(
        lr=args.lr,
        weight_decay=args.weight_decay,
        clip_norm=args.clip_norm,
        grad_accum=args.grad_accum,
        schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
        total_steps=args.steps,
    )
    start_step = 0
    if args.resume:
        opt_state = init_opt_state(tx, params)
        params, opt_state, start_step = load_train_state(args.resume, params, opt_state)
        if mesh is not None:  # restored state lands unsharded; re-lay it out
            from .parallel import lm_param_specs, shard_params

            params = shard_params(params, mesh, lm_param_specs(lm_cfg))
            # Moments follow the params' layout: a fresh jit-init state
            # inherits the param shardings, so device_put each restored
            # leaf to its template leaf's sharding (avoids holding a full
            # unsharded f32 moment tree on one device).
            tmpl = init_opt_state(tx, params)
            opt_state = jax.tree_util.tree_map(
                lambda t, v: jax.device_put(v, t.sharding), tmpl, opt_state
            )
        print(f"resumed from {args.resume} at step {start_step}", file=sys.stderr)
    else:
        opt_state = init_opt_state(tx, params)

    import contextlib

    t0 = time.perf_counter()
    for step in range(start_step, args.steps):
        ids_np, mask_np = batch_at(step)
        batch = jnp.asarray(ids_np)
        mask = jnp.asarray(mask_np) if mask_np is not None else None
        if mesh is not None:
            batch = jax.device_put(batch, batch_sharding)
            if mask is not None:
                mask = jax.device_put(mask, batch_sharding)
        with mesh if mesh is not None else contextlib.nullcontext():
            if mask is not None:
                params, opt_state, loss = adamw_sft_train_step(
                    params, opt_state, lm_cfg, batch, mask, tx, remat=args.remat
                )
            else:
                params, opt_state, loss = adamw_train_step(
                    params, opt_state, lm_cfg, batch, tx, remat=args.remat
                )
        loss_v = float(np.asarray(jax.device_get(loss)))  # also the step barrier
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        print(f"step {step + 1}/{args.steps}  loss {loss_v:.4f}  {dt * 1e3:.0f} ms")
        if args.log_file:
            with open(args.log_file, "a") as lf:
                lf.write(
                    json.dumps(
                        {"step": step + 1, "loss": loss_v, "ms": round(dt * 1e3, 1)}
                    )
                    + "\n"
                )
        if args.state_out and args.save_every and (step + 1) % args.save_every == 0:
            save_train_state(args.state_out, params, opt_state, step + 1)
            print(f"  saved {args.state_out}", file=sys.stderr)
    if args.state_out:
        save_train_state(args.state_out, params, opt_state, args.steps)
        print(f"saved train state: {args.state_out}", file=sys.stderr)
    if args.out:
        save_flat(dsv2.flat_from_params(params, lm_cfg), args.out)
        print(f"saved params: {args.out}", file=sys.stderr)
    return 0


def cmd_debug_rope(args) -> int:
    import jax.numpy as jnp
    import numpy as np

    from .ops.rope import apply_rope, rope_cache

    cos, sin = rope_cache(args.max_seq_len, args.head_dim, 10000.0)
    print(f"cos[0,:4]={cos[0, :4]} sin[1,:4]={sin[1, :4]}")
    for name, dtype in (("zeros", jnp.float32), ("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        shape = (1, 1, args.seq_len, args.head_dim)
        if name == "zeros":
            x = jnp.zeros(shape, dtype)
        else:
            x = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape).astype(dtype) / 100.0
        q, k = apply_rope(x, x, jnp.asarray(cos), jnp.asarray(sin), 0)
        nan_q = int(jnp.isnan(q).sum())
        nan_k = int(jnp.isnan(k).sum())
        print(f"{name}: nan_q={nan_q} nan_k={nan_k} q[0,0,0,:3]={np.asarray(q)[0, 0, 0, :3]}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if hasattr(args, "backend"):
        _select_backend(args.backend)
    if args.command == "inspect":
        return cmd_inspect(args)
    if args.command == "generate-text":
        return cmd_generate_text(args)
    if args.command == "generate-ocr":
        return cmd_generate_ocr(args)
    if args.command == "serve":
        return cmd_serve(args)
    if args.command == "validate-hf":
        return cmd_validate_hf(args)
    if args.command == "convert":
        return cmd_convert(args)
    if args.command == "train":
        return cmd_train(args)
    if args.command == "debug-rope":
        return cmd_debug_rope(args)
    raise SystemExit(2)


if __name__ == "__main__":
    raise SystemExit(main())
