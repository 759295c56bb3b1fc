"""validate-hf emit/expected cycle, end-to-end through the real CLI.

VERDICT r2 #6 / r3 #5: the harness must be proven on synthetic weights
before real weights arrive — a latent bug in the emit/validate cycle would
burn the one bring-up shot. This drives the actual `python -m
deepseek_ocr2_tpu.cli validate-hf` subprocess:

- no-crop cycle: emit a transcript, re-validate (PASS, rc 0), then perturb
  the lm_head and re-validate (FAIL, rc 1, with a divergence position AND
  a step0_top10 FAIL naming the LM stage);
- CROP cycle: same on a page that triggers dynamic tiling, with a
  vision-side (projector) perturbation that must be caught by the
  EMBEDDING fingerprints (the earliest stage), not just by token drift;
- log-parser round trip: a validate-hf run with the reference debug
  channels set (DEEPSEEK_DEBUG_OCR/TOPK/TOKENS) produces a stderr log in
  the reference's eprintln format (main.rs:1501-1522, 1540-1555,
  1601-1606); tools/transcript_from_debug_log.py must turn that log into
  a transcript that validates PASS — proving a reference-binary run can
  serve as the golden transcript with no shared harness.
"""

import dataclasses
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    from PIL import Image

    import reference_torch_vision as refv
    from deepseek_ocr2_tpu.configs import tiny_ocr2_config
    from deepseek_ocr2_tpu.io import save_flat

    d = tmp_path_factory.mktemp("validate_hf")
    cfg = dataclasses.replace(tiny_ocr2_config(), image_token_id=500)
    json.dump(dataclasses.asdict(cfg), open(d / "tiny_config.json", "w"))
    flat = refv.random_ocr2_flat(cfg, seed=21)
    save_flat(flat, str(d / "tiny.safetensors"))

    # Perturbed checkpoint: lm_head noise big enough to flip greedy argmax.
    rng = np.random.default_rng(0)
    flat_bad = dict(flat)
    for name in flat_bad:
        if "lm_head" in name:
            w = np.asarray(flat_bad[name], np.float32)
            flat_bad[name] = (w + rng.standard_normal(w.shape).astype(np.float32)).astype(
                w.dtype
            )
    save_flat(flat_bad, str(d / "tiny_bad.safetensors"))

    # Vision-side perturbation: projector noise shifts the injected image
    # embeddings — the EMBEDDING fingerprints must catch it (stage
    # localization), not just downstream token drift.
    flat_badvis = dict(flat)
    for name in flat_badvis:
        if "projector" in name:
            w = np.asarray(flat_badvis[name], np.float32)
            flat_badvis[name] = (
                w + 0.5 * rng.standard_normal(w.shape).astype(np.float32)
            ).astype(w.dtype)
    save_flat(flat_badvis, str(d / "tiny_badvis.safetensors"))

    from tokenizers import Tokenizer, models, pre_tokenizers

    tok = Tokenizer(
        models.WordLevel(
            {"<unk>": 2, "Free": 10, "OCR.": 11, "hello": 13}, unk_token="<unk>"
        )
    )
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    tok.save(str(d / "tokenizer.json"))

    img = rng.integers(0, 256, (120, 160, 3), np.uint8)
    Image.fromarray(img).save(d / "page.png")
    # Big enough to trigger dynamic tiling (tiny crop_image_size = 192).
    img_crop = rng.integers(0, 256, (300, 500, 3), np.uint8)
    Image.fromarray(img_crop).save(d / "page_crop.png")
    return d


def _validate_hf(assets, weights, extra, image="page.png", crop=False, env_extra=None):
    cmd = [
        sys.executable,
        "-m",
        "deepseek_ocr2_tpu.cli",
        "validate-hf",
        "--weights",
        str(assets / weights),
        "--tokenizer",
        str(assets / "tokenizer.json"),
        "--config",
        str(assets / "tiny_config.json"),
        "--image",
        str(assets / image),
        "--max-new-tokens",
        "10",
        "--lm-dtype",
        "float32",
        "--vision-dtype",
        "float32",
    ] + ([] if crop else ["--no-crop"]) + extra
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    # The emit/expected cycle is backend-independent; run the CLI
    # subprocesses on pure CPU (unset the axon sitecustomize gate) so the
    # test doesn't pay three TPU remote compiles / device-claim waits.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run(
        cmd,
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        timeout=900,
    )


def test_emit_then_validate_pass_then_perturbed_fail(assets):
    transcript = assets / "transcript.json"
    proc = _validate_hf(assets, "tiny.safetensors", ["--emit", str(transcript)])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    recorded = json.load(open(transcript))
    assert len(recorded["generated_ids"]) > 0
    # v2 transcript: every reference fingerprint channel is recorded.
    assert "first16" in recorded["inputs_embeds"]
    assert "0" in recorded["inputs_embeds"]["positions"]
    assert len(recorded["step0_top10"]["ids"]) == 10

    proc = _validate_hf(assets, "tiny.safetensors", ["--expected", str(transcript)])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS: token-exact" in proc.stdout, proc.stdout

    proc = _validate_hf(assets, "tiny_bad.safetensors", ["--expected", str(transcript)])
    assert proc.returncode == 1, proc.stdout
    assert "FAIL: diverges at generated position" in proc.stdout, proc.stdout
    # lm_head perturbation: embeddings identical, step-0 logits flag the LM.
    assert "FAIL step0_top10" in proc.stdout, proc.stdout
    assert "FAIL inputs_embeds" not in proc.stdout, proc.stdout


def test_crop_cycle_catches_vision_perturbation_at_embeddings(assets):
    transcript = assets / "transcript_crop.json"
    proc = _validate_hf(
        assets, "tiny.safetensors", ["--emit", str(transcript)],
        image="page_crop.png", crop=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    recorded = json.load(open(transcript))
    assert recorded["crop_ratio"] != [1, 1], recorded["crop_ratio"]
    # Crop prompt is long enough to carry the tiled-injection fingerprints.
    assert recorded["inputs_embeds"]["seq_len"] > 16

    proc = _validate_hf(
        assets, "tiny.safetensors", ["--expected", str(transcript)],
        image="page_crop.png", crop=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS: token-exact" in proc.stdout, proc.stdout

    proc = _validate_hf(
        assets, "tiny_badvis.safetensors", ["--expected", str(transcript)],
        image="page_crop.png", crop=True,
    )
    assert proc.returncode == 1, proc.stdout
    # Earliest-stage localization: the projector perturbation must be
    # flagged at the embedding fingerprints.
    assert "FAIL inputs_embeds" in proc.stdout, proc.stdout


def test_reference_debug_log_parses_to_passing_transcript(assets):
    """Reference-format stderr log -> transcript_from_debug_log -> PASS."""
    proc = _validate_hf(
        assets,
        "tiny.safetensors",
        [],
        env_extra={
            "DEEPSEEK_DEBUG_OCR": "1",
            "DEEPSEEK_DEBUG_TOPK": "1",
            "DEEPSEEK_DEBUG_TOKENS": "1",
        },
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    log_path = assets / "debug_run.log"
    log_path.write_text(proc.stderr)
    # The log must contain the reference's exact line shapes.
    assert "debug: inputs_embeds fingerprint=" in proc.stderr, proc.stderr
    assert "debug: step0 top10 ids=" in proc.stderr, proc.stderr

    parsed = assets / "transcript_from_log.json"
    tool = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "transcript_from_debug_log.py"),
            str(log_path),
            "-o",
            str(parsed),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        timeout=120,
    )
    assert tool.returncode == 0, tool.stdout + tool.stderr
    t = json.load(open(parsed))
    assert "generated_ids" in t and "inputs_embeds" in t and "step0_top10" in t

    proc = _validate_hf(assets, "tiny.safetensors", ["--expected", str(parsed)])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS: token-exact" in proc.stdout, proc.stdout


def test_tiered_cycle_quantized_transcripts(assets):
    """VERDICT r4 #8: one --tiers run records bf16 AND int4 transcripts;
    the cycle re-validates PASS per tier, a perturbed checkpoint fails in
    every tier, and a PLAIN (reference-style) golden still validates the
    tiered run's bf16 tier."""
    transcript = assets / "transcript_tiers.json"
    proc = _validate_hf(
        assets, "tiny.safetensors", ["--tiers", "bf16,int4", "--emit", str(transcript)]
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    recorded = json.load(open(transcript))
    assert set(recorded["tiers"]) == {"bf16", "int4"}
    for name, t in recorded["tiers"].items():
        assert t["tier"] == name
        assert len(t["generated_ids"]) > 0
        assert len(t["step0_top10"]["ids"]) == 10

    proc = _validate_hf(
        assets,
        "tiny.safetensors",
        ["--tiers", "bf16,int4", "--expected", str(transcript)],
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "[bf16] tokens: exact" in proc.stdout, proc.stdout
    assert "[int4] tokens: exact" in proc.stdout, proc.stdout

    proc = _validate_hf(
        assets,
        "tiny_bad.safetensors",
        ["--tiers", "bf16,int4", "--expected", str(transcript)],
    )
    assert proc.returncode == 1, proc.stdout
    assert "[bf16] FAIL" in proc.stdout, proc.stdout
    assert "[int4] FAIL" in proc.stdout, proc.stdout

    # Plain golden (e.g. parsed from the reference binary's stderr) against
    # a tiered run: compares as the bf16 tier, skips the quantized tiers.
    plain = assets / "transcript_plain_for_tiers.json"
    proc = _validate_hf(assets, "tiny.safetensors", ["--emit", str(plain)])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    proc = _validate_hf(
        assets, "tiny.safetensors", ["--tiers", "bf16,int4", "--expected", str(plain)]
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "[bf16] tokens: exact" in proc.stdout, proc.stdout
    assert "skip tier int4" in proc.stdout, proc.stdout
