"""validate-hf emit/expected cycle, end-to-end through the real CLI.

VERDICT r2 #6: the harness must be proven on synthetic weights before real
weights arrive — a latent bug in the emit/validate cycle would burn the one
bring-up shot. This drives the actual `python -m deepseek_ocr2_tpu.cli
validate-hf` subprocess: emit a transcript, re-validate (PASS, rc 0), then
perturb the lm_head and re-validate (FAIL, rc 1, with a divergence
position). Mirrors reference main.rs:954-980, 1477-1523.
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
    return d


def _validate_hf(assets, weights, extra):
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
        str(assets / "page.png"),
        "--no-crop",
        "--max-new-tokens",
        "10",
        "--lm-dtype",
        "float32",
        "--vision-dtype",
        "float32",
    ] + extra
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    # The emit/expected cycle is backend-independent; run the CLI
    # subprocesses on pure CPU (unset the axon sitecustomize gate) so the
    # test doesn't pay three TPU remote compiles / device-claim waits.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        cmd,
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=900,
    )


def test_emit_then_validate_pass_then_perturbed_fail(assets):
    transcript = assets / "transcript.json"
    proc = _validate_hf(assets, "tiny.safetensors", ["--emit", str(transcript)])
    assert proc.returncode == 0, proc.stdout
    recorded = json.load(open(transcript))
    assert len(recorded["generated_ids"]) > 0

    proc = _validate_hf(assets, "tiny.safetensors", ["--expected", str(transcript)])
    assert proc.returncode == 0, proc.stdout
    assert "PASS: token-exact" in proc.stdout, proc.stdout

    proc = _validate_hf(assets, "tiny_bad.safetensors", ["--expected", str(transcript)])
    assert proc.returncode == 1, proc.stdout
    assert "FAIL: diverges at generated position" in proc.stdout, proc.stdout
