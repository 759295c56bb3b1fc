"""`train` subcommand end-to-end through the real CLI.

Drives fine-tuning on a tiny LM + 4-word tokenizer: loss must fall, the
train-state checkpoint and the exported params must round-trip (the export
reloads through the normal PyTorch-layout loader), and --resume must
continue from the saved step.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    from reference_torch import random_lm_flat

    from deepseek_ocr2_tpu.configs import tiny_lm_config
    from deepseek_ocr2_tpu.io import save_flat

    import dataclasses
    import json

    d = tmp_path_factory.mktemp("train_cli")
    cfg = tiny_lm_config(num_hidden_layers=2)
    save_flat(random_lm_flat(cfg, seed=5), str(d / "tiny.safetensors"))
    json.dump({"lm": dataclasses.asdict(cfg)}, open(d / "config.json", "w"))

    from tokenizers import Tokenizer, models, pre_tokenizers

    tok = Tokenizer(
        models.WordLevel(
            {"<unk>": 2, "Free": 10, "OCR.": 11, "hello": 13}, unk_token="<unk>"
        )
    )
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    tok.save(str(d / "tokenizer.json"))

    with open(d / "data.jsonl", "w") as f:
        for _ in range(8):
            f.write('{"text": "hello Free OCR. hello hello Free"}\n')
    return d


def _train(assets, extra):
    cmd = [
        sys.executable,
        "-m",
        "deepseek_ocr2_tpu.cli",
        "train",
        "--weights",
        str(assets / "tiny.safetensors"),
        "--tokenizer",
        str(assets / "tokenizer.json"),
        "--config",
        str(assets / "config.json"),
        "--data",
        str(assets / "data.jsonl"),
        "--batch-size",
        "2",
        "--seq-len",
        "16",
        "--lr",
        "1e-3",
    ] + extra
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    # Backend-independent loop; pure CPU keeps the test off the device claim.
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


def _losses(out: str):
    return [
        float(line.split("loss")[1].split()[0])
        for line in out.splitlines()
        if line.startswith("step ")
    ]


def test_train_cli_loss_falls_and_exports(assets, tmp_path):
    state = str(tmp_path / "state.safetensors")
    out_ckpt = str(tmp_path / "tuned.safetensors")
    r = _train(
        assets, ["--steps", "6", "--state-out", state, "--out", out_ckpt]
    )
    assert r.returncode == 0, r.stdout
    losses = _losses(r.stdout)
    assert len(losses) == 6
    assert losses[-1] < losses[0], losses
    assert os.path.exists(state) and os.path.exists(out_ckpt)

    # Exported params reload through the normal PyTorch-layout loader.
    from deepseek_ocr2_tpu.configs import tiny_lm_config
    from deepseek_ocr2_tpu.io import DtypePolicy, load_flat
    from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2

    flat = load_flat(out_ckpt, DtypePolicy(default=None))
    _, report = dsv2.params_from_flat(flat, tiny_lm_config(num_hidden_layers=2))
    report.raise_on_errors()


def test_train_cli_resume_matches_straight(assets, tmp_path):
    # Straight: 4 steps.
    out_a = str(tmp_path / "straight.safetensors")
    r = _train(assets, ["--steps", "4", "--out", out_a])
    assert r.returncode == 0, r.stdout
    straight = _losses(r.stdout)

    # Split: 2 steps -> checkpoint -> resume for the last 2.
    state = str(tmp_path / "mid.safetensors")
    r = _train(assets, ["--steps", "2", "--state-out", state])
    assert r.returncode == 0, r.stdout
    out_b = str(tmp_path / "resumed.safetensors")
    r = _train(
        assets, ["--steps", "4", "--resume", state, "--out", out_b]
    )
    assert r.returncode == 0, r.stdout
    assert "resumed" in r.stdout
    resumed = _losses(r.stdout)
    assert len(resumed) == 2

    np.testing.assert_allclose(resumed, straight[2:], rtol=1e-6)

    from deepseek_ocr2_tpu.io import load_flat

    fa, fb = load_flat(out_a), load_flat(out_b)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])


def test_train_cli_mesh(assets, tmp_path):
    """--mesh dp,mp fine-tuning on 8 virtual CPU devices (DP batch + TP/EP
    params via parallel/); loss falls and the run completes."""
    cmd_extra = ["--steps", "3", "--mesh", "4,2", "--batch-size", "4"]
    env_extra = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}

    cmd = [
        sys.executable,
        "-m",
        "deepseek_ocr2_tpu.cli",
        "train",
        "--weights",
        str(assets / "tiny.safetensors"),
        "--tokenizer",
        str(assets / "tokenizer.json"),
        "--config",
        str(assets / "config.json"),
        "--data",
        str(assets / "data.jsonl"),
        "--seq-len",
        "16",
        "--lr",
        "1e-3",
    ] + cmd_extra
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra)
    r = subprocess.run(
        cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout
    assert "mesh: dp=4 mp=2 (8 devices)" in r.stdout
    losses = _losses(r.stdout)
    assert len(losses) == 3 and losses[-1] < losses[0], losses


def test_train_cli_sft_masked(assets, tmp_path):
    """prompt/completion JSONL selects the masked SFT loss; loss falls."""
    import json

    data = tmp_path / "sft.jsonl"
    with open(data, "w") as f:
        for p_, c_ in [("Free OCR.", "hello hello Free"), ("hello", "Free OCR.")]:
            f.write(json.dumps({"prompt": p_, "completion": c_}) + "\n")
    r = _train(
        assets,
        ["--steps", "4", "--data", str(data)],  # later --data wins in argparse
    )
    assert r.returncode == 0, r.stdout
    assert "masked SFT loss" in r.stdout
    losses = _losses(r.stdout)
    assert len(losses) == 4 and losses[-1] < losses[0], losses


def test_train_cli_mixed_formats_rejected(assets, tmp_path):
    import json

    data = tmp_path / "mixed.jsonl"
    with open(data, "w") as f:
        f.write(json.dumps({"text": "hello"}) + "\n")
        f.write(json.dumps({"prompt": "a", "completion": "b"}) + "\n")
    r = _train(assets, ["--steps", "1", "--data", str(data)])
    assert r.returncode != 0
    assert "mixes" in r.stdout
