"""Full composite checkpoint round-trip: flat -> params -> flat is identity.

Pins the PyTorch weight-layout contract for every tower (the reference's
round-trip test covers only a toy model, tests/safetensors_pytorch_roundtrip.rs).
"""

import numpy as np

from deepseek_ocr2_tpu.configs import tiny_ocr2_config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2

import reference_torch_vision as refv


def test_ocr2_flat_roundtrip(tmp_path):
    cfg = tiny_ocr2_config()
    flat = refv.random_ocr2_flat(cfg, seed=31)
    params, report = ocr2.params_from_flat(flat, cfg)
    report.raise_on_errors()
    assert not report.missing

    flat2 = ocr2.flat_from_params(params, cfg)
    assert set(flat2) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat2[k], flat[k], err_msg=k)

    # And through a real safetensors file (convert-style save + reload).
    from deepseek_ocr2_tpu.io import load_flat, save_flat

    path = str(tmp_path / "ckpt.safetensors")
    save_flat(flat2, path)
    flat3 = load_flat(path)
    for k in flat:
        np.testing.assert_array_equal(flat3[k], flat[k], err_msg=k)
