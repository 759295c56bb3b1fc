"""HTTP serving front-end over the online continuous engine."""

import dataclasses
import io
import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from deepseek_ocr2_tpu.configs import tiny_ocr2_config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.runtime.continuous import ContinuousOCREngine
from deepseek_ocr2_tpu.runtime.http_server import OCRHttpServer
from deepseek_ocr2_tpu.runtime.pipeline import OCR2Pipeline

import reference_torch_vision as refv


def _tiny_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 2, "Free": 10, "OCR.": 11, "hello": 13}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return tok


@pytest.fixture(scope="module")
def served():
    cfg = dataclasses.replace(tiny_ocr2_config(), image_token_id=500)
    flat = refv.random_ocr2_flat(cfg, seed=21)
    params, report = ocr2.params_from_flat(flat, cfg)
    report.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    pipe = OCR2Pipeline(
        params, cfg, _tiny_tokenizer(), kv_dtype="float32", act_dtype="float32"
    )
    engine = ContinuousOCREngine(pipe, slots=2, capacity=128, chunk_steps=4)
    engine.start(ngram_size=3)
    server = OCRHttpServer(engine, port=0, include_token_ids=True)
    server.start_background()
    yield pipe, server
    server.shutdown()
    engine.stop(timeout=120)


def _png_bytes(img: Image.Image) -> bytes:
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _post(port, path, body, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=body,
        headers={"Content-Type": "image/png"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_http_ocr_token_exact(served):
    pipe, server = served
    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 256, (300, 500, 3), np.uint8))
    want = pipe.generate_ocr(img, max_new_tokens=6, ngram_size=3)

    out = _post(server.port, "/v1/ocr?max_new_tokens=6", _png_bytes(img))
    assert out["token_ids"] == want.token_ids
    assert out["text"] == want.text
    assert out["new_tokens"] == want.new_tokens


def test_http_concurrent_requests_batch(served):
    """Concurrent posts ride one continuous batch and all come back right."""
    import concurrent.futures

    pipe, server = served
    rng = np.random.default_rng(5)
    imgs = [
        Image.fromarray(rng.integers(0, 256, (120, 160, 3), np.uint8))
        for _ in range(4)
    ]
    wants = [pipe.generate_ocr(i, max_new_tokens=5, ngram_size=3) for i in imgs]

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(
            ex.map(
                lambda im: _post(
                    server.port, "/v1/ocr?max_new_tokens=5", _png_bytes(im)
                ),
                imgs,
            )
        )
    for want, out in zip(wants, outs):
        assert out["token_ids"] == want.token_ids


def test_http_health_and_stats(served):
    _, server = served
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=30
    ) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/v1/stats", timeout=30
    ) as r:
        stats = json.loads(r.read())
    assert stats["slots"] == 2
    assert stats["requests"] >= 1


def test_http_bad_image_400(served):
    _, server = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/v1/ocr", b"this is not an image")
    assert e.value.code == 400


def test_http_unknown_path_404(served):
    _, server = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/v1/nope", b"x")
    assert e.value.code == 404


def test_http_over_budget_request_400_engine_survives(served):
    pipe, server = served
    rng = np.random.default_rng(7)
    img = Image.fromarray(rng.integers(0, 256, (120, 160, 3), np.uint8))
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/v1/ocr?max_new_tokens=100000", _png_bytes(img))
    assert e.value.code == 400
    # engine still alive
    want = pipe.generate_ocr(img, max_new_tokens=4, ngram_size=3)
    out = _post(server.port, "/v1/ocr?max_new_tokens=4", _png_bytes(img))
    assert out["token_ids"] == want.token_ids


def _post_sse(port, path, body, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=body,
        headers={"Content-Type": "image/png"},
        method="POST",
    )
    events = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for line in r:
            line = line.strip()
            if line.startswith(b"data: "):
                events.append(json.loads(line[len(b"data: "):]))
    return events


def test_http_streaming_sse(served):
    """stream=1: SSE events reassemble exactly the non-streamed result."""
    pipe, server = served
    rng = np.random.default_rng(11)
    img = Image.fromarray(rng.integers(0, 256, (120, 160, 3), np.uint8))
    want = pipe.generate_ocr(img, max_new_tokens=6, ngram_size=3)

    events = _post_sse(
        server.port, "/v1/ocr?max_new_tokens=6&stream=1", _png_bytes(img)
    )
    assert len(events) >= 2, events
    final = events[-1]
    assert final.get("done") is True
    assert final["text"] == want.text
    assert final["new_tokens"] == want.new_tokens
    ids = [t for ev in events[:-1] for t in ev["token_ids"]]
    assert ids == want.token_ids[want.prompt_len:]
    text = "".join(ev["text_delta"] for ev in events[:-1])
    assert text.strip() == want.text


def test_http_streaming_bad_args_400(served):
    """A stream request failing admission validation must still 400."""
    pipe, server = served
    rng = np.random.default_rng(12)
    img = Image.fromarray(rng.integers(0, 256, (120, 160, 3), np.uint8))
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_sse(
            server.port,
            "/v1/ocr?max_new_tokens=100000&stream=1",
            _png_bytes(img),
        )
    assert e.value.code == 400
