"""HTTP front-end for the online continuous OCR engine (stdlib only).

Production-serving surface over ContinuousOCREngine's online mode: requests
POST an image and block on its OCRRequest future while the engine batches
them continuously with whatever else is in flight. The reference has no
serving tier at all (single-shot CLI, batch=1 — deepseek_ocr2.rs:140); this
is the north-star "batched multi-page serving" (BASELINE configs #4/#5)
exposed as a service.

Endpoints:
- POST /v1/ocr   body = image bytes (PNG/JPEG/...); query params:
                 prompt, max_new_tokens, no_crop, rotate, auto_rotate,
                 timeout (seconds). 200 -> JSON result; 400 bad image/args;
                 504 timeout.
                 With `stream=1`: Server-Sent Events (text/event-stream) —
                 one `data: {"text_delta": ..., "n_tokens": ...}` event per
                 decode chunk (plus `token_ids` when the server was built
                 with include_token_ids), then a final
                 `data: {"done": true, ...result stats...}` event. Errors
                 after the stream opens arrive as `data: {"error": ...}`.
- GET  /healthz  liveness.
- GET  /v1/stats engine/serving counters.

Threading model: http.server.ThreadingHTTPServer gives one handler thread
per connection; handlers only enqueue work and wait on futures, so the
device loop (the engine's serve thread) is never blocked by slow clients.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

from PIL import Image

from .continuous import ContinuousOCREngine


def _bool_arg(q, name: str, default: bool = False) -> bool:
    v = q.get(name, [None])[0]
    if v is None:
        return default
    return v.lower() not in ("0", "false", "no", "")


class OCRHttpServer:
    """Serve an already-started online ContinuousOCREngine over HTTP."""

    def __init__(
        self,
        engine: ContinuousOCREngine,
        host: str = "127.0.0.1",
        port: int = 8000,
        include_token_ids: bool = False,
        default_timeout: float = 600.0,
    ):
        self.engine = engine
        self.include_token_ids = include_token_ids
        self.default_timeout = default_timeout
        self.n_requests = 0
        self.n_errors = 0
        self.started = time.time()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet by default
                pass

            def _json(self, code: int, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = urlparse(self.path).path
                if path == "/healthz":
                    return self._json(200, {"status": "ok"})
                if path == "/v1/stats":
                    return self._json(200, outer.stats())
                return self._json(404, {"error": "not found"})

            def do_POST(self):
                url = urlparse(self.path)
                if url.path != "/v1/ocr":
                    return self._json(404, {"error": "not found"})
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    raw = self.rfile.read(n)
                    q = parse_qs(url.query)
                    image = Image.open(io.BytesIO(raw))
                    image.load()  # decode NOW so bad bytes 400 here
                    kwargs = dict(
                        prompt=q.get("prompt", [None])[0],
                        max_new_tokens=int(
                            q.get("max_new_tokens", ["512"])[0]
                        ),
                        no_crop=_bool_arg(q, "no_crop"),
                        rotate=int(q.get("rotate", ["0"])[0]),
                        auto_rotate=_bool_arg(q, "auto_rotate"),
                    )
                    timeout = float(
                        q.get("timeout", [str(outer.default_timeout)])[0]
                    )
                    stream = _bool_arg(q, "stream")
                except Exception as e:
                    outer.n_errors += 1
                    return self._json(400, {"error": f"bad request: {e}"})
                if stream:
                    return self._stream_ocr(image, kwargs, timeout)
                try:
                    fut = outer.engine.submit(image, **kwargs)
                    res = fut.result(timeout=timeout)
                except TimeoutError:
                    outer.n_errors += 1
                    return self._json(504, {"error": "generation timed out"})
                except ValueError as e:
                    # Per-request validation failures (bad prompt, budget
                    # over engine capacity) are client errors.
                    outer.n_errors += 1
                    return self._json(400, {"error": str(e)})
                except Exception as e:
                    outer.n_errors += 1
                    return self._json(500, {"error": str(e)})
                outer.n_requests += 1
                out = {
                    "text": res.text,
                    "new_tokens": res.new_tokens,
                    "prompt_len": res.prompt_len,
                    "prefill_seconds": res.prefill_seconds,
                    "decode_seconds": res.decode_seconds,
                }
                if outer.include_token_ids:
                    out["token_ids"] = res.token_ids
                return self._json(200, out)

            def _stream_ocr(self, image, kwargs, timeout):
                """SSE: one event per decode chunk, then a final done event.
                No Content-Length, so the connection closes at end-of-stream
                (Connection: close keeps HTTP/1.1 framing valid)."""
                from .continuous import _TextStream

                try:
                    fut = outer.engine.submit(image, stream=True, **kwargs)
                except ValueError as e:
                    outer.n_errors += 1
                    return self._json(400, {"error": str(e)})
                except Exception as e:
                    outer.n_errors += 1
                    return self._json(500, {"error": str(e)})
                # Pull the FIRST chunk before committing to SSE: admission
                # validation failures (bad prompt, over-capacity budget)
                # resolve through the future, and deferring the headers maps
                # them to proper HTTP status codes instead of a mid-stream
                # error event.
                gen = fut.stream_token_ids(timeout=timeout)
                first = None
                try:
                    first = next(gen)
                except StopIteration:
                    pass  # finished without a streamed chunk
                except TimeoutError:
                    outer.n_errors += 1
                    return self._json(504, {"error": "generation timed out"})
                except ValueError as e:
                    outer.n_errors += 1
                    return self._json(400, {"error": str(e)})
                except Exception as e:
                    outer.n_errors += 1
                    return self._json(500, {"error": str(e)})
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "close")
                self.end_headers()

                def sse(obj):
                    self.wfile.write(
                        b"data: " + json.dumps(obj).encode() + b"\n\n"
                    )
                    self.wfile.flush()

                pipe = outer.engine.pipe
                ts = _TextStream(pipe.tokenizer, pipe.cfg.stop_string)
                deadline = time.time() + timeout

                def emit(ids):
                    ev = {"text_delta": ts.push(ids), "n_tokens": len(ids)}
                    if outer.include_token_ids:
                        ev["token_ids"] = ids
                    sse(ev)

                try:
                    if first is not None:
                        emit(first)
                    for ids in gen:
                        emit(ids)
                    res = fut.result(timeout=max(0.0, deadline - time.time()))
                except TimeoutError:
                    outer.n_errors += 1
                    return self._try_sse(sse, {"error": "generation timed out"})
                except OSError:
                    # Client went away mid-stream; generation completes in
                    # the engine regardless.
                    outer.n_errors += 1
                    return
                except Exception as e:
                    outer.n_errors += 1
                    return self._try_sse(sse, {"error": str(e)})
                outer.n_requests += 1
                self._try_sse(
                    sse,
                    {
                        "done": True,
                        "text": res.text,
                        "new_tokens": res.new_tokens,
                        "prompt_len": res.prompt_len,
                        "prefill_seconds": res.prefill_seconds,
                        "decode_seconds": res.decode_seconds,
                    },
                )

            @staticmethod
            def _try_sse(sse, obj):
                try:
                    sse(obj)
                except OSError:
                    pass  # client already gone

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def stats(self) -> dict:
        e = self.engine
        return {
            "requests": self.n_requests,
            "errors": self.n_errors,
            "uptime_seconds": time.time() - self.started,
            "slots": e.slots,
            "pool_tokens": e.pool_tokens,
            "page_size": e.page_size,
            "lookup_chunk": e.lookup_chunk,
            "preempted": e.last_preempted,
            "lookup_forwards": e.last_lookup_forwards,
        }

    def start_background(self):
        """Serve on a daemon thread (tests / embedding)."""
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
