"""Online serving: a threaded continuous-batching loop + an
OpenAI-compatible HTTP front-end (stdlib only).

Role parity: the reference ecosystem serves its models through vLLM's
OpenAI-compatible server — the distilabel data generator explicitly
targets one (SpaceR-SG-RLVR open_r1/generate.py:22-54, OpenAI client +
base_url).  This module supplies that surface TPU-natively: requests
arrive on ordinary HTTP handler threads, are queued, and a single
serving thread drives the clock-ring ContinuousBatcher (admission →
chunked decode → retirement) so ALL device work stays on one thread
while finished slots refill mid-flight between concurrent requests.

Endpoints (ThreadingHTTPServer):
  GET  /health                 -> {"status": "ok"}
  GET  /v1/models              -> model listing
  POST /v1/chat/completions    -> OpenAI chat schema (non-streaming)
  POST /v1/completions         -> plain-prompt variant

Deployment-shaped constraints (documented, not hidden): one server
instance = one compiled geometry (prompt_len/max_tokens buckets) and one
sampling temperature, like a dedicated inference deployment; prompts
longer than the bucket get HTTP 413.  Multimodal content rides the
processor's own message schema ({"type": "video"|"image", ...} entries,
plus OpenAI-style {"type": "image_url"} which is translated).
"""

from __future__ import annotations

import itertools
import json
import queue as _queue
import threading
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class _Pending:
    __slots__ = ("event", "output", "error", "tokens", "pushed")

    def __init__(self, stream: bool = False):
        self.event = threading.Event()
        self.output = None
        self.error: Optional[str] = None
        # streaming requests get a token feed: items are
        # ("tokens", list[int]) | ("done", ServedOutput) | ("error", str)
        self.tokens = _queue.Queue() if stream else None
        self.pushed = 0   # emitted tokens already fed (loop thread only)


class ServingLoop:
    """Single background thread driving a ContinuousBatcher.

    submit() is thread-safe and returns a handle; result(handle) blocks
    until that request retires.  The loop admits from the queue whenever
    slots free up, so concurrent requests share decode programs.
    """

    def __init__(self, batcher):
        self.batcher = batcher
        self._cv = threading.Condition()
        self._queue: deque = deque()
        self._stop = False
        self._died: Optional[str] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="spacer-serving-loop")
        self._thread.start()

    def submit(self, request: dict, max_new_tokens: Optional[int] = None,
               stream: bool = False) -> _Pending:
        # validate on the CALLER's thread: a malformed request (OOV ids,
        # over-bucket prompt) raises here and fails alone, instead of
        # raising inside the loop thread's admission wave where any error
        # is treated as device-state corruption and kills the whole server
        self.batcher.validate_request(request)
        pending = _Pending(stream=stream)
        budget = self.batcher.budget_of(request, max_new_tokens)
        with self._cv:
            if self._stop:
                raise RuntimeError(
                    "serving loop stopped"
                    + (f" (died: {self._died})" if self._died else ""))
            self._queue.append((pending, request, budget))
            self._cv.notify()
        return pending

    def result(self, pending: _Pending, timeout: Optional[float] = None):
        if not pending.event.wait(timeout):
            raise TimeoutError("request did not finish in time")
        if pending.error:
            raise RuntimeError(pending.error)
        return pending.output

    def shutdown(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=60)

    # -- loop thread ------------------------------------------------------

    def _run(self):
        b = self.batcher
        while True:
            with self._cv:
                while not self._queue and not b.has_active():
                    if self._stop:
                        # fail whatever never got admitted
                        return
                    self._cv.wait(timeout=0.5)
                admissions = []
                for slot in b.free_slots():
                    if not self._queue:
                        break
                    pending, req, budget = self._queue.popleft()
                    admissions.append((pending, req, budget, slot))
            try:
                if admissions:
                    b.admit(admissions)
                b.decode_chunk()
                for pending, served in b.poll_finished():
                    pending.output = served
                    if pending.tokens is not None:
                        # the final text comes from `served`; no need to
                        # flush the last progress delta separately
                        pending.tokens.put(("done", served))
                    pending.event.set()
                # feed in-flight streaming requests (one host fetch of the
                # token buffer per chunk, only when someone is streaming)
                if any(isinstance(t, _Pending) and t.tokens is not None
                       for t in b._slot_req):
                    for tag, toks, t in b.poll_progress():
                        if (isinstance(tag, _Pending)
                                and tag.tokens is not None
                                and t > tag.pushed):
                            tag.tokens.put(
                                ("tokens", toks[tag.pushed:t].tolist()))
                            tag.pushed = t
            except Exception as e:  # noqa: BLE001
                # a failed device program means the ring state can no longer
                # be trusted: fail EVERYTHING (this wave's admissions,
                # in-flight slots, the queue), mark the loop dead so
                # submit() raises immediately, and exit the thread —
                # nothing is left hanging until its request_timeout
                msg = f"{type(e).__name__}: {e}"
                dead = list(admissions)
                for slot, tag in enumerate(b._slot_req):
                    if tag is not None:
                        dead.append((tag, None, None, slot))
                        b._slot_req[slot] = None
                with self._cv:
                    self._died = msg
                    self._stop = True
                    while self._queue:
                        pending, _req, _budget = self._queue.popleft()
                        dead.append((pending, None, None, None))
                for pending, _req, _budget, _slot in dead:
                    if isinstance(pending, _Pending):
                        pending.error = msg
                        if pending.tokens is not None:
                            pending.tokens.put(("error", msg))
                        pending.event.set()
                return


def _to_processor_content(content) -> list:
    """OpenAI message content -> processor content list."""
    if isinstance(content, str):
        return [{"type": "text", "text": content}]
    out = []
    for item in content:
        kind = item.get("type")
        if kind == "image_url":
            url = item["image_url"]
            if isinstance(url, dict):
                url = url.get("url", "")
            out.append({"type": "image", "image": url})
        else:
            out.append(dict(item))
    return out


def encode_chat(processor, cfg, messages: list) -> dict:
    """OpenAI-schema messages -> a ContinuousBatcher request dict (the
    shared registry.encode_request path, after content normalization)."""
    from spacer_tpu.models.registry import encode_request

    norm = [{"role": m.get("role", "user"),
             "content": _to_processor_content(m.get("content", ""))}
            for m in messages]
    return encode_request(processor, cfg, norm)


class OpenAIServer:
    """stdlib HTTP server speaking the OpenAI completion schema."""

    def __init__(self, cfg, params, processor, *, model_name: str = "spacer",
                 slots: int = 4, prompt_len: int = 1024,
                 max_new_tokens: int = 512, temperature: float = 0.01,
                 top_p: float = 1.0, chunk_steps: int = 16,
                 decode_quant: Optional[str] = None,
                 decode_impl: Optional[str] = None,
                 speculate_k: int = 0,
                 request_timeout: float = 600.0, dtype=None):
        from spacer_tpu.serving.batcher import ContinuousBatcher

        if dtype is None:
            dtype = params["model"]["embed_tokens"]["embedding"].dtype
        self.cfg = cfg
        self.processor = processor
        self.model_name = model_name
        self.prompt_len = prompt_len
        self.request_timeout = request_timeout
        self._ids = itertools.count()
        self.batcher = ContinuousBatcher(
            cfg, params, slots=slots, prompt_len=prompt_len,
            max_new_tokens=max_new_tokens,
            eos_token_id=processor.eos_token_id,
            pad_token_id=processor.pad_token_id,
            temperature=temperature, top_p=top_p, chunk_steps=chunk_steps,
            decode_quant=decode_quant, decode_impl=decode_impl,
            speculate_k=speculate_k, dtype=dtype,
        )
        self.loop = ServingLoop(self.batcher)
        self._httpd: Optional[ThreadingHTTPServer] = None

    # -- request handling --------------------------------------------------

    def _encode(self, messages: list, max_tokens: Optional[int]):
        req = encode_chat(self.processor, self.cfg, messages)
        n_prompt = int(req["attention_mask"].sum())
        if req["input_ids"].shape[1] > self.prompt_len:
            raise _HttpError(
                413, f"prompt length {req['input_ids'].shape[1]} exceeds "
                     f"this deployment's bucket {self.prompt_len}")
        if max_tokens:
            req["max_new_tokens"] = int(max_tokens)
        return req, n_prompt

    def _decode_text(self, token_ids) -> str:
        return self.processor.tokenizer.batch_decode(
            [np.asarray(token_ids)], skip_special_tokens=True)[0]

    def _complete(self, messages: list, max_tokens: Optional[int],
                  n: int = 1) -> dict:
        """n > 1 (OpenAI `n`, the distilabel generator's num_generations,
        reference open_r1/generate.py:33-41): the prompt is submitted n
        times and the slots decode the copies concurrently."""
        req, n_prompt = self._encode(messages, max_tokens)
        n = max(1, int(n or 1))
        try:
            pendings = [self.loop.submit(dict(req)) for _ in range(n)]
        except ValueError as e:
            raise _HttpError(400, str(e))
        choices, total_completion = [], 0
        for i, pending in enumerate(pendings):
            served = self.loop.result(pending, timeout=self.request_timeout)
            text = self._decode_text(served.sequences[:served.length])
            finish = ("length"
                      if served.length >= self.batcher.budget_of(req)
                      else "stop")
            choices.append({
                "index": i,
                "message": {"role": "assistant", "content": text},
                "finish_reason": finish,
            })
            total_completion += int(served.length)
        return {
            "id": f"chatcmpl-{next(self._ids)}",
            "object": "chat.completion",
            "model": self.model_name,
            "choices": choices,
            "usage": {
                "prompt_tokens": n_prompt,
                "completion_tokens": total_completion,
                "total_tokens": n_prompt + total_completion,
            },
        }

    # -- http plumbing ------------------------------------------------------

    def serve_forever(self, host: str = "127.0.0.1", port: int = 8000):
        self._httpd = ThreadingHTTPServer((host, port), self._handler())
        try:
            self._httpd.serve_forever()
        finally:
            self.loop.shutdown()

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Non-blocking start (tests); returns the bound port."""
        self._httpd = ThreadingHTTPServer((host, port), self._handler())
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
        self.loop.shutdown()

    def _handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    return self._send(200, {"status": "ok"})
                if self.path == "/v1/models":
                    return self._send(200, {
                        "object": "list",
                        "data": [{"id": server.model_name,
                                  "object": "model"}],
                    })
                return self._send(404, {"error": "not found"})

            def _sse_chat(self, body: dict):
                """OpenAI streaming (`stream: true`): chat.completion.chunk
                events over text/event-stream, closed by `data: [DONE]`.
                Deltas are string diffs of the cumulatively-decoded tokens,
                so multi-token characters never split mid-sequence."""
                import time as _time

                if int(body.get("n", 1) or 1) > 1:
                    return self._send(
                        400, {"error": "stream does not support n > 1"})
                try:
                    req, _ = server._encode(body.get("messages", []),
                                            body.get("max_tokens"))
                    pending = server.loop.submit(req, stream=True)
                except _HttpError as e:
                    return self._send(e.code, {"error": e.message})
                except ValueError as e:
                    return self._send(400, {"error": str(e)})
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                cid = f"chatcmpl-{next(server._ids)}"

                def chunk(delta: dict, finish=None):
                    payload = {
                        "id": cid, "object": "chat.completion.chunk",
                        "model": server.model_name,
                        "choices": [{"index": 0, "delta": delta,
                                     "finish_reason": finish}],
                    }
                    self.wfile.write(
                        f"data: {json.dumps(payload)}\n\n".encode())
                    self.wfile.flush()

                chunk({"role": "assistant"})
                sent, toks = "", []
                deadline = _time.time() + server.request_timeout
                while True:
                    try:
                        kind, val = pending.tokens.get(
                            timeout=max(1.0, deadline - _time.time()))
                    except _queue.Empty:
                        chunk({}, finish="error")
                        break
                    if kind == "error":
                        chunk({}, finish="error")
                        break
                    if kind == "tokens":
                        toks.extend(val)
                        text = server._decode_text(toks)
                    else:  # done
                        served = val
                        text = server._decode_text(
                            served.sequences[:served.length])
                    delta = (text[len(sent):] if text.startswith(sent)
                             else text)
                    if delta:
                        chunk({"content": delta})
                        sent = text
                    if kind == "done":
                        finish = ("length" if served.length
                                  >= server.batcher.budget_of(req)
                                  else "stop")
                        chunk({}, finish=finish)
                        self.wfile.write(b"data: [DONE]\n\n")
                        self.wfile.flush()
                        break

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if (self.path == "/v1/chat/completions"
                            and body.get("stream")):
                        return self._sse_chat(body)
                    if self.path == "/v1/chat/completions":
                        out = server._complete(
                            body.get("messages", []),
                            body.get("max_tokens"),
                            n=body.get("n", 1))
                    elif self.path == "/v1/completions":
                        messages = [{"role": "user",
                                     "content": body.get("prompt", "")}]
                        out = server._complete(messages,
                                               body.get("max_tokens"),
                                               n=body.get("n", 1))
                        out["object"] = "text_completion"
                        out["choices"] = [{
                            "index": c["index"],
                            "text": c["message"]["content"],
                            "finish_reason": c["finish_reason"],
                        } for c in out["choices"]]
                    else:
                        return self._send(404, {"error": "not found"})
                    return self._send(200, out)
                except _HttpError as e:
                    return self._send(e.code, {"error": e.message})
                except Exception as e:  # noqa: BLE001
                    return self._send(
                        500, {"error": f"{type(e).__name__}: {e}"})

        return Handler


class _HttpError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code
        self.message = message
