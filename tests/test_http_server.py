"""OpenAI-compatible HTTP serving (serving/server.py): real requests over
a real socket against the tiny model, driven by the threaded continuous-
batching loop.

Role parity: the reference's distilabel generator talks to a vLLM
OpenAI-compatible server (open_r1/generate.py:22-54); this pins our
TPU-native equivalent end-to-end — schema, concurrency, error paths.
"""

import http.client
import json
import threading

import pytest
import jax
import jax.numpy as jnp

from spacer_tpu.data import MockTokenizer, VLProcessor
from spacer_tpu.models.qwen25_vl import init_params, tiny_config
from spacer_tpu.serving import OpenAIServer


@pytest.fixture(scope="module")
def server():
    cfg = tiny_config()
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    tok = MockTokenizer(vocab_size=cfg.text.vocab_size)
    proc = VLProcessor(tok, cfg, min_pixels=3136, max_pixels=12544)
    srv = OpenAIServer(
        cfg, params, proc, model_name="tiny", slots=2, prompt_len=64,
        max_new_tokens=16, temperature=0.0, chunk_steps=4,
        dtype=jnp.float32,
    )
    port = srv.start()
    yield srv, port
    srv.stop()


def _post(port, path, payload, timeout=300):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    body = json.dumps(payload)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_health_and_models(server):
    _, port = server
    status, out = _get(port, "/health")
    assert status == 200 and out["status"] == "ok"
    status, out = _get(port, "/v1/models")
    assert status == 200
    assert out["data"][0]["id"] == "tiny"


def test_chat_completion_schema(server):
    _, port = server
    status, out = _post(port, "/v1/chat/completions", {
        "model": "tiny",
        "messages": [{"role": "user", "content": "hello world"}],
        "max_tokens": 8,
    })
    assert status == 200, out
    assert out["object"] == "chat.completion"
    choice = out["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert isinstance(choice["message"]["content"], str)
    assert choice["finish_reason"] in ("stop", "length")
    usage = out["usage"]
    assert usage["prompt_tokens"] > 0
    assert usage["completion_tokens"] > 0
    assert usage["total_tokens"] == (usage["prompt_tokens"]
                                     + usage["completion_tokens"])


def test_plain_completions_endpoint(server):
    _, port = server
    status, out = _post(port, "/v1/completions", {
        "model": "tiny", "prompt": "tell me", "max_tokens": 6,
    })
    assert status == 200, out
    assert out["object"] == "text_completion"
    assert isinstance(out["choices"][0]["text"], str)


def test_concurrent_requests_share_the_ring(server):
    """Four concurrent requests against 2 slots: all finish, and the
    greedy outputs for identical prompts are identical regardless of the
    interleaving (determinism across slot assignment)."""
    _, port = server
    results = {}

    def worker(i):
        status, out = _post(port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "same prompt"}],
            "max_tokens": 8,
        })
        results[i] = (status, out)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(results) == 4
    texts = []
    for i, (status, out) in results.items():
        assert status == 200, out
        texts.append(out["choices"][0]["message"]["content"])
    assert len(set(texts)) == 1, texts  # temperature=0 => identical


def test_prompt_too_long_is_413(server):
    _, port = server
    status, out = _post(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "word " * 400}],
        "max_tokens": 4,
    })
    assert status == 413
    assert "bucket" in out["error"]


def test_malformed_request_fails_alone(server):
    """A request that fails host-side validation (out-of-vocab ids) must
    be rejected at submit time — NOT kill the serving loop, which treats
    any error past admission as device-state corruption."""
    import numpy as np

    srv, port = server
    vocab = srv.cfg.text.vocab_size
    bad = {
        "input_ids": np.array([[vocab + 5, 3, 4]], np.int32),
        "attention_mask": np.ones((1, 3), np.int32),
        "position_ids": np.broadcast_to(
            np.arange(3)[None, None], (3, 1, 3)).astype(np.int32),
    }
    with pytest.raises(ValueError, match="vocab_size"):
        srv.loop.submit(bad)
    # the loop survived: a well-formed HTTP request still completes
    status, out = _post(port, "/v1/chat/completions", {
        "model": "tiny",
        "messages": [{"role": "user", "content": "still alive?"}],
        "max_tokens": 4,
    })
    assert status == 200
    assert out["choices"][0]["finish_reason"] in ("stop", "length")


def test_n_generations_and_distill_tool_roundtrip(server):
    """OpenAI `n` (num_generations) returns n indexed choices, and the
    distill-data generator (tools/generate_distill_data.py, the
    reference's distilabel-pipeline role) round-trips against this server
    through its client interface."""
    import types

    from tools.generate_distill_data import generate_rows

    _, port = server
    status, out = _post(port, "/v1/chat/completions", {
        "model": "tiny", "n": 2,
        "messages": [{"role": "user", "content": "two please"}],
        "max_tokens": 4,
    })
    assert status == 200
    assert [c["index"] for c in out["choices"]] == [0, 1]
    assert all(c["message"]["content"] for c in out["choices"])

    class _ShimClient:
        """openai-SDK-shaped client over plain http (the SDK is not in
        this image; the wire schema is what we are testing)."""

        def __init__(self, port):
            self.chat = types.SimpleNamespace(
                completions=types.SimpleNamespace(create=self._create))
            self._port = port

        def _create(self, *, model, messages, **kw):
            status, out = _post(self._port, "/v1/chat/completions", {
                "model": model, "messages": messages,
                "max_tokens": kw.get("max_tokens"), "n": kw.get("n", 1),
            })
            assert status == 200
            return types.SimpleNamespace(choices=[
                types.SimpleNamespace(message=types.SimpleNamespace(
                    content=c["message"]["content"]))
                for c in out["choices"]
            ])

    rows = generate_rows(
        _ShimClient(port), "tiny", ["prompt one", "prompt two"],
        max_new_tokens=4, num_generations=2, workers=2,
    )
    assert len(rows) == 2
    for row in rows:
        assert len(row["generations"]) == 2


def test_streaming_chat_completion(server):
    """stream=true: chat.completion.chunk SSE events whose concatenated
    deltas equal the non-streaming answer (greedy server), terminated by
    a finish_reason chunk and `data: [DONE]`."""
    _, port = server
    payload = {"model": "tiny",
               "messages": [{"role": "user", "content": "stream this"}],
               "max_tokens": 8}
    status, plain = _post(port, "/v1/chat/completions", payload)
    assert status == 200
    expected = plain["choices"][0]["message"]["content"]

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/v1/chat/completions",
                 body=json.dumps({**payload, "stream": True}),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    events, done = [], False
    while True:
        line = resp.fp.readline()
        if not line:
            break
        line = line.decode().strip()
        if not line.startswith("data: "):
            continue
        data = line[len("data: "):]
        if data == "[DONE]":
            done = True
            break
        events.append(json.loads(data))
    conn.close()

    assert done
    assert all(e["object"] == "chat.completion.chunk" for e in events)
    assert events[0]["choices"][0]["delta"].get("role") == "assistant"
    text = "".join(e["choices"][0]["delta"].get("content", "")
                   for e in events)
    assert text == expected
    assert events[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_unknown_route_404(server):
    _, port = server
    status, out = _post(port, "/v1/embeddings", {"input": "x"})
    assert status == 404
