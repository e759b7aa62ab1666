"""HTTP serving daemon (``serve.py``) over a tiny AOT artifact.

Spins the ThreadingHTTPServer on an ephemeral port and exercises the
request surface end to end: health, generation (PNG round trip), input
validation, unknown routes.
"""
import base64
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.aot import AOTPipeline, export_text2img
from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
from sdxl_training_improvements_tpu.serve import build_server


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    model = SDXLModel.create(
        tiny=True, dtype=jnp.float32, init_rng=jax.random.key(0),
        init_components=("unet", "vae", "clip_l", "clip_g"))
    pipe = SDXLPipeline.from_model(model)
    art = export_text2img(pipe, tmp_path_factory.mktemp("aot"), batch=1,
                          height=32, width=32, num_inference_steps=2,
                          platforms=("cpu",))
    aot = AOTPipeline.load(art, model.params, pipe.tokenizers)
    server = build_server(aot, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}"
    server.shutdown()
    server.server_close()
    thread.join(timeout=10)


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestServe:
    def test_healthz(self, server_url):
        with urllib.request.urlopen(server_url + "/healthz",
                                    timeout=60) as r:
            body = json.loads(r.read())
        assert body["ok"] is True
        assert body["meta"]["batch"] == 1
        assert body["meta"]["num_inference_steps"] == 2

    def test_generate_png_roundtrip(self, server_url):
        from PIL import Image
        status, body = _post(server_url + "/generate",
                             {"prompts": ["a cat"], "seed": 7,
                              "guidance_scale": 3.0})
        assert status == 200 and body["seed"] == 7
        raw = base64.b64decode(body["images"][0])
        img = np.asarray(Image.open(io.BytesIO(raw)))
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8

    def test_deterministic_per_seed(self, server_url):
        a = _post(server_url + "/generate",
                  {"prompts": ["x"], "seed": 1})[1]["images"][0]
        b = _post(server_url + "/generate",
                  {"prompts": ["x"], "seed": 1})[1]["images"][0]
        c = _post(server_url + "/generate",
                  {"prompts": ["x"], "seed": 2})[1]["images"][0]
        assert a == b
        assert a != c

    def test_batch_mismatch_is_400(self, server_url):
        status, body = _post(server_url + "/generate",
                             {"prompts": ["a", "b"]})
        assert status == 400
        assert body["artifact_batch"] == 1

    def test_bad_payloads_are_400(self, server_url):
        assert _post(server_url + "/generate", {})[0] == 400
        assert _post(server_url + "/generate", {"prompts": "x"})[0] == 400
        assert _post(server_url + "/generate", {"prompts": [3]})[0] == 400

    def test_type_errors_are_400(self, server_url):
        """seed: null / non-numeric guidance / bare-string negative_prompts
        must be 4xx client errors, not 500s (round-3 advisor finding)."""
        assert _post(server_url + "/generate",
                     {"prompts": ["x"], "seed": None})[0] == 400
        assert _post(server_url + "/generate",
                     {"prompts": ["x"], "guidance_scale": [1.0]})[0] == 400
        status, body = _post(server_url + "/generate",
                             {"prompts": ["x"],
                              "negative_prompts": "blurry"})
        assert status == 400
        assert "negative_prompts" in body["error"]

    def test_concurrent_clients(self, server_url):
        """Two clients in flight at once: both succeed, device execution is
        serialized by the runner lock, results stay seed-deterministic."""
        results = {}

        def hit(name, seed):
            results[name] = _post(server_url + "/generate",
                                  {"prompts": ["x"], "seed": seed})

        threads = [threading.Thread(target=hit, args=(f"c{i}", i % 2))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert all(r[0] == 200 for r in results.values()), results
        # same-seed requests agree even under concurrency
        assert (results["c0"][1]["images"][0]
                == results["c2"][1]["images"][0])

    def test_unknown_routes_404(self, server_url):
        assert _post(server_url + "/nope", {})[0] == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(server_url + "/nope", timeout=60)
        assert ei.value.code == 404
