"""The HTTP serving front end (nwhead_tpu/utils/httpd.py + serve.py --http).

The reference has no serving layer (predict is called from its train/eval
loop, nwhead/nw.py:127-160); these tests drive the deployment front end
end-to-end over a real socket: JSON predicts through the MicroBatcher,
live add_support/remove_support bank edits between requests, operational
endpoints, and the error surface.
"""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


def _post(url, obj=None, body=None, ctype="application/json"):
    data = body if body is not None else json.dumps(obj or {}).encode()
    req = urllib.request.Request(url, data=data, headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def server():
    """A live HTTP server over a tiny synthetic net (CPU)."""
    import argparse

    import serve
    from nwhead_tpu.utils.batching import MicroBatcher
    from nwhead_tpu.utils.httpd import NWHttpServer

    args = argparse.Namespace(
        dataset="synthetic", data_dir="./", arch="resnet10", ckpt=None,
        pretrained_path=None, batch_size=8, kernel_type="euclidean",
        proj_dim=0, n_shot_full=5, bf16=False, head_precision="f32",
        featurizer_precision="f32", calib_images=16, fused_inference=False,
        workers=2, decoder="pil", seed=0, bank_cache=None, mesh=None,
        serve_mode="full", ivf_probe=32, ivf_group=None,
    )
    net, variables, train_ds, val_ds = serve.build_server(args)
    fn = serve.serving_fn(net, variables, uint8_normalize=False)
    srv = NWHttpServer(
        net, variables, None,
        input_shape=tuple(np.asarray(val_ds.gather(np.arange(1))).shape[1:]),
        topk=3, host="127.0.0.1", port=0,
    )
    srv.batcher = MicroBatcher(fn, max_batch=8, max_wait_ms=5.0)
    srv.start()
    try:
        yield srv, net, variables, val_ds
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_healthz(server):
    srv, net, _, _ = server
    h = _get(f"http://127.0.0.1:{srv.port}/healthz")
    assert h["ok"] is True
    assert h["bank_rows"] == len(net.full_y)
    assert h["n_classes"] == net.n_classes


def test_predict_matches_direct_full_mode(server):
    srv, net, variables, val_ds = server
    x = np.asarray(val_ds.gather(np.arange(4)))
    out = _post(
        f"http://127.0.0.1:{srv.port}/predict",
        {"inputs": x.tolist(), "topk": 3},
    )
    preds = out["predictions"]
    assert len(preds) == 4
    direct = np.asarray(net.predict(variables, x, "full"))
    for p, row in zip(preds, direct):
        assert p["label"] == int(np.argmax(row))
        assert len(p["topk"]) == 3
        # probs are exp(log-probs) of the same serving path
        assert p["topk"][0]["prob"] == pytest.approx(
            float(np.exp(row.max())), rel=1e-3
        )


def test_concurrent_requests_coalesce(server):
    srv, _, _, val_ds = server
    x = np.asarray(val_ds.gather(np.arange(8)))
    results = [None] * 8

    def one(i):
        results[i] = _post(
            f"http://127.0.0.1:{srv.port}/predict",
            {"inputs": [x[i].tolist()]},
        )["predictions"][0]

    threads = [threading.Thread(target=one, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and "label" in r for r in results)
    stats = _get(f"http://127.0.0.1:{srv.port}/stats")
    assert stats["items"] >= 8
    assert stats["device_batches"] >= 1
    assert "latency_ms" in stats


def test_add_and_remove_support_live(server):
    srv, net, variables, val_ds = server
    url = f"http://127.0.0.1:{srv.port}"
    before = _get(f"{url}/healthz")["bank_rows"]

    new = np.asarray(val_ds.gather(np.arange(3)))
    out = _post(f"{url}/add_support",
                {"inputs": new.tolist(), "labels": [0, 1, 2]})
    assert out["ok"] and out["bank_rows"] == before + 3

    # predictions still flow after the edit (new bank shape recompiles once)
    q = np.asarray(val_ds.gather(np.arange(2)))
    preds = _post(f"{url}/predict", {"inputs": q.tolist()})["predictions"]
    assert len(preds) == 2

    # remove the rows we just added (they landed at the tail of env 0,
    # which is the whole bank here)
    rows = list(range(before, before + 3))
    out = _post(f"{url}/remove_support", {"rows": rows})
    assert out["ok"] and out["bank_rows"] == before
    preds = _post(f"{url}/predict", {"inputs": q.tolist()})["predictions"]
    assert len(preds) == 2


def test_error_surface(server):
    srv, _, _, val_ds = server
    url = f"http://127.0.0.1:{srv.port}"

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{url}/predict", {"nothing": 1})
    assert e.value.code == 400

    # wrong input shape -> 400 with a clear message, not a device error
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{url}/predict", {"inputs": [[1.0, 2.0]]})
    assert e.value.code == 400
    assert "shape" in json.loads(e.value.read())["error"]

    # image payload on a server built without a decoder -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{url}/predict", body=b"\xff\xd8notajpeg", ctype="image/jpeg")
    assert e.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{url}/add_support", {"inputs": [[1.0]]})
    assert e.value.code == 400  # missing labels

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{url}/nope")
    assert e.value.code == 404

    stats = _get(f"{url}/stats")
    assert stats["errors"] >= 4


def test_image_decode_paths():
    """images_b64 / raw-jpeg bodies route through decode_query; add_support
    images through decode_support (unit level — no real image dataset on
    this box)."""
    from PIL import Image
    import io

    from nwhead_tpu.utils.httpd import NWHttpServer

    decoded = []

    def fake_decode(b):
        img = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
        decoded.append(img.shape)
        return img.astype(np.float32)

    class FakeBatcher:
        def submit(self, item):
            from concurrent.futures import Future

            f = Future()
            f.set_result(np.log(np.full(4, 0.25)))
            return f

    srv = NWHttpServer(None, None, FakeBatcher(),
                       decode_query=fake_decode, port=0)
    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, format="JPEG")
    jpeg = buf.getvalue()

    out = srv.predict("image/jpeg", jpeg)
    assert out["predictions"][0]["label"] == 0
    out = srv.predict(
        "application/json",
        json.dumps({"images_b64": [base64.b64encode(jpeg).decode()] * 2}).encode(),
    )
    assert len(out["predictions"]) == 2
    assert decoded == [(16, 16, 3)] * 3
    srv.httpd.server_close()

    # frozen server (no net): edits refuse cleanly
    srv2 = NWHttpServer(None, None, FakeBatcher(), port=0)
    with pytest.raises(ValueError):
        srv2.add_support(json.dumps({"inputs": [[1]], "labels": [0]}).encode())
    srv2.httpd.server_close()
