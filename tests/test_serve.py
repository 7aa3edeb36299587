"""Serving stack: controller registry/dispatch + worker streaming
end-to-end over real HTTP."""

import json
import threading
import time

import jax
import numpy as np
import pytest

requests = pytest.importorskip("requests")

from medplib_tpu.config import MedplibConfig
from medplib_tpu.models import medplib
from medplib_tpu.serve import controller as ctl
from medplib_tpu.serve import protocol
from medplib_tpu.serve import worker as wk


def _free_port():
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture()
def controller_server():
    port = _free_port()
    httpd = ctl.serve("127.0.0.1", port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", httpd
    httpd.controller.shutdown()
    httpd.shutdown()


def test_register_dispatch_and_expiry(controller_server):
    url, httpd = controller_server
    for name, q in (("http://w1", 5), ("http://w2", 1)):
        r = requests.post(url + "/register_worker", json={
            "worker_name": name, "check_heart_beat": True,
            "worker_status": {"model_names": ["m"], "speed": 1.0,
                              "queue_length": q}})
        assert r.json()["ok"]
    assert requests.post(url + "/list_models", json={}).json()[
        "models"] == ["m"]
    # shortest queue picks w2
    addr = requests.post(url + "/get_worker_address",
                         json={"model": "m"}).json()["address"]
    assert addr == "http://w2"
    # heartbeat for unknown worker -> exist False
    r = requests.post(url + "/receive_heart_beat",
                      json={"worker_name": "http://nope"})
    assert r.json()["exist"] is False
    # force expiry
    httpd.controller.workers["http://w1"].last_heart_beat = 0
    httpd.controller.remove_stale_workers_by_expiration()
    assert "http://w1" not in httpd.controller.workers


def test_lottery_dispatch():
    c = ctl.Controller("lottery")
    c.register_worker("a", False, {"model_names": ["m"], "speed": 1.0,
                                   "queue_length": 0})
    c.register_worker("b", False, {"model_names": ["m"], "speed": 0.0,
                                   "queue_length": 0})
    np.random.seed(0)
    picks = {c.get_worker_address("m") for _ in range(20)}
    assert picks == {"a"}  # zero-speed worker never picked
    assert c.get_worker_address("other") == ""
    c.shutdown()


class FakeTok:
    bos_token_id = 1
    pad_token_id = 0
    eos_token_id = 2
    model_max_length = 512

    def __call__(self, text, add_special_tokens=True):
        ids = ([1] if add_special_tokens else []) + [
            3 + (hash(w) % 300) for w in text.split()]
        class R:
            pass
        r = R()
        r.input_ids = ids
        return r

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(f"tok{t}" for t in ids)


@pytest.mark.slow
def test_worker_generate_stream_end_to_end():
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    worker = wk.ModelWorker(cfg, params, FakeTok(), max_seq_len=48,
                            max_new_tokens=4)
    # match tiny config shapes
    worker.cc.image_tokens = cfg.vision.num_patches
    worker.cc.sam_image_size = cfg.sam.image_size
    worker.cc.clip_image_size = cfg.vision.image_size

    port = _free_port()
    httpd = wk.serve(worker, "127.0.0.1", port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        img = (np.random.default_rng(0).uniform(0, 255, (64, 80, 3))
               ).astype(np.uint8)
        payload = {
            "prompt": "USER: <image>\nWhat is this? ASSISTANT:",
            "images": [protocol.encode_image_b64(img)],
        }
        r = requests.post(f"http://127.0.0.1:{port}/worker_generate_stream",
                          json=payload, timeout=600)
        chunks = list(protocol.stream_chunks(r.content))
        assert len(chunks) >= 1
        final = chunks[-1]
        assert final["error_code"] == 0
        assert isinstance(final["text"], str) and final["text"]
        # mask ships as sparse coords decodable to the original size
        if final["mask"]:
            m = protocol.decode_sparse_mask(
                final["mask"], int(final["height"]), int(final["width"]))
            assert m.shape == (64, 80)
        status = requests.post(
            f"http://127.0.0.1:{port}/worker_get_status", json={}).json()
        assert status["model_names"] == ["medplib-tpu"]
        assert status["queue_length"] == 0

        # temperature < 1e-4 routes to greedy (model_worker.py:420-425):
        # two identical requests must stream identical text
        greedy_payload = dict(payload, temperature=0.0)
        t1 = list(protocol.stream_chunks(requests.post(
            f"http://127.0.0.1:{port}/worker_generate_stream",
            json=greedy_payload, timeout=600).content))[-1]["text"]
        t2 = list(protocol.stream_chunks(requests.post(
            f"http://127.0.0.1:{port}/worker_generate_stream",
            json=greedy_payload, timeout=600).content))[-1]["text"]
        assert t1 == t2 and t1

        # sampled request with a seed is honored and reproducible
        samp = dict(payload, temperature=0.8, top_p=0.9, seed=11)
        s1 = list(protocol.stream_chunks(requests.post(
            f"http://127.0.0.1:{port}/worker_generate_stream",
            json=samp, timeout=600).content))[-1]
        assert s1["error_code"] == 0 and s1["text"]
        s2 = list(protocol.stream_chunks(requests.post(
            f"http://127.0.0.1:{port}/worker_generate_stream",
            json=samp, timeout=600).content))[-1]
        assert s1["text"] == s2["text"]
    finally:
        httpd.shutdown()


def test_sparse_mask_roundtrip():
    m = np.zeros((5, 7), np.uint8)
    m[1, 2] = m[4, 6] = 1
    coords, h, w = protocol.encode_sparse_mask(m)
    m2 = protocol.decode_sparse_mask(coords, h, w)
    np.testing.assert_array_equal(m, m2)


@pytest.mark.slow
def test_web_ui_serves_page_and_proxies(tmp_path):
    """Web UI: GET / returns the sketch page; POST /generate proxies through
    the controller to a (fake) worker."""
    import http.server
    import json as jsonlib
    import threading
    import urllib.request

    from medplib_tpu.serve import web
    from medplib_tpu.serve.controller import Controller, make_handler

    # fake worker endpoint
    class FakeWorker(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            _ = self.rfile.read(n)
            body = jsonlib.dumps({"text": "a lesion", "mask": []}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    wsrv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), FakeWorker)
    threading.Thread(target=wsrv.serve_forever, daemon=True).start()
    waddr = f"http://127.0.0.1:{wsrv.server_address[1]}"

    ctrl = Controller()
    csrv = http.server.ThreadingHTTPServer(("127.0.0.1", 0),
                                           make_handler(ctrl))
    threading.Thread(target=csrv.serve_forever, daemon=True).start()
    curl = f"http://127.0.0.1:{csrv.server_address[1]}"
    ctrl.register_worker(waddr, False, {"model_names": ["medplib-tpu"],
                                        "speed": 1, "queue_length": 0})

    log_dir = str(tmp_path / "conv_logs")
    ui = web.serve(curl, host="127.0.0.1", port=0, log_dir=log_dir)
    threading.Thread(target=ui.serve_forever, daemon=True).start()
    uurl = f"http://127.0.0.1:{ui.server_address[1]}"

    page = urllib.request.urlopen(uurl + "/", timeout=5).read().decode()
    assert "<html" in page.lower() and "canvas" in page.lower()

    req = urllib.request.Request(
        uurl + "/generate",
        data=jsonlib.dumps({"prompt": "hi", "model": "medplib-tpu"}).encode(),
        headers={"Content-Type": "application/json"})
    out = urllib.request.urlopen(req, timeout=10).read()
    assert b"lesion" in out

    # conversation logging + vote capture (gradio_web_server.py:128-131,
    # 188-216): the chat round was logged; votes append typed rows
    vreq = urllib.request.Request(
        uurl + "/vote",
        data=jsonlib.dumps({"type": "upvote",
                            "state": {"prompt": "hi",
                                      "text": "a lesion"}}).encode(),
        headers={"Content-Type": "application/json"})
    assert jsonlib.loads(urllib.request.urlopen(vreq, timeout=5).read())["ok"]
    rows = [jsonlib.loads(line) for line in
            open(web.conv_log_filename(log_dir))]
    assert [r["type"] for r in rows] == ["chat", "upvote"]
    assert rows[0]["state"]["text"] == "a lesion"
    assert rows[1]["state"]["prompt"] == "hi"
    assert all(r["model"] == "medplib-tpu" and "tstamp" in r for r in rows)

    # bad vote types are rejected
    breq = urllib.request.Request(
        uurl + "/vote", data=jsonlib.dumps({"type": "nope"}).encode(),
        headers={"Content-Type": "application/json"})
    import urllib.error
    try:
        urllib.request.urlopen(breq, timeout=5)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    for s in (ui, csrv, wsrv):
        s.shutdown()


@pytest.mark.slow
def test_batched_worker_concurrent_requests_match_sequential():
    """batched_slots routes requests through the continuous-batching engine
    (serve/engine.py): concurrent greedy requests must return exactly what
    the sequential worker returns for the same payloads."""
    from concurrent.futures import ThreadPoolExecutor

    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)

    def mk_worker(slots):
        w = wk.ModelWorker(cfg, params, FakeTok(), max_seq_len=48,
                           max_new_tokens=4, batched_slots=slots)
        w.cc.image_tokens = cfg.vision.num_patches
        w.cc.sam_image_size = cfg.sam.image_size
        w.cc.clip_image_size = cfg.vision.image_size
        return w

    img = (np.random.default_rng(3).uniform(0, 255, (48, 56, 3))
           ).astype(np.uint8)
    payloads = [{
        "prompt": f"USER: <image>\nquestion number {i} here ASSISTANT:",
        "images": [protocol.encode_image_b64(img)],
        "temperature": 0.0,
    } for i in range(3)]

    def run_server(worker):
        port = _free_port()
        httpd = wk.serve(worker, "127.0.0.1", port)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd, f"http://127.0.0.1:{port}/worker_generate_stream"

    seq_worker = mk_worker(0)
    httpd1, url1 = run_server(seq_worker)
    try:
        want = [list(protocol.stream_chunks(requests.post(
            url1, json=p, timeout=600).content))[-1] for p in payloads]
    finally:
        httpd1.shutdown()

    bat_worker = mk_worker(2)
    httpd2, url2 = run_server(bat_worker)
    try:
        with ThreadPoolExecutor(3) as ex:
            got = list(ex.map(
                lambda p: list(protocol.stream_chunks(requests.post(
                    url2, json=p, timeout=600).content))[-1], payloads))
        for g, w in zip(got, want):
            assert g["error_code"] == 0
            assert g["text"] == w["text"]
            assert g["mask"] == w["mask"]
    finally:
        bat_worker.close()
        httpd2.shutdown()


def test_web_post_routing_is_robust():
    """Unknown POST paths 404 without touching the body; malformed JSON on
    a known path returns 400 instead of a handler traceback."""
    from medplib_tpu.serve import web

    srv = web.serve("http://127.0.0.1:9", "dummy-model",
                    "127.0.0.1", 0, log_dir=None)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        r = requests.post(base + "/nope", data=b"not json", timeout=10)
        assert r.status_code == 404
        r = requests.post(base + "/vote", data=b"not json", timeout=10)
        assert r.status_code == 400
        r = requests.post(base + "/vote", json={"type": "bogus"}, timeout=10)
        assert r.status_code == 400
    finally:
        srv.shutdown()


def _drain(worker, payload):
    chunks = []
    for raw in worker.generate_stream(payload):
        chunks.append(json.loads(raw.rstrip(b"\0")))
    return chunks


def _tiny_worker(max_new_tokens=8, max_seq_len=48):
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    worker = wk.ModelWorker(cfg, params, FakeTok(), max_seq_len=max_seq_len,
                            max_new_tokens=max_new_tokens)
    for cc in worker._ccs.values():
        cc.image_tokens = cfg.vision.num_patches
        cc.sam_image_size = cfg.sam.image_size
        cc.clip_image_size = cfg.vision.image_size
    return worker


def _payload(**kw):
    img = (np.random.default_rng(0).uniform(0, 255, (64, 80, 3))
           ).astype(np.uint8)
    p = {"prompt": "USER: <image>\nWhat is this? ASSISTANT:",
         "images": [protocol.encode_image_b64(img)],
         "temperature": 0.0}  # greedy: token-deterministic across calls
    p.update(kw)
    return p


def test_worker_honors_per_request_max_new_tokens():
    """model_worker.py:291: min(params['max_new_tokens'], budget)."""
    worker = _tiny_worker(max_new_tokens=8)
    full = _drain(worker, _payload())[-1]["text"]
    short = _drain(worker, _payload(max_new_tokens=2))[-1]["text"]
    assert len(short.split()) <= 2
    assert len(short.split()) < len(full.split())
    # over-budget requests clamp to the worker budget instead of erroring
    capped = _drain(worker, _payload(max_new_tokens=10_000))[-1]
    assert capped["error_code"] == 0


def test_worker_honors_stop_string():
    """model_worker.py:292-296, 441-444: rfind truncation + early stop."""
    worker = _tiny_worker(max_new_tokens=8)
    full = _drain(worker, _payload())[-1]["text"]
    assert full
    first_word = full.split()[0]
    stopped = _drain(worker, _payload(stop=first_word))[-1]["text"]
    # rfind truncation (reference semantics): the output is cut at the LAST
    # stop occurrence — a greedy tiny model may repeat the word, so assert
    # the stream was cut short, not absence
    assert len(stopped.split()) < len(full.split()), (stopped, full)


def test_worker_single_token_stop_id():
    class OneTok(FakeTok):
        def __call__(self, text, add_special_tokens=True):
            class R:
                pass
            r = R()
            r.input_ids = [42] if text == "%" else [1, 5, 6]
            return r

    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    worker = wk.ModelWorker(cfg, params, OneTok(), max_seq_len=48)
    assert worker._stop_token_id("%") == 42
    assert worker._stop_token_id("longer stop") is None
    assert worker._stop_token_id(None) is None


def test_worker_context_clamp_keeps_prompt_tail():
    """model_worker.py:317: prompt clipped to context_len - max_new - 8,
    keeping the TAIL."""
    worker = _tiny_worker(max_new_tokens=4, max_seq_len=24)
    long_prompt = ("USER: <image>\n" +
                   " ".join(f"word{i}" for i in range(80)) + " ASSISTANT:")
    out = _drain(worker, _payload(prompt=long_prompt))[-1]
    assert out["error_code"] == 0  # still serves; no shape error


def test_worker_prompt_buckets_pick_smallest():
    worker = _tiny_worker(max_seq_len=512)
    assert worker.buckets == (128, 256, 512)
    assert worker._pick_bucket(40).max_seq_len == 128
    assert worker._pick_bucket(128).max_seq_len == 128
    assert worker._pick_bucket(200).max_seq_len == 256
    assert worker._pick_bucket(400).max_seq_len == 512
    small = _tiny_worker(max_seq_len=48)
    assert small.buckets == (48,)


def test_incremental_detok_prefix_fallback():
    """ADVICE round-2: a tokenizer whose rendering changes across the commit
    boundary must not emit garbled text — the detok falls back to a full
    re-decode."""

    class WeirdTok(FakeTok):
        def decode(self, ids, skip_special_tokens=False):
            # rendering depends on the TOTAL number of tokens: any prefix
            # assumption breaks once the count crosses 20
            joined = " ".join(f"t{t}" for t in ids)
            return ("LONG " + joined) if len(ids) > 20 else joined

    d = wk._IncrementalDetok(WeirdTok())
    out = ""
    for i in range(30):
        out = d.extend([i])
    expect = WeirdTok().decode(list(range(30)))
    assert out == expect
