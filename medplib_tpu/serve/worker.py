"""Model worker: registers with the controller, heartbeats, serves
/worker_generate_stream.

Rebuild of /root/reference/model/serve/model_worker.py: base64 image in,
dual SAM/CLIP preprocess (231-264), region-mask prep (271-288), generation,
then on completion the <SEG> scan -> text_hidden_fcs -> SAM decode ->
sparse-coordinate mask in the final chunk (448-540). Responses stream as
NUL-delimited JSON chunks; a semaphore caps concurrency (577-592).

TPU-first: the reference's manual token-by-token decode loop (393-427) is
the jit'd medplib.generate (one compiled KV-cached scan); text streaming
re-plays the decoded tokens in stream_interval batches after the compute.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import jax
import numpy as np

from medplib_tpu.config import MedplibConfig
from medplib_tpu.data import preprocess as pp
from medplib_tpu.data import tokenize as tk
from medplib_tpu.data.conversation import conv_templates
from medplib_tpu.data.dataset import CollatorConfig, collate, to_model_batch
from medplib_tpu.eval.seg_metrics import binarize_logits
from medplib_tpu.models import medplib
from medplib_tpu.serve import protocol


class _IncrementalDetok:
    """O(n) streaming detokenization with overlap-anchored commits: only
    tokens past `committed` are re-decoded each chunk; a small uncommitted
    tail is held back because tokenizers can merge text across token
    boundaries (sentencepiece leading-space markers)."""

    HOLDBACK = 8

    def __init__(self, tok):
        self.tok = tok
        self.toks: list = []
        self.committed = 0
        self.committed_text = ""

    def _tail_text(self, upto: int) -> str:
        ws = max(0, self.committed - self.HOLDBACK)
        prev = self.tok.decode(self.toks[ws:self.committed],
                               skip_special_tokens=False)
        cur = self.tok.decode(self.toks[ws:upto], skip_special_tokens=False)
        if not cur.startswith(prev):
            # a tokenizer whose rendering changed across the commit boundary
            # beyond the holdback window breaks the prefix assumption; fall
            # back to a full re-decode (resets the committed anchor)
            self.committed = 0
            self.committed_text = ""
            return self.tok.decode(self.toks[:upto],
                                   skip_special_tokens=False)
        return cur[len(prev):]

    def extend(self, new_toks) -> str:
        """Append tokens, return the full text so far."""
        self.toks.extend(int(t) for t in new_toks)
        if len(self.toks) - self.committed > 2 * self.HOLDBACK:
            commit_to = len(self.toks) - self.HOLDBACK
            tail = self._tail_text(commit_to)
            if self.committed == 0 and not self.committed_text:
                # prefix fallback fired inside _tail_text: `tail` is the
                # full decode from 0
                self.committed_text = tail
            else:
                self.committed_text += tail
            self.committed = commit_to
        return (self.committed_text + self._tail_text(len(self.toks))
                ).replace("</s>", "")

    def final(self) -> str:
        return (self.committed_text + self._tail_text(len(self.toks))
                ).replace("</s>", "").strip()


class ModelWorker:
    def __init__(self, cfg: MedplibConfig, params, tokenizer,
                 model_name: str = "medplib-tpu",
                 controller_url: Optional[str] = None,
                 worker_url: str = "http://localhost:21002",
                 limit_concurrency: int = 2,
                 max_seq_len: int = 512, max_new_tokens: int = 256,
                 stream_interval: int = 2,
                 conv_template: str = "v1",
                 batched_slots: int = 0,
                 kv_quant: bool = False,
                 device_preprocess: Optional[bool] = None,
                 prefill_chunk: Optional[int] = None):
        self.cfg, self.params, self.tok = cfg, params, tokenizer
        # device preprocess (ops/device_preprocess.py) defaults OFF: measured
        # on the tunneled v5e (run_all.py config 1, 1024px image) the fused
        # on-chip path costs 113.9 ms/image end-to-end vs 14.9 ms for the
        # host/C++ recipe — shipping the uint8 size-bucket canvas (3 MB)
        # plus the extra dispatch round trips through the tunnel dominates
        # the on-chip win. Opt in (device_preprocess=True) on hosts with a
        # local PCIe-attached chip, where the same transfer is ~1 ms.
        if device_preprocess is None:
            device_preprocess = False
        self.device_preprocess = device_preprocess
        self.model_name = model_name
        self.controller_url = controller_url
        self.worker_url = worker_url
        self.worker_id = str(uuid.uuid4())[:6]
        self.semaphore = threading.Semaphore(limit_concurrency)
        self.queue_length = 0
        self.stream_interval = stream_interval
        self.conv = conv_templates[conv_template]
        from medplib_tpu.models.medplib import image_tokens_per_image
        # prompt-shape buckets: short prompts collate at the smallest bucket
        # >= their length instead of always paying a max_seq_len prefill
        # (the reference sizes per request via max_src_len,
        # model_worker.py:317; static XLA shapes quantize that to buckets).
        # jit programs are shape-polymorphic, so each bucket costs one extra
        # compile on first use and nothing after.
        self.buckets = tuple(sorted(
            {b for b in (128, 256) if b < max_seq_len} | {max_seq_len}))
        self._ccs = {
            t: CollatorConfig(
                max_seq_len=t,
                image_tokens=image_tokens_per_image(cfg),
                sam_image_size=cfg.sam.image_size,
                clip_image_size=cfg.vision.image_size)
            for t in self.buckets}
        self.cc = self._ccs[max_seq_len]
        eos = getattr(tokenizer, "eos_token_id", 2) or 2
        self.max_new_tokens = max_new_tokens
        # KV cache must cover a WHOLE number of decode chunks: the loop
        # always runs full stream_interval-sized chunks, so size the cache
        # for the rounded-up budget and truncate emitted text instead
        chunks = -(-max_new_tokens // stream_interval)
        self._decode_budget = chunks * stream_interval
        # TRUE streaming: prefill once, then decode in stream_interval-sized
        # jitted chunks, emitting text between chunks (the reference worker's
        # per-token loop, model_worker.py:393-427, amortized per chunk).
        # Variants: region requests need the region splice; sampling requests
        # (temperature >= 1e-4, model_worker.py:420-425) need the sampling
        # program with traced temperature/top_p (one compile for any value).
        # jit is lazy, so unused variants never compile.
        def mk_prefill(rp: bool, ds: bool):
            return jax.jit(lambda p, b, t, tp, k: medplib.stream_prefill(
                p, cfg, b, max_new_tokens=self._decode_budget, rp_flag=rp,
                do_sample=ds, temperature=t, top_p=tp, rng=k,
                kv_quant=kv_quant))

        self._prefills = {(rp, ds): mk_prefill(rp, ds)
                          for rp in (False, True) for ds in (False, True)}
        self._chunk = jax.jit(
            lambda p, st: medplib.stream_decode_chunk(
                p, cfg, st, chunk=stream_interval, eos_id=eos))
        self._chunk_sample = jax.jit(
            lambda p, st, t, tp: medplib.stream_decode_chunk(
                p, cfg, st, chunk=stream_interval, eos_id=eos,
                do_sample=True, temperature=t, top_p=tp))
        self._ground = jax.jit(
            lambda p, b, st: medplib.stream_ground(p, cfg, b, st))
        # continuous batching: concurrent requests share one decode batch
        # (serve/engine.py) instead of serializing behind the semaphore —
        # the TPU-first upgrade over the reference's sequential worker
        self.engine = None
        if batched_slots > 0:
            from medplib_tpu.serve.engine import BatchedEngine
            self.engine = BatchedEngine(
                cfg, params, slots=batched_slots,
                max_new_tokens=max_new_tokens, chunk=stream_interval,
                eos_id=eos, max_prompt_len=max_seq_len, kv_quant=kv_quant,
                prefill_chunk=prefill_chunk)
            self.semaphore = threading.Semaphore(batched_slots * 4)
        if controller_url:
            self.register()
            t = threading.Thread(target=self._heartbeat_loop, daemon=True)
            t.start()

    def close(self):
        """Stop background machinery (the batching engine, if any); safe to
        call with requests in flight — they error out instead of hanging."""
        if self.engine is not None:
            self.engine.shutdown()

    # ---- controller RPC (model_worker.py:59-156) ----
    def _post(self, path: str, payload: dict) -> dict:
        import requests
        r = requests.post(self.controller_url + path, json=payload,
                          timeout=5)
        return r.json()

    def status(self) -> dict:
        return {"model_names": [self.model_name], "speed": 1.0,
                "queue_length": self.queue_length}

    def register(self):
        self._post("/register_worker", {
            "worker_name": self.worker_url, "check_heart_beat": True,
            "worker_status": self.status()})

    def _heartbeat_loop(self):
        while True:
            time.sleep(protocol.HEARTBEAT_WORKER_INTERVAL)
            try:
                res = self._post("/receive_heart_beat", {
                    "worker_name": self.worker_url,
                    "queue_length": self.queue_length})
                if not res.get("exist"):
                    self.register()
            except Exception:
                pass

    # ---- generation ----
    def build_sample(self, prompt: str, image_rgb: np.ndarray,
                     region_mask: Optional[np.ndarray]) -> Dict:
        if self.device_preprocess:
            # fused on-device resize+pad+normalize (two MXU matmuls,
            # ops/device_preprocess.py): frees the single host core and
            # overlaps with the model stream; measured before/after in
            # the module docstring/README
            from medplib_tpu.ops.device_preprocess import dual_preprocess
            image_sam, image_clip, resize_hw = dual_preprocess(
                image_rgb, self.cfg.sam.image_size,
                self.cfg.vision.image_size)
        else:
            image_sam, resize_hw = pp.preprocess_sam(
                image_rgb, self.cfg.sam.image_size)
            image_clip = pp.preprocess_clip(image_rgb,
                                            self.cfg.vision.image_size)
        ids = tk.tokenizer_image_token(prompt, self.tok)
        sample = {
            "input_ids": np.asarray(ids, np.int64),
            "labels": np.full(len(ids), -100, np.int64),
            "image_clip": image_clip, "image_sam": image_sam,
            "resize_hw": resize_hw, "original_hw": image_rgb.shape[:2],
            "gt_masks": [], "gt_masks_original": [], "question": [prompt],
            "gt": [""], "image_path": None, "answer_type": None,
        }
        if region_mask is not None:
            sample["region_masks"] = [pp.preprocess_region_mask(
                region_mask, self.cfg.vision.image_size,
                self.cfg.vision.patch_size)]
        return sample

    def generate_stream(self, payload: dict):
        """Yields NUL-delimited JSON chunk bytes (model_worker.py:522-540)."""
        self.queue_length += 1
        try:
            with self.semaphore:
                yield from self._generate_stream_inner(payload)
        except Exception as e:  # noqa: BLE001 - serving boundary
            yield json.dumps({"text": f"server error: {e}", "mask": [],
                              "height": "0", "width": "0",
                              "error_code": protocol.ERROR_CODE_ERROR}
                             ).encode() + protocol.STREAM_DELIMITER
        finally:
            self.queue_length -= 1

    def _pick_bucket(self, n_tokens: int) -> CollatorConfig:
        """Smallest collator bucket that fits the prompt."""
        for t in self.buckets:
            if n_tokens <= t:
                return self._ccs[t]
        return self.cc

    def _stop_token_id(self, stop_str: Optional[str]) -> Optional[int]:
        """The reference short-circuits on single-token stop strings
        (model_worker.py:294-299: tokenizer(stop).input_ids of length 1)."""
        if not stop_str:
            return None
        try:
            ids = self.tok(stop_str).input_ids
        except Exception:  # noqa: BLE001 - tokenizer-specific surface
            return None
        return int(ids[0]) if len(ids) == 1 else None

    def _generate_stream_inner(self, payload: dict):
        prompt = payload["prompt"]
        # per-request sampling params, reference defaults
        # (model_worker.py:288-289): temperature < 1e-4 routes to greedy
        temperature = float(payload.get("temperature", 1.0))
        top_p = float(payload.get("top_p", 1.0))
        do_sample = temperature >= 1e-4
        # per-request token budget, clamped to the worker's compiled budget
        # (reference: min(params["max_new_tokens"], 1024),
        # model_worker.py:291)
        mnt = min(int(payload.get("max_new_tokens", self.max_new_tokens)),
                  self.max_new_tokens)
        # stop string (model_worker.py:292-299, 443): single-token stops end
        # decode exactly; any stop truncates emitted text at rfind(stop)
        stop_str = payload.get("stop") or None
        stop_id = self._stop_token_id(stop_str)
        image = protocol.decode_image_b64(payload["images"][0])
        region = None
        if payload.get("region_masks"):
            region = protocol.decode_sparse_mask(
                payload["region_masks"][0],
                *payload.get("region_hw", image.shape[:2]))
        sample = self.build_sample(prompt, image, region)
        # context-length clamp (model_worker.py:317): keep the prompt TAIL so
        # prompt + answer fits the model's positional budget
        max_src_len = min(self.cc.max_seq_len,
                          self.cfg.llm.max_position_embeddings - mnt - 8)
        if len(sample["input_ids"]) > max_src_len:
            sample["input_ids"] = sample["input_ids"][-max_src_len:]
            sample["labels"] = sample["labels"][-max_src_len:]
        cc = self._pick_bucket(len(sample["input_ids"]))
        arrays, meta = collate([sample], cc)
        batch = to_model_batch(arrays)
        seed = payload.get("seed")

        detok = _IncrementalDetok(self.tok)

        def text_chunk(text):
            return json.dumps({"text": text, "mask": [], "height": "0",
                               "width": "0",
                               "error_code": protocol.ERROR_CODE_OK}
                              ).encode() + protocol.STREAM_DELIMITER

        stopped_text: Optional[str] = None

        def apply_stop(text: str):
            """-> (text, hit). rfind truncation per the reference's
            stream-interval scan (model_worker.py:441-444)."""
            if stop_str:
                pos = text.rfind(stop_str)
                if pos != -1:
                    return text[:pos], True
            return text, False

        if self.engine is not None:
            # continuous batching: the engine coalesces this request with
            # every other in-flight one into a single decode batch
            req = self.engine.submit(
                batch, region=region is not None,
                temperature=temperature if do_sample else 0.0, top_p=top_p,
                seed=seed, max_new_tokens=mnt)
            for chunk_toks in req:
                if stopped_text is not None:
                    continue  # drain remaining chunks (cancel is async)
                if stop_id is not None and stop_id in chunk_toks:
                    chunk_toks = chunk_toks[:chunk_toks.index(stop_id)]
                    stopped_text, _ = apply_stop(detok.extend(chunk_toks))
                    req.cancel()
                    yield text_chunk(stopped_text)
                    continue
                text, hit = apply_stop(detok.extend(chunk_toks))
                if hit:
                    stopped_text = text
                    req.cancel()
                yield text_chunk(text)
            grounded = req.ground()
            masks0 = (np.asarray(grounded[0])[0, 0]
                      if grounded is not None else None)
        else:
            key = jax.random.PRNGKey(int(seed) if seed is not None
                                     else time.time_ns() & 0x7FFFFFFF)
            state = self._prefills[(region is not None, do_sample)](
                self.params, batch, temperature, top_p, key)
            steps = 0
            while steps < mnt:
                if do_sample:
                    state, chunk_toks, chunk_done = self._chunk_sample(
                        self.params, state, temperature, top_p)
                else:
                    state, chunk_toks, chunk_done = self._chunk(self.params,
                                                                state)
                done_np = np.asarray(chunk_done)[0]
                fresh = [int(t) for t, was_done
                         in zip(np.asarray(chunk_toks)[0], done_np)
                         if not was_done and int(t) > 0][
                             : mnt - len(detok.toks)]
                steps += chunk_toks.shape[1]
                if stop_id is not None and stop_id in fresh:
                    fresh = fresh[:fresh.index(stop_id)]
                    stopped_text, _ = apply_stop(detok.extend(fresh))
                    yield text_chunk(stopped_text)
                    break
                text, hit = apply_stop(detok.extend(fresh))
                if hit:
                    stopped_text = text
                    yield text_chunk(text)
                    break
                yield text_chunk(text)
                if bool(done_np[-1]) or bool(np.asarray(state.done)[0]):
                    break
            masks0 = None
            # skip the full SAM forward for non-segmentation requests
            if int(np.asarray(state.seg_count)[0]) > 0:
                masks, _ = self._ground(self.params, batch, state)
                masks0 = np.asarray(masks)[0, 0]

        text = detok.final()
        if stopped_text is not None:
            text = stopped_text.strip()
        else:
            text, _ = apply_stop(text)
        encoded_mask, h, w = [], 0, 0
        if masks0 is not None:
            pred = pp.unpad_and_resize_mask(
                masks0, sample["resize_hw"], sample["original_hw"])
            encoded_mask, h, w = protocol.encode_sparse_mask(
                binarize_logits(pred))
        yield json.dumps({"text": text, "mask": encoded_mask,
                          "height": str(h), "width": str(w),
                          "error_code": protocol.ERROR_CODE_OK}
                         ).encode() + protocol.STREAM_DELIMITER


def make_handler(worker: ModelWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _read_body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_POST(self):
            if self.path == "/worker_generate_stream":
                payload = self._read_body()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                for chunk in worker.generate_stream(payload):
                    self.wfile.write(chunk)
                    self.wfile.flush()
            elif self.path == "/worker_get_status":
                body = json.dumps(worker.status()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def serve(worker: ModelWorker, host: str = "0.0.0.0",
          port: int = 21002) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), make_handler(worker))
