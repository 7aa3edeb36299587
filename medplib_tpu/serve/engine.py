"""Continuous-batching serving engine: fixed decode slots over ONE shared
KV-cache state.

The reference worker serves strictly sequentially — a semaphore around a
per-request HF generate loop (/root/reference/model/serve/model_worker.py:
577-592, 393-427) — so a busy GPU decodes batch-1 no matter how many
requests queue. This engine is the TPU-first upgrade: requests are admitted
into free slots of a static-shape batch as they arrive and retired on
EOS/budget, so every decode step runs the full slot batch on the MXU.

Design (all static shapes, a handful of compiled programs total):
- admit: with group_admission, pending requests prefill TOGETHER
  (medplib.stream_prefill over the concatenated batches, padded to a
  power-of-2 bucket so prefill compiles stay logarithmic; per-row
  temperature/top_p arrays); insertion into the shared StreamState is one
  jitted `.at[slots].set` scatter per group on the batch axis (slot values
  are traced; one compile per group size). The model's RNG is [B, 2]
  per-row streams (ops/sampling.row_keys), so a seeded request's sample
  stream depends only on its own seed — traffic cannot perturb it; seeded
  sampled requests additionally prefill solo so the first token is
  seed-exact too.
- decode: medplib.stream_decode_chunk over all slots. One greedy program;
  one sampling program whose per-ROW temperature/top_p arrays let a single
  compile serve any mix of greedy and sampled requests (rows with
  temperature < 1e-4 take an exact argmax inside ops/sampling.sample_token).
- retire: the slot's SEG capture fields are sliced out (jitted) before the
  slot is reused; grounding (SAM encode + mask decode) runs per retired
  request, off the decode hot path.

The engine state is donated through both insert and decode, so the multi-GB
KV cache never holds two copies.
"""

from __future__ import annotations

import functools
import math
import queue
import threading
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.config import MedplibConfig
from medplib_tpu.models import llama, medplib


class Request:
    """Handle returned by BatchedEngine.submit. Iterate to receive token-id
    chunks; after iteration ends, ground() returns (mask logits, seg_valid)
    for the captured SEG slots (or None when the answer had no <SEG>)."""

    def __init__(self, batch: medplib.Batch, region: bool,
                 temperature: float, top_p: float, seed: Optional[int],
                 max_new_tokens: int):
        self.batch = batch
        self.region = region
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.seed = seed
        self.max_new_tokens = max_new_tokens
        self.do_sample = self.temperature >= 1e-4
        self.chunks: "queue.Queue[Optional[List[int]]]" = queue.Queue()
        self.emitted = 0   # delivered tokens
        self.steps = 0     # decode steps consumed (KV-cache budget)
        self.error: Optional[BaseException] = None
        self.cancelled = False
        self._skip = 0     # already-delivered tokens to drop from the chunk
        self._seg = None      # (seg_emb [1,S,H], seg_count [1], last_cap [1,H])
        self._engine: Optional["BatchedEngine"] = None

    def cancel(self):
        """Ask the engine to retire this request at the next chunk boundary
        (e.g. a client-side stop string landed). Safe from any thread; the
        stream still ends with the usual terminator."""
        self.cancelled = True

    def __iter__(self):
        while True:
            item = self.chunks.get()
            if item is None:
                if self.error is not None:
                    raise self.error
                return
            yield item

    def tokens(self) -> List[int]:
        """Drain the stream and return all generated token ids."""
        out: List[int] = []
        for chunk in self:
            out.extend(chunk)
        return out

    def ground(self, out_size: Optional[int] = None):
        """SAM grounding for the finished request -> (mask logits
        [1, S, out, out], seg_valid [1, S]); None if no SEG was captured."""
        if self._seg is None:
            raise RuntimeError("ground() before the stream finished")
        seg_emb, seg_count, last_cap = self._seg
        if int(np.asarray(seg_count)[0]) == 0:
            return None
        return self._engine._ground(seg_emb, seg_count, last_cap,
                                    self.batch, out_size)


class BatchedEngine:
    def __init__(self, cfg: MedplibConfig, params, *, slots: int = 4,
                 max_new_tokens: int = 256, chunk: int = 8, eos_id: int = 2,
                 group_admission: bool = False,
                 max_prompt_len: Optional[int] = None,
                 kv_quant: bool = False,
                 prefill_chunk: Optional[int] = None,
                 interleave_steps: Optional[int] = None):
        """`group_admission=True` prefills pending requests together in one
        padded power-of-2 batch. Measured on v5e-1 through the axon tunnel
        (7B int8, 8 slots, 16 VQA requests x 32 tokens): per-request
        admission 128.6 tok/s vs grouped 100.6 — staggered admissions keep
        a rolling pipeline of near-full decode chunks, while synchronized
        waves serialize big prefills with idle decode gaps. Default is the
        measured winner; grouped stays available for dispatch-latency-bound
        deployments.

        `max_prompt_len` enables prompt-shape BUCKETS: requests may arrive
        collated at any width <= max_prompt_len (the worker picks the
        smallest bucket that fits, so short VQA prompts skip most of the
        max-width prefill cost); their KV states are padded up to the shared
        slot shape at insert. None keeps the legacy contract — the first
        request's shape defines the engine's only accepted shape.

        `prefill_chunk` (tokens) enables CHUNKED-PREFILL INTERLEAVING: an
        admission's spliced prompt is prefilled in prefill_chunk-token
        extends (medplib.stream_prefill_chunk) with a SHORT decode chunk
        (`interleave_steps` tokens, default chunk//4, its own compiled
        program) dispatched between consecutive extends — in-flight
        streams see gaps bounded by ~one extend instead of the whole
        prefill (run_all.py config 10's bg_decode_stall_max_chunks), and
        the admission pays only interleave_steps x step-time per extend of
        extra TTFT (a full chunk between extends measured 3.2x idle TTFT
        at spliced-1600 prompts; see README). Token streams are
        byte-identical to the unchunked path for bf16 KV; with
        kv_quant=True later chunks attend quantized earlier-chunk K/V, so
        rounding-level divergence is possible (README fidelity table)."""
        self.group_admission = group_admission
        self.cfg, self.params = cfg, params
        self.slots = slots
        self.chunk = chunk
        self.eos_id = eos_id
        self.max_prompt_len = max_prompt_len
        self.kv_quant = kv_quant
        # the shared cache must cover whole chunks for the longest request
        self.decode_budget = -(-max_new_tokens // chunk) * chunk
        self.max_new_tokens = max_new_tokens
        if prefill_chunk and max_prompt_len and \
                prefill_chunk > self.decode_budget:
            # bucket caches must agree on the shared time size: a bucket's
            # chunk-padded prompt may overrun the slot shape only if one
            # prefill chunk exceeds the decode budget (see _slot_cache_len)
            raise ValueError("prefill_chunk must be <= the decode budget "
                             "when prompt buckets are enabled")

        def mk_prefill(rp: bool, ds: bool):
            # temperature/top_p are traced [k, 1] arrays: per-ROW sampling
            # params, so one program admits any mix of greedy and sampled
            # requests (greedy rows take an exact argmax below the 1e-4
            # threshold, ops/sampling.sample_token). The group's batches are
            # concatenated INSIDE the jit — on a tunneled TPU backend every
            # eager op is its own host round trip, and 13 leaf concats per
            # admission measurably beat the batching win out of the engine.
            def run(p, t, tp, k, *bs):
                b = (bs[0] if len(bs) == 1 else jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, 0), *bs))
                return medplib.stream_prefill(
                    p, cfg, b, max_new_tokens=self._cache_budget, rp_flag=rp,
                    do_sample=ds, temperature=t, top_p=tp, rng=k,
                    kv_quant=kv_quant)

            return jax.jit(run)

        self._prefills = {(rp, ds): mk_prefill(rp, ds)
                          for rp in (False, True) for ds in (False, True)}

        self.prefill_chunk = prefill_chunk
        if prefill_chunk:
            from medplib_tpu.models.medplib import (stream_prefill_begin,
                                                    stream_prefill_chunk,
                                                    stream_prefill_finish)

            def mk_begin(rp: bool):
                def run(p, cache_len, *bs):
                    b = (bs[0] if len(bs) == 1 else jax.tree_util.tree_map(
                        lambda *xs: jnp.concatenate(xs, 0), *bs))
                    return stream_prefill_begin(
                        p, cfg, b, max_new_tokens=self._cache_budget,
                        chunk_tokens=prefill_chunk, rp_flag=rp,
                        kv_quant=kv_quant, cache_len=cache_len)

                return jax.jit(run, static_argnums=(1,))

            self._begins = {rp: mk_begin(rp) for rp in (False, True)}
            # the carry (multi-GB cache) is donated through every extend
            self._ext = jax.jit(
                lambda p, carry, e, am, sm, c0: stream_prefill_chunk(
                    p, cfg, carry, e, am, sm, c0,
                    chunk_tokens=prefill_chunk),
                donate_argnums=(1,))
            self._finishes = {
                ds: jax.jit(functools.partial(
                    stream_prefill_finish, cfg=cfg, do_sample=ds))
                for ds in (False, True)}
        def mk_chunks(n):
            return (jax.jit(
                lambda p, st: medplib.stream_decode_chunk(
                    p, cfg, st, chunk=n, eos_id=eos_id),
                donate_argnums=(1,)),
                jax.jit(
                lambda p, st, t, tp: medplib.stream_decode_chunk(
                    p, cfg, st, chunk=n, eos_id=eos_id, do_sample=True,
                    temperature=t, top_p=tp),
                donate_argnums=(1,)))

        self._chunk_greedy, self._chunk_sample = mk_chunks(chunk)
        self.interleave_steps = min(interleave_steps or max(1, chunk // 4),
                                    chunk)
        if prefill_chunk and self.interleave_steps != chunk:
            self._chunk_greedy_i, self._chunk_sample_i = mk_chunks(
                self.interleave_steps)
        else:
            self._chunk_greedy_i, self._chunk_sample_i = (
                self._chunk_greedy, self._chunk_sample)
        # mixed short/full decode chunks can cross the retire boundary
        # (retire checks AFTER each dispatch); every step count is a sum of
        # interleave_steps/chunk increments, i.e. a multiple of their gcd,
        # so the worst pre-dispatch position is decode_budget - gcd and the
        # overshoot bound is chunk - gcd (= chunk - interleave_steps when
        # interleave divides chunk; larger for non-dividing user values —
        # without the gcd sizing a 3/8 mix could overshoot by 7 > 5 and
        # silently drop KV scatter writes past the cache)
        self._cache_budget = self.decode_budget + (
            chunk - math.gcd(chunk, self.interleave_steps)
            if prefill_chunk else 0)
        self._insert = jax.jit(self._insert_impl, donate_argnums=(0,))
        self._pad_time = jax.jit(self._pad_time_impl,
                                 static_argnames=("target",),
                                 donate_argnums=(0,))
        self._make_empty = jax.jit(functools.partial(
            self._make_empty_impl, slots=slots), static_argnames=("slots",))
        self._extract = jax.jit(self._extract_impl)
        self._ground_fn = jax.jit(
            lambda p, img, se, sc, lc: medplib.ground_seg_slots(
                p, cfg, img, se, sc, lc))

        self._pending: "queue.Queue[Request]" = queue.Queue()
        self._slot_req: List[Optional[Request]] = [None] * slots
        self._state: Optional[medplib.StreamState] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- device programs ----

    @staticmethod
    def _insert_impl(big: medplib.StreamState, small: medplib.StreamState,
                     slots_vec: jnp.ndarray) -> medplib.StreamState:
        """Scatter the first len(slots_vec) rows of a (possibly padded)
        batch-admitted small state into the given slots of the shared state
        — ONE device dispatch per admission group. slots_vec values are
        traced; its LENGTH is static (one compile per group size)."""
        k = slots_vec.shape[0]

        def up(b, s, axis):
            s = jax.lax.slice_in_dim(s, 0, k, axis=axis).astype(b.dtype)
            if axis == 0:
                return b.at[slots_vec].set(s)
            return b.at[:, slots_vec].set(s)

        def upo(b, s, axis):  # optional leaves (int8-KV scales)
            return None if b is None else up(b, s, axis)

        cache = llama.KVCache(
            k=up(big.cache.k, small.cache.k, 1),
            v=up(big.cache.v, small.cache.v, 1),
            length=up(big.cache.length, small.cache.length, 0),
            k_scale=upo(big.cache.k_scale, small.cache.k_scale, 1),
            v_scale=upo(big.cache.v_scale, small.cache.v_scale, 1))
        return medplib.StreamState(
            cache=cache,
            tok=up(big.tok, small.tok, 0),
            done=up(big.done, small.done, 0),
            seg_emb=up(big.seg_emb, small.seg_emb, 0),
            seg_count=up(big.seg_count, small.seg_count, 0),
            last_cap=up(big.last_cap, small.last_cap, 0),
            # rng is [B, 2] PER-ROW streams: scattering only the admitted
            # rows leaves every in-flight request's sample stream untouched
            # (a seeded request stays reproducible regardless of traffic)
            rng=up(big.rng, small.rng, 0))

    @staticmethod
    def _pad_time_impl(small: medplib.StreamState,
                       target: int) -> medplib.StreamState:
        """Zero-pad a bucketed admission's KV cache up to the shared slot
        shape's time axis (prompts are left-aligned and decode_attention
        masks by cache.length, so tail padding is never attended)."""
        def pad(a):
            if a is None or a.shape[2] == target:
                return a
            return jnp.pad(a, ((0, 0), (0, 0), (0, target - a.shape[2]),
                               (0, 0), (0, 0)))

        return small._replace(cache=small.cache._replace(
            k=pad(small.cache.k), v=pad(small.cache.v),
            k_scale=pad(small.cache.k_scale),
            v_scale=pad(small.cache.v_scale)))

    def _slot_cache_len(self, batch: medplib.Batch) -> Optional[int]:
        """Shared KV time size when prompt buckets are on: the spliced
        length of a max_prompt_len prompt (medplib._out_len at T=max) plus
        the decode budget."""
        if self.max_prompt_len is None:
            return None
        per = medplib.image_tokens_per_image(self.cfg)
        if self.cfg.projector.mask_encoder:
            per = max(per, self.cfg.projector.mask_encoder_tokens)
        n_img = batch.image_token_lengths.shape[1]
        return (self.max_prompt_len + n_img * (per - 1) +
                self._cache_budget)

    @staticmethod
    def _make_empty_impl(small: medplib.StreamState,
                         slots: int) -> medplib.StreamState:
        def z(a, axis):
            sh = list(a.shape)
            sh[axis] = slots
            return jnp.zeros(sh, a.dtype)

        zo = lambda a, axis: None if a is None else z(a, axis)  # noqa: E731
        cache = llama.KVCache(k=z(small.cache.k, 1), v=z(small.cache.v, 1),
                              length=z(small.cache.length, 0),
                              k_scale=zo(small.cache.k_scale, 1),
                              v_scale=zo(small.cache.v_scale, 1))
        return medplib.StreamState(
            cache=cache, tok=z(small.tok, 0),
            done=jnp.ones((slots,), bool),  # free slots never generate
            seg_emb=z(small.seg_emb, 0), seg_count=z(small.seg_count, 0),
            last_cap=z(small.last_cap, 0), rng=z(small.rng, 0))

    @staticmethod
    def _extract_impl(state: medplib.StreamState, slot: jnp.ndarray):
        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, slot, 1, 0)

        return sl(state.seg_emb), sl(state.seg_count), sl(state.last_cap)

    def _ground(self, seg_emb, seg_count, last_cap, batch, out_size):
        if out_size is not None:
            # out_size is static in decode_seg_masks; bypass the cached jit
            return medplib.ground_seg_slots(
                self.params, self.cfg, batch.images_sam, seg_emb, seg_count,
                last_cap, out_size)
        return self._ground_fn(self.params, batch.images_sam, seg_emb,
                               seg_count, last_cap)

    # ---- public API ----

    def submit(self, batch: medplib.Batch, *, region: bool = False,
               temperature: float = 0.0, top_p: float = 1.0,
               seed: Optional[int] = None,
               max_new_tokens: Optional[int] = None) -> Request:
        """batch must be a B=1 collated Batch. With max_prompt_len set, any
        prompt width <= max_prompt_len is accepted (bucketed admission);
        otherwise the engine's fixed prompt shape (the collator's
        max_seq_len contract)."""
        if batch.input_ids.shape[0] != 1:
            raise ValueError("engine requests are single-sample batches")
        if (self.max_prompt_len is not None
                and batch.input_ids.shape[1] > self.max_prompt_len):
            raise ValueError(
                f"prompt width {batch.input_ids.shape[1]} exceeds the "
                f"engine's max_prompt_len {self.max_prompt_len}")
        if self._stop.is_set():
            raise RuntimeError("engine shut down")
        r = Request(batch, region, temperature, top_p, seed,
                    min(max_new_tokens or self.max_new_tokens,
                        self.decode_budget))
        r._engine = self
        self._pending.put(r)
        # a shutdown may have drained _pending between the guard above and
        # the put: re-check so this request can't be stranded unserved
        if self._stop.is_set():
            self._fail_pending(RuntimeError("engine shut down"))
        return r

    def _fail_pending(self, err: BaseException):
        while True:
            try:
                r = self._pending.get_nowait()
            except queue.Empty:
                return
            r.error = err
            r.chunks.put(None)

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=10)
        # fail everything still in flight or queued so no client blocks
        # forever in Request.tokens()/__iter__ (submit() refuses new work
        # once _stop is set, and re-drains if it raced the drain below)
        # the loop thread fails slotted requests itself on exit (it may
        # outlive the join timeout inside a long compile); pending drains
        # here AND there, both idempotent
        self._fail_pending(RuntimeError("engine shut down"))

    @property
    def active_requests(self) -> int:
        return sum(r is not None for r in self._slot_req) + \
            self._pending.qsize()

    # ---- engine loop ----

    def _admit(self, group: List[Request]):
        """Admit a group of same-region requests with ONE prefill: batches
        are concatenated, sampling params ride as per-row arrays, and the
        group is padded up to a power-of-2 bucket (duplicating the last
        request's rows; padding rows are never inserted) so the number of
        distinct PREFILL compiles — the expensive programs — stays
        logarithmic in `slots`. The insert scatter compiles once per
        distinct group size; it is a small program."""
        k = len(group)
        bucket = 1
        while bucket < k:
            bucket *= 2
        rows = group + [group[-1]] * (bucket - k)
        temps = np.asarray([[r.temperature] for r in rows], np.float32)
        tops = np.asarray([[r.top_p] for r in rows], np.float32)
        seed = group[0].seed
        key = jax.random.PRNGKey(int(seed) if seed is not None
                                 else time.time_ns() & 0x7FFFFFFF)
        ds = any(r.do_sample for r in group)
        if self.prefill_chunk:
            # CHUNKED-PREFILL INTERLEAVING: splice once, then extend the
            # cache prefill_chunk tokens at a time with one shared-batch
            # decode chunk between extends — in-flight streams' max gap is
            # ~one extend, not the whole prompt. Token-exact vs the
            # monolithic prefill (tests/test_engine.py).
            target = self._slot_cache_len(group[0].batch)
            embeds, am, sm, carry = self._begins[group[0].region](
                self.params, target, *[r.batch for r in rows])
            n = embeds.shape[1] // self.prefill_chunk
            for ci in range(n):
                carry = self._ext(self.params, carry, embeds, am, sm,
                                  np.int32(ci * self.prefill_chunk))
                if ci < n - 1:
                    self._decode_once(short=True)
            small = self._finishes[ds](self.params, carry=carry,
                                       attn_mask=am, temperature=temps,
                                       top_p=tops, rng=key)
        else:
            small = self._prefills[(group[0].region, ds)](
                self.params, temps, tops, key, *[r.batch for r in rows])
            target = self._slot_cache_len(group[0].batch)
            if target is not None and small.cache.k.shape[2] < target:
                # bucketed prompt: pad the admission's KV to the slot shape
                small = self._pad_time(small, target=target)
        if self._state is None:
            self._state = self._make_empty(small)
        slots = []
        for r in group:
            slot = self._slot_req.index(None)
            self._slot_req[slot] = r
            slots.append(slot)
        try:
            self._state = self._insert(self._state, small,
                                       np.asarray(slots, np.int32))
        except BaseException:
            for slot in slots:
                self._slot_req[slot] = None
            raise
        # FIRST-TOKEN FAST PATH: prefill already sampled the first token
        # (StreamState.tok) — deliver it NOW instead of after the next full
        # decode chunk (~chunk x step-time off TTFT; the loaded-TTFT bench,
        # run_all.py config 10, is dominated by that wait). The decode
        # chunk re-emits the carried token as its first output, so the
        # slot skips one already-delivered token (r._skip).
        first = np.asarray(small.tok)[: len(group)]  # host slice: 1 fetch
        for r, t in zip(group, first.tolist()):
            if int(t) > 0 and not r.cancelled:  # same filter as the chunk
                r.chunks.put([int(t)])
                r.emitted += 1
                r._skip = 1

    def _try_admit(self, group: List[Request], retried: bool = False):
        """Admit with failure isolation: a failed GROUP falls back to solo
        admissions so only the incompatible request errors; a failure while
        the engine is idle drops the shared state, healing an engine whose
        shapes were defined by an earlier wrong-shaped first request (the
        next admission rebuilds the state from its own shapes)."""
        try:
            self._admit(group)
            return
        except BaseException as e:  # noqa: BLE001 - engine boundary
            for i, s in enumerate(self._slot_req):
                if s in group:  # slotted before the failure: free the slot
                    self._slot_req[i] = None
            idle = all(r is None for r in self._slot_req)
            if idle:
                self._state = None
            if len(group) > 1:
                for r in group:
                    self._try_admit([r])
                return
            if idle and not retried:
                self._try_admit(group, retried=True)
                return
            group[0].error = e
            group[0].chunks.put(None)

    def _retire(self, slot: int):
        r = self._slot_req[slot]
        # np scalar: a jnp.int32() here would be its own eager device
        # transfer through the tunnel; as a jit arg it converts at dispatch
        r._seg = self._extract(self._state, np.int32(slot))
        self._slot_req[slot] = None
        r.chunks.put(None)

    def _loop(self):
        while not self._stop.is_set():
            try:
                self._loop_once()
            except BaseException as e:  # noqa: BLE001 - engine boundary
                # fail every in-flight request, drop the state, keep serving
                for i, r in enumerate(self._slot_req):
                    if r is not None:
                        r.error = e
                        r._seg = None
                        self._slot_req[i] = None
                        r.chunks.put(None)
                self._state = None
        # stopping: terminate whatever is still slotted, even if shutdown's
        # join timed out while this thread sat in a long compile — only this
        # thread mutates _slot_req while it lives, so clients never hang
        err = RuntimeError("engine shut down")
        for i, r in enumerate(self._slot_req):
            if r is not None:
                self._slot_req[i] = None
                r.error = err
                r.chunks.put(None)
        self._fail_pending(err)

    def _loop_once(self):
        # drain pending requests up to the free-slot count...
        incoming: List[Request] = []
        while sum(r is None for r in self._slot_req) > len(incoming):
            try:
                block = (not incoming
                         and all(r is None for r in self._slot_req))
                incoming.append(self._pending.get(block=block, timeout=0.2))
            except queue.Empty:
                break
        # ...and admit them in batched prefill groups: same region flag
        # groups together; a SEEDED sampled request prefills solo so its
        # RNG stream stays reproducible regardless of traffic
        groups: List[List[Request]] = []
        by_key: dict = {}
        for r in incoming:
            if not self.group_admission or (r.do_sample
                                            and r.seed is not None):
                groups.append([r])
            else:
                # same region flag AND same (bucketed) prompt width concat
                # into one prefill
                key = (r.region, r.batch.input_ids.shape[1])
                by_key.setdefault(key, []).append(r)
        groups.extend(v for v in by_key.values())
        for g in groups:
            self._try_admit(g)
        self._decode_once()

    def _decode_once(self, short: bool = False):
        """One shared-batch decode chunk + delivery/retire bookkeeping.
        Called from the main loop, and BETWEEN chunked-prefill extends with
        short=True (an interleave_steps-token chunk: enough to keep
        in-flight streams moving without charging the admission a full
        chunk of extra TTFT per extend)."""
        active = [i for i, r in enumerate(self._slot_req) if r is not None]
        if not active:
            return

        if any(self._slot_req[i].do_sample for i in active):
            temps = np.zeros((self.slots, 1), np.float32)
            tops = np.ones((self.slots, 1), np.float32)
            for i in active:
                temps[i, 0] = self._slot_req[i].temperature
                tops[i, 0] = self._slot_req[i].top_p
            # np arrays convert at jit dispatch; eager jnp.asarray would be
            # two extra tunnel round trips per chunk
            fn = self._chunk_sample_i if short else self._chunk_sample
            self._state, toks, dones = fn(self.params, self._state, temps,
                                          tops)
        else:
            fn = self._chunk_greedy_i if short else self._chunk_greedy
            self._state, toks, dones = fn(self.params, self._state)
        # single host fetch for the chunk's outputs (tunnel round trips)
        toks, dones, done_now = jax.device_get(
            (toks, dones, self._state.done))
        for slot in active:
            r = self._slot_req[slot]
            passing = [int(t) for t, d in zip(toks[slot], dones[slot])
                       if not d and int(t) > 0]
            # the first chunk after admission re-emits the carried prefill
            # token that the fast path already delivered (see _admit)
            drop = min(r._skip, len(passing))
            r._skip -= drop
            fresh = passing[drop:][: r.max_new_tokens - r.emitted]
            # emitted counts DELIVERED tokens (matches the sequential
            # worker's len(detok.toks) cap); steps bounds total decode work
            # so a stream of filtered ids can't outrun the KV cache
            r.emitted += len(fresh)
            r.steps += toks.shape[1]
            if fresh:
                r.chunks.put(fresh)
            if bool(done_now[slot]) or r.emitted >= r.max_new_tokens \
                    or r.steps >= self.decode_budget or r.cancelled:
                self._retire(slot)
