"""Training loop: sharded train step, gradient accumulation, checkpointing,
auto-resume with mid-epoch skip-replay, metric logging.

Rebuilds the reference's DeepSpeed driver (/root/reference/
train_ds_medplib.py:383-700) as a pjit/GSPMD loop:
- ZeRO-2 -> optimizer state shards along the mesh via the same NamedShardings
  as params (parallel/mesh.py rules); gradients reduce over `data` inside the
  compiled step (XLA emits the reduce-scatter/all-reduce)
- grad accumulation: lax.scan over `ga` microbatches inside ONE compiled step
  (the reference's inner Python loop, 578-625)
- auto-resume: restore latest checkpoint, recompute epoch/step position, skip
  already-consumed batches (567-576 replay semantics)
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medplib_tpu.config import MedplibConfig, TrainConfig
from medplib_tpu.models import medplib
from medplib_tpu.train import lora as lora_lib
from medplib_tpu.train.optimizer import make_optimizer
from medplib_tpu.utils.checkpoint import CheckpointManager
from medplib_tpu.utils.logging import AverageMeter, ProgressMeter, ScalarWriter


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def create_state(params, tcfg: TrainConfig):
    mask = (lora_lib.trainable_mask(params, tcfg.sft_modules)
            if tcfg.lora_enable else None)
    tx = make_optimizer(tcfg, mask)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def make_train_step(cfg: MedplibConfig, tcfg: TrainConfig, tx,
                    ep_shard: bool = False,
                    seg_flag: bool = True, rp_flag: bool = False):
    """One compiled update over `grad_accumulation_steps` microbatches.

    batches: a pytree of arrays with leading [GA, ...] microbatch axis.
    """
    ga = tcfg.grad_accumulation_steps
    # LoRA dropout (wired from TrainConfig.lora_dropout — the reference
    # passes it to peft, train_ds_medplib.py:279-285); keys fold in the
    # global step and the microbatch index so every update samples fresh
    # masks, yet the whole schedule is deterministic from tcfg.seed
    drop_rate = tcfg.lora_dropout if tcfg.lora_enable else 0.0
    base_key = jax.random.PRNGKey(tcfg.seed ^ 0x10A4)

    def loss_fn(params, batch, drop_rng):
        with lora_lib.lora_dropout_ctx(drop_rng, drop_rate):
            out = medplib.model_forward(params, cfg, batch, train=True,
                                        seg_flag=seg_flag, rp_flag=rp_flag,
                                        remat=True, ep_shard=ep_shard)
        metrics = {k: v for k, v in out.items() if v.ndim == 0}
        return out["loss"], metrics

    def train_step(state: TrainState, batches):
        step_key = jax.random.fold_in(base_key, state.step)

        # Differentiate w.r.t. the TRAINABLE leaves only (same mask as the
        # optimizer, create_state). This is what makes the QLoRA config
        # work — a frozen int8-quantized base has integer leaves jax.grad
        # refuses to differentiate — and it keeps the grad accumulator at
        # trainable-size instead of full-model f32.
        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        if tcfg.lora_enable:
            mask_tree = lora_lib.trainable_mask(state.params,
                                                tcfg.sft_modules)
            m_lv = jax.tree_util.tree_leaves(mask_tree)
        else:
            m_lv = [True] * len(leaves)
        train_lv = [l for l, m in zip(leaves, m_lv) if m]

        def loss_from_train(tlv, batch, rng):
            it = iter(tlv)
            full = treedef.unflatten(
                [next(it) if m else l for l, m in zip(leaves, m_lv)])
            return loss_fn(full, batch, rng)

        grad_fn = jax.grad(loss_from_train, has_aux=True)

        def micro(carry, mb_and_idx):
            mb, idx = mb_and_idx
            grads_acc, metrics_acc = carry
            grads, metrics = grad_fn(train_lv, mb,
                                     jax.random.fold_in(step_key, idx))
            grads_acc = [jnp.add(a, g) for a, g in zip(grads_acc, grads)]
            metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc,
                                                 metrics)
            return (grads_acc, metrics_acc), None

        if ga == 1 and not os.environ.get("MEDPLIB_TRAIN_FORCE_SCAN"):
            # A degenerate length-1 scan is NOT free: measured 3.2-10 s/step
            # vs 150 ms for the direct call at the same 8L QLoRA config
            # (benchmarks/profile_step.py full vs full_noscan) — the scan's
            # loop-invariant capture of the frozen base re-stages GBs per
            # execution on this backend. Single microbatch -> call directly.
            batch0 = jax.tree_util.tree_map(lambda x: x[0], batches)
            grads_lv, metrics = grad_fn(
                train_lv, batch0,
                jax.random.fold_in(step_key, jnp.uint32(0)))
        elif not os.environ.get("MEDPLIB_TRAIN_FORCE_SCAN") and (
                os.environ.get("MEDPLIB_TRAIN_UNROLL_GA")
                or ga <= int(os.environ.get("MEDPLIB_TRAIN_UNROLL_MAX",
                                            "8"))):
            # UNROLLED accumulation is the default for small ga: the scanned
            # accumulator measured 42.0 s/step at ga=4 (8L QLoRA, B=2/T=48)
            # vs 445 ms unrolled — each scan iteration re-stages the
            # loop-invariant frozen base (~10.5 s/iteration on this
            # backend), while the unrolled program keeps it resident.
            # Compile time grows with ga (147 s at ga=4), so large ga falls
            # back to the scan; MEDPLIB_TRAIN_UNROLL_MAX moves the cutover
            # and MEDPLIB_TRAIN_FORCE_SCAN forces the scan for A/Bs.
            grads_lv, metrics = None, None
            for i in range(ga):
                mb = jax.tree_util.tree_map(lambda x, i=i: x[i], batches)
                g, m = grad_fn(train_lv, mb,
                               jax.random.fold_in(step_key, jnp.uint32(i)))
                if grads_lv is None:
                    grads_lv, metrics = list(g), m
                else:
                    grads_lv = [jnp.add(a, b) for a, b in zip(grads_lv, g)]
                    metrics = jax.tree_util.tree_map(jnp.add, metrics, m)
            grads_lv = [g / ga for g in grads_lv]
            metrics = jax.tree_util.tree_map(lambda v: v / ga, metrics)
        else:
            zeros = [jnp.zeros(p.shape, jnp.float32) for p in train_lv]
            batch0 = jax.tree_util.tree_map(lambda x: x[0], batches)
            m0 = jax.eval_shape(
                lambda t, b: loss_from_train(t, b, step_key)[1],
                train_lv, batch0)
            metric_zeros = jax.tree_util.tree_map(
                lambda _: jnp.zeros((), jnp.float32), m0)
            (grads_lv, metrics), _ = jax.lax.scan(
                micro, (zeros, metric_zeros),
                (batches, jnp.arange(ga, dtype=jnp.uint32)))
            grads_lv = [g / ga for g in grads_lv]
            metrics = jax.tree_util.tree_map(lambda m: m / ga, metrics)

        # full-tree grads for optax: scalar-zero placeholders at frozen
        # positions (optax.masked ignores them; apply_updates adds 0)
        it = iter(grads_lv)
        grads = treedef.unflatten(
            [next(it) if m else jnp.zeros((), jnp.float32)
             for m in m_lv])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # apply updates ONLY at trainable leaves: frozen leaves pass through
        # untouched (donation aliases them in place — no copy of e.g. a
        # frozen int8 7B base per step)
        u_lv = jax.tree_util.tree_leaves(updates)
        params = treedef.unflatten(
            [(p + u).astype(p.dtype) if m else p
             for p, u, m in zip(leaves, u_lv, m_lv)])
        metrics["grad_norm"] = optax.global_norm(grads_lv)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return train_step


class Trainer:
    """Epoch loop with checkpoints, resume, and scalar logging."""

    def __init__(self, cfg: MedplibConfig, tcfg: TrainConfig, params,
                 log_dir: str, ep_shard: bool = False, seg_flag: bool = True,
                 rp_flag: bool = False):
        if not cfg.seg.train_mask_decoder:
            # SegConfig.train_mask_decoder gates the mask decoder's
            # trainability (the reference flips requires_grad on
            # model.model.mask_decoder, MedPLIB.py:141-164 via config)
            import dataclasses as _dc
            tcfg = _dc.replace(tcfg, sft_modules=tuple(
                m for m in tcfg.sft_modules if m != "mask_decoder"))
        self.cfg, self.tcfg = cfg, tcfg
        self.state, self.tx = create_state(params, tcfg)
        self.step_fn = jax.jit(make_train_step(cfg, tcfg, self.tx, ep_shard,
                                               seg_flag, rp_flag),
                               donate_argnums=(0,))
        self.writer = ScalarWriter(log_dir)
        self.ckpt = CheckpointManager(f"{log_dir}/ckpt_model")
        self.log_dir = log_dir
        self._ep_shard, self._seg_flag, self._rp_flag = (ep_shard, seg_flag,
                                                         rp_flag)
        self._val_fn = None

    def resume_if_possible(self) -> int:
        """auto_resume (train_ds_medplib.py:452-470): restore newest ckpt,
        return global step (0 if fresh)."""
        restored, step = self.ckpt.restore(
            {"params": self.state.params, "opt_state": self.state.opt_state,
             "step": self.state.step})
        if step is None:
            return 0
        self.state = TrainState(**restored)
        return int(step)

    def save(self, step: int):
        self.ckpt.save(step, {"params": self.state.params,
                              "opt_state": self.state.opt_state,
                              "step": self.state.step})

    def validate(self, val_batches: Iterator) -> Dict[str, float]:
        """In-train validation pass (train_ds_medplib.py:721-795): the
        reference validates with a TEACHER-FORCED forward (model_engine(**x),
        not generate), binarizes sigmoid(pred) > 0.1 in the padded SAM frame
        against the collator's gt_masks, and accumulates gIoU (mean
        per-sample IoU), cIoU (IoU of summed intersections/unions), and
        mDice = mean 2·IoU/(1+IoU). Cross-host aggregation sums the meter
        state over processes (the reference's AverageMeter.all_reduce)."""
        from medplib_tpu.eval.seg_metrics import SegMeter, binarize_logits

        if self._val_fn is None:
            cfg = self.cfg

            def val_forward(params, batch):
                out = medplib.model_forward(
                    params, cfg, batch, train=False, seg_flag=True,
                    rp_flag=self._rp_flag, remat=False,
                    ep_shard=self._ep_shard)
                return out["pred_masks"], out["seg_valid"], out["loss"]

            self._val_fn = jax.jit(val_forward)

        meter = SegMeter()
        iou_list, loss_list = [], []
        for batch in val_batches:
            preds, seg_valid, loss = self._val_fn(self.state.params, batch)
            preds = np.asarray(preds)
            valid = np.asarray(seg_valid) & np.asarray(batch.mask_valid)
            gts = np.asarray(batch.gt_masks) > 0
            loss_list.append(float(loss))
            for b, s in zip(*np.nonzero(valid)):
                pred = binarize_logits(preds[b, s])
                meter.update(pred, gts[b, s])
                union = float(np.logical_or(pred > 0, gts[b, s]).sum())
                inter = float(np.logical_and(pred > 0, gts[b, s]).sum())
                iou_list.append(inter / union if union else 0.0)
        if jax.process_count() > 1:
            # sum meter state across hosts (utils/utils.py:49-70 all_reduce)
            from jax.experimental import multihost_utils as mh
            packed = np.concatenate([
                meter.inter_sum, meter.union_sum, meter.iou_sum,
                [meter.count, sum(iou_list), len(iou_list),
                 sum(loss_list), len(loss_list)]])
            total = np.sum(mh.process_allgather(packed), axis=0)
            nc = meter.num_classes
            meter.inter_sum, meter.union_sum, meter.iou_sum = (
                total[:nc], total[nc:2 * nc], total[2 * nc:3 * nc])
            meter.count = int(total[3 * nc])
            iou_sum, iou_n = total[3 * nc + 1], total[3 * nc + 2]
            loss_sum, loss_n = total[3 * nc + 3], total[3 * nc + 4]
        else:
            iou_sum, iou_n = sum(iou_list), len(iou_list)
            loss_sum, loss_n = sum(loss_list), len(loss_list)
        res = meter.results()
        miou = iou_sum / max(iou_n, 1)
        # mDice from the mean IoU (train_ds_medplib.py:775 dice_meter)
        dice = (sum(2 * i / (1 + i) for i in iou_list) / max(len(iou_list), 1)
                if jax.process_count() == 1 else 2 * miou / (1 + miou))
        res.update(miou=float(miou), dice=float(dice),
                   loss=float(loss_sum / max(loss_n, 1)))
        return res

    def fit(self, batch_iterator: Callable[[], Iterator],
            steps_per_epoch: Optional[int] = None,
            val_batches_fn: Optional[Callable[[], Iterator]] = None):
        tcfg = self.tcfg
        spe = steps_per_epoch or tcfg.steps_per_epoch
        start_step = self.resume_if_possible()
        start_epoch = start_step // spe

        # meters materialize lazily from whatever scalar metrics the model
        # emits (9 for the full MoE+seg config) — the console Progress view
        # shows everything TB gets, not a hardcoded subset
        meters: dict = {}
        batch_time = AverageMeter("time", ":.2f")
        global_step = start_step

        for epoch in range(start_epoch, tcfg.epochs):
            it = batch_iterator()
            # mid-epoch skip-replay (train_ds_medplib.py:567-576)
            skip = global_step - epoch * spe
            for _ in range(skip):
                next(it)
            progress = ProgressMeter(
                spe, list(meters.values()) + [batch_time],
                prefix=f"epoch {epoch}: ")
            # fault budget is PER EPOCH, not per step: a batch that
            # deterministically fails mid-stream re-opens the iterator each
            # step and would otherwise replay the stream head forever with
            # only printed warnings
            faults = 0
            for local_step in range(skip, spe):
                t0 = time.time()
                batches = None
                while batches is None:
                    try:
                        batches = next(it)
                    except StopIteration:
                        break
                    except Exception as e:  # noqa: BLE001 - loader fault
                        # tolerate data-loader faults by re-opening the
                        # iterator (the reference swallows loader errors the
                        # same way, train_ds_medplib.py:580-584) — bounded,
                        # so a deterministically-failing batch aborts
                        # instead of spinning forever
                        faults += 1
                        if faults > 3:
                            raise RuntimeError(
                                "data loader failed 4 times this epoch; "
                                "aborting instead of looping") from e
                        print(f"data loader error, re-iterating: {e}",
                              flush=True)
                        it = batch_iterator()
                if batches is None:
                    break
                self.state, metrics = self.step_fn(self.state, batches)
                metrics = {k: float(v) for k, v in metrics.items()}
                batch_time.update(time.time() - t0)
                for k, v in metrics.items():
                    if k not in meters:
                        meters[k] = AverageMeter(k, ":.4f")
                        progress.meters = (list(meters.values()) +
                                           [batch_time])
                    meters[k].update(v)
                global_step += 1
                if global_step % tcfg.log_steps == 0:
                    progress.display(local_step + 1)
                    self.writer.add_scalars(metrics, global_step,
                                            prefix="train/")
                    self.writer.add_scalar(
                        "metrics/total_secs_per_batch", batch_time.avg,
                        global_step)
                if global_step % tcfg.save_steps == 0:
                    self.save(global_step)
            self.save(global_step)
            if val_batches_fn is not None:
                vres = self.validate(val_batches_fn())
                self.writer.add_scalars(vres, global_step, prefix="val/")
                print(f"epoch {epoch} val: "
                      f"giou={vres['giou']:.4f} ciou={vres['ciou']:.4f} "
                      f"dice={vres['dice']:.4f} loss={vres['loss']:.4f}",
                      flush=True)
        return global_step
