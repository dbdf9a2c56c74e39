"""Generic training orchestration: epochs, logging, checkpointing.

Counterpart of the reference's two orchestrators — the Lightning CLI run
(`satclip/main_old.py:116-147`: fit + ModelCheckpoint on val_loss) and the
CSP Trainer loop (`csp/main/trainer.py:248-.../trainer_helper.py:21-145`:
epoch loop, AverageMeter logging, lr decay, periodic eval/save) — as one
framework-free loop over numpy batch iterators and a jitted step function.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp

from ..utils.checkpoint import save_msgpack
from ..utils.metrics import AverageMeter, setup_logger


@dataclasses.dataclass
class FitConfig:
    epochs: int = 1
    log_every: int = 10
    ckpt_dir: Optional[str] = None
    save_best: bool = True  # monitor val loss (ModelCheckpoint semantics)
    save_last: bool = True
    seed: int = 0
    # scalar-history file (JSONL, one object per event) so training curves
    # survive the process — the reference's TensorBoard `self.log` analog
    # (satclip/main_old.py:69-77)
    metrics_file: Optional[str] = None


def epoch_decay_schedule(lr: float, lr_decay: float, steps_per_epoch: int):
    """The CSP trainer's per-epoch exponential lr decay,
    ``lr * lr_decay**epoch`` (csp/main/trainer.py:193,730-759; default decay
    0.98), as an optax schedule — pass to `make_optimizer(learning_rate=...)`."""
    import optax

    return optax.exponential_decay(lr, transition_steps=steps_per_epoch,
                                   decay_rate=lr_decay, staircase=True)


def fit(step_fn: Callable, params, opt_state,
        train_batches: Callable[[int], Iterator[dict]],
        val_batches: Optional[Callable[[], Iterator[dict]]] = None,
        eval_loss_fn: Optional[Callable] = None,
        config: FitConfig = FitConfig(), logger=None):
    """Run the loop.

    step_fn(params, opt_state, batch, rng) -> (params, opt_state, loss)
    train_batches(epoch) -> iterator of device-ready batch dicts
    eval_loss_fn(params, batch) -> scalar loss (for val monitoring)

    Returns (params, opt_state, history dict).
    """
    from ..utils.metrics import MetricsWriter

    logger = logger or setup_logger("range_tpu.fit")
    if config.ckpt_dir:
        os.makedirs(config.ckpt_dir, exist_ok=True)
    writer = MetricsWriter(config.metrics_file) if config.metrics_file else None
    key = jax.random.PRNGKey(config.seed)
    history = {"train_loss": [], "val_loss": []}
    best_val = float("inf")
    step = 0
    for epoch in range(config.epochs):
        meter = AverageMeter()
        for batch in train_batches(epoch):
            key, sub = jax.random.split(key)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss = step_fn(params, opt_state, batch, sub)
            step += 1
            meter.update(float(loss))
            if step % config.log_every == 0:
                logger.info(f"epoch {epoch} step {step} loss {meter.val:.4f} "
                            f"(avg {meter.avg:.4f})")
                if writer:
                    writer.log(step, epoch=epoch, train_loss=meter.val,
                               train_loss_avg=meter.avg)
        history["train_loss"].append(meter.avg if meter.count else float("nan"))
        if not meter.count:
            logger.warning(f"epoch {epoch}: no training batches")

        if val_batches is not None and eval_loss_fn is not None:
            vmeter = AverageMeter()
            for batch in val_batches():
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                vmeter.update(float(eval_loss_fn(params, batch)))
            history["val_loss"].append(vmeter.avg)
            logger.info(f"epoch {epoch} val_loss {vmeter.avg:.4f}")
            if writer:
                writer.log(step, epoch=epoch, val_loss=vmeter.avg)
            if config.ckpt_dir and config.save_best and vmeter.avg < best_val:
                best_val = vmeter.avg
                save_msgpack(os.path.join(config.ckpt_dir, "best.msgpack"), params)

        if config.ckpt_dir and config.save_last:
            os.makedirs(config.ckpt_dir, exist_ok=True)
            save_msgpack(os.path.join(config.ckpt_dir, "last.msgpack"), params)
    if writer:
        writer.close()
    return params, opt_state, history
