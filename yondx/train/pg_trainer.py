"""Noise-estimation-net (EstUnet / est_UNet) trainer.

The reference trains its NLE nets from the DIV2K_PG_Dataset 'est' command
stacks (yond_datasets.py:721-751) with the AWGN harness; here the PG data
transform runs on device (yondx.data.pg_dataset) and the loss is a
flat-region-masked L1 between the predicted std map and the analytic
target sqrt(beta1*blur(hr)+beta2).

Two est-net flavours (SURVEY.md §2.6):
- EstUnet ('ours' est_self/est_collab nets): std-map output, feature stack
  input [lr_std | lr_blur | lr];
- est_UNet ('pge'): scalar [K, sigma] regression from the raw frame.
"""
from __future__ import annotations


from typing import Any, Dict, Optional


import jax
import jax.numpy as jnp
import optax

from ..core.logging import log
from ..core.meters import AverageMeter
from ..data.datasets import SyntheticSRGBDataset, BatchLoader
from ..data.pg_dataset import pg_training_batch, pg_est_features
from ..models import build_model
from ..models.registry import init_params
from .ckpt import save_checkpoint
from .schedule import lr_lambda_from_hyper


class PGEstTrainer:
    """Trains a noise-estimation net on PG-corrupted pseudo-raw.

    Flavor follows the arch (SURVEY.md §2.6):
    - EstUnet (default): std-MAP regression, flat-masked L1 against the
      analytic sqrt(beta1*blur(hr)+beta2) target;
    - est_UNet ('pge'): scalar [beta1, sqrt(beta2)] regression in LOG
      space (the prior spans ~2.5 decades; a linear loss would be
      dominated by the high-noise draws) — the engine's 'pge' est_type
      consumes exactly (pred[0], pred[1]**2) (pipeline/engine.py:201)."""

    def __init__(self, args: Dict[str, Any]):
        self.args = args
        self.arch = args["arch"]
        self.hyper = args["hyper"]
        self.model_name = args.get("model_name", "estnet")
        self.fast_ckpt = args.get("fast_ckpt", "checkpoints")
        self.k = self.arch.get("k", 19)
        self.flavor = "pge" if self.arch.get("name") == "est_UNet" \
            else "map"
        self.model = build_model(self.arch)
        ps = args.get("dst_train", {}).get("patch_size", 256)
        in_nc = self.arch.get("in_nc", 12)
        self.params = init_params(self.model, jax.random.PRNGKey(0),
                                  (1, ps // 2, ps // 2, in_nc),
                                  guided=False)
        self.lr_fn = lr_lambda_from_hyper(self.hyper)
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.lr_fn(1))
        self.opt_state = self.tx.init(self.params)
        self.meter = AverageMeter("loss")
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        model, tx, k = self.model, self.tx, self.k

        def loss_map(params, key, batch):
            lr, hr, meta = pg_training_batch(key, batch)
            out = pg_est_features(lr, hr, meta["beta1"], meta["beta2"],
                                  k=k)
            pred = model.apply(params, out["features"])
            err = jnp.abs(pred - out["target"]) * out["mask"]
            return jnp.sum(err) / jnp.maximum(jnp.sum(out["mask"]), 1.0)

        def loss_pge(params, key, batch):
            lr, hr, meta = pg_training_batch(key, batch)
            pred = model.apply(params, jnp.clip(lr, 0.0, 1.0))
            pred = pred.reshape(lr.shape[0], -1)
            target = jnp.stack([meta["beta1"],
                                jnp.sqrt(meta["beta2"])], axis=-1)
            eps = 1e-6
            return jnp.mean(jnp.abs(jnp.log(pred + eps)
                                    - jnp.log(target + eps)))

        loss_fn = loss_pge if self.flavor == "pge" else loss_map

        def step(params, opt_state, key, batch, lr_value):
            if batch.dtype == jnp.uint8:
                batch = batch.astype(jnp.float32) / 255.0
            loss, grads = jax.value_and_grad(loss_fn)(params, key, batch)
            opt_state.hyperparams["learning_rate"] = lr_value
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def train(self, epochs: Optional[int] = None,
              steps_per_epoch: Optional[int] = None):
        hyper = self.hyper
        stop = epochs or hyper["stop_epoch"]
        dst = self.args.get("dst_train", {})
        ds = SyntheticSRGBDataset(length=dst.get("synthetic_len", 512),
                                  size=dst.get("patch_size", 256))
        loader = BatchLoader(ds, hyper["batch_size"])
        key = jax.random.PRNGKey(hyper.get("seed", 0))
        for epoch in range(1, stop + 1):
            self.meter.reset()
            lr_value = self.lr_fn(epoch)
            n = 0
            for batch in loader.epoch(epoch):
                key, sub = jax.random.split(key)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, sub, jnp.asarray(batch),
                    jnp.float32(lr_value))
                self.meter.update(float(loss))
                n += 1
                if steps_per_epoch and n >= steps_per_epoch:
                    break
            log(f"[est] Epoch {epoch}: loss={self.meter.avg:.5f}")
            if epoch % hyper.get("save_freq", 10) == 0:
                save_checkpoint(
                    f"{self.fast_ckpt}/{self.model_name}_last_model.ckpt",
                    jax.device_get(self.params),
                    jax.device_get(self.opt_state), epoch)
        return self.meter.avg
