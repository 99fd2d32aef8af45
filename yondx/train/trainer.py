"""AWGN trainer: the full training harness.

Rebuild of trainer_AWGN.py / trainer_base.py with the TPU-first data path:
one jitted train step does device-resident unprocess augmentation (CCM/WB
inversion, gamma, mosaic, CFA rotation), AWGN corruption with log-uniform
sigma, the guided forward, L1 loss, and the Adam update — sharded over the
mesh 'data' axis (params replicated; XLA inserts the gradient all-reduce
over ICI). The host thread only feeds uint8/float sRGB crops.

Feature parity with the reference train loop (trainer_AWGN.py:78-193):
SGDR cosine LR stepped per epoch, per-stage %-time postfix, PSNR meter with
pkl-backed history, rolling last/epoch/best checkpoints (with optimizer
state — an improvement), periodic fast eval at sigma_list[1], EMA
consistency branch ('consistency' in dst.command, active after epoch 100).
"""
from __future__ import annotations

import os
import time

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.logging import log, timestamp
from ..core.meters import AverageMeter
from ..data.unprocess import srgb_to_pseudo_raw
from ..data.noise import (awgn_log_uniform,
                          awgn_log_uniform_lowmix, awgn_uniform)
from ..data.augment import data_aug8
from ..data.datasets import (SyntheticSRGBDataset, NpyFolderDataset,
                             BatchLoader)
from ..models import build_model
from ..models.registry import init_params, is_guided
from ..parallel.mesh import make_mesh, shard_batch, replicate
from .losses import unet_loss, psnr_loss
from .schedule import lr_lambda_from_hyper
from .ckpt import save_checkpoint, load_checkpoint, find_checkpoint


class AWGNTrainer:
    def __init__(self, args: Dict[str, Any], mesh=None, dtype=None):
        """args: the parsed YAML runfile dict (dst*/arch/hyper blocks)."""
        # persistent XLA compile cache: chunked/resumed runs skip the
        # 20-40s train-step compile
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/yondx_xla_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass
        self.args = args
        self.arch = args["arch"]
        self.hyper = args["hyper"]
        self.dst = args.get("dst_train", args.get("dst", {}))
        self.dst_eval = args.get("dst_eval", self.dst)
        self.model_name = args.get("model_name", "model")
        self.fast_ckpt = args.get("fast_ckpt", "checkpoints")
        self.model_dir = args.get("checkpoint", "saved_model")
        self.sample_dir = os.path.join(args.get("result_dir", "images"),
                                       f"samples-{self.model_name}")
        self.guided = is_guided(self.arch)
        # RGB_Img_Dataset mode (yond_datasets.py:336-434): plain sRGB AWGN
        # training — no unprocess/mosaic/CFA, UNIFORM sigma, 8-way aug
        self.rgb_mode = (self.dst.get("dataset") == "RGB_Img_Dataset"
                         or self.arch.get("in_nc") == 3)
        self.logfile = f"./logs/log_{self.model_name}.log"

        self.model = build_model(self.arch, dtype=dtype)
        if mesh is None:
            # default mesh: as many devices as divide the batch size
            n = len(jax.devices())
            bs = self.hyper["batch_size"]
            while n > 1 and bs % n:
                n -= 1
            mesh = make_mesh(n)
        self.mesh = mesh
        ps = self.dst.get("patch_size", 256)
        net_ps = ps if self.rgb_mode else ps // 2
        self.params = init_params(self.model, jax.random.PRNGKey(0),
                                  (1, net_ps, net_ps, self.arch["in_nc"]),
                                  guided=self.guided)
        # reference conv init N(0, 0.02) on fresh nets (trainer_AWGN.py:33);
        # a resume below overwrites it from the checkpoint
        from ..models.registry import initialize_weights
        self.params = initialize_weights(self.params, jax.random.PRNGKey(42))

        self.lr_fn = lr_lambda_from_hyper(self.hyper)
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.lr_fn(max(self.hyper.get("last_epoch", 0), 1)))
        self.opt_state = self.tx.init(self.params)
        self.best_psnr = float(self.hyper.get("best_psnr", 0.0))
        self.epoch = self.hyper.get("last_epoch", 0)

        # resume (reference trainer_AWGN.py:21-30); last_epoch == -1 means
        # "auto": continue from whatever epoch the checkpoint carries (used
        # by the chunked trainer that bounds process lifetime)
        if self.epoch:
            path = find_checkpoint(self.fast_ckpt, self.model_name,
                                   prefer="last")
            if path:
                state = load_checkpoint(path, self.params, self.opt_state)
                self.params = state["params"]
                if state.get("opt_state"):
                    self.opt_state = state["opt_state"]
                self.best_psnr = state.get("best_psnr", self.best_psnr)
                if self.epoch == -1:
                    self.epoch = int(state.get("epoch", 0))
                log(f"Resumed from {path} @ epoch {state.get('epoch')}",
                    logfile=self.logfile)
            else:
                if self.epoch == -1:
                    self.epoch = 0
                log("No checkpoint file!!!", logfile=self.logfile)

        self.params = replicate(self.mesh, self.params)
        self.opt_state = replicate(self.mesh, self.opt_state)

        self.train_psnr = AverageMeter("PSNR", ":2f")
        self.eval_psnr = AverageMeter("PSNR", ":2f")
        self.eval_ssim = AverageMeter("SSIM", ":4f")

        self.sigma_min = float(self.dst.get("sigma_min", 5))
        self.sigma_max = float(self.dst.get("sigma_max", 50))
        self.clip = bool(self.dst.get("clip", True))
        self.command = self.dst.get("command", "")
        self.consistency = "consistency" in self.command
        self.bayeraug = "no_bayeraug" not in self.command
        # 'chroma_aug': post-unprocess per-channel raw gain jitter. The
        # unprocess chain's inverse-WB division compresses raw chroma, so
        # large strongly-colored flats are rare in training and the net
        # learns a gray-world prior: on a flat patch with B/G = 2.8 it
        # biases R +0.089 / B -0.090 toward gray, sigma-independent —
        # measured root cause of the round-2 "26 dB chart ceiling"
        # (saturated interiors actually score 49 dB). This flag covers
        # the chroma tail directly in raw space.
        self.chroma_aug = "chroma_aug" in self.command
        # 'low_sigma': draw half the per-sample sigmas log-uniform in
        # [smin, 8] instead of [smin, smax] (data/noise.py lowmix) — the
        # glyph-margin fine-tune's noise emphasis
        self.low_sigma = "low_sigma" in self.command

        # optional distillation (args 'distill' block): a frozen TEACHER
        # net's output replaces/augments the GT target. Used to transfer
        # the flagship GuidedResUnet into the packed GuidedResUnetS2D: the
        # ported interior stages are the teacher's own weights, so training
        # only the packing-boundary layers against the teacher's OUTPUT
        # (freeze: 'ported') fits the adapter directly instead of
        # re-learning the denoising prior from noisy/GT pairs.
        #   distill: {teacher_arch: {...}, teacher_ckpt: name,
        #             weight: 1.0, gt_weight: 0.0, freeze: 'ported'|[names]}
        self.distill = args.get("distill")
        self.teacher_params = None
        self._frozen = frozenset()
        if self.distill:
            t_arch = self.distill["teacher_arch"]
            self.teacher_model = build_model(t_arch, dtype=dtype)
            t_params = init_params(
                self.teacher_model, jax.random.PRNGKey(1),
                (1, net_ps, net_ps, t_arch["in_nc"]), guided=True)
            t_ck = find_checkpoint(self.fast_ckpt,
                                   self.distill["teacher_ckpt"])
            assert t_ck, f"teacher ckpt {self.distill['teacher_ckpt']}"
            t_params = load_checkpoint(t_ck, t_params)["params"]
            self.teacher_params = replicate(self.mesh, t_params)
            frz = self.distill.get("freeze", [])
            if frz == "ported":
                from .s2d_port import S2D_PORT_MAP
                frz = list(S2D_PORT_MAP)
            self._frozen = frozenset(frz or [])
            log(f"distill: teacher={t_ck} w={self.distill.get('weight', 1.0)}"
                f" gt_w={self.distill.get('gt_weight', 0.0)}"
                f" frozen={len(self._frozen)} stages",
                logfile=self.logfile)

        # no donation: params is also passed as the ema snapshot
        self._train_step = jax.jit(self._make_train_step())
        self._eval_step = jax.jit(self._make_eval_step())

    # ------------------------------------------------------------- steps
    def _make_train_step(self):
        model, guided = self.model, self.guided
        # optional rematerialization: trade recompute for activation memory
        # (hyper.remat: true) — lets batch/patch scale beyond HBM limits
        if self.hyper.get("remat", False):
            apply_fn = jax.checkpoint(
                lambda p, *a: self.model.apply(p, *a))
            model = type("RematModel", (), {"apply": staticmethod(apply_fn)})
        clip, bayeraug = self.clip, self.bayeraug
        chroma_aug = self.chroma_aug
        low_sigma = self.low_sigma
        smin, smax = self.sigma_min, self.sigma_max
        consistency = self.consistency
        tx = self.tx
        distill = self.distill
        teacher_model = getattr(self, "teacher_model", None)
        teacher_params = self.teacher_params
        d_w = float(distill.get("weight", 1.0)) if distill else 0.0
        gt_w = float(distill.get("gt_weight", 0.0)) if distill else 1.0
        frozen = self._frozen

        def loss_fn(params, lr, hr, sigma, ema_params, key, use_consistency):
            if guided:
                pred = model.apply(params, lr, sigma)
            else:
                pred = model.apply(params, lr)
            loss = gt_w * unet_loss(pred, hr)
            if distill:
                t_pred = jax.lax.stop_gradient(
                    teacher_model.apply(teacher_params, lr, sigma))
                loss = loss + d_w * jnp.mean(jnp.abs(pred - t_pred))
            if consistency:
                # second noisy view through the epoch-start snapshot
                # (trainer_AWGN.py:103-108,114-115)
                k1, k2 = jax.random.split(key)
                st = jax.random.uniform(k1) * 0.25 + 0.7
                bshape = (hr.shape[0],) + (1,) * (hr.ndim - 1)
                noise = jax.random.normal(k2, hr.shape) * \
                    sigma.reshape(bshape)
                lr2 = hr + noise * st
                if guided:
                    pred2 = model.apply(ema_params, lr2, sigma * st)
                else:
                    pred2 = model.apply(ema_params, lr2)
                pred2 = jax.lax.stop_gradient(pred2)
                loss = loss + use_consistency * 0.1 * jnp.mean(
                    jnp.abs(pred - pred2))
            return loss, pred

        rgb_mode = self.rgb_mode

        def step(params, opt_state, key, batch, lr_value, ema_params,
                 use_consistency):
            k_data, k_noise, k_cons = jax.random.split(key, 3)
            if batch.dtype == jnp.uint8:
                batch = batch.astype(jnp.float32) / 255.0
            if rgb_mode:
                # plain sRGB path (RGB_Img_Dataset): 8-way aug + uniform-
                # sigma AWGN directly on the 3-channel crops
                modes = jax.random.randint(k_data, (batch.shape[0],), 0, 8)
                hr = data_aug8(batch, modes)
                wb = jnp.ones((batch.shape[0], 4))
                cam2rgb = jnp.broadcast_to(jnp.eye(3), (batch.shape[0], 3, 3))
                pattern = jnp.zeros((batch.shape[0],), jnp.int32)
                noisy, sigma = awgn_uniform(k_noise, hr, smin, smax)
            else:
                hr, wb, cam2rgb, pattern = srgb_to_pseudo_raw(
                    k_data, batch, bayer_aug_enabled=bayeraug)
                if chroma_aug:
                    # per-sample raw-domain R/B gain jitter (log-uniform
                    # in [1/2.5, 2.5], half the batch) so chroma-extreme
                    # flats exist in training; G anchors exposure
                    k_c, k_g, k_noise = jax.random.split(k_noise, 3)
                    gains = jnp.exp(jax.random.uniform(
                        k_c, (hr.shape[0], 2), minval=-np.log(2.5),
                        maxval=np.log(2.5)))
                    on = (jax.random.uniform(k_g, (hr.shape[0], 1))
                          < 0.5).astype(hr.dtype)
                    gr = 1.0 + on * (gains[:, :1] - 1.0)      # [B,1]
                    gb = 1.0 + on * (gains[:, 1:] - 1.0)
                    ones = jnp.ones_like(gr)
                    g4 = jnp.concatenate([gr, ones, ones, gb],
                                         axis=1)[:, None, None, :]
                    hr = jnp.clip(hr * g4, 0.0, 1.0)
                if low_sigma:
                    noisy, sigma = awgn_log_uniform_lowmix(
                        k_noise, hr, smin, smax)
                else:
                    noisy, sigma = awgn_log_uniform(k_noise, hr, smin,
                                                    smax)
            if clip:
                noisy = jnp.clip(noisy, 0.0, 1.0)
                hr = jnp.clip(hr, 0.0, 1.0)
            (loss, pred), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, noisy, hr, sigma,
                                       ema_params, k_cons, use_consistency)
            opt_state.hyperparams["learning_rate"] = lr_value
            updates, opt_state = tx.update(grads, opt_state, params)
            if frozen:
                # zero the update on frozen stages (adapter-only phase of a
                # distillation transfer); top-level module names under
                # 'params'
                updates = dict(updates)
                updates["params"] = {
                    k: (jax.tree.map(jnp.zeros_like, v) if k in frozen
                        else v)
                    for k, v in dict(updates["params"]).items()}
            params = optax.apply_updates(params, updates)
            m = psnr_loss(jnp.clip(pred, 0, 1), jnp.clip(hr, 0, 1))
            # first-sample visualization payload (fetched only on dump
            # steps; stays on device otherwise)
            sample = (jnp.clip(noisy[0], 0, 1), jnp.clip(pred[0], 0, 1),
                      hr[0], wb[0], cam2rgb[0], pattern[0])
            return params, opt_state, loss, m, sample

        return step

    def _make_eval_step(self):
        model, guided = self.model, self.guided

        def step(params, lr, hr, sigma):
            if guided:
                pred = model.apply(params, lr, sigma)
            else:
                pred = model.apply(params, lr)
            pred = jnp.clip(pred, 0, 1)
            return pred, psnr_loss(pred, jnp.clip(hr, 0, 1))

        return step

    # ------------------------------------------------------------- data
    def _make_loader(self, mode: str) -> BatchLoader:
        dst = self.dst if mode == "train" else self.dst_eval
        bs = self.hyper["batch_size"] if mode == "train" else \
            max(4, self.hyper["batch_size"] // 8)
        dataset_name = dst.get("dataset", "SyntheticSRGBDataset")
        root = dst.get("root_dir", "")
        try:
            if dataset_name in ("RGB_Img2Raw_Dataset", "NpyFolderDataset",
                                "DIV2K_Img2Raw_Dataset",
                                "RGB_Img_Dataset") and root:
                ds = NpyFolderDataset(root, mode=dst.get("mode", mode),
                                      subname=dst.get("subname"))
            else:
                raise FileNotFoundError
        except (FileNotFoundError, OSError):
            n = dst.get("synthetic_len", 512 if mode == "train" else 32)
            ds = SyntheticSRGBDataset(
                length=n, size=dst.get("patch_size", 256),
                seed=1997 if mode == "train" else 2024,
                version=dst.get("content_version", 6))
        # debug/tiny datasets: never let the batch exceed the dataset (a
        # too-large batch would yield ZERO steps per epoch); keep it a
        # multiple of the mesh size for shard_batch
        n_dev = int(self.mesh.devices.size)
        bs = max(1, min(bs, len(ds)))
        if bs % n_dev:
            bs = max(n_dev, bs - bs % n_dev)
        return BatchLoader(ds, bs, shuffle=(mode == "train"),
                           seed=self.hyper.get("seed", 0))

    # ------------------------------------------------------------- train
    def train(self, stop_epoch: Optional[int] = None,
              steps_per_epoch: Optional[int] = None):
        hyper = self.hyper
        stop = stop_epoch or hyper["stop_epoch"]
        pf = hyper.get("plot_freq", 25)
        loader = self._make_loader("train")
        key = jax.random.PRNGKey(hyper.get("seed", 1997))

        for epoch in range(self.epoch + 1, stop + 1):
            self.train_psnr.reset()
            lr_value = self.lr_fn(epoch)
            ema_params = self.params  # epoch-start snapshot
            use_cons = jnp.float32(1.0 if (self.consistency and epoch > 100)
                                   else 0.0)
            runtime = {"dataloader": 0.0, "net": 0.0, "total": 1e-9}
            tp = [time.time()] * 4
            n_steps = 0
            for batch in loader.epoch(epoch):
                runtime["dataloader"] += timestamp(tp, 1)
                key, sub = jax.random.split(key)
                b = shard_batch(self.mesh, batch)
                self.params, self.opt_state, loss, m, sample = \
                    self._train_step(
                        self.params, self.opt_state, sub, b,
                        jnp.float32(lr_value), ema_params, use_cons)
                m = float(m)
                if n_steps % 100 == 0:
                    self._dump_temp_sample(sample, epoch, pf)
                # the tunneled device client retains host staging buffers;
                # free the batch explicitly (observed ~10 MB/step host leak
                # -> OOM after ~12k steps without this)
                try:
                    b.delete()
                except Exception:
                    pass
                runtime["net"] += timestamp(tp, 2)
                self.train_psnr.update(m)
                n_steps += 1
                tp[0] = time.time()
                if steps_per_epoch and n_steps >= steps_per_epoch:
                    break
            del ema_params
            import gc
            gc.collect()
            runtime["total"] = max(runtime["dataloader"] + runtime["net"],
                                   1e-9)
            log(f"Epoch {epoch}: lr={lr_value:.2e} "
                f"PSNR={self.train_psnr.avg:.2f} "
                f"loader={100 * runtime['dataloader'] / runtime['total']:.0f}% "
                f"net={100 * runtime['net'] / runtime['total']:.0f}%",
                logfile=self.logfile)
            self.epoch = epoch

            if epoch % hyper.get("save_freq", 10) == 0:
                self._save("last", epoch)
                self._save(f"e{epoch // pf * pf:04d}", epoch,
                           directory=self.model_dir)
                # psnr-history curve + pkl (reference trainer_AWGN.py:167-169)
                os.makedirs(self.sample_dir, exist_ok=True)
                self.train_psnr.plot_history(
                    savefile=os.path.join(
                        self.sample_dir, f"{self.model_name}_train_psnr.jpg"),
                    logfile=os.path.join(
                        self.sample_dir, f"{self.model_name}_train_psnr.pkl"))
            if epoch % pf == 0:
                self.eval(epoch=epoch)

    def _save(self, tag: str, epoch: int, directory: Optional[str] = None):
        if tag.startswith("e"):
            path = os.path.join(directory or self.model_dir,
                                f"{self.model_name}_{tag}.ckpt")
        else:
            path = os.path.join(self.fast_ckpt,
                                f"{self.model_name}_{tag}_model.ckpt")
        save_checkpoint(path, jax.device_get(self.params),
                        jax.device_get(self.opt_state), epoch,
                        self.best_psnr)

    def _dump_temp_sample(self, sample, epoch: int, pf: int):
        """Periodic training triptych (reference trainer_AWGN.py:136-149):
        noisy | prediction | GT of the first batch element, CFA-unrotated
        and FastISP-rendered, overwritten at
        samples/temp/temp_{epoch_bucket:04d}.png. Never fatal."""
        try:
            import cv2
            from ..isp.bayer import bayer_aug
            from ..isp.render import fast_isp
            noisy, pred, hr, wb, cam2rgb, pattern = \
                (np.asarray(x) for x in sample)
            trip = np.concatenate([noisy, pred, hr], axis=1)
            if trip.shape[-1] == 4:
                pck = int((4 - pattern) % 4)
                trip = np.asarray(bayer_aug(jnp.asarray(trip), pck))
                img = fast_isp(trip, wb=wb.reshape(-1),
                               ccm=cam2rgb.reshape(3, 3))
            else:
                img = np.clip(trip, 0, 1)
            out_dir = os.path.join(self.sample_dir, "temp")
            os.makedirs(out_dir, exist_ok=True)
            fname = os.path.join(out_dir,
                                 f"temp_{epoch // pf * pf:04d}.png")
            cv2.imwrite(fname, np.uint8(img[:, :, ::-1] * 255))
        except Exception as e:  # visualization must never kill training
            log(f"sample dump skipped: {type(e).__name__}: {e}",
                logfile=self.logfile)

    def predict(self, raw_bayer, tile: int = 1024, halo: int = 64,
                t: float = 0.0):
        """Tiled full-frame inference with the trained net (reference
        AWGN_Trainer.predict, trainer_AWGN.py:331-346): bayer [H, W] in
        [0,1] -> denoised bayer via the overlap-tiled runner."""
        from ..pipeline import SimpleDenoiser
        from ..core.tiling import np_tile_overlap, tile_grid
        den = SimpleDenoiser(self.model, self.params, guided=self.guided)
        raw = np.asarray(raw_bayer, np.float32)
        H, W = raw.shape
        tiles, plan = np_tile_overlap(raw, tile, halo)
        outs = []
        for s in range(0, tiles.shape[0], 8):
            outs.append(np.asarray(den(jnp.asarray(tiles[s:s + 8]), t)))
        tiles = np.concatenate(outs, 0)
        ny, nx, _, _ = tile_grid(H, W, tile, halo)
        out = np.empty((ny * tile, nx * tile), np.float32)
        for iy in range(ny):
            for ix in range(nx):
                out[iy * tile:(iy + 1) * tile, ix * tile:(ix + 1) * tile] = \
                    tiles[iy * nx + ix, halo:halo + tile, halo:halo + tile]
        return out[:H, :W]

    # -------------------------------------------------------------- eval
    def eval(self, epoch: int = -1, sigma: Optional[float] = None):
        from ..eval.metrics import matlab_ssim
        self.eval_psnr.reset()
        self.eval_ssim.reset()
        sigma_list = self.dst_eval.get("sigma_list", [10, 25, 50])
        sig = (sigma if sigma is not None else sigma_list[1]) / 255.0
        loader = self._make_loader("eval")
        key = jax.random.PRNGKey(2024)
        for i, batch in enumerate(loader.epoch(0)):
            key, k1, k2 = jax.random.split(key, 3)
            b = jnp.asarray(batch)
            if b.dtype == jnp.uint8:
                b = b.astype(jnp.float32) / 255.0
            if self.rgb_mode:
                hr = b
            else:
                hr, _, _, _ = srgb_to_pseudo_raw(k1, b,
                                                 bayer_aug_enabled=False)
            noise = jax.random.normal(k2, hr.shape) * sig
            lr = jnp.clip(hr + noise, 0, 1) if self.clip else hr + noise
            hr = jnp.clip(hr, 0, 1) if self.clip else hr
            t = jnp.full((hr.shape[0],), sig, jnp.float32)
            pred, m = self._eval_step(self.params, lr, hr, t)
            self.eval_psnr.update(float(m))
            # channels to a leading dim so matlab_ssim sees [..., H, W]
            self.eval_ssim.update(float(matlab_ssim(
                jnp.moveaxis(pred, -1, 1) * 255,
                jnp.moveaxis(hr, -1, 1) * 255)))
        if self.eval_psnr.avg >= self.best_psnr and epoch > 0:
            self.best_psnr = self.eval_psnr.avg
            log(f"Best PSNR is {self.best_psnr} now!!", logfile=self.logfile)
            self._save("best", epoch)
        log(f"Epoch {epoch}: eval PSNR={self.eval_psnr.avg:.2f}, "
            f"SSIM={self.eval_ssim.avg:.4f} (sigma={sig * 255:.0f})",
            logfile=self.logfile)
        return self.eval_psnr.avg, self.eval_ssim.avg
