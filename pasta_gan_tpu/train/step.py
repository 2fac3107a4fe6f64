"""Jitted GAN training steps (reference `training/training_loop_wo_flow_fullbody.py:419-539`
+ `training/loss_wo_flow_fullbody.py:106-254`), redesigned as pure functions.

Phase structure of the reference (fashion config): Gmain(1), Greg(4, pl=0 — a
no-op), Dmain(1), Dreg(16).  Here:

* `train_step`     == Gmain + Dmain + EMA + w_avg + ADA controller, one jit
* `d_r1_step`      == Dreg (R1 with lazy-reg gain=interval), separate jit
* `g_pl_step`      == Greg (path-length reg), only built when pl_weight > 0

Data parallelism: each step takes an optional `axis_name`; when run under
`shard_map` over a `data` mesh axis, gradients and stats are `lax.pmean`-ed
across ICI — the TPU-native equivalent of the reference's DDP allreduce
(`SURVEY.md section 2.9`).  Optimizer updates then apply identically on every
device (params stay replicated, like DDP).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import Discriminator, GeneratorFull, cat_feats_dict
from ..runtime.config import TrainConfig, lazy_reg_scaling
from . import losses
from .state import TrainState
from .vgg import vgg_perceptual_loss


def _pmean(tree, axis_name: Optional[str]):
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def _scrub(tree, posinf=1e5):
    """NaN/Inf gradient scrubbing (reference `training_loop...py:513-515`)."""
    return jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=posinf, neginf=-posinf), tree
    )


class GANTrainer:
    """Owns module definitions, optimizers, and the compiled step functions."""

    def __init__(
        self,
        config: TrainConfig,
        vgg_params: Optional[Any] = None,
        augment_fn: Optional[Callable] = None,
        axis_name: Optional[str] = None,
    ):
        self.config = config
        m = config.model
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        self.gen = GeneratorFull(
            z_dim=m.z_dim,
            c_dim=m.c_dim,
            w_dim=m.w_dim,
            img_resolution=m.img_resolution,
            img_channels=m.img_channels,
            mapping_layers=m.mapping_layers,
            channel_base=m.channel_base,
            channel_max=m.channel_max,
            conv_clamp=m.conv_clamp,
            use_noise=m.use_noise,
            remat=m.remat,
            style_input_nc=m.style_input_nc,
            dtype=dtype,
        )
        self.disc = Discriminator(
            c_dim=m.c_dim,
            img_resolution=m.img_resolution,
            img_channels=m.img_channels,
            channel_base=m.channel_base,
            channel_max=m.channel_max,
            conv_clamp=m.conv_clamp,
            mbstd_group_size=m.mbstd_group_size,
            mbstd_num_channels=m.mbstd_num_channels,
            freeze_layers=m.freeze_layers,
            dtype=dtype,
        )
        self.vgg_params = vgg_params
        if augment_fn is None and config.ada.enabled:
            from .augment import AugmentPipe

            augment_fn = AugmentPipe.from_spec(
                config.ada.pipe,
                static_margin=config.ada.static_margin,
                fast_geom=config.ada.fast_geom,
            )
        self.augment_fn = augment_fn  # (images, p, rng) -> images
        self.axis_name = axis_name

        # Lazy-regularization lr/beta scaling.
        g_opt = lazy_reg_scaling(config.g_opt, config.g_reg_interval)
        d_opt = lazy_reg_scaling(config.d_opt, config.d_reg_interval)
        self.g_tx = optax.adam(g_opt.lr, b1=g_opt.beta1, b2=g_opt.beta2, eps=g_opt.eps)
        self.d_tx = optax.adam(d_opt.lr, b1=d_opt.beta1, b2=d_opt.beta2, eps=d_opt.eps)

    # ------------------------------------------------------------- init

    def init_state(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> TrainState:
        m = self.config.model
        g_rng, d_rng, noise_rng = jax.random.split(rng, 3)
        z = None if m.z_dim == 0 else jnp.zeros((batch["real_img"].shape[0], m.z_dim))
        # init with noise_mode="const" so the noise_const buffers exist in the
        # variables (training's "random" mode ignores them; snapshot grids use
        # "const" like the reference, training loop :579-584).
        g_params = self.gen.init(
            {"params": g_rng, "noise": noise_rng},
            z,
            batch["style_input"],
            batch["retain"],
            batch["pose"],
            batch["denorm_upper_img"],
            batch["denorm_lower_img"],
            batch["denorm_upper_mask"],
            batch["denorm_lower_mask"],
            noise_mode="const",
        )
        d_params = self.disc.init(
            d_rng, batch["real_img"], jnp.zeros((batch["real_img"].shape[0], m.c_dim))
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            d_params=d_params,
            # materialized copy: must not alias g_params (buffer donation safety)
            g_ema_params=jax.tree_util.tree_map(jnp.copy, g_params),
            w_avg=jnp.zeros((m.w_dim,), jnp.float32),
            g_opt_state=self.g_tx.init(g_params),
            d_opt_state=self.d_tx.init(d_params),
            pl_mean=jnp.zeros((), jnp.float32),
            ada_p=jnp.asarray(self.config.ada.initial_p, jnp.float32),
            ada_signs_sum=jnp.zeros((), jnp.float32),
            ada_signs_count=jnp.zeros((), jnp.float32),
        )

    # ------------------------------------------------------------- forward helpers

    def run_G(self, g_params, batch, rng, style_mixing: bool = True):
        """Reference run_G (`loss_wo_flow_fullbody.py:74-94`): style/pose encode,
        map (+ style mixing when z_dim > 0), synthesize."""
        m = self.config.model
        z_rng, mix_rng, cutoff_rng, noise_rng = jax.random.split(rng, 4)
        N = batch["real_img"].shape[0]

        def apply(method, *args, **kw):
            return self.gen.apply(
                g_params, *args, method=method, rngs={"noise": noise_rng}, **kw
            )

        stylecode, feats = apply(self.gen.encode_style, batch["style_input"], batch["retain"])
        pose_feat = apply(self.gen.encode_pose, batch["pose"])
        z = jax.random.normal(z_rng, (N, m.z_dim)) if m.z_dim > 0 else None
        ws, w_raw = apply(self.gen.map_ws, z, stylecode)

        if style_mixing and m.z_dim > 0 and self.config.loss.style_mixing_prob > 0:
            z2 = jax.random.normal(mix_rng, (N, m.z_dim))
            ws2, _ = apply(self.gen.map_ws, z2, stylecode)
            num_ws = ws.shape[1]
            cutoff_rng, use_rng = jax.random.split(cutoff_rng)
            cutoff = jax.random.randint(cutoff_rng, (), 1, num_ws)
            use_mix = jax.random.uniform(use_rng) < self.config.loss.style_mixing_prob
            cutoff = jnp.where(use_mix, cutoff, num_ws)
            idx = jnp.arange(num_ws)[None, :, None]
            ws = jnp.where(idx >= cutoff, ws2, ws)

        img, finetune_img, pred_parsing = apply(
            self.gen.synthesize,
            ws,
            pose_feat,
            cat_feats_dict(feats),
            batch["denorm_upper_img"],
            batch["denorm_lower_img"],
            batch["denorm_upper_mask"],
            batch["denorm_lower_mask"],
        )
        return img, finetune_img, pred_parsing, ws, w_raw, stylecode

    def run_D(self, d_params, img, c, ada_p, rng):
        """Reference run_D (`loss_wo_flow_fullbody.py:96-102`): ADA pipe + D."""
        img = self._augment(img, ada_p, rng)
        return self.disc.apply(d_params, img, c)

    def _augment(self, img, ada_p, rng):
        if self.augment_fn is None:
            return img
        # NOTE: measured on v5e — running the pipe in bf16 is SLOWER (the
        # scatter-add in the warp backward appears to be emulated for 16-bit
        # types); keep the images' own dtype.
        return self.augment_fn(img, ada_p, rng)

    def _stack_perm(self, n: int, k: int):
        """Static sample permutation making mbstd groups sub-batch-pure.

        MinibatchStdLayer groups STRIDED over the batch (sample q's stat
        set is {q mod N/G + g*N/G}, matching reference `networks.py:1000`),
        so a plain concat of k sub-batches puts gen/ft/real samples in the
        SAME stat group — real/fake leakage the sequential mode never has
        (and a reshape crash when n is not a group multiple).  Placing
        sub-batch j's sample i at position

            pos(j, i) = j*(n/G) + i mod (n/G) + (i div (n/G)) * k*(n/G)

        makes every strided stat set {m + g*(kn/G)} land inside one
        sub-batch AND reproduce the sequential per-call grouping {i, i+n/G}
        exactly.  Returns the [k*n] position array, or None when the exact
        embedding does not exist (G=None full-batch stats, or n % G != 0 —
        e.g. per-device batch 1 under 8-way DP) — callers then run
        sequentially."""
        g = self.config.model.mbstd_group_size
        if g is None or g <= 0 or n % g:
            return None
        npg = n // g
        j = np.arange(k)[:, None]
        i = np.arange(n)[None, :]
        return (j * npg + i % npg + (i // npg) * (k * npg)).reshape(-1)

    def _run_D_multi(self, d_params, imgs, c, ada_p, rng):
        """Run the ADA pipe + D over several image batches.

        Two execution modes (ada.stack_calls):
        * sequential (default fallback): one augment+D invocation per
          batch — the exact warp's supersampled intermediates scale with
          the stacked batch and were measured to OOM HBM next to the VGG
          backward;
        * stacked: ONE batched augment+D call.  Distribution-identical —
          augment draws are per-sample, and the `_stack_perm` sample
          permutation keeps every mbstd stat group inside one sub-batch
          (identical grouping to the sequential calls) — while amortizing
          the pipe's fixed passes; the fast_geom two-pass warp's
          intermediates are small enough to afford it.  Falls back to
          sequential when no exact permutation exists (see _stack_perm).
        """
        n, k = imgs[0].shape[0], len(imgs)
        pos = (
            self._stack_perm(n, k)
            if (self.config.ada.stack_calls and k > 1
                and self.augment_fn is not None)
            else None
        )
        if pos is not None:
            inv = np.argsort(pos)  # position p holds stacked sample inv[p]
            stacked = jnp.concatenate(imgs, axis=0)[inv]
            cc = jnp.concatenate([c] * k, axis=0)[inv]
            logits = self.disc.apply(
                d_params, self._augment(stacked, ada_p, rng), cc
            )[pos]
            return [logits[i * n : (i + 1) * n] for i in range(k)]
        rngs = jax.random.split(rng, k)
        return [
            self.disc.apply(d_params, self._augment(img, ada_p, r), c)
            for img, r in zip(imgs, rngs)
        ]

    # ------------------------------------------------------------- losses

    def g_loss_fn(self, g_params, d_params, batch, ada_p, rng):
        cfg = self.config.loss
        g_rng, d_rng1, d_rng2 = jax.random.split(rng, 3)
        img, ft_img, pred_parsing, _, w_raw, gen_c = self.run_G(g_params, batch, g_rng)
        real_img = batch["real_img"]

        gen_logits, ft_logits = self._run_D_multi(
            d_params, [img, ft_img], gen_c, ada_p, d_rng1
        )

        loss_gan = losses.g_nonsaturating(gen_logits)
        loss_gan_ft = losses.g_nonsaturating(ft_logits)

        loss_l1 = losses.l1_loss(img, real_img) * cfg.l1_weight
        loss_l1_ft = losses.l1_loss(ft_img, real_img) * cfg.l1_weight

        loss_mask = 0.0
        if cfg.mask_weight > 0:
            loss_mask = (
                losses.parsing_cross_entropy(pred_parsing, batch["gt_parsing"]) * cfg.mask_weight
            )

        loss_vgg = loss_vgg_ft = 0.0
        if cfg.vgg_weight > 0 and self.vgg_params is not None:
            loss_vgg = vgg_perceptual_loss(self.vgg_params, img, real_img) * cfg.vgg_weight
            loss_vgg_ft = vgg_perceptual_loss(self.vgg_params, ft_img, real_img) * cfg.vgg_weight

        loss_ctx = 0.0
        if cfg.contextual_weight > 0 and self.vgg_params is not None:
            from .vgg import contextual_vgg_loss

            loss_ctx = (
                contextual_vgg_loss(self.vgg_params, ft_img, real_img)
                * cfg.contextual_weight
            )

        total = (
            (loss_gan + loss_gan_ft) / 2
            + (loss_l1 + loss_l1_ft) / 2
            + (loss_vgg + loss_vgg_ft) / 2
            + loss_mask
            + loss_ctx
        )
        stats = {
            "Loss/G/loss": loss_gan,
            "Loss/G/loss_finetune": loss_gan_ft,
            "Loss/G/L1": loss_l1,
            "Loss/G/L1_finetune": loss_l1_ft,
            "Loss/G/vgg": loss_vgg,
            "Loss/G/vgg_finetune": loss_vgg_ft,
            "Loss/G/mask_loss": loss_mask,
            "Loss/G/contextual": loss_ctx,
            "Loss/scores/fake": jnp.mean(gen_logits),
            "Loss/signs/fake": jnp.mean(jnp.sign(gen_logits)),
        }
        return total, (stats, jnp.mean(w_raw, axis=0))

    def d_loss_fn(self, d_params, g_params, batch, ada_p, rng):
        g_rng, d_rng1, d_rng2, d_rng3 = jax.random.split(rng, 4)
        img, ft_img, _, _, _, gen_c = self.run_G(g_params, batch, g_rng)
        img = jax.lax.stop_gradient(img)
        ft_img = jax.lax.stop_gradient(ft_img)
        gen_c = jax.lax.stop_gradient(gen_c)

        gen_logits, ft_logits, real_logits = self._run_D_multi(
            d_params, [img, ft_img, batch["real_img"]], gen_c, ada_p, d_rng1
        )

        loss_dgen = (losses.d_fake(gen_logits) + losses.d_fake(ft_logits)) / 2
        loss_dreal = losses.d_real(real_logits)
        total = loss_dgen + loss_dreal
        stats = {
            "Loss/D/loss": loss_dgen + loss_dreal,
            "Loss/scores/real": jnp.mean(real_logits),
            "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
        }
        return total, stats

    # ------------------------------------------------------------- steps

    def _grads_with_accum(self, loss_fn, params, batch, rng, *extra):
        """value_and_grad, optionally accumulated over microbatches with
        lax.scan (reference grad-accumulation rounds,
        `training_loop_wo_flow_fullbody.py:494-508`)."""
        A = max(1, self.config.accum_steps)
        if A == 1:
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, *extra, batch, rng
            )
            return grads, aux

        mb = jax.tree_util.tree_map(
            lambda v: v.reshape((A, v.shape[0] // A) + v.shape[1:]), batch
        )
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(carry, xs):
            grads_sum, i = carry
            mb_i = xs
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, *extra, mb_i, jax.random.fold_in(rng, i)
            )
            grads_sum = jax.tree_util.tree_map(jnp.add, grads_sum, grads)
            return (grads_sum, i + 1), aux

        (grads_sum, _), auxs = jax.lax.scan(body, (zero_grads, 0), mb)
        grads = jax.tree_util.tree_map(lambda g: g / A, grads_sum)
        aux = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), auxs)
        return grads, aux

    def train_step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        cfg = self.config
        axis = self.axis_name
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        g_rng, d_rng = jax.random.split(jax.random.fold_in(rng, state.step), 2)

        # ---- Gmain
        g_grads, (g_stats, w_mean) = self._grads_with_accum(
            lambda p, d, ap, b, r: self.g_loss_fn(p, d, b, ap, r),
            state.g_params, batch, g_rng, state.d_params, state.ada_p,
        )
        g_grads = _pmean(g_grads, axis)
        g_grads = _scrub(g_grads, cfg.grad_clip_posinf)
        g_updates, g_opt_state = self.g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---- Dmain (fakes come from the *updated* G, matching the reference's
        # sequential phase execution)
        d_grads, d_stats = self._grads_with_accum(
            lambda p, g, ap, b, r: self.d_loss_fn(p, g, b, ap, r),
            state.d_params, batch, d_rng, g_params, state.ada_p,
        )
        d_grads = _pmean(d_grads, axis)
        d_grads = _scrub(d_grads, cfg.grad_clip_posinf)
        d_updates, d_opt_state = self.d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G_ema (training_loop...py:521-529)
        cur_nimg = (state.step + 1).astype(jnp.float32) * cfg.batch_size
        ema_nimg = cfg.ema_kimg * 1000.0
        if cfg.ema_rampup is not None:
            ema_nimg = jnp.minimum(ema_nimg, cur_nimg * cfg.ema_rampup)
        ema_beta = 0.5 ** (cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))
        g_ema_params = jax.tree_util.tree_map(
            lambda p, e: p + ema_beta * (e - p), g_params, state.g_ema_params
        )

        # ---- w_avg EMA (networks.py:242-244)
        w_mean = _pmean(w_mean, axis)
        w_avg = w_mean + cfg.w_avg_beta * (state.w_avg - w_mean)

        # ---- ADA controller (training_loop...py:536-539)
        sign_real = _pmean(d_stats["Loss/signs/real"], axis)
        signs_sum = state.ada_signs_sum + sign_real
        signs_count = state.ada_signs_count + 1.0
        ada_p = state.ada_p
        if cfg.ada.enabled:
            do_adjust = (state.step + 1) % cfg.ada.interval == 0
            mean_sign = signs_sum / jnp.maximum(signs_count, 1.0)
            adjust = (
                jnp.sign(mean_sign - cfg.ada.target)
                * (cfg.batch_size * cfg.ada.interval)
                / (cfg.ada.kimg * 1000.0)
            )
            ada_p = jnp.where(do_adjust, jnp.maximum(ada_p + adjust, 0.0), ada_p)
            signs_sum = jnp.where(do_adjust, 0.0, signs_sum)
            signs_count = jnp.where(do_adjust, 0.0, signs_count)

        stats = dict(g_stats)
        stats.update(d_stats)
        stats["Progress/augment_p"] = ada_p
        stats = _pmean(stats, axis)

        new_state = dataclasses.replace(
            state,
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_ema_params=g_ema_params,
            w_avg=w_avg,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            ada_p=ada_p,
            ada_signs_sum=signs_sum,
            ada_signs_count=signs_count,
        )
        return new_state, stats

    def d_r1_step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        """Dreg phase: R1 with lazy-regularization gain (= d_reg_interval)."""
        cfg = self.config
        axis = self.axis_name
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        g_rng, d_rng = jax.random.split(jax.random.fold_in(rng, state.step), 2)
        gain = float(cfg.d_reg_interval or 1)

        # Microbatched like the main phases (_grads_with_accum): the R1
        # double-backprop's activation footprint at global batch 96 exceeds
        # one chip's HBM (measured 16.18G/15.75G), so the reg phase must
        # scan the same accum microbatches as Gmain/Dmain.
        def r1_loss(d_params, b, r):
            # conditioning from the style encoder, detached (Dreg doesn't
            # touch G)
            stylecode, _ = self.gen.apply(
                state.g_params,
                b["style_input"],
                b["retain"],
                method=self.gen.encode_style,
                rngs={"noise": g_rng},
            )
            gen_c = jax.lax.stop_gradient(stylecode)

            def d_out(x):
                return jnp.sum(self.run_D(d_params, x, gen_c, state.ada_p, r))

            grads = jax.grad(d_out)(b["real_img"])
            penalty = jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
            return penalty * (cfg.loss.r1_gamma / 2.0) * gain, penalty

        d_grads, penalty = self._grads_with_accum(
            r1_loss, state.d_params, batch, d_rng
        )
        loss = penalty * (cfg.loss.r1_gamma / 2.0) * gain
        d_grads = _pmean(d_grads, axis)
        d_grads = _scrub(d_grads, cfg.grad_clip_posinf)
        d_updates, d_opt_state = self.d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        stats = _pmean(
            {"Loss/r1_penalty": penalty, "Loss/D/reg": loss}, axis
        )
        new_state = dataclasses.replace(
            state, d_params=d_params, d_opt_state=d_opt_state
        )
        return new_state, stats

    def g_pl_step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        """Greg phase: path-length regularization (reference
        `loss_wo_flow_fullbody.py:184-205`; pl_weight=0 in the config of
        record).  Uses a pl_batch_shrink'd batch and the running pl_mean."""
        cfg = self.config
        axis = self.axis_name
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        pl_rng, noise_rng = jax.random.split(jax.random.fold_in(rng, state.step), 2)

        shrink = max(1, cfg.loss.pl_batch_shrink)
        small = {
            k: v[: max(1, v.shape[0] // shrink)] for k, v in batch.items()
        }
        gain = float(cfg.g_reg_interval or 1)

        def pl_loss(g_params):
            def apply(method, *args, **kw):
                return self.gen.apply(
                    g_params, *args, method=method, rngs={"noise": noise_rng}, **kw
                )

            stylecode, feats = apply(
                self.gen.encode_style, small["style_input"], small["retain"]
            )
            pose_feat = apply(self.gen.encode_pose, small["pose"])
            ws, _ = apply(self.gen.map_ws, None, stylecode)

            def synth(w):
                img, _, _ = apply(
                    self.gen.synthesize,
                    w,
                    pose_feat,
                    cat_feats_dict(feats),
                    small["denorm_upper_img"],
                    small["denorm_lower_img"],
                    small["denorm_upper_mask"],
                    small["denorm_lower_mask"],
                )
                return img

            img_shape = (
                small["real_img"].shape[0],
                self.config.model.img_resolution,
                self.config.model.img_resolution,
                self.config.model.img_channels,
            )
            pl_noise = jax.random.normal(pl_rng, img_shape) / jnp.sqrt(
                jnp.asarray(img_shape[1] * img_shape[2], jnp.float32)
            )
            pl_grads = jax.grad(lambda w: jnp.sum(synth(w) * pl_noise))(ws)
            pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
            new_mean = state.pl_mean + cfg.loss.pl_decay * (
                jnp.mean(pl_lengths) - state.pl_mean
            )
            penalty = jnp.mean(jnp.square(pl_lengths - new_mean))
            return penalty * cfg.loss.pl_weight * gain, (penalty, new_mean)

        (loss, (penalty, new_mean)), g_grads = jax.value_and_grad(pl_loss, has_aux=True)(
            state.g_params
        )
        g_grads = _pmean(g_grads, axis)
        g_grads = _scrub(g_grads, cfg.grad_clip_posinf)
        g_updates, g_opt_state = self.g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        stats = _pmean({"Loss/pl_penalty": penalty, "Loss/G/reg": loss}, axis)
        new_state = dataclasses.replace(
            state,
            g_params=g_params,
            g_opt_state=g_opt_state,
            pl_mean=_pmean(new_mean, axis),
        )
        return new_state, stats
