"""NeuS geometry training.

Parity target: geo/NeuS-ours2/nerf_runner.py:99-195 (and dtu_runner.py):
  * loss = L1(color, masked)/mask_sum + igr_weight * Eikonal
         + mask_weight * BCE(weight_sum, mask)
  * LR: linear warm-up then cosine decay to alpha fraction
    (nerf_runner.py:186-195); dtu uses lr_end_iter for the cosine tail
    (dtu_runner.py:192-194)
  * cos_anneal_ratio = min(1, step / anneal_end) (:184)

TPU-native: one jitted train step over a ray-sharded batch; Adam via optax
with the LR injected per step (the reference mutates param_groups).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..models.neus import NeuSConfig, neus_render

__all__ = ["NeuSTrainConfig", "neus_lr_factor", "cos_anneal_ratio",
           "make_neus_multi_step",
           "init_neus_opt_state", "make_neus_train_step"]


@dataclass(frozen=True)
class NeuSTrainConfig:
    learning_rate: float = 5e-4
    learning_rate_alpha: float = 0.05
    end_iter: int = 300_000
    lr_end_iter: int = -1  # dtu: 300k while end_iter=100k
    warm_up_end: int = 5_000
    anneal_end: int = 0
    batch_size: int = 2560
    igr_weight: float = 0.1
    mask_weight: float = 0.1
    use_white_bkgd: bool = True
    save_freq: int = 10_000
    val_freq: int = 2_500
    # in-loop marching-cubes mesh dump every N iters
    # (nerf_runner.py:168-170 val_mesh_freq=10000); 0 = off
    mesh_freq: int = 10_000
    use_pallas: bool = False  # fused Pallas SDF for the up-sample chain
    # Occupancy-guided sampling (ops/occupancy.py): 0 = off (reference
    # semantics). When on, the initial n_samples draw from a coarse SDF
    # occupancy grid rebuilt every occ_update_freq steps, enabling small
    # sample configs (e.g. 32+32 r2) at 64+64 r4 quality.
    occ_res: int = 0
    occ_update_freq: int = 250
    occ_margin: float = 3.0
    occ_floor: float = 0.05
    # >1: run K optimizer steps per device dispatch via lax.scan over a
    # stacked [K, R, ...] batch — amortizes per-call dispatch latency
    # (dominant under high-latency links; measured ~95 ms wall vs
    # 14.3 ms compute per step through the axon tunnel). Checkpoint /
    # validation cadence quantizes to K.
    steps_per_dispatch: int = 1
    # Per-ray-adaptive work (requires occ_res > 0): rays whose
    # occupancy span is provably empty (ray_occupied_span certificate —
    # the grid's conservative margin says no surface anywhere along the
    # ray) render with a cheap empty_n_samples uniform tier instead of
    # the full n_samples+n_importance chain. Static shapes: a stable
    # argsort packs active rays first and a fixed active capacity
    # (chosen by the runner from a probed active fraction, quantized to
    # batch/8) splits the two tiers; active rays beyond the capacity
    # fall into the cheap tier (the occ-PDF still concentrates their
    # few samples — graceful, and the overflow_frac metric exposes it).
    # Every ray keeps every loss term with real gradients; only the
    # sample budget is adaptive. The reference spends the full budget
    # on every ray (renderer.py:311-355).
    adaptive_empty: bool = False
    empty_n_samples: int = 8
    # Two-phase sampler schedule: after (1 - tail_frac) * end_iter
    # steps, training switches to tail_sampler (a "64+64r4"-style spec;
    # occupancy guidance turns OFF for the tail unless tail_occ below,
    # and adaptive tiers always turn off).
    # Rationale: the occ-guided cheap sampler converges fastest per
    # step early, but at production budgets the reference's fine
    # uniform quadrature refines thin geometry better late — and
    # production always RENDERS with the parity sampler, so a parity
    # tail trains the final iters under the exact quadrature being
    # scored. 0.0 = single-phase (reference semantics,
    # renderer.py:311-355 spends the same budget on every ray forever).
    tail_frac: float = 0.0
    tail_sampler: str = ""
    # Keep occupancy guidance ON during the tail phase (r5): lets the
    # tail run a DENSE occupancy-placed sampler (e.g. 64+32r2) instead
    # of the reference-exact uniform 64+64r4 — the quadrature is still
    # near-full-count but the initial samples concentrate inside the
    # occupied band, so the tail step costs ~2x less than parity at
    # (measured) equal production-budget quality. False = r4 semantics
    # (tail is reference-exact, occ off).
    tail_occ: bool = False
    # Auto carve-tier selection (r5, VERDICT r4 #3): at the first occ
    # grid rebuild after warm_up_end, measure the scene's deep-interior
    # fraction (ops/occupancy.interior_fraction — a pure function of
    # the partially-trained SDF, no RNG) and, when it clears
    # carve_auto_thresh, switch the carve phase to carve_alt_sampler
    # (the roomier importance budget that bought +1.2 dB on the fat
    # sphere production cell, BASELINE.md r4). Scenes below the
    # threshold train BIT-IDENTICALLY to carve_auto=False. The decision
    # is re-derived on resume at the next rebuild past warm_up_end.
    carve_auto: bool = False
    carve_alt_sampler: str = "24+16r2"
    carve_auto_thresh: float = 0.30
    # probe grid resolution; 0 = occ_res. The statistic needs cells
    # fine enough that the band margin (3*cell_diag/2) sits well below
    # the object scale — the production 128^3 grid qualifies, coarse
    # test grids do not.
    carve_probe_res: int = 0
    # skip (zero-update) any step whose gradients are non-finite instead
    # of letting one poisoned batch corrupt every parameter through adam
    # (production hardening; the divergence guard in the loop remains
    # the backstop)
    skip_nonfinite_updates: bool = True


def neus_lr_factor(step, tcfg: NeuSTrainConfig):
    """Warm-up + cosine factor (nerf_runner.py:186-195). jnp-traceable."""
    end = tcfg.lr_end_iter if tcfg.lr_end_iter > 0 else tcfg.end_iter
    alpha = tcfg.learning_rate_alpha
    progress = (step - tcfg.warm_up_end) / (end - tcfg.warm_up_end)
    cos_factor = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
    warm = step / tcfg.warm_up_end
    return jnp.where(step < tcfg.warm_up_end, warm, cos_factor)


def cos_anneal_ratio(step, tcfg: NeuSTrainConfig):
    if tcfg.anneal_end == 0:
        return jnp.asarray(1.0)
    return jnp.minimum(1.0, step / tcfg.anneal_end)


def init_neus_opt_state(params):
    return optax.scale_by_adam().init(params)


def make_neus_train_step(cfg: NeuSConfig, tcfg: NeuSTrainConfig, radius,
                         with_occ=False, active_cap=None):
    """Returns jittable fn(params, opt_state, batch, key, step) ->
    (params, opt_state, metrics) — plus a trailing occ_grid argument
    when with_occ (the loop rebuilds the grid every occ_update_freq
    steps via ops.occupancy.build_occ_grid).

    batch: rays_o/rays_d [R,3], rgb [R,3], mask [R,1], near/far [R,1],
    valid [R,1] (1 for real rays, 0 for shard padding).

    active_cap (requires with_occ): the two-tier adaptive split — the
    first active_cap rays after the active-first stable sort render
    with the full sampler, the rest with the cheap
    tcfg.empty_n_samples tier (see NeuSTrainConfig.adaptive_empty).
    """
    adam = optax.scale_by_adam()
    if active_cap is not None and not with_occ:
        raise ValueError("active_cap requires with_occ (the empty-ray "
                         "certificate reads the occupancy grid)")

    def _two_tier_render(params, batch, key, anneal, occ_grid):
        """Active-first sort, full render on [:cap], cheap on [cap:].
        Returns (out-dict, permuted batch, extra metrics); every loss
        term below is permutation-invariant, so the caller just uses
        the permuted batch."""
        from dataclasses import replace as _replace

        from ..ops.occupancy import ray_occupied_span
        background_rgb = jnp.ones((1, 3)) if tcfg.use_white_bkgd else None
        n = batch["rays_o"].shape[0]
        _, _, any_occ = ray_occupied_span(
            batch["rays_o"], batch["rays_d"], batch["near"],
            batch["far"], occ_grid, radius)
        active = any_occ[:, 0] > 0
        order = jnp.argsort(jnp.where(active, 0, 1))  # stable in jax
        bp = {k: v[order] for k, v in batch.items()}
        ka = kb = None
        if key is not None:
            ka, kb = jax.random.split(key)
        out_a = neus_render(
            params, cfg, bp["rays_o"][:active_cap],
            bp["rays_d"][:active_cap], bp["near"][:active_cap],
            bp["far"][:active_cap], radius, key=ka,
            background_rgb=background_rgb, cos_anneal_ratio=anneal,
            use_pallas=tcfg.use_pallas, occ_grid=occ_grid,
            occ_floor=tcfg.occ_floor)
        cheap_cfg = _replace(cfg, n_samples=tcfg.empty_n_samples,
                             n_importance=0, up_sample_steps=0)
        out_b = neus_render(
            params, cheap_cfg, bp["rays_o"][active_cap:],
            bp["rays_d"][active_cap:], bp["near"][active_cap:],
            bp["far"][active_cap:], radius, key=kb,
            background_rgb=background_rgb, cos_anneal_ratio=anneal,
            use_pallas=tcfg.use_pallas, occ_grid=occ_grid,
            occ_floor=tcfg.occ_floor)
        n_active = jnp.sum(active.astype(jnp.float32))
        out = {
            "color_fine": jnp.concatenate(
                [out_a["color_fine"], out_b["color_fine"]], axis=0),
            "weight_sum": jnp.concatenate(
                [out_a["weight_sum"], out_b["weight_sum"]], axis=0),
            # the reference's Eikonal is one mean over every sampled
            # point of the batch (renderer.py:278-282) — recombine the
            # tiers' sums/counts rather than averaging their means
            "gradient_error": (
                (out_a["grad_err_sum"] + out_b["grad_err_sum"])
                / (out_a["grad_err_cnt"] + out_b["grad_err_cnt"] + 1e-5)),
            "s_val": out_a["s_val"],
        }
        extras = {
            "active_frac": n_active / n,
            "overflow_frac": jax.nn.relu(n_active - active_cap) / n,
        }
        return out, bp, extras

    def loss_fn(params, batch, key, anneal, occ_grid=None):
        extras = {}
        if active_cap is not None:
            out, batch, extras = _two_tier_render(
                params, batch, key, anneal, occ_grid)
        else:
            background_rgb = jnp.ones((1, 3)) \
                if tcfg.use_white_bkgd else None
            out = neus_render(
                params, cfg, batch["rays_o"], batch["rays_d"],
                batch["near"], batch["far"], radius, key=key,
                background_rgb=background_rgb,
                cos_anneal_ratio=anneal, use_pallas=tcfg.use_pallas,
                occ_grid=occ_grid, occ_floor=tcfg.occ_floor)
        valid = batch["valid"]
        if tcfg.mask_weight > 0:
            mask = (batch["mask"] > 0.5).astype(jnp.float32) * valid
        else:
            mask = jnp.ones_like(batch["mask"]) * valid
        mask_sum = jnp.sum(mask) + 1e-5

        color_err = (out["color_fine"] - batch["rgb"]) * mask
        color_loss = jnp.sum(jnp.abs(color_err)) / mask_sum
        mse = jnp.sum(color_err**2) / (mask_sum * 3.0)
        psnr = 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))

        eikonal_loss = out["gradient_error"]

        w = jnp.clip(out["weight_sum"], 1e-3, 1.0 - 1e-3)
        bce = -(batch["mask"] * jnp.log(w)
                + (1.0 - batch["mask"]) * jnp.log(1.0 - w))
        mask_loss = jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

        loss = (color_loss + eikonal_loss * tcfg.igr_weight
                + mask_loss * tcfg.mask_weight)
        metrics = {
            "loss": loss, "color_loss": color_loss,
            "eikonal_loss": eikonal_loss, "mask_loss": mask_loss,
            "psnr": psnr, "s_val": jnp.mean(out["s_val"]), **extras,
        }
        return loss, metrics

    def train_step(params, opt_state, batch, key, step, occ_grid=None):
        anneal = cos_anneal_ratio(step, tcfg)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, key, anneal, occ_grid)
        lr = tcfg.learning_rate * neus_lr_factor(step, tcfg)
        updates, new_opt = adam.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(params, updates)
        if tcfg.skip_nonfinite_updates:
            leaves = jax.tree_util.tree_leaves(grads)
            # loss AND grads: a NaN loss can yield finite-but-garbage
            # grads (|x| backward lowers to a select, finite at NaN)
            ok = jnp.isfinite(metrics["loss"]) & jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(l)) for l in leaves]))
            sel = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(ok, x, y), a, b)
            new_params, new_opt = sel(new_params, params), \
                sel(new_opt, opt_state)
            metrics["nonfinite_grads"] = 1.0 - ok.astype(jnp.float32)
        params, opt_state = new_params, new_opt
        metrics["lr"] = lr
        return params, opt_state, metrics

    if with_occ:
        def train_step_occ(params, opt_state, batch, key, step, occ_grid):
            return train_step(params, opt_state, batch, key, step,
                              occ_grid)
        return train_step_occ
    return train_step


def make_neus_multi_step(cfg: NeuSConfig, tcfg: NeuSTrainConfig, radius,
                         k, with_occ=False, active_cap=None):
    """K chained optimizer steps in ONE dispatch (lax.scan).

    fn(params, opt_state, batches, key, base_step[, occ_grid]) ->
    (params, opt_state, last_metrics); `batches` is the single-step
    batch dict with a leading [K] axis. Step indices base_step..+k-1
    drive the LR/anneal schedules exactly as k single steps would.
    """
    step_fn = make_neus_train_step(cfg, tcfg, radius, with_occ=with_occ,
                                   active_cap=active_cap)

    def multi_step(params, opt_state, batches, key, base_step,
                   occ_grid=None):
        def body(carry, inp):
            params, opt_state = carry
            i, batch = inp
            sub = jax.random.fold_in(key, i)
            args = (params, opt_state, batch, sub, base_step + i)
            if with_occ:
                args = args + (occ_grid,)
            params, opt_state, metrics = step_fn(*args)
            return (params, opt_state), metrics
        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state),
            (jnp.arange(k, dtype=jnp.float32), batches))
        # Reduce across the K scan steps so every step is observable:
        #  * nonfinite_grads: SUM — the loop's skip counter sees every
        #    guarded step in the block, not just the last
        #  * lr: last (schedule endpoint of the block)
        #  * the rest: mean over FINITE steps — a guarded NaN step does
        #    not poison the block's logged loss, while an all-nonfinite
        #    block still reports NaN so the loop's divergence guard fires
        def _reduce(name, x):
            if name == "nonfinite_grads":
                return jnp.sum(x)
            if name == "lr":
                return x[-1]
            finite = jnp.isfinite(x)
            n = jnp.sum(finite)
            mean = jnp.sum(jnp.where(finite, x, 0.0)) / jnp.maximum(n, 1)
            return jnp.where(n > 0, mean, x[-1])
        out = {name: _reduce(name, x) for name, x in ms.items()}
        return params, opt_state, out

    return multi_step
