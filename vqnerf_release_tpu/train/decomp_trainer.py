"""Decomposition-stage train steps (nfr_unit, vq_nfr, ref_nfr).

Parity targets:
  * Adam(amsgrad=True) + exponential LR decay (trainvali.py:137-155)
  * vq_nfr: EMA codebook assignment outside gradients
    (train_nfr.py:562-576, vq_nfr.py:580-583)
  * ref_nfr: only the 'train' subtree is optimized (keras trainable=False
    on the inherited encoder, ref_nfr.py:141-147)

Each make_* returns a jit-compiled step over a ray-sharded batch; params
replicated; XLA inserts the gradient all-reduce.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models import decomp_common as dc
from ..models.nfr_unit import nfr_unit_forward, nfr_unit_loss
from ..models.ref_nfr import ref_nfr_forward, ref_nfr_loss
from ..models.vq_nfr import vq_nfr_forward, vq_nfr_loss

__all__ = [
    "decomp_lr", "make_nfr_unit_step", "make_vq_nfr_step",
    "make_ref_nfr_step", "make_plain_epoch_scan", "make_vq_epoch_scan",
]


def decomp_lr(step, cfg: dc.DecompConfig):
    """Continuous exponential decay (keras ExponentialDecay default)."""
    return cfg.lr * cfg.lr_decay_rate ** (step / cfg.lr_decay_steps)


def _scale_by_keras_amsgrad(b1=0.9, b2=0.999, eps=1e-7):
    """The EXACT keras ``Adam(amsgrad=True)`` update rule the reference
    trains with (train_nfr.py:128-139; keras adam.py update_step):

        m_t    = b1*m + (1-b1)*g
        v_t    = b2*v + (1-b2)*g^2
        vhat_t = max(vhat_{t-1}, v_t)          # UNCORRECTED moments
        step   = sqrt(1-b2^t)/(1-b1^t) * m_t / (sqrt(vhat_t) + eps)

    ``optax.scale_by_amsgrad`` is NOT this rule: it maxes the bias-
    CORRECTED second moments, which inflates early-step vhat by
    1/(1-b2^t) and measurably diverges (0.03 max param drift after 5
    steps, 0.55 after 50, on a unit-scale quadratic; verified equal to
    keras to fp noise over 200 steps in tests/test_trained_parity.py).
    """
    tm = jax.tree_util.tree_map

    def init(params):
        return {
            "count": jnp.zeros([], jnp.int32),
            "m": tm(jnp.zeros_like, params),
            "v": tm(jnp.zeros_like, params),
            "vhat": tm(jnp.zeros_like, params),
        }

    def update(grads, state, params=None):
        del params
        c = state["count"] + 1
        cf = c.astype(jnp.float32)
        m = tm(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = tm(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
        vhat = tm(jnp.maximum, state["vhat"], v)
        corr = jnp.sqrt(1.0 - b2 ** cf) / (1.0 - b1 ** cf)
        upd = tm(lambda m_, vh: corr * m_ / (jnp.sqrt(vh) + eps), m, vhat)
        return upd, {"count": c, "m": m, "v": v, "vhat": vhat}

    return optax.GradientTransformation(init, update)


def _amsgrad(cfg: dc.DecompConfig = None):
    """Keras-exact amsgrad, optionally preceded by the reference's
    clipnorm/clipvalue (trainvali.py:145-154; both off in the shipped
    INIs)."""
    chain = []
    if cfg is not None:
        assert not (cfg.clipnorm > 0 and cfg.clipvalue > 0), \
            "Both `clipnorm` and `clipvalue` are active -- turn one off"
        if cfg.clipnorm > 0:
            chain.append(optax.clip_by_global_norm(cfg.clipnorm))
        if cfg.clipvalue > 0:
            chain.append(optax.clip(cfg.clipvalue))
    # eps 1e-7 = the keras Adam default the reference trains with
    # (train_nfr.py:139, trainvali.py Adam(**kwargs))
    chain.append(_scale_by_keras_amsgrad(eps=1e-7))
    return optax.chain(*chain) if len(chain) > 1 else chain[0]


def _grads_finite(grads):
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.all(jnp.asarray(
        [jnp.all(jnp.isfinite(l)) for l in leaves]))


def _select(ok, new, old):
    """Per-leaf where(ok, new, old) over matching pytrees."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b), new, old)


def _step_ok(loss, grads):
    """Healthy step: finite loss AND finite gradients. Both checks are
    required — a NaN loss can yield FINITE-but-meaningless grads (e.g.
    the |x| backward lowers to select(x>=0, 1, -1), which is finite at
    NaN), and NaN params yield NaN grads with whatever loss."""
    return jnp.isfinite(loss) & _grads_finite(grads)


def _guarded_update(cfg, tx, loss, grads, params, opt_state, lr, ld):
    """Apply the adam update, skipping it entirely (params AND optimizer
    state untouched) when the step is unhealthy. Records the skip in
    ld['nonfinite_grads']."""
    updates, new_opt = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    new_params = optax.apply_updates(params, updates)
    if not cfg.skip_nonfinite_updates:
        return new_params, new_opt, ld
    ok = _step_ok(loss, grads)
    ld = dict(ld)
    ld["nonfinite_grads"] = 1.0 - ok.astype(jnp.float32)
    return (_select(ok, new_params, params),
            _select(ok, new_opt, opt_state), ld)


def make_nfr_unit_step(cfg: dc.DecompConfig, lxyz, lareas):
    tx = _amsgrad(cfg)

    def loss_fn(params, batch):
        _, aux = nfr_unit_forward(
            params, batch, cfg, lxyz, lareas, mode="train")
        return nfr_unit_loss(aux, cfg, mode="train")

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, batch, step):
        (loss, ld), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        lr = decomp_lr(step, cfg)
        params, opt_state, ld = _guarded_update(
            cfg, tx, loss, grads, params, opt_state, lr, ld)
        return params, opt_state, ld

    return tx, step_fn


def make_vq_nfr_step(cfg: dc.DecompConfig, lxyz, lareas):
    """Step threading the VQ EMA state with the reference's assign-then-
    optimize ordering (train_nfr.py:566-575 + vq_nfr.py:580-583): the EMA
    update is assigned to the codebook DURING the forward, the sim loss is
    evaluated at the UPDATED codebook (see vq_nfr_loss), and the optimizer
    then applies the codebook's sim-loss gradient ON TOP of the EMA
    update. All other losses reach the codebook only through straight-
    through/stop-gradient paths, so its adam delta is purely the sim
    term's."""
    tx = _amsgrad(cfg)

    def loss_fn(params, ema_state, batch, thres, rng):
        # "_roll" (optional, [1, K]): explicit dropout uniforms — the
        # trained-parity harness aligns the TF/JAX rng streams with it;
        # production batches never carry the key
        batch = dict(batch)
        roll = batch.pop("_roll", None)
        _, aux, new_ema = vq_nfr_forward(
            params, ema_state, batch, cfg, lxyz, lareas, mode="train",
            thres=thres, rng=rng, roll=roll)
        loss, ld = vq_nfr_loss(params, aux, cfg, mode="train")
        return loss, (ld, new_ema, aux["codebook_update"])

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(params, ema_state, opt_state, batch, thres, rng, step):
        old_params, old_ema = params, ema_state
        (loss, (ld, new_ema, cb_update)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, ema_state, batch, thres, rng)
        lr = decomp_lr(step, cfg)
        params, opt_state, ld = _guarded_update(
            cfg, tx, loss, grads, params, opt_state, lr, ld)
        # EMA assign + adam delta on top (reference order; delta is zero
        # when the guard skipped the step)
        delta_cb = params["codebook"] - old_params["codebook"]
        params = dict(params)
        params["codebook"] = cb_update + delta_cb
        if cfg.skip_nonfinite_updates:
            # a poisoned batch also contaminates the EMA statistics and
            # the codebook proposal — discard those too on skipped steps
            ok = _step_ok(loss, grads)
            new_ema = _select(ok, new_ema, old_ema)
            params["codebook"] = jnp.where(
                ok, cb_update + delta_cb, old_params["codebook"])
        return params, new_ema, opt_state, ld

    return tx, step_fn


def make_ref_nfr_step(cfg: dc.DecompConfig, lxyz, lareas):
    """Optimizes only params['train'] (frozen subtree untouched)."""
    tx = _amsgrad(cfg)

    def loss_fn(train_params, frozen, batch):
        params = {"frozen": frozen, "train": train_params}
        _, aux = ref_nfr_forward(
            params, batch, cfg, lxyz, lareas, mode="train")
        return ref_nfr_loss(aux, cfg, mode="train")

    @partial(jax.jit, donate_argnums=(1,))
    def step_fn(params, opt_state, batch, step):
        (loss, ld), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params["train"], params["frozen"], batch)
        lr = decomp_lr(step, cfg)
        train_params, opt_state, ld = _guarded_update(
            cfg, tx, loss, grads, params["train"], opt_state, lr, ld)
        return ({"frozen": params["frozen"], "train": train_params},
                opt_state, ld)

    return tx, step_fn


def make_plain_epoch_scan(step_fn, store, donate=(0, 1),
                          sample_fn=None):
    """Scan a whole epoch of nfr_unit/ref_nfr steps in ONE dispatch.

    Batches are gathered inside the scan body from a device-resident
    view store (data/device_store.py, store.gather_in_jit — the flat
    row-gather for replicated stores, the shard_map collective gather
    for row-sharded ones): per epoch the host ships only [K, 2n] ray
    indices, and the K steps run as one XLA program — no per-step
    python dispatch (which costs 3-10 ms each through the axon tunnel
    and dominates the ~2 ms step). step_fn is the SAME jitted step the
    per-step path uses; jit-of-jit inlines it, so the math is identical
    by construction (equality asserted through full training runs in
    tests/test_device_store.py)."""

    gather = store.gather_in_jit

    if sample_fn is not None:
        # on-device sampling (data/device_sampler.py): the per-step ray
        # indices are computed inside the scan from fold_in(base_key,
        # step) — the host ships NOTHING per epoch and a resumed run
        # replays the identical key stream by construction
        @partial(jax.jit, donate_argnums=donate)
        def run_ds(params, opt_state, arrays, vi_vec, steps_vec,
                   base_key):
            def body(carry, x):
                p, o = carry
                vi, stepf = x
                pix = sample_fn(
                    arrays, vi,
                    jax.random.fold_in(base_key,
                                       stepf.astype(jnp.int32)))
                batch = gather(arrays, vi, pix)
                p, o, ld = step_fn(p, o, batch, stepf)
                return (p, o), ld
            (params, opt_state), lds = jax.lax.scan(
                body, (params, opt_state), (vi_vec, steps_vec))
            return params, opt_state, lds

        return run_ds

    @partial(jax.jit, donate_argnums=donate)
    def run(params, opt_state, arrays, vi_vec, pix_mat, steps_vec):
        def body(carry, x):
            p, o = carry
            vi, pix, stepf = x
            batch = gather(arrays, vi, pix)
            p, o, ld = step_fn(p, o, batch, stepf)
            return (p, o), ld
        (params, opt_state), lds = jax.lax.scan(
            body, (params, opt_state), (vi_vec, pix_mat, steps_vec))
        return params, opt_state, lds

    return run


def make_vq_epoch_scan(step_fn, store, sample_fn=None):
    """Epoch scan for the vq_nfr step (threads EMA state and the
    pre-split per-step rng keys; see make_plain_epoch_scan)."""

    gather = store.gather_in_jit

    if sample_fn is not None:
        # keys_vec stays the VQ dropout/roll stream; the SAMPLING key
        # is fold_in(base_key, step), independent of it
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def run_ds(params, ema_state, opt_state, arrays, thres,
                   vi_vec, keys_vec, steps_vec, base_key):
            def body(carry, x):
                p, e, o = carry
                vi, key, stepf = x
                pix = sample_fn(
                    arrays, vi,
                    jax.random.fold_in(base_key,
                                       stepf.astype(jnp.int32)))
                batch = gather(arrays, vi, pix)
                p, e, o, ld = step_fn(p, e, o, batch, thres, key, stepf)
                return (p, e, o), ld
            (params, ema_state, opt_state), lds = jax.lax.scan(
                body, (params, ema_state, opt_state),
                (vi_vec, keys_vec, steps_vec))
            return params, ema_state, opt_state, lds

        return run_ds

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run(params, ema_state, opt_state, arrays, thres, vi_vec,
            pix_mat, keys_vec, steps_vec):
        def body(carry, x):
            p, e, o = carry
            vi, pix, key, stepf = x
            batch = gather(arrays, vi, pix)
            p, e, o, ld = step_fn(p, e, o, batch, thres, key, stepf)
            return (p, e, o), ld
        (params, ema_state, opt_state), lds = jax.lax.scan(
            body, (params, ema_state, opt_state),
            (vi_vec, pix_mat, keys_vec, steps_vec))
        return params, ema_state, opt_state, lds

    return run
