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
    "make_ref_nfr_step",
]


def decomp_lr(step, cfg: dc.DecompConfig):
    """Continuous exponential decay (keras ExponentialDecay default)."""
    return cfg.lr * cfg.lr_decay_rate ** (step / cfg.lr_decay_steps)


def _amsgrad():
    return optax.scale_by_amsgrad()


def make_nfr_unit_step(cfg: dc.DecompConfig, lxyz, lareas):
    tx = _amsgrad()

    def loss_fn(params, batch):
        _, aux = nfr_unit_forward(
            params, batch, cfg, lxyz, lareas, mode="train")
        return nfr_unit_loss(aux, cfg, mode="train")

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, batch, step):
        (loss, ld), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        lr = decomp_lr(step, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, ld

    return tx, step_fn


def make_vq_nfr_step(cfg: dc.DecompConfig, lxyz, lareas):
    """Step threading the VQ EMA state and applying the codebook EMA update
    AFTER the gradient step (mirroring .assign at vq_nfr.py:580-583: the
    codebook is 'trainable' in TF but its gradient path only matters via
    get_codebook in the sim loss; the EMA assignment then overwrites the
    raw variable — we therefore apply grads first, then assign)."""
    tx = _amsgrad()

    def loss_fn(params, ema_state, batch, thres, rng):
        _, aux, new_ema = vq_nfr_forward(
            params, ema_state, batch, cfg, lxyz, lareas, mode="train",
            thres=thres, rng=rng)
        loss, ld = vq_nfr_loss(params, aux, cfg, mode="train")
        return loss, (ld, new_ema, aux["codebook_update"])

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(params, ema_state, opt_state, batch, thres, rng, step):
        (loss, (ld, new_ema, cb_update)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, ema_state, batch, thres, rng)
        lr = decomp_lr(step, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        # EMA overwrite of the raw codebook (outside gradients)
        params = dict(params)
        params["codebook"] = cb_update
        return params, new_ema, opt_state, ld

    return tx, step_fn


def make_ref_nfr_step(cfg: dc.DecompConfig, lxyz, lareas):
    """Optimizes only params['train'] (frozen subtree untouched)."""
    tx = _amsgrad()

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
        updates, opt_state = tx.update(grads, opt_state, params["train"])
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        train_params = optax.apply_updates(params["train"], updates)
        return ({"frozen": params["frozen"], "train": train_params},
                opt_state, ld)

    return tx, step_fn
