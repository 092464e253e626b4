"""Uncertainty-aware Gaussian mapping — the WildGS-SLAM optimization loop.

WildGS-SLAM (arXiv 2504.03886; reference recipe ``later/WildGS-SLAM/
README.md``) trains a shallow per-sequence uncertainty predictor on frozen
vision features and uses its per-pixel ``beta`` to down-weight dynamic
regions in BOTH the rendering loss and tracking. Here:

  * :class:`UncertaintyNet` — a small conv head over the RGB frame (the
    per-sequence online-trained module; using raw RGB instead of frozen
    DINO features keeps the mapper self-contained — the framework's ViT
    encoders can be substituted via the ``features`` argument).
  * :func:`mapping_loss` — heteroscedastic L1 photometric + depth-anchor
    loss: ``|I - I_hat| / beta^2 + lambda log beta`` (the aleatoric form),
    masked by rendered coverage.
  * :func:`make_mapping_step` — one jitted Adam step over (gaussians,
    uncertainty net) jointly.

One step is one XLA program: render + loss + backward + optimizer update.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from monocular_depth_estimation_trt_tpu.slam.gaussians import (
    GaussianMap,
    RenderOut,
    render,
)


class UncertaintyNet(nn.Module):
    """Per-pixel log-uncertainty head (online-trained, per sequence)."""

    width: int = 32

    @nn.compact
    def __call__(self, rgb: jax.Array, features: Optional[jax.Array] = None):
        x = rgb[None] if rgb.ndim == 3 else rgb  # (1, H, W, 3)
        if features is not None:
            feat = features[None] if features.ndim == 3 else features
            x = jnp.concatenate([x, feat], axis=-1)
        x = nn.Conv(self.width, (3, 3))(x)
        x = nn.relu(x)
        x = nn.Conv(self.width, (3, 3))(x)
        x = nn.relu(x)
        log_beta = nn.Conv(1, (1, 1))(x)[..., 0]  # (1, H, W)
        # beta in [0.3, ~20]: bounded below so the loss cannot explode
        return 0.3 + jax.nn.softplus(log_beta)[0]


class MappingConfig(NamedTuple):
    lr: float = 5e-3
    lr_uncertainty: float = 1e-3
    depth_weight: float = 0.5
    beta_reg: float = 0.5
    tile: int = 16
    k_per_tile: int = 32


def mapping_loss(
    gmap: GaussianMap,
    unc_params: Any,
    unc_net: UncertaintyNet,
    frame_rgb: jax.Array,
    depth_anchor: jax.Array,
    c2w: jax.Array,
    focal: jax.Array | float,
    cfg: MappingConfig,
) -> Tuple[jax.Array, RenderOut]:
    hw = frame_rgb.shape[:2]
    out = render(
        gmap, c2w, focal, hw, tile=cfg.tile, k_per_tile=cfg.k_per_tile
    )
    beta = unc_net.apply({"params": unc_params}, frame_rgb)  # (H, W)
    cover = jnp.clip(out.alpha, 0.0, 1.0)
    ib2 = 1.0 / (beta * beta)
    l_rgb = jnp.mean(
        cover * jnp.sum(jnp.abs(out.color - frame_rgb), -1) * ib2
    )
    l_depth = jnp.mean(
        cover * jnp.abs(out.depth - depth_anchor) * ib2
    )
    l_beta = jnp.mean(jnp.log(beta))
    loss = l_rgb + cfg.depth_weight * l_depth + cfg.beta_reg * l_beta
    return loss, out


def make_mapping_step(unc_net: UncertaintyNet, cfg: MappingConfig):
    """Returns (init_opt, step). ``step`` is jit-compiled:
    ``step(gmap, unc_params, opt_state, frame_rgb, depth_anchor, c2w, focal)
    -> (gmap, unc_params, opt_state, loss, RenderOut)``."""
    tx = optax.multi_transform(
        {
            "gauss": optax.adam(cfg.lr),
            "unc": optax.adam(cfg.lr_uncertainty),
        },
        ("gauss", "unc"),
    )

    def init_opt(gmap: GaussianMap, unc_params: Any):
        return tx.init((gmap, unc_params))

    # NOTE: no buffer donation — benchmark/replay paths re-call the step
    # with the same arrays, which donation would invalidate. The state is
    # tiny (MBs) so the copy cost is negligible.
    @jax.jit
    def step(gmap, unc_params, opt_state, frame_rgb, depth_anchor, c2w, focal):
        def lossfn(pair):
            g, u = pair
            loss, out = mapping_loss(
                g, u, unc_net, frame_rgb, depth_anchor, c2w, focal, cfg
            )
            return loss, out

        (loss, out), grads = jax.value_and_grad(lossfn, has_aux=True)(
            (gmap, unc_params)
        )
        # frozen slots: zero gradients where the slot is unoccupied
        gmask = gmap.valid
        ggrad = grads[0]._replace(
            means=ggrad_mask(grads[0].means, gmask),
            log_scales=ggrad_mask(grads[0].log_scales, gmask),
            quats=ggrad_mask(grads[0].quats, gmask),
            colors_logit=ggrad_mask(grads[0].colors_logit, gmask),
            opacity_logit=grads[0].opacity_logit * gmask,
            valid=jnp.zeros_like(grads[0].valid),
        )
        updates, opt_state = tx.update((ggrad, grads[1]), opt_state)
        gmap, unc_params = optax.apply_updates((gmap, unc_params), updates)
        return gmap, unc_params, opt_state, loss, out

    return init_opt, step


def ggrad_mask(g: jax.Array, valid: jax.Array) -> jax.Array:
    return g * valid.reshape((-1,) + (1,) * (g.ndim - 1))
