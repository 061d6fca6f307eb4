"""WGAN-GP losses for the two-critic DEP-GAN.

Re-derives, in JAX, the graphs the reference builds with K.gradients +
K.function (`...twoCritics_training_4fold.py:523-598`):

- Critic Y2 judges fake follow-up images ``y2_fake = y1 + G(x, z)``
  (reference :533-534); critic DEM judges the generated evolution map
  directly against the real DEM ``y2 - y1`` (reference :528-530,:554-560).
- Gradient penalty: per-example gradient of the critic score at
  ``eps * real + (1 - eps) * fake``, L2 norm over (H, W, C), weight
  ``delta = 10`` (reference :536-547). The per-example gradient is
  grad-of-sum — critic scores are independent across the batch.
- Generator loss (reference :573-592):
  ``-D_y2(fake) - D_dem(dem) + 100*L1(dem, real_dem)
  + 100*(sum(wmh_real)/1000 - sum(wmh_fake)/1000)^2 + 1*DiceLoss``.
  The volume & Dice terms threshold with a hard >= comparison whose
  gradient is exactly zero (reference :581-589) — reproduced faithfully
  under ``threshold_mode='hard'``; ``'soft'`` substitutes a steep sigmoid
  so the terms actually train, kept behind the flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GanTrainConfig


def wmh_mask(x, threshold: float, mode: str, tau: float):
    """Hard (zero-gradient, reference-faithful) or soft WMH thresholding."""
    if mode == "hard":
        return (x >= threshold).astype(jnp.float32)
    return jax.nn.sigmoid((x - threshold) / tau)


def dice_coef(y_true, y_pred, smooth: float = 1e-7):
    """Soft Dice over the flattened batch (reference :153-157)."""
    inter = jnp.sum(y_true * y_pred)
    return (2.0 * inter + smooth) / (jnp.sum(y_true) + jnp.sum(y_pred) + smooth)


def gradient_penalty(critic_fn, real, fake, eps, input_grad_fn=None):
    """mean((||d critic(mixed) / d mixed||_2 - 1)^2), eps (B, 1, 1, 1).

    ``input_grad_fn`` (optional) supplies d sum(critic(m)) / dm directly —
    the fused Pallas critic provides a hand-chained gradient
    (ops/fast_critic.score_and_input_grad) because its custom-VJP kernels
    cannot be linearized a second time by jax.grad-of-jax.grad."""
    mixed = eps * real + (1.0 - eps) * fake

    if input_grad_fn is not None:
        grad = input_grad_fn(mixed)
    else:
        grad = jax.grad(lambda m: jnp.sum(critic_fn(m)))(mixed)
    norm = jnp.sqrt(jnp.sum(jnp.square(grad), axis=(1, 2, 3)))
    return jnp.mean(jnp.square(norm - 1.0))


def critic_step_loss(critic_fn, real, fake, eps, gp_weight: float,
                     input_grad_fn=None):
    """Critic loss = E[D(fake)] - E[D(real)] + delta * GP (reference :547).

    Returns (loss, (loss_real, loss_fake)) — the two scalars the reference's
    netD_*_train functions fetch for logging (reference :550-552).
    """
    loss_real = jnp.mean(critic_fn(real))
    loss_fake = jnp.mean(critic_fn(fake))
    gp = gradient_penalty(critic_fn, real, fake, eps, input_grad_fn)
    return loss_fake - loss_real + gp_weight * gp, (loss_real, loss_fake)


def generator_loss(
    cfg: GanTrainConfig,
    threshold: float,
    dem_fake,  # G(x, z) — the generated DEM (B, H, W, 1)
    y1,  # baseline map, channel 0 of the generator input (B, H, W, 1)
    y2_real,  # real follow-up map (B, H, W, 1)
    critic_y2_fn,
    critic_dem_fn,
):
    """The five-term generator objective (reference :573-592).

    Returns (loss, aux) with aux matching the reference's logged tuple
    (errG, errG_CY2, errG_DEM, errG_MSE, errG_VOL, errG_WMH).
    """
    y2_fake = y1 + dem_fake
    dem_real = y2_real - y1

    loss_cy2 = jnp.mean(critic_y2_fn(y2_fake))
    loss_cdem = jnp.mean(critic_dem_fn(dem_fake))
    loss_l1 = jnp.mean(jnp.abs(dem_fake - dem_real)) * cfg.l1_weight

    m_real = wmh_mask(y2_real, threshold, cfg.threshold_mode, cfg.soft_threshold_tau)
    m_fake = wmh_mask(y2_fake, threshold, cfg.threshold_mode, cfg.soft_threshold_tau)
    loss_dice = (1.0 - dice_coef(m_real, m_fake)) * cfg.dice_weight
    vol_real = jnp.sum(m_real) / 1000.0
    vol_fake = jnp.sum(m_fake) / 1000.0
    loss_vol = jnp.square(vol_real - vol_fake) * cfg.vol_weight

    loss = -loss_cy2 - loss_cdem + loss_l1 + loss_vol + loss_dice
    aux = {
        "errG": loss,
        "errG_CY2": loss_cy2,
        "errG_DEM": loss_cdem,
        "errG_MSE": loss_l1,
        "errG_VOL": loss_vol,
        "errG_WMH": loss_dice,
    }
    return loss, aux
