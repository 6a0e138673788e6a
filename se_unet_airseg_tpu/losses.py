"""Training losses of the 3-stage curriculum, as jitted array functions.

Semantics match the reference exactly (reference train.py:51-76):

  * `dice_loss` — soft Dice, smooth 1.0, over the whole batch (stage 1).
  * `general_union_loss` (GUL) — weighted union loss with alpha=0.2,
    beta=0.8, per-class smoothing sigma1=sigma2=1e-4, p-exponent 0.7
    (stages 2 and 3 main loss).
  * `atr_loss` — skeleton-masked continuity (break) loss (stage 3).

Stage mixes (reference train.py:597-599, 432-435, 238-243):
  S1: dice(de) + dice(en)
  S2: 1.0 * GUL(de) + 0.5 * GUL(en)
  S3: 1.0 * GUL(de) + 0.5 * GUL(en) + 0.5 * (atr(en) + atr(de))

All reductions run in float32 regardless of activation dtype. Inputs
are post-sigmoid probabilities, as in the reference call sites.

`tversky_loss` / `root_tversky_loss` exist in the reference
(save_gradients.py:27-49) but are dead code on the main path; they are
provided for API completeness.
"""

import jax.numpy as jnp


def _flat(x):
    return x.reshape(-1).astype(jnp.float32)


def dice_loss(pred, target, smooth: float = 1.0):
    p, t = _flat(pred), _flat(target)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def general_union_loss(
    pred,
    target,
    weight,
    *,
    alpha: float = 0.2,
    sigma1: float = 1e-4,
    sigma2: float = 1e-4,
    exponent: float = 0.7,
    smooth: float = 1.0,
):
    p, t, w = _flat(pred), _flat(target), _flat(weight)
    beta = 1.0 - alpha
    wi = t * sigma1 + (1.0 - t) * sigma2
    inter = jnp.sum(w * ((p + wi) ** exponent) * t)
    union = jnp.sum(w * (alpha * p + beta * t))
    return 1.0 - (inter + smooth) / (union + smooth)


def atr_loss(pred, skel, weight, *, smooth: float = 1.0):
    """Airway-continuity loss on skeleton voxels only.

    The reference signature takes (pred, target, skel, weight) but
    overwrites target with skel (reference train.py:70-76); we drop the
    unused argument.
    """
    p, s, w = _flat(pred), _flat(skel), _flat(weight)
    ps = p * s
    inter = jnp.sum(w * ps * s)
    union = jnp.sum(w * (ps + s))
    return 1.0 - (inter + smooth) / (union + smooth)


def tversky_loss(pred, target, *, alpha: float = 0.05, smooth: float = 1.0):
    p, t = _flat(pred), _flat(target)
    beta = 1.0 - alpha
    inter = jnp.sum(p * t)
    denom = jnp.sum(p * t) + alpha * jnp.sum(p * (1 - t)) + beta * jnp.sum((1 - p) * t)
    return 1.0 - (inter + smooth) / (denom + smooth)


def root_tversky_loss(pred, target, *, alpha: float = 0.05, exponent: float = 0.7,
                      smooth: float = 1.0):
    p, t = _flat(pred), _flat(target)
    beta = 1.0 - alpha
    inter = jnp.sum((p ** exponent) * t)
    denom = jnp.sum(p * t) + alpha * jnp.sum(p * (1 - t)) + beta * jnp.sum((1 - p) * t)
    return 1.0 - (inter + smooth) / (denom + smooth)


def stage1_loss(prob_en, prob_de, target):
    return dice_loss(prob_de, target) + dice_loss(prob_en, target)


def stage2_loss(prob_en, prob_de, target, weight):
    return general_union_loss(prob_de, target, weight) + 0.5 * general_union_loss(
        prob_en, target, weight
    )


def stage3_loss(prob_en, prob_de, target, weight, skel):
    gul = general_union_loss(prob_de, target, weight) + 0.5 * general_union_loss(
        prob_en, target, weight
    )
    atr = atr_loss(prob_en, skel, weight) + atr_loss(prob_de, skel, weight)
    return gul + 0.5 * atr
