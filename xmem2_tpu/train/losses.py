"""Training losses: bootstrapped cross-entropy + dice.

Behavioral parity target: reference model/losses.py (dice_loss :8,
BootstrappedCE :23, LossComputer :46). The bootstrap top-p hard-pixel mining
uses a sort + prefix mask instead of torch.topk so the kept-pixel count can be
a traced function of the iteration (warmup schedule stays inside jit).
"""

from typing import Dict

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def dice_loss(input_mask: jnp.ndarray, cls_gt: jnp.ndarray,
              obj_valid: jnp.ndarray) -> jnp.ndarray:
    """input_mask [B, O, H, W] probabilities (bg stripped); cls_gt [B, H, W]
    int; obj_valid [B, O] marks filled object slots.

    Reference dice_loss averages over all (object, batch) pairs; unfilled
    object slots there produce gt=0 rows that still contribute (their selector
    -zeroed masks give loss ~0 through the (num+1)/(den+1) smoothing), so we
    keep all slots for exact parity."""
    b, o = input_mask.shape[:2]
    mask = input_mask.reshape(b, o, -1)
    gt = (cls_gt[:, None] == (jnp.arange(o)[None, :, None, None] + 1)
          ).astype(jnp.float32).reshape(b, o, -1)
    numerator = 2 * jnp.sum(mask * gt, -1)
    denominator = jnp.sum(mask, -1) + jnp.sum(gt, -1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    return jnp.mean(loss)


def _masked_log_softmax(logits: jnp.ndarray, class_valid: jnp.ndarray):
    """log_softmax over the class axis restricted to valid classes.
    logits [..., C]; class_valid [..., C] bool."""
    masked = jnp.where(class_valid, logits, NEG_INF)
    m = jnp.max(masked, axis=-1, keepdims=True)
    ex = jnp.exp(masked - m)
    return masked - m - jnp.log(jnp.sum(ex, axis=-1, keepdims=True))


def bootstrapped_ce(logits: jnp.ndarray, cls_gt: jnp.ndarray,
                    class_valid: jnp.ndarray, it: jnp.ndarray,
                    start_warm: int, end_warm: int, top_p: float = 0.15):
    """logits [B, C, H, W] (C = 1+num_objects); cls_gt [B, H, W] int;
    class_valid [B, C]; it: traced iteration counter.

    Per batch item: plain CE before start_warm; afterwards the mean of the
    top-p fraction of hardest pixels, with p annealed 1.0 -> top_p between
    start_warm and end_warm (reference BootstrappedCE.forward :31-43).
    Returns (loss, p)."""
    b, c = logits.shape[:2]
    lp = _masked_log_softmax(jnp.moveaxis(logits, 1, -1),
                             class_valid[:, None, None, :])     # [B, H, W, C]
    raw = -jnp.take_along_axis(lp, cls_gt[..., None], axis=-1)[..., 0]  # [B, H, W]
    raw = raw.reshape(b, -1)                                     # [B, HW]
    hw = raw.shape[-1]

    this_p = jnp.where(
        it > end_warm, top_p,
        top_p + (1 - top_p) * ((end_warm - it) / (end_warm - start_warm)))
    k = jnp.floor(hw * this_p).astype(jnp.int32)

    sorted_desc = -jnp.sort(-raw, axis=-1)
    keep = (jnp.arange(hw)[None, :] < k).astype(raw.dtype)
    boot = jnp.sum(sorted_desc * keep, -1) / jnp.maximum(k, 1)

    plain = jnp.mean(raw, -1)
    loss = jnp.where(it < start_warm, plain, boot)               # [B]
    p = jnp.where(it < start_warm, 1.0, this_p)
    return jnp.mean(loss), p


def compute_losses(logits_seq, masks_seq, cls_gt, class_valid, it,
                   start_warm: int, end_warm: int) -> Dict[str, jnp.ndarray]:
    """Sequence loss (reference LossComputer.compute :52-68).

    logits_seq / masks_seq: lists indexed by ti-1 with [B, 1+O, H, W] /
    [B, O, H, W]; cls_gt [B, T, H, W]; class_valid [B, 1+O]."""
    losses = {'total_loss': jnp.float32(0), 'p': jnp.float32(0)}
    t = len(logits_seq) + 1
    obj_valid = class_valid[:, 1:]
    for ti in range(1, t):
        ce, p = bootstrapped_ce(logits_seq[ti - 1], cls_gt[:, ti],
                                class_valid, it, start_warm, end_warm)
        d = dice_loss(masks_seq[ti - 1], cls_gt[:, ti], obj_valid)
        losses[f'ce_loss_{ti}'] = ce
        losses[f'dice_loss_{ti}'] = d
        losses['p'] += p / (t - 1)
        losses['total_loss'] += ce + d
    return losses
