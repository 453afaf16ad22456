"""GUI interaction types: free brush, scribble->S2M, click->fBRS.

Behavioral parity target: reference inference/interact/interaction.py
(aggregate_sbg :18, aggregate_wbg :36, FreeInteraction :69,
ScribbleInteraction :136, ClickInteraction :199). Probability maps are numpy
or jax arrays [K(+1), H, W].
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from xmem2_tpu.interactive.interactive_utils import (
    color_map, index_numpy_to_one_hot)


def aggregate_sbg(prob, keep_bg=False, hard=False):
    """Soft-background aggregation: fixed 0.5 background channel
    (reference interaction.py:18-33)."""
    k, h, w = prob.shape
    ex_prob = jnp.concatenate(
        [jnp.full((1, h, w), 0.5, prob.dtype), prob], axis=0)
    ex_prob = jnp.clip(ex_prob, 1e-7, 1 - 1e-7)
    logits = jnp.log(ex_prob / (1 - ex_prob))
    if hard:
        logits = logits * 1000
    out = _softmax0(logits)
    return out if keep_bg else out[1:]


def _softmax0(logits):
    return jax.nn.softmax(logits, axis=0)


def aggregate_wbg(prob, keep_bg=False, hard=False):
    """Product-of-complements background aggregation
    (reference interaction.py:36-50)."""
    prob = jnp.asarray(prob)
    new_prob = jnp.concatenate(
        [jnp.prod(1 - prob, axis=0, keepdims=True), prob], axis=0)
    new_prob = jnp.clip(new_prob, 1e-7, 1 - 1e-7)
    logits = jnp.log(new_prob / (1 - new_prob))
    if hard:
        logits = logits * 1000
    out = _softmax0(logits)
    return out if keep_bg else out[1:]


class Interaction:
    def __init__(self, image, prev_mask, true_size, controller):
        self.image = image
        self.prev_mask = prev_mask
        self.controller = controller
        self.start_time = time.time()
        self.h, self.w = true_size
        self.out_prob = None
        self.out_mask = None

    def predict(self):
        pass


def _draw_line(canvas, p0, p1, value, thickness):
    import cv2
    return cv2.line(canvas,
                    (int(round(p0[0])), int(round(p0[1]))),
                    (int(round(p1[0])), int(round(p1[1]))),
                    value, thickness=thickness)


class FreeInteraction(Interaction):
    """Brush drawing directly into the index map (reference :69-134)."""

    def __init__(self, image, prev_mask, true_size, num_objects):
        super().__init__(image, prev_mask, true_size, None)
        self.K = num_objects
        self.drawn_map = np.asarray(prev_mask).copy()
        self.curr_path = [[] for _ in range(self.K + 1)]
        self.size = None

    def set_size(self, size):
        self.size = size

    def push_point(self, x, y, k, vis=None):
        if vis is not None:
            vis_map, vis_alpha = vis
        selected = self.curr_path[k]
        selected.append((x, y))
        if len(selected) >= 2:
            self.drawn_map = _draw_line(self.drawn_map, selected[-2],
                                        selected[-1], k, self.size)
            if vis is not None:
                vis_map = _draw_line(vis_map, selected[-2], selected[-1],
                                     color_map[k], self.size)
                vis_alpha = _draw_line(vis_alpha, selected[-2], selected[-1],
                                       0.75, self.size)
        if vis is not None:
            return vis_map, vis_alpha

    def end_path(self):
        self.curr_path = [[] for _ in range(self.K + 1)]

    def predict(self):
        self.out_prob = jnp.asarray(
            index_numpy_to_one_hot(self.drawn_map, self.K + 1))
        return self.out_prob


class ScribbleInteraction(Interaction):
    """Scribbles -> S2M network (reference :136-197)."""

    def __init__(self, image, prev_mask, true_size, controller, num_objects):
        super().__init__(image, prev_mask, true_size, controller)
        self.K = num_objects
        self.drawn_map = np.full((self.h, self.w), 255, np.uint8)
        self.curr_path = [[] for _ in range(self.K + 1)]
        self.size = 3

    def push_point(self, x, y, k, vis=None):
        if vis is not None:
            vis_map, vis_alpha = vis
        selected = self.curr_path[k]
        selected.append((x, y))
        if len(selected) >= 2:
            self.drawn_map = _draw_line(self.drawn_map, selected[-2],
                                        selected[-1], k, self.size)
            if vis is not None:
                vis_map = _draw_line(vis_map, selected[-2], selected[-1],
                                     color_map[k], self.size)
                vis_alpha = _draw_line(vis_alpha, selected[-2], selected[-1],
                                       0.75, self.size)
        if vis is not None:
            return vis_map, vis_alpha

    def end_path(self):
        self.curr_path = [[] for _ in range(self.K + 1)]

    def predict(self):
        self.out_prob = self.controller.interact(self.image, self.prev_mask,
                                                 self.drawn_map)
        self.out_prob = aggregate_wbg(self.out_prob, keep_bg=True, hard=True)
        return self.out_prob


class ClickInteraction(Interaction):
    """Clicks -> fBRS (reference :199-254). prev_mask is in prob form
    [1+K, H, W]."""

    def __init__(self, image, prev_mask, true_size, controller, tar_obj):
        super().__init__(image, prev_mask, true_size, controller)
        self.tar_obj = tar_obj
        self.pos_clicks = []
        self.neg_clicks = []
        self.out_prob = jnp.asarray(prev_mask)
        self.obj_mask = None

    def push_point(self, x, y, neg, vis=None):
        if neg:
            self.neg_clicks.append((x, y))
        else:
            self.pos_clicks.append((x, y))

        self.obj_mask = self.controller.interact(self.image, x, y, not neg)

        if vis is not None:
            import cv2
            vis_map, vis_alpha = vis
            color = color_map[0] if neg else color_map[self.tar_obj]
            vis_map = cv2.circle(vis_map, (int(round(x)), int(round(y))), 2,
                                 color, thickness=-1)
            vis_alpha = cv2.circle(vis_alpha, (int(round(x)), int(round(y))),
                                   2, 1, thickness=-1)
            return vis_map, vis_alpha

    def predict(self):
        out = jnp.asarray(self.prev_mask)
        # allow the interacting object to overwrite existing masks without
        # remembering all object probabilities (reference :247-252)
        out = jnp.clip(out, a_max=0.9)
        out = out.at[self.tar_obj].set(self.obj_mask)
        self.out_prob = aggregate_wbg(out[1:], keep_bg=True, hard=True)
        return self.out_prob
