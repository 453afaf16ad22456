"""TensorBoard logging (reference util/logger.py:22-100 surface) plus a
metrics integrator with cross-replica reduction (reference
util/log_integrator.py:10-80 — torch.distributed.reduce becomes a host-side
mean of already-replicated jax scalars under pjit DP)."""

import os
from typing import Callable, Dict, Optional

import numpy as np


def tensorboard_available() -> bool:
    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa: F401
        return True
    except Exception:
        return False


class TensorboardLogger:
    def __init__(self, short_id: str, long_id: Optional[str], git_info: str = ''):
        self.short_id = short_id
        if short_id is None or str(short_id).upper() == 'NULL':
            self.no_log = True
            print('Logging has been disabled.')
            self.logger = None
            return
        self.no_log = False
        from torch.utils.tensorboard import SummaryWriter
        log_dir = os.path.join('.', 'log', long_id or short_id)
        self.logger = SummaryWriter(log_dir)
        if git_info:
            self.log_string('git', git_info)

    def log_scalar(self, tag, x, step):
        if self.no_log:
            return
        self.logger.add_scalar(tag, float(x), step)

    def log_metrics(self, l1_tag, l2_tag, val, step, f=None):
        tag = f'{l1_tag}/{l2_tag}'
        text = f'{tag} - it {step:6d}: {val:.9s}' if isinstance(val, str) \
            else f'{tag} - it {step:6d}: {float(val):.6f}'
        print(text)
        if f is not None:
            f.write(text + '\n')
            f.flush()
        self.log_scalar(tag, val, step)

    def log_im(self, tag, x, step):
        if self.no_log:
            return
        self.logger.add_image(tag, x, step, dataformats='HWC')

    def log_string(self, tag, x):
        print(tag, x)
        if self.no_log:
            return
        self.logger.add_text(tag, x)


class Integrator:
    """Running means of scalar metrics with optional hooks
    (reference util/log_integrator.py:10-80). Under pjit data parallelism the
    loss/aux values are already globally reduced by XLA, so `finalize` just
    averages over the accumulation window."""

    def __init__(self, logger, distributed: bool = True, local_rank: int = 0,
                 world_size: int = 1):
        self.values: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.hooks = []
        self.logger = logger
        self.local_rank = local_rank

    def add_tensor(self, key: str, tensor):
        v = float(np.asarray(tensor))
        self.values[key] = self.values.get(key, 0.0) + v
        self.counts[key] = self.counts.get(key, 0) + 1

    def add_dict(self, tensor_dict: dict):
        for k, v in tensor_dict.items():
            self.add_tensor(k, v)

    def add_hook(self, hook: Callable):
        """hook: values dict -> (key, value) to add at finalize time."""
        self.hooks.append(hook)

    def reset_except_hooks(self):
        self.values = {}
        self.counts = {}

    def finalize(self, prefix: str, it: int, f=None):
        for hook in self.hooks:
            k, v = hook(self.values)
            self.add_tensor(k, v)
        for k in sorted(self.values):
            if k[:4] == 'hide':
                continue
            avg = self.values[k] / max(self.counts[k], 1)
            if self.logger is not None and self.local_rank == 0:
                self.logger.log_metrics(prefix, k, avg, it, f)
