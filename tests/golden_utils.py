"""Deterministic synthetic-weight generation shared by the golden-capture
scripts (which feed the reference torch model) and the parity tests (which
feed the JAX rebuild). Storing only names+shapes keeps golden files small."""

import numpy as np


def synth_state_dict(names, shapes):
    """Regenerate the exact synthetic state dict used by
    scripts/gen_golden_model.py: one seeded RNG consumed in key order."""
    rng = np.random.default_rng(42)
    sd = {}
    for name, shape in zip(names, shapes):
        shape = tuple(int(s) for s in shape)
        a = rng.standard_normal(shape).astype(np.float32)
        # Condition the random weights so activations stay O(1) through the
        # deep stacks (BN near identity, He-scaled convs/linears) — otherwise
        # parity tolerances are meaningless.
        if name.endswith('running_var'):
            a = np.abs(1.0 + 0.2 * a) + 0.1
        elif name.endswith('running_mean'):
            a = 0.2 * a
        elif name.endswith('bias'):
            a = 0.2 * a
        elif name.endswith('weight') and a.ndim == 1:   # BN scale
            a = 1.0 + 0.2 * a
        elif name.endswith('weight') and a.ndim == 4:   # conv, He-ish
            fan_in = shape[1] * shape[2] * shape[3]
            a = a * np.sqrt(2.0 / fan_in).astype(np.float32)
        elif name.endswith('weight') and a.ndim == 2:   # linear
            a = a / np.sqrt(shape[1]).astype(np.float32)
        sd[name] = a.astype(np.float32)
    return sd
