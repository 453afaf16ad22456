"""fBRS parity and behavior tests.

The reference fbrs model (torch) is the oracle; its Cython dist-maps import
is stubbed with our native C++ BFS (bit-compatible, see test_dist_maps.py),
so the comparison isolates the network itself."""

import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')


def _stub_cython():
    from xmem2_tpu.interactive.clicks.dist_maps import get_dist_maps_native
    mod = types.ModuleType('inference.interact.fbrs.utils.cython')
    mod.get_dist_maps = get_dist_maps_native
    sys.modules['inference.interact.fbrs.utils.cython'] = mod


@pytest.fixture(scope='module')
def fbrs_pair():
    _stub_cython()
    from inference.interact.fbrs.model.is_deeplab_model import get_deeplab_model
    from tests.golden_utils import synth_state_dict
    from xmem2_tpu.bridge.torch_params import _assign

    net = get_deeplab_model(backbone='resnet50', cpu_dist_maps=True,
                            norm_radius=260).eval()
    names = [k for k in net.state_dict() if not k.endswith('num_batches_tracked')]
    shapes = [tuple(net.state_dict()[k].shape) for k in names]
    sd = synth_state_dict(names, shapes)
    full = dict(net.state_dict())
    for k, v in sd.items():
        full[k] = torch.from_numpy(v)
    net.load_state_dict(full)

    tree = {}
    bn_markers = {k.rsplit('.', 1)[0] for k in sd if k.endswith('running_mean')}
    for name, a in sd.items():
        prefix = name.rsplit('.', 1)[0]
        if name.endswith('weight') and a.ndim == 4:
            a = np.transpose(a, (2, 3, 1, 0))
        elif name.endswith('weight') and a.ndim == 2 and prefix not in bn_markers:
            a = np.transpose(a, (1, 0))
        _assign(tree, name.split('.'), a)
    return net, tree


def test_model_parity(fbrs_pair):
    from xmem2_tpu.interactive.fbrs import model as M
    from xmem2_tpu.interactive.clicks.dist_maps import (
        encode_dist, get_dist_maps_native)
    net, tree = fbrs_pair
    rng = np.random.default_rng(0)
    h, w = 64, 96
    image = rng.standard_normal((1, 3, h, w)).astype(np.float32)
    points = np.array([[[10, 20], [-1, -1], [40, 70], [-1, -1]]], np.float32)

    with torch.no_grad():
        ref = net(torch.from_numpy(image), torch.from_numpy(points))
        ref_logits = ref['instances'].numpy()            # [1, 1, H, W]

    coord = encode_dist(get_dist_maps_native(points[0], h, w, 260.0))
    ours = M.forward(tree, jnp.asarray(np.moveaxis(image, 1, -1)),
                     jnp.asarray(np.moveaxis(coord, 0, -1))[None])
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1),
                               ref_logits, rtol=3e-3, atol=3e-3)


def test_interactive_controller_clicks(fbrs_pair):
    """Functional: clicks produce masks, undo restores state, finish_object
    writes the result mask."""
    from xmem2_tpu.interactive.fbrs.controller import InteractiveController
    _, tree = fbrs_pair
    rng = np.random.default_rng(1)
    image = rng.standard_normal((64, 96, 3)).astype(np.float32)

    ctrl = InteractiveController(tree, {
        'brs_mode': 'f-BRS-B', 'prob_thresh': 0.5,
        'zoom_in_params': {'skip_clicks': 1, 'target_size': 48,
                           'expansion_ratio': 1.4, 'min_crop_size': 20},
        'predictor_params': {'net_clicks_limit': 8, 'max_size': 128},
        'brs_opt_func_params': {'min_iou_diff': 1e-3},
        'lbfgs_params': {'maxfun': 3},
    })
    ctrl.set_image(image)
    ctrl.add_click(30, 20, True)          # (x, y)
    assert len(ctrl.probs_history) == 1
    p1 = np.asarray(ctrl.probs_history[-1][1])
    assert p1.shape == (64, 96)
    assert np.isfinite(p1).all() and 0 <= p1.min() and p1.max() <= 1

    ctrl.add_click(50, 40, False)         # negative click triggers BRS
    assert len(ctrl.probs_history) == 2

    ctrl.undo_click()
    assert len(ctrl.probs_history) == 1
    np.testing.assert_allclose(np.asarray(ctrl.probs_history[-1][1]), p1)

    ctrl.finish_object()
    assert ctrl.object_count == 1
    assert ctrl.result_mask.max() <= 1
