"""S2M (DeepLabV3+) parity vs the reference torch implementation with
synthetic weights."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def nets():
    from inference.interact.s2m.s2m_network import deeplabv3plus_resnet50
    from tests.golden_utils import synth_state_dict
    from xmem2_tpu.bridge.torch_params import _assign

    net = deeplabv3plus_resnet50(num_classes=1, output_stride=16,
                                 pretrained_backbone=False).eval()
    # 6-channel input conv as in the shipped s2m.pth (reference
    # s2m_controller.py concatenates 6 channels)
    net.backbone.conv1 = torch.nn.Conv2d(6, 64, kernel_size=7, stride=2,
                                         padding=3, bias=False)
    names = [k for k in net.state_dict() if not k.endswith('num_batches_tracked')]
    shapes = [tuple(net.state_dict()[k].shape) for k in names]
    sd = synth_state_dict(names, shapes)
    full = dict(net.state_dict())
    for k, v in sd.items():
        full[k] = torch.from_numpy(v)
    net.load_state_dict(full)

    # convert to our tree
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


def test_s2m_parity(nets):
    from xmem2_tpu.interactive.s2m.network import deeplabv3plus_resnet50_apply
    net, tree = nets
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()          # [1, 1, 64, 96]
    ours = deeplabv3plus_resnet50_apply(tree, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                               rtol=2e-3, atol=2e-3)
