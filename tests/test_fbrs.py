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


@pytest.fixture(scope='module')
def hrnet_pair():
    """Small HRNet+OCR (width=18, ocr=64) with synthetic weights: torch
    reference net + converted param tree."""
    _stub_cython()
    # the reference hrnet_ocr.py:208 uses the np.int alias removed in numpy
    # 1.24+; restore it for the oracle import only
    if not hasattr(np, 'int'):
        np.int = int
    from inference.interact.fbrs.model.is_hrnet_model import get_hrnet_model
    from tests.golden_utils import synth_state_dict
    from xmem2_tpu.bridge.torch_params import _assign

    net = get_hrnet_model(width=18, ocr_width=64, small=True,
                          cpu_dist_maps=True, norm_radius=260).eval()
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


class TestHRNet:
    def test_forward_parity(self, hrnet_pair):
        """Full DistMapsHRNetModel forward vs the torch oracle
        (reference is_hrnet_model.py:44-66, hrnet_ocr.py:335-394)."""
        from xmem2_tpu.interactive.fbrs import hrnet as HR
        from xmem2_tpu.interactive.clicks.dist_maps import (
            encode_dist, get_dist_maps_native)
        net, tree = hrnet_pair
        rng = np.random.default_rng(2)
        h, w = 64, 96
        image = rng.standard_normal((1, 3, h, w)).astype(np.float32)
        points = np.array([[[12, 22], [40, 60], [50, 80], [-1, -1]]],
                          np.float32)

        with torch.no_grad():
            ref = net(torch.from_numpy(image), torch.from_numpy(points))
            ref_logits = ref['instances'].numpy()

        coord = encode_dist(get_dist_maps_native(points[0], h, w, 260.0))
        ours = HR.forward(tree, jnp.asarray(np.moveaxis(image, 1, -1)),
                          jnp.asarray(np.moveaxis(coord, 0, -1))[None],
                          small=True)
        # synthetic-weight activations reach O(4000); tolerance scales with
        # magnitude (measured max abs err ~8e-3, max rel ~2e-3)
        np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1),
                                   ref_logits, rtol=5e-3, atol=5e-2)

    def test_compute_feats_parity(self, hrnet_pair):
        """compute_hrnet_feats (the f-BRS-A insertion point) matches."""
        from xmem2_tpu.interactive.fbrs import hrnet as HR
        net, tree = hrnet_pair
        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 3, 64, 96)).astype(np.float32)
        with torch.no_grad():
            ref = net.feature_extractor.compute_hrnet_feats(
                torch.from_numpy(x)).numpy()
        ours = HR.compute_hrnet_feats(tree['feature_extractor'],
                                      jnp.asarray(np.moveaxis(x, 1, -1)),
                                      small=True)
        np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                                   rtol=5e-3, atol=5e-2)


def _nhwc(a):
    return jnp.asarray(np.moveaxis(a, 1, -1))


def _coord_for(points, h, w):
    from xmem2_tpu.interactive.clicks.dist_maps import (
        encode_dist, get_dist_maps_native)
    return _nhwc(encode_dist(get_dist_maps_native(points, h, w, 260.0))[None])


class TestFeatureBRSInsertionModes:
    """Our _head_input/_predict_with_opt vs the reference
    get_prediction_logits for each insertion mode (brs.py:85-141)."""

    @pytest.mark.parametrize('mode', ['after_c4', 'after_aspp',
                                      'after_deeplab'])
    def test_deeplab_modes(self, fbrs_pair, mode):
        import torch.nn.functional as TF
        from xmem2_tpu.interactive.fbrs.predictor import FeatureBRSPredictor
        net, tree = fbrs_pair
        rng = np.random.default_rng(4)
        h, w = 64, 96
        image = rng.standard_normal((1, 3, h, w)).astype(np.float32)
        points = np.array([[10, 20], [40, 70]], np.float32)

        pred = FeatureBRSPredictor(tree, insertion_mode=mode, zoom_in=None)
        c = pred.num_channels
        raw = (0.05 * rng.standard_normal((2 * c,))).astype(np.float32)
        scale_t = torch.from_numpy(1 + raw[:c]).view(1, -1, 1, 1)
        bias_t = torch.from_numpy(raw[c:]).view(1, -1, 1, 1)

        # reference computation (brs.py:85-141)
        with torch.no_grad():
            coord_t = net.dist_maps(torch.from_numpy(image),
                                    torch.from_numpy(points[None]))
            x = net.rgb_conv(torch.cat((torch.from_numpy(image), coord_t), 1))
            fe = net.feature_extractor
            if mode in ('after_c4', 'after_aspp'):
                c1, _, _, c4 = fe.backbone(x)
                c1 = fe.skip_project(c1)
                if mode == 'after_aspp':
                    a = fe.aspp(c4)
                    a = TF.interpolate(a, size=c1.size()[2:], mode='bilinear',
                                       align_corners=True)
                    feats = torch.cat((a, c1), dim=1)
                else:
                    feats = c4
            else:
                feats = fe(x)[0]
            scaled = feats * scale_t + bias_t
            if mode == 'after_c4':
                a = fe.aspp(scaled)
                a = TF.interpolate(a, size=c1.size()[2:], mode='bilinear',
                                   align_corners=True)
                scaled = fe.head(torch.cat((a, c1), dim=1))
            elif mode == 'after_aspp':
                scaled = fe.head(scaled)
            ref = TF.interpolate(net.head(scaled), size=(h, w),
                                 mode='bilinear', align_corners=True).numpy()

        coord = _coord_for(points, h, w)
        input_data = pred._get_head_input(_nhwc(image), coord)
        ours, _ = pred._predict_with_opt(jnp.asarray(raw), input_data, (h, w))
        np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                                   rtol=5e-3, atol=5e-2)


class TestHRNetBRSInsertionModes:
    @pytest.mark.parametrize('mode', ['A', 'C'])
    def test_hrnet_modes(self, hrnet_pair, mode):
        import torch.nn.functional as TF
        from xmem2_tpu.interactive.fbrs.predictor import (
            HRNetFeatureBRSPredictor)
        net, tree = hrnet_pair
        rng = np.random.default_rng(5)
        h, w = 64, 96
        image = rng.standard_normal((1, 3, h, w)).astype(np.float32)
        points = np.array([[12, 22], [50, 80]], np.float32)

        pred = HRNetFeatureBRSPredictor(tree, insertion_mode=mode,
                                        zoom_in=None)
        c = pred.num_channels
        raw = (0.05 * rng.standard_normal((2 * c,))).astype(np.float32)
        scale_t = torch.from_numpy(1 + raw[:c]).view(1, -1, 1, 1)
        bias_t = torch.from_numpy(raw[c:]).view(1, -1, 1, 1)

        with torch.no_grad():
            coord_t = net.dist_maps(torch.from_numpy(image),
                                    torch.from_numpy(points[None]))
            x = net.rgb_conv(torch.cat((torch.from_numpy(image), coord_t), 1))
            fe = net.feature_extractor
            feats = fe.compute_hrnet_feats(x)
            if mode == 'C':
                out_aux = fe.aux_head(feats)
                f = fe.conv3x3_ocr(feats)
                context = fe.ocr_gather_head(f, out_aux)
                feats = fe.ocr_distri_head(f, context)
            scaled = feats * scale_t + bias_t
            if mode == 'A':
                out_aux = fe.aux_head(scaled)
                f = fe.conv3x3_ocr(scaled)
                context = fe.ocr_gather_head(f, out_aux)
                f = fe.ocr_distri_head(f, context)
                logits = fe.cls_head(f)
            else:
                logits = fe.cls_head(scaled)
            ref = TF.interpolate(logits, size=(h, w), mode='bilinear',
                                 align_corners=True).numpy()

        coord = _coord_for(points, h, w)
        input_data = pred._get_head_input(_nhwc(image), coord)
        ours, _ = pred._predict_with_opt(jnp.asarray(raw), input_data, (h, w))
        np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                                   rtol=5e-3, atol=5e-2)


class TestPredictorFactory:
    def test_mode_dispatch(self, fbrs_pair, hrnet_pair):
        from xmem2_tpu.interactive.fbrs.predictor import (
            BasePredictor, FeatureBRSPredictor, HRNetFeatureBRSPredictor,
            InputBRSPredictor, get_predictor)
        _, dtree = fbrs_pair
        _, htree = hrnet_pair
        assert type(get_predictor(dtree, 'NoBRS')) is BasePredictor
        for mode, ins in [('f-BRS-A', 'after_c4'), ('f-BRS-B', 'after_aspp'),
                          ('f-BRS-C', 'after_deeplab')]:
            p = get_predictor(dtree, mode)
            assert isinstance(p, FeatureBRSPredictor)
            assert p.insertion_mode == ins
            assert p.net_clicks_limit == 8
        for mode, ins in [('f-BRS-A', 'A'), ('f-BRS-B', 'A'),
                          ('f-BRS-C', 'C')]:
            p = get_predictor(htree, mode)
            assert isinstance(p, HRNetFeatureBRSPredictor)
            assert p.insertion_mode == ins
        for mode, tgt in [('RGB-BRS', 'rgb'), ('DistMap-BRS', 'dmaps')]:
            p = get_predictor(dtree, mode)
            assert isinstance(p, InputBRSPredictor)
            assert p.optimize_target == tgt
            assert p.net_clicks_limit == 5

    @pytest.mark.parametrize('brs_mode', ['f-BRS-A', 'f-BRS-C', 'RGB-BRS',
                                          'DistMap-BRS'])
    def test_modes_run_end_to_end(self, fbrs_pair, brs_mode):
        """Each BRS mode drives a click sequence through the controller:
        valid probabilities, L-BFGS optimization engages on click 2."""
        from xmem2_tpu.interactive.fbrs.controller import InteractiveController
        _, tree = fbrs_pair
        rng = np.random.default_rng(6)
        image = rng.standard_normal((48, 64, 3)).astype(np.float32)

        ctrl = InteractiveController(tree, {
            'brs_mode': brs_mode, 'prob_thresh': 0.5,
            'zoom_in_params': {'skip_clicks': 1, 'target_size': 48,
                               'expansion_ratio': 1.4, 'min_crop_size': 20},
            'predictor_params': {'max_size': 128},
            'brs_opt_func_params': {'min_iou_diff': 1e-3},
            'lbfgs_params': {'maxfun': 2},
        })
        ctrl.set_image(image)
        ctrl.add_click(20, 15, True)
        ctrl.add_click(40, 30, False)
        p = np.asarray(ctrl.probs_history[-1][1])
        assert p.shape == (48, 64)
        assert np.isfinite(p).all() and 0 <= p.min() and p.max() <= 1
