"""Training subsystem tests: loss parity vs the reference (torch oracle),
dataset sampling, and an end-to-end train step."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')


class TestLossParity:
    def _data(self, seed=0, b=2, c=3, h=24, w=32):
        rng = np.random.default_rng(seed)
        logits = rng.standard_normal((b, c, h, w)).astype(np.float32)
        cls_gt = rng.integers(0, c, (b, h, w)).astype(np.int64)
        return logits, cls_gt

    @pytest.mark.parametrize('it', [0, 4000, 8000])
    def test_bootstrapped_ce(self, it):
        from model.losses import BootstrappedCE
        from xmem2_tpu.train.losses import bootstrapped_ce

        logits, cls_gt = self._data()
        ref = BootstrappedCE(2000, 7000)
        # reference computes per batch item; replicate its reduction
        ref_losses = []
        for bi in range(logits.shape[0]):
            l, p_ref = ref(torch.from_numpy(logits[bi:bi + 1]),
                           torch.from_numpy(cls_gt[bi:bi + 1]), it)
            ref_losses.append(float(l))
        ref_loss = float(np.mean(ref_losses))

        class_valid = jnp.ones((logits.shape[0], logits.shape[1]), bool)
        ours, p = bootstrapped_ce(jnp.asarray(logits), jnp.asarray(cls_gt),
                                  class_valid, jnp.int32(it), 2000, 7000)
        np.testing.assert_allclose(float(ours), ref_loss, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(p), float(p_ref), rtol=1e-5)

    def test_dice(self):
        from model.losses import dice_loss as ref_dice
        from xmem2_tpu.train.losses import dice_loss

        rng = np.random.default_rng(1)
        b, o, h, w = 2, 3, 24, 32
        mask = rng.uniform(0, 1, (b, o, h, w)).astype(np.float32)
        cls_gt = rng.integers(0, o + 1, (b, h, w)).astype(np.int64)
        ref = float(ref_dice(torch.from_numpy(mask), torch.from_numpy(cls_gt)))
        ours = float(dice_loss(jnp.asarray(mask), jnp.asarray(cls_gt),
                               jnp.ones((b, o), bool)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope='module')
def mini_vos_dir(tmp_path_factory):
    """A synthetic 2-video VOS-layout dataset."""
    from PIL import Image
    root = tmp_path_factory.mktemp('minivos')
    rng = np.random.default_rng(0)
    for vid in ('vid_a', 'vid_b'):
        (root / 'JPEGImages' / vid).mkdir(parents=True)
        (root / 'Annotations' / vid).mkdir(parents=True)
        for fi in range(6):
            img = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
            Image.fromarray(img).save(root / 'JPEGImages' / vid / f'{fi:05d}.jpg')
            m = np.zeros((64, 96), np.uint8)
            m[10 + fi:30 + fi, 20:50] = 1
            m[40:60, 60 + fi % 4:90] = 2
            pm = Image.fromarray(m, mode='P')
            pm.putpalette([0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * 759)
            pm.save(root / 'Annotations' / vid / f'{fi:05d}.png')
    return root


class TestVOSDataset:
    def test_sample_shapes(self, mini_vos_dir):
        from xmem2_tpu.train.vos_dataset import VOSDataset
        ds = VOSDataset(str(mini_vos_dir / 'JPEGImages'),
                        str(mini_vos_dir / 'Annotations'),
                        max_jump=3, is_bl=False, num_frames=3, max_num_obj=3,
                        seed=0)
        assert len(ds) == 2
        d = ds[0]
        assert d['rgb'].shape == (3, 384, 384, 3)
        assert d['first_frame_gt'].shape == (1, 3, 384, 384)
        assert d['cls_gt'].shape == (3, 384, 384)
        assert d['selector'].shape == (3,)
        assert d['cls_gt'].max() <= 3
        assert d['selector'].sum() == d['info']['num_objects']

    def test_loader(self, mini_vos_dir):
        from xmem2_tpu.train.vos_dataset import VOSDataset
        from xmem2_tpu.train.loader import DataLoader
        ds = VOSDataset(str(mini_vos_dir / 'JPEGImages'),
                        str(mini_vos_dir / 'Annotations'),
                        max_jump=3, is_bl=False, num_frames=3, seed=0)
        loader = DataLoader(ds, batch_size=2, num_workers=2)
        batches = list(loader)
        assert len(batches) == 1
        assert batches[0]['rgb'].shape == (2, 3, 384, 384, 3)


class TestTrainStep:
    @pytest.mark.slow
    def test_do_pass_updates_params(self, mini_vos_dir):
        import jax
        from xmem2_tpu.models.init import init_params
        from xmem2_tpu.train.trainer import XMemTrainer
        from xmem2_tpu.train.vos_dataset import VOSDataset
        from xmem2_tpu.train.loader import DataLoader

        config = {'num_frames': 3, 'num_ref_frames': 2, 'deep_update_prob': 0.2,
                  'hidden_dim': 64, 'start_warm': 200, 'end_warm': 700,
                  'lr': 1e-4, 'weight_decay': 0.05, 'steps': [10000],
                  'gamma': 0.1}
        params = init_params(seed=0)
        before = np.asarray(params.tree['decoder']['pred']['weight']).copy()
        trainer = XMemTrainer(config, params)

        ds = VOSDataset(str(mini_vos_dir / 'JPEGImages'),
                        str(mini_vos_dir / 'Annotations'),
                        max_jump=3, is_bl=False, num_frames=3, seed=0)
        loader = DataLoader(ds, batch_size=2, num_workers=1)
        data = next(iter(loader))
        aux = trainer.do_pass(data, it=0)
        loss0 = float(aux['total_loss'])
        assert np.isfinite(loss0)
        after = np.asarray(trainer.state.params.tree['decoder']['pred']['weight'])
        assert not np.allclose(before, after), 'params did not update'

        # checkpoint roundtrip
        save_dir = str(mini_vos_dir / 'ckpt')
        trainer.save_path = save_dir + '/net'
        trainer.save_checkpoint(1)
        it = trainer.load_checkpoint(save_dir + '/net_checkpoint_1.pkl')
        assert it == 1
