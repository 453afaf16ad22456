"""Multi-stage training CLI.

Behavioral parity target: reference train.py:25-250 — stage sequence
(0 static / 1 BL30K / 2,3 DAVIS+YT), max_skip curriculum, finetune phase,
stage-to-stage in-memory weight handoff, crash-save in finally.

Distributed redesign: torchrun/DDP/NCCL becomes a jax.sharding.Mesh over all
local devices with the batch sharded on the 'data' axis; the gradient
all-reduce is inserted by XLA. One host process drives all local chips
(multi-host: jax.distributed.initialize handles the rest — each host runs
this same script)."""

from xmem2_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()  # JAX_PLATFORMS env wins over sitecustomize

import datetime
import math
from os import path

import numpy as np

from xmem2_tpu.train.configuration import Configuration


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self.cum = np.cumsum([len(d) for d in datasets])

    def __len__(self):
        return int(self.cum[-1])

    def __getitem__(self, idx):
        di = int(np.searchsorted(self.cum, idx, side='right'))
        prev = 0 if di == 0 else int(self.cum[di - 1])
        return self.datasets[di][idx - prev]


def maybe_init_distributed():
    """Multi-host bootstrap — the torchrun/init_process_group analog
    (reference train.py:25). Each host runs this same script; JAX wires the
    hosts together so jax.devices() spans the whole pod.

    Triggered by XMEM2_DIST=1 (TPU pods: jax.distributed.initialize()
    auto-detects the coordinator) or by explicit JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars (CPU/GPU clusters)."""
    import os

    import jax

    addr = os.environ.get('JAX_COORDINATOR_ADDRESS')
    if os.environ.get('XMEM2_DIST') == '1' and addr is None:
        jax.distributed.initialize()
    elif addr is not None:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ['JAX_NUM_PROCESSES']),
            process_id=int(os.environ['JAX_PROCESS_ID']))
    else:
        return False
    print(f'jax.distributed initialized: process {jax.process_index()} '
          f'of {jax.process_count()}')
    return True


def main():
    import jax

    from xmem2_tpu.bridge.torch_params import load_any
    from xmem2_tpu.models.init import init_params
    from xmem2_tpu.parallel.mesh import make_mesh
    from xmem2_tpu.train.loader import DataLoader
    from xmem2_tpu.train.static_dataset import StaticTransformDataset
    from xmem2_tpu.train.trainer import XMemTrainer
    from xmem2_tpu.train.vos_dataset import VOSDataset
    from xmem2_tpu.utils.load_subset import load_sub_davis, load_sub_yv
    from xmem2_tpu.utils.logger import TensorboardLogger

    maybe_init_distributed()

    raw_config = Configuration()
    raw_config.parse()

    devices = jax.devices()  # global across hosts after distributed init
    world_size = len(devices)
    mesh = make_mesh()
    print(f'Data-parallel mesh over {world_size} device(s): {devices}')

    network_in_memory = None
    stages = raw_config['stages']
    total_iter = 0

    for si, stage in enumerate(list(stages)):
        seed = 14159265
        np.random.seed(seed)

        stage_config = raw_config.get_stage_parameters(stage)
        config = dict(**raw_config.args, **stage_config)
        if config['exp_id'] != 'NULL':
            config['exp_id'] = config['exp_id'] + '_s%s' % stages[:si + 1]
        config['single_object'] = (stage == '0')
        config['num_devices'] = world_size
        if config['batch_size'] % world_size != 0:
            raise ValueError('Batch size must be divisible by the number of devices.')
        print(f'Starting stage {stage} (batch {config["batch_size"]} over '
              f'{world_size} devices)')

        if config['exp_id'].lower() != 'null':
            long_id = '%s_%s' % (datetime.datetime.now().strftime('%b%d_%H.%M.%S'),
                                 config['exp_id'])
        else:
            long_id = None
        logger = TensorboardLogger(config['exp_id'], long_id)
        logger.log_string('hyperpara', str(config))

        # model init / stage handoff
        if network_in_memory is not None:
            print('Loading network from the previous stage')
            params = network_in_memory
            network_in_memory = None
        elif raw_config['load_network'] is not None:
            print('Loading network from disk')
            params = load_any(raw_config['load_network'])
            raw_config['load_network'] = None
        else:
            params = init_params(
                key_dim=config['key_dim'], value_dim=config['value_dim'],
                hidden_dim=config['hidden_dim'],
                single_object=config['single_object'], seed=seed)

        dtype = None
        if config['amp']:
            import jax.numpy as jnp
            dtype = jnp.bfloat16

        trainer = XMemTrainer(
            config, params, mesh=mesh, logger=logger,
            save_path=path.join('saves', long_id, long_id) if long_id else None,
            dtype=dtype)

        if raw_config['load_checkpoint'] is not None:
            total_iter = trainer.load_checkpoint(raw_config['load_checkpoint'])
            raw_config['load_checkpoint'] = None
            print('Previously trained model loaded!')
        else:
            total_iter = 0

        # --- datasets + curriculum (reference train.py:119-190) -----------
        def construct_loader(dataset):
            return DataLoader(dataset, config['batch_size'], shuffle=True,
                              num_workers=config['num_workers'], seed=seed)

        max_skip_values = [10, 15, 5, 5]
        renew_loader = None

        if stage == '0':
            static_root = path.expanduser(config['static_root'])
            train_dataset = StaticTransformDataset([
                (path.join(static_root, 'fss'), 0, 1),
                (path.join(static_root, 'DUTS-TR'), 1, 1),
                (path.join(static_root, 'DUTS-TE'), 1, 1),
                (path.join(static_root, 'ecssd'), 1, 1),
                (path.join(static_root, 'BIG_small'), 1, 5),
                (path.join(static_root, 'HRSOD_small'), 1, 5),
            ], num_frames=config['num_frames'], seed=seed,
                crop_size=config['crop_size'])
            train_loader = construct_loader(train_dataset)
            print(f'Static dataset size: {len(train_dataset)}')
            increase_skip_fraction = [100]
        elif stage == '1':
            increase_skip_fraction = [0.1, 0.3, 0.8, 100]
            bl_root = path.expanduser(config['bl_root'])

            def renew_loader(max_skip, finetune=False):
                ds = VOSDataset(path.join(bl_root, 'JPEGImages'),
                                path.join(bl_root, 'Annotations'),
                                max_skip, is_bl=True,
                                num_frames=config['num_frames'],
                                finetune=finetune, seed=seed,
                                crop_size=config['crop_size'])
                print(f'Blender dataset size: {len(ds)} (max_skip={max_skip})')
                return construct_loader(ds)

            train_loader = renew_loader(5)
        else:
            increase_skip_fraction = [0.1, 0.3, 0.9, 100]
            yv_root = path.join(path.expanduser(config['yv_root']), 'train_480p')
            davis_root = path.join(path.expanduser(config['davis_root']),
                                   '2017', 'trainval')

            def renew_loader(max_skip, finetune=False):
                # //5: YouTubeVOS has annotations every five frames
                yv = VOSDataset(path.join(yv_root, 'JPEGImages'),
                                path.join(yv_root, 'Annotations'),
                                max_skip // 5, is_bl=False, subset=load_sub_yv(),
                                num_frames=config['num_frames'],
                                finetune=finetune, seed=seed,
                                crop_size=config['crop_size'])
                davis = VOSDataset(path.join(davis_root, 'JPEGImages', '480p'),
                                   path.join(davis_root, 'Annotations', '480p'),
                                   max_skip, is_bl=False,
                                   subset=load_sub_davis(),
                                   num_frames=config['num_frames'],
                                   finetune=finetune, seed=seed,
                                   crop_size=config['crop_size'])
                ds = ConcatDataset([davis] * 5 + [yv])
                print(f'DAVIS size: {len(davis)}, YouTube size: {len(yv)}, '
                      f'concat: {len(ds)} (max_skip={max_skip})')
                return construct_loader(ds)

            train_loader = renew_loader(5)

        total_epoch = math.ceil(config['iterations'] / max(len(train_loader), 1))
        current_epoch = total_iter // max(len(train_loader), 1)
        print(f'We approximately use {total_epoch} epochs.')
        change_skip_iter = [round(config['iterations'] * f)
                            for f in increase_skip_fraction]
        cur_skip = 5

        finetuning = False
        try:
            while total_iter < config['iterations'] + config['finetune']:
                train_loader.set_epoch(current_epoch)
                current_epoch += 1
                print(f'Current epoch: {current_epoch}')

                for data in train_loader:
                    if stage != '0' and total_iter >= change_skip_iter[0]:
                        while total_iter >= change_skip_iter[0]:
                            cur_skip = max_skip_values[0]
                            max_skip_values = max_skip_values[1:]
                            change_skip_iter = change_skip_iter[1:]
                        print(f'Changing max_skip to {cur_skip}')
                        train_loader = renew_loader(cur_skip)
                        break

                    if (config['finetune'] > 0 and not finetuning
                            and total_iter >= config['iterations']
                            and renew_loader is not None):
                        train_loader = renew_loader(cur_skip, finetune=True)
                        finetuning = True
                        trainer.save_network_interval = 1000
                        break

                    trainer.do_pass(data, total_iter)
                    total_iter += 1
                    if total_iter >= config['iterations'] + config['finetune']:
                        break
        finally:
            if not config['debug'] and long_id is not None and total_iter > 5000:
                trainer.save_network(total_iter)
                trainer.save_checkpoint(total_iter)

        network_in_memory = trainer.state.params


if __name__ == '__main__':
    main()
