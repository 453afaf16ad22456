"""Dataset fetcher (reference scripts/download_datasets.py surface).

Downloads DAVIS 2016/2017, YouTubeVOS 2019, and the static pretraining set
into ../Datasets (same layout train.py expects). Requires network access and
`gdown`; in air-gapped environments place the datasets manually:

  ../Datasets/static/{fss,DUTS-TR,DUTS-TE,ecssd,BIG_small,HRSOD_small}
  ../Datasets/DAVIS/2016 and ../Datasets/DAVIS/2017/trainval
  ../Datasets/YouTube/{train_480p,valid,all_frames}
"""

import os
import sys


DATASETS = {
    'static': 'https://drive.google.com/uc?id=1wUJq3HcLdN-z1t4CsUhjeZ9BVDb9YKLd',
    'davis_2017_trainval': 'https://data.vision.ee.ethz.ch/csergi/share/davis/DAVIS-2017-trainval-480p.zip',
    'davis_2017_testdev': 'https://data.vision.ee.ethz.ch/csergi/share/davis/DAVIS-2017-test-dev-480p.zip',
    'youtubevos_2019': 'https://youtube-vos.org/dataset/vos/',
}


def main():
    try:
        import gdown  # noqa: F401
    except ImportError:
        print('gdown is not installed and this environment may have no '
              'network egress.')
        print('Fetch the datasets manually into ../Datasets using the '
              'layout documented in this script:')
        for name, url in DATASETS.items():
            print(f'  {name}: {url}')
        sys.exit(1)

    os.makedirs('../Datasets', exist_ok=True)
    import gdown
    print('Downloading the static pretraining set...')
    gdown.download(DATASETS['static'], output='../Datasets/static_data.zip',
                   quiet=False)
    print('Unzip manually and fetch DAVIS/YouTubeVOS from their official '
          'sites (see module docstring).')


if __name__ == '__main__':
    main()
