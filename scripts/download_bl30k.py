"""Download the BL30K pre-training dataset (stage-1 training).

Behavioral parity target: reference scripts/download_bl30k.py — six Google
Drive tar segments, ~1TB extracted, fetched and unpacked one at a time into
../BL30K. Requires `gdown` (not bundled; `pip install gdown` on a machine
with network access).
"""

import os
import tarfile

LICENSE = """
BL30K is a derivative of ShapeNet. Read and respect the ShapeNet license and
terms before use. Textures and skybox images come from Google image search
with the "non-commercial reuse" flag — do not use this dataset commercially.
Cite both ShapeNet and the XMem/XMem++ papers if you use it.
"""

# segment ids from the reference script (scripts/download_bl30k.py:22-29)
SEGMENTS = {
    'BL30K_a.tar': '1z9V5zxLOJLNt1Uj7RFqaP2FZWKzyXvVc',
    'BL30K_b.tar': '11-IzgNwEAPxgagb67FSrBdzZR7OKAEdJ',
    'BL30K_c.tar': '1ZfIv6GTo-OGpXpoKen1fUvDQ0A_WoQ-Q',
    'BL30K_d.tar': '1G4eXgYS2kL7_Cc0x3N1g1x7Zl8D_aU_-',
    'BL30K_e.tar': '1Y8q0V_oBwJIY27W_6-8CD1dRqV2gNTdE',
    'BL30K_f.tar': '1nawBAazf_unMv46qGBHhWcQ4JXZ5883r',
}


def main():
    import gdown  # not bundled in the TPU image; install where you download

    print(LICENSE)
    print('Segments download + extract to ../BL30K, one at a time.')
    print('You need ~1TB of free disk space.')
    if input('[y] to confirm, anything else to exit: ') != 'y':
        return

    for i, (name, file_id) in enumerate(SEGMENTS.items(), 1):
        out = os.path.join('..', name)
        print(f'Downloading segment {i}/{len(SEGMENTS)}: {name}')
        gdown.download(f'https://drive.google.com/uc?id={file_id}',
                       output=out, quiet=False)
        print('Extracting...')
        with tarfile.open(out, 'r') as tar:
            tar.extractall('..')
        print('Cleaning up...')
        os.remove(out)
    print('Done.')


if __name__ == '__main__':
    main()
