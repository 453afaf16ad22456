#!/bin/bash
# Fetch the released model weights (reference scripts/download_models.sh
# surface). The weights are the UNMODIFIED original XMem weights
# (reference README.md:179-183) plus the interactive nets; convert the torch
# .pth to our native .npz with:
#   python -c "from xmem2_tpu.bridge import load_torch_checkpoint, save_params; \
#              save_params(load_torch_checkpoint('saves/XMem.pth'), 'saves/XMem.npz')"

set -e
mkdir -p saves
cd saves

wget -nc https://github.com/hkchengrex/XMem/releases/download/v1.0/XMem.pth
wget -nc https://github.com/hkchengrex/XMem/releases/download/v1.0/s2m.pth
wget -nc https://github.com/hkchengrex/XMem/releases/download/v1.0/fbrs.pth

echo "Done. Convert with bridge.load_torch_checkpoint -> save_params for the torch-free path."
