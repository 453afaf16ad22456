#!/usr/bin/env bash
# Minimal model set for the interactive demo (reference
# scripts/download_models_demo.sh): the XMem backbone plus the two
# interactive assistants. Weights load directly via the torch->jax bridge.
set -e
wget -P ./saves/ https://github.com/hkchengrex/XMem/releases/download/v1.0/XMem.pth
wget -P ./saves/ https://github.com/hkchengrex/XMem/releases/download/v1.0/fbrs.pth
wget -P ./saves/ https://github.com/hkchengrex/XMem/releases/download/v1.0/s2m.pth
