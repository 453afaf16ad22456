"""fBRS checkpoint loading with backbone auto-detection.

Behavioral parity target: reference fbrs/inference/utils.py:21-37 — sniff the
architecture from state-dict keys. The shipped fbrs.pth is a resnet50
DeepLabV3+ DistMapsModel; HRNet+OCR checkpoints are detected and rejected
with a clear message (not ported this round).
"""

from typing import Dict


def detect_backbone(state_dict_keys) -> str:
    keys = list(state_dict_keys)
    if any('feature_extractor.backbone' in k for k in keys):
        # resnet family; distinguish by stem depth (v1s deep stem = Sequential)
        if any('backbone.conv1.0' in k for k in keys):
            return 'resnet50'
        return 'resnet34'
    if any(k.startswith('feature_extractor.stage2') or 'ocr' in k
           for k in keys):
        return 'hrnet'
    raise ValueError('Unrecognized fBRS checkpoint format')


def load_is_model(checkpoint_path: str) -> Dict:
    """Load an interactive-segmentation checkpoint, verifying it is the
    supported resnet50 DeepLabV3+ variant."""
    import torch
    sd = torch.load(checkpoint_path, map_location='cpu', weights_only=True)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    backbone = detect_backbone(sd.keys())
    if backbone != 'resnet50':
        raise NotImplementedError(
            f'fBRS backbone {backbone!r} is not supported yet — use the '
            f'resnet50 f-BRS-B checkpoint (saves/fbrs.pth).')
    from xmem2_tpu.interactive.fbrs.model import load_fbrs_params
    return load_fbrs_params(checkpoint_path)
