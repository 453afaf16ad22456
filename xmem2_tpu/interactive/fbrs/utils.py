"""fBRS checkpoint loading with backbone auto-detection.

Behavioral parity target: reference fbrs/inference/utils.py:21-101 — sniff
the architecture from state-dict keys (HRNet via 'stage2.0.branches', resnet
family via backbone parameter count), then build the matching model. Both the
resnet50 DeepLabV3+ DistMapsModel (the shipped fbrs.pth) and HRNet+OCR
checkpoints load into our functional param trees; get_predictor dispatches on
the tree structure.
"""

from typing import Dict


def detect_backbone(state_dict_keys) -> str:
    keys = list(state_dict_keys)
    if any('feature_extractor.stage2.0.branches' in k for k in keys):
        return 'hrnet'
    if any('feature_extractor.backbone' in k for k in keys):
        # resnet family; distinguish by stem depth (v1s deep stem = Sequential)
        if any('backbone.conv1.0' in k for k in keys):
            return 'resnet50'
        return 'resnet34'
    raise ValueError('Unrecognized fBRS checkpoint format')


def load_is_model(checkpoint_path: str) -> Dict:
    """Load an interactive-segmentation checkpoint into a functional param
    tree (resnet50 DeepLabV3+ or HRNet+OCR; reference utils.py:21-37)."""
    import torch
    sd = torch.load(checkpoint_path, map_location='cpu', weights_only=True)
    if 'state_dict' in sd:
        sd = sd['state_dict']
    backbone = detect_backbone(sd.keys())
    if backbone == 'resnet34':
        raise NotImplementedError(
            'fBRS resnet34 checkpoints are not supported — use the resnet50 '
            'f-BRS-B checkpoint (saves/fbrs.pth) or an HRNet+OCR one.')
    from xmem2_tpu.interactive.fbrs.model import load_fbrs_params
    return load_fbrs_params(checkpoint_path)
