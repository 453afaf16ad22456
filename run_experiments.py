"""Frame-selection research harness.

Behavioral parity target: reference inference/run_experiments.py (the
reference version is partially bit-rotted — it imports a removed
`predict_annotation_candidates`, run_experiments.py:18; this is a working
equivalent): compare annotation-frame selection strategies by final IoU/J&F.

Layout expectation per video: <root>/<video>/{JPEGImages,Annotations}/.
"""

from xmem2_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()  # JAX_PLATFORMS env wins over sitecustomize

import json
import os
from argparse import ArgumentParser
from functools import partial
from os import path
from pathlib import Path

import numpy as np
from PIL import Image


def uniform_baseline(num_frames, k):
    return np.linspace(0, num_frames - 1, k).astype(int).tolist()


def run_one_video(video_dir, out_root, k, selectors, overwrite_config=None):
    from xmem2_tpu.inference.run_on_video import (
        run_on_video, select_k_next_best_annotation_candidates)

    video_dir = Path(video_dir)
    imgs = video_dir / 'JPEGImages'
    masks = video_dir / 'Annotations'
    n_frames = len(list(imgs.iterdir()))
    results = {}

    for selector in selectors:
        out_dir = Path(out_root) / selector / video_dir.name
        if selector == 'first_frame_only':
            frames = [0]
        elif selector == 'uniform':
            frames = uniform_baseline(n_frames, k)
        elif selector == 'cycle_dissimilarity':
            # run with frame 0 first, then pick the next k-1 most diverse
            baseline_out = Path(out_root) / '_baseline' / video_dir.name
            run_on_video(imgs, masks, baseline_out, frames_with_masks=[0],
                         compute_iou=False, print_progress=False,
                         overwrite_config=overwrite_config)
            extra = select_k_next_best_annotation_candidates(
                imgs, masks, baseline_out, k=k - 1,
                previously_chosen_candidates=[0],
                use_previously_predicted_masks=True, print_progress=False)
            frames = sorted([0] + list(extra))
        else:
            raise ValueError(selector)

        stats = run_on_video(imgs, masks, out_dir, frames_with_masks=frames,
                             compute_iou=True, print_progress=False,
                             overwrite_config=overwrite_config)
        ious = stats[stats['iou'] >= 0]['iou']
        results[selector] = {
            'frames': list(map(int, frames)),
            'mean_iou': float(ious.mean()) if len(ious) else float('nan'),
        }
        print(f'{video_dir.name} / {selector}: frames={frames} '
              f'mean IoU={results[selector]["mean_iou"]:.4f}')
    return results


def compute_metrics(pred_root, gt_root):
    """DAVIS J&F over saved predictions (reference compute_metrics :376).

    Predictions are saved as RGB (palette colors mapped back, reference
    image_saver semantics), so they are quantized against the GT's OWN
    palette to recover object indices — reference _load_preds
    (run_experiments.py:322-323); a plain convert('P') would invent an
    adaptive palette whose indices never match the GT's."""
    from xmem2_tpu.utils.metrics import batched_f_measure, batched_jaccard
    rows = {}
    for vid in sorted(os.listdir(pred_root)):
        pred_dir = path.join(pred_root, vid, 'masks')
        gt_dir = path.join(gt_root, vid)
        if not path.isdir(pred_dir):
            continue
        preds, gts = [], []
        palette_img = None
        for f in sorted(os.listdir(pred_dir)):
            gt_path = path.join(gt_dir, f)
            if not path.exists(gt_path):
                continue
            gt_img = Image.open(gt_path).convert('P')
            if palette_img is None:
                palette_img = gt_img
            gts.append(np.array(gt_img))
            pred_img = Image.open(path.join(pred_dir, f))
            if pred_img.mode == 'P':
                preds.append(np.array(pred_img))
            else:
                preds.append(np.array(
                    pred_img.convert('RGB').quantize(
                        palette=palette_img, dither=Image.Dither.NONE)))
        if not preds:
            continue
        y_pred, y_true = np.stack(preds), np.stack(gts)
        j = batched_jaccard(y_true, y_pred).mean()
        f = batched_f_measure(y_true, y_pred).mean()
        rows[vid] = {'J': float(j), 'F': float(f), 'J&F': float((j + f) / 2)}
        print(f'{vid}: J={j:.4f} F={f:.4f}')
    return rows


if __name__ == '__main__':
    parser = ArgumentParser()
    parser.add_argument('--videos_root', required=True,
                        help='Directory of videos, each with JPEGImages/ and '
                             'Annotations/')
    parser.add_argument('--output', required=True)
    parser.add_argument('--k', type=int, default=5,
                        help='Annotated frames per video')
    parser.add_argument('--selectors', nargs='+',
                        default=['first_frame_only', 'uniform',
                                 'cycle_dissimilarity'])
    parser.add_argument('--model', default=None)
    parser.add_argument('--size', type=int, default=None)
    args = parser.parse_args()

    overwrite = {}
    if args.model:
        overwrite['model'] = args.model
    if args.size is not None:
        overwrite['size'] = args.size

    all_results = {}
    for vid in sorted(os.listdir(args.videos_root)):
        vd = path.join(args.videos_root, vid)
        if not path.isdir(vd):
            continue
        try:
            all_results[vid] = run_one_video(
                vd, args.output, args.k, args.selectors,
                overwrite_config=overwrite or None)
        except Exception as e:  # per-video fallback (reference :167-177)
            print(f'{vid} failed ({e}); falling back to uniform only')
            all_results[vid] = run_one_video(vd, args.output, args.k,
                                             ['uniform'],
                                             overwrite_config=overwrite or None)

    with open(path.join(args.output, 'results.json'), 'wt') as f:
        json.dump(all_results, f, indent=2)
    print(json.dumps(all_results, indent=2))
