"""API usage examples (parity with reference main.py:5-43)."""

from xmem2_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()  # JAX_PLATFORMS env wins over sitecustomize

import os

from xmem2_tpu.inference.run_on_video import (
    run_on_video, select_k_next_best_annotation_candidates)

# example videos ship with the reference distribution; override with
# XMEM2_EXAMPLES if they live elsewhere
EXAMPLES = os.environ.get(
    'XMEM2_EXAMPLES',
    'example_videos' if os.path.exists('example_videos')
    else '/root/reference/example_videos')

if __name__ == '__main__':
    video_frames_path = f'{EXAMPLES}/caps/JPEGImages'
    video_masks_path = f'{EXAMPLES}/caps/Annotations'
    output_masks_path_baseline = 'output/example_video_caps/baseline'
    output_masks_path_three_frames = 'output/example_video_caps/three_frames'

    # Run inference with the FIRST frame only
    run_on_video(video_frames_path, video_masks_path,
                 output_masks_path_baseline, frames_with_masks=[0])

    # Run inference with annotations for frames 0, 14 and 25
    run_on_video(video_frames_path, video_masks_path,
                 output_masks_path_three_frames, frames_with_masks=[0, 14, 25])

    # Get proposals for the next 3 best annotation candidates
    chosen_annotation_frames = select_k_next_best_annotation_candidates(
        video_frames_path, video_masks_path, output_masks_path_baseline,
        k=3, previously_chosen_candidates=[0])
    print(f'Next 3 frames to annotate: {chosen_annotation_frames}')

    # IoU sanity check on a fully-annotated video
    stats = run_on_video(
        f'{EXAMPLES}/chair/JPEGImages', f'{EXAMPLES}/chair/Annotations',
        'output/example_video_chair/three_frames_with_iou',
        frames_with_masks=[5, 10, 15], compute_iou=True, print_progress=False)
    ious = stats[stats['iou'] >= 0]['iou']
    print(f'Average IoU: {ious.mean():.4f} (should be 90%+ with trained '
          f'weights as a sanity check)')
