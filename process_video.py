"""Process a video with xmem2_tpu — CLI parity with the reference
process_video.py:8-30: frame numbers are extracted from the mask filenames
via regex and fed to run_on_video as the annotated frames."""

from xmem2_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()  # JAX_PLATFORMS env wins over sitecustomize

import os
import re
from argparse import ArgumentParser

from xmem2_tpu.inference.run_on_video import run_on_video

if __name__ == '__main__':
    parser = ArgumentParser()
    parser.add_argument('--video', '-v', type=str, required=True,
                        help='Path to the video file or directory with .jpg frames')
    parser.add_argument('--masks', '-m', type=str, required=True,
                        help='Path to the directory with individual .png masks '
                             'for corresponding video frames')
    parser.add_argument('--output', '-o', type=str, required=True,
                        help='Path to save the resulting masks and overlays')
    parser.add_argument('--model', type=str, default=None,
                        help='Optional model checkpoint override (.pth or .npz)')
    parser.add_argument('--compute_dtype', type=str, default=None,
                        choices=['auto', 'float32', 'bfloat16'],
                        help='Optional compute dtype override '
                             "('auto' = bfloat16 on TPU, float32 elsewhere)")
    parser.add_argument('--exact', action='store_true',
                        help='force float32 compute + float32 memory value '
                             'stores (bit-closer parity with the fp32 '
                             'reference)')
    parser.add_argument('--size', type=int, default=None,
                        help='Resize shorter side to this (default 480; -1 keeps original)')
    args = parser.parse_args()

    frames_with_masks = []
    for file_name in os.listdir(args.masks):
        if not file_name.lower().endswith('.png'):
            continue
        frame_number_match = re.search(r'\d+', file_name)
        if frame_number_match is None:
            print(f'ERROR: file {file_name} does not contain a frame number. Cannot load it as a mask.')
            exit(1)
        frames_with_masks.append(int(frame_number_match.group()))
    print('Using masks for frames:', frames_with_masks)

    overwrite_config = {}
    if args.model is not None:
        overwrite_config['model'] = args.model
    if args.compute_dtype is not None:
        overwrite_config['compute_dtype'] = args.compute_dtype
    if args.exact:
        overwrite_config['compute_dtype'] = 'float32'
        overwrite_config['value_store_dtype'] = 'float32'
    if args.size is not None:
        overwrite_config['size'] = args.size

    run_on_video(args.video, args.masks, args.output,
                 frames_with_masks=frames_with_masks,
                 overwrite_config=overwrite_config or None)
