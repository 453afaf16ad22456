"""Resize YouTubeVOS to 480p (reference scripts/resize_youtube.py surface):
images bicubic, masks nearest, multiprocessing pool.

Usage: python scripts/resize_youtube.py <in_path> <out_path>
"""

import os
import sys
from functools import partial
from multiprocessing import Pool
from os import path

from PIL import Image


def resize_vid_jpeg(vid, in_path, out_path):
    vid_path = path.join(in_path, 'JPEGImages', vid)
    vid_out = path.join(out_path, 'JPEGImages', vid)
    os.makedirs(vid_out, exist_ok=True)
    for im_name in os.listdir(vid_path):
        img = Image.open(path.join(vid_path, im_name))
        w, h = img.size
        ratio = 480 / min(w, h)
        img = img.resize((int(w * ratio), int(h * ratio)), Image.BICUBIC)
        img.save(path.join(vid_out, im_name))


def resize_vid_anno(vid, in_path, out_path):
    vid_path = path.join(in_path, 'Annotations', vid)
    vid_out = path.join(out_path, 'Annotations', vid)
    os.makedirs(vid_out, exist_ok=True)
    for im_name in os.listdir(vid_path):
        img = Image.open(path.join(vid_path, im_name))
        w, h = img.size
        ratio = 480 / min(w, h)
        img = img.resize((int(w * ratio), int(h * ratio)), Image.NEAREST)
        img.save(path.join(vid_out, im_name))


if __name__ == '__main__':
    in_path, out_path = sys.argv[1], sys.argv[2]
    with Pool(processes=8) as pool:
        for sub, fn in (('JPEGImages', resize_vid_jpeg),
                        ('Annotations', resize_vid_anno)):
            videos = sorted(os.listdir(path.join(in_path, sub)))
            pool.map(partial(fn, in_path=in_path, out_path=out_path), videos)
    print('Done.')
