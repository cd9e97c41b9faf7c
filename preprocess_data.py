#!/usr/bin/env python
"""Offline preprocessing CLI — raw Multi-PIE/LFW + Face++ JSONs -> dataset.

Rebuild of the reference data_process/ stage (process.py + get_landmarks.py)
as a real CLI instead of commented-out __main__ blocks.

    # fetch landmarks (requires Face++ API credentials + network):
    python preprocess_data.py fetch --img_dir RAW/images --out_dir RAW/lms \
        --api_key K --api_secret S --suffix_strip 7

    # build the training split:
    python preprocess_data.py train --img_dir RAW/images --mask_dir RAW/masks \
        --lm_dir RAW/lms --save_dir ./dataset/multipie/train

    # build the test split / LFW:
    python preprocess_data.py test --img_dir RAW/test_images --lm_dir RAW/lms \
        --save_dir ./dataset/multipie/test
    python preprocess_data.py lfw --img_dir RAW/lfw --lm_dir RAW/lfw_lms \
        --save_dir ./dataset/lfw
"""

import argparse
import os
from os.path import basename, join

import cv2

from ffwm_tpu.data.preprocess import (
    process_frontal_only,
    process_multipie_train_split,
)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("fetch")
    f.add_argument("--img_dir", required=True)
    f.add_argument("--out_dir", required=True)
    f.add_argument("--api_key", required=True)
    f.add_argument("--api_secret", required=True)
    f.add_argument("--suffix_strip", type=int, default=0,
                   help="chars to strip from filename for the JSON key "
                        "(7 for multipie '_06.png')")
    f.add_argument("--workers", type=int, default=4)

    for name in ("train", "test", "lfw"):
        s = sub.add_parser(name)
        s.add_argument("--img_dir", required=True)
        s.add_argument("--lm_dir", required=True)
        s.add_argument("--save_dir", required=True)
        s.add_argument("--load_size", type=int, default=128)
        if name == "train":
            s.add_argument("--mask_dir", required=True)

    args = p.parse_args()

    if args.cmd == "fetch":
        from ffwm_tpu.data.facepp_client import FacePPClient

        client = FacePPClient(args.api_key, args.api_secret)
        client.fetch_dir(args.img_dir, args.out_dir,
                         suffix_strip=args.suffix_strip, workers=args.workers)
    elif args.cmd == "train":
        n = process_multipie_train_split(args.img_dir, args.mask_dir,
                                         args.lm_dir, args.save_dir,
                                         args.load_size)
        print(f"wrote {n} pairs to {args.save_dir}")
    else:
        img_save = join(args.save_dir, "images")
        os.makedirs(img_save, exist_ok=True)
        n = 0
        for fn in sorted(os.listdir(args.img_dir)):
            if args.cmd == "test":
                if fn.split("_")[3] in ("081", "191"):
                    continue
                lm_json = join(args.lm_dir, basename(fn)[:-7] + ".json")
                force_roll = False
            else:
                lm_json = join(args.lm_dir, os.path.splitext(fn)[0] + ".json")
                force_roll = True
            if not os.path.exists(lm_json):
                continue
            img = process_frontal_only(join(args.img_dir, fn), lm_json,
                                       args.load_size, force_roll=force_roll)
            cv2.imwrite(join(img_save, basename(fn)), img)
            n += 1
        print(f"wrote {n} images to {img_save}")


if __name__ == "__main__":
    main()
