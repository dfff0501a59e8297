#!/usr/bin/env python
"""Dump resized video frames (preprocess stage 1; ref: save_video_frames.py)."""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video", required=True)
    parser.add_argument("--save_to", required=True)
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--every", type=int, default=10)
    parser.add_argument("--skip", type=int, default=0)
    opt = parser.parse_args()

    import cv2

    os.makedirs(opt.save_to, exist_ok=True)
    cap = cv2.VideoCapture(opt.video)
    idx = 0
    saved = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx >= opt.skip and (idx - opt.skip) % opt.every == 0:
            frame = cv2.resize(frame, (opt.width, opt.height))
            cv2.imwrite(os.path.join(opt.save_to, f"{saved:05d}.png"), frame)
            saved += 1
        idx += 1
    cap.release()
    print(f"saved {saved} frames to {opt.save_to}")


if __name__ == "__main__":
    main()
