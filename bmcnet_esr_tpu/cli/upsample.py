"""Adaptive frame upsampling CLI (reference
``generate_dataset/upsampling/upsample.py``).

Walks ``--input_dir`` for sequence directories containing ``imgs/*.png`` (or
a flat image dir) plus ``timestamps.txt`` / ``fps.txt``, interpolates with
Super SloMo so consecutive frames differ by <= 1 px of motion, and writes the
upsampled frames + timestamps to ``--output_dir`` (the structure the event
simulator consumes).

    python -m bmcnet_esr_tpu.cli.upsample \
        --input_dir seqs/ --output_dir seqs_up/ \
        --checkpoint SuperSloMo.ckpt
"""

from __future__ import annotations

import argparse
import os
from glob import glob


def load_video(path: str):
    """mp4/avi -> (frames, timestamps) via the container fps (reference
    ``upsampling/utils/dataset.VideoSequence``)."""
    import cv2
    import numpy as np

    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    imgs = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        imgs.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0)
    cap.release()
    if len(imgs) < 2:
        return None
    return imgs, [i / fps for i in range(len(imgs))]


def load_sequence(seq_dir: str):
    import cv2
    import numpy as np

    videos = sorted(
        glob(os.path.join(seq_dir, "*.mp4")) + glob(os.path.join(seq_dir, "*.avi"))
    )
    if videos:
        return load_video(videos[0])

    img_dir = os.path.join(seq_dir, "imgs")
    if not os.path.isdir(img_dir):
        img_dir = seq_dir
    paths = sorted(
        glob(os.path.join(img_dir, "*.png")) + glob(os.path.join(img_dir, "*.jpg"))
    )
    if len(paths) < 2:
        return None
    imgs = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        imgs.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0)

    ts_file = os.path.join(seq_dir, "timestamps.txt")
    fps_file = os.path.join(seq_dir, "fps.txt")
    if os.path.isfile(ts_file):
        stamps = [float(line) for line in open(ts_file) if line.strip()]
    elif os.path.isfile(fps_file):
        fps = float(open(fps_file).read().strip())
        stamps = [i / fps for i in range(len(paths))]
    else:
        stamps = list(range(len(paths)))
    return imgs, stamps[: len(imgs)]


def main(argv=None):
    p = argparse.ArgumentParser(description="Super SloMo adaptive upsampling")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", required=True, help="path to SuperSloMo.ckpt")
    args = p.parse_args(argv)

    import cv2
    import numpy as np

    from bmcnet_esr_tpu.data.upsampling import SuperSloMoUpsampler
    from bmcnet_esr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    up = SuperSloMoUpsampler(args.checkpoint)

    seq_dirs = [d for d in sorted(glob(os.path.join(args.input_dir, "*"))) if os.path.isdir(d)]
    if not seq_dirs:
        seq_dirs = [args.input_dir]
    for seq_dir in seq_dirs:
        loaded = load_sequence(seq_dir)
        if loaded is None:
            continue
        imgs, stamps = loaded
        frames, out_stamps = up.upsample_sequence(imgs, stamps)
        rel = os.path.relpath(seq_dir, args.input_dir)
        out_imgs = os.path.join(args.output_dir, rel, "imgs")
        os.makedirs(out_imgs, exist_ok=True)
        for i, frame in enumerate(frames):
            gray = cv2.cvtColor((frame * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
            cv2.imwrite(os.path.join(out_imgs, f"{i:08d}.png"), gray)
        with open(os.path.join(args.output_dir, rel, "timestamps.txt"), "w") as f:
            f.writelines(f"{t}\n" for t in out_stamps)
        print(f"{rel}: {len(imgs)} -> {len(frames)} frames")


if __name__ == "__main__":
    main()
