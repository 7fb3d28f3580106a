"""Image classification with the Classifier helper — the deepcut_tpu analog
of the reference's 00-classification.ipynb / cpp_classification example.

Given a deploy prototxt + .caffemodel (+ optional mean .binaryproto / .npy),
classify images with the notebook's exact preprocessing: resize to
image_dims, center-crop or 10-crop oversampling, raw_scale 255, BGR channel
swap, mean subtraction.

Usage:
  python examples/classification.py deploy.prototxt weights.caffemodel \
      image.jpg [--mean mean.binaryproto] [--labels synset_words.txt] \
      [--no-oversample]
"""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model_def")
    ap.add_argument("weights")
    ap.add_argument("images", nargs="+")
    ap.add_argument("--mean", default=None,
                    help=".binaryproto or .npy mean file")
    ap.add_argument("--labels", default=None,
                    help="text file, one class name per line")
    ap.add_argument("--no-oversample", action="store_true",
                    help="center crop only (oversampling averages 10 crops)")
    args = ap.parse_args(argv)

    from deepcut_tpu import io as dio
    from deepcut_tpu.classifier import Classifier

    mean = None
    if args.mean:
        if args.mean.endswith(".npy"):
            mean = np.load(args.mean).mean(axis=(1, 2))
        else:
            with open(args.mean, "rb") as f:
                mean = dio.blobproto_bytes_to_array(f.read())[0].mean(axis=(1, 2))

    clf = Classifier(args.model_def, args.weights, mean=mean,
                     raw_scale=255.0, channel_swap=(2, 1, 0))
    labels = None
    if args.labels:
        with open(args.labels) as f:
            labels = [l.strip() for l in f if l.strip()]

    images = [dio.load_image(p) for p in args.images]
    probs = clf.predict(images, oversample=not args.no_oversample)
    for path, p in zip(args.images, probs):
        top5 = np.argsort(p)[::-1][:5]
        print(path)
        for i in top5:
            name = labels[i] if labels and i < len(labels) else f"class {i}"
            print(f"  {p[i]:.4f}  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
