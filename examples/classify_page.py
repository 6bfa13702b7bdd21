"""Example: document-layout classification (segment / no_segment).

    python examples/classify_page.py --image page.png \
        [--checkpoint /ckpts/newspaper_classifier]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from karanta_tpu.inference.image_classifier import LayoutClassifier


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True)
    parser.add_argument("--checkpoint", default=None)
    args = parser.parse_args()

    if args.checkpoint and os.path.isdir(args.checkpoint):
        classifier = LayoutClassifier.from_checkpoint(args.checkpoint)
    else:
        classifier = LayoutClassifier.random()
        print("(no checkpoint given: random weights, scores meaningless)")
    print(json.dumps(classifier.predict(args.image)))


if __name__ == "__main__":
    main()
