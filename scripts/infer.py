"""Batch inference CLI: restore every identity dir under --data_root.

Twin of the reference's `python -m face_replace.inference.test` main loop
(inference/test.py:165-187).
"""

import argparse
import sys

sys.path.insert(0, ".")

from instantrestore_tpu.inference.predictor import Predictor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--results_dir", default="results")
    p.add_argument("--max_refs", type=int, default=4)
    args = p.parse_args()
    Predictor(args.checkpoint).run_directory(
        args.data_root, args.results_dir, max_refs=args.max_refs
    )


if __name__ == "__main__":
    main()
