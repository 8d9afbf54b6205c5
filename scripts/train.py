"""Training CLI: python scripts/train.py --config_path <yaml> [section.field=value ...]

Entry-point twin of /root/reference/scripts/train.py (pyrallis CLI -> Coach).
"""

import argparse
import sys

sys.path.insert(0, ".")

from instantrestore_tpu.configs.config import load_config
from instantrestore_tpu.training.coach import Coach


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, default=None)
    args, overrides = parser.parse_known_args()
    cfg = load_config(args.config_path, overrides)
    Coach(cfg).train()


if __name__ == "__main__":
    main()
