"""Training CLI: python scripts/train.py --config_path <yaml> [section.field=value ...]

Entry-point twin of /root/reference/scripts/train.py (pyrallis CLI -> Coach).

Multi-host (the ``accelerate launch`` multi-node role, /root/reference/
setup.sh:4): launch the SAME command on every host with ``--multihost``.
On TPU pods the runtime supplies the topology; elsewhere pass
``--coordinator_address host:port --num_processes N --process_id i``.
Process 0 owns logging/checkpoints; each process feeds its slice of the
global batch (see parallel/mesh.py::init_distributed).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, default=None)
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed before training "
                             "(required on multi-host TPU slices)")
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args, overrides = parser.parse_known_args()

    if args.multihost:
        from instantrestore_tpu.parallel.mesh import init_distributed

        init_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from instantrestore_tpu.configs.config import load_config
    from instantrestore_tpu.training.coach import Coach

    cfg = load_config(args.config_path, overrides)
    Coach(cfg).train()


if __name__ == "__main__":
    main()
