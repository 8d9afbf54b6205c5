"""Demo CLI (gradio if available, else one-shot restore to a file)."""

import argparse
import sys

sys.path.insert(0, ".")

from instantrestore_tpu.inference.demo import Demo


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--model", default="Final Model")
    p.add_argument("--identity", default=None)
    p.add_argument("--out", default="demo_result.png")
    p.add_argument("--gradio", action="store_true")
    args = p.parse_args()
    demo = Demo(args.data_root)
    if args.gradio:
        demo.launch_gradio()
        return
    identity = args.identity or demo.identities[0]
    pred, attn = demo.run(args.model, identity)
    pred.save(args.out)
    print(f"saved {args.out}; attention mass per reference: {attn}")


if __name__ == "__main__":
    main()
