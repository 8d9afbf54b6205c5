"""Shared test fixtures: synthetic CLIP tokenizer files.

The real SD vocab/merges are not bundled (zero egress); this synthesizes a
small but fully-functional vocab (complete byte coverage + merge chains over
the fixed-prompt words) that both our native BPE and transformers'
CLIPTokenizer load, so golden and checkpoint-import tests always run.
"""

import json
from pathlib import Path

from instantrestore_tpu.models.tokenizer import _bytes_to_unicode

# merge chains exercising the BPE loop on fixed-prompt fragments
DEFAULT_MERGES = [
    ("h", "e</w>"), ("t", "he</w>"), ("o", "f</w>"), ("p", "h"),
    ("ph", "o"), ("pho", "t"), ("phot", "o</w>"), ("a", "l</w>"),
    ("o", "n</w>"), ("i", "t"), ("q", "u"), ("8", "k</w>"),
]


def make_tokenizer_files(directory, merges=None):
    """Write vocab.json + merges.txt into ``directory``; returns the vocab."""
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    merges = DEFAULT_MERGES if merges is None else merges
    b2u = _bytes_to_unicode()
    symbols = [b2u[b] for b in range(256)]
    vocab = {}
    for s in symbols:
        vocab[s] = len(vocab)
    for s in symbols:
        vocab[s + "</w>"] = len(vocab)
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return vocab
