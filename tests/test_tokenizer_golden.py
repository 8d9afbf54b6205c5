"""Golden test: our native CLIP BPE vs transformers.CLIPTokenizer on the SAME
vocab/merges files (VERDICT.md weak #8 — pin the latin-prompt behavior).

The real SD vocab is not bundled (zero egress); a synthetic vocab with full
byte coverage + a handful of merges exercises the same code paths: regex
split, byte-encoding, BPE merge order, SOT/EOT framing, EOT padding."""

import pytest

transformers = pytest.importorskip("transformers")

from instantrestore_tpu.models.tokenizer import CLIPTokenizer as NativeTokenizer

from helpers import make_tokenizer_files

PROMPT = "A high-quality photo of a person; professional, 8k"


@pytest.fixture(scope="module")
def tok_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    make_tokenizer_files(d)
    return str(d / "vocab.json"), str(d / "merges.txt")


@pytest.mark.parametrize(
    "text",
    [
        PROMPT,
        "hello world",
        "the photo of it",
        "a  b   c",  # whitespace cleanup
        "MiXeD CaSe PHOTO",
        "punctuation, here; ok!",
        "numbers 123 and 8k",
        "it's the photographer's",
    ],
)
def test_native_matches_transformers(tok_files, text):
    vocab_path, merges_path = tok_files
    ours = NativeTokenizer.from_files(vocab_path, merges_path)
    theirs = transformers.CLIPTokenizer(vocab_path, merges_path)

    got = ours(text, max_length=77, padding="max_length")
    want = theirs(
        text, max_length=77, padding="max_length", truncation=True
    )["input_ids"]
    assert got == want, (text, got[:20], want[:20])
