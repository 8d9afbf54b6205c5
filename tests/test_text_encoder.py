import jax
import jax.numpy as jnp
import numpy as np
import torch

from instantrestore_tpu.models.text_encoder import (
    CLIPTextConfig,
    encode_prompt,
    init_text_encoder_params,
    text_encoder_apply,
)
from instantrestore_tpu.models.tokenizer import CLIPTokenizer
from instantrestore_tpu.utils import torch_convert as tc

TINY = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
                      intermediate_size=64, max_position_embeddings=16)


def test_text_encoder_matches_torch_clip():
    """Golden test vs transformers' CLIPTextModel with random weights."""
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    hf_cfg = HFCfg(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers, num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        max_position_embeddings=TINY.max_position_embeddings, hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    params = tc.convert_state_dict(model.state_dict())
    ids = np.array([[49406 % 100, 5, 9, 3, 2, 1, 8, 4, 7, 6, 11, 12, 13, 14, 15, 99]],
                   dtype=np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids.astype(np.int64)))[0].numpy()
    out = text_encoder_apply(params, jnp.asarray(ids), cfg=TINY)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_encode_prompt_shape():
    params = init_text_encoder_params(jax.random.PRNGKey(0), TINY)
    emb = encode_prompt(params, list(range(16)), cfg=TINY)
    assert emb.shape == (1, 16, 32)
    assert emb.dtype == jnp.float32


def test_tokenizer_bpe_roundtrip():
    # micro vocab exercising merges and </w> handling
    tokens = [SOT, EOT] = ["<|startoftext|>", "<|endoftext|>"]
    vocab = {SOT: 0, EOT: 1}
    for i, t in enumerate(
        ["a", "b", "c", "a</w>", "b</w>", "c</w>", "ab", "ab</w>", "abc</w>", "bc</w>"]
    ):
        vocab[t] = i + 2
    merges = [("a", "b"), ("ab", "c</w>"), ("b", "c</w>")]
    tok = CLIPTokenizer(vocab, merges)
    # "abc" -> merge a+b -> ab, ab + c</w> -> abc</w>
    assert tok.encode("abc") == [vocab["abc</w>"]]
    # "bc" -> b + c</w> merged
    assert tok.encode("bc") == [vocab["bc</w>"]]
    # "ba": no merge for (b,a) -> b, a</w>
    assert tok.encode("ba") == [vocab["b"], vocab["a</w>"]]
    # padded call
    ids = tok("abc", max_length=6)
    assert ids == [0, vocab["abc</w>"], 1, 1, 1, 1]
    # lowercasing + whitespace cleanup
    assert tok.encode("  ABC ") == [vocab["abc</w>"]]
