"""Pure-Python CLIP BPE (guidance/bpe.py) golden-validated bit-for-bit
against transformers.CLIPTokenizer on a synthetic vocab/merges fixture —
the real 49k CLIP vocab ships with --sd_weights, but the ALGORITHM is fully
testable offline."""

import json
import os

import numpy as np
import pytest

from customnerf_tpu.guidance.bpe import ClipBPETokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """A small but real CLIP-format vocab: full byte alphabet (+</w> forms),
    a handful of merges, the two specials."""
    d = tmp_path_factory.mktemp("tok")
    alphabet = list(bytes_to_unicode().values())
    vocab = {}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    for ch in alphabet:
        vocab[ch + "</w>"] = len(vocab)
    merges = [
        ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
        ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>"),
        ("t", "h"), ("th", "e</w>"),
        ("1", "2"),
    ]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return str(d)


PROMPTS = [
    "hello world",
    "The  Hello,   WORLD!!",          # cleaning: case, whitespace, punct
    "a corgi in a forest",            # unmerged letters → byte tokens
    "hello's world'll 12 123",        # contractions + digit splitting
    "héllo wörld",                    # multi-byte utf-8
    "",
]


def test_matches_transformers_clip_tokenizer(tok_dir):
    transformers = pytest.importorskip("transformers")
    hf = transformers.CLIPTokenizer.from_pretrained(tok_dir)
    ours = ClipBPETokenizer.from_dir(tok_dir)

    for p in PROMPTS:
        want = hf(p, padding="max_length", max_length=77, truncation=True,
                  return_tensors="np")["input_ids"][0]
        got = ours([p], max_length=77)[0]
        np.testing.assert_array_equal(got, want, err_msg=repr(p))


def test_batch_framing(tok_dir):
    ours = ClipBPETokenizer.from_dir(tok_dir)
    ids = ours(["hello world", "the hello"])
    assert ids.shape == (2, 77)
    assert (ids[:, 0] == ours.bos_token_id).all()
    # padded with EOS after the terminator
    row = ids[0]
    eos_pos = np.where(row == ours.eos_token_id)[0]
    assert len(eos_pos) >= 2 and (row[eos_pos[0]:] == ours.eos_token_id).all()


def test_added_modifier_token(tok_dir):
    """<new1> textual-inversion tokens get their own id and round-trip
    through encoding (custom_diffusion contract)."""
    ours = ClipBPETokenizer.from_dir(tok_dir)
    nid = ours.add_token("<new1>")
    assert nid == len(ours.encoder)
    ids = ours(["hello <new1> world"])[0]
    assert nid in ids.tolist()


def test_long_prompt_truncates(tok_dir):
    ours = ClipBPETokenizer.from_dir(tok_dir)
    ids = ours(["hello " * 200])[0]
    assert ids.shape == (77,)
    assert ids[0] == ours.bos_token_id and ids[-1] == ours.eos_token_id
