"""Golden-value tests for DNA k-mer tokenization and WordPiece.

The DNA vocabulary ordering is pinned by hand-computed values matching the
reference's torchtext vocab construction (dna_encoder.py:53-63):
<MASK>=0, <CLS>=1, <UNK>=2, then 4^5 k-mers in product("ACGT") order.
"""

import numpy as np

from clibd_tpu.data.tokenizers import (
    MASK_ID,
    UNK_ID,
    WordPieceTokenizer,
    dna_vocab_size,
    kmer_vocab,
    tokenize_dna,
    tokenize_dna_batch,
    tokenize_dna_batch_overlapping,
)


def test_vocab_order():
    vocab = kmer_vocab(5)
    assert vocab[0] == "<MASK>"
    assert vocab[1] == "<CLS>"
    assert vocab[2] == "<UNK>"
    assert vocab[3] == "AAAAA"
    assert vocab[4] == "AAAAC"
    assert vocab[6] == "AAAAT"
    assert vocab[7] == "AAACA"
    assert vocab[-1] == "TTTTT"
    assert len(vocab) == dna_vocab_size(5) == 4**5 + 3


def test_tokenize_golden():
    # "AAAAA" + "CCCCC" + rest N-padding
    seq = "AAAAA" + "CCCCC"
    toks = tokenize_dna(seq)
    assert toks.shape == (133,)
    assert toks[0] == MASK_ID  # prepended id 0
    assert toks[1] == 3  # AAAAA
    # CCCCC = 3 + 1*(256+64+16+4+1) = 3 + 341 = 344
    assert toks[2] == 344
    # all remaining kmers are NNNNN -> <UNK>
    assert (toks[3:] == UNK_ID).all()


def test_tokenize_base4_order():
    # AAAAC -> 3 + 1 = 4 ; AAACA -> 3 + 4 = 7... wait: C in last position = 1
    assert tokenize_dna("AAAAC" + "N" * 655)[1] == 4
    assert tokenize_dna("AAACA" + "N" * 655)[1] == 3 + 4
    assert tokenize_dna("TTTTT" + "N" * 655)[1] == 3 + 4**5 - 1
    assert tokenize_dna("GATCA" + "N" * 655)[1] == 3 + 2 * 256 + 0 * 64 + 3 * 16 + 1 * 4 + 0


def test_truncation_and_padding():
    long_seq = "ACGT" * 200  # 800 bases -> truncated to 660
    toks = tokenize_dna(long_seq)
    assert toks.shape == (133,)
    assert (toks[1:] != UNK_ID).all()
    short = tokenize_dna("ACGTA")
    assert short[1] == 3 + 0 * 256 + 1 * 64 + 2 * 16 + 3 * 4 + 0
    assert (short[2:] == UNK_ID).all()


def test_batch_matches_single():
    seqs = ["ACGTACGTAC", "TTTTTAAAAACCCCC", "NNNNNACGTA", ""]
    batch = tokenize_dna_batch(seqs)
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(batch[i], tokenize_dna(s))


def test_bytes_input():
    out_s = tokenize_dna_batch(["ACGTACGTAC"])
    out_b = tokenize_dna_batch([b"ACGTACGTAC"])
    np.testing.assert_array_equal(out_s, out_b)
    arr = np.array([b"ACGTACGTAC"], dtype="S10")
    np.testing.assert_array_equal(tokenize_dna_batch(arr), out_s)


def test_overlapping_tokenizer():
    ids, att = tokenize_dna_batch_overlapping(["AAAA" + "C" * 10], k=4, stride=1, max_bp=20)
    # first kmer AAAA -> 2 + 0 = 2
    assert ids.shape == (1, 17)
    assert ids[0, 0] == 2
    # AAAC -> 2 + 1 = 3 ; AACC -> 2 + 5 ; ACCC -> 2 + 21 ; CCCC -> 2 + 85
    assert ids[0, 1] == 3
    assert ids[0, 4] == 2 + 85
    # beyond base 14, windows hit the N padding -> [UNK]=1
    assert ids[0, -1] == 1
    assert att.shape == (1, 20)
    assert att[0, :14].all() and not att[0, 14:].any()


def test_wordpiece(tmp_path):
    from tests.fixtures import TINY_VOCAB, write_tiny_vocab

    vocab_path = write_tiny_vocab(str(tmp_path / "vocab.txt"))
    tok = WordPieceTokenizer(vocab_path)
    enc = tok.encode("Diptera Sciaridae Corynoptera species_3", max_length=20)
    ids = enc["input_ids"]
    v = {w: i for i, w in enumerate(TINY_VOCAB)}
    assert ids[0] == v["[CLS]"]
    assert ids[1] == v["diptera"]
    assert ids[2] == v["sciaridae"]
    assert ids[3] == v["corynoptera"]
    # "_" is punctuation in BERT basic tokenization -> species _ 3 split
    assert ids[4] == v["species"]
    assert ids[5] == v["_"]
    assert ids[6] == v["3"]
    assert ids[7] == v["[SEP]"]
    assert (ids[8:] == v["[PAD]"]).all()
    assert enc["attention_mask"][:8].all() and not enc["attention_mask"][8:].any()
    # unknown word maps to [UNK]
    enc2 = tok.encode("zzz", max_length=5)
    assert enc2["input_ids"][1] == v["[UNK]"]


def test_wordpiece_matches_hf_if_available(tmp_path):
    """If a cached HF tokenizer exists, verify exact parity (skipped offline)."""
    import pytest

    try:
        import os

        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        from transformers import AutoTokenizer

        hf = AutoTokenizer.from_pretrained("prajjwal1/bert-small")
    except Exception:
        pytest.skip("no cached HF tokenizer (offline)")
    import tempfile

    vocab_file = hf.save_vocabulary(str(tmp_path))[0]
    ours = WordPieceTokenizer(vocab_file)
    for text in ["Diptera Sciaridae Corynoptera Corynoptera sp.", "not_placed Braconidae x y"]:
        ref = hf([text], padding="max_length", max_length=20, truncation=True)
        got = ours.encode(text, max_length=20)
        np.testing.assert_array_equal(got["input_ids"], np.asarray(ref["input_ids"][0]))
        np.testing.assert_array_equal(got["attention_mask"], np.asarray(ref["attention_mask"][0]))


def test_dna_tokenizer_fuzz_vs_naive():
    """Property test: vectorized tokenizer == naive per-string transcription
    of the reference pipeline (pad->kmers->vocab with UNK, prepend 0)."""
    from itertools import product

    rng = np.random.default_rng(123)
    vocab = {"".join(p): 3 + i for i, p in enumerate(product("ACGT", repeat=5))}

    def naive(seq, max_bp=660, k=5):
        s = seq[:max_bp] + "N" * max(0, max_bp - len(seq))
        toks = [0]
        for i in range(0, max_bp - k + 1, k):
            toks.append(vocab.get(s[i : i + k], 2))
        return np.asarray(toks, np.int32)

    alphabet = list("ACGTNRYacgt-")
    seqs = []
    for _ in range(50):
        length = int(rng.integers(0, 800))
        seqs.append("".join(rng.choice(alphabet, size=length)))
    batch = tokenize_dna_batch(seqs)
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(batch[i], naive(s), err_msg=s[:40])


def test_wordpiece_matches_hf_local_vocab(tmp_path):
    """True HF parity without network: BertTokenizer built from a local
    vocab.txt vs our WordPiece, over varied taxonomy-like strings."""
    import pytest

    try:
        from transformers import BertTokenizer
    except ImportError:
        pytest.skip("transformers unavailable")

    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "di", "##pter", "##a", "sci", "##ari", "##dae", "cory", "##nop", "##tera",
        "species", "not", "##_", "classified", "sp", ".", "-", "_", "x",
        "bra", "##con", "##idae", "1", "2", "##1", "##2",
    ]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    hf = BertTokenizer(vocab_file=str(path), do_lower_case=True)
    ours = WordPieceTokenizer(str(path))

    texts = [
        "Diptera Sciaridae Corynoptera species",
        "not_classified x sp.",
        "Braconidae sp. 12",
        "DIPTERA-X",
        "",
        "zzzz unknownword",
        "species_12 x.x",
    ]
    for text in texts:
        ref = hf([text], padding="max_length", max_length=20, truncation=True)
        got = ours.encode(text, max_length=20)
        np.testing.assert_array_equal(
            got["input_ids"], np.asarray(ref["input_ids"][0]), err_msg=text
        )
        np.testing.assert_array_equal(
            got["attention_mask"], np.asarray(ref["attention_mask"][0]), err_msg=text
        )
