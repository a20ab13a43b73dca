from .tokenizers import (
    WordPieceTokenizer,
    dna_vocab_size,
    kmer_vocab,
    taxonomy_text,
    tokenize_dna,
    tokenize_dna_batch,
    tokenize_dna_batch_overlapping,
)

__all__ = [
    "WordPieceTokenizer",
    "dna_vocab_size",
    "kmer_vocab",
    "taxonomy_text",
    "tokenize_dna",
    "tokenize_dna_batch",
    "tokenize_dna_batch_overlapping",
]
