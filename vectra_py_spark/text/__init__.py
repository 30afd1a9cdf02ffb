"""Text pipeline: tokenizers and the recursive token-aware splitter."""

from vectra_py_spark.text.splitter import SplitterConfig, TextChunk, TextSplitter
from vectra_py_spark.text.tokenizers import DeterministicTokenizer, get_tokenizer

__all__ = [
    "DeterministicTokenizer",
    "get_tokenizer",
    "SplitterConfig",
    "TextChunk",
    "TextSplitter",
]
