"""Scalar/UDF surface (SURVEY.md §2.8, §2.10)."""

from .tokenizer import kw_split, tokenize  # noqa: F401
