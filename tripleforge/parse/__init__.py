"""Arrow-batched RDF parsers (SURVEY.md §2.A4-A8)."""

from tripleforge.parse.dispatch import parse_corpus, split_errors

__all__ = ["parse_corpus", "split_errors"]
