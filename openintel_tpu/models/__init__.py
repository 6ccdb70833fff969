"""Model families: lexicon sentiment analyzer, BM25 / dense / hybrid retrievers."""

from openintel_tpu.models.lexicon import LexiconAnalyzer  # noqa: F401
