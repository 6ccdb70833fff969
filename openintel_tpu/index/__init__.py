"""Corpus index: postings (CSR), dense embeddings, stats, checkpointing."""

from openintel_tpu.index.schema import (  # noqa: F401
    BM25Config,
    DenseIndex,
    PostingsIndex,
)
from openintel_tpu.index.build import build_postings_index  # noqa: F401
