"""Device compute ops: tokenisation, BM25, dense cosine top-k, rank fusion.

The compute core of the framework. Every device op has a pure-NumPy reference
implementation asserted (bit- or tolerance-) equal in tests — the analogue of
the reference's canned-JSON parser-fixture discipline (SURVEY.md §4).
"""
